"""Seeded fuzz: the frontend must fail ONLY with located SqlppError —
never a raw Python exception — on arbitrary token soup (parser) or
semi-valid selects (analyzer). No Spark needed."""

from __future__ import annotations

import random

from sqlpp_spark.frontend.analyze import Env, analyze
from sqlpp_spark.frontend.errors import SqlppError
from sqlpp_spark.frontend.parser import parse_query

VOCAB = [
    "select", "from", "where", "group", "by", "with", "...", "?p", "(",
    ")", ",", ".", "*", "+", "'s'", "1", "x", "match", "end", "|", "->",
    ":", "int", "null", "insert", "into", "values", "set", "order",
    "limit", ";", "alter", "drop", "join", "on", "as", "exists", "in",
    "over", "partition", "row_number", "lag", "desc",
    # r14: frame + set-op + new window-fn tokens
    "rows", "range", "between", "and", "preceding", "following",
    "unbounded", "current", "row", "union", "all", "intersect",
    "except", "avg", "percent_rank", "cume_dist", "nth_value",
    "case", "when", "then", "else", "like",
    # late r14: IN lists, outer/cross joins, new aggregates
    "right", "full", "outer", "cross", "stddev", "variance",
    "string_agg", "bool_and", "bool_or", "count_distinct", "2",
    # r15: approx aggregates, QUALIFY, count(*) / count(DISTINCT x)
    # spellings, compound-subquery keywords
    "approx_count_distinct", "approx_percentile", "qualify",
    "distinct", "count", "filter", "0.5", "grouping", "sets",
    # r16: quantifiers + null-treatment modifier + named windows
    "any", "some", "ignore", "respect", "nulls", "first_value",
    "window", "w", "interval", "hour", "3",
    # r17: recursive CTEs + lateral derived tables
    "recursive", "lateral", "offset", "left", "true",
]


def test_parser_never_crashes():
    rng = random.Random(7)
    for _ in range(1500):
        src = " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 12)))
        try:
            parse_query(src)
        except SqlppError:
            pass  # the only acceptable failure mode


def _env() -> Env:
    env = Env()
    env.add(
        "create table users(id int not null, name string, created_at float not null);"
        "create query q1 as select id as uid, with count(1) as c, ... from users group by id;"
        "create fieldset fs(from users) as select users.id as fid"
    )
    return env


def test_analyzer_never_crashes():
    env = _env()
    rng = random.Random(11)
    exprs = [
        "id", "name", "users.id", "q.uid", "q.c", "count(id)", "sum(id)",
        "id + 1", "?p", "null : int", "nullif(id, 1)", "coalesce(name, 'x')",
        "q.max(id)", "not_a_col", "bad.path", "...fs(users)", "?p : int expr",
        "match ?m with | A -> 1 | B ?x -> ?x end",
        # r14: frames + new window fns (valid and boundary-invalid)
        "sum(id) over (order by id rows between 1 preceding and current row)",
        "avg(id) over (order by id rows 2 preceding)",
        "percent_rank() over (order by id)",
        "nth_value(id, 2) over (order by id range between 1 preceding "
        "and 1 following)",
        "row_number() over (order by id rows between 1 preceding "
        "and current row)",
        "sum(id) over (order by id rows between current row "
        "and 2 preceding)",
        # r14: CASE / LIKE / BETWEEN (valid and boundary-invalid)
        "case when id = 1 then 1 else 0 end",
        "case when id then 'x' end",
        "case when name like 'a%' then id end",
        "id between 1 and 5",
        "name not like '%x'",
        "case when id = 1 then 'x' else 2 end",
        # late r14: IN value lists (valid and boundary-invalid)
        "id in (1, 2, 3)",
        "id not in (1, id + 1)",
        "name in ('a', 'b')",
        "id in (1, 'x')",
        "id in ()",
        "id in (1, (select count(1) from users group by ()))",
        # late r14: new aggregates (valid and boundary-invalid)
        "stddev(id)", "variance(id)", "var_pop(id)",
        "string_agg(name, ',')", "string_agg(name, name)",
        "bool_and(id > 1)", "bool_or(name)", "count_distinct(id)",
        "stddev(name)",
        # r16: bitwise aggregates + count_if (valid/boundary-invalid)
        "bit_and(id)", "bit_or(id)", "bit_xor(id)",
        "count_if(id > 1)", "bit_and(name)", "count_if(id)",
        # r15/r16: quantified comparisons — uncorrelated, equality-
        # and theta-correlated (valid and boundary-invalid)
        "id < any (select u.id from users as u)",
        "id >= all (select u.id from users as u)",
        "id > any (select u.id from users as u where u.id = id)",
        "id <= all (select u.id from users as u where u.id < id)",
        "id != any (select u.id from users as u where u.id != id)",
        "id = all (select u.id, u.name from users as u)",
        "name < any (select u.id from users as u)",
        "(select min(u.id) from users as u group by ()) "
        "< any (select u2.id from users as u2)",
        # r16: IGNORE/RESPECT NULLS (valid and boundary-invalid)
        "lag(name ignore nulls) over (order by id)",
        "lead(name, 2 ignore nulls) over (order by id)",
        "first_value(name respect nulls) over (order by id)",
        "nth_value(name, 2 ignore nulls) over (order by id)",
        "sum(id ignore nulls) over (order by id)",
        "lag(name, 0 ignore nulls) over (order by id)",
        "count(id ignore nulls)",
        # r16: named-window references (valid only when the tail
        # defines the window — boundary-invalid otherwise)
        "sum(id) over win1",
        "row_number() over win1",
        # r16: interval literals (valid and boundary-invalid)
        "created_at + interval 3 hour",
        "created_at - interval 2 weeks",
        "id + interval 1 day",
        "interval 5 minute",
    ]
    froms = [
        "users", "users as u", "q1 as q",
        "users as a join q1 as q on a.id = q.uid",
        "(select id from users) as s",
        "users as a left join users as b on a.id = b.id",
        # late r14: outer/cross joins
        "users as a right join users as b on a.id = b.id",
        "users as a full outer join users as b on a.id = b.id",
        "users as a cross join q1 as q",
        "users as a inner join users as b on a.id = b.id",
        "users as a cross join users as b on a.id = b.id",
        # r17: lateral derived tables (valid and boundary-invalid)
        "users as a cross join lateral "
        "(select u.id as lid from users as u where u.id = a.id) as l",
        "users as a left join lateral "
        "(select u.id as lid from users as u where u.id = a.id "
        "order by u.created_at desc limit 2) as l on true",
        "users as a cross join lateral "
        "(select u.id as lid from users as u where u.id < a.id "
        "order by u.id limit 1) as l",
        "users as a right join lateral "
        "(select u.id as lid from users as u where u.id = a.id) as l "
        "on true",
        "users as a cross join lateral "
        "(select count(1) as c from users as u where u.id = a.id "
        "group by ()) as l",
    ]
    tails = [
        "", "where id > 0", "group by id", "group by ()", "order by 1",
        "limit 5", "where name is null", "having count(1) > 1",
        "where id in (select id from users)",
        # late r14: IN lists in WHERE, GROUP BY alias/ordinal forms
        "where id in (1, 2, 3)", "where name not in ('a', 'b')",
        "group by 1", "group by 2", "group by 9",
        # r16: named windows
        "window win1 as (order by id)",
        "window win1 as (partition by id order by created_at desc)",
        "window win1 as (order by id), win1 as (order by id)",
        # r16: DISTINCT ON tails (valid only when paired with a
        # leading-keys ORDER BY — boundary-invalid otherwise)
        "order by id",
        "order by id, created_at desc",
    ]
    for _ in range(1500):
        es = ", ".join(rng.sample(exprs, rng.randint(1, 3)))
        src = f"select {es} from {rng.choice(froms)} {rng.choice(tails)}"
        try:
            analyze(env, src)
        except SqlppError:
            pass
    # r16: DISTINCT ON heads — mostly boundary-invalid (ORDER BY
    # leading-keys rule), must always fail located
    for _ in range(300):
        es = ", ".join(rng.sample(exprs, rng.randint(1, 2)))
        on = rng.choice(["id", "name", "id % 2", "id, name"])
        src = (
            f"select distinct on ({on}) {es} from "
            f"{rng.choice(froms)} {rng.choice(tails)}"
        )
        try:
            analyze(env, src)
        except SqlppError:
            pass
    # r17: WITH RECURSIVE heads (valid and boundary-invalid: bad
    # bodies, lossy type mixes, self-reference in base, column-list
    # arity) — analysis must always fail located, never crash
    bases = ["select 1 as n", "select id as n from users",
             "select 1 as n, 2 as m", "select name as n from users",
             "select 1.5 as n"]
    steps = ["select n + 1 as n from t where n < 3",
             "select n + 0.5 as n from t where n < 3",
             "select t.n as n from t join users as u on u.id = t.n",
             "select name as n from users",
             "select n as n, n as m from t",
             "select id as n from users"]
    cols = ["(n)", "(n, m)", ""]
    for _ in range(300):
        src = (
            f"with recursive t {rng.choice(cols)} as "
            f"({rng.choice(bases)} union all {rng.choice(steps)}) "
            f"select n from t"
        )
        try:
            analyze(env, src)
        except SqlppError:
            pass
