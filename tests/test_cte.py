"""SQL CTEs (r15, beyond reference): WITH name AS (compound) [, ...]
SELECT — inlined at PARSE time as derived tables (the same semantics
as the dialect's named-query/view inlining: multiple references =
multiple copies). Later bodies see earlier CTEs; recursion and
duplicate names are located errors. Unambiguous with the dialect's
projection-position `with expr as name`. DuckDB runs the original
CTE source natively — the independent oracle."""

from __future__ import annotations

import duckdb
import pytest

from sqlpp_spark.compiler.sqlgen import select_sql
from sqlpp_spark.frontend.analyze import Analyzer
from sqlpp_spark.frontend.errors import SqlppError
from sqlpp_spark.frontend.parser import parse_query

T1 = [(1, 1, 10), (2, 1, 25), (3, 2, 30), (4, 3, 40), (5, 2, None)]
T2 = [(1, 1, 100), (3, 2, 300), (6, 2, 600)]


@pytest.fixture()
def eng(spark):
    from sqlpp_spark.engine import SqlppEngine

    eng = SqlppEngine(spark)
    eng.add_decls(
        "create table t1 (id int not null, grp int not null, val int);"
        "create table t2 (id int not null, grp int not null, "
        "amt int not null);"
    )
    eng.register_df("t1", spark.createDataFrame(T1, "id long, grp long, val long"))
    eng.register_df("t2", spark.createDataFrame(T2, "id long, grp long, amt long"))
    return eng


@pytest.fixture()
def duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE t1 (id BIGINT, grp BIGINT, val BIGINT)")
    con.executemany("INSERT INTO t1 VALUES (?,?,?)", T1)
    con.execute("CREATE TABLE t2 (id BIGINT, grp BIGINT, amt BIGINT)")
    con.executemany("INSERT INTO t2 VALUES (?,?,?)", T2)
    return con


def _differ(eng, duck, src):
    rows = sorted(tuple(repr(x) for x in r) for r in eng.fetch_list(src))
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    sql = select_sql(info)
    want = sorted(tuple(repr(x) for x in r) for r in duck.execute(sql).fetchall())
    want2 = sorted(tuple(repr(x) for x in r) for r in duck.execute(src).fetchall())
    assert rows == want == want2, f"{src}\n{sql}"


def test_cte_differential(eng, duck):
    for src in (
        # basic
        "with big as (select id, val from t1 where val >= 25) "
        "select x.id as id, x.val as val from big as x order by id",
        # referenced twice: self-join through the CTE
        "with g as (select grp, count(id) as n from t1 group by grp) "
        "select a.grp as grp, a.n as n, b.n as n2 from g as a "
        "join g as b on a.grp = b.grp order by grp",
        # chained: later CTE uses the earlier one
        "with base as (select id, grp from t1 where id > 1), "
        "agg as (select grp, count(id) as n from base group by grp) "
        "select x.grp as grp, x.n as n from agg as x order by grp",
        # compound body + tail inside the CTE
        "with u as (select id from t1 union select id from t2 "
        "order by id limit 4) "
        "select x.id as id from u as x order by id",
        # CTE referenced from a subquery position
        "with keys as (select grp from t2 where amt > 200) "
        "select id from t1 where grp in (select grp from keys) "
        "order by id",
        # CTE joined against a base table
        "with k as (select id, amt from t2) "
        "select t1.id as id, x.amt as amt from t1 "
        "join k as x on t1.id = x.id order by id",
        # windows over a CTE
        "with v as (select id, grp, val from t1 where val is not null) "
        "select x.id as id, rank() over (partition by x.grp "
        "order by x.val desc) as r from v as x order by id",
    ):
        _differ(eng, duck, src)


def test_cte_shadows_base_table(eng, duck):
    """A CTE named like a real table wins (standard SQL)."""
    _differ(
        eng, duck,
        "with t2 as (select id, grp, val from t1) "
        "select x.id as id from t2 as x where x.val > 20 order by id",
    )


def test_cte_errors(eng):
    for bad, m in (
        ("with a as (select id from a) select id from a as x",
         "recursive CTE"),
        ("with a as (select id from t1), a as (select id from t2) "
         "select x.id from a as x", "duplicate CTE"),
        ("with a as (select id from t1) insert into t1 values (9, 9, 9)",
         "followed by SELECT"),
        # a LATER cte is not visible earlier (standard)
        ("with a as (select id from b), b as (select id from t1) "
         "select x.id from a as x", "no such table|not found|b"),
    ):
        with pytest.raises(SqlppError, match=m):
            eng.fetch_list(bad)


def test_cte_does_not_break_projection_with(eng):
    """The projection-position `with expr as name` (dialect lazy
    fields) still parses — only a query-LEADING WITH opens a CTE."""
    rows = eng.fetch_list(
        "select id, with val + 1 as v1, v1 as v from t1 "
        "where id = 1"
    )
    assert [tuple(r) for r in rows] == [(1, 11)]
