"""IS [NOT] DISTINCT FROM — SQL's two-valued null-safe comparison
(r15, beyond reference; the reference's builtin table stops at
IS NULL, sqlpp/analyze.ml:41-45).

Semantics pinned here: never NULL; NULL IS NOT DISTINCT FROM NULL is
TRUE; NULL IS DISTINCT FROM <value> is TRUE. Spark compiles to
Column.eqNullSafe (Catalyst EqualNullSafe — predicate-pushdown-able);
DuckDB/PG print the standard spelling; SQLite prints its bare
``a IS b`` form (same two-valued semantics). Differential against
DuckDB on BOTH the printed SQL and the original source, and against
sqlite3 on the sqlite rendering.
"""

from __future__ import annotations

import sqlite3

import duckdb
import pytest

from sqlpp_spark.compiler.sqlgen import select_sql
from sqlpp_spark.frontend.analyze import Analyzer
from sqlpp_spark.frontend.errors import SqlppError
from sqlpp_spark.frontend.parser import parse_query
from sqlpp_spark.frontend.printer import format_query

T1 = [
    (1, 10, "alpha"), (2, None, "beta"), (3, 10, None),
    (4, None, None), (5, 30, "alpha"),
]


@pytest.fixture()
def eng(spark):
    from sqlpp_spark.engine import SqlppEngine

    eng = SqlppEngine(spark)
    eng.add_decls("create table t1 (id int not null, val int, name string);")
    eng.register_df(
        "t1", spark.createDataFrame(T1, "id long, val long, name string")
    )
    return eng


@pytest.fixture()
def duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE t1 (id BIGINT, val BIGINT, name VARCHAR)")
    con.executemany("INSERT INTO t1 VALUES (?,?,?)", T1)
    return con


def _differ(eng, duck, src):
    rows = sorted(tuple(repr(x) for x in r) for r in eng.fetch_list(src))
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    sql = select_sql(info)
    want = sorted(tuple(repr(x) for x in r) for r in duck.execute(sql).fetchall())
    assert rows == want, f"{src}\n{sql}"
    if ":" not in src:  # `null:TY` ascriptions aren't ANSI source
        want2 = sorted(
            tuple(repr(x) for x in r) for r in duck.execute(src).fetchall()
        )
        assert rows == want2, src
    return info


SOURCES = (
    # flag position: the full 2-valued truth table over NULL-bearing
    # columns (val=NULL rows, 10 literal, self-compare)
    "select id, (val is distinct from 10) as d, "
    "(val is not distinct from 10) as nd from t1 order by id",
    # NULL-vs-NULL: two nullable columns (rows 3/4 exercise one-side
    # and both-side NULL)
    "select id, (val is not distinct from id) as eq from t1 order by id",
    # WHERE position — the classic use: keep rows where a nullable
    # column differs from a constant INCLUDING the NULL rows (plain
    # != would drop them)
    "select id from t1 where val is distinct from 10 order by id",
    "select id from t1 where name is not distinct from null:string order by id",
    # NOT composition (exercises the _NOT_FLIP entry)
    "select id from t1 where not (val is distinct from 10) order by id",
    # nested in CASE and alongside IS NULL (grammar interplay)
    "select id, case when val is distinct from 10 then 'd' else 's' end "
    "as tag from t1 order by id",
    # join condition: null-safe key match (rows 2 and 4 pair on NULL)
    "select a.id as aid, b.id as bid from t1 as a "
    "join t1 as b on a.val is not distinct from b.val "
    "where a.id < b.id order by aid, bid",
)


def test_distinct_from_differential(eng, duck):
    for src in SOURCES:
        _differ(eng, duck, src)


def test_distinct_from_never_null(eng):
    # result type is non-null BOOL: usable directly under NOT and in
    # bool aggregates without null guards
    rows = eng.fetch_list(
        "select count(1) as n from t1 "
        "where (val is distinct from 10) or (val is not distinct from 10) "
        "group by ()"
    )
    assert rows == [(len(T1),)]


def test_distinct_from_sqlite_rendering(eng):
    con = sqlite3.connect(":memory:")
    con.execute("CREATE TABLE t1 (id INTEGER, val INTEGER, name TEXT)")
    con.executemany("INSERT INTO t1 VALUES (?,?,?)", T1)
    for src in (
        "select id, val from t1 where val is distinct from 10 order by id",
        "select id from t1 where name is not distinct from null:string order by id",
    ):
        info = Analyzer(eng.env, src).analyze_query(parse_query(src))
        sql = select_sql(info, dialect="sqlite")
        assert " DISTINCT FROM" not in sql  # bare IS / IS NOT spelling
        got = sorted(con.execute(sql).fetchall())
        want = sorted(tuple(r) for r in eng.fetch_list(src))
        assert got == want, f"{src}\n{sql}"


def test_distinct_from_postgres_rendering(eng):
    src = "select id from t1 where val is distinct from 10 order by id"
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    assert "IS DISTINCT FROM" in select_sql(info, dialect="postgres")


def test_distinct_from_formats_roundtrip(eng):
    src = "select id from t1 where val is distinct from 10 order by id"
    printed = format_query(parse_query(src))
    assert "IS DISTINCT FROM" in printed
    # the formatter's output re-parses to the same rows
    assert eng.fetch_list(printed) == eng.fetch_list(src)


def test_distinct_from_type_errors(eng):
    with pytest.raises(SqlppError):
        eng.fetch_list("select id from t1 where val is distinct from 'x'")


def test_distinct_from_pushdown(eng):
    # EqualNullSafe reaches the scan as a pushed filter when reading
    # parquet; over an in-memory frame, assert the plan carries the
    # null-safe operator (no row-at-a-time fallback)
    df = eng.query("select id from t1 where val is not distinct from 10")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "<=>" in plan or "EqualNullSafe" in plan or "isnotnull" not in plan
