"""GROUP BY output-alias and 1-based ordinal references (late r14,
beyond reference — the reference groups by expressions only,
parser.mly; DuckDB/PG/Spark SQL all accept both forms). Resolution is
against the RAW projection items before inference so the substituted
expression hash-conses with its projection twin; a bare name that IS
a resolvable column keeps the column (PG precedence); ordinals/aliases
landing on aggregate fields are rejected."""

from __future__ import annotations

import duckdb
import pytest

from sqlpp_spark.compiler.sqlgen import select_sql
from sqlpp_spark.frontend.analyze import Analyzer, Env, analyze
from sqlpp_spark.frontend.errors import SqlppError
from sqlpp_spark.frontend.parser import parse_query

ROWS = [(1, 2, "x"), (2, None, "x"), (3, 4, "q"), (4, 5, "m"), (5, 7, "m")]
SCHEMA = "create table t (a int not null, b int, s string not null);"


@pytest.fixture(scope="module")
def env():
    e = Env()
    e.add(SCHEMA)
    return e


@pytest.fixture()
def eng(spark):
    from sqlpp_spark.engine import SqlppEngine

    eng = SqlppEngine(spark)
    eng.add_decls(SCHEMA)
    eng.register_df("t", spark.createDataFrame(ROWS, "a long, b long, s string"))
    return eng


@pytest.fixture()
def duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE t (a BIGINT, b BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", ROWS)
    return con


def _differ(eng, duck, src):
    key = lambda r: tuple(repr(x) for x in r)  # noqa: E731
    rows = sorted((tuple(r) for r in eng.fetch_list(src)), key=key)
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    sql = select_sql(info)
    want = sorted((tuple(r) for r in duck.execute(sql).fetchall()), key=key)
    want2 = sorted((tuple(r) for r in duck.execute(src).fetchall()), key=key)
    assert rows == want == want2, f"{src}\n{sql}"


def test_group_by_alias_and_ordinal(eng, duck):
    for src in (
        "select t.s as grp, count(1) as n from t group by grp order by grp",
        "select t.s as grp, count(1) as n from t group by 1 order by grp",
        "select t.a * 2 as dbl, count(1) as n from t group by dbl "
        "order by dbl",
        # mixed ordinals, incl. a computed IN-list flag key
        "select t.s as grp, t.a in (1, 2) as lowa, count(1) as n "
        "from t group by 1, 2 order by grp, lowa",
        # ROLLUP accepts the alias form too
        "select t.s as grp, sum(t.a) as tot from t group by rollup (grp) "
        "order by grp",
    ):
        _differ(eng, duck, src)


def test_column_shadows_alias(eng, duck):
    # output alias `b` collides with column t.b: a bare name in GROUP
    # BY prefers the column — grouping by t.s here, like PG/DuckDB
    _differ(
        eng, duck,
        "select t.s as b, count(1) as n from t group by t.s order by b",
    )


def test_errors(env):
    with pytest.raises(SqlppError, match="not in the select list"):
        analyze(env, "select t.s as grp, count(1) as n from t group by 3")
    with pytest.raises(SqlppError, match="not in the select list"):
        analyze(env, "select t.s as grp, count(1) as n from t group by 0")
    with pytest.raises(SqlppError, match="not allowed in GROUP BY"):
        # ordinal 2 lands on the aggregate field
        analyze(env, "select t.s as grp, count(1) as n from t group by 2")
    with pytest.raises(SqlppError):
        analyze(env, "select t.s as grp, count(1) as n from t group by nope")


def _differ_ordered(eng, duck, src):
    """Row-SEQUENCE differential — ordinal ORDER BY is about order."""
    rows = [tuple(repr(x) for x in r) for r in eng.fetch_list(src)]
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    sql = select_sql(info)
    want = [tuple(repr(x) for x in r) for r in duck.execute(sql).fetchall()]
    want2 = [tuple(repr(x) for x in r) for r in duck.execute(src).fetchall()]
    assert rows == want == want2, f"{src}\n{sql}"


def test_order_by_ordinal(eng, duck):
    """r15: ORDER BY 1-based ordinals (DuckDB/PG/Spark SQL). An int
    literal there was previously a silent NO-OP constant sort — every
    mainstream engine reads it as an ordinal, so original-source
    differentials would have diverged."""
    for src in (
        "select a, b from t order by 1 desc",
        "select s, a from t order by 1, 2 desc",
        # ordinal onto a computed projection item
        "select a + coalesce(b, 0) as ab, s from t order by 1 desc, s",
        # mixed ordinal + expression keys
        "select s, a, b from t order by 1 desc, a",
        # grouped select: ordinal lands on the aggregate output
        "select s, count(1) as n from t group by s order by 2 desc, 1",
        # DISTINCT: ordinal satisfies the select-list rule
        "select distinct s from t order by 1 desc",
        # compound: ordinal resolves to the output column
        "select a from t union select b from t where b is not null "
        "order by 1 desc limit 4",
    ):
        _differ_ordered(eng, duck, src)


def test_order_by_ordinal_errors(env):
    for bad, m in (
        ("select a, b from t order by 3", "position 3"),
        ("select a from t order by 0", "position 0"),
        ("select a from t union select b from t order by 2",
         "position 2"),
    ):
        with pytest.raises(SqlppError, match=m):
            analyze(env, bad)
