"""``x [NOT] IN (v1, v2, ...)`` value lists (r14, beyond reference —
the reference grammar's Expr_in takes only a subquery, parser.mly).
Dedicated EInList node → Column.isin → Catalyst In/InSet: ONE
pushdown-able predicate, not an OR chain. Exact SQL 3VL (NULL probe /
NULL item → UNKNOWN — the NOT IN trap). Differential against DuckDB
on BOTH the printed SQL and the original source."""

from __future__ import annotations

import duckdb
import pytest

from sqlpp_spark.compiler.sqlgen import select_sql
from sqlpp_spark.frontend.analyze import Analyzer, Env, analyze
from sqlpp_spark.frontend.errors import SqlppError
from sqlpp_spark.frontend.parser import parse_query
from sqlpp_spark.frontend.printer import format_query

ROWS = [(1, 2, "x"), (2, None, "a"), (3, 4, "q"), (4, 5, "m"), (5, 7, "b")]
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


def _differ(eng, duck, src, **params):
    rows = sorted(tuple(repr(x) for x in r) for r in eng.fetch_list(src, **params))
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    sql = select_sql(info, params or None)
    want = sorted(tuple(repr(x) for x in r) for r in duck.execute(sql).fetchall())
    want2 = sorted(tuple(repr(x) for x in r) for r in duck.execute(src).fetchall())
    assert rows == want == want2, f"{src}\n{sql}"


def test_in_list_differentials(eng, duck):
    for src in (
        "select t.a as a from t where t.a in (1, 3, 5) order by a",
        "select t.a as a from t where t.a not in (1, 3) order by a",
        # 3VL: NULL probe rows are UNKNOWN → excluded in BOTH forms
        "select t.a as a from t where t.b in (2, 4) order by a",
        "select t.a as a from t where t.b not in (2, 4) order by a",
        # non-literal items
        "select t.a as a from t where t.b not in (2, t.b - t.b + 4) order by a",
        # flag position and GROUP BY key
        "select t.a as a, t.b in (2, 7) as flag from t order by a",
        "select t.s in ('x', 'a') as sf, count(1) as n "
        "from t group by t.s in ('x', 'a') order by sf",
        # NNF: NOT over an IN list flips to NOT IN (exact 3VL)
        "select t.a as a from t where not (t.a in (1, 2)) order by a",
        # numeric-family mixing (int probe, float item)
        "select t.a as a from t where t.a in (1, 1.5, 3) order by a",
        # single-element list
        "select t.a as a from t where t.s in ('x') order by a",
    ):
        _differ(eng, duck, src)


def test_in_list_with_param(eng, duck):
    src = "select t.a as a from t where t.a in (?lo : int, 3, 5) order by a"
    rows = [tuple(r) for r in eng.fetch_list(src, lo=1)]
    assert rows == [(1,), (3,), (5,)]


def test_typing(env):
    info = analyze(
        env,
        "select t.a in (1, 2) as f1, t.b in (1, 2) as f2, "
        "t.a in (1, t.b) as f3 from t",
    )
    assert [(n, str(t)) for n, t in info.row] == [
        ("f1", "BOOL NOT NULL"), ("f2", "BOOL NULL"), ("f3", "BOOL NULL"),
    ]


def test_fmt_round_trip(env):
    for src in (
        "select t.a as a from t where t.a in (1, 2, 3)",
        "select t.a as a from t where t.s not in ('x', 'y')",
    ):
        printed = format_query(parse_query(src))
        assert format_query(parse_query(printed)) == printed
        analyze(env, printed)


def test_subquery_form_still_parses(env):
    # one token of lookahead: IN (select ...) stays an EIn subquery
    info = analyze(
        env,
        "select t.a as a from t "
        "where t.a in (select t2.a from t as t2 where t2.a > 2)",
    )
    assert [n for n, _t in info.row] == ["a"]


def test_errors(env):
    with pytest.raises(SqlppError):  # type mismatch
        analyze(env, "select t.a as a from t where t.a in (1, 'x')")
    with pytest.raises(SqlppError, match="subqueries"):
        analyze(
            env,
            "select t.a as a from t where t.a in "
            "(1, (select count(1) from t as t2 group by ()))",
        )
    with pytest.raises(SqlppError):  # empty list is a parse error
        parse_query("select t.a as a from t where t.a in ()")


def test_pushdown_to_parquet_scan(spark, tmp_path):
    # the whole point of EInList-as-In: the predicate reaches the scan
    from sqlpp_spark.engine import SqlppEngine

    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(ROWS, "a long, b long, s string").write.parquet(p)
    eng = SqlppEngine(spark)
    eng.add_decls(SCHEMA)
    eng.register_parquet("t", p)
    df = eng.query("select t.a as a from t where t.a in (1, 3, 5)")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(a, [1,3,5])]" in plan, plan
