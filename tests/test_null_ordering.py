"""ORDER BY NULL placement (late r14). The backends disagree when
left implicit — Spark ASC puts NULLs FIRST, DuckDB puts them LAST for
both directions, PG DESC puts them FIRST, SQLite ASC puts them FIRST —
which silently changes WHICH ROWS SURVIVE under LIMIT. The dialect
pins NULLS LAST for both directions (DuckDB's rule, so raw dialect
source stays runnable on the oracle engine), accepts explicit
``NULLS FIRST | LAST``, the Spark compiler always emits the explicit
ordering, and all SQL printers spell it out."""

from __future__ import annotations

import duckdb
import pytest

from sqlpp_spark.compiler.sqlgen import select_sql
from sqlpp_spark.frontend.analyze import Analyzer, Env, analyze
from sqlpp_spark.frontend.errors import SqlppError
from sqlpp_spark.frontend.parser import parse_query
from sqlpp_spark.frontend.printer import format_query

ROWS = [(1, 2), (2, None), (3, 4), (4, None), (5, 7)]
SCHEMA = "create table t (a int not null, b int);"


@pytest.fixture()
def eng(spark):
    from sqlpp_spark.engine import SqlppEngine

    eng = SqlppEngine(spark)
    eng.add_decls(SCHEMA)
    eng.register_df("t", spark.createDataFrame(ROWS, "a long, b long"))
    return eng


@pytest.fixture()
def duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE t (a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?)", ROWS)
    return con


def _differ_ordered(eng, duck, src):
    # ORDER-SENSITIVE comparison — the whole point of this suite
    rows = [tuple(r) for r in eng.fetch_list(src)]
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    sql = select_sql(info)
    want = [tuple(r) for r in duck.execute(sql).fetchall()]
    want2 = [tuple(r) for r in duck.execute(src).fetchall()]
    assert rows == want == want2, f"{src}\n{sql}\n{rows}\n{want}\n{want2}"


def test_pinned_default_nulls_last(eng, duck):
    for src in (
        # without the pin, Spark would return the NULL rows FIRST here
        "select t.b as b from t order by b",
        "select t.b as b from t order by b desc",
        # ...and under LIMIT that changes which rows survive
        "select t.a as a, t.b as b from t order by b limit 2",
        "select t.a as a, t.b as b from t order by b desc limit 2",
        "select t.a as a, t.b as b from t order by b, a desc limit 3",
    ):
        _differ_ordered(eng, duck, src)


def test_explicit_nulls_first_last(eng, duck):
    for src in (
        "select t.a as a, t.b as b from t order by b nulls first, a limit 2",
        "select t.a as a, t.b as b from t order by b desc nulls first",
        "select t.a as a, t.b as b from t order by b asc nulls last, "
        "a desc nulls first",
    ):
        _differ_ordered(eng, duck, src)


def test_window_order_nulls(eng, duck):
    # window ORDER BY uses the same pin: first_value over desc must
    # skip the NULLs (DuckDB raw-source agreement)
    for src in (
        "select t.a as a, first_value(t.a) over (order by t.b desc) "
        "as top from t order by a",
        "select t.a as a, rank() over (order by t.b nulls first) "
        "as rk from t order by a",
    ):
        _differ_ordered(eng, duck, src)


def test_window_evaluates_before_limit(eng, duck):
    # late-r14 pipeline fix: the projection (incl. windows) evaluates
    # BEFORE ORDER BY/LIMIT — rank() must be computed over ALL rows,
    # then the limit keeps the top 2 (the old tail ranked post-limit)
    _differ_ordered(
        eng, duck,
        "select t.a as a, rank() over (order by t.b desc) as rk "
        "from t order by a desc limit 2",
    )


def test_setop_order_nulls(eng, duck):
    _differ_ordered(
        eng, duck,
        "select t.b as b from t union all select t.b as b from t "
        "order by b desc limit 4",
    )


def test_printed_sql_is_explicit(eng):
    src = "select t.b as b from t order by b desc"
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    for d in ("duckdb", "postgres", "sqlite"):
        assert "DESC NULLS LAST" in select_sql(info, dialect=d)


def test_fmt_round_trip():
    for src in (
        "select t.b as b from t order by b nulls first",
        "select t.b as b from t order by b desc nulls last",
        "select t.b as b from t order by b",
    ):
        printed = format_query(parse_query(src))
        assert format_query(parse_query(printed)) == printed
        # explicit NULLS survives the round trip; implicit stays implicit
        assert ("nulls" in src.lower()) == ("NULLS" in printed)


def test_parse_error():
    with pytest.raises(SqlppError, match="FIRST or LAST"):
        parse_query("select t.b as b from t order by b nulls sideways")
