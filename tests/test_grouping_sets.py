"""GROUP BY ROLLUP / CUBE / GROUPING SETS + grouping() in the sqlpp
dialect (r14, beyond reference — the DataFrame-level registry twins
q_rollup/q_cube/q_grouping_sets have been driver-green since r01;
this closes the dialect-surface gap). Differential against DuckDB on
BOTH the printed SQL and the original source."""

from __future__ import annotations

import duckdb
import pytest

from sqlpp_spark.compiler.sqlgen import select_sql
from sqlpp_spark.frontend.analyze import Analyzer
from sqlpp_spark.frontend.errors import SqlppError
from sqlpp_spark.frontend.parser import parse_query
from sqlpp_spark.frontend.printer import format_query

T1 = [
    (1, 1, 10, "x"), (2, 1, 25, "y"), (3, 2, 30, "x"),
    (4, 3, 40, "y"), (5, 2, None, "x"),
]


@pytest.fixture()
def eng(spark):
    from sqlpp_spark.engine import SqlppEngine

    eng = SqlppEngine(spark)
    eng.add_decls(
        "create table t1 (id int not null, grp int not null, val int, "
        "tag string not null);"
    )
    eng.register_df(
        "t1",
        spark.createDataFrame(T1, "id long, grp long, val long, tag string"),
    )
    return eng


@pytest.fixture()
def duck():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t1 (id BIGINT, grp BIGINT, val BIGINT, tag VARCHAR)"
    )
    con.executemany("INSERT INTO t1 VALUES (?,?,?,?)", T1)
    return con


def _differ(eng, duck, src):
    rows = sorted(tuple(repr(x) for x in r) for r in eng.fetch_list(src))
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    sql = select_sql(info)
    want = sorted(tuple(repr(x) for x in r) for r in duck.execute(sql).fetchall())
    want2 = sorted(tuple(repr(x) for x in r) for r in duck.execute(src).fetchall())
    assert rows == want == want2, f"{src}\n{sql}"
    return info


def test_rollup_cube_sets_differential(eng, duck):
    for src in (
        "select grp, count(id) as n, sum(val) as s from t1 "
        "group by rollup (grp) order by grp, n",
        "select grp, tag, count(id) as n from t1 "
        "group by rollup (grp, tag) order by grp, tag, n",
        "select grp, tag, count(id) as n from t1 "
        "group by cube (grp, tag) order by grp, tag, n",
        "select grp, tag, count(id) as n from t1 group by grouping sets "
        "((grp, tag), (grp), ()) order by grp, tag, n",
        "select grp, tag, count(id) as n from t1 group by grouping sets "
        "((grp), (tag)) order by grp, tag, n",
        # grouping() separates subtotal NULLs from DATA NULLs (val has
        # a genuine NULL group in this fixture)
        "select val, grouping(val) as sub, count(id) as n from t1 "
        "group by rollup (val) order by sub, val, n",
        "select grp, tag, grouping(grp) as a, grouping(tag) as b, "
        "count(id) as n from t1 group by grouping sets ((grp), (tag)) "
        "order by a, b, grp, tag",
        # HAVING over a rollup
        "select grp, count(id) as n from t1 group by rollup (grp) "
        "having count(id) > 1 order by grp",
        # computed group expression
        "select grp + 1 as g1, count(id) as n from t1 "
        "group by rollup (grp + 1) order by g1, n",
    ):
        _differ(eng, duck, src)


def test_rollup_nullability_typing(eng):
    """Subtotal rows carry NULL group keys: projected group exprs
    under ROLLUP/CUBE become nullable even from NOT NULL columns; a
    GROUPING SETS expr present in EVERY set keeps its nullability;
    grouping() is NOT NULL int."""
    src = ("select grp, grouping(grp) as sub, count(id) as n from t1 "
           "group by rollup (grp)")
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    tys = dict(info.row)
    assert not tys["grp"].non_null
    assert tys["sub"].non_null and tys["sub"].kind == "int"
    src2 = ("select grp, tag, count(id) as n from t1 "
            "group by grouping sets ((grp, tag), (grp))")
    info2 = Analyzer(eng.env, src2).analyze_query(parse_query(src2))
    tys2 = dict(info2.row)
    assert tys2["grp"].non_null  # in every set
    assert not tys2["tag"].non_null  # missing from the (grp) set


def test_grouping_sets_errors(eng):
    for bad, m in (
        ("select grp, grouping(grp) as s from t1 group by grp",
         "requires GROUP BY ROLLUP"),
        ("select grp, grouping(val) as s, count(id) as n from t1 "
         "group by rollup (grp)", "must be a GROUP BY expression"),
        ("select tag, count(id) as n from t1 group by rollup (grp)",
         "not in GROUP BY"),
    ):
        with pytest.raises(SqlppError, match=m):
            eng.fetch_list(bad)
    # SQLite printer: documented divergence
    src = "select grp, count(id) as n from t1 group by rollup (grp)"
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    with pytest.raises(SqlppError, match="SQLite has no ROLLUP"):
        select_sql(info, dialect="sqlite")
    # postgres prints fine
    assert "ROLLUP" in select_sql(info, dialect="postgres")


def test_grouping_sets_fmt_roundtrip():
    for src in (
        "select g, count(x) as n from t group by rollup (g)",
        "select g, h, count(x) as n from t group by cube (g, h)",
        "select g, h, count(x) as n from t group by grouping sets "
        "((g, h), (g), ())",
    ):
        once = format_query(parse_query(src))
        again = format_query(parse_query(once))
        assert once == again


def test_rollup_empty_input_grand_total(eng, duck):
    """Standard-SQL corner Spark itself gets wrong (found by the r14
    hypothesis fuzzer): ROLLUP/CUBE over an EMPTY input must still
    emit the grand-total row (count 0, sums NULL, grouping 1) —
    bare Spark rollup yields zero rows; the compiler adds a
    literal-only fallback gated on the aggregated frame being empty
    (no second base scan)."""
    for src in (
        "select grp, grouping(grp) as g, count(id) as n, sum(val) as s "
        "from t1 where id < 0 group by rollup (grp)",
        "select grp, tag, count(id) as n from t1 where id < 0 "
        "group by cube (grp, tag)",
        "select grp, count(id) as n from t1 where id < 0 "
        "group by grouping sets ((grp), ())",
    ):
        _differ(eng, duck, src)
    # a GROUPING SETS list WITHOUT the () set stays empty on empty
    # input in both engines
    _differ(
        eng, duck,
        "select grp, count(id) as n from t1 where id < 0 "
        "group by grouping sets ((grp))",
    )


def test_grouping_sets_duplicate_empty_sets(eng, duck):
    """r15 (ADVICE r14, low): GROUPING SETS ((), ()) emits one
    grand-total row PER empty set on DuckDB/PG. Spark's Expand agrees
    on non-empty input; the empty-input fallback must union the
    literal row once per empty set, not once total."""
    for src in (
        # non-empty input: Spark Expand already duplicates — pin it
        "select count(id) as n, sum(val) as s from t1 "
        "group by grouping sets ((), ())",
        # empty input: the fallback row must appear TWICE
        "select count(id) as n, sum(val) as s from t1 where id < 0 "
        "group by grouping sets ((), ())",
        # mixed: one keyed set + two empty sets over empty input
        "select grp, count(id) as n from t1 where id < 0 "
        "group by grouping sets ((grp), (), ())",
        # duplicate non-empty sets duplicate their rows in both engines
        "select grp, count(id) as n from t1 "
        "group by grouping sets ((grp), (grp))",
    ):
        _differ(eng, duck, src)
