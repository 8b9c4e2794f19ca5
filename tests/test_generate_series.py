"""``FROM generate_series(start, stop [, step]) AS t(col)`` (r15 third
wave, beyond reference) — the synthetic-range / date-spine table
function. Bounds INCLUSIVE (DuckDB/PG convention); Spark lowering is
spark.range (exclusive end widened by one step-sign) — a Range node
splits across executors, so the spine parallelizes with no data
source at any scale.

Pinned divergence: the ENGINE (and PG) return the EMPTY series on a
direction mismatch (start > stop with positive step); DuckDB's native
generate_series/range BIND-error there, so the DuckDB printing clamps
the stop with a CASE and the original-source differential skips the
empty-range shapes.
"""

from __future__ import annotations

import duckdb
import pytest

from sqlpp_spark.compiler.sqlgen import select_sql
from sqlpp_spark.frontend.analyze import Analyzer
from sqlpp_spark.frontend.errors import SqlppError
from sqlpp_spark.frontend.parser import parse_query
from sqlpp_spark.frontend.printer import format_query

T1 = [(1, 5), (2, None), (3, 9)]


@pytest.fixture()
def eng(spark):
    from sqlpp_spark.engine import SqlppEngine

    eng = SqlppEngine(spark)
    eng.add_decls("create table t1 (id int not null, x int);")
    eng.register_df("t1", spark.createDataFrame(T1, "id long, x long"))
    return eng


@pytest.fixture()
def duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE t1 (id BIGINT, x BIGINT)")
    con.executemany("INSERT INTO t1 VALUES (?,?)", T1)
    return con


SOURCES = (
    "select g.i as i from generate_series(1, 5) as g(i) order by i",
    "select g.i as i from generate_series(0, 10, 3) as g(i) order by i",
    # negative step, inclusive both ends
    "select g.i as i from generate_series(5, 1, -2) as g(i) order by i",
    # empty series (direction mismatch) — engine/PG semantics
    "select count(1) as n from generate_series(7, 3) as g(i) group by ()",
    "select count(1) as n from generate_series(1, 5, -1) as g(i) "
    "group by ()",
    # the spine idiom: LEFT JOIN facts onto a dense range
    "select g.i as i, t1.x as x from generate_series(1, 3) as g(i) "
    "left join t1 on g.i = t1.id order by i",
    # aggregate over a pure range
    "select sum(g.i) as s, count(1) as n from "
    "generate_series(1, 1000) as g(i) group by ()",
    # series in a derived table / compound
    "select v from (select g.i as v from generate_series(1, 3) as g(i) "
    "union all select g2.i from generate_series(5, 6) as g2(i)) as u "
    "order by v",
)


def test_generate_series_differential(eng, duck):
    for src in SOURCES:
        rows = [tuple(repr(v) for v in r) for r in eng.fetch_list(src)]
        info = Analyzer(eng.env, src).analyze_query(parse_query(src))
        sql = select_sql(info)
        want = [tuple(repr(v) for v in r) for r in duck.execute(sql).fetchall()]
        assert rows == want, f"{src}\n{sql}"
        if "(7, 3)" in src or "-1)" in src:
            continue  # DuckDB native errors on empty ranges (pinned)
        want2 = [tuple(repr(v) for v in r) for r in duck.execute(src).fetchall()]
        assert rows == want2, src


def test_generate_series_params(eng):
    rows = eng.fetch_list(
        "select g.i as i from generate_series(?lo:int not null, "
        "?hi:int not null) as g(i) order by i",
        lo=2, hi=4,
    )
    assert [tuple(r) for r in rows] == [(2,), (3,), (4,)]


def test_generate_series_errors(eng):
    with pytest.raises(SqlppError, match="nonzero"):
        eng.fetch_list(
            "select g.i as i from generate_series(1, 5, 0) as g(i)"
        )
    with pytest.raises(SqlppError):
        eng.fetch_list(
            "select g.i as i from generate_series(1) as g(i)"
        )
    with pytest.raises(SqlppError):
        eng.fetch_list(
            "select g.i as i from generate_series('a', 'b') as g(i)"
        )


def test_generate_series_sqlite_divergence(eng):
    src = "select g.i as i from generate_series(1, 3) as g(i)"
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    with pytest.raises(SqlppError, match="backend divergence"):
        select_sql(info, dialect="sqlite")


def test_generate_series_postgres_native(eng):
    src = "select g.i as i from generate_series(1, 3) as g(i)"
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    assert "generate_series(1, 3)" in select_sql(info, dialect="postgres")


def test_generate_series_format_roundtrip(eng):
    src = "select g.i as i from generate_series(5, 1, -2) as g(i) order by i"
    printed = format_query(parse_query(src))
    assert "generate_series(5, 1, -2) AS g(i)" in printed
    assert eng.fetch_list(printed) == eng.fetch_list(src)


def test_generate_series_plan_is_range(eng):
    # the spine is a Range node — no scan, no shuffle to produce it
    df = eng.query("select g.i as i from generate_series(1, 100) as g(i)")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Range (1, 101" in plan
    assert "Exchange" not in plan


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        start=st.integers(-15, 15),
        stop=st.integers(-15, 15),
        step=st.integers(-4, 4).filter(lambda s: s != 0),
    )
    def test_generate_series_bounds_property(spark, start, stop, step):
        """Property arm: any (start, stop, step != 0) triple yields the
        inclusive arithmetic progression — including empty on direction
        mismatch — identical to the CASE-clamped DuckDB printing."""
        from sqlpp_spark.engine import SqlppEngine

        eng = SqlppEngine(spark)
        src = (
            f"select g.i as i from generate_series({start}, {stop}, "
            f"{step}) as g(i) order by i"
        )
        rows = [r[0] for r in eng.fetch_list(src)]
        lo_ok = (step > 0 and start <= stop) or (step < 0 and start >= stop)
        want = sorted(range(start, stop + (1 if step > 0 else -1), step)) \
            if lo_ok else []
        assert rows == want, (src, rows, want)
        info = Analyzer(eng.env, src).analyze_query(parse_query(src))
        got = sorted(
            x[0] for x in duckdb.connect().execute(select_sql(info)).fetchall()
        )
        assert got == want, (src, got, want)
except ImportError:  # pragma: no cover
    pass
