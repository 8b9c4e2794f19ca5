"""median / corr / covar_samp / covar_pop aggregates (r15 third wave,
beyond reference — completes the statistical family started in r14).

median: exact (both engines interpolate the even-count midpoint —
dyadic, so bit-equal). covar_*: closed-form over integer sums — exact
for integer-valued columns, bit-equal. corr: Spark and DuckDB use
different one-pass formulations that differ in the LAST ULP
(0.9933992677987828 vs ...27 on the battery data) — compared with a
1e-9 relative tolerance here, and the registry entry oracles it with
the tolerance-boolean pattern (the established stats approach,
sqlpp_stats_aggs).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from sqlpp_spark.compiler.sqlgen import select_sql
from sqlpp_spark.frontend.analyze import Analyzer
from sqlpp_spark.frontend.errors import SqlppError
from sqlpp_spark.frontend.parser import parse_query

T1 = [
    (1, 1, 1, 2), (2, 1, 2, 4), (3, 1, 3, 7), (4, 2, 10, 1),
    (5, 2, None, 5), (6, 3, 4, None), (7, 3, 6, 9), (8, 4, None, None),
]


@pytest.fixture()
def eng(spark):
    from sqlpp_spark.engine import SqlppEngine

    eng = SqlppEngine(spark)
    eng.add_decls(
        "create table t1 (id int not null, grp int not null, x int, y int);"
    )
    eng.register_df(
        "t1", spark.createDataFrame(T1, "id long, grp long, x long, y long")
    )
    return eng


@pytest.fixture()
def duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE t1 (id BIGINT, grp BIGINT, x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t1 VALUES (?,?,?,?)", T1)
    return con


def _close(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-12)
    return a == b


def _differ_tol(eng, duck, src):
    rows = sorted(tuple(r) for r in eng.fetch_list(src))
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    sql = select_sql(info)
    want = sorted(tuple(r) for r in duck.execute(sql).fetchall())
    want2 = sorted(tuple(r) for r in duck.execute(src).fetchall())
    for got, w, w2 in zip(rows, want, want2):
        assert len(got) == len(w) == len(w2)
        for g, a, b in zip(got, w, w2):
            assert _close(g, a) and _close(g, b), f"{src}\n{sql}\n{g} {a} {b}"
    assert len(rows) == len(want) == len(want2)


SOURCES = (
    # median: odd group (exact element), even group via interpolation,
    # all-NULL group (NULL), global form
    "select grp, median(x) as med from t1 group by grp order by grp",
    "select median(x) as med, median(y) as medy from t1 group by ()",
    # covariance: NULL pairs drop (only rows with BOTH sides non-null
    # count); n=1 group -> covar_samp NULL, covar_pop 0
    "select grp, covar_pop(x, y) as cp, covar_samp(x, y) as cs "
    "from t1 group by grp order by grp",
    # correlation: ulp-tolerant; zero-variance and n<2 groups -> NULL
    "select grp, corr(x, y) as r from t1 group by grp order by grp",
    "select corr(x, y) as r from t1 group by ()",
    # alongside the r14 family and FILTER
    "select grp, median(x) as med, stddev(x) as sd, "
    "corr(x, y) filter (where y > 1) as r2 "
    "from t1 group by grp order by grp",
)


def test_stat_aggs_differential(eng, duck):
    for src in SOURCES:
        _differ_tol(eng, duck, src)


def test_stat_aggs_window_forms(eng, duck):
    # median/corr lack window forms on purpose (neither engine's
    # t-digest-free exact median windows portably); the r14 stat
    # window family is unchanged — pin that median OVER errors cleanly
    with pytest.raises(SqlppError, match="unknown window function"):
        eng.fetch_list(
            "select median(x) over (partition by grp) as m from t1"
        )


def test_stat_aggs_type_and_arity_errors(eng):
    with pytest.raises(SqlppError):
        eng.fetch_list("select corr(x) as r from t1 group by ()")
    with pytest.raises(SqlppError):
        eng.fetch_list(
            "select median(toString(x)) as m from t1 group by ()"
        )


def test_stat_aggs_sqlite_divergence(eng):
    src = "select median(x) as m from t1 group by ()"
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    with pytest.raises(SqlppError, match="backend divergence"):
        select_sql(info, dialect="sqlite")


def test_stat_aggs_postgres_rendering(eng):
    src = (
        "select median(x) as m, corr(x, y) as r from t1 group by ()"
    )
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    sql = select_sql(info, dialect="postgres")
    assert "percentile_cont(0.5)" in sql and "corr(" in sql


ARG_T = [
    (1, "a", 10), (1, "b", 5), (1, None, 30),
    (2, "c", None), (2, "d", None), (3, "e", 7),
]


@pytest.fixture()
def eng2(spark):
    from sqlpp_spark.engine import SqlppEngine

    eng = SqlppEngine(spark)
    eng.add_decls("create table ta (g int not null, x string, y int);")
    eng.register_df(
        "ta", spark.createDataFrame(ARG_T, "g long, x string, y long")
    )
    return eng


@pytest.fixture()
def duck2():
    con = duckdb.connect()
    con.execute("CREATE TABLE ta (g BIGINT, x VARCHAR, y BIGINT)")
    con.executemany("INSERT INTO ta VALUES (?,?,?)", ARG_T)
    return con


def test_arg_min_max_differential(eng2, duck2):
    """arg_min/arg_max (r15): the value at the group's extreme key.
    PINNED: rows with a NULL value are skipped (DuckDB's arg_max
    semantics — Spark's raw max_by would return the NULL value when
    its key is extreme, so the compile nulls the key for NULL-value
    rows); NULL keys never win; NULL over all-skipped groups."""
    for src in (
        "select g, arg_max(x, y) as best, arg_min(x, y) as worst "
        "from ta group by g order by g",
        "select arg_max(x, y) as best from ta group by ()",
        "select g, arg_max(x, y) filter (where y < 30) as best "
        "from ta group by g order by g",
        "select g, arg_min(y, x) as yv from ta group by g order by g",
    ):
        rows = sorted(
            tuple(repr(v) for v in r) for r in eng2.fetch_list(src)
        )
        info = Analyzer(eng2.env, src).analyze_query(parse_query(src))
        sql = select_sql(info)
        want = sorted(
            tuple(repr(v) for v in r) for r in duck2.execute(sql).fetchall()
        )
        want2 = sorted(
            tuple(repr(v) for v in r) for r in duck2.execute(src).fetchall()
        )
        assert rows == want == want2, f"{src}\n{sql}"


def test_arg_max_divergence_raises(eng2):
    src = "select arg_max(x, y) as b from ta group by ()"
    info = Analyzer(eng2.env, src).analyze_query(parse_query(src))
    for d in ("postgres", "sqlite"):
        with pytest.raises(SqlppError, match="backend divergence"):
            select_sql(info, dialect=d)


def test_sum_avg_distinct_differential(eng, duck):
    """sum/avg(DISTINCT x) (r15): dedup before aggregating —
    count(DISTINCT) generalized to the classic five (min/max DISTINCT
    are no-ops and desugar away at parse time). avg_distinct composes
    sum_distinct/count_distinct on Spark (no builtin; same shuffle)."""
    for src in (
        "select grp, sum(distinct x) as sd, avg(distinct x) as ad, "
        "count(distinct x) as cd, max(distinct x) as mx "
        "from t1 group by grp order by grp",
        "select sum(distinct x) as sd, avg(distinct y) as ad "
        "from t1 group by ()",
        "select grp, sum(distinct x) filter (where x > 2) as sdf "
        "from t1 group by grp order by grp",
    ):
        rows = sorted(tuple(repr(v) for v in r) for r in eng.fetch_list(src))
        info = Analyzer(eng.env, src).analyze_query(parse_query(src))
        sql = select_sql(info)
        want = sorted(
            tuple(repr(v) for v in r) for r in duck.execute(sql).fetchall()
        )
        want2 = sorted(
            tuple(repr(v) for v in r) for r in duck.execute(src).fetchall()
        )
        assert rows == want == want2, f"{src}\n{sql}"


def test_percentile_cont_differential(eng, duck):
    """percentile_cont(x, p) (r15): EXACT interpolated percentile —
    Spark F.percentile and DuckDB quantile_cont share the
    rank-p*(n-1) linear-interpolation formula (probed bit-identical
    including ulp artifacts like 7.6000000000000005)."""
    for src in (
        "select grp, percentile_cont(x, 0.25) as p25, "
        "percentile_cont(x, 0.9) as p90 from t1 group by grp "
        "order by grp",
        "select percentile_cont(x, 0.5) as med, "
        "percentile_cont(y, 0.0) as mn, percentile_cont(y, 1.0) as mx "
        "from t1 group by ()",
        "select grp, percentile_cont(x, 0.75) filter (where x < 10) "
        "as p from t1 group by grp order by grp",
    ):
        rows = sorted(tuple(repr(v) for v in r) for r in eng.fetch_list(src))
        info = Analyzer(eng.env, src).analyze_query(parse_query(src))
        sql = select_sql(info)
        want = sorted(
            tuple(repr(v) for v in r) for r in duck.execute(sql).fetchall()
        )
        assert rows == want, f"{src}\n{sql}"
    # percentile must be a literal in [0, 1]
    with pytest.raises(SqlppError, match="literal"):
        eng.fetch_list(
            "select percentile_cont(x, y) as p from t1 group by ()"
        )
    with pytest.raises(SqlppError, match="literal"):
        eng.fetch_list(
            "select percentile_cont(x, 1.5) as p from t1 group by ()"
        )


def test_mode_differential(eng2, duck2):
    """mode() (r15): most frequent non-NULL value; NULLs are skipped
    on both engines (probed); all-NULL groups yield NULL. Ties are
    engine-unspecified in BOTH — the battery data has a unique mode
    per group (same determinism caveat as arg_min/arg_max)."""
    duck2.execute("CREATE TABLE tm (g BIGINT, x VARCHAR)")
    TM = [(1, "a"), (1, "a"), (1, "b"), (2, None), (2, None), (2, "c"),
          (3, None)]
    duck2.executemany("INSERT INTO tm VALUES (?,?)", TM)
    eng2.add_decls("create table tm (g int not null, x string);")
    eng2.register_df(
        "tm", eng2.spark.createDataFrame(TM, "g long, x string")
    )
    for src in (
        "select g, mode(x) as m from tm group by g order by g",
        "select mode(x) as m from tm group by ()",
        "select g, mode(x) filter (where x != 'a') as m from tm "
        "group by g order by g",
    ):
        rows = sorted(tuple(repr(v) for v in r) for r in eng2.fetch_list(src))
        from sqlpp_spark.frontend.analyze import Analyzer
        from sqlpp_spark.frontend.parser import parse_query
        info = Analyzer(eng2.env, src).analyze_query(parse_query(src))
        sql = select_sql(info)
        want = sorted(
            tuple(repr(v) for v in r) for r in duck2.execute(sql).fetchall()
        )
        want2 = sorted(
            tuple(repr(v) for v in r) for r in duck2.execute(src).fetchall()
        )
        assert rows == want == want2, f"{src}\n{sql}"
