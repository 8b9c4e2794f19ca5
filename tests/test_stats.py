"""quantile_cont_hist: bit-equality with F.percentile (the exact
engine reference) across real tables and adversarial shapes."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sqlpp_spark.ops.stats import quantile_cont_hist

PS = [0.0, 0.25, 0.5, 0.9, 0.99, 1.0]
NAMES = [f"q{i}" for i in range(len(PS))]


def _reference(df, group, value):
    return df.groupBy(group).agg(
        *[
            F.percentile(value, F.lit(p)).alias(n)
            for p, n in zip(PS, NAMES)
        ]
    )


def _assert_bit_equal(got_df, exp_df, group):
    got = {r[group]: [r[n] for n in NAMES] for r in got_df.collect()}
    exp = {r[group]: [r[n] for n in NAMES] for r in exp_df.collect()}
    assert set(got) == set(exp)
    for g in exp:
        for a, b in zip(got[g], exp[g]):
            if b is None:
                assert a is None, (g, a, b)
            else:
                # bit-equal, not approx: both implement
                # v_lo + (pos - floor(pos)) * (v_hi - v_lo)
                assert a == b or (math.isnan(a) and math.isnan(b)), (g, a, b)


def test_hist_quantile_matches_percentile_lineitem(spark, sf_dir):
    from sqlpp_spark.sources.tables import read_table

    l = read_table(spark, sf_dir, "lineitem")
    got = quantile_cont_hist(l, ["l_returnflag"], "l_quantity", PS, NAMES)
    _assert_bit_equal(got, _reference(l, "l_returnflag", "l_quantity"), "l_returnflag")


def test_hist_quantile_matches_percentile_documents(spark, sf_dir):
    from sqlpp_spark.sources.tables import read_table

    d = read_table(spark, sf_dir, "documents")
    got = quantile_cont_hist(d, ["lang"], "n_chars", PS, NAMES)
    _assert_bit_equal(got, _reference(d, "lang", "n_chars"), "lang")


def test_hist_quantile_adversarial_shapes(spark):
    rows = (
        # group a: single value
        [("a", 7.0)]
        # group b: two values, heavy ties
        + [("b", 1.0)] * 5
        + [("b", 100.0)] * 3
        # group c: nulls mixed in (ignored by quantile, counted by n)
        + [("c", None), ("c", 2.0), ("c", None), ("c", 4.0)]
        # group d: all null -> every quantile null, n_rows = 2
        + [("d", None), ("d", None)]
        # group e: negative + fractional values
        + [("e", -3.5), ("e", -1.25), ("e", 0.0), ("e", 9.75)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    got = quantile_cont_hist(df, ["g"], "v", PS, NAMES, count_name="n_rows")
    _assert_bit_equal(got, _reference(df, "g", "v"), "g")
    n = {r.g: r.n_rows for r in got.collect()}
    assert n == {"a": 1, "b": 8, "c": 4, "d": 2, "e": 4}


def test_hist_quantile_empty_input(spark):
    df = spark.createDataFrame([], "g string, v double")
    out = quantile_cont_hist(df, ["g"], "v", [0.5], ["p50"])
    assert out.count() == 0


def test_hist_quantile_no_row_sort_in_plan(spark, sf_dir):
    """The scale contract: no Sort over the full row stream — the only
    sort the plan may contain is the window over histogram rows, which
    runs AFTER the (group, value) partial aggregation."""
    from sqlpp_spark.sources.tables import read_table

    d = read_table(spark, sf_dir, "documents")
    got = quantile_cont_hist(d, ["lang"], "n_chars", [0.5], ["p50"])
    plan = got._jdf.queryExecution().executedPlan().toString()
    # F.percentile would show Percentile in the aggregate; the
    # histogram form must not use it.
    assert "percentile" not in plan.lower()
    # The partial (map-side) hash aggregate over (lang, n_chars) must
    # exist before any exchange — that is what bounds the shuffle.
    assert "HashAggregate" in plan


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        data=st.lists(
            st.tuples(
                st.sampled_from(["a", "b", "c"]),
                st.one_of(
                    st.none(),
                    st.integers(-50, 50).map(float),
                    st.floats(-1e6, 1e6, allow_nan=False),
                ),
            ),
            min_size=1,
            max_size=60,
        )
    )
    def test_hist_quantile_property(spark, data):
        """Random groups/values (ties, negatives, nulls, mixed
        magnitudes): histogram quantiles stay bit-equal to the PINNED
        interpolation semantics — (hi-pos)·v_lo + (pos-lo)·v_hi, the
        formula DuckDB quantile_cont (the driver oracle) executes.

        The reference is a Python replay of that formula, NOT
        F.percentile: Spark's Percentile short-circuits tied keys
        (``if higherKey == lowerKey return lowerKey``) while the lerp
        of a tied value can round one ulp away (e.g. two 5e-324 rows
        at p=0.5 lerp to 0.0 — verified identical in DuckDB 1.0 — and
        a r19 sweep found normal-value examples too), so bit-equality
        with F.percentile is provably unattainable on tied keys while
        matching the oracle. The real-table tests above keep the
        F.percentile cross-check on tie-safe integer domains."""
        df = spark.createDataFrame(data, "g string, v double")
        got = quantile_cont_hist(df, ["g"], "v", PS, NAMES)
        exp = {}
        by_g: dict = {}
        for g, v in data:
            by_g.setdefault(g, [])
            if v is not None:
                by_g[g].append(v)
        for g, vs in by_g.items():
            vs.sort()
            row = []
            for p in PS:
                if not vs:
                    row.append(None)
                    continue
                pos = p * (len(vs) - 1)
                lo, hi = math.floor(pos), math.ceil(pos)
                if lo == hi:
                    row.append(vs[lo])
                else:
                    row.append(
                        (hi - pos) * vs[lo] + (pos - lo) * vs[hi]
                    )
            exp[g] = row
        got_rows = {r["g"]: [r[n] for n in NAMES] for r in got.collect()}
        assert set(got_rows) == set(exp)
        for g in exp:
            for a, b in zip(got_rows[g], exp[g]):
                if b is None:
                    assert a is None, (g, a, b)
                else:
                    assert a == b or (
                        math.isnan(a) and math.isnan(b)
                    ), (g, a, b)
except ImportError:  # pragma: no cover
    pass


def test_hist_quantile_multiple_group_cols(spark):
    """group_cols is a LIST — two-key grouping must work and match the
    reference per composite group."""
    rows = [
        ("a", 1, 1.0), ("a", 1, 3.0), ("a", 2, 5.0),
        ("b", 1, 2.0), ("b", 1, 4.0), ("b", 2, 9.0), ("b", 2, 7.0),
    ]
    df = spark.createDataFrame(rows, "g1 string, g2 int, v double")
    got = {
        (r.g1, r.g2): r.p50
        for r in quantile_cont_hist(df, ["g1", "g2"], "v", [0.5], ["p50"]).collect()
    }
    exp = {
        (r.g1, r.g2): r.p50
        for r in df.groupBy("g1", "g2")
        .agg(F.percentile("v", F.lit(0.5)).alias("p50"))
        .collect()
    }
    assert got == exp


def test_hist_quantile_max_distinct_guard(spark):
    """A continuous double column (every value distinct) must trip the
    max_distinct guard at execution time instead of silently building
    an unbounded histogram; the same data under a generous bound works."""
    import pytest

    rows = [("g", float(i) * 1.000001) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, v double")
    guarded = quantile_cont_hist(df, ["g"], "v", [0.5], ["p50"], max_distinct=50)
    with pytest.raises(Exception, match="max_distinct"):
        guarded.collect()
    ok = quantile_cont_hist(df, ["g"], "v", [0.5], ["p50"], max_distinct=500)
    exp = df.groupBy("g").agg(F.percentile("v", F.lit(0.5)).alias("p50"))
    assert ok.collect()[0].p50 == exp.collect()[0].p50


def test_hist_quantile_bigint_beyond_double_precision(spark):
    """bigints with |v| > 2^53: the histogram keys on the NATIVE long,
    so values that collapse to the same double stay distinct rows and
    the quantile index counts them separately (ADVICE r7 fix). The
    interpolated output is a double either way — compare against
    F.percentile, which shares that output type."""
    base = 1 << 55
    # base, base+1, base+2, base+3 are 4 distinct longs but only 2
    # distinct doubles (1-ulp spacing at 2^55 is 4)
    rows = [("g", base + i) for i in range(4)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = quantile_cont_hist(df, ["g"], "v", [0.0, 0.5, 1.0], ["p0", "p50", "p100"])
    exp = df.groupBy("g").agg(
        *[F.percentile("v", F.lit(p)).alias(n)
          for p, n in zip([0.0, 0.5, 1.0], ["p0", "p50", "p100"])]
    )
    g, e = got.collect()[0], exp.collect()[0]
    assert (g.p0, g.p50, g.p100) == (e.p0, e.p50, e.p100)
    # and the histogram itself kept 4 distinct buckets: a double-keyed
    # histogram would have merged to 2 and shifted the p50 index
    hist_rows = (
        df.groupBy("g", F.col("v").alias("val")).count().collect()
    )
    assert len(hist_rows) == 4


def test_hist_quantile_subnormal_ties_match_duckdb(spark):
    """The corner that split the engines (r19): two tied subnormal
    values at p=0.5 — the pinned lerp gives 0.0 (0.5*5e-324 rounds to
    zero twice), which is exactly what DuckDB quantile_cont (the
    driver oracle) computes; F.percentile would return 5e-324."""
    import duckdb

    df = spark.createDataFrame(
        [("b", 5e-324), ("b", 5e-324)], "g string, v double"
    )
    got = quantile_cont_hist(df, ["g"], "v", [0.5, 0.25], ["p50", "p25"])
    r = got.collect()[0]
    want = duckdb.connect().execute(
        "SELECT quantile_cont(x, 0.5), quantile_cont(x, 0.25) "
        "FROM (VALUES (5e-324),(5e-324)) t(x)"
    ).fetchone()
    assert (r["p50"], r["p25"]) == want == (0.0, 5e-324)
