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
        magnitudes): histogram quantiles stay bit-equal to
        F.percentile."""
        df = spark.createDataFrame(data, "g string, v double")
        got = quantile_cont_hist(df, ["g"], "v", PS, NAMES)
        _assert_bit_equal(got, _reference(df, "g", "v"), "g")
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
