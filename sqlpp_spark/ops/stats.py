"""Distribution statistics that stay exact AND scale.

``quantile_cont_hist`` computes exact linear-interpolated quantiles
(SQL ``quantile_cont`` / Spark ``percentile`` semantics) WITHOUT
sorting each group's rows in one task. The trick: quantiles of a
column with a bounded value domain (string/token lengths, quantities,
scores) are a function of the value HISTOGRAM, which is a partial
aggregation — map-side combine collapses each partition to its
(group, value, count) triples before any shuffle.

Plan shape at 100 TB:

1. ``groupBy(group, value).count()`` — shuffle moves only distinct
   (group, value) pairs per partition (bounded by the value domain,
   NOT the row count; for document lengths that is ~1e5 rows per
   group regardless of corpus size).
2. A cumulative-count window per group over the histogram rows —
   sorts distinct values only, thousands of rows per group.
3. The quantile index is located with a conditional aggregate
   (the row whose cumulative range covers ``floor(p*(n-1))``), and
   interpolated with Spark's exact formula
   ``v_lo + (pos - floor(pos)) * (v_hi - v_lo)`` —
   bit-equal to ``F.percentile`` / DuckDB ``quantile_cont``.

Compare: ``F.percentile`` buffers and sorts EVERY row of a group in
one aggregation buffer (OOM + straggler at 100 TB);
``approx_percentile`` fixes memory but gives up exactness and
oracle-ability. The histogram form keeps both whenever the value
domain is bounded — which covers every quantile query this engine
registers. (For genuinely unbounded continuous domains, quantize
first or fall back to ``approx_percentile``.)
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def quantile_cont_hist(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str | Column,
    percentiles: Sequence[float],
    out_names: Sequence[str],
    count_name: str | None = None,
    max_distinct: int | None = None,
) -> DataFrame:
    """Exact per-group quantiles via value histogram.

    Returns one row per group: ``group_cols + [count_name?] +
    out_names`` (quantiles as double, null when the group has no
    non-null value — same as ``percentile``). Rows with a null value
    count toward ``count_name`` (COUNT(*) semantics) but are excluded
    from the quantile index, matching aggregate-null semantics.

    The histogram is keyed on the NATIVE value (cast to double only in
    the interpolation arithmetic), so bigint domains with |v| > 2^53
    keep exact per-value counts instead of collapsing nearby longs
    into one double bucket. Interpolated OUTPUT is still a double —
    matching ``F.percentile`` / ``quantile_cont``, whose results are
    doubles — so the usual < 2^53 caveat applies to the returned
    quantile value itself, not to which rows it was computed from.

    ``max_distinct`` guards the bounded-domain precondition at runtime:
    when set, any group whose histogram exceeds that many distinct
    values fails the job (a plan-side ``assert_true``, no extra action)
    instead of silently inflating the shuffle. For genuinely unbounded
    continuous domains, quantize first or use ``approx_percentile``.
    """
    if len(percentiles) != len(out_names):
        raise ValueError("percentiles and out_names must align")
    gcols = list(group_cols)
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    hist = df.groupBy(*gcols, v.alias("__v")).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    # Nulls sort first so the cumulative count over non-null rows
    # starts at 0 exactly where the value index starts.
    w_cum = (
        Window.partitionBy(*gcols)
        .orderBy(F.col("__v").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*gcols)
    cnt_nn = F.when(F.col("__v").isNotNull(), F.col("__cnt")).otherwise(F.lit(0))
    h = (
        hist.withColumn("__cum", F.sum(cnt_nn).over(w_cum))
        .withColumn("__n", F.sum(cnt_nn).over(w_all))
    )
    if max_distinct is not None:
        # count() over the unordered full-group window counts histogram
        # rows = distinct values in the group. assert_true returns null
        # when the bound holds (so the filter keeps every row) and
        # raises at execution time when it doesn't — a lazy, fully
        # distributed guard that Catalyst cannot prune away.
        h = (
            h.withColumn("__nd", F.count(F.col("__v")).over(w_all))
            .where(
                F.assert_true(
                    F.col("__nd") <= F.lit(int(max_distinct)),
                    F.concat(
                        F.lit(
                            "quantile_cont_hist: group exceeds max_distinct="
                            f"{int(max_distinct)} distinct values ("
                        ),
                        F.col("__nd").cast("string"),
                        F.lit("); quantize the column or use approx_percentile"),
                    ),
                ).isNull()
            )
            .drop("__nd")
        )
    aggs: list[Column] = []
    if count_name is not None:
        aggs.append(F.sum("__cnt").cast("bigint").alias(count_name))
    for p, name in zip(percentiles, out_names):
        # All of pos/lo/hi are per-group constants (functions of __n),
        # evaluated row-wise inside the conditional aggregates.
        pos = F.lit(float(p)) * (F.col("__n") - F.lit(1)).cast("double")
        lo = F.floor(pos)
        hi = F.ceil(pos)
        in_range = lambda idx: (  # noqa: E731 — row covers index iff
            ((F.col("__cum") - F.col("__cnt")) <= idx) & (idx < F.col("__cum"))
        )
        # Cast to double HERE (not in the histogram key): the engine
        # formula and its output type are double either way.
        vd = F.col("__v").cast("double")
        v_lo = F.max(F.when(in_range(lo) & F.col("__v").isNotNull(), vd))
        v_hi = F.max(F.when(in_range(hi) & F.col("__v").isNotNull(), vd))
        # Bit-for-bit the engine formula (Spark Percentile /
        # DuckDB quantile_cont): no interpolation when pos is integral,
        # else (hi - pos)·v_lo + (pos - lo)·v_hi — NOT the algebraic
        # twin v_lo + frac·Δ, which differs in the last ulp.
        posc, loc, hic = F.max(pos), F.max(lo.cast("double")), F.max(hi.cast("double"))
        aggs.append(
            F.when(hic == loc, v_lo)
            .otherwise((hic - posc) * v_lo + (posc - loc) * v_hi)
            .alias(name)
        )
    return h.groupBy(*gcols).agg(*aggs)
