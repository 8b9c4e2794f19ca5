"""Temporal join operators: as-of join and bounded range join.

Neither exists as a Spark SQL primitive; both are staples of event
pipelines (feature lookup at event time, windowed context counts).

Scale design (100 TB):
- ``asof_join`` is the union+window formulation: tag both inputs, union,
  ONE shuffle on the join keys, then a running ``last(ignorenulls)``
  per partition. No range explosion, no per-row subquery, no driver
  loop — cost is a sort within each key partition, the same cost
  profile as any window aggregate. (A join-based formulation would
  build |left|×|right-per-key| intermediates and then re-aggregate.)
- ``range_count`` buckets the right side by ``window`` seconds and
  explodes each left row to its two covering buckets: the join becomes
  an equi-join on (keys, bucket) with a residual range filter — the
  classic bucketed range-join rewrite. Expansion factor is exactly 2
  on the left, independent of data size or window length.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: Sequence[str] = ("ts",),
    right_order: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward-inclusive as-of join: every left row gains the payload
    columns of the latest right row with the same keys and
    ``right_ts <= left_ts`` (NULL when no such row). Ties on the right
    timestamp resolve to the largest ``right_order`` value.

    Output: all left columns + ``{prefix}{col}`` per payload column.
    """
    lstruct = T.StructType(left.schema.fields)
    pay_types = {c: right.schema[c].dataType for c in payload}
    l_tag = left.select(
        *[F.col(k) for k in on],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__lrow"),
        *[F.lit(None).cast(pay_types[c]).alias(f"__r_{c}") for c in payload],
        *(
            [F.lit(None).cast(right.schema[right_order].dataType).alias("__rord")]
            if right_order
            else []
        ),
    )
    r_tag = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(lstruct).alias("__lrow"),
        *[F.col(c).alias(f"__r_{c}") for c in payload],
        *([F.col(right_order).alias("__rord")] if right_order else []),
    )
    order: List = [F.col("__ts"), F.col("__is_left")]
    if right_order:
        order.append(F.col("__rord"))
    # right rows sort BEFORE left rows at equal ts (inclusive join);
    # running last(ignorenulls) sees exactly the rows at-or-before
    w = (
        W.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    u = l_tag.unionByName(r_tag)
    for c in payload:
        u = u.withColumn(f"__asof_{c}", F.last(f"__r_{c}", ignorenulls=True).over(w))
    # A NULL join key matches nothing in a real join (NULL != NULL),
    # but partitionBy groups all-NULL keys together — mask the asof
    # payload back to NULL for those rows to keep join semantics.
    any_key_null = None
    for k in on:
        cond = F.col(k).isNull()
        any_key_null = cond if any_key_null is None else (any_key_null | cond)
    out_cols = [F.col(f"__lrow.{c}").alias(c) for c in left.columns] + [
        F.when(any_key_null, F.lit(None).cast(pay_types[c]))
        .otherwise(F.col(f"__asof_{c}"))
        .alias(f"{prefix}{c}")
        for c in payload
    ]
    return u.filter(F.col("__is_left") == 1).select(*out_cols)


def range_count(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_seconds: int = 3600,
    count_col: str = "n_in_range",
) -> DataFrame:
    """Count, per left row, the right rows with the same keys whose
    timestamp falls in ``[left_ts - window, left_ts)`` — bucketed
    range-join rewrite (equi-join on (keys, bucket) + residual filter),
    so no per-key cross product ever materializes.
    """
    w_us = int(window_seconds) * 1_000_000
    # Unique row id so (a) duplicate left rows each get their OWN count
    # instead of the group total, and (b) the count join matches by
    # identity, never by (possibly NULL) payload columns. Only
    # (id, keys, ts) flows through the explode+join — payload columns
    # stay out of the bucketed join and move once, in the final
    # narrow id-equi-join.
    l_id = left.withColumn("__rid", F.monotonically_increasing_id())
    r_b = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("__rts"),
        F.floor(F.unix_micros(F.col(right_ts)) / F.lit(w_us)).alias("__bucket"),
    )
    l_b = l_id.select("__rid", *on, F.col(left_ts).alias("__lts")).withColumn(
        "__bucket",
        F.explode(
            F.array(
                F.floor(F.unix_micros(F.col("__lts")) / F.lit(w_us)) - 1,
                F.floor(F.unix_micros(F.col("__lts")) / F.lit(w_us)),
            )
        ),
    )
    # NULL join keys never match (standard join semantics) -> count 0.
    joined = l_b.join(r_b, on=[*on, "__bucket"]).filter(
        (F.col("__rts") >= F.col("__lts") - F.expr(f"INTERVAL {window_seconds} SECOND"))
        & (F.col("__rts") < F.col("__lts"))
    )
    counts = joined.groupBy("__rid").agg(F.count(F.lit(1)).alias(count_col))
    return (
        l_id.join(counts, on="__rid", how="left")
        .withColumn(count_col, F.coalesce(F.col(count_col), F.lit(0)))
        .drop("__rid")
    )
