"""Partitioning strategies for the 100 TB path: skew-salted joins and
bucketed (pre-shuffled) co-located joins.

AQE's skew-join splitting (on in session.py) handles moderate skew at
runtime; ``salted_join`` is the explicit form for EXTREME skew (one key
= 30% of a 100 TB fact table), where a single post-split partition is
still too big. Bucketing removes the shuffle from repeated big-big
joins entirely: both tables are written pre-partitioned by the join
key, so every join on that key is a zero-exchange zip of co-located
buckets — the standard layout for a fact table joined daily against a
slowly-changing dimension.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Skew-salted join
# ---------------------------------------------------------------------------


def salted_join(
    big: DataFrame, small: DataFrame, key: str, n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to extreme key skew.

    The big side gets a deterministic pseudo-random salt in [0, n_salt)
    per ROW, splitting each hot key across n_salt reducers; the small
    side is replicated n_salt times (explode of a literal range — cheap
    when the small side is dimension-sized). Join key becomes
    (key, salt), so the hottest key's rows spread over n_salt
    partitions instead of melting one executor.

    Salt is derived from xxhash64 of the whole row (not rand()) so the
    operator stays deterministic/retry-safe — a task retry re-salts
    identically.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left")
    salt = (F.abs(F.xxhash64(*[F.col(c) for c in big.columns])) % n_salt).alias("__salt")
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = b.join(s, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def salted_groupby(
    df: DataFrame, keys: List[str], agg_col: str, n_salt: int = 16,
) -> DataFrame:
    """Two-stage count/sum aggregation for skewed group keys: stage 1
    aggregates (keys, salt) — spreading a hot key over n_salt partial
    groups — stage 2 combines the partials. Spark's own partial
    aggregation usually makes this unnecessary; it exists for the case
    where high-cardinality-within-key map state defeats map-side
    combine (e.g. count(distinct) per hot key)."""
    salt = (F.abs(F.xxhash64(*[F.col(c) for c in df.columns])) % n_salt).alias("__salt")
    stage1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(agg_col).alias("__s"),
        )
    )
    return stage1.groupBy(*keys).agg(
        F.sum("__n").alias("n"),
        F.sum("__s").alias(f"sum_{agg_col}"),
    )


# ---------------------------------------------------------------------------
# Bucketed co-located joins
# ---------------------------------------------------------------------------


def write_bucketed(
    df: DataFrame, name: str, key: str, n_buckets: int = 8,
    sort: bool = True, path: Optional[str] = None,
) -> None:
    """Persist a table pre-partitioned (and optionally sorted) by the
    join key. Subsequent equi-joins between tables bucketed the same
    way compile WITHOUT a shuffle exchange on either side — the
    write-side shuffle is paid once, then amortized over every join.
    ``path`` stores the files outside the warehouse dir (external
    table) while keeping bucket metadata in the catalog."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def bucketed_join(
    spark: SparkSession, left: str, right: str, key: str,
    how: str = "inner", select: Optional[List[str]] = None,
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket counts Spark plans a SortMergeJoin with NO Exchange under
    either side (see tests/test_plans.py)."""
    l = spark.table(left)
    r = spark.table(right)
    out = l.join(r, on=key, how=how)
    return out.select(*select) if select else out


# ---------------------------------------------------------------------------
# Z-order (Morton) layout keys — multi-column file-skipping locality
# ---------------------------------------------------------------------------


def _check_zorder_bounds(
    x_min: float, x_max: float, y_min: float, y_max: float
) -> None:
    if not (float(x_max) > float(x_min) and float(y_max) > float(y_min)):
        raise ValueError(
            f"zorder bounds must satisfy min < max per dimension, got "
            f"x=[{x_min}, {x_max}], y=[{y_min}, {y_max}]"
        )


def zorder_key(
    x, y, x_min: float, x_max: float, y_min: float, y_max: float,
    bits: int = 16,
):
    """Morton (Z-order) key interleaving the quantized bits of two
    columns — entirely JVM-side shift/mask arithmetic (whole-stage
    codegen, no UDF). Sorting/range-partitioning files by this key
    gives every file a tight bounding box in BOTH columns, so parquet
    min/max stats (or Delta/Iceberg file stats) can skip files for
    predicates on either column — the layout lever single-column sort
    can't provide. Bounds are plan literals: compute them once with a
    narrow min/max agg (exact) or use fixed domain knowledge.

    Quantization: v → floor((v - min) / (max - min) * (2^bits - 1)),
    clamped — deterministic and replayed bit-for-bit by the DuckDB
    oracle twin. Degenerate bounds (hi <= lo) raise up front: a
    zero/negative denominator would emit NULL/garbage keys silently
    and the layout would quietly lose both-dimension locality.
    """
    _check_zorder_bounds(x_min, x_max, y_min, y_max)
    scale = (1 << bits) - 1

    def quant(c, lo, hi):
        # multiply BEFORE dividing: (v-lo)*scale/(hi-lo) keeps integer
        # grids exact ((1-0)*3/3 == 1.0; the other order rounds 1/3
        # first and floors to 0)
        q = F.floor(
            (c.cast("double") - F.lit(float(lo)))
            * F.lit(float(scale))
            / F.lit(float(hi) - float(lo))
        ).cast("bigint")
        return F.greatest(F.lit(0), F.least(F.lit(scale), q))

    qx, qy = quant(x, x_min, x_max), quant(y, y_min, y_max)
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        # Column.bitwiseOR, not `|` (PySpark maps `|` to boolean OR)
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(qx, b) % 2, 2 * b)
        ).bitwiseOR(F.shiftleft(F.shiftright(qy, b) % 2, 2 * b + 1))
    return z


def zorder_key_sql(
    x: str, y: str, x_min: float, x_max: float, y_min: float, y_max: float,
    bits: int = 16,
) -> str:
    """DuckDB twin of ``zorder_key`` — identical quantization and bit
    interleave."""
    _check_zorder_bounds(x_min, x_max, y_min, y_max)
    scale = (1 << bits) - 1

    def quant(c, lo, hi):
        return (
            f"GREATEST(0, LEAST({scale}, CAST(floor((CAST({c} AS DOUBLE) - "
            f"{float(lo)}) * {float(scale)} / {float(hi) - float(lo)}) "
            f"AS BIGINT)))"
        )

    qx, qy = quant(x, x_min, x_max), quant(y, y_min, y_max)
    terms = []
    for b in range(bits):
        terms.append(f"((({qx} >> {b}) % 2) << {2 * b})")
        terms.append(f"((({qy} >> {b}) % 2) << {2 * b + 1})")
    return "(" + " | ".join(terms) + ")"


def layout_zorder(
    df: DataFrame, z, n_partitions: int = 32,
) -> DataFrame:
    """Apply the Z-order layout: range-partition on the Morton key and
    sort within partitions, so a subsequent parquet write produces
    files whose min/max stats are tight in both dimensions. The range
    partitioner samples key quantiles (one lightweight pass) — the
    standard layout-rewrite shape; at 100 TB this is the periodic
    OPTIMIZE job, not a per-query cost."""
    return (
        df.withColumn("__z", z)
        .repartitionByRange(n_partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
