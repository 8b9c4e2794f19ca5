"""Skew-salting and bucketing: result equality with the plain plans,
plus the plan-shape properties that justify them at scale."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from sqlpp_spark.ops.partitioning import (
    bucketed_join, salted_groupby, salted_join, write_bucketed,
)
from sqlpp_spark.sources.tables import read_table


@pytest.fixture(scope="module")
def skewed(spark):
    """90% of rows share one key — the shape that melts one reducer."""
    hot = spark.range(9000).select(
        F.lit(1).alias("k"), (F.col("id") % 100).cast("double").alias("v")
    )
    cold = spark.range(1000).select(
        (F.col("id") % 50 + 2).alias("k"), F.lit(1.0).alias("v")
    )
    return hot.unionByName(cold)


@pytest.fixture(scope="module")
def dim(spark):
    return spark.range(60).select(
        (F.col("id") + 1).alias("k"), F.concat(F.lit("d"), F.col("id")).alias("label")
    )


def test_salted_join_equals_plain(skewed, dim):
    plain = skewed.join(dim, on="k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    salted = salted_join(skewed, dim, "k", n_salt=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left(skewed, dim):
    extra = skewed.unionByName(
        skewed.sparkSession.range(1).select(F.lit(999).alias("k"), F.lit(0.0).alias("v"))
    )
    out = salted_join(extra, dim, "k", n_salt=4, how="left")
    unmatched = out.filter(F.col("k") == 999).collect()
    assert len(unmatched) == 1 and unmatched[0].label is None


def test_salted_join_spreads_hot_key(skewed, dim):
    """The hot key's rows land in every salt bucket (the whole point)."""
    salt = (F.abs(F.xxhash64(*[F.col(c) for c in skewed.columns])) % 8)
    n_buckets = (
        skewed.filter(F.col("k") == 1)
        .select(salt.alias("s"))
        .distinct()
        .count()
    )
    assert n_buckets == 8


def test_salted_groupby_equals_plain(skewed):
    plain = skewed.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v")
    )
    salted = salted_groupby(skewed, ["k"], "v", n_salt=8)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path_factory):
    """Both sides bucketed by the key → SortMergeJoin with zero shuffle
    exchanges (write-side shuffle paid once, amortized per join)."""
    wh = tmp_path_factory.mktemp("warehouse")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    ).withColumnRenamed("l_orderkey", "o_orderkey")
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=4, path=str(wh / "o"))
    write_bucketed(lineitem, "b_lineitem", "o_orderkey", n_buckets=4, path=str(wh / "l"))

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        # r19: with preferSortMergeJoin=false the planner may pick
        # either shuffle-free flavor over bucketed inputs; the
        # contract this test pins is ZERO exchanges, not the flavor
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        import re

        assert not re.search(r"\(\d+\) Exchange\b", plan), plan
        # and it actually runs
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_zorder_key_matches_morton_pattern(spark):
    """2-bit Z-key over a 4x4 integer grid must equal the textbook
    Morton numbers (bit interleave), proving quantization exactness on
    integer grids and correct bit placement."""
    from sqlpp_spark.ops.partitioning import zorder_key

    grid = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x long, y long"
    )
    z = zorder_key(F.col("x"), F.col("y"), 0, 3, 0, 3, bits=2)
    got = {(r.x, r.y): r.z for r in grid.select("x", "y", z.alias("z")).collect()}

    def morton(x, y):
        out = 0
        for b in range(2):
            out |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
        return out

    assert got == {(x, y): morton(x, y) for x in range(4) for y in range(4)}


def test_zorder_degenerate_bounds_raise(spark):
    """hi <= lo per dimension would divide by zero and emit NULL keys
    silently (layout quietly loses locality) — must raise instead, in
    both the Spark expression and the DuckDB twin."""
    import pytest

    from sqlpp_spark.ops.partitioning import zorder_key, zorder_key_sql

    for bounds in ((5, 5, 0, 3), (3, 0, 0, 3), (0, 3, 7, 7)):
        with pytest.raises(ValueError, match="min < max"):
            zorder_key(F.col("x"), F.col("y"), *bounds)
        with pytest.raises(ValueError, match="min < max"):
            zorder_key_sql("x", "y", *bounds)


def test_zorder_layout_tightens_both_dimensions(spark):
    """Partitioning by the Z-key must bound BOTH coordinates per
    partition: every Z-range partition of a uniform grid covers a far
    smaller (x, y) bounding box than the single-column-sorted layout,
    which leaves the second dimension's range at full width."""
    from sqlpp_spark.ops.partitioning import layout_zorder, zorder_key

    n = 32
    grid = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x long, y long"
    )
    z = zorder_key(F.col("x"), F.col("y"), 0, n - 1, 0, n - 1, bits=5)
    parts = (
        layout_zorder(grid, z, n_partitions=16)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("xr"),
            (F.max("y") - F.min("y")).alias("yr"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .filter(F.col("cnt") > 1)
        .collect()
    )
    assert parts
    # x-sorted layout: every 64-row slice spans the full y range (31).
    # Z-order: both ranges stay near sqrt(partition size).
    avg_xr = sum(p.xr for p in parts) / len(parts)
    avg_yr = sum(p.yr for p in parts) / len(parts)
    assert avg_xr <= 16 and avg_yr <= 16, (avg_xr, avg_yr)


# ---------------------------------------------------------------------------
# ensure_parallelism: job-free repartition decision (r19)
# ---------------------------------------------------------------------------


def _jobs_run(spark, fn):
    """Count Spark jobs triggered while fn() runs."""
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    out = fn()
    after = len(tracker.getJobIdsForGroup(None) or [])
    return out, after - before


def test_ensure_parallelism_decides_without_running_jobs(spark):
    """Under AQE, df.rdd.getNumPartitions() on a shuffle-bearing plan
    EXECUTES the upstream query stages to learn the coalesced count —
    the old probe silently ran part of the query at plan-build time.
    The guard must now decide job-free on such plans: (1) a small
    coalescable-shuffle frame (ENSURE_REQUIREMENTS) repartitions to
    target with zero jobs, (2) a frame downstream of an explicit
    repartition(target) (REPARTITION_BY_NUM, never AQE-coalesced) is
    left alone with zero jobs."""
    from sqlpp_spark.ops import _needs_repartition_metadata

    target = spark.sparkContext.defaultParallelism
    base = spark.range(10_000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("v")
    )

    agg = base.groupBy("k").agg(F.sum("v").alias("s"))  # coalescable
    (decision, jobs) = _jobs_run(
        spark, lambda: _needs_repartition_metadata(agg, target)
    )
    assert decision is True
    assert jobs == 0

    pinned = base.repartition(target).select(
        F.col("k"), (F.col("v") * 2).alias("w")
    )  # REPARTITION_BY_NUM: arrives with exactly `target` partitions
    (decision, jobs) = _jobs_run(
        spark, lambda: _needs_repartition_metadata(pinned, target)
    )
    assert decision is False
    assert jobs == 0

    under = base.repartition(max(1, target // 2)).select("k")
    (decision, jobs) = _jobs_run(
        spark, lambda: _needs_repartition_metadata(under, target)
    )
    assert decision is True
    assert jobs == 0

    narrow = base.filter(F.col("k") > 3)  # shuffle-free: caller probes
    (decision, jobs) = _jobs_run(
        spark, lambda: _needs_repartition_metadata(narrow, target)
    )
    assert decision is None
    assert jobs == 0


def test_ensure_parallelism_end_to_end_shapes(spark):
    """The guard's observable contract is unchanged: an
    under-partitioned narrow frame gains a round-robin repartition; a
    frame already at target partitions (via explicit repartition)
    gains nothing."""
    from sqlpp_spark.ops import ensure_parallelism

    target = spark.sparkContext.defaultParallelism
    one = spark.createDataFrame(
        [(i, i * 2) for i in range(100)], "a long, b long"
    ).coalesce(1)
    guarded = ensure_parallelism(one)
    assert guarded.rdd.getNumPartitions() >= min(target, 100)

    pinned = spark.range(1000).repartition(target).select("id")
    assert ensure_parallelism(pinned) is pinned
