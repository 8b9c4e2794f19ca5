"""Large-scale data-pipeline operators (beyond the reference surface):
deduplication, similarity search, text analysis, multimodal columns.

All hot paths are JVM-side `pyspark.sql.functions` compositions — no
row-at-a-time Python. Where Python is unavoidable (embedding math at
scale, multimodal decode) we use Arrow-batched Pandas UDFs.
"""

from pyspark.sql import DataFrame


def release_intermediates(df: DataFrame) -> None:
    """Unpersist the intermediate frames an operator recorded on its
    result (``df._sqlpp_persisted``). Call once the result has been
    materialized (written / collected) — repeated operator invocations
    without it accumulate cached blocks until LRU eviction. The
    attribute lives on the returned object only; if you transform the
    result further, release via the ORIGINAL handle."""
    for f in getattr(df, "_sqlpp_persisted", ()):
        try:
            f.unpersist()
        except Exception:
            pass


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Guard CPU-bound expression stages (shingling, hashing, vector
    math) against under-parallelized scans: a small single-file input
    arrives as ONE partition, serializing the work on an N-core
    executor. Repartition to the cluster's default parallelism only in
    that case — at real scale the scan already yields ≥ that many
    splits (spark.sql.files.maxPartitionBytes) and this is a no-op, so
    no extra shuffle on the 100 TB path."""
    try:
        target = df.sparkSession.sparkContext.defaultParallelism
        # inputFiles() is a cheap driver-side plan walk: a plan reading
        # >= target files yields enough splits no matter what sits
        # above the scan, so the 100 TB path skips the precise probe.
        # HEURISTIC caveat: a coalesce(1)/repartition(1) ABOVE a
        # many-file scan defeats it (we skip, parallelism stays low) —
        # acceptable because sqlpp_spark never coalesces before the
        # CPU-bound stages this guards; callers that do should
        # repartition explicitly.
        # Otherwise fall through to df.rdd (~0.2 s driver latency) —
        # it alone knows the true partition count of derived plans
        # (e.g. an input that a window already shuffled to N
        # partitions must NOT be repartitioned again).
        try:
            files = df.inputFiles()
        except Exception:
            files = []
        if len(files) >= target:
            return df
        if df.rdd.getNumPartitions() < target:
            return df.repartition(target)
    except Exception:
        # Spark Connect has no RDD/sparkContext access; there the input
        # is a real cluster scan that maxPartitionBytes already splits
        pass
    return df


def observed_filter(df: DataFrame, cond, name: str = "filter"):
    """Filter with FREE observability: attach a named ``Observation``
    so total/kept/dropped row counts are recorded during the SAME
    action that materializes the result — no second pass over the
    data, which at 100 TB is the difference between 'we log our yield'
    and 'we re-scan the corpus to count'. Returns ``(filtered_df,
    observation)``; read ``observation.get`` AFTER an action ran.

    The pattern every quality gate in a production pipeline should
    wear: yields become monitorable per-stage for the cost of two agg
    expressions folded into the existing scan.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("total"),
        F.sum(cond.cast("long")).alias("kept"),
    )
    return observed.filter(cond), obs
