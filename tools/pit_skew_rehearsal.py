"""Hot-business-key skew rehearsal for the r13 dimension ops
(r14 verdict ask #6): point-in-time join and SCD2 merge under a
production-shaped key distribution — ONE business key owning 20% of
the facts ("the big customer"), joined against a versioned dimension
("the decade": 5 SCD2 versions per key).

Fixture (/tmp/pitskew):
- facts: 2,000,000 rows; hot arm puts 20% on key 0, uniform arm
  spreads the same rows over all 200,000 keys; timestamps span the
  dimension's 5 version windows.
- dim: 200,000 keys x 5 non-overlapping versions = 1,000,000 SCD2
  rows, last version open-ended (valid_to IS NULL).
- updates: 200,000 rows (one per key, ~50% changing a tracked attr)
  for the merge arm.

Arms measured (wall, shuffle MB, per-task max/median time + shuffle
read from the Spark REST taskSummary, via tools/skew_rehearsal):
- pit_uniform / pit_hot: the default plan. The 1M-row dim fits under
  the rehearsal broadcast threshold, so the expected plan is a
  BROADCAST hash join — fact-key skew is then IRRELEVANT (the hot
  key's rows stay spread across the scan's map tasks; no shuffle by
  key ever happens). This is the documented 100 TB mitigation in
  ops/temporal.py: dimensions broadcast.
- pit_hot_nobroadcast: autoBroadcastJoinThreshold=-1 forces the
  shuffle path a >10 GB dimension would take at 100 TB — the hot
  key's 400k facts hash to ONE reducer. AQE skew-join splitting
  (spark.sql.adaptive.skewJoin) is the mitigation under test; the
  recorded reduce-side task max/median ratios show whether it held.
- scd2_hot: merge with 20% of the HISTORY rows on the hot key.
  History never joins (closed rows pass through untouched) and
  current x updates is 1:1 per key, so no per-key concentration is
  possible — the recorded ratios document that the merge's join
  surface is structurally skew-immune; only the update batch's own
  key distribution matters, and it is 1-row-per-key by contract.

Output: merges a "pit_skew_tier" section into SCALING_REHEARSAL.json
and prints a markdown table for SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from skew_rehearsal import run_one  # noqa: E402

FIX = "/tmp/pitskew"
N_FACTS = 2_000_000
N_KEYS = 200_000
N_VERSIONS = 5
T0 = 1_600_000_000  # epoch anchor; versions every 30 days


def get_spark(broadcast: bool = True) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pit_skew_rehearsal")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.autoBroadcastJoinThreshold",
            "64m" if broadcast else "-1",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
    )
    return b.getOrCreate()


def build_fixture(spark: SparkSession) -> None:
    if os.path.isdir(FIX):
        return
    os.makedirs(FIX)
    month = 30 * 86400

    ids = spark.range(N_FACTS)
    # hot: first 20% of fact ids on key 0; uniform twin: same rows,
    # keys striped over the full space
    hot_k = F.when(F.col("id") < N_FACTS // 5, F.lit(0)).otherwise(
        F.pmod(F.xxhash64("id", F.lit("k")), F.lit(N_KEYS - 1)) + 1
    )
    uni_k = F.pmod(F.xxhash64("id", F.lit("k")), F.lit(N_KEYS))
    ts = F.timestamp_seconds(
        F.lit(T0)
        + F.pmod(F.xxhash64("id", F.lit("t")), F.lit(N_VERSIONS * month))
    )
    for name, k in (("facts_hot", hot_k), ("facts_uniform", uni_k)):
        ids.select(
            F.col("id").alias("fid"), k.alias("k"), ts.alias("ts")
        ).coalesce(16).write.parquet(f"{FIX}/{name}.parquet")

    v = spark.range(N_KEYS * N_VERSIONS)
    key = (F.col("id") / N_VERSIONS).cast("long")
    ver = F.pmod(F.col("id"), F.lit(N_VERSIONS))
    vf = F.timestamp_seconds(F.lit(T0) + ver * F.lit(month))
    vt = F.when(
        ver == N_VERSIONS - 1, F.lit(None).cast("timestamp")
    ).otherwise(F.timestamp_seconds(F.lit(T0) + (ver + 1) * F.lit(month)))
    v.select(
        key.alias("k"),
        (F.pmod(F.xxhash64("id", F.lit("b")), F.lit(100000)) / 100.0)
        .alias("bal"),
        vf.alias("valid_from"),
        vt.alias("valid_to"),
    ).coalesce(16).write.parquet(f"{FIX}/dim.parquet")

    u = spark.range(N_KEYS)
    u.select(
        F.col("id").alias("k"),
        # ~50% of keys get a changed balance
        F.when(
            F.pmod(F.xxhash64("id", F.lit("chg")), F.lit(2)) == 0,
            F.pmod(F.xxhash64("id", F.lit("nb")), F.lit(100000)) / 100.0,
        ).otherwise(F.lit(None).cast("double")).alias("new_bal"),
    ).coalesce(8).write.parquet(f"{FIX}/updates.parquet")


def pit_builder(facts_name: str):
    from sqlpp_spark.ops.temporal import pointintime_join

    def build(spark: SparkSession, _sf: str):
        fact = spark.read.parquet(f"{FIX}/{facts_name}.parquet")
        dim = spark.read.parquet(f"{FIX}/dim.parquet")
        return pointintime_join(fact, dim, on=["k"], payload=["bal"])

    return build


def scd2_builder(spark: SparkSession, _sf: str):
    from sqlpp_spark.ops.mutation import scd2_merge

    dim = spark.read.parquet(f"{FIX}/dim.parquet")
    # hot history: re-key 20% of the CLOSED rows onto key 0 (the open
    # rows keep 1/key so the merge contract holds)
    hot = dim.withColumn(
        "k",
        F.when(
            F.col("valid_to").isNotNull()
            & (F.pmod(F.xxhash64("k", F.lit("h")), F.lit(5)) == 0),
            F.lit(0),
        ).otherwise(F.col("k")),
    )
    upd = spark.read.parquet(f"{FIX}/updates.parquet")
    upd = upd.select(
        "k", F.coalesce("new_bal", F.lit(-1.0)).alias("bal")
    ).filter(F.col("new_bal").isNotNull() | (F.pmod(F.col("k"), F.lit(2)) == 0))
    return scd2_merge(
        hot, upd, key_cols=["k"], tracked_cols=["bal"],
        effective_ts=F.timestamp_seconds(F.lit(T0 + 200 * 86400)),
    )


def main() -> None:
    results: dict = {}

    spark = get_spark(broadcast=True)
    build_fixture(spark)
    for arm, builder in (
        ("pit_uniform", pit_builder("facts_uniform")),
        ("pit_hot", pit_builder("facts_hot")),
        ("scd2_hot", scd2_builder),
    ):
        results[arm] = run_one(spark, builder, FIX)
        print(arm, json.dumps(results[arm]), flush=True)
    # plan check: is the default PIT plan a broadcast join?
    plan = pit_builder("facts_hot")(spark, FIX)._jdf.queryExecution().executedPlan().toString()
    results["pit_hot"]["broadcast_plan"] = "BroadcastHashJoin" in plan
    spark.stop()

    spark = get_spark(broadcast=False)
    results["pit_hot_nobroadcast"] = run_one(
        spark, pit_builder("facts_hot"), FIX
    )
    plan = pit_builder("facts_hot")(spark, FIX)._jdf.queryExecution().executedPlan().toString()
    results["pit_hot_nobroadcast"]["broadcast_plan"] = (
        "BroadcastHashJoin" in plan
    )
    print("pit_hot_nobroadcast", json.dumps(results["pit_hot_nobroadcast"]), flush=True)
    spark.stop()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "SCALING_REHEARSAL.json")
    doc = {}
    if os.path.exists(path):
        with open(path) as f:
            doc = json.load(f)
    doc["pit_skew_tier"] = results
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)

    print("\n| arm | sec | rows | shuffle MB | task time max/med | reduce read max/med |")
    print("|---|---|---|---|---|---|")
    for n, r in results.items():
        print(
            f"| {n} | {r['sec']} | {r['rows']} | {r['shuffle_mb']} "
            f"| {r.get('task_time_max_over_med', r.get('reduce_task_time_max_over_med', '-'))} "
            f"| {r.get('reduce_task_read_max_over_med', '-')} |"
        )


if __name__ == "__main__":
    main()
