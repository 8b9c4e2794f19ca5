"""Skewed-data rehearsal (round-9 verdict ask #6).

Every prior rehearsal ran UNIFORM synthetic corpora; production crawl
data is Zipf in domains, shingles and embedding cells. This tool
builds a skewed twin of sf0.1 (/tmp/skewfix, same row counts):

- ``documents.source`` redrawn Zipf-style: ~60% of docs on ONE hot
  source, ~20% on 5 warm sources, the rest across 50 cold ones — the
  synthesized URLs inherit the skew, so the per-domain caps and
  domain joins see a hot key;
- ~40% of ``documents.text`` gets a fixed 40-word boilerplate prefix
  prepended — a hot shingle vocabulary that inflates minhash band
  buckets and n-gram document frequencies;
- 80% of ``embeddings`` snapped toward 3 cluster centers (0.15 blend
  of the original vector) — hot knn/IVF cells.

For each operator it measures uniform (sf0.1) vs skewed wall +
shuffle bytes, AND the per-task skew symptom itself: for the heaviest
shuffle stage of the run, the max/median task shuffle-write and
run-time ratios from the Spark REST taskSummary. AQE skew-join
splitting and the two-phase/salted aggregation shapes are the
mitigations under test — a blowup shows up as max/median >> sources
ratio, wall far above uniform, or an outright straggler.

Also measures ``salted_join`` head-to-head against a plain shuffle
join on the hot-key frame, and reports whether dedup_ngram_jaccard's
Σdf² auto-strategy trips to prefix filtering on the skewed corpus.

Output: SKEW_REHEARSAL.json + markdown table (pasted into SCALING.md).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from scale_rehearsal import get_spark_with_ui  # noqa: E402

from sqlpp_spark.ops import release_intermediates  # noqa: E402
from sqlpp_spark.session import TABLES  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SKEWFIX = "/tmp/skewfix"

BOILER = ("breaking news subscribe to our newsletter for daily updates "
          "all rights reserved copyright notice privacy policy terms of "
          "service cookie settings advertisement sponsored content read "
          "more related articles trending now top stories editor picks "
          "share this story follow us")


def build_fixture(spark: SparkSession) -> None:
    if os.path.isdir(SKEWFIX):
        return
    os.makedirs(SKEWFIX)
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    h = F.pmod(F.xxhash64("doc_id", F.lit("skew")), F.lit(100))
    zipf_source = (
        F.when(h < 60, F.lit("hotsite"))
        .when(h < 80, F.concat(F.lit("warm"), (h % 5).cast("string")))
        .otherwise(F.concat(F.lit("cold"), (h % 50).cast("string")))
    )
    hb = F.pmod(F.xxhash64("doc_id", F.lit("boiler")), F.lit(100))
    text = F.when(
        hb < 40, F.concat(F.lit(BOILER + " "), F.col("text"))
    ).otherwise(F.col("text"))
    docs.select(
        "doc_id", text.alias("text"), "lang", zipf_source.alias("source"),
        F.length(text).alias("n_chars"),
    ).coalesce(8).write.parquet(f"{SKEWFIX}/documents.parquet")

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    ch = F.pmod(F.xxhash64("vec_id", F.lit("cluster")), F.lit(100))
    cluster = (ch % 3).cast("int")
    # deterministic center coordinate per (cluster, dim): in [-0.5, 0.5]
    center = F.transform(
        F.col("embedding"),
        lambda v, j: (
            F.pmod(F.xxhash64(cluster, j, F.lit("c")), F.lit(1000))
            / F.lit(1000.0) - F.lit(0.5)
        ),
    )
    snapped = F.zip_with(
        F.col("embedding"), center,
        lambda v, c: (c * F.lit(0.85) + v * F.lit(0.15)).cast("float"),
    )
    emb.select(
        "vec_id",
        F.when(ch < 80, snapped).otherwise(F.col("embedding"))
        .alias("embedding"),
        "label",
    ).coalesce(8).write.parquet(f"{SKEWFIX}/embeddings.parquet")
    for t in TABLES:
        if t in ("documents", "embeddings"):
            continue
        os.symlink(f"{SF01}/{t}.parquet", f"{SKEWFIX}/{t}.parquet")


# -- REST metrics ------------------------------------------------------------


def _api(spark, path):
    base = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{base}/api/v1/applications"))
    return json.load(urllib.request.urlopen(
        f"{base}/api/v1/applications/{apps[0]['id']}{path}"
    ))


def stage_list(spark) -> dict:
    out = {}
    for st in _api(spark, "/stages?status=complete"):
        out[(st["stageId"], st["attemptId"])] = st
    return out


def task_skew(spark, stage_id: int, attempt: int) -> dict:
    """max/median per-task shuffle write + run time of one stage."""
    try:
        q = _api(
            spark,
            f"/stages/{stage_id}/{attempt}/taskSummary"
            "?quantiles=0.0,0.5,1.0",
        )
    except Exception:
        return {}
    out = {}
    sw = q.get("shuffleWriteMetrics", {}).get("writeBytes") or q.get(
        "shuffleWriteBytes"
    )
    rt = q.get("executorRunTime")
    if sw and sw[1]:
        out["task_shuffle_max_over_med"] = round(sw[2] / sw[1], 2)
        out["task_shuffle_max_mb"] = round(sw[2] / 2**20, 3)
    if rt and rt[1]:
        out["task_time_max_over_med"] = round(rt[2] / rt[1], 2)
        out["task_time_max_s"] = round(rt[2] / 1000, 2)
    return out


def run_one(spark, builder, sf_dir) -> dict:
    spark.catalog.clearCache()
    before = stage_list(spark)
    t0 = time.perf_counter()
    df = builder(spark, sf_dir)
    n = df.count()
    dt = time.perf_counter() - t0
    release_intermediates(df)
    after = stage_list(spark)
    new = {k: v for k, v in after.items() if k not in before}
    shuffle = sum(v.get("shuffleWriteBytes", 0) for v in new.values())
    rec = {
        "sec": round(dt, 3),
        "rows": n,
        "shuffle_mb": round(shuffle / 2**20, 3),
    }
    if new:
        heaviest = max(new, key=lambda k: new[k].get("shuffleWriteBytes", 0))
        if new[heaviest].get("shuffleWriteBytes", 0) > 0:
            rec.update(task_skew(spark, *heaviest))
    return rec


def jaccard_strategy_trips(spark, sf_dir) -> dict:
    """Recompute the Σdf² auto signal exactly the way
    ngram_jaccard_pairs does for the registry call (k=3, lang blocks,
    distinct per-doc shingles): does the skewed corpus trip prefix
    filtering?"""
    from sqlpp_spark.ops.dedup import shingle_hashes

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = shingle_hashes(docs, "text", "doc_id", 3, fast_hash=True).join(
        docs.select("doc_id", F.col("lang").alias("__blk")), on="doc_id"
    )
    stats = (
        sh.groupBy("__blk", "sh_hash").agg(F.count(F.lit(1)).alias("__df"))
        .agg(
            F.sum(F.col("__df").cast("double") * F.col("__df"))
            .alias("sum_df2"),
            F.sum("__df").alias("n_rows"),
        ).collect()[0]
    )
    trips = bool(stats["sum_df2"] and
                 stats["sum_df2"] > 4.0 * stats["n_rows"])
    return {
        "sum_df2": stats["sum_df2"], "n_rows": stats["n_rows"],
        "ratio": round(stats["sum_df2"] / stats["n_rows"], 1),
        "prefix_trips": trips,
    }


def salted_vs_plain(spark) -> dict:
    """Hot-key join at a size where skew actually bites: the skewed
    documents exploded 128x (~640k rows, ~60% on ONE key) joined to a
    per-source stats table, plain shuffle join (broadcast disabled,
    AQE skew-join active — the session default) vs salted_join."""
    from sqlpp_spark.ops.partitioning import salted_join

    docs = spark.read.parquet(f"{SKEWFIX}/documents.parquet").select(
        "doc_id", "source", "n_chars"
    ).crossJoin(
        spark.range(128).select(F.col("id").alias("__rep"))
    ).select(
        (F.col("doc_id") * 128 + F.col("__rep")).alias("doc_id"),
        "source", "n_chars",
    )
    per_source = docs.groupBy("source").agg(
        F.avg("n_chars").alias("avg_chars")
    )
    out = {}
    with_conf = spark.conf
    old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
    with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        def plain(s, _):
            return docs.join(per_source, "source").filter(
                F.col("n_chars") > F.col("avg_chars")
            )

        def salted(s, _):
            j = salted_join(docs, per_source, "source", n_salt=16)
            return j.filter(F.col("n_chars") > F.col("avg_chars"))

        out["plain_join"] = run_one(spark, plain, SKEWFIX)
        out["salted_join"] = run_one(spark, salted, SKEWFIX)
    finally:
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    return out


QUERIES = [
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "dedup_exact",
    "pipeline_web_prepare",
    "ann_knn_graph_auto",
    "dedup_passages",
]


def main() -> None:
    spark = get_spark_with_ui()
    build_fixture(spark)
    from sqlpp_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    results = {}
    for name in QUERIES:
        b = REGISTRY[name].builder
        try:
            b(spark, "/root/testdata/sf0.001").count()  # warm plan
        except Exception:
            pass
        results[name] = {
            "uniform": run_one(spark, b, SF01),
            "skewed": run_one(spark, b, SKEWFIX),
        }
        print(name, json.dumps(results[name]), flush=True)
    results["jaccard_auto_signal"] = {
        "uniform": jaccard_strategy_trips(spark, SF01),
        "skewed": jaccard_strategy_trips(spark, SKEWFIX),
    }
    print("jaccard_auto_signal",
          json.dumps(results["jaccard_auto_signal"]), flush=True)
    results["hot_key_join"] = salted_vs_plain(spark)
    print("hot_key_join", json.dumps(results["hot_key_join"]), flush=True)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "SKEW_REHEARSAL.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("\n| operator | uniform s | skewed s | ratio | skewed shuffle MB "
          "| task max/med shuffle | task max/med time |")
    print("|---|---|---|---|---|---|---|")
    for name in QUERIES:
        u, s = results[name]["uniform"], results[name]["skewed"]
        r = round(s["sec"] / u["sec"], 2) if u["sec"] else None
        print(f"| {name} | {u['sec']} | {s['sec']} | {r} | "
              f"{s['shuffle_mb']} | "
              f"{s.get('task_shuffle_max_over_med', '-')} | "
              f"{s.get('task_time_max_over_med', '-')} |")
    spark.stop()


if __name__ == "__main__":
    main()
