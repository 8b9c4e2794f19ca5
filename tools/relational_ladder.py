"""Shuffle-byte ladder for the RELATIONAL suite over the driver's real
100× data ladder (sf0.001 → sf0.01 → sf0.1) plus a derived sf1 rung
(r11): confirms over THREE decades that aggregation shuffles scale
with GROUP cardinality (not rows) and that dimension joins stay
broadcast (no fact-table shuffle growth). The sf1 fixture replicates
the sf0.1 facts 10× with disjoint key ranges (orders/lineitem join
keys shifted in lockstep, customers replicated with orders so FK
cardinality ratios hold; ~6M lineitem rows); fixed-size dims
(region/nation) are symlinked. Companion to tools/scale_rehearsal.py
(which covers the pipeline rows on a synthetic 10×).
Output: RELATIONAL_LADDER.json + markdown table.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scale_rehearsal import get_spark_with_ui, run_one  # noqa: E402

from sqlpp_spark.queries import REGISTRY, _ensure_loaded  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/sf1"
COPIES = 10
# disjoint per-copy key ranges; strides comfortably above sf0.1 maxima
STRIDES = {
    "o_orderkey": 10_000_000, "l_orderkey": 10_000_000,
    "o_custkey": 1_000_000, "c_custkey": 1_000_000,
    "s_suppkey": 100_000, "l_suppkey": 100_000,
    "p_partkey": 100_000, "l_partkey": 100_000,
    "event_id": 10_000_000, "user_id": 1_000_000,
}


def build_sf1(spark) -> None:
    if os.path.isdir(SF1):
        return
    os.makedirs(SF1)
    for t in ("customer", "supplier", "part", "orders", "lineitem",
              "events"):
        df = spark.read.parquet(f"{SF01}/{t}.parquet")
        parts = []
        for i in range(COPIES):
            cols = [
                (F.col(c) + F.lit(i * STRIDES[c])).alias(c)
                if c in STRIDES else F.col(c)
                for c in df.columns
            ]
            parts.append(df.select(*cols))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.coalesce(16).write.parquet(f"{SF1}/{t}.parquet")
    for t in ("region", "nation", "documents", "embeddings"):
        os.symlink(f"{SF01}/{t}.parquet", f"{SF1}/{t}.parquet")


SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
       "/root/testdata/sf0.1", SF1]
QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q10_returned_items",
    "q18_large_volume_customers",
    "q_window_topk_per_group",
    "q_events_tumbling",
    "q_events_sessionize",
]


def main() -> None:
    _ensure_loaded()
    spark = get_spark_with_ui()
    build_sf1(spark)
    results = {}
    for name in QUERIES:
        b = REGISTRY[name].builder
        b(spark, SFS[0]).count()  # warm the plan shape
        results[name] = [run_one(spark, b, sf) for sf in SFS]
        print(name, json.dumps(results[name]), flush=True)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "RELATIONAL_LADDER.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("\n| query | shuffle MB @sf0.001 | @sf0.01 | @sf0.1 | @sf1 "
          "| sf1 s | input MB @sf1 |")
    print("|---|---|---|---|---|---|---|")
    for name, (a, b, c, d) in results.items():
        print(
            f"| {name} | {a['shuffle_mb']} | {b['shuffle_mb']} | "
            f"{c['shuffle_mb']} | {d['shuffle_mb']} | {d['sec']} | "
            f"{d['input_mb']} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
