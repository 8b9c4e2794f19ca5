"""Scale rehearsal for the r14 sketch family: Misra-Gries heavy
hitters, GK approx percentiles, HLL distinct — measured at sf0.01 vs
sf0.1 (10x documents/lineitem).

What the 100 TB arguments predict, and what this measures:
- heavy hitters: candidate volume is k x batches (vocabulary-size-
  independent); shuffle is candidates + per-token partial counts of
  the candidate SET only — growth should track the candidate count,
  not the vocabulary;
- approx percentiles / HLL: fixed-size sketch state merges in the
  partial-agg shuffle — bytes should stay near-flat at 10x.

Output: merges a "sketch_tier" section into SCALING_REHEARSAL.json
and prints a markdown table for SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sqlpp_spark.queries import REGISTRY, _ensure_loaded  # noqa: E402
from scale_rehearsal import get_spark_with_ui  # noqa: E402
from skew_rehearsal import run_one  # noqa: E402

QUERIES = [
    "corpus_heavy_hitters",
    "stats_approx_percentiles",
    "ann_hll_distinct_labels",
]

TIERS = {"1x": "/root/testdata/sf0.01", "10x": "/root/testdata/sf0.1"}


def main() -> None:
    _ensure_loaded()
    spark = get_spark_with_ui()
    results: dict = {}
    for name in QUERIES:
        spec = REGISTRY[name]
        row = {}
        for tier, sf in TIERS.items():
            row[tier] = run_one(spark, spec.builder, sf)
        row["wall_ratio"] = round(
            row["10x"]["sec"] / max(row["1x"]["sec"], 1e-9), 2
        )
        row["shuffle_ratio"] = round(
            row["10x"]["shuffle_mb"] / max(row["1x"]["shuffle_mb"], 1e-9), 2
        )
        results[name] = row
        print(name, json.dumps(row), flush=True)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "SCALING_REHEARSAL.json")
    doc = {}
    if os.path.exists(path):
        with open(path) as f:
            doc = json.load(f)
    doc["sketch_tier"] = results
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)

    print("\n| query | 1x sec | 10x sec | wall | 1x shuf MB | 10x shuf MB | shuf ratio |")
    print("|---|---|---|---|---|---|---|")
    for n, r in results.items():
        print(
            f"| {n} | {r['1x']['sec']} | {r['10x']['sec']} "
            f"| {r['wall_ratio']} | {r['1x']['shuffle_mb']} "
            f"| {r['10x']['shuffle_mb']} | {r['shuffle_ratio']} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
