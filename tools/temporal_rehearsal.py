"""Scale rehearsal for the r13 temporal/analytics/mutation families:
gapfill, rollup cascade, funnel, cohort retention, SCD2 merge,
snapshot diff — measured at sf0.01 vs sf0.1 (10× events; documents
500 → 5000; customer 1.5k → 15k).

What the 100 TB arguments predict, and what this measures:
- rollup/funnel/cohort shuffle bytes should grow ~linearly with input
  (per-user/bucket partials move, not rows);
- gapfill's OUTPUT is grid-dominated (span/bucket × groups), so rows
  grow with the user count, not the event count;
- scd2/snapshot shuffle only (key, hash/attr) pairs.

Output: merges a "temporal_tier" section into SCALING_REHEARSAL.json
and prints a markdown table for SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sqlpp_spark.queries import REGISTRY, _ensure_loaded  # noqa: E402
from tools.scale_rehearsal import get_spark_with_ui, run_one  # noqa: E402

QUERIES = [
    "events_rollup_cascade",
    "events_gapfill_interpolate",
    "events_funnel_steps",
    "events_cohort_retention",
    "events_rolling_zscore",
    "dim_scd2_merge",
    "corpus_snapshot_diff",
    "corpus_dsir_weights",
    "ann_kcenter_coreset",
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
        row["wall_ratio"] = round(row["10x"]["sec"] / max(row["1x"]["sec"], 1e-9), 2)
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
    doc["temporal_tier"] = results
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)

    print("\n| query | 1x sec | 10x sec | wall ratio | 1x shuf MB | 10x shuf MB | shuf ratio | 10x rows |")
    print("|---|---|---|---|---|---|---|---|")
    for n, r in results.items():
        print(
            f"| {n} | {r['1x']['sec']} | {r['10x']['sec']} | {r['wall_ratio']} "
            f"| {r['1x']['shuffle_mb']} | {r['10x']['shuffle_mb']} "
            f"| {r['shuffle_ratio']} | {r['10x']['rows']} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
