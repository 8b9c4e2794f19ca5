"""Shuffle-byte ladder for the RELATIONAL suite over the driver's real
100× data ladder (sf0.001 → sf0.01 → sf0.1): confirms that aggregation
shuffles scale with GROUP cardinality (not rows) and that dimension
joins stay broadcast (no fact-table shuffle growth). Companion to
tools/scale_rehearsal.py (which covers the pipeline rows on a
synthetic 10×). Output: RELATIONAL_LADDER.json + markdown table.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_rehearsal import get_spark_with_ui, run_one  # noqa: E402

from sqlpp_spark.queries import REGISTRY, _ensure_loaded  # noqa: E402

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
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
    results = {}
    for name in QUERIES:
        b = REGISTRY[name].builder
        b(spark, SFS[0]).count()  # warm the plan shape
        results[name] = [run_one(spark, b, sf) for sf in SFS]
        print(name, json.dumps(results[name]), flush=True)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "RELATIONAL_LADDER.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("\n| query | shuffle MB @sf0.001 | @sf0.01 | @sf0.1 | input MB @sf0.1 |")
    print("|---|---|---|---|---|")
    for name, (a, b, c) in results.items():
        print(
            f"| {name} | {a['shuffle_mb']} | {b['shuffle_mb']} | "
            f"{c['shuffle_mb']} | {c['input_mb']} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
