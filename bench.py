"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sqlpp_spark.queries import headline_queries  # noqa: E402
from sqlpp_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("sqlpp_spark_bench")

    specs = headline_queries()
    # Warm the JVM + parquet footers once with the cheapest query so
    # per-query timings measure execution, not session startup.
    first = next(iter(specs.values()))
    first.builder(spark, sf_dir).limit(1).collect()

    timings: dict[str, float] = {}
    for name, spec in specs.items():
        t0 = time.perf_counter()
        df = spec.builder(spark, sf_dir)
        n = df.count() if df.isStreaming is False else -1
        timings[name] = round(time.perf_counter() - t0, 4)
        _ = n
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
