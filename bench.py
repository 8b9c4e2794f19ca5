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
    # Warmup pass at the smallest SF: compiles every query's plan once
    # (whole-stage codegen + JIT are keyed on plan shape, not data), so
    # the timed pass below measures steady-state execution at the
    # target SF instead of first-run compilation.
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for spec in specs.values():
        try:
            spec.builder(spark, warm_dir).count()
        except Exception:
            pass

    # Five timed runs per query, report the min (steady-state: AQE
    # re-plans per input size, so the sf0.001 warmup doesn't compile
    # the sf-target stage plans; run 1 pays that residual JIT, later
    # runs measure execution). Min-of-5 because the shared box's load
    # swings individual runs ±30% — fewer samples regularly report a
    # load spike as a 2× "regression". clearCache between queries
    # keeps each measurement independent of earlier persisted blocks.
    # Per-query spread = (max - min) / min over the timed runs is
    # reported so a round-over-round delta can be judged against the
    # measured noise floor instead of assumed real.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name, spec in specs.items():
        samples: list[float] = []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = spec.builder(spark, sf_dir)
            n = df.count() if df.isStreaming is False else -1
            samples.append(time.perf_counter() - t0)
            _ = n
        best = min(samples)
        timings[name] = round(best, 4)
        spreads[name] = round((max(samples) - best) / best, 3) if best else 0.0
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "runs": runs,
                "spread": spreads,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
