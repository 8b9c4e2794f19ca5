"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Self-adjudication fields (so a round-over-round delta can be judged
without re-running anything):

- ``median``: per-query median of the timed runs (the min is the
  headline number; min vs median gap exposes load-spike pollution).
- ``loadavg``: the box's 1-minute load average sampled at process
  launch (before the SparkSession/warmup exist — ``before``) and after
  the timed pass (``after``) — a busy shared box shows up directly in
  ``before``; ``after`` mostly reflects our own 32-thread run.
- ``shared_subtotal`` / ``shared_queries``: subtotal over the
  intersection of this run's query set with the previous round's
  ``BENCH_r{N}.json`` query set, so growth of the headline set never
  masquerades as a regression (and vice versa).

``SPARK_GRAFT_BENCH_QUERIES`` (comma-separated names) restricts the
run — used by tools/ab_bench.py to interleave two checkouts over the
same query subset.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sqlpp_spark.queries import headline_queries  # noqa: E402
from sqlpp_spark.session import get_spark  # noqa: E402


def _previous_round_queries() -> tuple[int | None, set[str]]:
    """Query names from the latest BENCH_r{N}.json next to this file."""
    here = os.path.dirname(os.path.abspath(__file__))
    best_n, names = None, set()
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        n = int(m.group(1))
        if best_n is not None and n <= best_n:
            continue
        try:
            with open(path) as f:
                doc = json.load(f)
            q = (doc.get("parsed") or doc).get("queries") or {}
            if q:
                best_n, names = n, set(q)
        except Exception:
            continue
    return best_n, names


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    # Sample BEFORE the SparkSession exists: the warmup pass below runs
    # every query across 32 threads, so a sample taken after it reflects
    # our own warmup, not whether the box was quiet at launch.
    try:
        load_before = round(os.getloadavg()[0], 2)
    except OSError:
        load_before = None
    spark = get_spark("sqlpp_spark_bench")

    specs = headline_queries()
    only = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if only:
        # resolve from the FULL registry so an A/B pin can keep timing
        # a query demoted from the headline set (r18: ann_knn_graph)
        from sqlpp_spark.queries import REGISTRY

        keep = {s.strip() for s in only.split(",") if s.strip()}
        specs = {n: s for n, s in REGISTRY.items() if n in keep}
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
    medians: dict[str, float] = {}
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
        ordered = sorted(samples)
        mid = len(ordered) // 2
        med = (
            ordered[mid]
            if len(ordered) % 2
            else (ordered[mid - 1] + ordered[mid]) / 2
        )
        timings[name] = round(best, 4)
        medians[name] = round(med, 4)
        spreads[name] = round((max(samples) - best) / best, 3) if best else 0.0
    try:
        load_after = round(os.getloadavg()[0], 2)
    except OSError:
        load_after = None
    total = round(sum(timings.values()), 4)
    prev_round, prev_names = _previous_round_queries()
    shared = sorted(set(timings) & prev_names)
    out = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "runs": runs,
        "spread": spreads,
        "median": medians,
        "loadavg": {"before": load_before, "after": load_after},
    }
    if shared:
        out["shared_subtotal"] = round(sum(timings[n] for n in shared), 4)
        out["shared_with_round"] = prev_round
        out["shared_queries"] = shared
    # The driver captures a bounded tail of stdout; round 7's record was
    # lost when Spark's console-progress \r spam pushed the JSON line out
    # of the window ("parsed": null). Three defenses: console progress is
    # disabled in get_spark(), the session is stopped BEFORE printing so
    # no JVM shutdown chatter can follow the record, and the same object
    # is written to BENCH_LOCAL.json so the record never depends on tail
    # capture at all.
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_LOCAL.json"), "w") as f:
        f.write(json.dumps(out, separators=(",", ":")) + "\n")
    # The printed line drops the per-query median/spread maps (they
    # live in BENCH_LOCAL.json) so it stays well inside the driver's
    # tail-capture window; everything the driver parses is present.
    slim = {
        k: v for k, v in out.items() if k not in ("median", "spread")
    }
    slim["median_total"] = round(sum(medians.values()), 4)
    spark.stop()
    sys.stderr.flush()
    print(json.dumps(slim, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
