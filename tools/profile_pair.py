"""Interleaved variance profile for one query against a stable
reference query in the SAME session (VERDICT r7 ask #4: name the cause
of pipeline_clean_corpus's ±70% run-to-run swing — code or box).

Method: alternate target/reference N times; if the target's wall time
tracks the reference's (per-pair ratio stable while absolutes swing),
the variance is box state, not the target's plan. A code-level cause
(e.g. a racy double-materialization) would swing the target
independently of the reference.

Usage: python tools/profile_pair.py [target] [reference] [pairs]
Writes PROFILE_<target>.json next to this file's parent.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sqlpp_spark.ops import release_intermediates  # noqa: E402
from sqlpp_spark.queries import headline_queries  # noqa: E402
from sqlpp_spark.session import get_spark  # noqa: E402


def timed(spark, spec, sf_dir):
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    df = spec.builder(spark, sf_dir)
    df.count()
    dt = time.perf_counter() - t0
    release_intermediates(df)
    return dt


def main() -> None:
    target = sys.argv[1] if len(sys.argv) > 1 else "pipeline_clean_corpus"
    ref = sys.argv[2] if len(sys.argv) > 2 else "dedup_minhash"
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_pair")
    specs = headline_queries()
    t_spec, r_spec = specs[target], specs[ref]
    # warm both plans once
    timed(spark, t_spec, sf_dir)
    timed(spark, r_spec, sf_dir)
    rows = []
    for i in range(pairs):
        load = os.getloadavg()[0]
        # counterbalanced order so drift within a pair cancels
        if i % 2 == 0:
            dt_t = timed(spark, t_spec, sf_dir)
            dt_r = timed(spark, r_spec, sf_dir)
        else:
            dt_r = timed(spark, r_spec, sf_dir)
            dt_t = timed(spark, t_spec, sf_dir)
        rows.append({
            "i": i, "load1": round(load, 2),
            "target_s": round(dt_t, 3), "ref_s": round(dt_r, 3),
            "ratio": round(dt_t / dt_r, 3),
        })
        print(rows[-1], flush=True)
    ts = sorted(r["target_s"] for r in rows)
    rs = sorted(r["ratio"] for r in rows)
    out = {
        "target": target, "ref": ref, "sf_dir": sf_dir, "pairs": pairs,
        "runs": rows,
        "target_min": ts[0], "target_max": ts[-1],
        "target_spread": round((ts[-1] - ts[0]) / ts[0], 3),
        "ratio_min": rs[0], "ratio_max": rs[-1],
        "ratio_spread": round((rs[-1] - rs[0]) / rs[0], 3),
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, f"PROFILE_{target}.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "runs"}))
    spark.stop()


if __name__ == "__main__":
    main()
