"""Interleaved A/B bench: a pinned commit vs HEAD over a shared
headline-query set, alternating in one session so both sides sample
the same box conditions (VERDICT r6 ask #1; r12 ask #2 reuses it for
the whole 21-query r11-vs-HEAD suite).

Usage:  python tools/ab_bench.py [commit] [pairs] [setname]
        setname: shared24 (default — the full r14 headline set),
                 shared23 (the r13 set),
                 shared21 (every query benched in BOTH r11 and r12),
                 shared13 (r5 era, for commit 324000e), suspect3

Design: each side runs as its own subprocess (own SparkSession) with
SPARK_GRAFT_BENCH_RUNS=2, in counterbalanced order A B B A A B B A …
so slow box drift cancels instead of biasing one side. Per query we
take the min across all of a side's invocations (same estimator as
bench.py's min-of-5). Output: a table + JSON written to AB_BENCH.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SETS: dict[str, list[str]] = {}

SHARED_21 = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q10_returned_items",
    "q_window_topk_per_group",
    "q_events_tumbling",
    "text_stats",
    "text_boilerplate_filter",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash",
    "dedup_passages",
    "dedup_substring_rate",
    "pipeline_clean_corpus",
    "pipeline_crawl_ingest",
    "pipeline_web_prepare",
    "ann_bruteforce_topk",
    "ann_knn_graph",
    "ann_knn_graph_auto",
    "multimodal_jpeg_decode_oracle",
]

SHARED_13 = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q10_returned_items",
    "q_window_topk_per_group",
    "q_events_tumbling",
    "text_stats",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash",
    "pipeline_clean_corpus",
    "ann_bruteforce_topk",
]


# the full 23-query r13 headline set (r14 hygiene ask: the next bench
# drift flag adjudicates in one command — this is the default)
SHARED_23 = SHARED_21 + [
    "events_rollup_cascade",
    "events_funnel_steps",
]

# the full 24-query r14 headline set (corpus_heavy_hitters joined in
# r14) — default so the next drift flag adjudicates in one command
SHARED_24 = SHARED_23 + [
    "corpus_heavy_hitters",
]

# the full 28-query r19 headline set (r19 optimization round: A/B
# evidence for the optimization wave vs the round-start pin b892e27)
SHARED_28 = SHARED_24 + [
    "sqlpp_docs_quality",
    "sqlpp_recursive_spine",
    "sqlpp_lateral_topk",
    "sqlpp_lateral_theta_topk",
    "sqlpp_lateral_agg",
]
# SHARED_24 still names the demoted fixed-cell ann_knn_graph; the r19
# headline replaced it with the auto twin (already in SHARED_21).
SHARED_28 = [q for q in SHARED_28 if q != "ann_knn_graph"]

SETS["shared13"] = SHARED_13
SETS["shared28"] = SHARED_28
SETS["shared21"] = SHARED_21
SETS["shared23"] = SHARED_23
SETS["shared24"] = SHARED_24
# the three rows whose shared21 ratios exceeded 1.2 under load — a
# quiet-box re-adjudication set (r13)
SETS["suspect3"] = [
    "dedup_substring_rate",
    "pipeline_clean_corpus",
    "ann_knn_graph",
]

QUERY_SET = SHARED_13  # rebound in main() from argv


def run_side(workdir: str, label: str, runs_per_call: int) -> dict[str, float]:
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_RUNS"] = str(runs_per_call)
    env["SPARK_GRAFT_BENCH_QUERIES"] = ",".join(QUERY_SET)
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    p = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=workdir,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    line = [l for l in p.stdout.splitlines() if l.startswith("{")]
    if not line:
        raise RuntimeError(f"{label}: no JSON line\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")
    doc = json.loads(line[-1])
    return {k: v for k, v in doc["queries"].items() if k in QUERY_SET}


def main() -> None:
    global QUERY_SET
    commit = sys.argv[1] if len(sys.argv) > 1 else "324000e"
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    setname = sys.argv[3] if len(sys.argv) > 3 else "shared24"
    # a name not in SETS is an ad-hoc comma-separated query list, so a
    # single-operator change can A/B just its affected rows
    QUERY_SET = SETS.get(setname) or setname.split(",")
    wt = os.path.join(REPO, ".ab", commit)
    if not os.path.isdir(wt):
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, commit],
            cwd=REPO,
            check=True,
        )
    # head side: optional argv[4] workdir (e.g. a detached worktree at
    # HEAD) so edits to the live tree during a long run can't leak in
    head_dir = sys.argv[4] if len(sys.argv) > 4 else REPO
    sides = {"pinned": wt, "head": head_dir}
    samples: dict[str, dict[str, list[float]]] = {s: {} for s in sides}
    # counterbalanced: A B B A repeated
    order = []
    for i in range(pairs):
        order += (["pinned", "head"] if i % 2 == 0 else ["head", "pinned"])
    for i, side in enumerate(order):
        try:
            load = os.getloadavg()[0]
        except OSError:
            load = -1.0
        print(f"[{i + 1}/{len(order)}] {side}  load1={load:.2f}", flush=True)
        t = run_side(sides[side], side, runs_per_call=2)
        for q, v in t.items():
            samples[side].setdefault(q, []).append(v)
    result = {"commit_pinned": commit, "pairs": pairs, "set": sys.argv[3] if len(sys.argv) > 3 else "shared24", "queries": {}}
    print(f"\n{'query':34s} {'pinned':>8s} {'head':>8s} {'ratio':>7s}")
    tot5 = toth = 0.0
    for q in QUERY_SET:
        # A query absent from one side (e.g. the pinned checkout never
        # registered it) is recorded as null, excluded from the
        # subtotal, and never becomes NaN — bare NaN is invalid JSON.
        a_s, b_s = samples["pinned"].get(q), samples["head"].get(q)
        if not a_s or not b_s:
            result["queries"][q] = {"pinned": None, "head": None, "ratio": None,
                                    "missing_from": [s for s, v in
                                                     (("pinned", a_s), ("head", b_s))
                                                     if not v]}
            print(f"{q:34s} {'--':>8s} {'--':>8s} {'--':>7s}")
            continue
        a, b = min(a_s), min(b_s)
        tot5 += a
        toth += b
        result["queries"][q] = {"pinned": round(a, 4), "head": round(b, 4),
                                "ratio": round(b / a, 3) if a else None}
        print(f"{q:34s} {a:8.3f} {b:8.3f} {b / a:7.2f}")
    result["subtotal"] = {"pinned": round(tot5, 4), "head": round(toth, 4),
                          "ratio": round(toth / tot5, 3) if tot5 else None}
    if tot5:
        print(f"{'SUBTOTAL':34s} {tot5:8.3f} {toth:8.3f} {toth / tot5:7.2f}")
    out_path = os.environ.get("AB_BENCH_OUT", "AB_BENCH.json")
    with open(os.path.join(REPO, out_path), "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
