"""Single-source-of-truth guards for the sampling/coverage records.

Round-16 verdict: SAMPLING.md carried three mutually inconsistent
hand-edited counts (254 / 260 / 211+49) and the committed
BENCH_LOCAL.json was a loaded-box driver run despite a commit message
claiming a quiet record.  These tests derive every headline number
from the primary artifacts (CORRECTNESS_r*.json, the registry, git
HEAD) and fail on drift, so the records can no longer disagree with
the data they describe.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from gen_sampling import derive_state, render  # noqa: E402


def _derived():
    return derive_state(REPO)


def test_sampling_module_in_sync_with_correctness_records():
    last_sampled, red_latest = _derived()
    with open(os.path.join(REPO, "sqlpp_spark", "queries", "_sampling.py")) as f:
        committed = f.read()
    assert committed == render(last_sampled, red_latest), (
        "sqlpp_spark/queries/_sampling.py is stale -- "
        "rerun `python tools/gen_sampling.py`"
    )


def test_sampling_md_stats_block_matches_derived():
    from sqlpp_spark.queries import all_oracles, all_queries

    last_sampled, red_latest = _derived()
    q = all_queries()
    stats = {
        "registry": len(q),
        "oracled": len(all_oracles()),
        "driver_sampled_cumulative": len(set(last_sampled) & set(q)),
        "never_sampled": len(set(q) - set(last_sampled)),
        "red_latest": len([n for n in red_latest if n in q]),
    }
    with open(os.path.join(REPO, "SAMPLING.md")) as f:
        text = f.read()
    block = re.search(r"<!-- sampling-stats.*?-->", text, re.S)
    assert block, "SAMPLING.md lost its machine-checked sampling-stats block"
    declared = dict(
        (m.group(1), int(m.group(2)))
        for m in re.finditer(r"^(\w+): (\d+)$", block.group(0), re.M)
    )
    assert declared == stats, (
        f"SAMPLING.md stats block {declared} != derived {stats} -- "
        "update the block (and the prose) to match"
    )


def test_export_order_red_latest_first_then_least_recent():
    from sqlpp_spark.queries import all_queries
    from sqlpp_spark.queries._sampling import LAST_SAMPLED, RED_LATEST

    names = list(all_queries())
    red = [n for n in RED_LATEST if n in names]
    assert names[: len(red)] == sorted(red)
    rounds = [LAST_SAMPLED.get(n, 0) for n in names[len(red):]]
    assert rounds == sorted(rounds), "tail not ordered by last-sampled round"


def _head_bench():
    try:
        out = subprocess.run(
            ["git", "show", "HEAD:BENCH_LOCAL.json"],
            capture_output=True, text=True, cwd=REPO, check=True,
        ).stdout
    except (subprocess.CalledProcessError, FileNotFoundError):
        pytest.skip("no committed BENCH_LOCAL.json / not a git checkout")
    return json.loads(out)


def test_committed_bench_local_is_a_quiet_record():
    """The driver clobbers the working-tree BENCH_LOCAL.json with its own
    loaded-box run every round (r15 AND r16 both committed the clobbered
    state).  Guard the COMMITTED file: it must be a quiet min-of->=5
    record, or round-over-round raw comparisons are meaningless."""
    bench = _head_bench()
    load_before = bench.get("loadavg", {}).get("before")
    assert load_before is not None and load_before < 1.0, (
        f"committed BENCH_LOCAL.json has loadavg.before={load_before} "
        "(>= 1.0: a loaded-box run, likely the driver's clobber) -- "
        "re-record on a quiet box and commit that"
    )
    assert bench.get("runs", 0) >= 5, (
        f"committed BENCH_LOCAL.json has runs={bench.get('runs')} < 5"
    )
