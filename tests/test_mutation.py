"""Unit tests for ops/mutation.py (SCD2 merge, snapshot diff) — the
edge cases the registry oracle can't isolate: NULL attribute
transitions, closed-history passthrough, no-op updates, and the four
diff states."""

from __future__ import annotations

import datetime as dt

import pytest

from sqlpp_spark.ops.mutation import scd2_merge, snapshot_diff


def _ts(s):
    return dt.datetime.fromisoformat(s)


T0 = _ts("2020-01-01 00:00:00")
T1 = _ts("2022-01-01 00:00:00")
EFF = _ts("2024-06-01 00:00:00")


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame(
        [
            # key 1: closed history row + current row
            (1, "a-old", 10.0, T0, T1),
            (1, "a", 11.0, T1, None),
            # key 2: current, will be updated to the SAME values (no-op)
            (2, "b", 20.0, T0, None),
            # key 3: current, attr will transition to NULL
            (3, "c", 30.0, T0, None),
            # key 4: current, not present in the update batch
            (4, "d", 40.0, T0, None),
        ],
        "k long, name string, bal double, valid_from timestamp, valid_to timestamp",
    )


def test_scd2_merge_semantics(spark, dim):
    updates = spark.createDataFrame(
        [
            (1, "a", 12.0),      # changed balance → close + open
            (2, "b", 20.0),      # identical → no-op
            (3, None, 30.0),     # NULL transition IS a change
            (9, "new", 90.0),    # brand-new key
        ],
        "k long, name string, bal double",
    )
    out = scd2_merge(
        dim, updates, key_cols=["k"], tracked_cols=["name", "bal"],
        effective_ts=EFF,
    ).collect()
    rows = sorted(out, key=lambda r: (r.k, r.valid_from))
    by_key = {}
    for r in rows:
        by_key.setdefault(r.k, []).append(r)

    # key 1: history row untouched; old current closed at EFF; new row open
    assert [(r.valid_from, r.valid_to) for r in by_key[1]] == [
        (T0, T1), (T1, EFF), (EFF, None)
    ]
    assert by_key[1][-1].bal == 12.0
    # key 2: no-op — single row, still open
    assert [(r.valid_from, r.valid_to) for r in by_key[2]] == [(T0, None)]
    # key 3: NULL transition closes and opens with name NULL
    assert [(r.valid_to) for r in by_key[3]] == [EFF, None]
    assert by_key[3][-1].name is None
    # key 4: absent from batch — untouched
    assert [(r.valid_from, r.valid_to) for r in by_key[4]] == [(T0, None)]
    # key 9: new key opens at EFF with no history
    assert [(r.valid_from, r.valid_to) for r in by_key[9]] == [(EFF, None)]
    assert len(rows) == 8


def test_scd2_merge_validates_columns(spark, dim):
    with pytest.raises(ValueError):
        scd2_merge(
            dim.drop("valid_to"),
            dim.limit(0),
            key_cols=["k"],
            tracked_cols=["name"],
            effective_ts=EFF,
        )


def test_snapshot_diff_states(spark):
    old = spark.createDataFrame(
        [(1, "same"), (2, "was"), (3, "gone"), (5, None)],
        "id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "now"), (4, "fresh"), (5, "")],
        "id long, text string",
    )
    out = {r.id: r for r in snapshot_diff(old, new, ["id"], ["text"]).collect()}
    assert out[1].change == "unchanged"
    assert out[2].change == "changed"
    assert out[3].change == "removed" and out[3].new_hash is None
    assert out[4].change == "added" and out[4].old_hash is None
    assert out[5].change == "changed"  # NULL → '' is a change, not a collision
    assert len(out) == 5
