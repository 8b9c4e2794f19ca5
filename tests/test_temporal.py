"""Unit tests for ops/temporal.py (as-of join, bounded range join) —
edge cases the registry oracle can't isolate: no-match NULLs,
inclusive boundaries, right-timestamp ties, window boundaries."""

from __future__ import annotations

import datetime as dt

import pytest

from sqlpp_spark.ops.temporal import asof_join, range_count


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def tiny(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 10:00:00")),
            (2, 10, _ts("2024-01-01 12:00:00")),
            (3, 20, _ts("2024-01-01 09:00:00")),  # no right rows for key 20 before
            (4, 30, _ts("2024-01-01 09:00:00")),  # key 30 has no right rows at all
        ],
        "id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-01 09:30:00"), 1.0),
            (101, 10, _ts("2024-01-01 10:00:00"), 2.0),  # tie with left id=1
            (102, 10, _ts("2024-01-01 10:00:00"), 3.0),  # same ts, larger rid wins
            (103, 10, _ts("2024-01-01 11:59:00"), 4.0),
            (104, 20, _ts("2024-01-01 09:30:00"), 5.0),  # after left id=3
        ],
        "rid long, k long, ts timestamp, v double",
    )
    return left, right


def test_asof_backward_inclusive_and_ties(tiny):
    left, right = tiny
    out = asof_join(
        left, right, on=["k"], payload=["ts", "v"], right_order="rid"
    )
    rows = {r.id: r for r in out.collect()}
    assert len(rows) == 4
    # id=1: ties at 10:00 resolve to the larger rid (102, v=3.0)
    assert rows[1].asof_v == 3.0 and rows[1].asof_ts == _ts("2024-01-01 10:00:00")
    # id=2: latest at-or-before 12:00 is 11:59
    assert rows[2].asof_v == 4.0
    # id=3: right row exists but only AFTER the left ts -> NULL
    assert rows[3].asof_v is None and rows[3].asof_ts is None
    # id=4: no right rows for the key at all -> NULL
    assert rows[4].asof_v is None


def test_asof_keeps_all_left_columns(tiny):
    left, right = tiny
    out = asof_join(left, right, on=["k"], payload=["v"])
    assert set(out.columns) == {"id", "k", "ts", "asof_v"}
    assert out.count() == left.count()


def test_range_count_window_boundaries(spark):
    left = spark.createDataFrame(
        [(1, 5, _ts("2024-01-01 10:00:00"))], "id long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (5, _ts("2024-01-01 09:00:00")),   # exactly window start: INCLUDED
            (5, _ts("2024-01-01 08:59:59")),   # before window: excluded
            (5, _ts("2024-01-01 09:30:00")),   # inside: included
            (5, _ts("2024-01-01 10:00:00")),   # == left ts: EXCLUDED (half-open)
            (6, _ts("2024-01-01 09:30:00")),   # other key: excluded
        ],
        "k long, ts timestamp",
    )
    out = range_count(left, right, on=["k"], window_seconds=3600, count_col="n")
    assert out.collect()[0].n == 2


def test_range_count_zero_matches_kept(spark):
    left = spark.createDataFrame(
        [(1, 5, _ts("2024-01-01 10:00:00")), (2, 7, _ts("2024-01-01 10:00:00"))],
        "id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(5, _ts("2024-01-01 09:30:00"))], "k long, ts timestamp"
    )
    out = range_count(left, right, on=["k"], window_seconds=3600, count_col="n")
    got = {r.id: r.n for r in out.collect()}
    assert got == {1: 1, 2: 0}


def test_range_count_duplicate_left_rows_counted_individually(spark):
    """Two identical left rows must EACH get their own count (3), not
    the group total (6) — regression for the all-columns group/join."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [("a", t0), ("a", t0)], "k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("a", t0 - dt.timedelta(minutes=m)) for m in (1, 2, 3)],
        "k string, ts timestamp",
    )
    out = range_count(left, right, on=["k"], window_seconds=3600, count_col="n")
    assert [r.n for r in out.collect()] == [3, 3]
    assert out.count() == 2


def test_range_count_null_key_matches_nothing(spark):
    """A left row with a NULL key joins nothing (NULL != NULL) and its
    count coalesces to 0; NULL payload columns don't break the rejoin."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(None, t0, None), ("a", t0, "p")],
        "k string, ts timestamp, payload string",
    )
    right = spark.createDataFrame(
        [(None, t0 - dt.timedelta(minutes=1)), ("a", t0 - dt.timedelta(minutes=1))],
        "k string, ts timestamp",
    )
    out = {(r.k, r.payload): r.n for r in range_count(
        left, right, on=["k"], window_seconds=3600, count_col="n"
    ).collect()}
    assert out[(None, None)] == 0
    assert out[("a", "p")] == 1


def test_asof_null_key_yields_null_payload(spark):
    """NULL-key left rows must NOT pick up NULL-key right rows."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(None, t0), ("a", t0)], "k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [(None, t0 - dt.timedelta(minutes=1), 99), ("a", t0 - dt.timedelta(minutes=1), 7)],
        "k string, ts timestamp, v int",
    )
    out = {r.k: r.asof_v for r in asof_join(
        left, right, on=["k"], payload=["v"]
    ).collect()}
    assert out[None] is None
    assert out["a"] == 7


# ---------------------------------------------------------------------------
# gapfill / rollup_cascade (r13 hypertable ops)
# ---------------------------------------------------------------------------


def test_gapfill_locf_and_grid(spark):
    from sqlpp_spark.ops.temporal import gapfill

    df = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:10:00"), 10.0),
            (1, _ts("2024-01-01 00:20:00"), 2.0),   # same bucket as above
            (1, _ts("2024-01-01 03:10:00"), 7.0),   # buckets 1,2 are gaps
            (2, _ts("2024-01-01 05:00:00"), 1.0),   # single-bucket group
        ],
        "g long, ts timestamp, value double",
    )
    out = gapfill(df, ["g"], bucket_seconds=3600, method="locf")
    rows = {(r.g, r.pos): r for r in out.collect()}
    # dense grid: group 1 spans 4 hourly buckets, group 2 spans 1
    assert len(rows) == 5
    base = min(p for (g, p) in rows if g == 1)
    assert rows[(1, base)].bucket_value == 12.0  # 10+2 summed in-bucket
    assert rows[(1, base)].n_events == 2
    # interior gaps carry the last sum forward, count 0
    assert rows[(1, base + 1)].bucket_value == 12.0
    assert rows[(1, base + 1)].n_events == 0
    assert rows[(1, base + 2)].bucket_value == 12.0
    assert rows[(1, base + 3)].bucket_value == 7.0


def test_gapfill_interpolate_interior_only(spark):
    from sqlpp_spark.ops.temporal import gapfill

    df = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:30:00"), 10.0),
            (1, _ts("2024-01-01 04:30:00"), 2.0),  # 3 interior gap buckets
        ],
        "g long, ts timestamp, value double",
    )
    out = gapfill(df, ["g"], bucket_seconds=3600, method="interpolate")
    rows = sorted(out.collect(), key=lambda r: r.pos)
    vals = [r.bucket_value for r in rows]
    assert vals == [10.0, 8.0, 6.0, 4.0, 2.0]  # exact linear steps
    # timestamps land on bucket boundaries
    assert all(r.bucket_ts.minute == 0 for r in rows)


def test_rollup_cascade_equals_direct(spark):
    """The cascade (15 min → 1 h → 1 d) must be EXACTLY the direct
    daily aggregate — the re-aggregation identity."""
    import random

    from pyspark.sql import functions as F

    from sqlpp_spark.ops.temporal import rollup_cascade, time_bucket

    rng = random.Random(7)
    rows = [
        (
            rng.choice(["a", "b"]),
            _ts("2024-01-01 00:00:00")
            + dt.timedelta(seconds=rng.randrange(3 * 86400)),
            round(rng.uniform(0, 100), 2),
        )
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    casc = rollup_cascade(df, ["event_type"], levels=(900, 3600, 86400))
    direct = (
        df.groupBy(
            "event_type", time_bucket(F.col("ts"), 86400).alias("d")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .withColumn("avg_value", F.col("sum_value") / F.col("n_events"))
        .withColumn(
            "bucket_ts", F.timestamp_seconds(F.col("d") * F.lit(86400))
        )
        .select(
            "event_type", "bucket_ts", "n_events", "sum_value",
            "min_value", "max_value", "avg_value",
        )
    )
    a = sorted(map(tuple, casc.collect()))
    b = sorted(map(tuple, direct.collect()))
    assert a == b


def test_funnel_order_window_and_dropoff(spark):
    from sqlpp_spark.ops.temporal import funnel

    df = spark.createDataFrame(
        [
            # user 1: full funnel in order, inside windows
            (1, "view", _ts("2024-01-01 10:00:00")),
            (1, "click", _ts("2024-01-01 10:30:00")),
            (1, "purchase", _ts("2024-01-01 11:00:00")),
            # user 2: click BEFORE the first view — must not count
            (2, "click", _ts("2024-01-01 09:00:00")),
            (2, "view", _ts("2024-01-01 10:00:00")),
            # user 3: click outside the 1 h window
            (3, "view", _ts("2024-01-01 10:00:00")),
            (3, "click", _ts("2024-01-01 11:30:00")),
            # user 4: purchase without click — step order is strict
            (4, "view", _ts("2024-01-01 10:00:00")),
            (4, "purchase", _ts("2024-01-01 10:10:00")),
            # user 5: never viewed — not in the funnel at all
            (5, "click", _ts("2024-01-01 10:00:00")),
        ],
        "user_id long, event_type string, ts timestamp",
    )
    out = funnel(
        df, steps=[("view", None), ("click", 3600), ("purchase", 3600)]
    )
    rows = {r.user_id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}  # user 5 never entered
    assert rows[1].t2 == _ts("2024-01-01 10:30:00")
    assert rows[1].t3 == _ts("2024-01-01 11:00:00")
    assert rows[2].t2 is None  # pre-view click ignored
    assert rows[3].t2 is None  # window exceeded
    assert rows[4].t2 is None and rows[4].t3 is None  # strict order


def test_cohort_retention_math(spark):
    from sqlpp_spark.ops.temporal import cohort_retention

    day = 86400
    df = spark.createDataFrame(
        [
            # cohort week 0: users 1,2 — user 1 returns in week 1
            (1, _ts("1970-01-01 12:00:00")),
            (2, _ts("1970-01-02 12:00:00")),
            (1, _ts("1970-01-09 12:00:00")),
            # cohort week 1: user 3
            (3, _ts("1970-01-10 12:00:00")),
        ],
        "user_id long, ts timestamp",
    )
    out = cohort_retention(df, bucket_seconds=7 * day)
    rows = {(r.cohort_ts, r.week_offset): r for r in out.collect()}
    w0 = _ts("1970-01-01 00:00:00")
    w1 = _ts("1970-01-08 00:00:00")
    assert rows[(w0, 0)].n_users == 2
    assert rows[(w0, 1)].n_users == 1
    assert rows[(w0, 1)].retention == 0.5
    assert rows[(w1, 0)].n_users == 1
    assert len(rows) == 3


def test_pointintime_join_version_selection(spark):
    from sqlpp_spark.ops.temporal import pointintime_join

    dim = spark.createDataFrame(
        [
            (1, 100.0, _ts("2024-01-01 00:00:00"), _ts("2024-01-10 00:00:00")),
            (1, 200.0, _ts("2024-01-10 00:00:00"), None),
            (2, 300.0, _ts("2024-01-05 00:00:00"), None),
        ],
        "k long, bal double, valid_from timestamp, valid_to timestamp",
    )
    fact = spark.createDataFrame(
        [
            (10, 1, _ts("2024-01-05 00:00:00")),   # version 1
            (11, 1, _ts("2024-01-10 00:00:00")),   # boundary: v2 (from incl.)
            (12, 1, _ts("2024-02-01 00:00:00")),   # open-ended v2
            (13, 2, _ts("2024-01-01 00:00:00")),   # before any version → NULL
            (14, 3, _ts("2024-01-05 00:00:00")),   # unknown key → NULL
        ],
        "fid long, k long, ts timestamp",
    )
    out = {
        r.fid: r.dim_bal
        for r in pointintime_join(
            fact, dim, on=["k"], payload=["bal"]
        ).collect()
    }
    assert out == {10: 100.0, 11: 200.0, 12: 200.0, 13: None, 14: None}


def test_time_bucket_floors_negative_epochs(spark):
    """r14 (advice): Spark's % follows the dividend's sign, so the old
    (x - x % w)/w truncated toward zero for pre-1970 timestamps; pmod
    gives true floor semantics matching the oracle's ``//``."""
    from sqlpp_spark.ops.temporal import time_bucket
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [
            (1, _ts("1969-12-31 23:59:59")),  # epoch -1s  -> bucket -1
            (2, _ts("1969-12-31 23:00:00")),  # -3600s     -> bucket -1
            (3, _ts("1969-12-31 22:59:59")),  # -3601s     -> bucket -2
            (4, _ts("1970-01-01 00:00:00")),  # 0          -> bucket 0
            (5, _ts("1970-01-01 00:59:59")),  # 3599s      -> bucket 0
            (6, _ts("1970-01-01 01:00:00")),  # 3600s      -> bucket 1
        ],
        "id long, ts timestamp",
    )
    got = {
        r.id: r.b
        for r in df.select(
            "id", time_bucket(F.col("ts"), 3600).alias("b")
        ).collect()
    }
    want = {
        r.id: r.b
        for r in df.select(
            "id",
            F.floor(F.unix_micros(F.col("ts")) / (3600 * 1_000_000))
            .cast("bigint").alias("b"),
        ).collect()
    }
    assert got == want == {1: -1, 2: -1, 3: -2, 4: 0, 5: 0, 6: 1}
