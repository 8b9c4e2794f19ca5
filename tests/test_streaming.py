"""Streaming tests: memory-sink runs driven to completion, compared
against the equivalent batch aggregation on the same data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sqlpp_spark.sources.tables import read_table
from sqlpp_spark.streaming import (
    read_events_stream,
    run_stream_to_memory,
    session_windows,
    stateful_user_counts,
    tumbling_counts,
)
from sqlpp_spark.streaming.events import FLUSH_USER_ID, sliding_counts


@pytest.fixture(scope="module")
def batch_events(spark, sf_dir):
    return read_table(spark, sf_dir, "events")


def test_tumbling_counts_matches_batch(spark, sf_dir, batch_events):
    stream = read_events_stream(spark, sf_dir)
    out = run_stream_to_memory(tumbling_counts(stream), "t_tumbling")
    got = {
        (r.window_start, r.event_type): (r.n, r.total_value) for r in out.collect()
    }
    want_df = (
        batch_events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("tv"),
        )
        .select(F.col("w.start").alias("ws"), "event_type", "n", "tv")
    )
    want = {(r.ws, r.event_type): (r.n, r.tv) for r in want_df.collect()}
    # append mode only emits windows the watermark has CLOSED: the
    # trailing windows of a finite stream stay open and never emit —
    # that's correct late-data semantics, so assert (a) every emitted
    # window matches batch exactly, (b) only trailing windows are absent
    from datetime import timedelta

    assert set(got) <= set(want)
    for k in got:
        assert got[k] == want[k], k
    max_ws = max(ws for ws, _ in want)
    for ws, et in set(want) - set(got):
        assert ws >= max_ws - timedelta(hours=2), f"non-trailing window missing: {ws} {et}"


def test_sliding_counts_each_event_in_two_windows(spark, sf_dir, batch_events):
    stream = read_events_stream(spark, sf_dir)
    out = run_stream_to_memory(
        sliding_counts(stream), "t_sliding", output_mode="complete"
    )
    total = out.agg(F.sum("n")).first()[0]
    n_events = batch_events.count()
    assert total == 2 * n_events  # 1h span / 30m slide → 2 windows each
    # windows align to the 30-minute grid and span exactly one hour
    for r in out.limit(50).collect():
        assert r.window_start.minute in (0, 30) and r.window_start.second == 0
        assert (r.window_end - r.window_start).total_seconds() == 3600


def test_watermark_drops_late_rows(spark, tmp_path):
    """Feed two files: current data, then a row 3h older than the
    watermark high-mark. Append-mode output must never include the
    late row's window."""
    import os

    d = str(tmp_path / "latestream")
    os.makedirs(d)
    df1 = spark.createDataFrame(
        [(1, "2024-01-01 12:10:00", 1, "click", 1.0, "{}"),
         (2, "2024-01-01 12:20:00", 1, "click", 1.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    df2 = spark.createDataFrame(
        [(3, "2024-01-01 18:00:00", 1, "click", 1.0, "{}"),  # advances watermark to 16:00
         (4, "2024-01-01 09:00:00", 1, "late", 1.0, "{}")],  # 7h late: dropped
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    df1.write.parquet(f"{d}/f1.parquet")
    df2.write.parquet(f"{d}/f2.parquet")
    stream = (
        spark.readStream.schema(df1.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    agg = tumbling_counts(stream, window="1 hour", watermark="2 hours")
    out = run_stream_to_memory(agg, "t_late", output_mode="append")
    types = {r.event_type for r in out.collect()}
    assert "late" not in types  # the 09:00 row arrived past the watermark


def test_session_windows_run(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    out = run_stream_to_memory(session_windows(stream), "t_sessions")
    rows = out.collect()
    assert len(rows) > 0
    for r in rows[:50]:
        assert r.session_end >= r.session_start
        assert r.n_events >= 1


def test_session_windows_match_batch_sessionization(spark, sf_dir, batch_events):
    """Streaming session_window sessions must coincide with the batch
    lag-gap sessionization: same (user, start, last-event, count) for
    every watermark-closed session. (session_window's `end` is
    last_event + gap, so subtract the 30m gap before comparing.)"""
    from datetime import timedelta

    stream = read_events_stream(spark, sf_dir)
    out = run_stream_to_memory(session_windows(stream), "t_sessions_eq")
    got = {
        (r.user_id, r.session_start, r.session_end - timedelta(minutes=30), r.n_events)
        for r in out.collect()
    }
    from pyspark.sql import Window as W

    win = W.partitionBy("user_id").orderBy("ts", "event_id")
    cum = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(win))
    sess = (
        batch_events.withColumn(
            "new_s", F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
        )
        .withColumn("sid", F.sum("new_s").over(cum))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("s"), F.max("ts").alias("e"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    want = {(r.user_id, r.s, r.e, r.n) for r in sess.collect()}
    # append mode withholds sessions the watermark hasn't closed;
    # everything emitted must be a real batch session, and coverage of
    # the non-trailing sessions must be high
    assert got <= want
    assert len(got) >= 0.8 * len(want)


def test_stateful_user_counts(spark, sf_dir, batch_events):
    stream = read_events_stream(spark, sf_dir)
    out = run_stream_to_memory(
        stateful_user_counts(stream), "t_stateful", output_mode="update"
    )
    # final state per user (last emitted row) must equal the batch counts
    final = (
        out.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("max_value").alias("max_value"))
        .collect()
    )
    got = {r.user_id: (r.n_events, r.max_value) for r in final}
    want_df = batch_events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("value").alias("mx")
    )
    want = {r.user_id: (r.n, r.mx) for r in want_df.collect()}
    assert got == want


def test_stream_stream_join_equals_batch(spark, sf_dir, batch_events):
    from sqlpp_spark.streaming.events import (
        purchase_click_join, read_events_stream, run_stream_to_memory,
    )

    out = run_stream_to_memory(
        purchase_click_join(read_events_stream(spark, sf_dir)),
        "t_pcjoin", "append",
    )
    got = {
        (r.purchase_id, r.click_ts) for r in out.collect()
    }
    p = batch_events.filter(F.col("event_type") == "purchase").alias("p")
    c = batch_events.filter(F.col("event_type") == "click").alias("c")
    want_df = p.join(
        c,
        on=(
            (F.col("c.user_id") == F.col("p.user_id"))
            & (F.col("c.ts") >= F.col("p.ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c.ts") < F.col("p.ts"))
        ),
    ).select(F.col("p.event_id").alias("purchase_id"), F.col("c.ts").alias("click_ts"))
    want = {(r.purchase_id, r.click_ts) for r in want_df.collect()}
    assert got == want and len(got) > 0


def test_stream_dedup_one_row_per_key(spark, sf_dir, batch_events):
    from sqlpp_spark.streaming.events import (
        dedup_events_stream, read_events_stream, run_stream_to_memory,
    )

    out = run_stream_to_memory(
        dedup_events_stream(read_events_stream(spark, sf_dir)),
        "t_sdedup", "append",
    )
    # one survivor per (user, type): the fixture spans < the watermark
    # horizon, so every duplicate key is suppressed
    n_keys = batch_events.select("user_id", "event_type").distinct().count()
    assert out.count() == n_keys
    assert (
        out.groupBy("user_id", "event_type").count().filter(F.col("count") > 1).count()
        == 0
    )


def test_exactly_once_sink_matches_batch_and_survives_redelivery(
    spark, sf_dir, batch_events, tmp_path
):
    """End-to-end exactly-once: sink output equals the batch table; a
    restart from the SAME checkpoint is a no-op via the batch ledger; a
    FOREIGN checkpoint (fresh or different query) against the same
    out_dir fails fast instead of silently colliding batch ids; torn
    uncommitted writes stay invisible."""
    import os

    from sqlpp_spark.streaming.events import (
        read_events_stream,
        read_exactly_once_output,
        write_stream_exactly_once,
    )

    out = str(tmp_path / "sink")
    write_stream_exactly_once(
        read_events_stream(spark, sf_dir), out, str(tmp_path / "ckpt1")
    )
    got = read_exactly_once_output(spark, out)
    assert got.count() == batch_events.count()
    assert (
        got.agg(F.sum("event_id")).first()[0]
        == batch_events.agg(F.sum("event_id")).first()[0]
    )

    # restart from the same checkpoint: a redelivered batch is a no-op
    # via the ledger — still no duplicates
    write_stream_exactly_once(
        read_events_stream(spark, sf_dir), out, str(tmp_path / "ckpt1")
    )
    assert read_exactly_once_output(spark, out).count() == batch_events.count()

    # a FRESH checkpoint restarts batch ids at 0 — colliding with the
    # ledger would silently drop new data, so the sink must refuse
    with pytest.raises(ValueError, match="owned by streaming query"):
        write_stream_exactly_once(
            read_events_stream(spark, sf_dir), out, str(tmp_path / "ckpt2")
        )

    # a torn write of an uncommitted batch must be invisible
    junk = batch_events.limit(5)
    junk.write.mode("overwrite").parquet(os.path.join(out, "batch_id=999"))
    assert read_exactly_once_output(spark, out).count() == batch_events.count()


def test_session_windows_restart_from_checkpoint_equals_uninterrupted(
    spark, sf_dir, tmp_path,
):
    """The production failure mode (round-8 ask #6): a session-window
    query is STOPPED between micro-batches and restarted on the same
    checkpoint. Watermark + session state must recover so the final
    output (through the exactly-once sink) equals an uninterrupted run
    over the identical file/batch sequence.

    Determinism: the fixture is staged as two half-files plus the two
    far-future flush sentinels (all mtime-ordered), maxFilesPerTrigger
    = 1, so BOTH runs see the same four micro-batches; the interrupted
    run stops after draining phase-1 files (a between-batches stop)
    and resumes with the rest of the files present."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from sqlpp_spark.streaming.events import (
        _normalize_ts,
        _write_flush_files,
        read_exactly_once_output,
        session_windows,
        write_stream_exactly_once,
    )

    src = f"{sf_dir}/events.parquet"
    t = pq.read_table(src)
    half = t.num_rows // 2

    def stage_phase1(d):
        os.makedirs(d, exist_ok=True)
        pq.write_table(t.slice(0, half), os.path.join(d, "part-00000.parquet"))
        now = os.stat(src).st_mtime
        os.utime(os.path.join(d, "part-00000.parquet"), (now, now))

    def stage_phase2(d):
        pq.write_table(t.slice(half), os.path.join(d, "part-00000b.parquet"))
        now = os.stat(src).st_mtime
        os.utime(os.path.join(d, "part-00000b.parquet"), (now + 5, now + 5))
        _write_flush_files(d, src)  # sentinels land at now+10 / now+20

    def stream_of(d):
        schema = spark.read.parquet(d).schema
        raw = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        return session_windows(_normalize_ts(raw))

    def rows_of(out_dir):
        return sorted(
            (r.user_id, r.session_start, r.session_end, r.n_events)
            for r in read_exactly_once_output(spark, out_dir)
            .filter(F.col("user_id") != FLUSH_USER_ID)
            .collect()
        )

    # uninterrupted run: all four files, one query lifetime
    d_a = str(tmp_path / "src_a")
    stage_phase1(d_a)
    stage_phase2(d_a)
    out_a, cp_a = str(tmp_path / "out_a"), str(tmp_path / "cp_a")
    write_stream_exactly_once(stream_of(d_a), out_a, cp_a)

    # interrupted run: drain phase 1, STOP, add files, restart on the
    # SAME checkpoint + sink
    d_b = str(tmp_path / "src_b")
    stage_phase1(d_b)
    out_b, cp_b = str(tmp_path / "out_b"), str(tmp_path / "cp_b")
    write_stream_exactly_once(stream_of(d_b), out_b, cp_b)
    stage_phase2(d_b)
    write_stream_exactly_once(stream_of(d_b), out_b, cp_b)

    got_a, got_b = rows_of(out_a), rows_of(out_b)
    assert len(got_a) > 0
    assert got_a == got_b
    shutil.rmtree(d_a, ignore_errors=True)
    shutil.rmtree(d_b, ignore_errors=True)


def test_stateful_user_counts_evicting_single_batch(spark, sf_dir, batch_events):
    """idle_timeout (EventTimeTimeout eviction, r13): the whole fixture
    arrives in one micro-batch, so no user can time out mid-stream —
    emitted counts must equal the batch counts exactly (eviction only
    changes long-idle behavior, never in-horizon results). The
    multi-batch eviction curve itself is pinned in
    STREAMING_STATE.json "x10_skew" (tools/streaming_state_x10.py)."""
    stream = read_events_stream(spark, sf_dir)
    out = run_stream_to_memory(
        stateful_user_counts(stream, idle_timeout="4 hours"),
        "t_stateful_evict", output_mode="update",
    )
    final = (
        out.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
        .collect()
    )
    got = {r.user_id: r.n_events for r in final}
    want = {
        r.user_id: r.n
        for r in batch_events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
