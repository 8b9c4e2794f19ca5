"""Structured Streaming operators over the events stream.

The reference has no streaming surface (SURVEY.md §2.8) — this is the
net-new scale path: watermarked tumbling/sliding windows, session
windows, and an ``applyInPandasWithState`` custom stateful operator.

Design for scale:
- event-time watermarks bound state: late rows beyond the watermark
  are dropped, so state size is O(active windows × keys), independent
  of stream length
- aggregations are keyed by (window, event_type) / (user, session) —
  Spark shuffles once per micro-batch with partial aggregation
- the same transformations run in batch mode (tests assert streaming
  output == batch groupBy on a static frame), which is how the logic
  is validated without a long-running cluster

File-source note: each ``events.parquet`` fixture is a single file;
``readStream`` takes the file path with the batch-read schema. For a
production deployment the source is Kafka/object-store directories —
only the ``load`` call changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),  # nanos-as-long (see sources/tables.py)
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def _normalize_ts(raw: DataFrame) -> DataFrame:
    """Normalize the fixture's ``ts`` encoding to TimestampType.

    Fixtures have shipped as TIMESTAMP(NANOS) (arrives as nanosecond
    LongType under ``nanosAsLong``) and as TIMESTAMP_NTZ micros —
    branch on the type actually read rather than assuming one."""
    ts_type = raw.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, T.TimestampNTZType):
        # session TZ is pinned to UTC, so the cast is wall-clock exact
        return raw.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return raw


_STAGED: dict = {}

FLUSH_USER_ID = -1  # sentinel rows carry this user_id; filter them out


def _sentinel_value(field):
    """A schema-generic sentinel cell for a flush row."""
    import pyarrow as pa

    if pa.types.is_timestamp(field.type):
        return None  # filled by caller
    if pa.types.is_integer(field.type):
        return FLUSH_USER_ID
    if pa.types.is_floating(field.type):
        return 0.0
    return "__flush__"


def _write_flush_files(d: str, src: str) -> None:
    """Append two far-future sentinel rows (as two extra files = two
    extra micro-batches) after the real fixture. Batch N's watermark is
    applied during batch N+1, so sentinel #1 advances the watermark
    past every real session and sentinel #2 triggers the batch in which
    those now-closed sessions are EMITTED — append-mode output then
    contains every real session deterministically. Sentinel rows use
    user_id = FLUSH_USER_ID for filtering."""
    import os
    import time
    from datetime import timedelta

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    schema = pq.read_schema(src)
    mx = pc.max(pq.read_table(src, columns=["ts"])["ts"]).as_py()
    now = max(time.time(), os.stat(src).st_mtime)
    for i, days in enumerate((365, 366)):
        cells = {}
        for f in schema:
            if f.name == "ts":
                # ts must be FAR-FUTURE regardless of its physical
                # encoding — as int64 nanos (the nanosAsLong fixture
                # shape) a generic integer sentinel would set ts=-1 and
                # the watermark flush would silently never fire.
                if pa.types.is_integer(f.type):
                    v = int(mx) + days * 86_400 * 1_000_000_000
                else:
                    v = mx + timedelta(days=days)
            else:
                v = _sentinel_value(f)
            cells[f.name] = [v]
        path = os.path.join(d, f"part-0000{i + 1}-flush.parquet")
        pq.write_table(pa.table(cells, schema=schema), path)
        # file source processes oldest-mtime first: keep sentinels
        # strictly after the fixture and in order
        os.utime(path, (now + 10 * (i + 1), now + 10 * (i + 1)))


def _stage_dir(sf_dir: str, flush: bool = False) -> str:
    """Spark's file stream source wants a DIRECTORY; the fixture is a
    single file. Stage it into a temp dir via hard link (no copy cost),
    once per fixture. ``flush=True`` stages a separate dir that also
    carries two far-future sentinel files (see _write_flush_files)."""
    import os
    import shutil
    import tempfile

    key = (sf_dir, flush)
    d = _STAGED.get(key)
    if d is None or not os.path.isdir(d):
        d = tempfile.mkdtemp(prefix="sqlpp_events_")
        src = os.path.join(sf_dir, "events.parquet")
        dst = os.path.join(d, "part-00000.parquet")
        try:
            os.link(src, dst)
        except OSError:
            shutil.copy(src, dst)
        if flush:
            _write_flush_files(d, src)
        _STAGED[key] = d
    return d


def read_events_stream(
    spark: SparkSession, sf_dir: str, flush: bool = False
) -> DataFrame:
    """Streaming read of the events fixture with ts normalized to a
    proper timestamp (micros). ``flush=True`` appends two far-future
    sentinel micro-batches so watermark-gated append-mode operators
    (session windows) emit every real window before the stream drains —
    callers filter ``user_id = FLUSH_USER_ID`` rows out."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    staged = _stage_dir(sf_dir, flush)
    # file streams need an explicit schema; take it from a batch read so
    # the ts encoding (nanos-long vs TIMESTAMP_NTZ) matches the fixture
    schema = spark.read.parquet(staged).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    return _normalize_ts(raw)


def tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts per event type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n", "total_value",
        )
    )


def sliding_counts(
    events: DataFrame, window: str = "1 hour", slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window counts: each event lands in window/slide
    overlapping windows (2 for 1h/30m). State stays bounded by the
    watermark exactly as for tumbling windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n",
        )
    )


def session_windows(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Session-window aggregation per user (native session_window —
    state closes once the watermark passes a session's gap)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id", "n_events",
        )
    )


_UNITS_MS = {"second": 1000, "minute": 60_000, "hour": 3_600_000,
             "day": 86_400_000}


def _interval_ms(s: str) -> int:
    """'4 hours' / '30 minutes' → milliseconds (the subset of interval
    syntax the streaming params use)."""
    n, unit = s.split()
    return int(n) * _UNITS_MS[unit.rstrip("s")]


def stateful_user_counts(
    events: DataFrame, watermark: str = "2 hours",
    idle_timeout: str | None = None,
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: running
    per-user event count + max value, emitted per micro-batch.

    State is one row per user — the pattern for arbitrary stateful
    logic (fraud counters, CDC reconciliation) the built-in aggs can't
    express.

    State bound: with ``idle_timeout=None`` state is O(distinct keys
    ever seen) — acceptable when the key space is bounded (users), a
    leak when it is not (session ids, URLs). Passing an idle horizon
    (e.g. "4 hours") switches to EventTimeTimeout eviction: a user's
    row is dropped once the watermark passes their last event +
    horizon, making state O(keys active within the horizon) regardless
    of stream length — MEASURED at 1M skewed events in
    STREAMING_STATE.json "x10_skew" (tools/streaming_state_x10.py):
    NoTimeout state grows ~linearly with cumulative distinct users
    while the evicting form stays flat at the active-horizon size.
    A re-appearing user restarts from zero under eviction — running
    totals over unbounded horizons belong to the batch path."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    output_schema = "user_id long, n_events long, max_value double"
    state_schema = "n long, mx double"
    idle_ms = _interval_ms(idle_timeout) if idle_timeout else None

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        n, mx = (state.get if state.exists else (0, float("-inf")))
        last_ms = 0
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
                last_ms = max(
                    last_ms, int(pdf["ts"].max().value // 1_000_000)
                )
        state.update((n, mx))
        if idle_ms is not None:
            # timeout must sit strictly past the current watermark
            state.setTimeoutTimestamp(
                max(last_ms + idle_ms, state.getCurrentWatermarkMs() + 1)
            )
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "max_value": [mx]}
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update, output_schema, state_schema, "update",
            GroupStateTimeout.EventTimeTimeout
            if idle_ms is not None
            else GroupStateTimeout.NoTimeout,
        )
    )


def purchase_click_join(
    events: DataFrame, window_seconds: int = 3600, watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner self-join: each purchase pairs with the
    same user's clicks from the preceding ``window_seconds``.

    The event-time range condition plus the per-side watermarks give
    Spark a state eviction bound: a buffered click can be dropped once
    the purchase-side watermark passes click_ts + window, so state is
    O(events inside the window horizon), independent of stream length.
    Inner-join matches emit as soon as both sides arrive (no
    watermark-closure wait).

    MEASURED (r13, tools/streaming_state_x10.py, 1M skewed events /
    20 micro-batches, STREAMING_STATE.json "x10_skew"): join buffer
    state holds flat at ~54k rows with ~50k evicted per batch across
    the whole stream — state tracks the 2 h watermark horizon, never
    cumulative input — and batch durations stay flat (no
    state-scan degradation), with the hottest user at ~12% of events."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("value").alias("click_value"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (F.col("c_user") == F.col("user_id"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {window_seconds} SECOND"))
        & (F.col("click_ts") < F.col("purchase_ts"))
    )
    return purchases.join(clicks, on=cond, how="inner").select(
        "purchase_id", "user_id", "purchase_ts", "click_ts", "click_value"
    )


def dedup_events_stream(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "2 hours",
) -> DataFrame:
    """Streaming deduplication: keep the first-seen row per key within
    the watermark horizon (dropDuplicatesWithinWatermark bounds state
    by event time — a key's dedup state is dropped once the watermark
    passes it, so reappearing keys far apart both survive, which is
    the semantics a 100 TB dedup-at-ingest actually wants)."""
    keys = keys or ["user_id", "event_type"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def run_stream_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "append"
) -> DataFrame:
    """Drive a streaming frame to completion against the memory sink
    (synchronous — for tests and smoke checks)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")


# ---------------------------------------------------------------------------
# Exactly-once file sink (foreachBatch + idempotent batch ledger)
# ---------------------------------------------------------------------------


def write_stream_exactly_once(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str,
) -> None:
    """Drive a stream into a parquet directory with END-TO-END
    exactly-once semantics. Structured Streaming's checkpoint gives
    at-least-once delivery to ``foreachBatch`` (a crash after the sink
    write but before the checkpoint commit re-delivers the batch); the
    sink makes redelivery idempotent:

    - each micro-batch overwrites its own ``batch_id=N`` subdirectory
      (redelivered data lands in the same place, no duplication)
    - a ``_BATCHES`` ledger, replaced atomically AFTER the data write,
      names the committed batch ids; readers go through
      ``read_exactly_once_output`` which trusts ONLY ledger-listed
      dirs — a torn write of an uncommitted batch is invisible

    This is the same stage-then-flip protocol as the engine's managed
    tables (engine.commit_version), applied per micro-batch. At scale
    the ledger write is O(#batches) metadata; data volume is untouched.

    Identity guard: the ledger is keyed by micro-batch id, and batch
    ids RESTART at 0 under a fresh checkpoint — reusing an out_dir with
    a different checkpoint would silently treat new batches as
    redeliveries and drop them. A ``_STREAM_ID`` marker records the
    owning streaming query id (stable across restarts from the same
    checkpoint); a mismatch fails fast instead.
    """
    import json
    import os

    def _checkpoint_query_id() -> str | None:
        meta = os.path.join(checkpoint_dir, "metadata")
        if os.path.isfile(meta):
            with open(meta) as fh:
                return json.load(fh).get("id")
        return None

    marker = os.path.join(out_dir, "_STREAM_ID")
    owner = None
    if os.path.isfile(marker):
        with open(marker) as fh:
            owner = fh.read().strip()
    qid = _checkpoint_query_id()
    if owner is not None and qid != owner:
        raise ValueError(
            f"out_dir {out_dir} is owned by streaming query {owner}, but "
            f"checkpoint {checkpoint_dir} "
            f"{'is fresh (batch ids would restart at 0 and collide with the ledger)' if qid is None else f'belongs to query {qid}'}. "
            f"Reuse the original checkpoint, or write to a new out_dir."
        )

    def write_batch(df: DataFrame, batch_id: int) -> None:
        ledger = os.path.join(out_dir, "_BATCHES")
        done: set[str] = set()
        if os.path.isfile(ledger):
            with open(ledger) as fh:
                done = {ln.strip() for ln in fh if ln.strip()}
        if str(batch_id) in done:
            return  # redelivered after a committed write: no-op
        df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )
        tmp = ledger + ".tmp"
        with open(tmp, "w") as fh:
            fh.write("\n".join(sorted(done | {str(batch_id)})) + "\n")
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, ledger)  # commit point for this batch

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
    try:
        if owner is None:
            os.makedirs(out_dir, exist_ok=True)
            with open(marker, "w") as fh:
                fh.write(str(q.id))
        q.processAllAvailable()
    finally:
        q.stop()


def read_exactly_once_output(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read back ONLY the committed batches of an exactly-once sink."""
    import os

    ledger = os.path.join(out_dir, "_BATCHES")
    if not os.path.isfile(ledger):
        raise FileNotFoundError(f"no committed batches under {out_dir}")
    with open(ledger) as fh:
        ids = [ln.strip() for ln in fh if ln.strip()]
    paths = [os.path.join(out_dir, f"batch_id={i}") for i in sorted(ids, key=int)]
    return spark.read.parquet(*paths)
