"""Empirical pin for the "watermark bounds state" claim (SCALING.md):
stream the sf0.1 events fixture in time-ordered chunks through the
session-window operator and record, per micro-batch, input rows vs
state-store rows. If state were NOT watermark-bounded it would grow
with cumulative input (~100k rows by the end); bounded state tracks
only the sessions still inside the watermark horizon.

Writes STREAMING_STATE.json and prints a per-batch table.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sqlpp_spark.session import get_spark  # noqa: E402
from sqlpp_spark.streaming.events import _normalize_ts, session_windows  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_CHUNKS = 10


def main() -> None:
    spark = get_spark("streaming_state")
    batch = _normalize_ts(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    total = batch.count()
    # stage the fixture as N_CHUNKS time-ordered files so each
    # micro-batch advances event time (and therefore the watermark)
    d = tempfile.mkdtemp(prefix="events_chunks_")
    ps = ", ".join(str((i + 1) / N_CHUNKS) for i in range(N_CHUNKS - 1))
    bounds = [
        r[0]
        for r in batch.selectExpr(
            f"transform(CAST(percentile(unix_micros(ts), array({ps})) AS ARRAY<BIGINT>), x -> timestamp_micros(x)) as p"
        )
        .selectExpr("explode(p)")
        .collect()
    ]
    lo = None
    for i, hi in enumerate(bounds + [None]):
        part = batch
        if lo is not None:
            part = part.filter(F.col("ts") > F.lit(lo))
        if hi is not None:
            part = part.filter(F.col("ts") <= F.lit(hi))
        part.coalesce(1).write.parquet(os.path.join(d, f"chunk_{i:02d}"))
        # one file per chunk dir; move it up with a sortable name
        sub = os.path.join(d, f"chunk_{i:02d}")
        f = [x for x in os.listdir(sub) if x.endswith(".parquet")][0]
        os.rename(os.path.join(sub, f), os.path.join(d, f"{i:02d}.parquet"))
        lo = hi
    schema = spark.read.parquet(os.path.join(d, "00.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = session_windows(stream, gap="30 minutes", watermark="2 hours")
    q = (
        out.writeStream.format("noop")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ck_"))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    rows = []
    for p in q.recentProgress:
        so = (p.get("stateOperators") or [{}])[0]
        rows.append({
            "batch": p.get("batchId"),
            "input_rows": p.get("numInputRows"),
            "state_rows": so.get("numRowsTotal"),
            "removed": so.get("numRowsRemoved"),
            "watermark": (p.get("eventTime") or {}).get("watermark"),
        })
    q.stop()
    spark.stop()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    doc = {"total_input": total, "chunks": N_CHUNKS, "batches": rows}
    with open(os.path.join(here, "STREAMING_STATE.json"), "w") as f:
        json.dump(doc, f, indent=1)
    print("| batch | input rows | state rows | removed | watermark |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['batch']} | {r['input_rows']} | {r['state_rows']} | "
            f"{r['removed']} | {r['watermark']} |"
        )
    print(f"total input: {total}")


if __name__ == "__main__":
    main()
