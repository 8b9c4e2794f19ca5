"""Streaming-state rehearsal one decade up (round-12 verdict ask #6).

STREAMING_STATE.json proved watermark-bounded session state at 100k
events / 10 batches. This tool synthesizes a 1M-event stream with a
SKEWED key distribution — 25% of events land on ~50 hub users (Zipf,
the hottest user takes ~12% of the whole stream) and the rest spread
over a 200k-user long tail whose members mostly appear once and go
idle — and records per micro-batch state rows / evictions / batch
duration for the operators whose state actually kills clusters:

- ``stateful_user_counts`` with NoTimeout: state must grow with
  cumulative distinct keys (the documented leak when the key space
  is unbounded);
- ``stateful_user_counts(idle_timeout="4 hours")``: EventTimeTimeout
  eviction must hold state flat at the active-horizon size;
- ``purchase_click_join``: join buffer state must track the watermark
  horizon, not stream length;
- ``session_windows``: continuity with the 100k tier.

Events are deterministic (hash of the row index — no RNG), strictly
time-ordered over 30 simulated days, staged as 20 parquet chunks so
each micro-batch advances the watermark ~36 simulated hours.

Output: merges an "x10_skew" section into STREAMING_STATE.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sqlpp_spark.ops.hashing import HASH_MOD, hash64  # noqa: E402
from sqlpp_spark.session import get_spark  # noqa: E402
from sqlpp_spark.streaming.events import (  # noqa: E402
    purchase_click_join,
    session_windows,
    stateful_user_counts,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_EVENTS = 1_000_000
N_CHUNKS = 20
FIX = "/tmp/events1m"


def build_fixture(spark) -> None:
    if os.path.isdir(FIX):
        return
    per = N_EVENTS // N_CHUNKS

    def h(salt):
        return hash64(F.concat(F.lit(salt), F.col("id").cast("string")))

    u = (h("u|") + 1).cast("double") / float(HASH_MOD)
    pick = h("p|").cast("double") / float(HASH_MOD)
    hub = F.least(F.floor(1.0 / u), F.lit(50))
    tail = (F.lit(50) + F.floor(u * 200_000)).cast("bigint")
    df = spark.range(N_EVENTS).select(
        F.col("id").alias("event_id"),
        # 30 simulated days, strictly increasing: 2.592s per event
        F.timestamp_millis(
            F.lit(1704067200000) + F.col("id") * F.lit(2592)
        ).alias("ts"),
        F.when(pick < 0.25, hub).otherwise(tail).cast("bigint")
        .alias("user_id"),
        F.when(h("t|") % 10 == 0, F.lit("purchase"))
        .otherwise(F.lit("click")).alias("event_type"),
        ((h("v|") % 10000).cast("double") / 100.0).alias("value"),
        F.lit("").alias("props"),
        (F.col("id") / per).cast("int").alias("chunk"),
    )
    tmp = tempfile.mkdtemp(prefix="ev1m_")
    df.repartition(1).write.mode("overwrite").partitionBy("chunk").parquet(tmp)
    os.makedirs(FIX)
    for i in range(N_CHUNKS):
        sub = os.path.join(tmp, f"chunk={i}")
        f = [x for x in os.listdir(sub) if x.endswith(".parquet")][0]
        shutil.move(os.path.join(sub, f), os.path.join(FIX, f"{i:02d}.parquet"))
    shutil.rmtree(tmp)


def measure(spark, make_query, name: str) -> list[dict]:
    schema = spark.read.parquet(os.path.join(FIX, "00.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(FIX)
    )
    out = make_query(stream)
    q = (
        out.writeStream.format("noop")
        .option("checkpointLocation", tempfile.mkdtemp(prefix=f"ck_{name}_"))
        .outputMode("append" if name != "user_counts" else "update")
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
            "batch_ms": p.get("batchDuration"),
            "watermark": (p.get("eventTime") or {}).get("watermark"),
        })
    q.stop()
    print(f"-- {name}")
    for r in rows:
        print(f"  batch {r['batch']}: in={r['input_rows']} "
              f"state={r['state_rows']} removed={r['removed']} "
              f"{r['batch_ms']}ms wm={r['watermark']}", flush=True)
    return rows


def main() -> None:
    spark = get_spark("streaming_state_x10")
    build_fixture(spark)
    tiers = {
        "user_counts_no_timeout": lambda s: stateful_user_counts(s),
        "user_counts_evicting_4h": lambda s: stateful_user_counts(
            s, idle_timeout="4 hours"
        ),
        "purchase_click_join": lambda s: purchase_click_join(s),
        "session_windows": lambda s: session_windows(s),
    }
    out = {"total_input": N_EVENTS, "chunks": N_CHUNKS, "ops": {}}
    for name, mk in tiers.items():
        mode = "user_counts" if name.startswith("user_counts") else name
        out["ops"][name] = measure(spark, mk, mode)
    path = os.path.join(REPO, "STREAMING_STATE.json")
    doc = json.load(open(path)) if os.path.exists(path) else {}
    doc["x10_skew"] = out
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print("merged x10_skew into STREAMING_STATE.json")
    spark.stop()


if __name__ == "__main__":
    main()
