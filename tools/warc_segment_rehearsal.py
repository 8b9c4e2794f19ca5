"""Rehearsal for the segmented WARC reader (round-9 verdict ask #5).

Builds ONE oversized synthetic archive (default ~64 MB — far past any
sane Arrow batch), then measures the direct single-row parse vs the
segmented parse (record-boundary chunks + repartition): wall seconds,
record parity, number of chunks, max chunk bytes, and the number of
tasks that actually did parse work. Records WARC_SEGMENT_REHEARSAL.json.

The claim under test: one giant archive row no longer defeats the
rows-not-bytes maxRecordsPerBatch guard — per-batch parse bytes are
bounded by the chunk cap and the work spreads across tasks instead of
serializing onto one.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_rehearsal import get_spark_with_ui  # noqa: E402

from sqlpp_spark.ops.warc import (  # noqa: E402
    http_response_block,
    segment_warc_archives,
    warc_records,
    warc_records_segmented,
    write_warc,
    write_warc_gz,
)

ARCHIVE_MB = int(os.environ.get("WARC_REHEARSAL_MB", "64"))
CHUNK_BYTES = int(os.environ.get("WARC_REHEARSAL_CHUNK", str(4 << 20)))


def build_records():
    recs = []
    i = 0
    total = 0
    target = ARCHIVE_MB << 20
    while total < target:
        body = (f"<html><body><p>doc {i} " + "lorem ipsum " * 1500
                + "</p></body></html>").encode()
        blk = http_response_block(200, "text/html", body)
        recs.append((
            {"WARC-Type": "response",
             "WARC-Target-URI": f"http://rehearsal.example/{i}"},
            blk,
        ))
        total += len(blk) + 120
        i += 1
    return recs


def main() -> None:
    spark = get_spark_with_ui()
    recs = build_records()
    data = write_warc(recs)
    # r11: the .warc.gz path — member-per-record (Common Crawl layout)
    data_gz = write_warc_gz(recs)
    df = spark.createDataFrame(
        [(1, bytearray(data))], "archive_id long, payload binary"
    ).persist()
    df.count()

    t0 = time.time()
    direct_rows = warc_records(df).count()
    t_direct = time.time() - t0

    segs = segment_warc_archives(df, CHUNK_BYTES).persist()
    seg_stats = segs.selectExpr(
        "count(*) AS n", "max(length(payload)) AS max_chunk",
        "sum(length(payload)) AS total",
    ).collect()[0]

    t0 = time.time()
    seg_rows = warc_records_segmented(df, CHUNK_BYTES).count()
    t_seg = time.time() - t0

    df_gz = spark.createDataFrame(
        [(1, bytearray(data_gz))], "archive_id long, payload binary"
    ).persist()
    df_gz.count()
    segs_gz = segment_warc_archives(df_gz, CHUNK_BYTES).persist()
    gz_stats = segs_gz.selectExpr(
        "count(*) AS n", "max(length(payload)) AS max_chunk",
    ).collect()[0]
    t0 = time.time()
    gz_rows = warc_records_segmented(df_gz, CHUNK_BYTES).count()
    t_gz = time.time() - t0

    out = {
        "archive_bytes": len(data),
        "chunk_cap_bytes": CHUNK_BYTES,
        "n_chunks": seg_stats["n"],
        "max_chunk_bytes": seg_stats["max_chunk"],
        "chunk_bytes_total": seg_stats["total"],
        "bytes_preserved": seg_stats["total"] == len(data),
        "records_direct": direct_rows,
        "records_segmented": seg_rows,
        "records_match": direct_rows == seg_rows,
        "sec_direct_single_row": round(t_direct, 3),
        "sec_segmented": round(t_seg, 3),
        "gz_archive_bytes": len(data_gz),
        "gz_n_chunks": gz_stats["n"],
        "gz_max_chunk_comp_bytes": gz_stats["max_chunk"],
        "gz_records_segmented": gz_rows,
        "gz_records_match": gz_rows == direct_rows,
        "sec_segmented_gz": round(t_gz, 3),
        "loadavg": os.getloadavg()[0],
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "WARC_SEGMENT_REHEARSAL.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
