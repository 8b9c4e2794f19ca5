"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed through Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the actual decoders are
STUBBED (SURVEY-mandated): ``decode_image`` raises NotImplementedError
unless PIL is importable, and ``fake_decode`` provides a deterministic
stand-in that parses our synthetic header. Everything around the stub
is real and tested: the schema contract, binary batch shapes, the
mapInPandas iterator protocol, and partition sizing.

Scale notes:
- binary payloads ride the Arrow stream in record batches; keep
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` low (e.g. 256) when
  payloads are MBs so batches fit executor memory
- metadata-only transforms (filtering by width, sampling frames by
  index) should run BEFORE decode so pruning happens on cheap columns
  — the media frame keeps metadata as top-level columns for exactly
  this reason
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

_MAGIC = b"SYNM"  # synthetic media header: MAGIC | u16 w | u16 h | u8 ch


def synthesize_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a deterministic synthetic media table from the documents
    fixture: payload = SYNM header + utf8 text bytes. Lets every
    pipeline stage run for real against binary columns."""
    w = (F.crc32(F.col(text_col)) % 1920 + 16).cast("int")
    h = (F.crc32(F.reverse(F.col(text_col))) % 1080 + 16).cast("int")
    header = F.concat(
        F.lit(_MAGIC),
        # big-endian u16s via two bytes each
        _u16_bytes(w), _u16_bytes(h), _u8_bytes(F.lit(3)),
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.concat(header, F.encode(F.col(text_col), "UTF-8")).alias("payload"),
        F.lit("image/synthetic").alias("mime"),
        w.alias("width"),
        h.alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def _u16_bytes(c):
    hi = (c / F.lit(256)).cast("int") % 256
    lo = c % 256
    return F.concat(_u8_bytes(hi), _u8_bytes(lo))


def _u8_bytes(c):
    # one byte via unhex of two hex digits
    return F.unhex(F.lpad(F.conv(c.cast("string"), 10, 16), 2, "0"))


try:  # guarded import: pillow is absent from this container
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:  # pragma: no cover - exercised when pillow installed
    _PILImage = None
    HAS_PIL = False


def decode_image(df: DataFrame, fallback: bool = True) -> DataFrame:
    """REAL decoder path: PIL bytes→pixels inside the same Arrow-batched
    mapInPandas shape as ``fake_decode`` — (media_id, payload) in,
    FEATURE_SCHEMA out, one pandas batch per Arrow record batch.

    Payloads carrying the synthetic SYNM header are parsed as synthetic
    (mixed corpora keep working); anything else goes through
    ``PIL.Image.open``. When pillow is not importable the function
    auto-falls back to the deterministic synthetic decoder
    (``fallback=True``, the default) or raises ``NotImplementedError``
    (``fallback=False``) — the clearly-marked stub boundary."""
    if not HAS_PIL:
        if fallback:
            return fake_decode(df)
        raise NotImplementedError(
            "image decoding requires pillow; use fake_decode for the "
            "deterministic synthetic path"
        )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        import numpy as np

        for pdf in batches:
            out = {
                "media_id": [], "width": [], "height": [], "channels": [],
                "payload_bytes": [], "mean_byte": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                if len(b) >= 9 and b[:4] == _MAGIC:
                    w, h = struct.unpack(">HH", b[4:8])
                    ch = b[8]
                    body = np.frombuffer(b, dtype=np.uint8)[9:]
                    mean = float(body.mean()) if body.size else 0.0
                else:
                    try:
                        img = _PILImage.open(io.BytesIO(b))
                        w, h = img.size
                        arr = np.asarray(img)
                        ch = arr.shape[2] if arr.ndim == 3 else 1
                        mean = float(arr.mean()) if arr.size else 0.0
                    except Exception:
                        w = h = ch = 0
                        arr = np.frombuffer(b, dtype=np.uint8)
                        mean = float(arr.mean()) if arr.size else 0.0
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(ch)
                out["payload_bytes"].append(len(b))
                out["mean_byte"].append(mean)
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(decode_batches, FEATURE_SCHEMA)


FEATURE_SCHEMA = (
    "media_id long, width int, height int, channels int, "
    "payload_bytes long, mean_byte double"
)


def fake_decode(df: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Deterministic decode/feature-extract over binary payloads via
    mapInPandas: parses the SYNM header and computes byte statistics —
    the exact batch shape a real (PIL/ffmpeg) decoder would use."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {
                "media_id": [], "width": [], "height": [], "channels": [],
                "payload_bytes": [], "mean_byte": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                if len(b) >= 9 and b[:4] == _MAGIC:
                    w, h = struct.unpack(">HH", b[4:8])
                    ch = b[8]
                    body = np.frombuffer(b, dtype=np.uint8)[9:]
                else:
                    w = h = ch = 0
                    body = np.frombuffer(b, dtype=np.uint8)
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(ch)
                out["payload_bytes"].append(len(b))
                out["mean_byte"].append(float(body.mean()) if body.size else 0.0)
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(decode_batches, FEATURE_SCHEMA)


def resize_stub(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize: metadata transform is real (new dims, scale factors);
    pixel resampling is the stubbed step (payload passes through —
    a real build calls PIL.Image.resize inside the same mapInPandas)."""
    return df.withColumn(
        "resize_scale_x", F.col("width").cast("double") / F.lit(float(target_w))
    ).withColumn(
        "resize_scale_y", F.col("height").cast("double") / F.lit(float(target_h))
    ).withColumn("width", F.lit(target_w).cast("int")).withColumn(
        "height", F.lit(target_h).cast("int")
    )


def frame_sample_indices(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan: explode the frame indices a decoder
    would extract (metadata-only, pre-decode pruning)."""
    n_frames = (F.coalesce(F.col("duration_ms"), F.lit(0)) / F.lit(every_ms)).cast("int")
    return df.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))).alias("frame_idx"),
    ).withColumn("frame_ms", F.col("frame_idx") * F.lit(every_ms))
