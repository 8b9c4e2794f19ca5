"""Multi-format file sources beyond the parquet fixtures.

The engine treats the storage format as a property of the SOURCE, not
of the query: any registry query runs unchanged over CSV/JSON/ORC by
reading through ``read_any``. Schema policy mirrors the reference's
declared-schema stance (SURVEY §1.3): pass an explicit schema for
text formats — CSV/JSON inference costs an extra full scan and guesses
types (a disaster at 100 TB); parquet/ORC carry their own schema.

Scale notes per format:
- parquet/ORC: columnar, splittable, predicate/projection pushdown —
  the only formats that belong under a 100 TB query path
- CSV: splittable (newline framing) but row-oriented: no column
  pruning, full-row parse per record; use for ingest, convert to
  parquet immediately (``convert_to_parquet``)
- JSON lines: same, plus per-row JSON parse cost; ``multiLine`` JSON
  is NOT splittable (one file = one task) — never use it at scale
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_READERS = {"parquet", "orc", "csv", "json"}


def read_any(
    spark: SparkSession, path: str, fmt: Optional[str] = None,
    schema: Optional[T.StructType | str] = None, **options
) -> DataFrame:
    """Read ``path`` in ``fmt`` (inferred from the extension when
    omitted). CSV defaults: header=true; pass an explicit ``schema``
    for CSV/JSON in anything but exploratory use."""
    if fmt is None:
        ext = os.path.splitext(path.rstrip("/"))[1].lstrip(".").lower()
        fmt = ext if ext in _READERS else "parquet"
    if fmt not in _READERS:
        raise ValueError(f"unsupported format: {fmt} (one of {sorted(_READERS)})")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        reader = reader.option("inferSchema", "true")
    if fmt == "csv":
        reader = reader.option("header", options.pop("header", "true"))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.format(fmt).load(path)


def convert_to_parquet(
    df: DataFrame, path: str, partition_by: Optional[list[str]] = None,
) -> None:
    """Ingest-side conversion: land row-oriented input as parquet
    (optionally hive-partitioned) so every downstream query gets
    columnar pruning and pushdown."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
