"""Table readers for the driver's parquet fixtures.

One normalization: the ``events`` table stores ``ts`` as parquet
TIMESTAMP(NANOS), which Spark's vectorized reader refuses. With
``spark.sql.legacy.parquet.nanosAsLong=true`` (set in session.py) the
column arrives as nanosecond LongType; we convert to TimestampType
(microsecond) here. The driver's data is microsecond-aligned, so the
conversion is lossless.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # runtime-settable SQL conf; needed when the caller's session
        # (e.g. the driver's) didn't set it at build time
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _normalize_nanos(df)
    return df


def _normalize_nanos(df: DataFrame) -> DataFrame:
    cols = []
    for f in df.schema.fields:
        if f.name == "ts" and isinstance(f.dataType, T.LongType):
            # integer div: ns epochs exceed double's 2^53 exact range,
            # so float division here would be off by ±1 microsecond
            cols.append(F.timestamp_micros(F.expr("ts div 1000")).alias("ts"))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)
