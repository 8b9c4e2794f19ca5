"""DuckDB oracle comparison harness.

Mirrors the driver's correctness gate: run the Spark query and the
oracle SQL on the same parquet tables, sort columns by name, compare
row count + values order-insensitively. We compare *exactly* (bit-equal
floats) AND enforce engine-level type-class agreement (Spark schema vs
DuckDB relation types) — the r15 driver gate failed two entries whose
oracles produced HUGEINT sums while pandas silently coerced the dtype
away, so value equality alone is NOT sufficient to predict a driver
pass; the driver's value-hash is type-sensitive.
"""

from __future__ import annotations

import datetime as _dt
import os

import duckdb
import numpy as np
import pandas as pd

from sqlpp_spark.session import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(path):
                # Spark-written tables are DIRECTORIES of part files
                # (the rehearsal fixtures); driver testdata is a
                # single file — glob the directory case for DuckDB
                if os.path.isdir(path):
                    path = os.path.join(path, "*.parquet")
                con.execute(
                    f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
                )
        rel = con.sql(sql)
        cols, types = list(rel.columns), [str(t) for t in rel.types]
        pdf = rel.df()
        # stash engine-level types for compare()'s type-class check;
        # pandas dtypes can't carry this (HUGEINT→float64 is silent)
        pdf.attrs["duckdb_types"] = dict(zip(cols, types))
        return pdf
    finally:
        con.close()


# Engine type → comparison class. The driver's value-hash is
# type-sensitive, so classes that differ between the Spark result and
# the DuckDB oracle mean a driver hash fail even when values agree.
# DuckDB HUGEINT/UHUGEINT map to their own class (unreachable from
# Spark) so an uncast SUM() oracle fails loudly here.
def _duckdb_type_class(t: str) -> str:
    t = t.upper()
    if "HUGEINT" in t:
        return "hugeint"
    if t in (
        "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
        "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
    ):
        return "int"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if t == "BOOLEAN":
        return "bool"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP") or t == "DATETIME":
        return "datetime"
    if t in ("VARCHAR", "TEXT", "STRING"):
        return "string"
    if t == "BLOB":
        return "bytes"
    if t.endswith("[]") or t.startswith("LIST") or t.startswith("ARRAY"):
        return "list"
    return "other"


def _spark_type_class(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "datetime"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BinaryType):
        return "bytes"
    if isinstance(dt, T.ArrayType):
        return "list"
    return "other"


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif isinstance(s.dtype, pd.CategoricalDtype):
            df[c] = s.astype(str)
        elif s.dtype == object:
            vals = s.dropna()
            if len(vals) and all(
                isinstance(v, _dt.date) and not isinstance(v, _dt.datetime)
                for v in vals
            ):
                # pandas representation artifact: a nullable DATE
                # column materializes as datetime64 on the DuckDB side
                # but as Python date objects on the Spark side — safe
                # to unify since compare()'s engine-level type-class
                # gate has already rejected real date-vs-timestamp
                # mismatches
                df[c] = pd.to_datetime(s).astype("datetime64[us]")
            else:
                # bytes / Decimal / lists: comparable canonical forms
                df[c] = s.map(_canon_obj)
        elif pd.api.types.is_integer_dtype(s) and not s.isna().any():
            df[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
    # order-insensitive: sort rows by stringified tuple (stable + total)
    key = df.apply(lambda r: tuple(repr(v) for v in r), axis=1) if len(df) else None
    if key is not None:
        df = df.iloc[np.argsort(key, kind="stable")].reset_index(drop=True)
    return df


def _canon_obj(v):
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_canon_obj(x) for x in v)
    if isinstance(v, float):
        return v
    return v


def compare(spark_df, oracle_pdf: pd.DataFrame) -> dict:
    """Return a comparison report dict; report['match'] is the verdict."""
    spk = _normalize(spark_df.toPandas())
    ora = _normalize(oracle_pdf)
    report = {
        "rows_spark": len(spk),
        "rows_oracle": len(ora),
        "cols_spark": list(spk.columns),
        "cols_oracle": list(ora.columns),
        "match": False,
        "detail": "",
    }
    if list(spk.columns) != list(ora.columns):
        report["detail"] = "column names differ"
        return report
    if len(spk) != len(ora):
        report["detail"] = "row counts differ"
        return report
    # Engine-level type-class gate (r15 lesson: pandas dtype coercion
    # masks HUGEINT/int mismatches that the driver's hash rejects).
    duck_types = oracle_pdf.attrs.get("duckdb_types")
    if duck_types is not None:
        spark_classes = {
            f.name: _spark_type_class(f.dataType) for f in spark_df.schema.fields
        }
        for c in spk.columns:
            sc = spark_classes.get(c)
            oc = _duckdb_type_class(duck_types[c]) if c in duck_types else None
            if sc is None or oc is None:
                continue
            if sc != oc:
                report["detail"] = (
                    f"type-class mismatch for col {c!r}: "
                    f"spark={sc} vs oracle={oc} ({duck_types[c]}) — "
                    "driver hash is type-sensitive; CAST the oracle"
                )
                return report
    for c in spk.columns:
        a, b = spk[c], ora[c]
        if pd.api.types.is_float_dtype(a) and pd.api.types.is_float_dtype(b):
            ok = ((a.isna() & b.isna()) | (a.values == b.values)).all()
            if not ok:
                # report max divergence for diagnosis
                diff = np.nanmax(np.abs(a.values - b.values)) if len(a) else 0
                report["detail"] = f"float col {c!r} differs (max abs diff {diff:g})"
                return report
        else:
            an, bn = a.isna(), b.isna()
            if not (an == bn).all() or not (a[~an].values == b[~bn].values).all():
                bad = (a.fillna("<NA>").astype(str) != b.fillna("<NA>").astype(str))
                idx = int(bad.idxmax()) if bad.any() else -1
                report["detail"] = (
                    f"col {c!r} differs at row {idx}: "
                    f"spark={a.iloc[idx]!r} oracle={b.iloc[idx]!r}"
                )
                return report
    report["match"] = True
    return report
