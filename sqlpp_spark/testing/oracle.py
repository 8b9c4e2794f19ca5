"""DuckDB oracle comparison harness.

Mirrors the driver's correctness gate: run the Spark query and the
oracle SQL on the same parquet tables, sort columns by name, compare
row count + values order-insensitively. We compare *exactly* (bit-equal
floats) — strictly stronger than the driver's value-hash — so a pass
here predicts a driver pass.
"""

from __future__ import annotations

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
                con.execute(
                    f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
                )
        return con.execute(sql).df()
    finally:
        con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif isinstance(s.dtype, pd.CategoricalDtype):
            df[c] = s.astype(str)
        elif s.dtype == object:
            # bytes / Decimal / lists: map to comparable canonical forms
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
