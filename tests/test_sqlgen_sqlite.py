"""Second printer dialect: SQLite (round-8 ask #8).

The reference ships one printer per backend (sqlpp_sqlite.ml:204-307,
sqlpp_postgresql.ml, sqlpp_mariadb.ml); sqlgen.py now carries a
dialect table (_DIALECTS) with the divergence points (int division,
try-casts, datetime rendering, substr). This module runs the directed
battery from test_sqlgen.py through the SQLITE rendering against the
stdlib sqlite3 engine and requires row-identical results with the
Spark compiler — a THIRD independent lowering of the same elaborated
AST.

Value normalization (storage-model differences, not semantics):
SQLite has no bool (0/1) and no timestamp (ISO-8601 TEXT with a space
separator); Spark-side booleans/datetimes are normalized to those
representations before comparing. Floats in the battery are
integer-exact by construction (test_sqlgen.py's libm note).
"""

from __future__ import annotations

import sqlite3
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pytest

from sqlpp_spark.compiler.sqlgen import select_sql
from sqlpp_spark.engine import SqlppEngine
from sqlpp_spark.frontend.analyze import analyze

TABLES = ("region", "nation", "supplier", "customer", "orders")


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    eng = SqlppEngine(spark)
    for t in TABLES:
        eng.register_parquet(t, f"{sf_dir}/{t}.parquet")
    return eng


@pytest.fixture(scope="module")
def lite(sf_dir):
    """The parquet fixture loaded into an in-memory SQLite database —
    timestamps as ISO TEXT (space separator), decimals as floats."""
    con = sqlite3.connect(":memory:")
    dcon = duckdb.connect()
    for t in TABLES:
        pdf = dcon.execute(
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        ).fetch_df()
        for c in pdf.columns:
            if str(pdf[c].dtype).startswith("datetime"):
                pdf[c] = pdf[c].dt.strftime("%Y-%m-%d %H:%M:%S")
            elif pdf[c].dtype == object and len(pdf) and isinstance(
                pdf[c].iloc[0], Decimal
            ):
                pdf[c] = pdf[c].astype(float)
        pdf.to_sql(t, con, index=False)
    dcon.close()
    yield con
    con.close()


def _norm(v):
    if isinstance(v, bool):
        return int(v)  # SQLite stores booleans as 0/1
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, date):
        return v.strftime("%Y-%m-%d")
    return v


def differ_lite(engine, lite, src, **params):
    key = lambda row: tuple(repr(v) for v in row)  # noqa: E731
    spark_rows = sorted(
        (tuple(_norm(v) for v in r) for r in engine.fetch_list(src, **params)),
        key=key,
    )
    sql = select_sql(analyze(engine.env, src), params or None, dialect="sqlite")
    lite_rows = sorted(
        (tuple(r) for r in lite.execute(sql).fetchall()), key=key
    )
    assert spark_rows == lite_rows, (
        f"\nsqlpp : {src}\nsqlite: {sql}\n"
        f"spark : {spark_rows[:5]}\nlite  : {lite_rows[:5]}"
    )


import test_sqlgen as TS  # sibling module (pytest sys.path)


@pytest.mark.parametrize("i", range(len(TS.DIRECTED)))
def test_sqlite_directed(engine, lite, i):
    differ_lite(engine, lite, TS.DIRECTED[i])


def test_sqlite_params(engine, lite):
    differ_lite(
        engine, lite,
        "select n_name from nation where n_nationkey < ?k:int not null",
        k=9,
    )


def test_sqlite_int_division_negative_truncation(engine, lite):
    """SQLite's native integer `/` truncates toward zero — the
    dialect table relies on that instead of DuckDB's trunc chain;
    pin the negative-operand case both ways."""
    differ_lite(
        engine, lite,
        "select (0 - n_nationkey) / 3, n_nationkey / (0 - 7) from nation",
    )


def test_sqlite_division_by_zero_yields_null(engine, lite):
    differ_lite(
        engine, lite,
        "select n_nationkey / (n_regionkey - n_regionkey), "
        "mod(n_nationkey, n_regionkey - n_regionkey) from nation",
    )


def test_sqlite_cli_dialect_flag(capsys):
    from sqlpp_spark.__main__ import main

    rc = main([
        "sql",
        "select n_nationkey / 3 from nation where n_nationkey < 3",
        "--sf-dir", "/root/testdata/sf0.001",
        "--dialect", "sqlite",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    # the sqlite rendering uses native integer division, no trunc chain
    assert "trunc" not in out and '/ 3' in out


def test_sqlite_temporal_and_bool_rendering(engine, lite):
    """Round-9 review finding: year()/month()/day() must render as
    strftime (SQLite has no year()), and toString(bool) must yield
    'true'/'false' (CAST AS TEXT gives '1'/'0')."""
    differ_lite(
        engine, lite,
        "select o_orderkey, year(o_orderdate), month(o_orderdate), "
        "day(o_orderdate) from orders where o_orderkey < 30",
    )
    differ_lite(
        engine, lite,
        "select n_nationkey, toString(n_nationkey > 10) from nation",
    )


def test_sqlite_now_renders_native():
    from sqlpp_spark.frontend.analyze import Env, analyze
    from sqlpp_spark.compiler.sqlgen import select_sql

    env = Env()
    env.add("create table t (x int not null);")
    sql = select_sql(
        analyze(env, "select toString(now()) as n from t"), dialect="sqlite"
    )
    assert "datetime('now')" in sql and "now()" not in sql


def test_bare_offset_spelled_limit_minus_one():
    """Late r14: the dialect's independent OFFSET (no LIMIT) is a
    SQLite grammar error when printed bare — the sqlite dialect
    spells it LIMIT -1 OFFSET n."""
    import sqlite3

    from sqlpp_spark.compiler.sqlgen import select_sql
    from sqlpp_spark.frontend.analyze import Env, analyze

    env = Env()
    env.add("create table t (a int not null);")
    info = analyze(env, "select t.a as a from t order by a offset 2")
    sql = select_sql(info, dialect="sqlite")
    assert "LIMIT -1 OFFSET 2" in sql
    con = sqlite3.connect(":memory:")
    con.execute("create table t (a)")
    con.executemany("insert into t values (?)", [(i,) for i in range(5)])
    assert con.execute(sql).fetchall() == [(2,), (3,), (4,)]
    # duckdb/pg keep the bare OFFSET spelling
    assert "LIMIT -1" not in select_sql(info)
    assert "OFFSET 2" in select_sql(info, dialect="postgres")
