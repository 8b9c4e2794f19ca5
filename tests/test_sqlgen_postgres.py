"""Third printer dialect: PostgreSQL (round-9 verdict ask #8 —
symmetry with the reference's three backends, sqlpp_postgresql.ml).

This container ships a full PostgreSQL 15 server (initdb/pg_ctl/psql),
so unlike most environments the battery EXECUTES: a scratch
unix-socket-only cluster in tmp, the parquet fixture loaded through
duckdb-CSV COPY, and every directed query from test_sqlgen.py run
through the POSTGRES rendering with row-identical results required
against the Spark compiler — a FOURTH independent lowering of the
same elaborated AST. Where the server binaries are absent the
execution battery skips (render-only assertions still run).

Dialect divergences under test (sqlgen._DIALECTS['postgres']):
- integer `/` and mod() wrap in CASE: PG errors on ÷0 where the
  engine/DuckDB yield NULL;
- no try_cast: datetime()/date() guard with a format regex;
- year()/month()/day() render extract(...) (PG has no year());
- two-arg round() routes through NUMERIC (PG has no
  round(double, int) and `DOUBLE` is not a PG type name).
"""

from __future__ import annotations

import os
import shutil
import subprocess
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pytest

from sqlpp_spark.compiler.sqlgen import select_sql
from sqlpp_spark.engine import SqlppEngine
from sqlpp_spark.frontend.analyze import analyze

TABLES = ("region", "nation", "supplier", "customer", "orders")

HAS_PG = all(shutil.which(x) for x in ("initdb", "pg_ctl", "psql"))

_NULL = "<<NULL>>"
_SEP = "\x1f"

_PG_TYPES = {
    "BIGINT": "BIGINT", "INTEGER": "BIGINT", "VARCHAR": "TEXT",
    "DOUBLE": "DOUBLE PRECISION", "TIMESTAMP": "TIMESTAMP",
    "TIMESTAMP_NS": "TIMESTAMP", "DATE": "DATE", "BOOLEAN": "BOOLEAN",
}


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    eng = SqlppEngine(spark)
    for t in TABLES:
        eng.register_parquet(t, f"{sf_dir}/{t}.parquet")
    return eng


@pytest.fixture(scope="module")
def pg(sf_dir):
    """A scratch PostgreSQL cluster (unix socket only) loaded with the
    parquet fixture; yields run_sql(sql) -> list of string tuples
    (NULL as the sentinel)."""
    if not HAS_PG:
        pytest.skip("postgresql server binaries not installed")
    # NOT tmp_path_factory: pytest's tmp chain is 0700 and the server
    # must run as an unprivileged user when pytest runs as root — use
    # a world-traversable scratch dir directly under /tmp instead
    import pathlib
    import tempfile

    base = pathlib.Path(tempfile.mkdtemp(prefix="sqlpp_pgbattery_"))
    os.chmod(base, 0o777)
    data = base / "data"
    sock = base / "sock"
    sock.mkdir()
    # the server refuses to run as root; drop to nobody (the client
    # side — psql — stays whoever runs pytest, trust auth over the
    # unix socket)
    server_prefix = []
    if os.geteuid() == 0:
        if not shutil.which("runuser"):
            pytest.skip("root without runuser: cannot start postgres")
        server_prefix = ["runuser", "-u", "nobody", "--"]
        shutil.chown(sock, "nobody")

    def server(cmd):
        return subprocess.run(
            server_prefix + cmd, check=True, capture_output=True,
            cwd=str(base),
        )

    server(["initdb", "-D", str(data), "-U", "postgres", "-A", "trust",
            "--no-sync"])
    server(["pg_ctl", "-D", str(data), "-w",
            "-l", str(base / "pg.log"), "-o",
            f"-c listen_addresses='' -k {sock} -c fsync=off", "start"])

    def run_sql(sql: str):
        p = subprocess.run(
            ["psql", "-h", str(sock), "-U", "postgres", "-d", "postgres",
             "-X", "-A", "-t", "-F", _SEP, "-P", f"null={_NULL}",
             "-v", "ON_ERROR_STOP=1", "-c", sql],
            capture_output=True, text=True,
        )
        if p.returncode != 0:
            raise RuntimeError(f"psql failed on:\n{sql}\n{p.stderr}")
        return [
            tuple(line.split(_SEP))
            for line in p.stdout.splitlines() if line
        ]

    dcon = duckdb.connect()
    for t in TABLES:
        rel = dcon.sql(f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        cols = []
        for name, dtype in zip(rel.columns, rel.types):
            ds = str(dtype)
            if ds.startswith("DECIMAL"):
                pgty = "NUMERIC" + ds[len("DECIMAL"):]
            else:
                pgty = _PG_TYPES.get(ds, "TEXT")
            cols.append(f'"{name}" {pgty}')
        run_sql(f'CREATE TABLE "{t}" ({", ".join(cols)})')
        csv = base / f"{t}.csv"
        dcon.execute(
            f"COPY (SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')) "
            f"TO '{csv}' (HEADER, DELIMITER ',')"
        )
        subprocess.run(
            ["psql", "-h", str(sock), "-U", "postgres", "-d", "postgres",
             "-X", "-v", "ON_ERROR_STOP=1",
             "-c", f"\\copy \"{t}\" FROM '{csv}' WITH (FORMAT csv, "
                   f"HEADER true)"],
            check=True, capture_output=True,
        )
    dcon.close()
    yield run_sql
    subprocess.run(
        server_prefix + ["pg_ctl", "-D", str(data), "-m", "immediate",
                         "stop"],
        capture_output=True, cwd=str(base),
    )
    shutil.rmtree(base, ignore_errors=True)


def _parse_like(spark_val, pg_str: str):
    """Parse a psql unaligned cell into the Spark value's type."""
    if pg_str == _NULL:
        return None
    if spark_val is None:
        # types must still agree textually when spark saw NULL and pg
        # did not — surface the raw string so the assert fails loudly
        return pg_str
    if isinstance(spark_val, bool):
        return pg_str == "t"
    if isinstance(spark_val, Decimal):
        return Decimal(pg_str)
    if isinstance(spark_val, int):
        return int(pg_str)
    if isinstance(spark_val, float):
        return float(pg_str)
    if isinstance(spark_val, datetime):
        return datetime.fromisoformat(pg_str)
    if isinstance(spark_val, date):
        return date.fromisoformat(pg_str)
    return pg_str


def differ_pg(engine, pg, src, **params):
    key = lambda row: tuple(repr(v) for v in row)  # noqa: E731
    spark_rows = sorted(
        (tuple(r) for r in engine.fetch_list(src, **params)), key=key
    )
    sql = select_sql(
        analyze(engine.env, src), params or None, dialect="postgres"
    )
    raw = pg(sql)
    assert len(raw) == len(spark_rows), (
        f"\nsqlpp: {src}\npg sql: {sql}\nrows {len(raw)} vs "
        f"{len(spark_rows)}"
    )
    # parse each pg row against the matching-position spark row AFTER
    # sorting both sides textually-stably: parse using the first
    # non-null spark value per column (types are uniform per column)
    protos = []
    for c in range(len(spark_rows[0]) if spark_rows else 0):
        protos.append(next(
            (r[c] for r in spark_rows if r[c] is not None), None
        ))
    pg_rows = sorted(
        (tuple(_parse_like(protos[c], v) for c, v in enumerate(row))
         for row in raw),
        key=key,
    )
    assert spark_rows == pg_rows, (
        f"\nsqlpp : {src}\npg sql: {sql}\n"
        f"spark : {spark_rows[:5]}\npg    : {pg_rows[:5]}"
    )


import test_sqlgen as TS  # sibling module (pytest sys.path)


@pytest.mark.parametrize("i", range(len(TS.DIRECTED)))
def test_postgres_directed(engine, pg, i):
    differ_pg(engine, pg, TS.DIRECTED[i])


def test_postgres_params(engine, pg):
    differ_pg(
        engine, pg,
        "select n_name from nation where n_nationkey < ?k:int not null",
        k=9,
    )


def test_postgres_division_and_mod_by_zero_yield_null(engine, pg):
    """PG errors on ÷0 natively; the CASE wrappers must make both
    int_div and mod yield NULL like the engine/DuckDB."""
    differ_pg(
        engine, pg,
        "select n_nationkey / (n_regionkey - n_regionkey), "
        "mod(n_nationkey, n_regionkey - n_regionkey) from nation",
    )
    differ_pg(
        engine, pg,
        "select (0 - n_nationkey) / 3, n_nationkey / (0 - 7) from nation",
    )


def test_postgres_temporal_round_tostring(engine, pg):
    differ_pg(
        engine, pg,
        "select o_orderkey, year(o_orderdate), month(o_orderdate), "
        "day(o_orderdate) from orders where o_orderkey < 30",
    )
    differ_pg(
        engine, pg,
        "select n_nationkey, toString(n_nationkey > 10), "
        "round(n_nationkey / 7) from nation",
    )


def test_postgres_malformed_datetime_yields_null(engine, pg):
    """The regex guard: a malformed dynamic string -> NULL, matching
    the engine's nullable typing (PG try_cast does not exist)."""
    differ_pg(
        engine, pg,
        "select n_nationkey, datetime(concat(n_name, 'x')) is null, "
        "date(concat('', n_name)) is null from nation",
    )


# -- render-only assertions (run even without a server) ----------------------


def test_postgres_rendering_divergence_points():
    from sqlpp_spark.frontend.analyze import Env, analyze

    env = Env()
    env.add("create table t (x int not null, s string not null, "
            "d datetime not null);")
    sql = select_sql(
        analyze(env, "select x / 2 as q, mod(x, 3) as m, year(d) as y, "
                     "round(x / 3) as r, toString(x) as ts, "
                     "datetime(s) as dt from t"),
        dialect="postgres",
    )
    assert "CASE WHEN 2 = 0 THEN NULL ELSE" in sql       # int_div guard
    assert "% 3" in sql and "CASE WHEN 3 = 0" in sql     # mod guard
    assert "extract(year FROM" in sql                    # no year() in PG
    assert "AS NUMERIC" in sql and "DOUBLE PRECISION" in sql  # round
    assert "AS TEXT" in sql                              # toString
    assert "~ '" in sql and "AS TIMESTAMP" in sql        # regex guard
    assert "try_cast" not in sql and "trunc" not in sql


def test_postgres_cli_dialect_flag(capsys):
    from sqlpp_spark.__main__ import main

    rc = main([
        "sql",
        "select n_nationkey / 3 from nation where n_nationkey < 3",
        "--sf-dir", "/root/testdata/sf0.001",
        "--dialect", "postgres",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "CASE WHEN 3 = 0 THEN NULL" in out and "trunc" not in out
