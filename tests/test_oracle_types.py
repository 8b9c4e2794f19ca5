"""Oracle type lint + type-class gate regression tests.

r15 lesson: the driver's value-hash is TYPE-sensitive. Two registry
oracles shipped uncast ``SUM(CASE...)`` columns — DuckDB widens BIGINT
sums to HUGEINT (int128), pandas silently coerced the dtype away, the
local harness passed, and the driver gate hash-failed. These tests
make that failure class impossible to reintroduce:

1. every registry oracle is DESCRIBE'd through DuckDB and its result
   schema must contain only engine-reachable type classes (never
   HUGEINT/UHUGEINT and never an unclassified type), and
2. the hardened ``compare()`` must REJECT an un-CAST sum oracle on
   type-class mismatch even though the values agree bit-for-bit —
   reverting the r15 fix now fails locally, not at the driver.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from sqlpp_spark.queries import REGISTRY, _ensure_loaded
from sqlpp_spark.session import TABLES
from sqlpp_spark.testing.oracle import (
    _duckdb_type_class,
    compare,
    run_oracle,
)

_ensure_loaded()
WITH_ORACLE = sorted(n for n, s in REGISTRY.items() if s.oracle)

# The classes the engine can actually produce through toPandas /
# the driver's hash. "hugeint" and "other" are deliberately absent.
ENGINE_REACHABLE = {
    "int", "float", "bool", "decimal", "date", "datetime",
    "string", "bytes", "list",
}

SF_LINT = "/root/testdata/sf0.001"  # types don't depend on SF


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_LINT, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()


def test_registry_oracles_engine_reachable_types(duck):
    bad = []
    for name in WITH_ORACLE:
        rel = duck.sql(REGISTRY[name].oracle)
        for col, typ in zip(rel.columns, rel.types):
            cls = _duckdb_type_class(str(typ))
            if cls not in ENGINE_REACHABLE:
                bad.append((name, col, str(typ), cls))
    assert not bad, (
        "oracle columns with driver-unmatchable types (CAST them, "
        "e.g. CAST(sum(x) AS BIGINT)): " + repr(bad)
    )


def test_uncast_sum_oracle_fails_typecheck(spark, sf_dir):
    # the exact r15 failure shape: engine BIGINT vs oracle HUGEINT,
    # values identical — must now fail compare() on type class
    sdf = spark.sql(
        "SELECT CAST(1 AS BIGINT) AS grp, CAST(10 AS BIGINT) AS total"
    )
    odf = run_oracle(
        "SELECT CAST(1 AS BIGINT) AS grp, sum(x) AS total "
        "FROM (VALUES (4), (6)) t(x)",
        sf_dir,
    )
    assert odf.attrs["duckdb_types"]["total"].upper().startswith("HUGEINT") or (
        "INT128" in odf.attrs["duckdb_types"]["total"].upper()
    )
    report = compare(sdf, odf)
    assert not report["match"]
    assert "type-class mismatch" in report["detail"]


def test_cast_sum_oracle_passes_typecheck(spark, sf_dir):
    sdf = spark.sql(
        "SELECT CAST(1 AS BIGINT) AS grp, CAST(10 AS BIGINT) AS total"
    )
    odf = run_oracle(
        "SELECT CAST(1 AS BIGINT) AS grp, CAST(sum(x) AS BIGINT) AS total "
        "FROM (VALUES (4), (6)) t(x)",
        sf_dir,
    )
    report = compare(sdf, odf)
    assert report["match"], report["detail"]
