"""Every registered query with an oracle must match DuckDB exactly —
this mirrors the driver's CORRECTNESS gate (row-count + columns +
order-insensitive values, floats bit-equal)."""

from __future__ import annotations

import pytest

from sqlpp_spark.ops import release_intermediates
from sqlpp_spark.queries import REGISTRY, _ensure_loaded
from sqlpp_spark.testing.oracle import compare, run_oracle

_ensure_loaded()
WITH_ORACLE = sorted(n for n, s in REGISTRY.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if not s.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark, sf_dir, name):
    spec = REGISTRY[name]
    sdf = spec.builder(spark, sf_dir)
    odf = run_oracle(spec.oracle, sf_dir)
    report = compare(sdf, odf)
    # drop per-query persisted intermediates so 120 parametrized runs
    # in one session don't accumulate cached blocks
    release_intermediates(sdf)
    assert report["match"], f"{name}: {report}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.builder(spark, sf_dir)
    n = df.count()
    release_intermediates(df)
    assert n >= 0


def test_registry_import_errors_propagate(monkeypatch):
    """A broken query module must raise at _ensure_loaded(), never
    silently shrink the registry (the driver gate would then sample a
    smaller suite and pass vacuously)."""
    import sqlpp_spark.queries as Q

    monkeypatch.setattr(Q, "_loaded", False)
    monkeypatch.setattr(Q, "QUERY_MODULES", ("relational", "no_such_module"))
    with pytest.raises(ImportError, match="no_such_module"):
        Q._ensure_loaded()
