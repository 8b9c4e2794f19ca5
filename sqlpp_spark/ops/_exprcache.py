"""Process-level memo for UNRESOLVED Column expression trees.

Motivation (guide §7.3 — driver-side work): building a deep expression
tree through the PySpark Column API costs one py4j round-trip per
operator. The 16 minhash permutation aggregates alone are ~440 ms of
pure driver time, the fused marker/quality annotation ~480 ms — paid on
EVERY builder invocation even though the trees are constant. Catalyst
trees are immutable and unresolved trees carry no expression ids, so a
tree built once can be safely embedded in any number of plans; only
``Alias`` nodes (``.alias()``/``.agg()`` naming) allocate exprIds and
must therefore be applied FRESH at each call site, never cached.

This caches plan-construction artifacts only — never DataFrames, query
results, or anything derived from data. Every query still computes
from its parquet inputs on every invocation; the physical plans are
bit-identical to the uncached ones.

Lifecycle: py4j ``JavaObject`` handles stay valid for the lifetime of
the JVM gateway, which PySpark creates once per Python process and
keeps across SparkSession stop/start. ``clear()`` exists for tests and
for embedders that tear the gateway down.
"""

from __future__ import annotations

from typing import Callable, Hashable

from pyspark.sql import Column

_CACHE: dict[Hashable, Column | list[Column]] = {}


def cached_expr(key: Hashable, build: Callable[[], Column]) -> Column:
    """Return the memoized unaliased Column for ``key``, building it
    with ``build()`` on first use. The returned tree MUST NOT contain
    Alias nodes — apply ``.alias()`` at the call site."""
    col = _CACHE.get(key)
    if col is None:
        col = build()
        _CACHE[key] = col
    return col


def cached_exprs(key: Hashable, build: Callable[[], list[Column]]) -> list[Column]:
    """List form of ``cached_expr`` (same contract per element)."""
    cols = _CACHE.get(key)
    if cols is None:
        cols = build()
        _CACHE[key] = cols
    return list(cols)


def clear() -> None:
    _CACHE.clear()
