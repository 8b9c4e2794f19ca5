"""Deterministic cross-engine hashing primitives.

``hash64`` maps a string to a 60-bit integer via the first 15 hex
digits of its MD5 — chosen because both Spark (``conv(substr(md5(x),
1,15),16,10)``) and DuckDB (``('0x'||substr(md5(x),1,15))::BIGINT``)
compute it identically, so dedup/LSH operators stay oracle-checkable.
Spark's builtin xxhash64 would be ~3× faster but has no DuckDB twin;
at production scale swap hash64 to F.xxhash64 (one-line change, same
operator shapes and shuffle behavior).

``perm_hash`` implements the i-th minhash permutation
``(a_i * h + b_i) mod 2^60`` in overflow-free int64 arithmetic
(Spark 4 runs ANSI mode: long overflow raises). With
``h = h1*2^30 + h0`` and ``a = a1*2^30 + a0``::

    a*h mod 2^60 = ((a0*h1 mod 2^30)*2^30
                  + (a1*h0 mod 2^30)*2^30
                  + a0*h0) mod 2^60

every product is < 2^60 and the sum < 2^62.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_BITS = 60
HASH_MOD = 1 << HASH_BITS
_B30 = 1 << 30

# Permutation constants (fixed seed, reproducible everywhere).
MINHASH_A = [
    0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB, 0xD6E8FEB86659FD93,
    0xA0761D6478BD642F, 0xE7037ED1A0B428DB, 0x8EBC6AF09C88C6E3, 0x589965CC75374CC3,
    0x1D8E4E27C47D124F, 0xEB44ACCAB455D165, 0x3C79AC492BA7B653, 0xCC9E2D51B8F0A4E7,
    0x85EBCA6B2B2AE35D, 0xC2B2AE3D27D4EB4F, 0x27D4EB2F165667C5, 0x165667B19E3779F9,
]
MINHASH_B = [
    0x2545F4914F6CDD1D, 0x9E6C63D0A0E6F5A3, 0x5851F42D4C957F2D, 0x14057B7EF767814F,
    0x41C64E6D6F5D3A2B, 0x6C078965B3A254E5, 0x7F4A7C159E3779B9, 0xB5297A4D3B8DDC6D,
    0x68E31DA4A2F9BC5B, 0xB5297A4DDC680F8B, 0x1B56C4E9A86B9F35, 0x4CF5AD432745937F,
    0x2BB6863566C4E761, 0x369DEA0F31A53F85, 0x61C8864680B583EB, 0x8F14C2A1D7C2E96D,
]

N_PERMS = len(MINHASH_A)


def hash64(col: Column) -> Column:
    """60-bit deterministic string hash (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def hash64_sql(expr: str) -> str:
    """DuckDB twin of ``hash64``."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def _consts(i: int) -> tuple[int, int, int, int]:
    a = MINHASH_A[i] % HASH_MOD
    b = MINHASH_B[i] % HASH_MOD
    a1, a0 = divmod(a, _B30)
    return a1, a0, b, a


def perm_hash(h: Column, i: int) -> Column:
    """(a_i * h + b_i) mod 2^60 — Spark side, overflow-free."""
    a1, a0, b, _ = _consts(i)
    # shiftright keeps this in exact integer arithmetic (a double
    # division would lose precision above 2^53)
    h1 = F.shiftright(h, 30)  # h < 2^60 ⇒ h1 < 2^30
    h0 = h % F.lit(_B30)
    t1 = ((F.lit(a0) * h1) % F.lit(_B30)) * F.lit(_B30)
    t2 = ((F.lit(a1) * h0) % F.lit(_B30)) * F.lit(_B30)
    t3 = F.lit(a0) * h0
    return (t1 + t2 + t3 + F.lit(b)) % F.lit(HASH_MOD)


def perm_hash_sql(h_expr: str, i: int) -> str:
    """DuckDB twin of ``perm_hash`` (identical arithmetic)."""
    a1, a0, b, _ = _consts(i)
    h1 = f"(({h_expr}) // {_B30})"
    h0 = f"(({h_expr}) % {_B30})"
    t1 = f"((({a0} * {h1}) % {_B30}) * {_B30})"
    t2 = f"((({a1} * {h0}) % {_B30}) * {_B30})"
    t3 = f"({a0} * {h0})"
    return f"CAST((({t1} + {t2} + {t3} + {b}) % {HASH_MOD}) AS BIGINT)"
