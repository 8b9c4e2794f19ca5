"""The sqlpp type system: primitive kinds + a union pseudo-type, with
first-class nullability and the lub/glb lattice.

Reference semantics (sqlpp/syntax.ml:58-135, SURVEY.md §1.2):
- every type carries a nullability bit; lub ORs it, glb ANDs it
- ty_lub unions kind-sets (building Ty_one_of), ty_glb intersects and
  errors on an empty intersection
- subsumes: a NOT NULL value is accepted where NULL is expected, never
  the reverse; kind-wise the actual set must be a subset of expected
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import FrozenSet, Optional

from sqlpp_spark.frontend.errors import Loc, SqlppError

PRIMS = ("bool", "string", "int", "float", "datetime", "date", "time", "interval")


@dataclass(frozen=True)
class Ty:
    kinds: FrozenSet[str]  # singleton for concrete types; >1 for one-of
    non_null: bool
    union_name: Optional[str] = None  # e.g. "NUMERIC" for display

    def __str__(self) -> str:
        if self.union_name and len(self.kinds) > 1:
            base = self.union_name
        elif len(self.kinds) == 1:
            base = next(iter(self.kinds)).upper()
        else:
            base = "|".join(sorted(k.upper() for k in self.kinds))
        return f"{base}{' NOT NULL' if self.non_null else ' NULL'}"

    @property
    def kind(self) -> str:
        """Concrete kind; NUMERIC-like unions resolve to float if still
        ambiguous at compile time (backend numeric widening)."""
        if len(self.kinds) == 1:
            return next(iter(self.kinds))
        if self.kinds == frozenset({"int", "float"}):
            return "float"
        return sorted(self.kinds)[0]

    def nullable(self) -> "Ty":
        return Ty(self.kinds, False, self.union_name)

    def with_non_null(self, non_null: bool) -> "Ty":
        return Ty(self.kinds, non_null, self.union_name)


def ty(kind: str, non_null: bool = True) -> Ty:
    assert kind in PRIMS, kind
    return Ty(frozenset({kind}), non_null)


def numeric(non_null: bool = True) -> Ty:
    return Ty(frozenset({"int", "float"}), non_null, "NUMERIC")


BOOL = ty("bool")
STRING = ty("string")
INT = ty("int")
FLOAT = ty("float")
DATETIME = ty("datetime")
DATE = ty("date")
TIME = ty("time")
INTERVAL = ty("interval")
NUMERIC = numeric()


def ty_lub(a: Ty, b: Ty, loc: Loc | None = None, src: str | None = None) -> Ty:
    """Union of kinds; nullable if either side is nullable."""
    kinds = a.kinds | b.kinds
    name = a.union_name if kinds == a.kinds else (b.union_name if kinds == b.kinds else None)
    if kinds == frozenset({"int", "float"}):
        name = "NUMERIC"
    return Ty(kinds, a.non_null and b.non_null, name)


def ty_glb(a: Ty, b: Ty, loc: Loc | None = None, src: str | None = None) -> Ty:
    """Intersection of kinds; error when empty; NOT NULL if either side is."""
    kinds = a.kinds & b.kinds
    if not kinds:
        raise SqlppError(f"types do not match: {a} vs {b}", loc, src)
    name = "NUMERIC" if kinds == frozenset({"int", "float"}) else None
    return Ty(kinds, a.non_null or b.non_null, name)


def subsumes(actual: Ty, expected: Ty) -> bool:
    """Can a value of type ``actual`` be used where ``expected`` is wanted?"""
    if not actual.kinds <= expected.kinds and not expected.kinds <= actual.kinds:
        # one-of expected (e.g. NUMERIC) accepts any member subset;
        # concrete expected accepts a one-of that could still narrow
        if not (actual.kinds & expected.kinds):
            return False
    if expected.non_null and not actual.non_null:
        return False  # NULL value where NOT NULL expected
    return True


def check_subsumes(actual: Ty, expected: Ty, loc: Loc | None = None, src: str | None = None):
    if not subsumes(actual, expected):
        raise SqlppError(f"expected {expected} but got {actual}", loc, src)


def parse_ty_name(name: str, loc: Loc | None = None, src: str | None = None) -> Ty:
    n = name.lower()
    if n in PRIMS:
        return ty(n)
    if n == "numeric":
        return numeric()
    raise SqlppError(f"no such type: {name}", loc, src)
