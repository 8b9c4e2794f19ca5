"""Property tests for the nullable type lattice (SURVEY.md §1.2:
ty_lub syntax.ml:103-115, ty_glb syntax.ml:117-135, subsumes
analyze.ml:58-75). No Spark needed."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sqlpp_spark.frontend.errors import SqlppError
from sqlpp_spark.frontend.types import (
    NUMERIC, PRIMS, Ty, numeric, subsumes, ty, ty_glb, ty_lub,
)

tys = st.one_of(
    st.tuples(st.sampled_from(PRIMS), st.booleans()).map(lambda t: ty(*t)),
    st.booleans().map(numeric),
)


@settings(max_examples=200, deadline=None)
@given(a=tys, b=tys)
def test_lub_commutative_and_null_propagating(a, b):
    l1, l2 = ty_lub(a, b), ty_lub(b, a)
    assert l1.kinds == l2.kinds and l1.non_null == l2.non_null
    # nullable if EITHER side nullable (nullable_lub ORs nullability)
    assert l1.non_null == (a.non_null and b.non_null)
    # lub is an upper bound: both operands subsume into it
    assert a.kinds <= l1.kinds and b.kinds <= l1.kinds


@settings(max_examples=200, deadline=None)
@given(a=tys, b=tys)
def test_glb_commutative_or_both_error(a, b):
    try:
        g1 = ty_glb(a, b)
    except SqlppError:
        with pytest.raises(SqlppError):
            ty_glb(b, a)
        assert not (a.kinds & b.kinds)
        return
    g2 = ty_glb(b, a)
    assert g1.kinds == g2.kinds and g1.non_null == g2.non_null
    # glb is a lower bound and keeps the STRICTER nullability
    assert g1.kinds <= a.kinds and g1.kinds <= b.kinds
    assert g1.non_null == (a.non_null or b.non_null)


@settings(max_examples=200, deadline=None)
@given(a=tys)
def test_lattice_idempotent(a):
    assert ty_lub(a, a).kinds == a.kinds
    assert ty_glb(a, a).kinds == a.kinds
    assert subsumes(a, a)


@settings(max_examples=200, deadline=None)
@given(a=tys, b=tys)
def test_lub_absorbs_glb(a, b):
    """lub(a, glb(a,b)) == a on kinds (absorption law)."""
    try:
        g = ty_glb(a, b)
    except SqlppError:
        return
    assert ty_lub(a, g).kinds == a.kinds


def test_subsumes_direction():
    # non_null value accepted where null expected, never vice versa
    # (analyze.ml:75)
    assert subsumes(ty("int", True), ty("int", False))
    assert not subsumes(ty("int", False), ty("int", True))
    # NUMERIC accepts either member; members accept NUMERIC (may narrow)
    assert subsumes(ty("int"), NUMERIC.with_non_null(False))
    assert subsumes(NUMERIC, ty("float"))
    assert not subsumes(ty("string"), ty("int"))


@settings(max_examples=200, deadline=None)
@given(a=tys, b=tys)
def test_lub_preserves_numeric_union_name(a, b):
    out = ty_lub(a, b)
    if out.kinds == frozenset({"int", "float"}):
        assert str(out).startswith("NUMERIC")
