"""Correlated IN / EXISTS subqueries (r12, beyond-reference — the
reference's Expr_in/Expr_exists are uncorrelated, analyze.ml:430-445).
The analyzer's correlation lift (_lift_correlated, shared with scalar
subqueries) extracts comparison conjuncts referencing the enclosing
scope; the compiler folds them into semi/anti-join conditions.
Differential against DuckDB on the PRINTED SQL throughout."""

from __future__ import annotations

import duckdb
import pytest

from sqlpp_spark.compiler.sqlgen import select_sql
from sqlpp_spark.frontend.analyze import Analyzer
from sqlpp_spark.frontend.errors import SqlppError
from sqlpp_spark.frontend.parser import parse_query

T1 = [(1, 1, 10), (2, 1, None), (3, 2, 30), (4, 3, 40), (5, 2, None)]
T2 = [(1, 1, 100), (2, 1, 200), (3, 2, 300), (4, 2, None)]


@pytest.fixture()
def eng(spark):
    from sqlpp_spark.engine import SqlppEngine

    eng = SqlppEngine(spark)
    eng.add_decls(
        "create table t1 (id int not null, grp int not null, val int);"
        "create table t2 (id int not null, grp int not null, amt int);"
    )
    eng.register_df("t1", spark.createDataFrame(
        T1, "id long, grp long, val long"))
    eng.register_df("t2", spark.createDataFrame(
        T2, "id long, grp long, amt long"))
    return eng


@pytest.fixture()
def duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE t1 (id BIGINT, grp BIGINT, val BIGINT)")
    con.executemany("INSERT INTO t1 VALUES (?,?,?)", T1)
    con.execute("CREATE TABLE t2 (id BIGINT, grp BIGINT, amt BIGINT)")
    con.executemany("INSERT INTO t2 VALUES (?,?,?)", T2)
    return con


def _both(eng, duck, src):
    """r15 oracle-provenance audit: the printed SQL for correlated
    subqueries derives from the analyzer's elaboration (the rewrite
    under test), so the ORIGINAL SOURCE is differentialed too —
    DuckDB runs these sources natively."""
    rows = sorted(tuple(r) for r in eng.fetch_list(src))
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    sql = select_sql(info)
    want = sorted(tuple(r) for r in duck.execute(sql).fetchall())
    want2 = sorted(tuple(r) for r in duck.execute(src).fetchall())
    assert want == want2, f"printed SQL diverges from source:\n{src}\n{sql}"
    return rows, want, sql


def test_exists_correlated_equality(eng, duck):
    rows, want, sql = _both(
        eng, duck,
        "select id from t1 where exists (select 1 as one from t2 "
        "where t2.grp = t1.grp) order by id",
    )
    assert rows == want == [(1,), (2,), (3,), (5,)]
    # printed SQL carries the correlation inside the subquery
    assert "t2.grp = t1.grp" in sql.replace('"', "")


def test_not_exists_correlated(eng, duck):
    rows, want, _ = _both(
        eng, duck,
        "select id from t1 where not exists (select 1 as one from t2 "
        "where t2.grp = t1.grp) order by id",
    )
    assert rows == want == [(4,)]


def test_exists_correlated_theta_with_residual(eng, duck):
    # theta correlation + an uncorrelated residual conjunct that must
    # stay inside the subquery filter
    rows, want, _ = _both(
        eng, duck,
        "select id from t1 where exists (select 1 as one from t2 "
        "where t2.grp < t1.grp and amt > 150) order by id",
    )
    assert rows == want == [(3,), (4,), (5,)]


def test_exists_outer_written_left_flips(eng, duck):
    rows, want, _ = _both(
        eng, duck,
        "select id from t1 where exists (select 1 as one from t2 "
        "where t1.grp = t2.grp and t2.amt > 150) order by id",
    )
    assert rows == want == [(1,), (2,), (3,), (5,)]


def test_in_correlated_equality(eng, duck):
    rows, want, _ = _both(
        eng, duck,
        "select id from t1 where id in (select id from t2 "
        "where t2.grp = t1.grp) order by id",
    )
    assert rows == want == [(1,), (2,), (3,)]


def test_not_in_correlated_null_aware(eng, duck):
    # t1.val is NULL on ids 2/5 and t2.amt contains a NULL in grp 2:
    # three-valued NOT IN must drop NULL probes against non-empty
    # groups AND any probe against a group containing NULL
    rows, want, _ = _both(
        eng, duck,
        "select id from t1 where not val in (select amt from t2 "
        "where t2.grp = t1.grp) order by id",
    )
    assert rows == want == [(1,), (4,)]


def test_not_in_correlated_theta(eng, duck):
    rows, want, _ = _both(
        eng, duck,
        "select id from t1 where not id in (select id from t2 "
        "where t2.grp >= t1.grp) order by id",
    )
    assert rows == want


def test_exists_in_dml_where(eng, spark, tmp_path):
    import os

    from sqlpp_spark.engine import SqlppEngine

    e2 = SqlppEngine(spark)
    e2.add_decls(
        "create table items (id int not null primary key, "
        "grp int not null, v int not null);"
        "create table src (id int not null, grp int not null, "
        "amt int);"
    )
    df = spark.createDataFrame(
        [(1, 1, 5), (2, 2, 250), (3, 9, 40)], "id long, grp long, v long"
    )
    e2.create_managed("items", os.path.join(str(tmp_path), "items"), df)
    e2.register_df("src", spark.createDataFrame(
        T2, "id long, grp long, amt long"))
    ret = e2.exec(
        "delete from items where exists (select 1 as one from src "
        "where src.grp = items.grp) returning id"
    )
    assert sorted(r.id for r in ret.collect()) == [1, 2]


def _err(eng, src, match):
    with pytest.raises(SqlppError, match=match):
        Analyzer(eng.env, src).analyze_query(parse_query(src))


def test_correlated_sub_shape_errors(eng):
    _err(eng,
         "select id from t1 where exists (select count(1) as c from t2 "
         "where t2.grp = t1.grp group by grp)",
         "cannot use GROUP BY")
    _err(eng,
         "select id from t1 where id in (select id from t2 "
         "where t2.grp = t1.grp order by id limit 1)",
         "ORDER BY/LIMIT/OFFSET")
    # non-comparison correlation still errors
    _err(eng,
         "select id from t1 where exists (select 1 as one from t2 "
         "where t2.grp + t1.grp = 3)",
         "no such scope|unsupported correlation")


def test_theta_flag_position_supported(eng, duck):
    """r13 second wave: THETA correlation in flag position (projection,
    OR) compiles through the distinct-probe aggregate path — no row
    multiplication, full 3VL for single-col IN. Differential against
    DuckDB on the printed SQL AND the original source."""
    for src in (
        "select id, (id in (select t2.id as i from t2 "
        "where t2.grp > t1.grp)) as f from t1 order by id",
        "select id, (exists (select 1 as one from t2 "
        "where t2.grp > t1.grp)) as f from t1 order by id",
        "select id from t1 where exists (select 1 as one from t2 "
        "where t2.amt >= t1.val) or val = 30 order by id",
        "select id from t1 where (id not in (select t2.id as i from t2 "
        "where t2.amt >= t1.val)) or val = 30 order by id",
        # mixed eq+theta in flag position via De Morgan
        "select id from t1 where exists (select 1 as one from t2 "
        "where not (t2.grp = t1.grp and t2.amt < t1.val)) order by id",
    ):
        rows, want, sql = _both(eng, duck, src)
        assert rows == want, f"{src}\n{sql}"
        want2 = sorted(tuple(r) for r in duck.execute(src).fetchall())
        assert rows == want2, src


def test_uncorrelated_paths_unchanged(eng, duck):
    rows, want, _ = _both(
        eng, duck,
        "select id from t1 where exists (select 1 as one from t2 "
        "where amt > 250) order by id",
    )
    assert rows == want == [(1,), (2,), (3,), (4,), (5,)]
    rows, want, _ = _both(
        eng, duck,
        "select id from t1 where grp in (select grp from t2) order by id",
    )
    assert rows == want == [(1,), (2,), (3,), (5,)]


def test_correlated_under_disjunction_supported_via_or_split(eng, duck):
    """r13: EXISTS/IN distribute over OR (existential quantification
    over a union = Kleene-OR of branch quantifications), so correlated
    equality atoms under OR now decorrelate — each DNF branch becomes
    its own EXISTS/IN compiled through the per-outer-row match flag.
    Differential against DuckDB on the printed SQL AND the original
    source (r14: the original-source check is what catches a wrong
    rewrite — comparing only against the printed, already-rewritten
    SQL lets a bad rewrite self-validate)."""
    for src in (
        "select id from t1 where exists (select 1 as one from t2 "
        "where t2.grp = t1.grp or t2.amt > 100) order by id",
        "select id from t1 where id in (select id from t2 "
        "where t2.grp = t1.grp or t2.grp = t1.id) order by id",
        "select id from t1 where exists (select 1 as one from t2 "
        "where (t2.grp = t1.grp and t2.amt > 150) or t2.id = t1.id) "
        "order by id",
        "select id from t1 where val not in (select amt from t2 "
        "where t2.grp = t1.grp or t2.id = t1.id) order by id",
        # r14 De Morgan regression pin: NOT IN whose branches match
        # DIFFERENT outer rows — the broken per-branch-negation
        # rewrite returns {1,3,4,5} here, correct answer is {1}
        "select id from t1 where id not in (select id from t2 "
        "where t2.grp = t1.grp or t2.grp = t1.id) order by id",
        "select id from t1 where not exists (select 1 as one from t2 "
        "where t2.grp = t1.grp or t2.amt > 250) order by id",
    ):
        rows, want, sql = _both(eng, duck, src)
        assert rows == want, f"{src}\n{sql}"
        want2 = sorted(tuple(r) for r in duck.execute(src).fetchall())
        assert rows == want2, src
    # correlated EXISTS/IN under OR at the OUTER level + projection
    # position (the r13 match-flag path)
    for src in (
        "select id from t1 where exists (select 1 as one from t2 "
        "where t2.grp = t1.grp) or val > 35 order by id",
        "select id, (id in (select id from t2 where t2.grp = t1.grp)) "
        "as f from t1 order by id",
        "select id, (exists (select 1 as one from t2 "
        "where t2.grp = t1.grp)) as f from t1 order by id",
    ):
        rows, want, sql = _both(eng, duck, src)
        assert rows == want, f"{src}\n{sql}"
        want2 = sorted(tuple(r) for r in duck.execute(src).fetchall())
        assert rows == want2, src


def test_not_pushdown_decorrelates(eng, duck):
    """r13: NNF normalization (_push_not) — NOT pushed through AND/OR
    via De Morgan (exact in Kleene 3VL), double negation cancelled,
    comparisons and IS [NOT] NULL flipped — makes correlation under
    NOT liftable. Differential against DuckDB on the printed SQL AND
    the original source."""
    for src in (
        # flipped equality (a non-equality conjunct, still top-level)
        "select id from t1 where exists (select 1 as one from t2 "
        "where not (t2.grp = t1.grp)) order by id",
        # double negation
        "select id from t1 where exists (select 1 as one from t2 "
        "where not not (t2.grp = t1.grp)) order by id",
        # De Morgan over OR -> AND of flipped correlated atoms
        "select id from t1 where exists (select 1 as one from t2 "
        "where not (t2.grp = t1.grp or t2.amt >= t1.val)) order by id",
        # IS NULL flip beside a correlation
        "select id from t1 where exists (select 1 as one from t2 "
        "where not (t2.amt is null) and t2.grp = t1.grp) order by id",
        # scalar subquery with a flipped theta correlation
        "select id, (select count(1) as c from t2 "
        "where not (t2.grp < t1.grp) group by ()) as n from t1 order by id",
    ):
        rows, want, sql = _both(eng, duck, src)
        assert rows == want, f"{src}\n{sql}"
        # end-to-end: the original source is itself valid SQL here
        want2 = sorted(tuple(r) for r in duck.execute(src).fetchall())
        assert rows == want2, src


def test_correlated_remaining_boundaries(eng, duck):
    """Still-unsupported shapes keep their DEDICATED compile-time
    errors (never the raw name-resolution failure, never a wrong
    answer). With the r13 theta flag joins, what remains is: mixed-
    scope expressions inside ONE comparison side, and non-negatable
    correlated atoms (IN/EXISTS/LIKE) under NOT."""
    # De Morgan over a correlated AND + an uncorrelated IN atom now
    # splits and compiles — differential, not an error
    src = ("select id from t1 where exists (select 1 as one from t2 "
           "where not (t2.grp = t1.grp and t2.amt in "
           "(select val as v from t1))) order by id")
    rows, want, sql = _both(eng, duck, src)
    assert rows == want, f"{src}\n{sql}"
    # mixed-scope arithmetic inside one comparison side: analysis error
    _err(eng,
         "select id from t1 where exists (select 1 as one from t2 "
         "where not (t2.grp + t1.grp = 3))",
         "unsupported correlation")
    # the same atoms as top-level AND conjuncts stay supported
    rows = eng.fetch_list(
        "select id from t1 where exists (select 1 as one from t2 "
        "where t2.grp = t1.grp and t2.amt > 100) order by id"
    )
    assert [r[0] for r in rows] == [1, 2, 3, 5]


def _ref_tuple_in(probe, rows):
    """Python reference for SQL three-valued tuple IN."""
    any_unknown = False
    for r in rows:
        cmps = [
            (None if p is None or s is None else p == s)
            for p, s in zip(probe, r)
        ]
        if all(c is True for c in cmps):
            return True
        if all(c is not False for c in cmps):
            any_unknown = True
    return None if any_unknown else False


def test_multicol_in_full_3vl(eng):
    """r13 second wave: multi-column IN in flag position has FULL
    three-valued semantics (the former two-valued deviation is gone),
    for uncorrelated, equality- and theta-correlated subqueries, plus
    tuple NOT IN. DuckDB v1.0 rejects multi-column IN subqueries
    outright, so the oracle is a Python 3VL reference over the same
    rows."""
    sub = [(g, (a - 90) if a is not None else None) for _, g, a in T2]

    got = {r[0]: r[1] for r in eng.fetch_list(
        "select id, ((grp, val) in (select t2.grp as g, "
        "t2.amt - 90 as a from t2)) as f from t1")}
    assert got == {i: _ref_tuple_in((g, v), sub) for i, g, v in T1}

    got = {r[0]: r[1] for r in eng.fetch_list(
        "select id, ((grp, val) not in (select t2.grp as g, "
        "t2.amt - 90 as a from t2)) as f from t1")}
    assert got == {
        i: (None if (m := _ref_tuple_in((g, v), sub)) is None else not m)
        for i, g, v in T1
    }

    # UNKNOWN must not pass a WHERE, even under OR
    got = sorted(r[0] for r in eng.fetch_list(
        "select id from t1 where ((grp, val) in (select t2.grp as g, "
        "t2.amt - 290 as a from t2)) or id = 4"))
    sub3 = [(g, (a - 290) if a is not None else None) for _, g, a in T2]
    assert got == sorted(
        i for i, g, v in T1
        if _ref_tuple_in((g, v), sub3) is True or i == 4
    )

    # equality-correlated membership set
    got = {r[0]: r[1] for r in eng.fetch_list(
        "select id, ((grp, val) in (select t2.grp as g, t2.amt - 90 as a "
        "from t2 where t2.grp = t1.grp)) as f from t1")}
    assert got == {
        i: _ref_tuple_in(
            (g, v),
            [(tg, (ta - 90) if ta is not None else None)
             for _, tg, ta in T2 if tg == g],
        )
        for i, g, v in T1
    }

    # theta-correlated membership set
    got = {r[0]: r[1] for r in eng.fetch_list(
        "select id, ((grp, val) in (select t2.grp as g, t2.amt - 90 as a "
        "from t2 where t2.amt >= t1.val)) as f from t1")}
    assert got == {
        i: _ref_tuple_in(
            (g, v),
            [(tg, (ta - 90) if ta is not None else None)
             for _, tg, ta in T2
             if ta is not None and v is not None and ta >= v],
        )
        for i, g, v in T1
    }


def test_exists_theta_minmax_reduction_differential(eng, duck):
    """r17: a theta EXISTS with exactly ONE non-equality conjunct
    reduces EXACTLY to a min/max-of-key marker per equality group
    (compile._exists_theta_marker) — the whole op/negation/NULL grid
    must match DuckDB through the reduced plan."""
    for src in (
        # pure theta, all five reducible ops
        "select id from t1 where exists (select 1 as one from t2 "
        "where t2.grp < t1.grp) order by id",
        "select id from t1 where exists (select 1 as one from t2 "
        "where t2.grp <= t1.grp) order by id",
        "select id from t1 where exists (select 1 as one from t2 "
        "where t2.grp > t1.grp) order by id",
        "select id from t1 where exists (select 1 as one from t2 "
        "where t2.grp >= t1.grp) order by id",
        "select id from t1 where exists (select 1 as one from t2 "
        "where t2.grp != t1.grp) order by id",
        # NOT EXISTS through the same marker (anti join)
        "select id from t1 where not exists (select 1 as one from t2 "
        "where t2.grp < t1.grp) order by id",
        "select id from t1 where not exists (select 1 as one from t2 "
        "where t2.grp != t1.grp) order by id",
        # equality + theta: marker per equality group
        "select id from t1 where exists (select 1 as one from t2 "
        "where t2.grp = t1.grp and t2.amt < t1.val) order by id",
        "select id from t1 where not exists (select 1 as one from t2 "
        "where t2.grp = t1.grp and t2.amt < t1.val) order by id",
        # theta over a NULL-bearing key column (amt has NULLs): NULL
        # keys witness nothing; all-NULL groups yield NULL cells
        "select id from t1 where exists (select 1 as one from t2 "
        "where t2.amt < t1.val) order by id",
        "select id from t1 where exists (select 1 as one from t2 "
        "where t2.grp = t1.grp and t2.amt != t1.val) order by id",
        # residual subquery filter stays inside the aggregation
        "select id from t1 where exists (select 1 as one from t2 "
        "where t2.grp >= t1.grp and amt > 150) order by id",
        # empty-after-filter subquery: EXISTS false everywhere
        "select id from t1 where exists (select 1 as one from t2 "
        "where t2.grp < t1.grp and amt > 99999) order by id",
    ):
        _both(eng, duck, src)


def test_exists_theta_reduction_plan_no_nested_loop(eng):
    """The pure-theta EXISTS used to be an outer x sub
    BroadcastNestedLoopJoin over the RAW subquery; with the min/max
    reduction the joined side is ONE aggregated row (or |eq groups|
    rows), so any remaining nested-loop join touches a 1-row side."""
    import contextlib
    import io
    import re

    df = eng.query(
        "select id from t1 where exists (select 1 as one from t2 "
        "where t2.grp < t1.grp)"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    # the joined side must be the AGGREGATED marker, not the raw scan
    assert re.search(r"HashAggregate", p), p
    # two theta conjuncts do NOT reduce -- fallback keeps the raw
    # semi join (pinning the eligibility gate)
    df2 = eng.query(
        "select id from t1 where exists (select 1 as one from t2 "
        "where t2.grp < t1.grp and t2.amt > t1.val)"
    )
    buf2 = io.StringIO()
    with contextlib.redirect_stdout(buf2):
        df2.explain("formatted")
    assert "Join LeftSemi" in buf2.getvalue() or "BroadcastNestedLoopJoin" \
        in buf2.getvalue()
