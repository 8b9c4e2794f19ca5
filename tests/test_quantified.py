"""ANY/SOME/ALL quantified comparisons (r15, beyond reference —
standard SQL quantified predicates; the reference's grammar has IN and
EXISTS only, parser.mly).

``= ANY`` / ``!= ALL`` desugar at parse time to the IN machinery
(keeping full correlation support); the ORDERED forms (< <= > >= with
either quantifier, plus != ANY and = ALL) build ast.EQuant and compile
to ONE broadcast aggregate row (count / non-null count / min / max)
plus a Kleene-exact CASE — see compile._attach_quant. Equality
correlation groups the marker by the lifted keys (per-key bounded
state); theta correlation gets a targeted boundary error.

Differential against DuckDB's NATIVE quantified comparisons on BOTH
the printed SQL and the original source, over the four semantic
regimes: empty set, NULL probe, NULL-bearing set, all-NULL set.
"""

from __future__ import annotations

import duckdb
import pytest

from sqlpp_spark.compiler.sqlgen import select_sql
from sqlpp_spark.frontend.analyze import Analyzer
from sqlpp_spark.frontend.errors import SqlppError
from sqlpp_spark.frontend.parser import parse_query
from sqlpp_spark.frontend.printer import format_query

T1 = [(1, 5), (2, None), (3, 30), (4, 15), (5, 7)]
# grp 1: plain values; grp 2: NULL-bearing; grp 3: (empty); grp 4: all-NULL
T2 = [(1, 10), (1, 20), (2, None), (2, 7), (4, None), (4, None)]


@pytest.fixture()
def eng(spark):
    from sqlpp_spark.engine import SqlppEngine

    eng = SqlppEngine(spark)
    eng.add_decls(
        "create table t1 (id int not null, val int);"
        "create table t2 (grp int not null, v int);"
    )
    eng.register_df("t1", spark.createDataFrame(T1, "id long, val long"))
    eng.register_df("t2", spark.createDataFrame(T2, "grp long, v long"))
    return eng


@pytest.fixture()
def duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE t1 (id BIGINT, val BIGINT)")
    con.execute("CREATE TABLE t2 (grp BIGINT, v BIGINT)")
    con.executemany("INSERT INTO t1 VALUES (?,?)", T1)
    con.executemany("INSERT INTO t2 VALUES (?,?)", T2)
    return con


def _differ(eng, duck, src):
    rows = sorted(tuple(repr(x) for x in r) for r in eng.fetch_list(src))
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    sql = select_sql(info)
    want = sorted(tuple(repr(x) for x in r) for r in duck.execute(sql).fetchall())
    want2 = sorted(tuple(repr(x) for x in r) for r in duck.execute(src).fetchall())
    assert rows == want == want2, f"{src}\n{sql}\n{rows}\n{want}\n{want2}"


# every op/quant pair, each in flag position so all three outcomes
# (TRUE/FALSE/NULL) are visible, over each semantic regime
FLAG_SOURCES = [
    # clean set (grp 1): pure ordering logic
    "select id, (val {} (select v from t2 where grp = 1)) as f "
    "from t1 order by id".format(q)
    for q in (
        "< any", "<= any", "> any", ">= any", "!= any",
        "< all", "<= all", "> all", ">= all", "= all",
    )
] + [
    # NULL-bearing set (grp = 1 or 2 via <=2): UNKNOWN propagation
    "select id, (val {} (select v from t2 where grp <= 2)) as f "
    "from t1 order by id".format(q)
    for q in ("< any", "> all", "!= any", "= all", ">= any", "<= all")
] + [
    # empty set (grp 3): ANY→FALSE, ALL→TRUE for every row incl. NULL probe
    "select id, (val < any (select v from t2 where grp = 3)) as f "
    "from t1 order by id",
    "select id, (val >= all (select v from t2 where grp = 3)) as f "
    "from t1 order by id",
    # all-NULL set (grp 4): never decidable → NULL everywhere
    "select id, (val > any (select v from t2 where grp = 4)) as f "
    "from t1 order by id",
    "select id, (val <= all (select v from t2 where grp = 4)) as f "
    "from t1 order by id",
]

WHERE_SOURCES = (
    # WHERE position: UNKNOWN rows drop
    "select id from t1 where val < any (select v from t2 where grp = 1) "
    "order by id",
    "select id from t1 where val >= all (select v from t2 where grp <= 2) "
    "order by id",
    # desugared spellings: = ANY == IN, != ALL == NOT IN
    "select id from t1 where val = any (select v from t2) order by id",
    "select id from t1 where val != all (select v from t2 where "
    "v is not null) order by id",
    # NOT composition over the flag (3VL through ~)
    "select id from t1 where not (val < all (select v from t2 "
    "where grp = 1)) order by id",
    # compound subquery body
    "select id from t1 where val <= any (select v from t2 where grp = 1 "
    "union all select v from t2 where grp = 2) order by id",
    # probe is an expression; subquery projects an expression
    "select id from t1 where val + 1 > all (select v - 1 from t2 "
    "where grp = 1) order by id",
)


def test_quantified_flag_differential(eng, duck):
    for src in FLAG_SOURCES:
        _differ(eng, duck, src)


def test_quantified_where_differential(eng, duck):
    for src in WHERE_SOURCES:
        _differ(eng, duck, src)


def test_quantified_probe_with_nested_scalar_subquery(eng, duck):
    """r16: the probe side of a quantified comparison may itself be
    (or contain) a scalar subquery — previously the parent-first node
    walk compiled the probe before attaching the nested EScalarSub and
    raised the misleading not-pre-materialized error."""
    for src in (
        # probe IS a scalar subquery, WHERE position (the ADVICE repro)
        "select id from t1 where (select min(v) from t2 where grp = 1 "
        "group by ()) < any (select v from t2 where grp = 1) order by id",
        # probe CONTAINS a scalar subquery inside arithmetic
        "select id from t1 where val + (select min(v) from t2 "
        "where grp = 1 group by ()) <= all (select v + 100 from t2 "
        "where grp = 1) order by id",
        # flag position too
        "select id, ((select max(v) from t2 where grp = 1 group by ()) "
        ">= all (select v from t2 where grp <= 2)) as f "
        "from t1 order by id",
    ):
        _differ(eng, duck, src)


def test_some_is_any(eng):
    a = eng.fetch_list(
        "select id from t1 where val > some (select v from t2 where "
        "grp = 1) order by id"
    )
    b = eng.fetch_list(
        "select id from t1 where val > any (select v from t2 where "
        "grp = 1) order by id"
    )
    assert a == b


def test_quantified_in_grouped_select(eng, duck):
    # flag position inside a grouped select (routes through the
    # grouped _attach_scalar_subqueries path)
    _differ(
        eng, duck,
        "select (sum(val) > all (select v from t2 where grp = 1)) as big, "
        "count(1) as n from t1 group by ()",
    )


CORR_SOURCES = (
    # per-key quantification: each outer id sees its own set — grp 1
    # clean {10,20}, grp 2 NULL-bearing {NULL,7}, grp 3 missing (empty
    # per-key set: ANY→FALSE / ALL→TRUE), grp 4 all-NULL
    "select t1.id, (t1.val < all (select t2.v from t2 "
    "where t2.grp = t1.id)) as f from t1 order by t1.id",
    "select t1.id, (t1.val >= any (select t2.v from t2 "
    "where t2.grp = t1.id)) as f from t1 order by t1.id",
    "select t1.id from t1 where t1.val <= all (select t2.v from t2 "
    "where t2.grp = t1.id) order by t1.id",
    "select t1.id, (t1.val != any (select t2.v from t2 "
    "where t2.grp = t1.id)) as f from t1 order by t1.id",
    "select t1.id, (t1.val = all (select t2.v from t2 "
    "where t2.grp = t1.id)) as f from t1 order by t1.id",
    # correlation + residual uncorrelated filter
    "select t1.id, (t1.val > any (select t2.v from t2 "
    "where t2.grp = t1.id and t2.v > 5)) as f from t1 order by t1.id",
)


def test_quantified_correlated_differential(eng, duck):
    # equality-correlated ordered quantifiers: per-key aggregate
    # marker (r15) — DuckDB runs both the printed correlated SQL and
    # the original source natively
    for src in CORR_SOURCES:
        _differ(eng, duck, src)


THETA_CORR_SOURCES = (
    # the former boundary error (r16): theta-correlated ordered
    # quantifier — per-outer-row set selected by an inequality
    "select id from t1 where val < any "
    "(select v from t2 where t2.grp < t1.id) order by id",
    "select id from t1 where val >= all "
    "(select v from t2 where t2.grp < t1.id) order by id",
    # flag position: all three outcomes visible (NULL-bearing sets
    # enter as id grows past grp 2; empty set for id=1 via grp<1)
    "select id, (val > any (select v from t2 where t2.grp < t1.id)) "
    "as f from t1 order by id",
    "select id, (val <= all (select v from t2 where t2.grp < t1.id)) "
    "as f from t1 order by id",
    "select id, (val != any (select v from t2 where t2.grp != t1.id)) "
    "as f from t1 order by id",
    "select id, (val = all (select v from t2 where t2.grp >= t1.id)) "
    "as f from t1 order by id",
    # mixed equality + theta correlation
    "select id, (val < all (select v from t2 where t2.grp = t1.id "
    "and t2.v > t1.id)) as f from t1 order by id",
    # theta on an expression probe tuple
    "select id, (val <= any (select v from t2 "
    "where t2.grp <= t1.id - 2)) as f from t1 order by id",
)


def test_quantified_theta_correlated_differential(eng, duck):
    # r16: theta-correlated ordered quantifiers — distinct-probe-tuple
    # aggregate marker; DuckDB runs both the printed correlated SQL
    # and the original source natively
    for src in THETA_CORR_SOURCES:
        _differ(eng, duck, src)


def test_quantified_theta_banded_differential(spark, eng, duck):
    # r17 (round-16 verdict ask #4): the range-bucket band-join
    # strategy for single ordered theta correlations — force it on
    # the tiny fixtures (floor/threshold 1) and run the SAME semantic
    # battery: empty set, NULL probe, NULL-bearing set, all-NULL set,
    # out-of-range probes. Sources with mixed/equality/!= correlation
    # fall back to the nested loop inside the same test (eligibility
    # gate), so both lowerings are pinned to one truth.
    spark.conf.set("spark.sqlpp.quantifier.bandedSubFloor", "1")
    spark.conf.set("spark.sqlpp.quantifier.bandedThreshold", "1")
    spark.conf.set("spark.sqlpp.quantifier.bandedBuckets", "4")
    try:
        for src in THETA_CORR_SOURCES:
            _differ(eng, duck, src)
        # probes far outside the sub key range (buckets 0 / NB+1)
        _differ(
            eng, duck,
            "select id, (val > any (select v from t2 "
            "where t2.grp < t1.id + 100)) as f from t1 order by id",
        )
        _differ(
            eng, duck,
            "select id, (val <= all (select v from t2 "
            "where t2.grp > t1.id - 100)) as f from t1 order by id",
        )
    finally:
        spark.conf.unset("spark.sqlpp.quantifier.bandedSubFloor")
        spark.conf.unset("spark.sqlpp.quantifier.bandedThreshold")
        spark.conf.unset("spark.sqlpp.quantifier.bandedBuckets")


def test_quantified_shape_errors(eng):
    with pytest.raises(SqlppError, match="exactly one column"):
        eng.fetch_list(
            "select id from t1 where val < any (select grp, v from t2)"
        )
    with pytest.raises(SqlppError, match="expected"):
        eng.fetch_list(
            "select id from t1 where val < any "
            "(select toString(v) as s from t2)"
        )


def test_quantified_sqlite_divergence(eng):
    src = "select id from t1 where val < any (select v from t2)"
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    with pytest.raises(SqlppError, match="backend divergence"):
        select_sql(info, dialect="sqlite")


def test_quantified_format_roundtrip(eng):
    src = (
        "select id from t1 where val < any (select v from t2 "
        "where grp = 1) order by id"
    )
    printed = format_query(parse_query(src))
    assert "< any" in printed
    assert eng.fetch_list(printed) == eng.fetch_list(src)


def test_quantified_plan_broadcasts(eng):
    # the subquery reduces to ONE aggregate row broadcast to the probe
    # side: no shuffle of t1, no sort-merge join anywhere
    df = eng.query(
        "select id from t1 where val < any (select v from t2 where grp = 1)"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # partial aggregation happens map-side before the single-row merge
    assert "partial_count" in plan or "HashAggregate" in plan


def test_quantified_and_distinct_from_in_dml(spark, tmp_path):
    """The r15 predicates reach DML WHERE positions through the same
    compile paths: DELETE with an ALL quantifier keeps UNKNOWN rows
    (3VL — NULL probe survives), UPDATE with IS DISTINCT FROM touches
    the NULL rows plain != would skip."""
    from sqlpp_spark.engine import SqlppEngine

    eng = SqlppEngine(spark)
    eng.add_decls(
        "create table t1 (id int not null primary key, val int);"
        "create table t2 (v int);"
    )
    eng.create_managed(
        "t1", str(tmp_path / "t1"),
        spark.createDataFrame(
            [(1, 5), (2, 30), (3, None), (4, 15)], "id long, val long"
        ),
    )
    eng.create_managed(
        "t2", str(tmp_path / "t2"),
        spark.createDataFrame([(10,), (20,)], "v long"),
    )
    eng.exec("delete from t1 where val > all (select v from t2)")
    assert sorted((r[0], r[1]) for r in eng.fetch_list(
        "select id, val from t1"
    )) == [(1, 5), (3, None), (4, 15)]
    eng.exec("update t1 set val = 0 where val is distinct from 5")
    assert sorted((r[0], r[1]) for r in eng.fetch_list(
        "select id, val from t1"
    )) == [(1, 5), (3, 0), (4, 0)]


def test_quantified_theta_banded_temporal_keys(spark, eng, duck):
    # r19: DATE theta correlation keys band through a monotone epoch
    # view (the as-of EXISTS/quantifier shape) — forced banded vs
    # DuckDB on both legs, NULL-bearing dates included
    import datetime as dt

    EV = [(i, dt.date(2024, 1 + (i * 7) % 12, 1 + (i * 13) % 28),
           (i * 37) % 90) for i in range(30)]
    PR = [(j, dt.date(2024, 1 + (j * 5) % 12, 1 + (j * 11) % 28),
           (j * 17) % 90) for j in range(12)] + [(99, None, 5)]
    eng.add_decls(
        "create table dev (eid int not null, d date, v int not null);"
        "create table dpr (pid int not null, cut date, x int not null);"
    )
    eng.register_df("dev", spark.createDataFrame(
        EV, "eid long, d date, v long"))
    eng.register_df("dpr", spark.createDataFrame(
        PR, "pid long, cut date, x long"))
    duck.execute("CREATE TABLE dev (eid BIGINT, d DATE, v BIGINT)")
    duck.executemany("INSERT INTO dev VALUES (?,?,?)", EV)
    duck.execute("CREATE TABLE dpr (pid BIGINT, cut DATE, x BIGINT)")
    duck.executemany("INSERT INTO dpr VALUES (?,?,?)", PR)
    spark.conf.set("spark.sqlpp.quantifier.bandedSubFloor", "1")
    spark.conf.set("spark.sqlpp.quantifier.bandedThreshold", "1")
    spark.conf.set("spark.sqlpp.quantifier.bandedBuckets", "8")
    try:
        for src in (
            "select p.pid as pid, (p.x > any (select e.v from dev as e "
            "where e.d < p.cut)) as f from dpr as p order by pid",
            "select p.pid as pid, (p.x <= all (select e.v from dev as e "
            "where e.d >= p.cut)) as f from dpr as p order by pid",
            "select p.pid as pid from dpr as p where exists ("
            "select 1 as one from dev as e where e.d <= p.cut) "
            "order by pid",
        ):
            _differ(eng, duck, src)
    finally:
        spark.conf.unset("spark.sqlpp.quantifier.bandedSubFloor")
        spark.conf.unset("spark.sqlpp.quantifier.bandedThreshold")
        spark.conf.unset("spark.sqlpp.quantifier.bandedBuckets")
