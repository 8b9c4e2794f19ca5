"""JOIN LATERAL (r17, beyond reference — PG/DuckDB lateral derived
tables; the reference grammar has plain FROM/JOIN only, parser.mly).

The body's outer references lift through the same correlation
machinery as subqueries (_lift_correlated); the compiler decorrelates
to a hash join — and an ORDER BY + LIMIT body becomes a pre-windowed
top-k per equality key, the classic "top-k rows per outer row" shape,
compiled as ONE window + ONE equi-join rather than a per-row rescan.
DuckDB runs both the printed SQL and the original source natively —
two independent oracles per query."""

from __future__ import annotations

import duckdb
import pytest

from sqlpp_spark.compiler.sqlgen import select_sql
from sqlpp_spark.frontend.analyze import Analyzer
from sqlpp_spark.frontend.errors import SqlppError
from sqlpp_spark.frontend.parser import parse_query

T1 = [(1, 1, 10), (2, 1, 25), (3, 2, 30), (4, 3, 40), (5, 2, None)]
T2 = [(1, 1, 100), (3, 2, 300), (6, 2, 600), (7, 2, 50), (8, 1, 75),
      (9, 1, 75), (10, 9, None)]


@pytest.fixture()
def eng(spark):
    from sqlpp_spark.engine import SqlppEngine

    eng = SqlppEngine(spark)
    eng.add_decls(
        "create table t1 (id int not null, grp int not null, val int);"
        "create table t2 (id int not null, grp int not null, amt int);"
    )
    eng.register_df("t1", spark.createDataFrame(T1, "id long, grp long, val long"))
    eng.register_df("t2", spark.createDataFrame(T2, "id long, grp long, amt long"))
    return eng


@pytest.fixture()
def duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE t1 (id BIGINT, grp BIGINT, val BIGINT)")
    con.executemany("INSERT INTO t1 VALUES (?,?,?)", T1)
    con.execute("CREATE TABLE t2 (id BIGINT, grp BIGINT, amt BIGINT)")
    con.executemany("INSERT INTO t2 VALUES (?,?,?)", T2)
    return con


def _differ(eng, duck, src):
    rows = sorted(tuple(repr(x) for x in r) for r in eng.fetch_list(src))
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    sql = select_sql(info)
    want = sorted(tuple(repr(x) for x in r) for r in duck.execute(sql).fetchall())
    want2 = sorted(tuple(repr(x) for x in r) for r in duck.execute(src).fetchall())
    assert rows == want == want2, f"{src}\n{sql}\n{rows}\n{want}\n{want2}"


DIFF_SOURCES = (
    # cross lateral, equality correlation
    "select t1.id as oid, x.amt as amt from t1 cross join lateral "
    "(select t2.amt from t2 where t2.grp = t1.grp) as x "
    "order by oid, amt",
    # left lateral ON TRUE: outer rows without matches survive
    "select t1.id as oid, x.amt as amt from t1 left join lateral "
    "(select t2.amt from t2 where t2.grp = t1.grp) as x on true "
    "order by oid, amt",
    # top-2 per outer row (the flagship shape) with a tie-broken key
    "select t1.id as oid, x.amt as amt, x.tid as tid from t1 "
    "left join lateral (select t2.amt, t2.id as tid from t2 "
    "where t2.grp = t1.grp order by t2.amt desc, t2.id limit 2) as x "
    "on true order by oid, amt, tid",
    # LIMIT + OFFSET (second-and-third best)
    "select t1.id as oid, x.tid as tid from t1 cross join lateral "
    "(select t2.id as tid from t2 where t2.grp = t1.grp "
    "order by t2.amt desc, t2.id limit 2 offset 1) as x "
    "order by oid, tid",
    # theta correlation (genuine per-row inequality set)
    "select t1.id as oid, x.amt as amt from t1 cross join lateral "
    "(select t2.amt from t2 where t2.id < t1.id) as x "
    "order by oid, amt",
    # mixed equality + theta
    "select t1.id as oid, x.tid as tid from t1 cross join lateral "
    "(select t2.id as tid from t2 where t2.grp = t1.grp "
    "and t2.id > t1.id) as x order by oid, tid",
    # inner JOIN LATERAL with a real ON condition (filters pairs)
    "select t1.id as oid, x.tid as tid from t1 join lateral "
    "(select t2.id as tid, t2.amt from t2 where t2.grp = t1.grp) as x "
    "on x.amt > t1.val order by oid, tid",
    # uncorrelated lateral degenerates to a plain derived-table join
    "select t1.id as oid, x.tid as tid from t1 cross join lateral "
    "(select t2.id as tid from t2 where t2.amt > 100) as x "
    "order by oid, tid",
    # uncorrelated lateral with global top-k
    "select t1.id as oid, x.tid as tid from t1 cross join lateral "
    "(select t2.id as tid from t2 order by t2.amt desc, t2.id "
    "limit 2) as x order by oid, tid",
    # lateral body over a NULL-bearing value column
    "select t1.id as oid, x.amt as amt from t1 left join lateral "
    "(select t2.amt from t2 where t2.grp = t1.id) as x on true "
    "order by oid, amt",
    # chained: lateral after a regular join
    "select t1.id as oid, t2.id as mid, x.tid as tid from t1 "
    "join t2 on t2.grp = t1.grp cross join lateral "
    "(select y.id as tid from t2 as y where y.id > t2.id) as x "
    "order by oid, mid, tid",
)


def test_lateral_differential(eng, duck):
    for src in DIFF_SOURCES:
        _differ(eng, duck, src)


def test_lateral_fmt_roundtrip(eng):
    from sqlpp_spark.frontend.printer import format_query

    src = ("select t1.id as oid, x.amt as amt from t1 "
           "left join lateral (select t2.amt from t2 "
           "where t2.grp = t1.grp order by t2.amt desc, t2.id "
           "limit 2) as x on true order by oid, amt")
    out = format_query(parse_query(src))
    assert "lateral (" in out
    rows1 = sorted(tuple(r) for r in eng.fetch_list(src))
    rows2 = sorted(tuple(r) for r in eng.fetch_list(out))
    assert rows1 == rows2


def test_lateral_topk_plan_is_window_plus_equijoin(eng):
    """The decorrelated top-k-per-key lateral must compile to ONE
    window (row_number per correlation key) + a hash equi-join —
    no nested loop, no per-outer-row rescan."""
    import contextlib
    import io
    import re

    df = eng.query(
        "select t1.id as oid, x.amt as amt from t1 left join lateral "
        "(select t2.amt from t2 where t2.grp = t1.grp "
        "order by t2.amt desc, t2.id limit 2) as x on true"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "CartesianProduct" not in p, p
    nodes = re.findall(r"^\s*\(\d+\) (\w+)", p, re.M)
    assert nodes.count("Window") == 1, nodes
    # Spark's rank-limit pushdown caps each partition map-side
    assert "WindowGroupLimit" in p, p


def test_lateral_errors(eng):
    for bad, m in (
        # RIGHT/FULL lateral cannot preserve the lateral side
        ("select t1.id from t1 right join lateral "
         "(select t2.amt from t2 where t2.grp = t1.grp) as x on true",
         "RIGHT JOIN LATERAL"),
        ("select t1.id from t1 full join lateral "
         "(select t2.amt from t2 where t2.grp = t1.grp) as x on true",
         "FULL JOIN LATERAL"),
        # compound body
        ("select t1.id from t1 cross join lateral "
         "(select t2.amt from t2 union all select t2.amt from t2) as x",
         "plain SELECT body"),
        # LIMIT without ORDER BY
        ("select t1.id from t1 cross join lateral "
         "(select t2.amt from t2 where t2.grp = t1.grp limit 2) as x",
         "requires ORDER BY"),
        # LIMIT with two theta correlations
        ("select t1.id from t1 cross join lateral "
         "(select t2.amt from t2 where t2.id < t1.id "
         "and t2.grp > t1.grp order by t2.amt limit 2) as x",
         "at most one ordered"),
        # ORDER BY without LIMIT
        ("select t1.id from t1 cross join lateral "
         "(select t2.amt from t2 where t2.grp = t1.grp "
         "order by t2.amt) as x", "no effect without LIMIT"),
        # DISTINCT + LIMIT
        ("select t1.id from t1 cross join lateral "
         "(select distinct t2.amt from t2 where t2.grp = t1.grp "
         "order by t2.amt limit 2) as x", "DISTINCT with LIMIT"),
        # window function in the body
        ("select t1.id from t1 cross join lateral "
         "(select row_number() over (order by t2.id) as rn from t2 "
         "where t2.grp = t1.grp) as x", "not allowed in a LATERAL"),
        # lateral on a bare table
        ("select t1.id from t1 cross join lateral t2",
         "parenthesized SELECT"),
        # the keyword stays contextual: a table named lateral works
        # (covered by not erroring on plain derived tables below)
    ):
        with pytest.raises(SqlppError, match=m):
            eng.fetch_list(bad)


def test_lateral_dialect_printing(eng):
    # DuckDB/PG print the native LATERAL form; SQLite has no LATERAL
    # (nor FROM-clause correlation) — backend-divergence error
    src = ("select t1.id as oid, x.amt as amt from t1 cross join "
           "lateral (select t2.amt from t2 where t2.grp = t1.grp) as x")
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    for dialect in ("duckdb", "postgres"):
        sql = select_sql(info, dialect=dialect)
        assert "LATERAL (" in sql
    with pytest.raises(SqlppError, match="backend divergence"):
        select_sql(info, dialect="sqlite")


DISTINCT_SOURCES = (
    # the r17 advisor repro: DISTINCT under a THETA correlation must
    # dedup PER OUTER ROW — t2 has amt=75 under two different grp
    # values (ids 8, 9), so a global (fields + key) distinct would
    # return 75 twice for an outer row whose grp exceeds both
    "select t1.id as oid, x.amt as amt from t1 cross join lateral "
    "(select distinct t2.amt from t2 where t2.grp < t1.grp) as x "
    "order by oid, amt",
    # LEFT variant: unmatched outer rows keep their single NULL row
    "select t1.id as oid, x.amt as amt from t1 left join lateral "
    "(select distinct t2.amt from t2 where t2.grp > t1.grp) as x "
    "on true order by oid, amt",
    # theta on a different column, NULL amt in range (id=10, amt NULL)
    "select t1.id as oid, x.amt as amt from t1 cross join lateral "
    "(select distinct t2.amt from t2 where t2.id > t1.id) as x "
    "order by oid, amt",
    # mixed equality + theta correlation
    "select t1.id as oid, x.amt as amt from t1 cross join lateral "
    "(select distinct t2.amt from t2 where t2.grp = t1.grp "
    "and t2.id != t1.id) as x order by oid, amt",
    # equality-only DISTINCT (the already-correct fast path: global
    # key-distinct == per-probe distinct; no row-id dedup exchange)
    "select t1.id as oid, x.amt as amt from t1 cross join lateral "
    "(select distinct t2.amt from t2 where t2.grp = t1.grp) as x "
    "order by oid, amt",
    # uncorrelated DISTINCT body
    "select t1.id as oid, x.amt as amt from t1 cross join lateral "
    "(select distinct t2.amt from t2) as x order by oid, amt",
    # two-column DISTINCT body under theta
    "select t1.id as oid, x.g as g, x.amt as amt from t1 "
    "cross join lateral (select distinct t2.grp as g, t2.amt from t2 "
    "where t2.id < t1.id) as x order by oid, g, amt",
)


def test_lateral_distinct_per_probe(eng, duck):
    """r17 advisor (high): DISTINCT in a LATERAL body is per outer
    row. The theta-correlated cases take the row-id + full-row
    distinct lowering; equality-only and uncorrelated bodies keep
    the cheaper global distinct."""
    for src in DISTINCT_SOURCES:
        _differ(eng, duck, src)


def test_lateral_distinct_duplicate_outer_rows(eng, duck, spark):
    """Two IDENTICAL outer rows must EACH keep their deduped match
    set (the row-id exists precisely so full-row distinct does not
    collapse duplicate outer rows)."""
    spark_df = spark.createDataFrame(
        [(1, 2, 10), (1, 2, 10), (2, 9, 20)], "id long, grp long, val long"
    )
    eng.register_df("t1", spark_df)
    duck.execute("DELETE FROM t1")
    duck.executemany(
        "INSERT INTO t1 VALUES (?,?,?)",
        [(1, 2, 10), (1, 2, 10), (2, 9, 20)],
    )
    _differ(
        eng, duck,
        "select t1.id as oid, x.amt as amt from t1 cross join lateral "
        "(select distinct t2.amt from t2 where t2.grp < t1.grp) as x "
        "order by oid, amt",
    )


AGG_SOURCES = (
    # the canonical shape (r17 verdict task 3): global count per
    # outer row — empty groups complete to 0, every outer row kept
    "select t1.id as oid, x.n as n from t1 cross join lateral "
    "(select count(1) as n from t2 where t2.grp = t1.grp "
    "group by ()) as x order by oid",
    # arbitrary expressions over aggregates (count completion must
    # flow through the expression)
    "select t1.id as oid, x.v as v from t1 cross join lateral "
    "(select count(t2.amt) * 2 + 1 as v from t2 where t2.grp = t1.grp "
    "group by ()) as x order by oid",
    # NULL outer key owns its empty-group row (null-safe final join)
    "select t1.id as oid, x.n as n from t1 cross join lateral "
    "(select count(1) as n from t2 where t2.amt = t1.val "
    "group by ()) as x order by oid",
    # LEFT JOIN LATERAL with a real (two-sided) ON condition: the
    # body row exists per outer row; ON false NULLs it (count NULL,
    # not 0) — DuckDB requires non-inner lateral ONs to reference
    # both sides (probed binder rule)
    "select t1.id as oid, x.n as n from t1 left join lateral "
    "(select count(1) as n from t2 where t2.grp = t1.grp "
    "group by ()) as x on x.n < t1.val order by oid",
    # HAVING evaluates on the COMPLETED row: count(1) = 0 keeps
    # exactly the outer rows with NO matches (and drops the rest
    # under CROSS semantics)
    "select t1.id as oid, x.n as n from t1 cross join lateral "
    "(select count(1) as n from t2 where t2.grp = t1.grp group by () "
    "having count(1) = 0) as x order by oid",
    # ... and under LEFT semantics the dropped rows come back as NULL
    "select t1.id as oid, x.n as n from t1 left join lateral "
    "(select count(1) as n from t2 where t2.grp = t1.grp group by () "
    "having count(1) >= 2) as x on true order by oid",
    # KEYED groups: per-outer aggregation by a body expression;
    # empty groups legitimately vanish
    "select t1.id as oid, x.big as big, x.n as n from t1 "
    "cross join lateral (select t2.amt >= 100 as big, count(1) as n "
    "from t2 where t2.grp = t1.grp group by t2.amt >= 100) as x "
    "order by oid, big",
    # keyed groups + HAVING + LEFT
    "select t1.id as oid, x.g as g from t1 left join lateral "
    "(select t2.id % 3 as g from t2 where t2.grp = t1.grp "
    "group by t2.id % 3 having count(1) >= 2) as x on true "
    "order by oid, g",
    # residual (non-correlated) WHERE conjunct stays inside the body
    "select t1.id as oid, x.n as n from t1 cross join lateral "
    "(select count(1) as n from t2 where t2.grp = t1.grp "
    "and t2.amt > 60 group by ()) as x order by oid",
    # two equality correlations
    "select t1.id as oid, x.n as n from t1 cross join lateral "
    "(select count(1) as n from t2 where t2.grp = t1.grp "
    "and t2.id = t1.id group by ()) as x order by oid",
    # uncorrelated global aggregate: one row against every outer row
    "select t1.id as oid, x.n as n from t1 cross join lateral "
    "(select count(1) as n from t2 group by ()) as x order by oid",
    # uncorrelated global aggregate over an EMPTY input still yields
    # its one row (count = 0)
    "select t1.id as oid, x.n as n from t1 cross join lateral "
    "(select count(1) as n from t2 where t2.amt > 9999 "
    "group by ()) as x order by oid",
    # chained: second aggregated lateral correlates on the FIRST
    # lateral's output column
    "select t1.id as oid, x.n as n, y.c2 as c2 from t1 "
    "cross join lateral (select count(1) as n from t2 "
    "where t2.grp = t1.grp group by ()) as x "
    "cross join lateral (select count(1) as c2 from t2 "
    "where t2.id = x.n group by ()) as y order by oid",
    # aggregated lateral AFTER a plain lateral
    "select t1.id as oid, p.tid as tid, q.n as n from t1 "
    "cross join lateral (select t2.id as tid from t2 "
    "where t2.grp = t1.grp) as p "
    "cross join lateral (select count(1) as n from t2 "
    "where t2.grp = p.tid group by ()) as q order by oid, tid",
    # body with a residual IN-subquery conjunct
    "select t1.id as oid, x.n as n from t1 cross join lateral "
    "(select count(1) as n from t2 where t2.grp = t1.grp "
    "and t2.id in (select t2b.id from t2 as t2b where t2b.amt > 70) "
    "group by ()) as x order by oid",
)

# pure-non-count global bodies: DuckDB drops the empty-group row when
# the body projects no count (probed divergence — the duckdb PRINTER
# injects a dummy count(*) to trigger completion, so the printed-SQL
# leg agrees; the ORIGINAL source cannot run as its own oracle)
AGG_PRINTED_ONLY_SOURCES = (
    "select t1.id as oid, x.s as s, x.m as m from t1 cross join lateral "
    "(select sum(t2.amt) as s, max(t2.amt) as m from t2 "
    "where t2.grp = t1.grp group by ()) as x order by oid",
    "select t1.id as oid, x.lo as lo, x.av as av from t1 "
    "left join lateral (select min(t2.amt + 1) as lo, avg(t2.amt) as av "
    "from t2 where t2.grp = t1.grp group by ()) as x on true "
    "order by oid",
)


def _differ_printed(eng, duck, src):
    rows = sorted(tuple(repr(x) for x in r) for r in eng.fetch_list(src))
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    sql = select_sql(info)
    want = sorted(tuple(repr(x) for x in r) for r in duck.execute(sql).fetchall())
    assert rows == want, f"{src}\n{sql}\n{rows}\n{want}"


def test_lateral_aggregated_differential(eng, duck):
    """r18 (r17 verdict task 3): aggregated LATERAL bodies lower to
    ONE hash aggregate on (correlation keys + group keys) + an
    equi-join — the same shape correlated scalar subqueries use —
    with SQL's one-row-per-outer-row completion for global bodies."""
    for src in AGG_SOURCES:
        _differ(eng, duck, src)
    for src in AGG_PRINTED_ONLY_SOURCES:
        _differ_printed(eng, duck, src)


def test_lateral_aggregated_plan_no_nested_loop(eng):
    """The aggregated lateral must compile to hash aggregate +
    equi-join(s) — never a nested loop or cartesian product."""
    import contextlib
    import io

    df = eng.query(
        "select t1.id as oid, x.n as n from t1 cross join lateral "
        "(select count(1) as n from t2 where t2.grp = t1.grp "
        "group by ()) as x"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "CartesianProduct" not in p, p
    assert "HashAggregate" in p, p


def test_lateral_aggregated_errors(eng):
    for bad, m in (
        # theta correlation + aggregation -> scalar subquery territory
        ("select t1.id from t1 cross join lateral "
         "(select count(1) as n from t2 where t2.grp < t1.grp "
         "group by ()) as x", "equality-only"),
        # LIMIT on an aggregated body
        ("select t1.id from t1 cross join lateral "
         "(select t2.grp as g, count(1) as n from t2 "
         "where t2.grp = t1.grp group by t2.grp "
         "order by n desc limit 1) as x", "LIMIT/OFFSET in an aggregated"),
        # DISTINCT on an aggregated body
        ("select t1.id from t1 cross join lateral "
         "(select distinct count(1) as n from t2 "
         "where t2.grp = t1.grp group by ()) as x",
         "DISTINCT in an aggregated"),
    ):
        with pytest.raises(SqlppError, match=m):
            eng.fetch_list(bad)


def test_lateral_agg_left_outer_only_on(eng, duck):
    """LEFT JOIN LATERAL (global agg) ON <outer-only condition> —
    valid PG and supported by the engine, but DuckDB's binder rejects
    outer-only non-inner lateral ONs, so the oracle here is a
    HAND-WRITTEN decorrelated DuckDB query and the duckdb printer
    raises a backend-divergence error."""
    src = ("select t1.id as oid, x.n as n from t1 left join lateral "
           "(select count(1) as n from t2 where t2.grp = t1.grp "
           "group by ()) as x on t1.val > 20 order by oid")
    rows = sorted(tuple(r) for r in eng.fetch_list(src))
    want = sorted(tuple(r) for r in duck.execute(
        "SELECT t1.id AS oid, "
        "CASE WHEN t1.val > 20 THEN coalesce(m.n, 0) END AS n "
        "FROM t1 LEFT JOIN (SELECT grp, count(1) AS n FROM t2 GROUP BY grp) m "
        "ON m.grp = t1.grp ORDER BY t1.id"
    ).fetchall())
    assert rows == want, f"{rows}\n{want}"
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    with pytest.raises(SqlppError, match="backend divergence"):
        select_sql(info)
    # the postgres dialect prints the standard form
    assert "LEFT JOIN LATERAL" in select_sql(info, dialect="postgres")


def test_lateral_agg_duckdb_completion_injection(eng):
    """Pure-non-count global bodies get a dummy count(*) injected in
    the DuckDB print (the probed completion trigger); count-bearing
    bodies print unmodified."""
    src = ("select t1.id as oid, x.s as s from t1 cross join lateral "
           "(select sum(t2.amt) as s from t2 where t2.grp = t1.grp "
           "group by ()) as x order by oid")
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    assert "__sqlpp_comp" in select_sql(info)
    assert "__sqlpp_comp" not in select_sql(info, dialect="postgres")
    src2 = ("select t1.id as oid, x.n as n from t1 cross join lateral "
            "(select count(1) as n from t2 where t2.grp = t1.grp "
            "group by ()) as x order by oid")
    info2 = Analyzer(eng.env, src2).analyze_query(parse_query(src2))
    assert "__sqlpp_comp" not in select_sql(info2)


def test_duckdb_outer_only_on_guard_is_structural(eng):
    # r19 (ADVICE): the DuckDB non-inner LATERAL ON divergence guard
    # must decide structurally (ERef walk), not by substring-matching
    # the printed SQL — an alias text occurring inside a string
    # literal used to suppress the divergence error, and the query
    # then failed with a raw DuckDB binder error downstream.
    src = (
        "select t1.id as oid, x.n as n from t1 left join lateral "
        "(select count(1) as n from t2 where t2.grp = t1.grp "
        "group by ()) as x "
        "on t1.val < 10 or '\"x\".n' = 'q' order by oid"
    )
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    with pytest.raises(SqlppError, match="backend divergence"):
        select_sql(info)


def test_duckdb_two_sided_on_with_alias_text_in_literal(eng, duck):
    # the inverse: a genuinely two-sided ON containing the alias text
    # in a literal must still print and match
    _differ(
        eng, duck,
        "select t1.id as oid, x.n as n from t1 left join lateral "
        "(select count(1) as n from t2 where t2.grp = t1.grp "
        "group by ()) as x "
        "on x.n < t1.val and 'x.' = 'x.' order by oid",
    )


THETA_TOPK_SOURCES = (
    # r19 (r18 verdict task 2): theta-correlated LATERAL top-k — the
    # last LATERAL shape a PG/DuckDB user could write that the engine
    # rejected. ORDER BY carries a unique tiebreaker (t2.id) so the
    # three legs compare deterministically.
    # op <, CROSS; NULL outer probe drops its rows, NULL sub key
    # never matches
    "select t1.id as oid, x.sid as sid from t1 cross join lateral "
    "(select t2.id as sid from t2 where t2.amt < t1.val "
    "order by t2.amt desc, t2.id asc limit 2) as x order by oid, sid",
    # op <=, LEFT ON true; NULL probes kept with NULL body side
    "select t1.id as oid, x.sid as sid from t1 left join lateral "
    "(select t2.id as sid from t2 where t2.grp <= t1.grp "
    "order by t2.grp asc, t2.id asc limit 3) as x on true "
    "order by oid, sid",
    # op >, OFFSET under LIMIT
    "select t1.id as oid, x.sid as sid from t1 cross join lateral "
    "(select t2.id as sid from t2 where t2.amt > t1.val "
    "order by t2.amt asc, t2.id asc limit 2 offset 1) as x "
    "order by oid, sid",
    # op >=, residual (non-correlated) WHERE conjunct stays in body
    "select t1.id as oid, x.sid as sid from t1 cross join lateral "
    "(select t2.id as sid from t2 where t2.grp >= t1.grp "
    "and t2.amt > 60 order by t2.amt desc, t2.id asc limit 2) as x "
    "order by oid, sid",
    # LEFT with a real two-sided ON condition
    "select t1.id as oid, x.sid as sid from t1 left join lateral "
    "(select t2.id as sid from t2 where t2.amt < t1.val "
    "order by t2.amt desc, t2.id asc limit 2) as x "
    "on x.sid < t1.id + 6 order by oid, sid",
    # projected expression fields + order on a non-projected column
    "select t1.id as oid, x.v as v from t1 cross join lateral "
    "(select t2.amt * 2 as v from t2 where t2.amt < t1.val "
    "order by t2.id asc limit 2) as x order by oid, v",
    # r19: MIXED equality + theta — the per-entity as-of shape
    # ("top-k of THIS group's rows below the outer value")
    "select t1.id as oid, x.sid as sid from t1 cross join lateral "
    "(select t2.id as sid from t2 where t2.grp = t1.grp "
    "and t2.amt < t1.val order by t2.amt desc, t2.id asc limit 2) "
    "as x order by oid, sid",
    # mixed, LEFT ON true: outer rows without matches survive with
    # NULLs (incl. NULL eq key / NULL theta probe)
    "select t1.id as oid, x.sid as sid from t1 left join lateral "
    "(select t2.id as sid from t2 where t2.grp = t1.grp "
    "and t2.amt >= t1.val order by t2.amt asc, t2.id asc "
    "limit 1) as x on true order by oid, sid",
    # mixed with offset and an expression equality key
    "select t1.id as oid, x.sid as sid from t1 cross join lateral "
    "(select t2.id as sid from t2 where t2.grp + 1 = t1.grp + 1 "
    "and t2.amt > t1.val order by t2.amt asc, t2.id asc "
    "limit 2 offset 1) as x order by oid, sid",
)


def test_lateral_theta_topk_differential(eng, duck):
    for src in THETA_TOPK_SOURCES:
        _differ(eng, duck, src)


def test_lateral_theta_topk_differential_forced_banded(eng, duck, spark):
    # strategy-FORCED: small fixtures never trip the auto-switch, so
    # pin value-identity of the banded lowering itself (engine
    # divergences memo rule)
    spark.conf.set("spark.sqlpp.lateral.bandedThreshold", "1")
    spark.conf.set("spark.sqlpp.lateral.bandedSubFloor", "1")
    spark.conf.set("spark.sqlpp.lateral.bandedBuckets", "8")
    try:
        for src in THETA_TOPK_SOURCES:
            _differ(eng, duck, src)
    finally:
        spark.conf.unset("spark.sqlpp.lateral.bandedThreshold")
        spark.conf.unset("spark.sqlpp.lateral.bandedSubFloor")
        spark.conf.unset("spark.sqlpp.lateral.bandedBuckets")


def test_lateral_theta_topk_asof_dates(eng, duck, spark):
    # r19: the as-of-join shape — DATE theta keys band through a
    # monotone epoch view (bucketing only needs a monotone numeric
    # view; the residual theta compares the original values). Run
    # auto (nested loop at this size) AND forced banded.
    import datetime as dt

    EV = [(i, dt.date(2024, 1 + (i * 7) % 12, 1 + (i * 13) % 28), i * 10)
          for i in range(40)]
    AS_OF = [(j, dt.date(2024, 1 + (j * 5) % 12, 1 + (j * 11) % 28))
             for j in range(15)]
    eng.add_decls(
        "create table ev (eid int not null, d date not null, "
        "v int not null);"
        "create table probes (pid int not null, cut date not null);"
    )
    eng.register_df("ev", spark.createDataFrame(
        EV, "eid long, d date, v long"))
    eng.register_df("probes", spark.createDataFrame(
        AS_OF, "pid long, cut date"))
    duck.execute("CREATE TABLE ev (eid BIGINT, d DATE, v BIGINT)")
    duck.executemany("INSERT INTO ev VALUES (?,?,?)", EV)
    duck.execute("CREATE TABLE probes (pid BIGINT, cut DATE)")
    duck.executemany("INSERT INTO probes VALUES (?,?)", AS_OF)
    src = (
        "select p.pid as pid, x.eid as eid from probes as p "
        "left join lateral (select e.eid as eid from ev as e "
        "where e.d < p.cut order by e.d desc, e.eid asc limit 1) as x "
        "on true order by pid, eid"
    )
    _differ(eng, duck, src)
    spark.conf.set("spark.sqlpp.lateral.bandedThreshold", "1")
    spark.conf.set("spark.sqlpp.lateral.bandedSubFloor", "1")
    try:
        _differ(eng, duck, src)
    finally:
        spark.conf.unset("spark.sqlpp.lateral.bandedThreshold")
        spark.conf.unset("spark.sqlpp.lateral.bandedSubFloor")
