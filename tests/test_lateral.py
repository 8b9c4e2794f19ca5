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
        # aggregated body -> use a scalar subquery
        ("select t1.id from t1 cross join lateral "
         "(select count(1) as n from t2 where t2.grp = t1.grp "
         "group by ()) as x", "aggregated LATERAL"),
        # LIMIT without ORDER BY
        ("select t1.id from t1 cross join lateral "
         "(select t2.amt from t2 where t2.grp = t1.grp limit 2) as x",
         "requires ORDER BY"),
        # LIMIT with theta correlation
        ("select t1.id from t1 cross join lateral "
         "(select t2.amt from t2 where t2.id < t1.id "
         "order by t2.amt limit 2) as x", "equality-only"),
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
