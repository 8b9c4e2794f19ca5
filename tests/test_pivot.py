"""PIVOT / UNPIVOT (r18, beyond reference — the reference grammar has
neither, parser.mly). Both desugar at ANALYZE time into the portable
dialect: PIVOT to grouped conditional aggregation (one hash aggregate
on Spark), UNPIVOT to ONE scan of the source cross-joined with a
constant generate_series spine + CASE dispatch (never the N-scan
UNION ALL melt). DuckDB runs the Spark-style PIVOT/UNPIVOT source
NATIVELY — so each query has three legs: engine, printed SQL, and the
original source as its own oracle."""

from __future__ import annotations

import duckdb
import pytest

from sqlpp_spark.compiler.sqlgen import select_sql
from sqlpp_spark.frontend.analyze import Analyzer
from sqlpp_spark.frontend.errors import SqlppError
from sqlpp_spark.frontend.parser import parse_query

SALES = [
    ("east", 2023, "a", 10),
    ("east", 2024, "a", 20),
    ("east", 2023, "b", 1),
    ("west", 2023, "a", 5),
    ("west", 2023, "a", 7),
    ("north", 2024, "b", None),
    ("north", 2025, "b", 9),
]


@pytest.fixture()
def eng(spark):
    from sqlpp_spark.engine import SqlppEngine

    eng = SqlppEngine(spark)
    eng.add_decls(
        "create table sales (region string not null, yr int not null, "
        "prod string not null, amt int);"
    )
    eng.register_df("sales", spark.createDataFrame(
        SALES, "region string, yr long, prod string, amt long"))
    return eng


@pytest.fixture()
def duck():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE sales (region VARCHAR, yr BIGINT, prod VARCHAR, "
        "amt BIGINT)"
    )
    con.executemany("INSERT INTO sales VALUES (?,?,?,?)", SALES)
    return con


def _differ(eng, duck, src):
    rows = sorted(tuple(repr(x) for x in r) for r in eng.fetch_list(src))
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    sql = select_sql(info)
    want = sorted(tuple(repr(x) for x in r) for r in duck.execute(sql).fetchall())
    want2 = sorted(tuple(repr(x) for x in r) for r in duck.execute(src).fetchall())
    assert rows == want == want2, f"{src}\n{sql}\n{rows}\n{want}\n{want2}"


PIVOT_SOURCES = (
    # sum over two years — implicit group keys = region, prod
    "select p.region as region, p.prod as prod, p.y23 as y23, "
    "p.y24 as y24 from sales pivot (sum(amt) for yr in "
    "(2023 as y23, 2024 as y24)) as p order by region, prod",
    # count: unmatched cells are 0, NULL amt not counted
    "select p.region as region, p.prod as prod, p.c23 as c23, "
    "p.c24 as c24 from sales pivot (count(amt) for yr in "
    "(2023 as c23, 2024 as c24)) as p order by region, prod",
    # min/max/avg cells
    "select p.region as region, p.prod as prod, p.m23 as m23 "
    "from sales pivot (max(amt) for yr in (2023 as m23)) as p "
    "order by region, prod",
    # string pivot keys
    "select p.region as region, p.yr as yr, p.pa as pa, p.pb as pb "
    "from sales pivot (sum(amt) for prod in ('a' as pa, 'b' as pb)) "
    "as p order by region, yr",
    # pivot over a derived table
    "select p.region as region, p.y23 as y23 from "
    "(select region, yr, amt from sales where amt > 4) as s "
    "pivot (sum(amt) for yr in (2023 as y23)) as p order by region",
    # expression aggregate argument
    "select p.region as region, p.prod as prod, p.v as v from sales "
    "pivot (sum(amt * 2) for yr in (2023 as v)) as p "
    "order by region, prod",
    # joined downstream like any derived table
    "select p.region as region, p.y23 + coalesce(p.y24, 0) as total "
    "from sales pivot (sum(amt) for yr in (2023 as y23, 2024 as y24)) "
    "as p where p.y23 is not null order by region",
)

UNPIVOT_SOURCES = (
    # default EXCLUDE NULLS
    "select u.region as region, u.k as k, u.v as v from "
    "(select region, count(1) as n_rows, sum(amt) as total from sales "
    "group by region) as s unpivot (v for k in (n_rows, total)) as u "
    "order by region, k",
    # INCLUDE NULLS keeps the NULL cells
    "select u.region as region, u.k as k, u.v as v from "
    "(select region, sum(amt) as total, min(amt) as lo from sales "
    "group by region) as s unpivot include nulls "
    "(v for k in (total, lo)) as u order by region, k",
    # custom labels
    "select u.k as k, count(1) as n from sales unpivot "
    "(v for k in (yr as 'year', amt as 'amount')) as u "
    "group by u.k order by k",
    # unpivot straight off a base table, kept columns survive
    "select u.region as region, u.prod as prod, u.k as k, u.v as v "
    "from sales unpivot (v for k in (yr, amt)) as u "
    "order by region, prod, k, v",
)


def test_pivot_differential(eng, duck):
    for src in PIVOT_SOURCES:
        _differ(eng, duck, src)


def test_unpivot_differential(eng, duck):
    for src in UNPIVOT_SOURCES:
        _differ(eng, duck, src)


def test_pivot_plan_single_aggregate(eng):
    """PIVOT compiles to ONE hash aggregate over ONE scan — the
    conditional-aggregation lowering, not a per-value scan."""
    import contextlib
    import io
    import re

    df = eng.query(
        "select p.region as region, p.y23 as y23, p.y24 as y24 "
        "from sales pivot (sum(amt) for yr in "
        "(2023 as y23, 2024 as y24)) as p"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    nodes = re.findall(r"^\s*\(\d+\) (\w+)", p, re.M)
    assert nodes.count("Scan") == 1, nodes
    # partial + final of the SAME aggregate
    assert nodes.count("HashAggregate") == 2, nodes


def test_unpivot_plan_single_scan(eng):
    """UNPIVOT reads the source ONCE (series+CASE lowering) — never
    one scan per unpivoted column."""
    import contextlib
    import io
    import re

    df = eng.query(
        "select u.region as region, u.k as k, u.v as v from sales "
        "unpivot (v for k in (yr, amt)) as u"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    nodes = re.findall(r"^\s*\(\d+\) (\w+)", p, re.M)
    assert nodes.count("Scan") == 1, nodes


def test_pivot_fmt_roundtrip(eng):
    from sqlpp_spark.frontend.printer import format_query

    for src in (PIVOT_SOURCES[0], UNPIVOT_SOURCES[1]):
        out = format_query(parse_query(src))
        rows1 = sorted(tuple(r) for r in eng.fetch_list(src))
        rows2 = sorted(tuple(r) for r in eng.fetch_list(out))
        assert rows1 == rows2


def test_pivot_inside_cte(eng, duck):
    # a plain CTE body referenced through a pivot source
    _differ(
        eng, duck,
        "with s as (select region, yr, amt from sales where amt > 4) "
        "select p.region as region, p.y23 as y23 from s "
        "pivot (sum(amt) for yr in (2023 as y23)) as p order by region",
    )


def test_pivot_errors(eng):
    for bad, m in (
        # not an aggregate
        ("select p.region as region from sales "
         "pivot (abs(amt) for yr in (2023 as x)) as p",
         "is not an aggregate"),
        # unknown pivot column
        ("select p.region as region from sales "
         "pivot (sum(amt) for nope in (1 as x)) as p",
         "not a column of the source"),
        # non-literal IN value
        ("select p.region as region from sales "
         "pivot (sum(amt) for yr in (yr + 1 as x)) as p",
         "non-NULL literals"),
        # duplicate output names
        ("select p.region as region from sales "
         "pivot (sum(amt) for yr in (2023 as x, 2024 as x)) as p",
         "duplicate PIVOT output"),
        # missing alias
        ("select region from sales "
         "pivot (sum(amt) for yr in (2023 as x))",
         "requires AS"),
        # unpivot: unknown column
        ("select u.v as v from sales unpivot (v for k in (nope)) as u",
         "not a column of the source"),
        # unpivot: value/name collision
        ("select u.v as v from sales unpivot (v for v in (amt)) as u",
         "must differ"),
        # unpivot: output collides with kept column
        ("select u.region as region from sales "
         "unpivot (region for k in (amt)) as u",
         "collides with a kept source column"),
        # unpivot: incompatible column types (yr int vs prod string)
        ("select u.v as v from sales unpivot (v for k in (yr, prod)) as u",
         ""),
    ):
        with pytest.raises(SqlppError, match=m):
            eng.fetch_list(bad)


def test_pivot_over_view_and_recursive_view(eng, duck):
    # PIVOT source can be a named view; the desugar resolves its row
    eng.add_decls(
        "create query bigsales as select region, yr, amt from sales "
        "where amt >= 5;"
    )
    src = ("select p.region as region, p.y23 as y23 from bigsales "
           "pivot (sum(amt) for yr in (2023 as y23)) as p "
           "order by region")
    rows = sorted(tuple(r) for r in eng.fetch_list(src))
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    want = sorted(tuple(r) for r in duck.execute(select_sql(info)).fetchall())
    assert rows == want and rows, rows
    # recursive view as unpivot source
    eng.add_decls(
        "create query spine as with recursive t (n, sq) as "
        "(select 1 as n, 1 as sq union all "
        "select t.n + 1 as n, (t.n + 1) * (t.n + 1) as sq from t "
        "where t.n < 3) select n, sq from t;"
    )
    src2 = ("select u.k as k, u.v as v from spine "
            "unpivot (v for k in (n, sq)) as u order by k, v")
    rows2 = sorted(tuple(r) for r in eng.fetch_list(src2))
    assert rows2 == [("n", 1), ("n", 2), ("n", 3),
                     ("sq", 1), ("sq", 4), ("sq", 9)], rows2


def test_pivot_then_unpivot_roundtrip(eng, duck):
    # chained suffixes: spread by year, then melt back — a
    # pivot/unpivot round-trip recovers the (region, label, value)
    # triples for non-NULL cells
    _differ(
        eng, duck,
        "select u.region as region, u.prod as prod, u.k as k, u.v as v "
        "from sales pivot (sum(amt) for yr in "
        "(2023 as y23, 2024 as y24)) as p "
        "unpivot (v for k in (y23, y24)) as u "
        "order by region, prod, k",
    )


def test_pivot_inside_lateral_body(eng, duck):
    # a PIVOT inside a correlated LATERAL body analyzes through the
    # body's own FROM analysis
    _differ(
        eng, duck,
        "select s.region as region, x.y23 as y23 from "
        "(select region from sales group by region) as s "
        "cross join lateral (select p.y23 as y23 from "
        "(select region, yr, amt from sales) as src "
        "pivot (sum(amt) for yr in (2023 as y23)) as p "
        "where p.region = s.region) as x order by region",
    )


def test_pivot_agg_arg_inlist_column_not_group_key(eng, duck):
    # r19 (ADVICE): a column referenced ONLY inside an IN-list of the
    # pivot aggregate argument ('a' in (prod) puts prod in
    # EInList.items, which the old expr/args-only walker missed) must
    # NOT stay in the implicit group keys — Spark's rule groups by
    # columns not referenced by the pivot clause, and DuckDB's native
    # PIVOT agrees. Pre-fix this grouped by prod too (extra rows).
    _differ(
        eng, duck,
        "select p.region as region, p.y23 as y23, p.y24 as y24 "
        "from sales pivot (sum(case when 'a' in (prod) then amt "
        "else 0 end) for yr in (2023 as y23, 2024 as y24)) as p "
        "order by region",
    )


def test_pivot_unnamed_boolean_value_column_names(eng, duck):
    # r19 (ADVICE): unnamed boolean IN values must synthesize
    # 'true'/'false' column names (SQL literal rendering), not
    # Python's 'True'/'False' — DuckDB's native PIVOT (probed) and
    # Spark both lowercase. The engine dialect has no quoted
    # identifiers, so the open select carries the synthesized names
    # through and the check is on the analyzed row + values against
    # DuckDB's native boolean PIVOT.
    src = (
        "select p.region as region from "
        "(select region as region, prod = 'a' as isa, amt as amt "
        "from sales) as s0 "
        "pivot (count(amt) for isa in (true, false)) as p "
        "order by region"
    )
    q = parse_query(src)
    Analyzer(eng.env, src).analyze_query(q)
    # the analyzer mutated FromPivot -> FromSelect in place; its
    # synthesized value-column names must be the SQL renderings
    import sqlpp_spark.frontend.ast as A

    fr = q.from_
    assert isinstance(fr, A.FromSelect)
    names = [f.name for f in fr.select.fields]
    assert names == ["region", "true", "false"], names
    # and the engine rows still agree with DuckDB's native boolean
    # PIVOT (values leg)
    rows = sorted(tuple(r) for r in eng.fetch_list(src))
    want = sorted(tuple(r) for r in duck.execute(
        "SELECT region FROM (SELECT region, prod = 'a' AS isa, amt "
        "FROM sales) PIVOT (count(amt) FOR isa IN (true, false)) "
        "ORDER BY region"
    ).fetchall())
    assert rows == want


def _wide(eng, duck, spark):
    WIDE = [(1, 10, 11, 20, 21), (2, 30, None, 40, 41),
            (3, None, None, 50, None)]
    eng.add_decls(
        "create table wide (id int not null, a1 int, b1 int, "
        "a2 int, b2 int);"
    )
    eng.register_df("wide", spark.createDataFrame(
        WIDE, "id long, a1 long, b1 long, a2 long, b2 long"))
    duck.execute(
        "CREATE TABLE wide (id BIGINT, a1 BIGINT, b1 BIGINT, "
        "a2 BIGINT, b2 BIGINT)"
    )
    duck.executemany("INSERT INTO wide VALUES (?,?,?,?,?)", WIDE)


def test_pivot_multi_aggregate_differential(eng, duck):
    # r19 (verdict task 3): several aggregates per PIVOT, AS-named;
    # output columns {value}_{aggname} (Spark/DuckDB convention,
    # probed) — DuckDB runs the identical multi-aggregate form
    # natively as the original-source oracle leg.
    _differ(
        eng, duck,
        "select p.region as region, p.prod as prod, "
        "p.y23_s as y23_s, p.y23_c as y23_c, p.y24_s as y24_s, "
        "p.y24_c as y24_c from sales "
        "pivot (sum(amt) as s, count(amt) as c "
        "for yr in (2023 as y23, 2024 as y24)) as p "
        "order by region, prod",
    )


def test_unpivot_multi_column_differential(eng, duck, spark):
    # r19: multi-column UNPIVOT groups; labeled and default
    # ('a1_b1'-style, probed DuckDB rule) names
    _wide(eng, duck, spark)
    for src in (
        "select u.id as id, u.k as k, u.a as a, u.b as b from wide "
        "unpivot ((a, b) for k in ((a1, b1) as 'one', "
        "(a2, b2) as 'two')) as u order by id, k",
        "select u.id as id, u.k as k, u.a as a, u.b as b from wide "
        "unpivot include nulls ((a, b) for k in ((a1, b1), "
        "(a2, b2))) as u order by id, k",
    ):
        _differ(eng, duck, src)


def test_unpivot_multi_exclude_nulls_any_rule(eng, duck, spark):
    # EXCLUDE NULLS (default) drops a row when ANY value column is
    # NULL — DuckDB's probed multi-column rule, pinned (Spark's
    # native UNPIVOT drops only all-NULL rows; the engine desugars,
    # so the pin holds on both differential legs)
    _wide(eng, duck, spark)
    rows = eng.fetch_list(
        "select u.id as id, u.k as k from wide "
        "unpivot ((a, b) for k in ((a1, b1) as 'one', "
        "(a2, b2) as 'two')) as u order by id, k"
    )
    assert [tuple(r) for r in rows] == [
        (1, "one"), (1, "two"), (2, "two"),
    ]


def test_pivot_dynamic_in_differential(eng, duck):
    # r19: IN list omitted — the engine discovers the values with ONE
    # bounded plan-time DISTINCT job (spark.sqlpp.pivot.maxValues
    # cap). Oracle: DuckDB's genuinely dynamic PIVOT-ON-USING
    # statement as a subquery.
    src = (
        "select p.region as region, p.prod as prod from sales "
        "pivot (sum(amt) for yr) as p order by region, prod"
    )
    # the engine-wired analyzer discovers the ascending value list
    # (2023..2025 in the fixture) and mutates the AST in place
    q = parse_query(src)
    eng._an(src).analyze_query(q)
    import sqlpp_spark.frontend.ast as A

    fr = q.from_
    assert isinstance(fr, A.FromSelect)
    assert [f.name for f in fr.select.fields] == [
        "region", "prod", "2023", "2024", "2025",
    ]
    # values: engine vs DuckDB's genuinely dynamic PIVOT-ON-USING
    got_proj = sorted(
        tuple(repr(x) for x in r) for r in eng.fetch_list(src)
    )
    want_proj = sorted(
        tuple(repr(x) for x in r) for r in duck.execute(
            "SELECT region, prod FROM "
            "(PIVOT sales ON yr USING sum(amt)) ORDER BY region, prod"
        ).fetchall()
    )
    assert got_proj == want_proj
    # printed-SQL leg: the prepared info carries the substituted
    # literal IN values, so the desugared SQL runs on DuckDB
    sql = select_sql(eng.prepare(src).info)
    want_printed = sorted(
        tuple(repr(x) for x in r) for r in duck.execute(sql).fetchall()
    )
    assert got_proj == want_printed


def test_pivot_dynamic_cap_and_frontend_errors(eng, spark):
    spark.conf.set("spark.sqlpp.pivot.maxValues", "2")
    try:
        with pytest.raises(SqlppError, match="more than 2 distinct"):
            eng.fetch_list(
                "select p.prod as prod from sales "
                "pivot (sum(amt) for yr) as p"
            )
    finally:
        spark.conf.unset("spark.sqlpp.pivot.maxValues")
    # pure-frontend analysis (no engine session) cannot discover
    with pytest.raises(SqlppError, match="requires an engine session"):
        Analyzer(eng.env, "x").analyze_query(parse_query(
            "select p.prod as prod from sales "
            "pivot (sum(amt) for yr) as p"
        ))


def test_pivot_multi_agg_and_unpivot_parse_errors(eng):
    with pytest.raises(SqlppError, match="requires AS names"):
        parse_query(
            "select p.region as region from sales "
            "pivot (sum(amt), count(amt) for yr in (2023 as a)) as p"
        )
    with pytest.raises(SqlppError, match="has 1 columns but"):
        parse_query(
            "select u.id as id from wide "
            "unpivot ((a, b) for k in (a1, (a2, b2))) as u"
        )


def test_pivot_new_forms_fmt_roundtrip(eng, duck, spark):
    from sqlpp_spark.frontend.printer import format_query

    _wide(eng, duck, spark)
    for src in (
        "select p.region as region, p.y23_s as y23_s from sales "
        "pivot (sum(amt) as s, count(amt) as c "
        "for yr in (2023 as y23)) as p order by region",
        "select u.id as id, u.k as k, u.a as a from wide "
        "unpivot ((a, b) for k in ((a1, b1) as 'one')) as u "
        "order by id",
        "select p.region as region from sales "
        "pivot (sum(amt) for yr) as p order by region",
    ):
        out = format_query(parse_query(src))
        rows1 = sorted(tuple(r) for r in eng.fetch_list(src))
        rows2 = sorted(tuple(r) for r in eng.fetch_list(out))
        assert rows1 == rows2, out
