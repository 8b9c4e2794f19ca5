"""QUALIFY in the sqlpp dialect (r14, beyond reference): the
window-result filter — the production top-1-per-key dedup idiom.
The Spark side evaluates output fields, ORDER BY helpers and the
predicate in ONE select over the pre-filter frame, then filters
(r15 — mirrors the printed wrapped-subselect form, valid in all
three dialects); DuckDB's NATIVE QUALIFY on the original source is
the independent cross-check."""

from __future__ import annotations

import duckdb
import pytest

from sqlpp_spark.compiler.sqlgen import select_sql
from sqlpp_spark.frontend.analyze import Analyzer
from sqlpp_spark.frontend.errors import SqlppError
from sqlpp_spark.frontend.parser import parse_query
from sqlpp_spark.frontend.printer import format_query

T1 = [(1, 1, 10), (2, 1, 25), (3, 2, 30), (4, 3, 40), (5, 2, None), (6, 2, 30)]


@pytest.fixture()
def eng(spark):
    from sqlpp_spark.engine import SqlppEngine

    eng = SqlppEngine(spark)
    eng.add_decls("create table t1 (id int not null, grp int not null, val int);")
    eng.register_df("t1", spark.createDataFrame(T1, "id long, grp long, val long"))
    return eng


@pytest.fixture()
def duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE t1 (id BIGINT, grp BIGINT, val BIGINT)")
    con.executemany("INSERT INTO t1 VALUES (?,?,?)", T1)
    return con


def _differ(eng, duck, src):
    rows = sorted(tuple(repr(x) for x in r) for r in eng.fetch_list(src))
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    sql = select_sql(info)
    want = sorted(tuple(repr(x) for x in r) for r in duck.execute(sql).fetchall())
    want2 = sorted(tuple(repr(x) for x in r) for r in duck.execute(src).fetchall())
    assert rows == want == want2, f"{src}\n{sql}"


def test_qualify_differential(eng, duck):
    for src in (
        # THE idiom: newest row per group
        "select id, grp from t1 qualify row_number() over "
        "(partition by grp order by id desc) = 1 order by grp",
        # referencing an output alias inlines the window
        "select id, grp, row_number() over (partition by grp order by id) "
        "as rn from t1 qualify rn <= 2 order by grp, id",
        # composes with WHERE + ORDER BY + LIMIT
        "select id, val from t1 where val is not null qualify "
        "rank() over (order by val desc) <= 3 order by id limit 2",
        # grouped select: the window runs over the aggregated rows
        "select grp, count(id) as n from t1 group by grp qualify "
        "rank() over (order by count(id) desc) = 1 order by grp",
        # window aggregate predicate
        "select id, grp from t1 qualify sum(val) over (partition by grp) "
        "> 30 order by id",
        # explicit frame inside QUALIFY
        "select id, grp from t1 qualify avg(id) over (partition by grp "
        "order by id rows between 1 preceding and current row) >= id "
        "order by id",
    ):
        _differ(eng, duck, src)


def test_qualify_projection_windows_pre_filter(eng, duck):
    """r15 regression pin (ADVICE r14, high): projection/ORDER BY
    windows NOT implied by the QUALIFY predicate must evaluate over
    the PRE-QUALIFY row set (DuckDB native semantics). The r14 shape
    filtered first, silently re-numbering projection windows over the
    surviving rows — e.g. the first query below returned rev=2,1
    instead of rev=6,5."""
    for src in (
        # the exact r14-ADVICE repro: projection window over the
        # opposite order from the QUALIFY window
        "select id, row_number() over (order by id desc) as rev from t1 "
        "qualify row_number() over (order by id asc) <= 2 order by id",
        # projection window partitioned differently from the filter
        "select id, grp, count(id) over (partition by grp) as grp_n "
        "from t1 qualify row_number() over (order by id) <= 3 "
        "order by id",
        # window in ORDER BY only — must also see pre-filter rows
        "select id, grp from t1 qualify row_number() over "
        "(partition by grp order by id) = 1 "
        "order by sum(id) over (partition by grp) desc, id",
        # grouped select: projection window over ALL groups, filter
        # keeps one
        "select grp, count(id) as n, rank() over (order by grp) as g_rank "
        "from t1 group by grp qualify "
        "rank() over (order by count(id) desc) = 1 order by grp",
        # same window fn, different args — no accidental sharing
        "select id, lag(id) over (order by id) as prev from t1 "
        "qualify lag(id, 2) over (order by id) is not null order by id",
    ):
        _differ(eng, duck, src)


def test_qualify_sqlite_postgres_printers(eng):
    """The wrapped form prints in every dialect (no native QUALIFY
    needed downstream)."""
    src = ("select id, grp from t1 qualify row_number() over "
           "(partition by grp order by id desc) = 1 order by grp")
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    for dialect in ("duckdb", "postgres", "sqlite"):
        sql = select_sql(info, dialect=dialect)
        assert '"__qual"' in sql and "row_number() OVER" in sql


def test_qualify_errors(eng):
    for bad, m in (
        ("select id from t1 qualify val > 10",
         "requires a window function"),
        ("select id from t1 qualify id", "expected BOOL"),
    ):
        with pytest.raises(SqlppError, match=m):
            eng.fetch_list(bad)


def test_qualify_distinct(eng, duck):
    """r15: DISTINCT composes with QUALIFY — DuckDB's logical order
    WINDOW -> QUALIFY -> DISTINCT -> ORDER BY (was a hard error
    through r14). Differential incl. the shape where skipping the
    dedup or filtering after it would change the rows."""
    for src in (
        # duplicates collapse only AFTER the filter keeps per-group
        # winners
        "select distinct grp from t1 qualify "
        "row_number() over (partition by grp order by id) >= 1 "
        "order by grp",
        # projection window makes rows distinct pre-dedup; the filter
        # works on pre-distinct rows
        "select distinct grp, row_number() over (partition by grp "
        "order by id) as rn from t1 qualify rn <= 2 order by grp, rn",
        # window not in the projection: dedup happens on (id) alone
        "select distinct grp from t1 "
        "qualify sum(val) over (partition by grp) > 30 order by grp",
        # with WHERE + LIMIT
        "select distinct grp from t1 where id > 1 qualify "
        "count(1) over (partition by grp) >= 1 order by grp desc limit 2",
    ):
        _differ(eng, duck, src)


def test_qualify_fmt_roundtrip():
    for src in (
        "select id from t qualify row_number() over (order by id) = 1",
        "select id, g from t where id > 0 qualify rank() over "
        "(partition by g order by id) <= 2 order by id limit 5",
    ):
        once = format_query(parse_query(src))
        again = format_query(parse_query(once))
        assert once == again
