"""GROUP BY ALL and ORDER BY ALL (r15 third wave, beyond reference —
DuckDB's determinism sugar, also in Spark SQL ≥3.4 for GROUP BY ALL).

GROUP BY ALL groups by every projection expression containing no
aggregate (all-aggregate projections degrade to GROUP BY ()); ORDER BY
ALL [DESC] sorts by every output column left-to-right. Both desugar in
the ANALYZER against the resolved projection — the compiler and SQL
printers see ordinary GROUP BY / ORDER BY, and the ordinal machinery
guarantees the keys hash-cons with their projection twins. The source
text is DuckDB-native, so the original-source differential applies
with ORDER preserVED (not sorted-row compare)."""

from __future__ import annotations

import duckdb
import pytest

from sqlpp_spark.compiler.sqlgen import select_sql
from sqlpp_spark.frontend.analyze import Analyzer
from sqlpp_spark.frontend.errors import SqlppError
from sqlpp_spark.frontend.parser import parse_query
from sqlpp_spark.frontend.printer import format_query

T1 = [(1, 1, 5), (2, 1, 7), (3, 2, 30), (4, 2, 15), (5, 3, None)]


@pytest.fixture()
def eng(spark):
    from sqlpp_spark.engine import SqlppEngine

    eng = SqlppEngine(spark)
    eng.add_decls("create table t1 (id int not null, grp int not null, x int);")
    eng.register_df("t1", spark.createDataFrame(T1, "id long, grp long, x long"))
    return eng


@pytest.fixture()
def duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE t1 (id BIGINT, grp BIGINT, x BIGINT)")
    con.executemany("INSERT INTO t1 VALUES (?,?,?)", T1)
    return con


SOURCES = (
    # the canonical pairing: group keys inferred, output fully ordered
    "select grp, count(1) as n, sum(x) as s from t1 group by all "
    "order by all",
    # expression keys (grp + 1) infer too; DESC over all columns
    "select grp, grp + 1 as g2, max(x) as mx from t1 group by all "
    "order by all desc",
    # all-aggregate projection degrades to GROUP BY ()
    "select sum(x) as s, count(1) as n from t1 group by all",
    # ORDER BY ALL standalone (no grouping) — NULL x rows obey the
    # pinned NULLS LAST (DuckDB's default, so source-compatible)
    "select grp, x from t1 order by all",
    "select x, grp from t1 order by all desc",
    # ORDER BY ALL on a compound — output columns of the first branch
    "select grp from t1 union select x from t1 order by all",
    # composes with HAVING and WHERE
    "select grp, count(1) as n from t1 where x is not null "
    "group by all having count(1) > 1 order by all",
)


def test_group_order_all_differential(eng, duck):
    for src in SOURCES:
        rows = [tuple(repr(v) for v in r) for r in eng.fetch_list(src)]
        info = Analyzer(eng.env, src).analyze_query(parse_query(src))
        sql = select_sql(info)
        want = [tuple(repr(v) for v in r) for r in duck.execute(sql).fetchall()]
        want2 = [tuple(repr(v) for v in r) for r in duck.execute(src).fetchall()]
        # ORDER IS COMPARED (not sorted): ORDER BY ALL pins it fully
        assert rows == want == want2, f"{src}\n{sql}"


def test_group_order_all_format_roundtrip(eng):
    for src in (
        "select grp, count(1) as n from t1 group by all order by all",
        "select grp, x from t1 order by all desc",
    ):
        printed = format_query(parse_query(src))
        if "group by all" in src:
            assert "GROUP BY ALL" in printed
        assert "ORDER BY ALL" in printed
        assert eng.fetch_list(printed) == eng.fetch_list(src), printed


def test_group_all_window_is_error(eng):
    with pytest.raises(SqlppError, match="window"):
        eng.fetch_list(
            "select grp, row_number() over (order by id) as rn "
            "from t1 group by all"
        )


def test_group_all_open_select_is_error(eng):
    with pytest.raises(SqlppError, match="explicit projection"):
        eng.fetch_list("select ... from t1 group by all")


def test_group_all_subquery_projection_is_error(eng):
    """r16: _iter_apps can't see aggregates inside subquery scopes, so
    a projection item like coalesce((select sum(..) ..), 0) under
    GROUP BY ALL used to be misclassified as a group key and die later
    with an unrelated pre-materialization error — now a targeted
    analyzer diagnostic."""
    for src in (
        # scalar subquery (the ADVICE repro shape)
        "select grp, coalesce((select count(1) from t1 as u "
        "group by ()), 0) as c from t1 group by all",
        # IN / EXISTS flags
        "select grp, (id in (select id from t1 as u)) as f "
        "from t1 group by all",
        "select grp, (exists (select u.id as id from t1 as u)) as f "
        "from t1 group by all",
    ):
        with pytest.raises(SqlppError, match="GROUP BY ALL cannot classify"):
            eng.fetch_list(src)


def test_order_all_open_select_is_error(eng):
    with pytest.raises(SqlppError, match="explicit plain projection"):
        eng.fetch_list("select ... from t1 order by all")


def test_group_all_matches_explicit(eng):
    a = eng.fetch_list(
        "select grp, count(1) as n from t1 group by all order by grp"
    )
    b = eng.fetch_list(
        "select grp, count(1) as n from t1 group by grp order by grp"
    )
    assert a == b
