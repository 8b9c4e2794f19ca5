"""SELECT DISTINCT ON (r16, beyond reference — PostgreSQL/DuckDB):
keep the first row per ON-group in ORDER BY order. The dialect pins
PG's determinism rule (ORDER BY must lead with the ON expressions);
compiles to ONE row_number window exchange + rn=1 filter before the
projection. Windows/QUALIFY/GROUP BY combinations are targeted
errors. Differential against DuckDB on BOTH the printed SQL and the
original source (both engines support the syntax natively)."""

from __future__ import annotations

import duckdb
import pytest

from sqlpp_spark.compiler.sqlgen import select_sql
from sqlpp_spark.frontend.analyze import Analyzer
from sqlpp_spark.frontend.errors import SqlppError
from sqlpp_spark.frontend.parser import parse_query
from sqlpp_spark.frontend.printer import format_query

T1 = [
    (1, 1, 10, "alpha"), (2, 1, 40, "beta"), (3, 2, 30, "gamma"),
    (4, 3, None, "delta"), (5, 2, 30, "epsilon"), (6, 3, 5, None),
    (7, None, 99, "zeta"),
]


@pytest.fixture()
def eng(spark):
    from sqlpp_spark.engine import SqlppEngine

    eng = SqlppEngine(spark)
    eng.add_decls(
        "create table t1 (id int not null, grp int, val int, "
        "name string);"
    )
    eng.register_df(
        "t1",
        spark.createDataFrame(
            T1, "id long, grp long, val long, name string"
        ),
    )
    return eng


@pytest.fixture()
def duck():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t1 (id BIGINT, grp BIGINT, val BIGINT, "
        "name VARCHAR)"
    )
    con.executemany("INSERT INTO t1 VALUES (?,?,?,?)", T1)
    return con


def _differ(eng, duck, src):
    rows = [tuple(repr(x) for x in r) for r in eng.fetch_list(src)]
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    sql = select_sql(info)
    want = [tuple(repr(x) for x in r) for r in duck.execute(sql).fetchall()]
    want2 = [tuple(repr(x) for x in r) for r in duck.execute(src).fetchall()]
    assert rows == want == want2, f"{src}\n{sql}\n{rows}\n{want}\n{want2}"


def test_distinct_on_differential(eng, duck):
    for src in (
        # top-1 per group by val desc, id tie-break (NULL group is a
        # group of its own; NULL val sorts last per the pinned rule)
        "select id, grp, val from t1 "
        "order by grp, val desc, id",
        # ^ control row set; now the DISTINCT ON forms
        "select distinct on (grp) id, grp, val from t1 "
        "order by grp, val desc, id",
        # two ON keys
        "select distinct on (grp, val) id, grp, val from t1 "
        "order by grp, val, id",
        # expression key + projection not containing the key
        "select distinct on (id % 3) id, name from t1 "
        "order by id % 3, id",
        # explicit NULLS FIRST on the group key
        "select distinct on (grp) id, grp from t1 "
        "order by grp nulls first, id desc",
        # with WHERE and LIMIT
        "select distinct on (grp) id, grp, val from t1 "
        "where id < 7 order by grp, val desc, id limit 2",
    ):
        _differ(eng, duck, src)


def test_distinct_on_errors(eng):
    with pytest.raises(SqlppError, match="ORDER BY starting with"):
        eng.fetch_list("select distinct on (grp) id from t1")
    with pytest.raises(SqlppError, match="match the leading ORDER BY"):
        eng.fetch_list(
            "select distinct on (grp) id from t1 order by val, id"
        )
    with pytest.raises(SqlppError, match="not supported with GROUP BY"):
        eng.fetch_list(
            "select distinct on (grp) grp, count(1) as n from t1 "
            "group by grp order by grp"
        )
    with pytest.raises(SqlppError, match="cannot combine with QUALIFY"):
        eng.fetch_list(
            "select distinct on (grp) id, grp from t1 "
            "qualify row_number() over (order by id) = 1 "
            "order by grp, id"
        )
    with pytest.raises(SqlppError, match="cannot combine with"):
        eng.fetch_list(
            "select distinct on (grp) id, "
            "row_number() over (order by id) as rn "
            "from t1 order by grp, id"
        )


def test_distinct_on_printers(eng):
    src = ("select distinct on (grp) id, grp from t1 "
           "order by grp, val desc, id")
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    sql = select_sql(info)
    assert "DISTINCT ON (" in sql
    assert "DISTINCT ON (" in select_sql(info, dialect="postgres")
    with pytest.raises(SqlppError, match="backend divergence"):
        select_sql(info, dialect="sqlite")
    out = format_query(parse_query(src))
    assert "DISTINCT ON (" in out
    assert format_query(parse_query(out)) == out


def test_distinct_on_plan_one_exchange(eng):
    # one window exchange on the ON keys; no extra shuffle before it
    df = eng.query(
        "select distinct on (grp) id, grp, val from t1 "
        "order by grp, val desc, id"
    )
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # window exchange + the final ORDER BY exchange only (count plan
    # NODES, not detail-section mentions)
    import re

    nodes = re.findall(r"^\s*\(\d+\) (\w+)", plan, re.M)
    assert nodes.count("Exchange") <= 2, nodes
    # Spark pushes a map-side top-1-per-key (WindowGroupLimit) below
    # the exchange — the rn=1 filter prunes before the shuffle
    assert "WindowGroupLimit" in nodes, nodes
