"""INTERVAL literals (r16, beyond reference): DATETIME +/- INTERVAL
<int> <unit>, compiled to Spark timestampadd (probed bit-identical to
DuckDB's native interval arithmetic incl. month-end clamping and leap
years). Only the right-operand-of-+/- position is valid; DATEs are
directed to date_add. Differential on BOTH printed SQL and original
source."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from sqlpp_spark.compiler.sqlgen import select_sql
from sqlpp_spark.frontend.analyze import Analyzer
from sqlpp_spark.frontend.errors import SqlppError
from sqlpp_spark.frontend.parser import parse_query
from sqlpp_spark.frontend.printer import format_query

T1 = [
    (1, dt.datetime(2021, 1, 31, 23, 30, 15, 500000)),
    (2, dt.datetime(2020, 2, 29, 0, 0, 0)),
    (3, dt.datetime(2021, 12, 31, 23, 59, 59)),
    (4, dt.datetime(2021, 6, 15, 12, 0, 0)),
]


@pytest.fixture()
def eng(spark):
    from sqlpp_spark.engine import SqlppEngine

    eng = SqlppEngine(spark)
    eng.add_decls("create table t1 (id int not null, ts datetime not null);")
    eng.register_df("t1", spark.createDataFrame(T1, "id long, ts timestamp"))
    return eng


@pytest.fixture()
def duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE t1 (id BIGINT, ts TIMESTAMP)")
    con.executemany("INSERT INTO t1 VALUES (?,?)", T1)
    return con


def _differ(eng, duck, src):
    rows = [tuple(repr(x) for x in r) for r in eng.fetch_list(src)]
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    sql = select_sql(info)
    want = [tuple(repr(x) for x in r) for r in duck.execute(sql).fetchall()]
    want2 = [tuple(repr(x) for x in r) for r in duck.execute(src).fetchall()]
    assert rows == want == want2, f"{src}\n{sql}"


def test_interval_differential(eng, duck):
    for src in (
        # sub-day units (exact micro arithmetic)
        "select id, ts + interval 3 hour as a, "
        "ts - interval 45 minute as b, ts + interval 90 second as c "
        "from t1 order by id",
        # calendar units: month-end clamp + leap year + quarter
        "select id, ts + interval 1 month as m, "
        "ts + interval 1 quarter as q, ts + interval 1 year as y "
        "from t1 order by id",
        # day/week + plural spelling + chained arithmetic
        "select id, ts + interval 40 days as d, "
        "ts + interval 2 weeks as w, "
        "ts + interval 1 day + interval 2 hours as dh "
        "from t1 order by id",
        # usable in WHERE
        "select id from t1 "
        "where ts + interval 1 month > ts order by id",
    ):
        _differ(eng, duck, src)


def test_interval_errors_and_printers(eng):
    with pytest.raises(SqlppError, match="only valid as the right"):
        eng.fetch_list("select interval 3 hour as x from t1")
    with pytest.raises(SqlppError, match="on the right"):
        eng.fetch_list("select interval 3 hour + ts as x from t1")
    with pytest.raises(SqlppError, match="DATETIME left operand"):
        eng.fetch_list("select id + interval 3 hour as x from t1")
    with pytest.raises(SqlppError, match="interval unit"):
        eng.fetch_list("select ts + interval 3 fortnight as x from t1")
    src = "select ts + interval 3 hour as x from t1 order by id"
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    assert "INTERVAL 3 HOUR" in select_sql(info)
    assert "INTERVAL '3 hour'" in select_sql(info, dialect="postgres")
    with pytest.raises(SqlppError, match="backend divergence"):
        select_sql(info, dialect="sqlite")
    out = format_query(parse_query(src))
    assert "interval 3 hour" in out
    assert format_query(parse_query(out)) == out


def test_interval_property_battery(eng, duck):
    """Property arm: 48 random (n, unit, op) combinations over the
    edge-date rows, batched as one wide projection (one Spark job) —
    engine vs the printed SQL vs the raw source on DuckDB."""
    import random

    rng = random.Random(1616)
    units = ["second", "minute", "hour", "day", "week", "month",
             "quarter", "year"]
    cols = []
    for i in range(48):
        n = rng.randint(0, 500)
        u = rng.choice(units)
        op = rng.choice(["+", "-"])
        cols.append(f"ts {op} interval {n} {u} as c{i}")
    src = f"select id, {', '.join(cols)} from t1 order by id"
    _differ(eng, duck, src)
