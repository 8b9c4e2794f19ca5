"""Date arithmetic (r15, beyond reference): date_add(d, n) (days),
date_diff(a, b) (days, a-b), date_trunc(part, x) (result keeps the
input's kind — Spark returns TIMESTAMP always, the compiler casts
back; DuckDB/PG do it natively). SQLite has no typed dates —
documented divergence (raises), like the stats aggregates.
Differential against DuckDB on the PRINTED SQL (the dialect
spellings differ from DuckDB's: date_diff arg order, date+int)."""

from __future__ import annotations

import datetime as _dt

import duckdb
import pytest

from sqlpp_spark.compiler.sqlgen import select_sql
from sqlpp_spark.frontend.analyze import Analyzer, Env, analyze
from sqlpp_spark.frontend.errors import SqlppError
from sqlpp_spark.frontend.parser import parse_query

ROWS = [
    (1, _dt.date(2021, 3, 15), _dt.datetime(2021, 3, 15, 13, 45, 22)),
    (2, _dt.date(1999, 12, 31), _dt.datetime(1999, 12, 31, 23, 59, 59)),
    (3, _dt.date(1969, 7, 20), _dt.datetime(1969, 7, 20, 20, 17, 0)),
]
SCHEMA = (
    "create table t (id int not null, d date not null, "
    "ts datetime not null);"
)


@pytest.fixture()
def eng(spark):
    from sqlpp_spark.engine import SqlppEngine

    eng = SqlppEngine(spark)
    eng.add_decls(SCHEMA)
    eng.register_df(
        "t", spark.createDataFrame(ROWS, "id long, d date, ts timestamp")
    )
    return eng


@pytest.fixture()
def duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, d DATE, ts TIMESTAMP)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", ROWS)
    return con


def _differ(eng, duck, src):
    rows = sorted(tuple(repr(x) for x in r) for r in eng.fetch_list(src))
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    sql = select_sql(info)
    want = sorted(
        tuple(repr(x) for x in r) for r in duck.execute(sql).fetchall()
    )
    assert rows == want, f"{src}\n{sql}"
    return info


def test_date_fns_differential(eng, duck):
    for src in (
        "select id, date_add(d, 5) as d5 from t order by id",
        "select id, date_add(d, -40) as dm from t order by id",
        # dynamic day count
        "select id, date_add(d, cast(id as int) * 10) as dx from t "
        "order by id",
        "select id, date_diff(date_add(d, 7), d) as dd from t "
        "order by id",
        "select id, date_trunc('month', d) as m, "
        "date_trunc('year', d) as y from t order by id",
        "select id, date_trunc('hour', ts) as h, "
        "date_trunc('week', ts) as w from t order by id",
        # composes with comparisons / grouping
        "select count(1) as n from t "
        "where date_trunc('year', d) = date('1999-01-01') group by ()",
    ):
        _differ(eng, duck, src)


def test_date_fn_typing(eng):
    info = analyze(
        eng.env,
        "select date_add(d, 1) as a, date_diff(d, d) as b, "
        "date_trunc('month', d) as c, date_trunc('hour', ts) as e "
        "from t",
    )
    tys = dict(info.row)
    assert tys["a"].kind == "date" and tys["a"].non_null
    assert tys["b"].kind == "int"
    assert tys["c"].kind == "date"  # input kind preserved
    assert tys["e"].kind == "datetime"


def test_date_fn_errors(eng):
    for bad, m in (
        ("select date_trunc('century', d) as x from t",
         "part must be a string literal"),
        ("select date_trunc(d, d) as x from t", "part must be"),
        ("select date_trunc('hour', d) as x from t",
         "needs a DATETIME"),
        ("select date_trunc('month', id) as x from t",
         "expects a DATE or DATETIME"),
    ):
        with pytest.raises(SqlppError, match=m):
            eng.fetch_list(bad)


def test_date_fn_printers(eng):
    src = "select date_add(d, 3) as x, date_diff(d, d) as y from t"
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    pg = select_sql(info, dialect="postgres")
    assert "+ CAST(3 AS INTEGER)" in pg and '"d" - "t"."d"' in pg or "-" in pg
    with pytest.raises(SqlppError, match="date arithmetic"):
        select_sql(info, dialect="sqlite")


def test_extract_and_time_parts(eng, duck):
    """r15: EXTRACT(part FROM x) sugar + hour/minute/second field
    functions (year/month/day existed)."""
    for src in (
        "select id, extract(year from ts) as y, "
        "extract(month from ts) as mo, extract(day from ts) as dd, "
        "extract(hour from ts) as h, extract(minute from ts) as mi, "
        "extract(second from ts) as sec from t order by id",
        "select id, hour(ts) as h, minute(ts) as mi, second(ts) as s "
        "from t order by id",
        "select extract(year from d) as y, count(1) as n from t "
        "group by extract(year from d) order by y",
    ):
        _differ(eng, duck, src)
    with pytest.raises(SqlppError, match="EXTRACT part"):
        parse_query("select extract(century from ts) as c from t")


def test_r16_temporal_wave_differential(eng, duck):
    """r16 temporal wave: epoch (FLOOR seconds as INT — exact incl.
    the pre-1970 row), last_day, dayofweek (Spark's Sunday=1 pinned;
    the oracle engines are Sunday=0, offset in the printed SQL),
    week/quarter/dayofyear (ISO, agree natively), make_date /
    make_timestamp (error on out-of-range in BOTH engines)."""
    for src in (
        "select id, epoch(ts) as ep from t order by id",
        "select id, last_day(d) as ld, last_day(ts) as lts from t "
        "order by id",
        "select id, dayofweek(d) as dw, week(d) as wk, "
        "quarter(d) as q, dayofyear(d) as doy from t order by id",
        "select id, extract(week from d) as wk, "
        "extract(dow from d) as dw, extract(quarter from ts) as q, "
        "extract(doy from d) as doy from t order by id",
        "select make_date(2021, 2, 28) as md, "
        "make_timestamp(2020, 2, 29, 23, 59, 58) as mt from t limit 1",
        # compose with the r16 interval arithmetic
        "select id, epoch(ts + interval 1 hour) - epoch(ts) as dh "
        "from t order by id",
    ):
        _differ(eng, duck, src)


def test_r16_temporal_wave_typing_and_errors(eng):
    with pytest.raises(SqlppError, match="expects a DATETIME"):
        eng.fetch_list("select epoch(d) as x from t")
    with pytest.raises(SqlppError, match="expects a DATE or DATETIME"):
        eng.fetch_list("select week(id) as x from t")
    with pytest.raises(SqlppError, match="must be INT"):
        eng.fetch_list("select make_date(2021, 'x', 1) as x from t")
    with pytest.raises(SqlppError, match="takes 6 arguments"):
        eng.fetch_list("select make_timestamp(2021, 1, 1) as x from t")
    # sqlite: the whole family is a documented divergence
    src = "select week(d) as x from t"
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    with pytest.raises(SqlppError, match="backend divergence"):
        select_sql(info, dialect="sqlite")
    # PG printing exists for every member (incl. the last_day
    # composition and the dow offset)
    for fn_src in (
        "select epoch(ts) as x from t",
        "select last_day(d) as x from t",
        "select dayofweek(d) as x from t",
        "select week(d) as x from t",
        "select make_date(2021, 1, 1) as x from t",
    ):
        info = Analyzer(eng.env, fn_src).analyze_query(parse_query(fn_src))
        assert select_sql(info, dialect="postgres")
