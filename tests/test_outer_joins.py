"""RIGHT / FULL OUTER / CROSS JOIN in the sqlpp dialect (r14, beyond
reference — the reference grammar has INNER/LEFT only, parser.mly; the
`right/full/cross/outer/inner` keywords were already reserved,
lexer.py:24). Nullability mirrors the LEFT rule on the other side:
RIGHT nullifies the left scope, FULL both, CROSS/INNER neither.
Differential against DuckDB on BOTH the printed SQL and the original
source, as in tests/test_setops.py."""

from __future__ import annotations

import duckdb
import pytest

from sqlpp_spark.compiler.sqlgen import select_sql
from sqlpp_spark.frontend.analyze import Analyzer, Env, analyze
from sqlpp_spark.frontend.errors import SqlppError
from sqlpp_spark.frontend.parser import parse_query
from sqlpp_spark.frontend.printer import format_query

T1 = [(1, 1, 10), (2, 1, None), (3, 2, 30), (4, 3, 40), (5, 2, None)]
T2 = [(1, 1, 100), (3, 2, 300), (6, 2, 600), (7, 9, 900)]

SCHEMA = (
    "create table t1 (id int not null, grp int not null, val int);"
    "create table t2 (id int not null, grp int not null, amt int not null);"
)


@pytest.fixture(scope="module")
def env():
    e = Env()
    e.add(SCHEMA)
    return e


@pytest.fixture()
def eng(spark):
    from sqlpp_spark.engine import SqlppEngine

    eng = SqlppEngine(spark)
    eng.add_decls(SCHEMA)
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


def _differ(eng, duck, src, **params):
    rows = sorted(tuple(repr(x) for x in r) for r in eng.fetch_list(src, **params))
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    sql = select_sql(info, params or None)
    want = sorted(tuple(repr(x) for x in r) for r in duck.execute(sql).fetchall())
    want2 = sorted(tuple(repr(x) for x in r) for r in duck.execute(src).fetchall())
    assert rows == want == want2, f"{src}\n{sql}"
    return info


def row_sig(env, src):
    info = analyze(env, src)
    return [(n, str(t)) for n, t in info.row]


# -- nullability typing -------------------------------------------------------


def test_right_join_nullifies_left(env):
    sig = row_sig(
        env,
        "select t1.id as lid, t2.id as rid, t2.amt as amt "
        "from t1 right join t2 on t1.id = t2.id",
    )
    assert sig == [
        ("lid", "INT NULL"),
        ("rid", "INT NOT NULL"),
        ("amt", "INT NOT NULL"),
    ]


def test_full_join_nullifies_both(env):
    sig = row_sig(
        env,
        "select t1.id as lid, t2.id as rid "
        "from t1 full outer join t2 on t1.id = t2.id",
    )
    assert sig == [("lid", "INT NULL"), ("rid", "INT NULL")]


def test_cross_join_keeps_nullability(env):
    sig = row_sig(
        env, "select t1.id as lid, t2.amt as amt from t1 cross join t2"
    )
    assert sig == [("lid", "INT NOT NULL"), ("amt", "INT NOT NULL")]


def test_inner_keyword_is_plain_join(env):
    sig = row_sig(
        env,
        "select t1.id as lid, t2.amt as amt "
        "from t1 inner join t2 on t1.id = t2.id",
    )
    assert sig == [("lid", "INT NOT NULL"), ("amt", "INT NOT NULL")]


def test_right_join_chain_nullifies_whole_left_subtree(env):
    # ((t1 LEFT t2) RIGHT t2b): everything accumulated on the left —
    # including the previously NOT NULL t1 columns — becomes nullable
    sig = row_sig(
        env,
        "select t1.id as a, t2.id as b, t2b.id as c "
        "from t1 left join t2 on t1.id = t2.id "
        "right join t2 as t2b on t1.id = t2b.id",
    )
    assert sig == [("a", "INT NULL"), ("b", "INT NULL"), ("c", "INT NOT NULL")]


# -- execution differentials --------------------------------------------------


def test_outer_join_differentials(eng, duck):
    for src in (
        "select t1.id as lid, t2.id as rid, t2.amt as amt "
        "from t1 right join t2 on t1.id = t2.id",
        "select t1.id as lid, t2.id as rid "
        "from t1 right outer join t2 on t1.grp = t2.grp",
        "select t1.id as lid, t2.id as rid, t1.val as val, t2.amt as amt "
        "from t1 full join t2 on t1.id = t2.id",
        "select t1.id as lid, t2.id as rid "
        "from t1 full outer join t2 on t1.id = t2.id and t2.amt > 100",
        "select t1.id as lid, t2.id as rid from t1 cross join t2",
        "select t1.id as a, t2.id as b, t2b.id as c "
        "from t1 left join t2 on t1.id = t2.id "
        "right join t2 as t2b on t1.id = t2b.id",
    ):
        _differ(eng, duck, src)


def test_full_join_grouped(eng, duck):
    _differ(
        eng, duck,
        "select coalesce(t1.grp, t2.grp) as g, count(1) as n "
        "from t1 full join t2 on t1.id = t2.id "
        "group by coalesce(t1.grp, t2.grp) order by g",
    )


def test_cross_join_where_param(eng, duck):
    _differ(
        eng, duck,
        "select t1.id as lid, t2.id as rid from t1 cross join t2 "
        "where t2.amt > 100 order by lid, rid",
    )


def test_fmt_round_trip(env):
    for src in (
        "select t1.id as a from t1 right join t2 on t1.id = t2.id",
        "select t1.id as a from t1 full outer join t2 on t1.id = t2.id",
        "select t1.id as a from t1 cross join t2",
        "select t1.id as a from t1 inner join t2 on t1.id = t2.id",
    ):
        q = parse_query(src)
        printed = format_query(q)
        q2 = parse_query(printed)
        assert format_query(q2) == printed
        analyze(env, printed)  # the printed form re-analyzes


# -- errors -------------------------------------------------------------------


def test_cross_join_rejects_on(env):
    with pytest.raises(SqlppError):
        analyze(env, "select t1.id as a from t1 cross join t2 on t1.id = t2.id")


def test_right_join_requires_on(env):
    with pytest.raises(SqlppError):
        analyze(env, "select t1.id as a from t1 right join t2")


def test_full_join_on_must_be_bool(env):
    with pytest.raises(SqlppError):
        analyze(env, "select t1.id as a from t1 full join t2 on t1.id + t2.id")
