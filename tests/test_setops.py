"""Set operations in the sqlpp dialect (r14, beyond reference — the
reference grammar has no UNION/INTERSECT/EXCEPT, parser.mly; the
keywords were already reserved). Differential against DuckDB on BOTH
the printed SQL and the original source; arity/type errors are
compile-time; INTERSECT binds tighter than UNION/EXCEPT."""

from __future__ import annotations

import duckdb
import pytest

from sqlpp_spark.compiler.sqlgen import select_sql
from sqlpp_spark.frontend.analyze import Analyzer
from sqlpp_spark.frontend.errors import SqlppError
from sqlpp_spark.frontend.parser import parse_query
from sqlpp_spark.frontend.printer import format_query

T1 = [(1, 1, 10), (2, 1, None), (3, 2, 30), (4, 3, 40), (5, 2, None)]
T2 = [(1, 1, 100), (3, 2, 300), (6, 2, 600)]


@pytest.fixture()
def eng(spark):
    from sqlpp_spark.engine import SqlppEngine

    eng = SqlppEngine(spark)
    eng.add_decls(
        "create table t1 (id int not null, grp int not null, val int);"
        "create table t2 (id int not null, grp int not null, amt int not null);"
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


def _differ(eng, duck, src, **params):
    rows = sorted(tuple(repr(x) for x in r) for r in eng.fetch_list(src, **params))
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    sql = select_sql(info, params or None)
    want = sorted(tuple(repr(x) for x in r) for r in duck.execute(sql).fetchall())
    want2 = sorted(tuple(repr(x) for x in r) for r in duck.execute(src).fetchall())
    assert rows == want == want2, f"{src}\n{sql}"
    return info


def test_setops_differential(eng, duck):
    for src in (
        "select id from t1 union select id from t2 order by id",
        "select id from t1 union all select id from t2 order by id desc limit 4",
        "select id from t1 union all select id from t2 order by id limit 3 offset 2",
        "select id from t1 intersect select id from t2 order by id",
        "select id from t1 except select id from t2 order by id",
        # NULL handling: set-op dedup treats NULLs as equal (both engines)
        "select val from t1 union select amt from t2 order by val",
        "select val from t1 intersect select val from t1 order by val",
        # multi-column + ALL variants (bag semantics)
        "select id, val from t1 except all select id, amt from t2 order by id",
        "select grp, grp from t1 intersect all select grp, grp from t1 order by grp",
        # chains associate left; INTERSECT binds tighter than UNION
        "select id from t1 union select id from t2 union all select grp from t1 order by id",
        "select grp from t1 union all select grp from t1 intersect select grp from t2 order by grp",
        "select grp from t1 except select grp from t2 intersect select grp from t2 order by grp",
        # grouped/filtered branches
        "select grp, count(id) as n from t1 group by grp union "
        "select grp, count(id) as n from t2 group by grp order by grp, n",
        "select distinct grp from t1 where val is not null except "
        "select grp from t2 where amt > 300 order by grp",
    ):
        _differ(eng, duck, src)


def test_setop_numeric_promotion(eng, duck):
    """int vs float branches widen to float (standard SQL promotion) —
    1 and 1.0 must dedup to ONE row under UNION in both engines. The
    printed SQL casts the int branch to DOUBLE so DuckDB's DECIMAL
    arithmetic can't leak into the compound (DuckDB parses 0.5 as
    DECIMAL, our dialect as double — value-equal, repr-different, so
    the original-source check here compares numerically)."""
    src = "select grp from t1 union select grp + 0.5 from t1 order by grp"
    rows = [float(r[0]) for r in eng.fetch_list(src)]
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    sql = select_sql(info)
    want = [float(r[0]) for r in duck.execute(sql).fetchall()]
    want2 = [float(r[0]) for r in duck.execute(src).fetchall()]
    assert rows == want == want2 == [1.0, 1.5, 2.0, 2.5, 3.0, 3.5]
    (name, ty), = info.row
    assert ty.kind == "float"
    # NOT NULL int ∪ NOT NULL float stays NOT NULL
    assert ty.non_null


def test_setop_nullability_lub(eng):
    src = "select val from t1 union select amt from t2"
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    (name, ty), = info.row
    assert name == "val" and not ty.non_null  # nullable ∪ NOT NULL → nullable
    src2 = "select id from t1 union select amt from t2"
    info2 = Analyzer(eng.env, src2).analyze_query(parse_query(src2))
    (_, ty2), = info2.row
    assert ty2.non_null


def test_setop_param_limit(eng, duck):
    _differ(
        eng, duck,
        "select id from t1 union select id from t2 order by id limit 3",
    )
    rows = eng.fetch_list(
        "select id from t1 union all select id from t2 order by id limit ?n",
        n=2,
    )
    assert [r[0] for r in rows] == [1, 1]


def test_setop_errors(eng):
    for bad, m in (
        ("select id, grp from t1 union select id from t2",
         "different arities"),
        ("select id from t1 union select toString(id) from t2",
         "set operation column"),
        ("select id from t1 union select id from t2 order by nope",
         "output column name"),
        ("select id from t1 order by id union select id from t2",
         "whole set operation"),
        ("select id from t1 union select id from t2 limit id",
         "int literal"),
    ):
        with pytest.raises(SqlppError, match=m):
            eng.fetch_list(bad)


def test_setop_tail_binds_to_whole_compound(eng, duck):
    """r15 pin (VERDICT r14 ask #7): ORDER BY / LIMIT / OFFSET after a
    set-op chain bind to the WHOLE compound (standard SQL), not the
    last branch — checked ORDER-SENSITIVELY (row sequence, not set)
    against DuckDB on both the printed SQL and the original source.
    Each case is chosen so last-branch binding would return different
    rows, not just a different order."""
    for src in (
        # last-branch LIMIT would keep t2 rows only
        "select id from t1 where id <= 2 union all select id from t2 "
        "order by id desc limit 3",
        # OFFSET past the whole compound, not past the last branch
        "select id from t1 union all select id from t2 "
        "order by id limit 4 offset 3",
        # tail after an INTERSECT-tighter chain orders the full result
        "select grp from t1 union all select grp from t1 "
        "intersect select grp from t2 order by grp desc limit 5",
        # EXCEPT: last-branch ORDER BY would be a no-op on the result
        "select id, grp from t1 except select id, grp from t2 "
        "order by grp desc, id limit 4",
    ):
        rows = [tuple(repr(x) for x in r) for r in eng.fetch_list(src)]
        info = Analyzer(eng.env, src).analyze_query(parse_query(src))
        for dialect in ("duckdb", "postgres", "sqlite"):
            sql = select_sql(info, dialect=dialect)
            # every printer puts the tail after the last branch
            tail_at = sql.upper().rindex("ORDER BY")
            assert "SELECT" not in sql[tail_at:].upper(), sql
        sql = select_sql(info)
        want = [tuple(repr(x) for x in r)
                for r in duck.execute(sql).fetchall()]
        want2 = [tuple(repr(x) for x in r)
                 for r in duck.execute(src).fetchall()]
        assert rows == want == want2, f"{src}\n{sql}"


def test_setop_sqlite_postgres_printers(eng, duck):
    """The three sqlgen dialects print compounds; SQLite rejects
    INTERSECT ALL/EXCEPT ALL (no such syntax there — documented
    divergence). Nested branches wrap in subselects so SQLite's
    left-to-right compound associativity can't change semantics."""
    src = (
        "select grp from t1 union all select grp from t1 "
        "intersect select grp from t2 order by grp"
    )
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    for dialect in ("duckdb", "postgres", "sqlite"):
        sql = select_sql(info, dialect=dialect)
        assert "UNION ALL" in sql and "INTERSECT" in sql
    # the nested INTERSECT branch is wrapped — DuckDB parses the wrap
    sql = select_sql(info)
    assert "FROM (" in sql
    rows = sorted(tuple(r) for r in duck.execute(sql).fetchall())
    assert rows == sorted(tuple(r) for r in duck.execute(src).fetchall())
    bad = "select id from t1 intersect all select id from t2"
    info2 = Analyzer(eng.env, bad).analyze_query(parse_query(bad))
    with pytest.raises(SqlppError, match="SQLite has no INTERSECT ALL"):
        select_sql(info2, dialect="sqlite")


def test_setop_fmt_roundtrip():
    for src in (
        "select id from t1 union select id from t2 order by id",
        "select a from x union all select b from y "
        "intersect select c from z limit 3",
        "select a from x except all select b from y offset 1",
    ):
        once = format_query(parse_query(src))
        again = format_query(parse_query(once))
        assert once == again


def test_setop_subquery_position_rejected(eng):
    """r15: IN/EXISTS now ACCEPT compound bodies (see
    test_compound_subquery_in_exists) — the remaining rejected
    position is the scalar subquery, where the <=1-row property could
    not hold; its error is targeted, not a silent misparse."""
    with pytest.raises(SqlppError, match="compound .* scalar"):
        eng.fetch_list(
            "select id, (select max(amt) from t2 group by () union "
            "select max(val) from t1 group by ()) as m from t1"
        )


def test_setop_in_from_position(eng, duck):
    """r14: FROM (compound select) AS alias — the compound is a
    CLOSED relation (fixed column dict; navigation can't inject
    fields). Joins, grouping and nullable-side semantics compose over
    it; both lowerings agree with DuckDB on the original source."""
    for src in (
        "select x.k as k from (select id as k from t1 union "
        "select id as k from t2) as x where x.k > 2 order by k",
        # group over a compound
        "select x.g as g, count(1) as n from (select grp as g from t1 "
        "union all select grp as g from t2) as x group by x.g "
        "order by g",
        # join a compound against a base table
        "select x.k as k, t2.amt as amt from (select id as k from t1 "
        "except select id as k from t2) as x "
        "join t2 on x.k = t2.grp order by k, amt",
        # LEFT JOIN with the compound on the nullable side
        "select t1.id as id, x.k as k from t1 left join "
        "(select id as k from t2 intersect select id as k from t1) as x "
        "on t1.id = x.k order by id",
        # nested compound inside the derived table
        "select x.k as k from (select id as k from t1 union all "
        "select id as k from t2 intersect select grp as k from t1) "
        "as x order by k",
    ):
        rows, want, sql = _both_src(eng, duck, src)
        assert rows == want, f"{src}\n{sql}"


def _both_src(eng, duck, src):
    rows = sorted(tuple(repr(x) for x in r) for r in eng.fetch_list(src))
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    sql = select_sql(info)
    want = sorted(tuple(repr(x) for x in r) for r in duck.execute(sql).fetchall())
    want2 = sorted(tuple(repr(x) for x in r) for r in duck.execute(src).fetchall())
    assert want == want2, f"{src}\n{sql}"
    return rows, want, sql


def test_setop_from_nullability_and_errors(eng):
    # LEFT JOIN right side: compound columns become nullable
    src = ("select x.k as k from t1 left join (select id as k from t2 "
           "union select id as k from t1) as x on t1.id = x.k")
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    (_, ty), = info.row
    assert not ty.non_null
    # navigation can't build expressions inside a compound
    with pytest.raises(SqlppError, match="doesn't allow"):
        eng.fetch_list(
            "select x.(k + 1) from (select id as k from t1 union "
            "select id as k from t2) as x"
        )


def test_setop_named_query(eng, duck):
    """r14: CREATE QUERY bodies accept compounds; use sites inline
    them as closed relations (fresh re-analysis per site, same as
    plain named queries)."""
    eng.add_decls(
        "create query both_ids as "
        "select id as k from t1 union select id as k from t2;"
    )
    rows = [tuple(r) for r in eng.fetch_list(
        "select b.k as k from both_ids as b where b.k > 2 order by k"
    )]
    want = [tuple(r) for r in duck.execute(
        "SELECT k FROM (SELECT id AS k FROM t1 UNION SELECT id AS k "
        "FROM t2) b WHERE k > 2 ORDER BY k"
    ).fetchall()]
    assert rows == want == [(3,), (4,), (5,), (6,)]
    # joins over the inlined compound
    rows = [tuple(r) for r in eng.fetch_list(
        "select b.k as k, t1.grp as g from both_ids as b "
        "join t1 on b.k = t1.id order by k"
    )]
    assert rows == [(1, 1), (2, 1), (3, 2), (4, 3), (5, 2)]


def test_insert_compound_select(spark):
    """r14: INSERT ... <compound SELECT> — the select side may be a
    set operation; type/arity checks run pre-execution as for plain
    insert-select."""
    import tempfile

    from sqlpp_spark.engine import SqlppEngine
    from sqlpp_spark.frontend.errors import SqlppError as Err

    eng = SqlppEngine(spark)
    eng.add_decls(
        "create table src1 (k int not null);"
        "create table src2 (k int not null);"
        "create table dst (k int not null);"
    )
    eng.register_df("src1", spark.createDataFrame([(1,), (2,)], "k long"))
    eng.register_df("src2", spark.createDataFrame([(2,), (3,)], "k long"))
    with tempfile.TemporaryDirectory() as d:
        eng.create_managed(
            "dst", f"{d}/dst",
            spark.createDataFrame([], "k long"),
        )
        eng.exec(
            "insert into dst (k) select k from src1 union select k from src2"
        )
        rows = sorted(r[0] for r in eng.fetch_list("select k from dst"))
        assert rows == [1, 2, 3]
        with pytest.raises(Err, match="arity mismatch"):
            eng.exec(
                "insert into dst (k) select k, k from src1 "
                "union select k, k from src2"
            )


def test_compound_subquery_in_exists(eng, duck):
    """r15 (ADVICE r14, low): IN / EXISTS accept compound bodies —
    previously a parse error while derived tables, named queries and
    INSERT sources all accepted compounds. Uncorrelated only
    (correlation lifting is per-branch-WHERE); differential against
    DuckDB on printed SQL AND original source."""
    for src in (
        "select id from t1 where id in "
        "(select id from t2 union select grp from t1) order by id",
        "select id from t1 where id not in "
        "(select grp from t1 union all select grp from t2) order by id",
        # INTERSECT binds tighter inside the body too
        "select id from t1 where grp in "
        "(select grp from t1 intersect select grp from t2) order by id",
        # compound body with its own tail
        "select id from t1 where id in "
        "(select id from t2 union select id from t1 "
        "order by id limit 3) order by id",
        # EXISTS over a compound (uncorrelated: constant gate)
        "select id from t1 where exists "
        "(select grp from t2 where amt > 100 except select grp from t1) "
        "order by id",
        # flag position: IN-compound under OR routes through the
        # match-flag machinery
        "select id from t1 where id in "
        "(select id from t2 union select grp from t2) or id = 6 "
        "order by id",
        # NULL-bearing compound: the lub row is nullable, so NOT IN
        # must go three-valued (null-aware anti join) — the subquery
        # contains NULL, so NO row survives
        "select id from t1 where id not in "
        "(select val from t1 union select amt from t2) order by id",
        # nullable PROBE against a non-null compound
        "select id from t1 where val not in "
        "(select amt from t2 union all select amt from t2) "
        "order by id",
    ):
        _differ(eng, duck, src)
    # tuple IN over a compound: DuckDB v1.0 rejects multi-column IN
    # subqueries outright (Binder Error), so the oracle is the
    # EXISTS-equivalent on the DuckDB side (both probe columns are
    # NOT NULL here, so IN == EXISTS exactly)
    src = (
        "select id from t1 where (id, grp) in "
        "(select id, grp from t2 union select id, grp from t1 "
        "where val is not null) order by id"
    )
    rows = [r[0] for r in eng.fetch_list(src)]
    want = [r[0] for r in duck.execute(
        "SELECT id FROM t1 WHERE EXISTS (SELECT 1 FROM "
        "(SELECT id, grp FROM t2 UNION SELECT id, grp FROM t1 "
        "WHERE val IS NOT NULL) s WHERE s.id = t1.id AND s.grp = t1.grp) "
        "ORDER BY id"
    ).fetchall()]
    assert rows == want, (rows, want)


def test_compound_subquery_errors(eng):
    # correlated compound: targeted error, not raw no-such-column
    with pytest.raises(SqlppError, match="correlated compound"):
        eng.fetch_list(
            "select id from t1 where exists "
            "(select 1 as one from t2 where t2.grp = t1.grp "
            "union select 1 as one from t2)"
        )
    # compound scalar subquery: targeted error
    with pytest.raises(SqlppError, match="compound .* scalar"):
        eng.fetch_list(
            "select id, (select max(amt) from t2 group by () union all "
            "select max(val) from t1 group by ()) as m from t1"
        )
