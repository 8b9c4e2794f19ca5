"""Window functions in the sqlpp dialect (r13, beyond-reference):
``fn(args) OVER (PARTITION BY .. ORDER BY ..)`` for ranking
(row_number/rank/dense_rank), offsets (lag/lead) and frame aggregates
(count/sum/min/max). Differential against DuckDB on BOTH the printed
SQL and the original source; placement and arity errors are
compile-time."""

from __future__ import annotations

import duckdb
import pytest

from sqlpp_spark.compiler.sqlgen import select_sql
from sqlpp_spark.frontend.analyze import Analyzer
from sqlpp_spark.frontend.errors import SqlppError
from sqlpp_spark.frontend.parser import parse_query

T1 = [(1, 1, 10), (2, 1, None), (3, 2, 30), (4, 3, 40), (5, 2, None)]


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


def test_window_functions_differential(eng, duck):
    for src in (
        "select id, row_number() over (partition by grp order by id) as rn "
        "from t1 order by id",
        "select id, rank() over (order by grp desc, id) as r "
        "from t1 order by id",
        "select id, dense_rank() over (order by grp) as dr "
        "from t1 order by id",
        # integer running sum (float window sums differ in the last
        # ulp between engines — see sqlpp_window_functions docstring)
        "select id, sum(id) over (partition by grp order by id) as s "
        "from t1 order by id",
        "select id, count(val) over (partition by grp) as c "
        "from t1 order by id",
        "select id, min(val) over (partition by grp) as m "
        "from t1 order by id",
        "select id, lag(val) over (partition by grp order by id) as pv "
        "from t1 order by id",
        "select id, lead(val, 2) over (order by id) as nv "
        "from t1 order by id",
        # window beside a WHERE and in ORDER BY position
        "select id, max(val) over (partition by grp) as m from t1 "
        "where grp < 3 order by id",
        "select id from t1 order by row_number() over (order by val desc, id), id",
        # r13: windows over GROUPED selects — the window runs on the
        # aggregated rows; aggregates may appear inside the spec
        "select grp, count(id) as n, rank() over (order by count(id) "
        "desc, grp) as r from t1 group by grp order by grp",
        "select grp, sum(id) as s, row_number() over (order by sum(id) "
        "desc) as rn from t1 group by grp order by grp",
        "select grp, count(id) as n, lag(count(id)) over (order by grp) "
        "as pn from t1 group by grp order by grp",
        "select grp, count(id) as n from t1 group by grp "
        "order by rank() over (order by count(id) desc, grp), grp",
        # value fns + ntile (r13): default frames agree across engines
        "select id, ntile(2) over (order by id) as b from t1 order by id",
        "select id, first_value(val) over (partition by grp order by id) "
        "as fv from t1 order by id",
        "select id, last_value(val) over (partition by grp order by id) "
        "as lv from t1 order by id",
        "select id, first_value(id) over (order by val desc, id) "
        "as top_id from t1 order by id",
        # DISTINCT dedups AFTER windows compute (count per group is a
        # classic distinct+window shape)
        "select distinct grp, count(id) over (partition by grp) as n "
        "from t1 order by grp",
    ):
        _differ(eng, duck, src)


def test_ignore_nulls_differential(eng, duck):
    """r16: IGNORE/RESPECT NULLS on the value/offset window functions,
    parsed inside the call parens (DuckDB's placement, so the raw
    source runs on the oracle engine). lag/lead lower to nth_value
    over a one-sided ROWS frame (reversed order for lag); nth_value/
    first_value/last_value use Spark's native ignoreNulls."""
    for src in (
        # lag/lead: skip the NULL at id=2 (grp 1) and id=5 (grp 2)
        "select id, lag(val ignore nulls) over (order by id) as p "
        "from t1 order by id",
        "select id, lead(val ignore nulls) over (order by id) as n "
        "from t1 order by id",
        "select id, lag(val, 2 ignore nulls) over (order by id) as p2 "
        "from t1 order by id",
        "select id, lead(val, 2 ignore nulls) over (order by id) as n2 "
        "from t1 order by id",
        # partitioned + descending order
        "select id, lag(val ignore nulls) over (partition by grp "
        "order by id desc) as p from t1 order by id",
        # value functions, with and without explicit frames
        "select id, nth_value(val, 2 ignore nulls) over (order by id "
        "rows between unbounded preceding and unbounded following) "
        "as nv from t1 order by id",
        "select id, first_value(val ignore nulls) over (order by id "
        "rows between unbounded preceding and current row) as fv "
        "from t1 order by id",
        "select id, last_value(val ignore nulls) over (order by id "
        "rows between unbounded preceding and current row) as lv "
        "from t1 order by id",
        # RESPECT NULLS is the engine default — explicit spelling
        "select id, lag(val respect nulls) over (order by id) as p "
        "from t1 order by id",
        "select id, first_value(val respect nulls) over (order by id) "
        "as fv from t1 order by id",
    ):
        _differ(eng, duck, src)


def test_ignore_nulls_errors(eng):
    # window-only modifier
    with pytest.raises(SqlppError, match="requires an OVER clause"):
        eng.fetch_list("select sum(val ignore nulls) as s from t1 "
                       "group by ()")
    # value/offset functions only
    with pytest.raises(SqlppError, match="not supported for"):
        eng.fetch_list(
            "select sum(val ignore nulls) over (order by id) as s "
            "from t1"
        )
    # the reversed-frame lowering needs a positive offset
    with pytest.raises(SqlppError, match="positive offset"):
        eng.fetch_list(
            "select lag(val, 0 ignore nulls) over (order by id) as p "
            "from t1"
        )


def test_ignore_nulls_printers(eng):
    from sqlpp_spark.frontend.printer import format_query

    src = ("select id, lag(val ignore nulls) over (order by id) as p "
           "from t1 order by id")
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    sql = select_sql(info)
    assert "IGNORE NULLS)" in sql  # inside the parens, DuckDB-style
    # round-trips through the dialect printer
    assert "ignore nulls)" in format_query(parse_query(src))
    # PG/SQLite have no null-treatment clause
    for dialect in ("postgres", "sqlite"):
        with pytest.raises(SqlppError, match="backend divergence"):
            select_sql(info, dialect=dialect)
    # r17 (advisor): explicit RESPECT NULLS is the default semantics
    # everywhere -- prints as the plain call on every dialect instead
    # of refusing
    src2 = ("select id, lag(val respect nulls) over (order by id) as p "
            "from t1 order by id")
    info2 = Analyzer(eng.env, src2).analyze_query(parse_query(src2))
    for dialect in ("duckdb", "postgres", "sqlite"):
        sql2 = select_sql(info2, dialect=dialect)
        assert "RESPECT" not in sql2 and "lag(" in sql2.lower()


def test_named_windows_differential(eng, duck):
    """r16: WINDOW clause + OVER w references (standard SQL / DuckDB
    named windows) — the analyzer substitutes the spec into each
    reference before inference, so the compiler and SQL printers only
    ever see inline specs; the raw source runs on DuckDB natively."""
    for src in (
        # one window shared by two functions
        "select id, row_number() over w as rn, sum(id) over w as s "
        "from t1 window w as (partition by grp order by id) "
        "order by id",
        # two windows + mixing named and inline in one select
        "select id, rank() over wg as r, "
        "count(val) over (partition by grp) as c, "
        "lag(id) over wo as p from t1 "
        "window wg as (order by grp, id), wo as (order by id) "
        "order by id",
        # frame inside the named spec
        "select id, sum(id) over w as s from t1 "
        "window w as (order by id rows between 2 preceding "
        "and current row) order by id",
        # composes with IGNORE NULLS
        "select id, lag(val ignore nulls) over w as p from t1 "
        "window w as (order by id) order by id",
        # named window referenced from QUALIFY
        "select id from t1 window w as (partition by grp order by id) "
        "qualify row_number() over w = 1 order by id",
    ):
        _differ(eng, duck, src)


def test_named_windows_errors_and_fmt(eng):
    from sqlpp_spark.frontend.printer import format_query

    with pytest.raises(SqlppError, match="unknown window name"):
        eng.fetch_list(
            "select id, sum(id) over nope as s from t1 "
            "window w as (order by id)"
        )
    with pytest.raises(SqlppError, match="duplicate window name"):
        eng.fetch_list(
            "select id, sum(id) over w as s from t1 "
            "window w as (order by id), w as (order by grp)"
        )
    # r17 (advisor): an UNUSED window definition still binds -- a bad
    # column inside it is an error (DuckDB/PG bind unreferenced specs
    # too), as is an aggregate or a nested window in the spec
    with pytest.raises(SqlppError, match="no_such_col"):
        eng.fetch_list(
            "select id from t1 window w as (partition by no_such_col)"
        )
    with pytest.raises(SqlppError, match="no_such_col"):
        eng.fetch_list(
            "select id from t1 window w as (order by no_such_col)"
        )
    with pytest.raises(SqlppError):
        eng.fetch_list(
            "select id from t1 window w as (partition by sum(id))"
        )
    # fmt round-trips the clause and the bare reference
    src = ("select id, sum(id) over w as s from t1 "
           "window w as (partition by grp order by id) order by id")
    out = format_query(parse_query(src))
    assert "WINDOW w AS (partition by grp order by id" in out
    assert "over w" in out
    assert format_query(parse_query(out)) == out


def test_window_placement_and_arity_errors(eng):
    for bad, m in (
        ("select id from t1 where row_number() over (order by id) > 2",
         "not allowed in WHERE"),
        ("select grp, rank() over (order by val) as r from t1 "
         "group by grp", "not in GROUP BY"),
        ("select id, row_number() over (partition by grp) as rn from t1",
         "requires ORDER BY"),
        ("select id, sum(row_number() over (order by id)) "
         "over (order by id) as x from t1", "nest"),
        ("select id, foo(val) over (order by id) as x from t1",
         "unknown window"),
        ("select id, row_number(val) over (order by id) as x from t1",
         "takes no arguments"),
        ("select id, lag(val, id) over (order by id) as x from t1",
         "integer literal"),
        ("select id, ntile(grp) over (order by id) as x from t1",
         "integer literal"),
        ("select id, first_value(val) over (partition by grp) as x from t1",
         "requires ORDER BY"),
        ("select id, sum(count(val)) over (order by id) as x from t1",
         "window specifications without GROUP BY"),
    ):
        with pytest.raises(SqlppError, match=m):
            eng.fetch_list(bad)


def test_window_nullability_types(eng):
    """lag is nullable even over NOT NULL args (beyond-frame rows);
    ranking fns are NOT NULL ints."""
    info = Analyzer(eng.env, s := (
        "select row_number() over (order by id) as rn, "
        "lag(id) over (order by id) as p from t1"
    )).analyze_query(parse_query(s))
    tys = {f.out_name: f.expr.ty for f in info.ctx.fields}
    assert tys["rn"].non_null and tys["rn"].kind == "int"
    assert not tys["p"].non_null


def test_window_nested_in_order_by_in_probe(eng, duck):
    """r14 (advice): _has_window must descend into EIn probe exprs —
    a window fn inside an IN probe within ORDER BY needs the __ow
    materialization or Spark rejects the Sort at run time."""
    for src in (
        "select id from t1 "
        "order by (row_number() over (order by val desc, id)) "
        "in (select id from t1 where val is not null), id",
        # window inside arithmetic inside the probe
        "select id from t1 "
        "order by (row_number() over (order by id) + 1) "
        "in (select id from t1 where grp = 2), id desc",
    ):
        rows = [tuple(r) for r in eng.fetch_list(src)]
        want = [tuple(r) for r in duck.execute(src).fetchall()]
        assert rows == want, src


def test_window_frames_differential(eng, duck):
    """r14: explicit ROWS/RANGE frames + the remaining window fns
    (avg/percent_rank/cume_dist/nth_value). Integer args keep sums
    exact across engines; avg of exact int sums divides identically
    in IEEE double on both sides."""
    for src in (
        "select id, sum(id) over (order by id rows between 1 preceding "
        "and 1 following) as s from t1 order by id",
        "select id, sum(id) over (order by id rows between unbounded "
        "preceding and current row) as s from t1 order by id",
        "select id, min(val) over (partition by grp order by id rows "
        "between current row and unbounded following) as m from t1 order by id",
        "select id, sum(id) over (order by id range between 2 preceding "
        "and 2 following) as s from t1 order by id",
        # frame that can be EMPTY → NULL sum / 0 count
        "select id, count(val) over (order by id rows between 2 following "
        "and 3 following) as c from t1 order by id",
        "select id, sum(id) over (order by id rows between 3 following "
        "and 4 following) as s from t1 order by id",
        "select id, avg(id) over (order by id rows between 1 preceding "
        "and current row) as a from t1 order by id",
        "select id, percent_rank() over (order by id) as pr from t1 order by id",
        "select id, percent_rank() over (partition by grp order by id) "
        "as pr from t1 order by id",
        "select id, cume_dist() over (order by grp, id) as cd from t1 order by id",
        "select id, nth_value(val, 2) over (partition by grp order by id) "
        "as nv from t1 order by id",
        "select id, first_value(id) over (order by id rows between "
        "1 following and 2 following) as fv from t1 order by id",
        # short form: ROWS <bound> == BETWEEN <bound> AND CURRENT ROW
        "select id, sum(id) over (order by id rows 2 preceding) as s "
        "from t1 order by id",
        "select id, avg(val) over (partition by grp order by id rows "
        "between unbounded preceding and unbounded following) as a "
        "from t1 order by id",
    ):
        _differ(eng, duck, src)


def test_window_frame_errors(eng):
    for bad, m in (
        ("select id, row_number() over (order by id rows between "
         "1 preceding and current row) as x from t1",
         "frames are not allowed"),
        ("select id, lag(val) over (order by id rows 1 preceding) "
         "as x from t1", "frames are not allowed"),
        ("select id, sum(id) over (partition by grp rows between "
         "1 preceding and current row) as x from t1",
         "requires ORDER BY"),
        ("select id, sum(id) over (order by id rows between current row "
         "and 1 preceding) as x from t1", "start cannot come after"),
        ("select id, sum(id) over (order by id rows between 1 preceding "
         "and 2 preceding) as x from t1", "start cannot come after"),
        ("select id, sum(id) over (order by grp, id range between "
         "1 preceding and current row) as x from t1",
         "exactly one ORDER BY key"),
        ("select id, nth_value(val, 0) over (order by id) as x from t1",
         "positive int literal"),
        ("select id, percent_rank(val) over (order by id) as x from t1",
         "takes no arguments"),
    ):
        with pytest.raises(SqlppError, match=m):
            eng.fetch_list(bad)


def test_window_frame_nullability(eng):
    """Frames that may exclude the current row can be empty → nullable
    results even over NOT NULL args; frames containing the current row
    keep the no-frame rules; count stays NOT NULL (empty frame → 0)."""
    info = Analyzer(eng.env, s := (
        "select sum(id) over (order by id rows between 3 following "
        "and 4 following) as s_empty, "
        "sum(id) over (order by id rows between 1 preceding "
        "and current row) as s_full, "
        "count(id) over (order by id rows between 3 following "
        "and 4 following) as c_empty, "
        "avg(id) over (order by id) as a, "
        "percent_rank() over (order by id) as pr, "
        "nth_value(id, 2) over (order by id) as nv from t1"
    )).analyze_query(parse_query(s))
    tys = {f.out_name: f.expr.ty for f in info.ctx.fields}
    assert not tys["s_empty"].non_null
    assert tys["s_full"].non_null
    assert tys["c_empty"].non_null and tys["c_empty"].kind == "int"
    assert tys["a"].non_null and tys["a"].kind == "float"
    assert tys["pr"].non_null and tys["pr"].kind == "float"
    assert not tys["nv"].non_null


def test_window_fmt_roundtrip():
    """r14: the fmt printer renders windows (incl. frames) — it
    couldn't print EWindow at all before."""
    from sqlpp_spark.frontend.printer import format_query

    for src in (
        "select row_number() over (order by id) as rn from t",
        "select sum(v) over (partition by g order by id rows between "
        "2 preceding and current row) as s from t",
        "select nth_value(v, 3) over (order by id range between "
        "unbounded preceding and unbounded following) as nv from t",
    ):
        once = format_query(parse_query(src))
        again = format_query(parse_query(once))
        assert once == again


def test_window_stat_aggs(eng, duck):
    """Late r14: stddev/variance/stddev_pop/var_pop over windows.
    Approximate float comparison (Welford-vs-naive ULP drift between
    engines); NULL structure (1-row sample frames) compared exactly."""
    import math

    from sqlpp_spark.compiler.sqlgen import select_sql
    from sqlpp_spark.frontend.analyze import Analyzer, analyze
    from sqlpp_spark.frontend.parser import parse_query

    src = (
        "select id, "
        "stddev(val) over (partition by grp) as sd, "
        "variance(val) over (order by id "
        "rows between 1 preceding and current row) as v, "
        "var_pop(val) over (partition by grp) as vp "
        "from t1 order by id"
    )
    rows = [tuple(r) for r in eng.fetch_list(src)]
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    want = [tuple(r) for r in duck.execute(select_sql(info)).fetchall()]
    assert len(rows) == len(want)
    for a, b in zip(rows, want):
        assert a[0] == b[0]
        for x, y in zip(a[1:], b[1:]):
            if x is None or y is None:
                assert x is None and y is None
            else:
                assert math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-12)
    tys = dict(info.row)
    assert not tys["sd"].non_null and not tys["v"].non_null
    # sqlite has no stat window aggregates — documented divergence
    import pytest as _pytest

    from sqlpp_spark.compiler.sqlgen import SqlGen
    from sqlpp_spark.frontend.errors import SqlppError as _E
    with _pytest.raises(_E, match="backend divergence"):
        SqlGen(None, "sqlite").select(info.ctx)
