"""Searched CASE, infix [NOT] LIKE, and [NOT] BETWEEN in the sqlpp
dialect (r14, beyond reference). LIKE is sugar for the existing
like() extension fn; BETWEEN desugars at parse time to
(x >= lo AND x <= hi) — exact in 3VL, same as every engine's own
lowering. Differential against DuckDB on BOTH the printed SQL and
the original source."""

from __future__ import annotations

import duckdb
import pytest

from sqlpp_spark.compiler.sqlgen import select_sql
from sqlpp_spark.frontend.analyze import Analyzer
from sqlpp_spark.frontend.errors import SqlppError
from sqlpp_spark.frontend.parser import parse_query
from sqlpp_spark.frontend.printer import format_query

T1 = [
    (1, 1, 10, "alpha"), (2, 1, None, "beta"), (3, 2, 30, "alphabet"),
    (4, 3, 40, None), (5, 2, None, "gamma"),
]


@pytest.fixture()
def eng(spark):
    from sqlpp_spark.engine import SqlppEngine

    eng = SqlppEngine(spark)
    eng.add_decls(
        "create table t1 (id int not null, grp int not null, "
        "val int, name string);"
    )
    eng.register_df(
        "t1",
        spark.createDataFrame(T1, "id long, grp long, val long, name string"),
    )
    return eng


@pytest.fixture()
def duck():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t1 (id BIGINT, grp BIGINT, val BIGINT, name VARCHAR)"
    )
    con.executemany("INSERT INTO t1 VALUES (?,?,?,?)", T1)
    return con


def _differ(eng, duck, src):
    rows = sorted(tuple(repr(x) for x in r) for r in eng.fetch_list(src))
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    sql = select_sql(info)
    want = sorted(tuple(repr(x) for x in r) for r in duck.execute(sql).fetchall())
    want2 = sorted(tuple(repr(x) for x in r) for r in duck.execute(src).fetchall())
    assert rows == want == want2, f"{src}\n{sql}"
    return info


def test_case_like_between_differential(eng, duck):
    for src in (
        # searched CASE: multi-arm, no-else NULL, NULL condition skips
        "select id, case when val > 20 then 'big' when val is null "
        "then 'none' else 'small' end as c from t1 order by id",
        "select id, case when grp = 1 then val end as c from t1 order by id",
        "select id, case when name like '_eta' then 1 else 0 end as f "
        "from t1 order by id",
        # CASE inside aggregates (the classic conditional count)
        "select grp, sum(case when val is null then 1 else 0 end) as nulls "
        "from t1 group by grp order by grp",
        # LIKE: prefix/suffix/infix, flag position, NOT LIKE 3VL
        "select id from t1 where name like 'alpha%' order by id",
        "select id, (name like '%a') as m from t1 order by id",
        "select id from t1 where name not like '%a%' order by id",
        # BETWEEN: inclusive bounds, NOT BETWEEN, NULL operand
        "select id from t1 where val between 10 and 30 order by id",
        "select id from t1 where id not between 2 and 4 order by id",
        "select id, (val between 10 and 30) as b from t1 order by id",
        # BETWEEN binds tighter than AND: one predicate each
        "select id from t1 where val between 10 and 30 and grp = 1 "
        "order by id",
    ):
        _differ(eng, duck, src)


def test_case_numeric_promotion(eng, duck):
    """Mixed int/float CASE branches widen to double; the printed SQL
    casts so DuckDB's DECIMAL literal arithmetic can't leak in (the
    original source compares numerically — DuckDB types 0.5 DECIMAL,
    our dialect double; value-equal, repr-different)."""
    src = ("select id, case when grp = 1 then val else 0.5 end as c "
           "from t1 order by id")
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    sql = select_sql(info)
    assert "CAST((CASE" in sql
    rows = [r[1] for r in eng.fetch_list(src)]
    want = [r[1] for r in duck.execute(sql).fetchall()]
    want2 = [
        None if x is None else float(x)
        for (_, x) in duck.execute(src).fetchall()
    ]
    assert rows == want == want2 == [10.0, None, 0.5, 0.5, 0.5]
    _, ty = info.row[1]
    assert ty.kind == "float" and not ty.non_null


def test_case_nullability_typing(eng):
    src = ("select case when grp = 1 then 1 else 0 end as full_e, "
           "case when grp = 1 then 1 end as no_e, "
           "case when grp = 1 then val else 0 end as nullable_v "
           "from t1")
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    tys = dict(info.row)
    assert tys["full_e"].non_null
    assert not tys["no_e"].non_null  # unmatched rows yield NULL
    assert not tys["nullable_v"].non_null


def test_case_like_between_errors(eng):
    for bad, m in (
        ("select case when id then 1 end as c from t1",
         "expected BOOL"),
        ("select case when id = 1 then 'x' else 2 end as c from t1",
         "case branches do not match"),
        ("select case when id = 1 then 1 else 2 as c from t1",
         "expected END|expected"),
        ("select id from t1 where name like 2",
         "pattern must be a string literal"),
    ):
        with pytest.raises(SqlppError, match=m):
            eng.fetch_list(bad)


def test_case_fmt_roundtrip():
    for src in (
        "select case when a > 1 then 'x' else 'y' end as c from t",
        "select case when a = 1 then 1 when a = 2 then 2 end as c from t",
        "select id from t where name like 'a%' and val between 1 and 9",
    ):
        once = format_query(parse_query(src))
        again = format_query(parse_query(once))
        assert once == again


def test_string_pack_differential(eng, duck):
    """r14 string pack: lpad/rpad/repeat/reverse/left/right/strpos/
    contains/starts_with/ends_with — portable Spark/DuckDB semantics
    (starts_with/ends_with print as substr comparisons, identical in
    all three SQL dialects incl. the needle-longer and empty-needle
    edges; strpos/contains have SQLite instr hooks)."""
    for src in (
        "select id, lpad(name, 8, '.') as a, rpad(name, 8, '*') as b "
        "from t1 order by id",
        "select id, repeat(name, 2) as a, reverse(name) as b "
        "from t1 order by id",
        "select id, left(name, 3) as a, right(name, 3) as b "
        "from t1 order by id",
        "select id, strpos(name, 'a') as p from t1 order by id",
        "select id from t1 where contains(name, 'ph') order by id",
        "select id, starts_with(name, 'al') as s, ends_with(name, 'a') "
        "as e from t1 order by id",
        # edges: empty needle (always true), needle longer (false)
        "select id, ends_with(name, '') as e, "
        "starts_with(name, 'alphabets') as s from t1 order by id",
    ):
        rows = sorted(tuple(repr(x) for x in r) for r in eng.fetch_list(src))
        info = Analyzer(eng.env, src).analyze_query(parse_query(src))
        sql = select_sql(info)
        want = sorted(
            tuple(repr(x) for x in r) for r in duck.execute(sql).fetchall()
        )
        assert rows == want, f"{src}\n{sql}"
    # the three dialects all print (SQLite instr hooks engaged)
    src = "select id, strpos(name, 'a') as p from t1 where contains(name, 'x')"
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    assert "instr(" in select_sql(info, dialect="sqlite")
    assert "strpos(" in select_sql(info, dialect="postgres")


def test_agg_filter_clause(eng, duck):
    """r14: agg(x) FILTER (WHERE p) — parse-time desugar to
    agg(CASE WHEN p THEN x END), exact for every dialect aggregate
    (all skip NULLs). DuckDB runs its native FILTER on the original
    source as the independent check."""
    for src in (
        "select grp, count(id) filter (where val > 15) as big, "
        "sum(val) filter (where id < 4) as s from t1 group by grp "
        "order by grp",
        "select grp, avg(val) filter (where val is not null) as a "
        "from t1 group by grp order by grp",
    ):
        _differ(eng, duck, src)
    # global aggregate spelling differs (dialect needs GROUP BY ())
    rows = [tuple(r) for r in eng.fetch_list(
        "select count(1) filter (where val is null) as nulls "
        "from t1 group by ()"
    )]
    want = [tuple(r) for r in duck.execute(
        "SELECT count(1) FILTER (WHERE val IS NULL) AS nulls FROM t1"
    ).fetchall()]
    assert rows == want == [(2,)]
    # FILTER on a non-aggregate is a parse error
    with pytest.raises(SqlppError, match="only valid on aggregate"):
        eng.fetch_list("select upper(name) filter (where id > 1) from t1")


def test_like_escape_pinned(eng, duck):
    """Late r14: backslash is the PINNED LIKE escape (Spark's implicit
    default) and the printed SQL says ESCAPE '\\' explicitly, because
    DuckDB/SQLite have NO default escape — '\\%' would silently match
    different rows. Three-engine agreement + sqlite spot-check."""
    import sqlite3

    from sqlpp_spark.compiler.sqlgen import select_sql
    from sqlpp_spark.frontend.analyze import Analyzer
    from sqlpp_spark.frontend.parser import parse_query

    eng.add_decls("create table esc (a int not null, s string not null);")
    rows = [(1, "a%b"), (2, "axb"), (3, "50% off"), (4, "a_b"), (5, "a\\b")]
    eng.register_df(
        "esc", eng.spark.createDataFrame(rows, "a long, s string")
    )
    duck.execute("CREATE TABLE esc (a BIGINT, s VARCHAR)")
    duck.executemany("INSERT INTO esc VALUES (?,?)", rows)
    lite = sqlite3.connect(":memory:")
    lite.execute("CREATE TABLE esc (a, s)")
    lite.executemany("INSERT INTO esc VALUES (?,?)", rows)
    for src, expect in (
        (r"select esc.a as a from esc where esc.s like 'a\%b' order by a",
         [1]),
        (r"select esc.a as a from esc where esc.s like '%\%%' order by a",
         [1, 3]),
        (r"select esc.a as a from esc where esc.s like 'a\_b' order by a",
         [4]),
        (r"select esc.a as a from esc where esc.s like 'a\\b' order by a",
         [5]),
        (r"select esc.a as a from esc where esc.s like 'a%b' order by a",
         [1, 2, 4, 5]),
    ):
        got = [r[0] for r in eng.fetch_list(src)]
        info = Analyzer(eng.env, src).analyze_query(parse_query(src))
        want = [r[0] for r in duck.execute(select_sql(info)).fetchall()]
        wantl = [
            r[0]
            for r in lite.execute(select_sql(info, dialect="sqlite"))
        ]
        assert got == want == wantl == expect, src
    # dangling / unknown escape sequences are compile-time errors
    with pytest.raises(SqlppError, match="escape"):
        eng.fetch_list(r"select esc.a as a from esc where esc.s like 'a\xb'")
    dangling = "select esc.a as a from esc where esc.s like 'trail" + "\\" + "'"
    with pytest.raises(SqlppError, match="escape"):
        eng.fetch_list(dangling)


def test_string_fn_edges_pinned(eng, duck):
    """Late r14: substring/left/right edge inputs where the backends
    diverge from Spark — pos 0 (DuckDB eats a char, SQLite shifts the
    window), negative len, negative n in left/right (DuckDB/PG mean
    'all but n' there; SQLite lacks the fns entirely). The printers
    guard the edges; three-engine agreement on DYNAMIC positions."""
    import sqlite3

    from sqlpp_spark.compiler.sqlgen import select_sql
    from sqlpp_spark.frontend.analyze import Analyzer
    from sqlpp_spark.frontend.parser import parse_query

    eng.add_decls(
        "create table sedge (a int not null, s string not null, "
        "n int not null);"
    )
    rows = [(1, "abcdef", 0), (2, "abcdef", -1), (3, "abcdef", 2),
            (4, "xy", -3), (5, "hello", 9)]
    eng.register_df(
        "sedge", eng.spark.createDataFrame(rows, "a long, s string, n long")
    )
    duck.execute("CREATE TABLE sedge (a BIGINT, s VARCHAR, n BIGINT)")
    duck.executemany("INSERT INTO sedge VALUES (?,?,?)", rows)
    lite = sqlite3.connect(":memory:")
    lite.execute("CREATE TABLE sedge (a, s, n)")
    lite.executemany("INSERT INTO sedge VALUES (?,?,?)", rows)
    for src in (
        "select sedge.a as a, substring(sedge.s, sedge.n, 3) as x "
        "from sedge order by a",
        "select sedge.a as a, substring(sedge.s, 2, sedge.n) as x "
        "from sedge order by a",
        "select sedge.a as a, left(sedge.s, sedge.n) as x, "
        "right(sedge.s, sedge.n) as y from sedge order by a",
        "select sedge.a as a, substring(sedge.s, 0, 3) as x, "
        "left(sedge.s, -1) as y, right(sedge.s, -2) as z "
        "from sedge order by a",
    ):
        got = [tuple(r) for r in eng.fetch_list(src)]
        info = Analyzer(eng.env, src).analyze_query(parse_query(src))
        want = [
            tuple(r) for r in duck.execute(select_sql(info)).fetchall()
        ]
        wantl = [
            tuple(r)
            for r in lite.execute(select_sql(info, dialect="sqlite"))
        ]
        assert got == want == wantl, src


def test_math_domain_pinned(eng, duck):
    """Late r14: sqrt/ln return NULL on out-of-domain input — Spark's
    natives give NaN/NULL while DuckDB/PG raise Out of Range errors;
    the dialect pins total NULL semantics with identical CASE guards
    in engine and printers."""
    from sqlpp_spark.compiler.sqlgen import select_sql
    from sqlpp_spark.frontend.analyze import Analyzer
    from sqlpp_spark.frontend.parser import parse_query

    eng.add_decls("create table mth (a int not null, x float not null);")
    rows = [(1, 4.0), (2, -9.0), (3, 0.0)]
    eng.register_df("mth", eng.spark.createDataFrame(rows, "a long, x double"))
    duck.execute("CREATE TABLE mth (a BIGINT, x DOUBLE)")
    duck.executemany("INSERT INTO mth VALUES (?,?)", rows)
    src = "select mth.a as a, sqrt(mth.x) as sq, ln(mth.x) as l from mth order by a"
    got = [tuple(r) for r in eng.fetch_list(src)]
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    want = [tuple(r) for r in duck.execute(select_sql(info)).fetchall()]
    assert got == want == [
        (1, 2.0, 1.3862943611198906), (2, None, None), (3, 0.0, None),
    ]
    tys = dict(info.row)
    assert not tys["sq"].non_null and not tys["l"].non_null


def test_concat_and_mod_operators(eng, duck):
    """r15 operator spellings: `||` desugars to concat (prints as ||,
    NULL-propagating on both engines) and `%` to mod (engine's
    NULL-on-zero guard). DuckDB runs the original spellings."""
    for src in (
        # NULL propagates through || (name is nullable)
        "select id, name || '-x' as z from t1 order by id",
        # toString is a dialect-only spelling -> printed-SQL oracle
        # covers it in the string pack; keep this source DuckDB-runnable
        "select id, 'p:' || name || ':' || name as z "
        "from t1 order by id",
        "select id, id % 3 as m from t1 where id % 2 = 1 order by id",
        # % NULL-on-zero guard (DuckDB mod(x,0) is NULL too)
        "select id, id % (grp - 1) as m from t1 order by id",
    ):
        _differ(eng, duck, src)


def test_ilike_operator(eng, duck):
    """r15: ILIKE (PG/DuckDB case-insensitive LIKE) desugars to
    like(lower(e), lower(pattern)) at parse time — DuckDB runs the
    original spelling natively."""
    for src in (
        "select id, name from t1 where name ilike 'AL%' order by id",
        "select id from t1 where name not ilike '%A' order by id",
        "select id, (name ilike '%PH%') as m from t1 order by id",
    ):
        _differ(eng, duck, src)


def test_simple_case(eng, duck):
    """r15: simple CASE — `CASE x WHEN v THEN r` desugars to the
    searched form with `x = v` arms; a NULL operand never matches
    (ELSE applies), like both engines."""
    for src in (
        "select id, case grp when 1 then 'one' when 2 then 'two' "
        "else 'more' end as w from t1 order by id",
        "select id, case grp when 1 then 'one' end as w from t1 "
        "order by id",
        # NULL operand: no arm matches, ELSE applies
        "select id, case val when 10 then 'ten' else 'other' end as w "
        "from t1 order by id",
        # operand is an expression
        "select id, case grp * 2 when 2 then 'a' when 4 then 'b' end "
        "as w from t1 order by id",
    ):
        _differ(eng, duck, src)


def test_greatest_least(eng, duck):
    """r15: n-ary greatest/least with SKIP-NULL semantics (NULL only
    when every input is) — Spark, DuckDB and PG agree; SQLite's
    scalar max/min are NULL-on-any-NULL and raise in that printer."""
    for src in (
        "select id, greatest(id, grp, 3) as g, least(id, grp) as l "
        "from t1 order by id",
        # skip-NULL: val is NULL on some rows
        "select id, greatest(val, 25) as g, least(val, 25) as l "
        "from t1 order by id",
        "select id, greatest(name, 'beta') as g from t1 order by id",
    ):
        _differ(eng, duck, src)
    info = Analyzer(
        eng.env,
        "select greatest(val, 25) as g from t1",
    ).analyze_query(parse_query(
        "select greatest(val, 25) as g from t1"
    ))
    (_, ty), = info.row
    assert ty.non_null  # one non-null input -> never NULL
    with pytest.raises(SqlppError, match="backend divergence"):
        select_sql(info, dialect="sqlite")


def test_split_part_and_regexp(eng, duck):
    """r15 text-pipeline string fns: split_part (1-based, '' out of
    range — Spark/DuckDB/PG agree), regexp_replace (all-matches; the
    printers add DuckDB/PG's 'g' flag), regexp_like (partial match,
    printed as regexp_matches / PG ~). Patterns are string literals
    restricted to the Java-and-RE2-common subset."""
    for src in (
        # NULL names excluded: DuckDB's NATIVE split_part returns ''
        # for NULL input (the printed SQL guards it; original-source
        # differential would diverge — pinned separately below)
        "select id, split_part(name, 'a', 2) as p from t1 "
        "where name is not null order by id",
        "select id, split_part(name, 'zz', 1) as p from t1 "
        "where name is not null order by id",
    ):
        _differ(eng, duck, src)
    # regexp_like is a dialect-only SPELLING (DuckDB's is
    # regexp_matches) — engine vs printed SQL
    for src in (
        "select id from t1 where regexp_like(name, 'a.p') order by id",
        "select id, regexp_like(name, '^al') as m from t1 order by id",
    ):
        rows = sorted(
            tuple(repr(x) for x in r) for r in eng.fetch_list(src)
        )
        inf = Analyzer(eng.env, src).analyze_query(parse_query(src))
        psql = select_sql(inf)
        assert "regexp_matches" in psql
        want = sorted(
            tuple(repr(x) for x in r)
            for r in duck.execute(psql).fetchall()
        )
        assert rows == want, f"{src}\n{psql}"
    # regexp_replace: the dialect pins ALL-matches (Spark's default);
    # the SAME TEXT on DuckDB/PG means first-match-only, so the
    # printed SQL adds 'g' and the original-source check is skipped
    # (documented divergent spelling, like integer `/`)
    src = ("select id, regexp_replace(name, '[aeiou]+', '_') as r "
           "from t1 order by id")
    rows = sorted(tuple(repr(x) for x in r) for r in eng.fetch_list(src))
    info0 = Analyzer(eng.env, src).analyze_query(parse_query(src))
    gsql = select_sql(info0)
    assert ", 'g')" in gsql
    want = sorted(
        tuple(repr(x) for x in r) for r in duck.execute(gsql).fetchall()
    )
    assert rows == want, f"{src}\n{gsql}"
    for bad in (
        "select regexp_like(name, name) as m from t1",
        "select regexp_replace(name, name, 'x') as r from t1",
    ):
        with pytest.raises(SqlppError, match="string literal"):
            eng.fetch_list(bad)
    info = Analyzer(
        eng.env,
        "select regexp_like(name, 'x') as m from t1",
    ).analyze_query(parse_query("select regexp_like(name, 'x') as m from t1"))
    with pytest.raises(SqlppError, match="backend divergence"):
        select_sql(info, dialect="sqlite")
    # NULL input pinned: the dialect is strict (NULL -> NULL) like
    # Spark/PG/standard; DuckDB's NATIVE split_part returns '' there,
    # so the printed SQL carries a CASE guard (engine vs printed only)
    src = "select id, split_part(name, 'a', 2) as p from t1 order by id"
    rows = sorted(tuple(repr(x) for x in r) for r in eng.fetch_list(src))
    info2 = Analyzer(eng.env, src).analyze_query(parse_query(src))
    sql = select_sql(info2)
    assert "CASE WHEN" in sql
    want = sorted(
        tuple(repr(x) for x in r) for r in duck.execute(sql).fetchall()
    )
    assert rows == want


def test_trims_md5_position(eng, duck):
    """r15 scalar pack: ltrim/rtrim, md5 fingerprint, POSITION sugar."""
    for src in (
        # || not concat(): DuckDB's native concat() skips NULL args
        # where the dialect (and ||) propagate NULL — the original-
        # source leg must use the NULL-propagating spelling
        "select id, ltrim('  ' || name) as l, "
        "rtrim(name || '  ') as r from t1 order by id",
        # md5: the exact-dedup / shard-routing content hash — hex
        # rendering agrees between Spark and DuckDB
        "select id, md5(name) as h from t1 order by id",
        "select id, md5(concat(name, toString(grp))) as h from t1 "
        "order by id",
        # POSITION(needle IN haystack) == strpos(haystack, needle);
        # 0 when absent, NULL on NULL input
        "select id, position('a' in name) as p from t1 order by id",
        "select id from t1 where position('bet' in name) > 0 order by id",
    ) :
        rows = sorted(tuple(repr(x) for x in r) for r in eng.fetch_list(src))
        info = Analyzer(eng.env, src).analyze_query(parse_query(src))
        sql = select_sql(info)
        want = sorted(
            tuple(repr(x) for x in r) for r in duck.execute(sql).fetchall()
        )
        assert rows == want, f"{src}\n{sql}"
        if "toString" not in src:
            # the ANSI forms are DuckDB-runnable original source too
            want2 = sorted(
                tuple(repr(x) for x in r)
                for r in duck.execute(src).fetchall()
            )
            assert rows == want2, src
    # sqlite: md5 is a documented divergence
    src = "select md5(name) as h from t1"
    info = Analyzer(eng.env, src).analyze_query(parse_query(src))
    with pytest.raises(SqlppError, match="backend divergence"):
        select_sql(info, dialect="sqlite")


def test_r16_scalar_wave_differential(eng, duck):
    """r16 scalar wave: regexp_extract / translate / sign / trunc /
    log10 / log2 / ascii — all probed Spark-vs-DuckDB before wiring
    (regexp_extract is ''-on-miss + NULL-in-NULL-out in both; sign
    and trunc pin Spark's DOUBLE; log10/log2 pin NULL out-of-domain
    where DuckDB raises; ascii is the full Unicode codepoint, 0 for
    '')."""
    for src in (
        "select id, regexp_extract(name, '([aeiou]+)', 1) as v, "
        "regexp_extract(name, '[b-df-hj-np-tv-z]+', 0) as c "
        "from t1 order by id",
        "select id, translate(name, 'abg', 'xy') as t from t1 "
        "order by id",
        "select id, sign(coalesce(val, 0) - 25) as s from t1 "
        "order by id",
        "select id, trunc(coalesce(val, 7) / 4.0) as q, "
        "trunc(0.0 - coalesce(val, 7) / 4.0) as nq from t1 order by id",
        "select id, log10(coalesce(val, 0) * 1.0) as l10, "
        "log2(coalesce(val, 0) * 1.0) as l2 from t1 order by id",
        "select id, ascii(name) as a, ascii(substr(name, 2, 1)) as a2 "
        "from t1 order by id",
    ):
        rows = sorted(tuple(repr(x) for x in r) for r in eng.fetch_list(src))
        info = Analyzer(eng.env, src).analyze_query(parse_query(src))
        sql = select_sql(info)
        want = sorted(
            tuple(repr(x) for x in r) for r in duck.execute(sql).fetchall()
        )
        assert rows == want, f"{src}\n{sql}"


def test_r16_scalar_wave_typing_and_errors(eng):
    # pattern / group / from-to literal requirements
    with pytest.raises(SqlppError, match="string literal"):
        eng.fetch_list(
            "select regexp_extract(name, name, 1) as x from t1"
        )
    with pytest.raises(SqlppError, match="non-negative int"):
        eng.fetch_list(
            "select regexp_extract(name, '(a)', 0 - 1) as x from t1"
        )
    with pytest.raises(SqlppError, match="string literals"):
        eng.fetch_list(
            "select translate(name, name, 'x') as x from t1"
        )
    # sqlite divergences for the fns it lacks; sign/trunc/ascii print
    for fn_src, ok_sqlite in (
        ("select regexp_extract(name, '(a)', 1) as x from t1", False),
        ("select translate(name, 'ab', 'xy') as x from t1", False),
        ("select log10(1.0 * id) as x from t1", False),
        ("select sign(1.0 * id) as x from t1", True),
        ("select trunc(1.5 * id) as x from t1", True),
        ("select ascii(name) as x from t1", True),
    ):
        info = Analyzer(eng.env, fn_src).analyze_query(parse_query(fn_src))
        if ok_sqlite:
            assert select_sql(info, dialect="sqlite")
        else:
            with pytest.raises(SqlppError, match="backend divergence"):
                select_sql(info, dialect="sqlite")
