"""Differential fuzzing of the DML + extension surface (round-8 ask #1).

The SELECT fuzzer (tests/test_sqlgen.py) found two real engine bugs in
its first round by running one elaborated AST through BOTH lowerings
(Spark compiler vs printed SQL on DuckDB). This module applies the
same technique to the rest of the surface:

- **DML programs**: random sequences of INSERT VALUES / INSERT SET /
  INSERT SELECT (+ ON CONFLICT IGNORE/REPLACE, RETURNING, params),
  UPDATE [FROM] and DELETE are executed statement-by-statement against
  the Spark engine's managed-table path AND against DuckDB via the
  printer (compiler/sqlgen.statement_sql). After every statement the
  RETURNING rows must match; after every program the full table state
  must match. Reference semantics: insert.t / update.t / delete.t.
- **MATCH variant params** (analyze.ml:711-752): random branch sets,
  tags and payload bindings through both lowerings.
- **Fieldset splices** (analyze.ml:500-527): plain and aggregate
  fieldsets spliced into random query shapes.
- **Expression params** (analyze.ml:468-473): a random predicate
  compiled through the captured-scope re-analysis path must equal the
  same predicate inlined in the source (the reference's defining
  semantics for Pty_expr) as executed by DuckDB via the printer.

Grammar restrictions that keep both engines well-defined (not bug
cover-ups — each is a documented semantic boundary):
- plain INSERT draws FRESH ids only (the engine does not enforce PK
  uniqueness on append; DuckDB errors) — ON CONFLICT forms draw from
  the colliding range on purpose;
- arithmetic is +,-,* (int `/` renders float division in raw DML
  position — covered by the directed battery via elaborated SELECTs);
- UPDATE ... FROM joins on the unique src id so "first match wins"
  is deterministic in both engines.

Example count: 30 by default; set SQLPP_FUZZ_EXAMPLES=400 for the
deep run (recorded in COVERAGE.md).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from sqlpp_spark.compiler.sqlgen import select_sql, statement_sql
from sqlpp_spark.engine import SqlppEngine
from sqlpp_spark.frontend.analyze import analyze
from sqlpp_spark.frontend.errors import SqlppError

N_EXAMPLES = int(os.environ.get("SQLPP_FUZZ_EXAMPLES", "30"))

SEED_ROWS = [
    (1, 0, 10, "a"), (2, 1, None, "b"), (3, 2, 30, "c"),
    (4, 0, None, "d"), (5, 1, 50, "e"), (6, 2, 60, "f"),
]
SRC_ROWS = [(1, 5, 100, "x"), (2, 6, None, "y"), (3, 7, 300, "z")]

ITEMS_DECL = (
    "create table items (id int not null primary key, grp int not null, "
    "val int, tag string not null);"
)


def _fresh_spark_engine(spark, tmpdir) -> SqlppEngine:
    eng = SqlppEngine(spark)
    eng.add_decls(ITEMS_DECL)
    eng.add_decls("create table src (id int not null, grp int not null, "
                  "val int, tag string not null);")
    df = spark.createDataFrame(
        SEED_ROWS, "id long, grp long, val long, tag string"
    )
    eng.create_managed("items", os.path.join(tmpdir, "items"), df)
    eng.register_df(
        "src",
        spark.createDataFrame(SRC_ROWS, "id long, grp long, val long, tag string"),
    )
    return eng


def _fresh_duck():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE items (id BIGINT PRIMARY KEY, grp BIGINT NOT NULL, "
        "val BIGINT, tag VARCHAR NOT NULL)"
    )
    con.executemany("INSERT INTO items VALUES (?, ?, ?, ?)", SEED_ROWS)
    con.execute(
        "CREATE TABLE src (id BIGINT, grp BIGINT, val BIGINT, tag VARCHAR)"
    )
    con.executemany("INSERT INTO src VALUES (?, ?, ?, ?)", SRC_ROWS)
    return con


_KEY = lambda row: tuple(repr(v) for v in row)  # noqa: E731 — NULL-safe sort


def run_program(spark, tmpdir, program):
    """Execute (src, params) statements against both engines; assert
    RETURNING parity per statement and table parity at the end.

    Dialect note (pinned by test_duckdb_conflict_ignore_returning_
    deviation below): DuckDB 1.0 returns the PROPOSED row from
    ``ON CONFLICT DO NOTHING ... RETURNING`` even when the insert was
    skipped; the engine follows PostgreSQL (only actually-inserted
    rows come back). The harness therefore filters DuckDB's returned
    rows to ids that were genuinely new — which requires the grammar
    to put plain ``id`` first in RETURNING for conflict-ignore
    inserts."""
    eng = _fresh_spark_engine(spark, tmpdir)
    con = _fresh_duck()
    try:
        for i, (src, params) in enumerate(program):
            ignore_returning = (
                "on conflict ignore" in src and "returning" in src
            )
            if ignore_returning:
                pre_ids = {
                    r[0] for r in con.execute("SELECT id FROM items").fetchall()
                }
            ret = eng.exec(src, **params)
            sql = statement_sql(eng.env, src, params or None)
            if src.lstrip().startswith("update"):
                # DuckDB's documented ART-index limitation raises
                # spurious duplicate-key errors when rewriting rows
                # under a PK — run the printed UPDATE against a
                # PK-less copy and sync back (same workaround as the
                # directed printer battery in test_sqlgen.py).
                con.execute("CREATE TABLE __upd AS SELECT * FROM items")
                duck_ret = con.execute(
                    sql.replace('"items"', '"__upd"')
                ).fetchall()
                con.execute("DELETE FROM items")
                con.execute("INSERT INTO items SELECT * FROM __upd")
                con.execute("DROP TABLE __upd")
            else:
                duck_ret = con.execute(sql).fetchall()
            if ignore_returning:
                duck_ret = [r for r in duck_ret if r[0] not in pre_ids]
            if ret is not None:
                got = sorted((tuple(r) for r in ret.collect()), key=_KEY)
                want = sorted((tuple(r) for r in duck_ret), key=_KEY)
                assert got == want, (
                    f"RETURNING mismatch at stmt {i}:\nsqlpp: {src}\n"
                    f"sql  : {sql}\nspark: {got}\nduck : {want}"
                )
        final_spark = sorted(
            (tuple(r) for r in eng.fetch_list(
                "select id, grp, val, tag from items")),
            key=_KEY,
        )
        final_duck = sorted(
            (tuple(r) for r in con.execute(
                "SELECT id, grp, val, tag FROM items").fetchall()),
            key=_KEY,
        )
        assert final_spark == final_duck, (
            "final table mismatch:\n"
            + "\n".join(s for s, _ in program)
            + f"\nspark: {final_spark}\nduck : {final_duck}"
        )
    finally:
        con.close()


# -- directed programs (every statement form once) ---------------------------

DIRECTED_PROGRAMS = [
    # plain insert + returning expr
    [
        ("insert into items(id, grp, val, tag) values (100, 3, 7, 'p'), "
         "(101, 4, null:int, 'q') returning id, grp + 1 as g2, val", {}),
        ("delete from items where val is null returning id, tag", {}),
    ],
    # SET sugar + param + on conflict ignore/replace
    [
        ("insert into items set id = ?nid, grp = 9, val = 9, tag = 'n'",
         {"nid": 102}),
        ("insert into items(id, grp, val, tag) values (1, 99, 99, 'dup') "
         "on conflict ignore returning id", {}),
        ("insert into items(id, grp, val, tag) values (2, 99, 99, 'rep'), "
         "(103, 1, 1, 'new') on conflict replace returning id, tag", {}),
    ],
    # insert-select from the read-only src + update arithmetic
    [
        ("insert into items(id, grp, val, tag) "
         "select id + 200, grp, val, tag from src where grp > 5 "
         "returning id", {}),
        ("update items set val = val + 1, tag = concat(tag, '!') "
         "where grp = 2 returning id, val, tag", {}),
        ("update items set grp = grp * 2 where id > 200", {}),
    ],
    # update ... from (unique join key => deterministic in both engines)
    [
        ("update items set grp = s.grp + 10, val = s.val "
         "from src as s where s.id = items.id returning id, grp, val", {}),
        ("delete from items where not (grp < 14)", {}),
    ],
    # three-valued WHERE on the nullable column
    [
        ("update items set tag = 'hasval' where val > 20", {}),
        ("delete from items where val < 25 returning id", {}),
    ],
    # r10: UPDATE ... FROM with IN/EXISTS conjuncts in WHERE (the
    # subquery narrows the TARGET side before the join; plain
    # conjuncts stay in the joined filter) — reference prints any
    # analyzable predicate (printer.ml:312-329)
    [
        ("update items set grp = s.grp + 20, val = s.val from src as s "
         "where s.id = items.id and items.id in (select id from src "
         "where grp > 5) returning id, grp, val", {}),
        ("update items set tag = concat(items.tag, '+') from src as s "
         "where s.id = items.id and not (items.id in "
         "(select id + 1 from src)) returning id, tag", {}),
        ("update items set val = s.val from src as s "
         "where s.id = items.id and exists (select true from src "
         "where grp > 6) returning id, val", {}),
    ],
    # r11: subquery conjuncts REFERENCING THE FROM RELATIONS — applied
    # after the join via the select compiler's semi/anti-join lowering
    # (previously an explicit engine error; the sql printer dialects
    # always accepted the form)
    [
        ("update items set grp = s.grp + 30 from src as s "
         "where s.id = items.id and s.grp in (select grp from src "
         "where grp > 5) returning id, grp", {}),
        ("update items set tag = concat(items.tag, '#') from src as s "
         "where s.id = items.id and not (s.val in "
         "(select val from src where val > 30)) returning id, tag", {}),
        ("update items set val = s.val + 1 from src as s "
         "where s.id = items.id and s.grp in (select grp from src) "
         "and items.id in (select id from src where grp > 3) "
         "returning id, val", {}),
    ],
    # subquery predicates (select-based DML matching path): IN, NOT IN
    # against a NULL-bearing subquery column (three-valued: matches
    # nothing), uncorrelated EXISTS gate
    [
        ("delete from items where id in (select id from src) returning id",
         {}),
        ("update items set tag = 'notin' "
         "where not (val in (select val from src)) returning id, tag", {}),
        ("update items set grp = grp + 1 "
         "where id in (select id + 3 from src where grp > 5)", {}),
        ("delete from items where exists (select true from src "
         "where grp > 99) returning id", {}),
    ],
    # late r14: IN value lists in DML WHERE/SET positions — plain
    # Column predicates (no join lowering), incl. the NOT IN
    # NULL-trap on the nullable val column
    [
        ("update items set tag = 'picked' where grp in (2, 4, 6) "
         "returning id, tag", {}),
        ("delete from items where id not in (1, 2, 3) "
         "and val not in (40, 41) returning id", {}),
        ("update items set grp = case when grp in (5, 7) then grp + 10 "
         "else grp end returning id, grp", {}),
    ],
    # r15 third wave: null-safe comparison and quantified predicates
    # in DML WHERE — UNKNOWN rows survive a quantified DELETE, and
    # IS DISTINCT FROM touches the NULL rows plain != would skip
    [
        ("update items set tag = 'nullsafe' "
         "where val is distinct from 40 returning id, tag", {}),
        ("delete from items where val > all (select val from src "
         "where val is not null) returning id", {}),
        ("update items set grp = grp + 5 "
         "where val <= any (select val from src where grp = 2) "
         "returning id, grp", {}),
        ("delete from items where id is not distinct from 3 "
         "returning id", {}),
    ],
]


@pytest.mark.parametrize("i", range(len(DIRECTED_PROGRAMS)))
def test_dml_directed(spark, tmp_path, i):
    run_program(spark, str(tmp_path), DIRECTED_PROGRAMS[i])


def test_duckdb_conflict_ignore_returning_deviation():
    """Pin the dialect difference the harness compensates for: DuckDB
    1.x returns the PROPOSED row from ON CONFLICT DO NOTHING ...
    RETURNING even when the insert is skipped; PostgreSQL (and this
    engine) return only actually-inserted rows. If a DuckDB upgrade
    aligns with PostgreSQL, this test fails and the harness filter
    (plus this pin) should be removed."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT PRIMARY KEY, v BIGINT)")
    con.execute("INSERT INTO t VALUES (1, 10)")
    got = con.execute(
        "INSERT INTO t VALUES (1, 99) ON CONFLICT DO NOTHING RETURNING id, v"
    ).fetchall()
    assert got == [(1, 99)]  # proposed row, NOT what the table holds
    assert con.execute("SELECT v FROM t").fetchone() == (10,)
    con.close()


# -- hypothesis DML program fuzzer -------------------------------------------

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @st.composite
    def _int_expr(draw, cols, depth=0):
        if depth >= 2 or draw(st.booleans()):
            return draw(
                st.sampled_from(list(cols) + [str(draw(st.integers(-5, 9)))])
            )
        op = draw(st.sampled_from(["+", "-", "*"]))
        a = draw(_int_expr(cols, depth + 1))
        b = draw(_int_expr(cols, depth + 1))
        return f"({a} {op} {b})"

    @st.composite
    def _pred(draw, depth=0):
        kind = draw(st.sampled_from(
            ["cmp", "cmp", "and", "or", "not", "null", "in_sub", "exists",
             "scalar_sub"]
            if depth < 2 else ["cmp", "null"]
        ))
        if kind == "cmp":
            op = draw(st.sampled_from(["=", "!=", "<", "<=", ">", ">="]))
            lhs = draw(st.sampled_from(["id", "grp", "val"]))
            return f"({lhs} {op} {draw(st.integers(-2, 12))})"
        if kind == "null":
            return draw(st.sampled_from(["(val is null)", "(val is not null)"]))
        if kind == "in_sub":
            # subquery predicates route DML through the select-based
            # matching path (round-9 parity work); the nullable src.val
            # column makes NOT IN go three-valued. r12: optionally a
            # CORRELATED conjunct (equality or theta, either
            # orientation) against the DML target
            neg = draw(st.sampled_from(["", "not "]))
            col = draw(st.sampled_from(["id", "grp", "val"]))
            sub = draw(st.sampled_from(["id", "grp", "val", "id + 1"]))
            conjs = []
            if draw(st.booleans()):
                conjs.append(
                    f"grp {draw(st.sampled_from(['<', '>', '=']))}"
                    f" {draw(st.integers(4, 8))}"
                )
            # correlated IN is conjunct-only by design (the compiler
            # raises for nested positions), so only draw correlation
            # at the root of the WHERE tree
            corr = draw(st.sampled_from(["", "=", "<", ">=", "!="])) \
                if depth == 0 else ""
            if corr:
                tcol = draw(st.sampled_from(["id", "grp"]))
                if draw(st.booleans()):
                    conjs.append(f"src.grp {corr} items.{tcol}")
                else:
                    conjs.append(f"items.{tcol} {corr} src.grp")
            w = (" where " + " and ".join(conjs)) if conjs else ""
            return f"({neg}{col} in (select {sub} from src{w}))"
        if kind == "exists":
            neg = draw(st.sampled_from(["", "not "]))
            conjs = [f"grp > {draw(st.integers(3, 9))}"]
            corr = draw(st.sampled_from(["", "=", "<=", ">"])) \
                if depth == 0 else ""
            if corr:
                if draw(st.booleans()):
                    conjs.append(f"src.id {corr} items.grp")
                else:
                    conjs.append(f"items.grp {corr} src.id")
            return (f"({neg}exists (select true from src where "
                    + " and ".join(conjs) + "))")
        if kind == "scalar_sub":
            # r11 scalar subqueries: global aggregate in a comparison
            # (group by () is the dialect's global-agg form); r12 adds
            # correlated conjuncts against the DML target — equality
            # AND theta ops (< <= > >= !=) both decorrelate
            agg = draw(st.sampled_from(
                ["max(grp)", "min(grp)", "count(1)", "min(id)"]
            ))
            op = draw(st.sampled_from(["<", "<=", ">", ">=", "="]))
            col = draw(st.sampled_from(["id", "grp", "val"]))
            conjs = []
            if draw(st.booleans()):
                conjs.append(f"grp > {draw(st.integers(3, 8))}")
            corr = draw(st.sampled_from(["", "=", "<", "<=", ">",
                                         ">=", "!="]))
            if corr:
                tcol = draw(st.sampled_from(["id", "grp"]))
                # outer side sometimes written on the left to
                # exercise the inner-first reorientation flip
                if draw(st.booleans()):
                    conjs.append(f"src.grp {corr} items.{tcol}")
                else:
                    conjs.append(f"items.{tcol} {corr} src.grp")
            w = (" where " + " and ".join(conjs)) if conjs else ""
            return (f"({col} {op} (select {agg} from src{w} "
                    f"group by ()))")
        if kind == "not":
            return f"(not {draw(_pred(depth + 1))})"
        return f"({draw(_pred(depth + 1))} {kind} {draw(_pred(depth + 1))})"

    _RET_PLAIN = ["id", "id, grp, val, tag", "id, grp + 1 as g2, val",
                  "id, concat(tag, '?') as t2"]

    @st.composite
    def _stmt(draw, state):
        kind = draw(st.sampled_from([
            "ins_values", "ins_conflict", "ins_set", "ins_select",
            "update", "update", "update_from", "delete",
        ]))
        params = {}

        def val_lit():
            v = draw(st.integers(-9, 99))
            return "null:int" if draw(st.integers(0, 3)) == 0 else str(v)

        def tag_lit():
            return "'" + draw(st.sampled_from("pqrstuv")) + "'"

        ret = (" returning " + draw(st.sampled_from(_RET_PLAIN))
               if draw(st.booleans()) else "")

        if kind == "ins_values":
            rows = []
            for _ in range(draw(st.integers(1, 2))):
                nid = state["fresh"]
                state["fresh"] += 1
                g = draw(st.integers(0, 9))
                if draw(st.integers(0, 4)) == 0:
                    params["p%d" % nid] = draw(st.integers(-9, 99))
                    v = f"?p{nid}"
                else:
                    v = val_lit()
                rows.append(f"({nid}, {g}, {v}, {tag_lit()})")
            return (f"insert into items(id, grp, val, tag) values "
                    f"{', '.join(rows)}{ret}"), params
        if kind == "ins_conflict":
            mode = draw(st.sampled_from(["ignore", "replace"]))
            rows = []
            used = set()
            for _ in range(draw(st.integers(1, 2))):
                cid = draw(st.integers(0, 8).filter(lambda x: x not in used))
                used.add(cid)
                rows.append(
                    f"({cid}, {draw(st.integers(0, 9))}, {val_lit()}, {tag_lit()})"
                )
            # conflict-ignore RETURNING must lead with plain id (harness
            # filters DuckDB's proposed-row deviation by id)
            r = ""
            if draw(st.booleans()):
                r = " returning id" if mode == "ignore" else (
                    " returning " + draw(st.sampled_from(_RET_PLAIN)))
            return (f"insert into items(id, grp, val, tag) values "
                    f"{', '.join(rows)} on conflict {mode}{r}"), params
        if kind == "ins_set":
            nid = state["fresh"]
            state["fresh"] += 1
            return (f"insert into items set id = {nid}, "
                    f"grp = {draw(st.integers(0, 9))}, val = {val_lit()}, "
                    f"tag = {tag_lit()}{ret}"), params
        if kind == "ins_select":
            off = state["off"]
            state["off"] += 100
            shift = draw(st.integers(0, 3))
            return (f"insert into items(id, grp, val, tag) "
                    f"select id + {off}, grp + {shift}, val, tag from src "
                    f"where grp >= {draw(st.integers(4, 8))}{ret}"), params
        if kind == "update":
            sets = []
            for col in draw(st.lists(
                st.sampled_from(["grp", "val", "tag"]),
                min_size=1, max_size=3, unique=True,
            )):
                if col == "grp":
                    sets.append(f"grp = {draw(_int_expr(('id', 'grp')))}")
                elif col == "val":
                    pick = draw(st.integers(0, 5))
                    if pick == 0:
                        sets.append("val = null:int")
                    elif pick == 1:
                        # r12: scalar subquery in SET position —
                        # uncorrelated or correlated (nullable target)
                        agg = draw(st.sampled_from(
                            ["max(val)", "min(id)", "count(1)"]))
                        corr = draw(st.sampled_from(
                            ["", " where src.grp = items.grp",
                             " where src.id < items.grp"]))
                        sets.append(
                            f"val = (select {agg} from src{corr} "
                            f"group by ())"
                        )
                    else:
                        sets.append(
                            f"val = {draw(_int_expr(('id', 'grp', 'val')))}"
                        )
                else:
                    sets.append(
                        f"tag = concat(tag, {tag_lit()})"
                        if draw(st.booleans()) else f"tag = {tag_lit()}"
                    )
            where = f" where {draw(_pred())}" if draw(st.booleans()) else ""
            return f"update items set {', '.join(sets)}{where}{ret}", params
        if kind == "update_from":
            k = draw(st.integers(0, 9))
            extra = (f" and items.grp < {draw(st.integers(0, 12))}"
                     if draw(st.booleans()) else "")
            # IN/EXISTS conjuncts in UPDATE ... FROM WHERE: target-
            # probing forms narrow before the join; r11 also allows
            # probes referencing the FROM relation (applied after the
            # join); qualified to avoid the id-name ambiguity DuckDB
            # would reject in the joined scope
            if draw(st.booleans()):
                neg = draw(st.sampled_from(["", "not "]))
                sub = draw(st.sampled_from(["id", "grp", "id + 1"]))
                w = (f" where grp > {draw(st.integers(4, 8))}"
                     if draw(st.booleans()) else "")
                probe = draw(st.sampled_from(
                    ["items.id", "s.id", "s.grp"]
                ))
                extra += (f" and ({neg}{probe} in "
                          f"(select {sub} from src{w}))")
            return (f"update items set grp = s.grp + {k}, val = s.val "
                    f"from src as s where s.id = items.id{extra}{ret}"), params
        # delete — always guarded by a predicate
        return f"delete from items where {draw(_pred())}{ret}", params

    @st.composite
    def _program(draw):
        state = {"fresh": 100, "off": 200}
        return [draw(_stmt(state)) for _ in range(draw(st.integers(2, 4)))]

    @settings(
        max_examples=N_EXAMPLES, deadline=None, derandomize=True,
        suppress_health_check=[HealthCheck.too_slow,
                               HealthCheck.function_scoped_fixture],
    )
    @given(_program())
    def test_dml_fuzz(spark, program):
        import tempfile

        with tempfile.TemporaryDirectory(prefix="sqlpp_dmlfuzz_") as d:
            run_program(spark, d, program)

except ImportError:  # pragma: no cover
    pass


# -- extension-surface fuzzers: MATCH variants / fieldsets / expr params -----

EXT_TABLES = ("region", "nation")


@pytest.fixture(scope="module")
def ext_engine(spark, sf_dir):
    eng = SqlppEngine(spark)
    for t in EXT_TABLES:
        eng.register_parquet(t, f"{sf_dir}/{t}.parquet")
    eng.add_decls(
        "create fieldset nat_fields(from nation as n) as "
        "select n.n_nationkey as key_, n.n_name as nm;"
        "create fieldset nat_agg(from nation) as "
        "select count(1) as cnt, max(nation.n_nationkey) as mx;"
    )
    return eng


@pytest.fixture(scope="module")
def ext_duck(sf_dir):
    con = duckdb.connect()
    for t in EXT_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def ext_differ(engine, duck, src, **params):
    key = lambda row: tuple(repr(v) for v in row)  # noqa: E731
    spark_rows = sorted(
        (tuple(r) for r in engine.fetch_list(src, **params)), key=key
    )
    sql = select_sql(analyze(engine.env, src), params or None)
    duck_rows = sorted((tuple(r) for r in duck.execute(sql).fetchall()), key=key)
    assert spark_rows == duck_rows, (
        f"\nsqlpp : {src}\nsql   : {sql}\n"
        f"spark : {spark_rows[:5]}\nduck  : {duck_rows[:5]}"
    )


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @st.composite
    def _nat_pred(draw, depth=0):
        kind = draw(st.sampled_from(
            ["cmp", "cmp", "and", "or", "not"] if depth < 2 else ["cmp"]
        ))
        if kind == "cmp":
            op = draw(st.sampled_from(["=", "!=", "<", "<=", ">", ">="]))
            col = draw(st.sampled_from(["n_nationkey", "n_regionkey"]))
            return f"({col} {op} {draw(st.integers(-1, 24))})"
        if kind == "not":
            return f"(not {draw(_nat_pred(depth + 1))})"
        return f"({draw(_nat_pred(depth + 1))} {kind} {draw(_nat_pred(depth + 1))})"

    _MATCH_SRC = (
        "match ?f with "
        "| ByKey ?k -> n_nationkey < ?k "
        "| ByRegion(?r, ?o) -> (n_regionkey = ?r or n_nationkey > ?o) "
        "| Between(?lo, ?hi) -> (n_nationkey >= ?lo and n_nationkey <= ?hi) "
        "| Odd -> mod(n_nationkey, 2) = 1 "
        "end"
    )

    @st.composite
    def _match_binding(draw):
        tag = draw(st.sampled_from(["ByKey", "ByRegion", "Between", "Odd"]))
        if tag == "ByKey":
            return ("ByKey", {"k": draw(st.integers(-2, 30))})
        if tag == "ByRegion":
            return ("ByRegion", {"r": draw(st.integers(0, 4)),
                                 "o": draw(st.integers(0, 24))})
        if tag == "Between":
            return ("Between", {"lo": draw(st.integers(0, 12)),
                                "hi": draw(st.integers(0, 24))})
        return "Odd"

    @settings(max_examples=N_EXAMPLES, deadline=None, derandomize=True,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(_match_binding(), _nat_pred(), st.booleans())
    def test_match_variant_fuzz(ext_engine, ext_duck, f, extra, scalar_pos):
        """MATCH variant params (analyze.ml:711-752): the chosen
        branch's plan — in WHERE position and in scalar (select-list)
        position — must agree between both lowerings for every tag and
        payload binding."""
        if scalar_pos:
            src = (f"select n_name, {_MATCH_SRC} as hit from nation "
                   f"where {extra}")
        else:
            src = (f"select n_name, n_nationkey from nation "
                   f"where {_MATCH_SRC} and {extra}")
        ext_differ(ext_engine, ext_duck, src, f=f)


    # -- correlation-boundary fuzzer (r13, VERDICT r12 ask #5) ---------------

    _NOTFLIP = {"=": "!=", "!=": "=", "<": ">=", "<=": ">",
                ">": "<=", ">=": "<"}

    def _and_props(a, b):
        # (ok, has, sp): AND keeps conjunct position
        return (a[0] and b[0], a[1] or b[1], a[2] and b[2])

    def _or_props(a, b):
        # OR: any correlated atom below loses conjunct position; the
        # split needs every correlated atom (now in flag position)
        # to be EQUALITY
        return ((a[0] and not a[1]) and (b[0] and not b[1]),
                a[1] or b[1], a[2] and b[2])

    @st.composite
    def _corr_pred(draw, depth=0):
        """Predicate tree over the region subquery scope with correlated
        atoms navigating to the enclosing nation scope. Returns
        (src, conjunct_ok, has_corr, splittable) of the predicate's
        NEGATION-NORMAL FORM — the analyzer's r13 _push_not runs before
        the lift, so NOT(cmp) is the flipped comparison and De Morgan
        swaps AND/OR. Each node therefore tracks its properties under
        BOTH polarities; `not` just swaps them.
        conjunct_ok — every correlated atom is a top-level AND conjunct
        (the direct lift path, ANY comparison op); splittable — the
        OR-split can decorrelate it (with the r13 theta flag joins
        EVERY comparison op splits, so comparison trees within the DNF
        cap are all supported — the flag kept for future boundaries)."""
        kind = draw(st.sampled_from(
            ["corr", "local", "and", "or", "not"] if depth < 2
            else ["corr", "local"]
        ))
        if kind == "corr":
            op = draw(st.sampled_from(["=", "!=", "<", "<=", ">", ">="]))
            outer = draw(st.sampled_from(
                ["nation.n_regionkey", "nation.n_regionkey + 1"]
            ))
            flip = draw(st.booleans())
            atom = (f"({outer} {op} r_regionkey)" if flip
                    else f"(r_regionkey {op} {outer})")
            return (atom, (True, True, True), (True, True, True))
        if kind == "local":
            op = draw(st.sampled_from(["=", "<", ">="]))
            props = (True, False, True)
            return (f"(r_regionkey {op} {draw(st.integers(-1, 5))})",
                    props, props)
        if kind == "not":
            src, pos, neg = draw(_corr_pred(depth + 1))
            return f"(not {src})", neg, pos
        l_src, l_pos, l_neg = draw(_corr_pred(depth + 1))
        r_src, r_pos, r_neg = draw(_corr_pred(depth + 1))
        if kind == "and":
            return (f"({l_src} and {r_src})",
                    _and_props(l_pos, r_pos), _or_props(l_neg, r_neg))
        return (f"({l_src} or {r_src})",
                _or_props(l_pos, r_pos), _and_props(l_neg, r_neg))

    @settings(max_examples=N_EXAMPLES, deadline=None, derandomize=True,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(_corr_pred(), st.booleans())
    def test_correlation_boundary_fuzz(ext_engine, ext_duck, pred, use_in):
        """Conjunct-only correlation → direct semi/anti join; OR-mixed
        EQUALITY correlation → the r13 EXISTS/IN-over-OR split + match
        flags — both must match DuckDB on the printed SQL. Everything
        else must raise its dedicated
        boundary error BEFORE execution (analysis or plan build) — wrong answers are never an option, silent acceptance
        neither."""
        src_frag, (conjunct_ok, has_corr, splittable), _neg = pred
        if use_in:
            src = ("select n_name from nation where n_regionkey in "
                   f"(select r_regionkey from region where {src_frag})")
        else:
            src = ("select n_name from nation where exists "
                   f"(select 1 as one from region where {src_frag})")
        if not has_corr or conjunct_ok or splittable:
            ext_differ(ext_engine, ext_duck, src)
        else:  # pragma: no cover — no comparison tree reaches here
            with pytest.raises(
                SqlppError,
                match="unsupported correlation|non-equality correlation"
                      "|top-level",
            ):
                ext_engine.fetch_list(src)

    @st.composite
    def _fieldset_query(draw):
        shape = draw(st.sampled_from(["plain", "alias", "agg", "mixed"]))
        where = draw(_nat_pred())
        if shape == "plain":
            return f"select ...nat_fields(nation) from nation where {where}"
        if shape == "alias":
            return (f"select ...nat_fields(n), n.n_regionkey from nation as n "
                    f"where {where}")
        if shape == "agg":
            return (f"select n_regionkey, ...nat_agg(nation) from nation "
                    f"where {where} group by n_regionkey")
        return (f"select ...nat_fields(nation), n_regionkey + 1 as rp "
                f"from nation where {where}")

    @settings(max_examples=N_EXAMPLES, deadline=None, derandomize=True,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(_fieldset_query())
    def test_fieldset_splice_fuzz(ext_engine, ext_duck, src):
        """Fieldset splices (analyze.ml:500-527): plain, aliased,
        aggregate and mixed splices through both lowerings."""
        ext_differ(ext_engine, ext_duck, src)

    @settings(max_examples=N_EXAMPLES, deadline=None, derandomize=True,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(_nat_pred())
    def test_expr_param_fuzz(ext_engine, ext_duck, p):
        """Expression params (Pty_expr, analyze.ml:468-473): a random
        predicate compiled through compile_expr_param (captured-scope
        re-analysis) must produce exactly the rows of the same
        predicate inlined in the source — the reference's defining
        semantics — as executed by DuckDB via the printer."""
        key = lambda row: tuple(repr(v) for v in row)  # noqa: E731
        prepared = ext_engine.prepare(
            "select n_name, n_nationkey from nation where ?cond : bool expr"
        )
        cond = ext_engine.compile_expr_param(prepared, p)
        got = sorted(
            (tuple(r) for r in prepared.df(cond=cond).collect()), key=key
        )
        inline = f"select n_name, n_nationkey from nation where {p}"
        sql = select_sql(analyze(ext_engine.env, inline))
        want = sorted(
            (tuple(r) for r in ext_duck.execute(sql).fetchall()), key=key
        )
        assert got == want, f"\npred  : {p}\nsql   : {sql}"

    # -- window-function fuzzer (r13) -------------------------------------

    @st.composite
    def _window_query(draw):
        fn = draw(st.sampled_from(
            ["row_number()", "rank()", "dense_rank()", "ntile(3)",
             "sum(n_nationkey)", "count(n_name)", "min(n_nationkey)",
             "max(n_nationkey)", "lag(n_name)", "lead(n_nationkey, 2)",
             "first_value(n_name)", "last_value(n_nationkey)"]
        ))
        part = draw(st.sampled_from(["", "partition by n_regionkey "]))
        # ranking/offset fns need ORDER BY; always give one, with a
        # unique tiebreak so results are total-ordered in both engines
        order = draw(st.sampled_from(
            ["order by n_nationkey",
             "order by n_regionkey desc, n_nationkey",
             "order by n_name, n_nationkey"]
        ))
        frame_agg = fn.split("(")[0] == "count"  # only count may drop ORDER BY
        if fn.split("(")[0] in ("sum", "min", "max") and draw(st.booleans()):
            frame_agg = True
        if frame_agg and draw(st.booleans()):
            order = ""  # whole-partition frame
        spec = f"{part}{order}".strip()
        if not spec:
            spec = "order by n_nationkey"
        return (f"select n_nationkey, {fn} over ({spec}) as w "
                f"from nation order by n_nationkey")

    @settings(max_examples=N_EXAMPLES, deadline=None, derandomize=True,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(_window_query())
    def test_window_fuzz(ext_engine, ext_duck, src):
        """Random window applications (r13): every generated query must
        execute and match DuckDB through the printed SQL."""
        ext_differ(ext_engine, ext_duck, src)

except ImportError:  # pragma: no cover
    pass
