"""DDL evolution, migrations, printer, and CLI verbs (SURVEY.md §2.9).

Mirrors the reference's migration test shape (test/sqlpp_sqlite/db.ml:
chained migrations incl. column-type change via add/copy/drop) without
copying it.
"""

from __future__ import annotations

import os

import pytest

from sqlpp_spark.engine import SqlppEngine
from sqlpp_spark.frontend import ast as A
from sqlpp_spark.frontend.analyze import Env, analyze
from sqlpp_spark.frontend.errors import SqlppError
from sqlpp_spark.frontend.parser import parse_decls, parse_query
from sqlpp_spark.frontend.printer import format_elaborated, format_query
from sqlpp_spark.manage import Define, Exec, Migrate, Migration

SCHEMA = "create table users(id int not null primary key, name string not null, age int)"


# ---------------------------------------------------------------------------
# DDL parsing + env evolution (no Spark)
# ---------------------------------------------------------------------------


def test_ddl_parse_forms():
    decls = parse_decls(
        "drop table t; alter table t rename to u;"
        " alter table t rename column a to b;"
        " alter table t drop column c;"
        " alter table t add column d int not null default 7"
    )
    kinds = [type(d).__name__ for d in decls]
    assert kinds == [
        "DdlDropTable", "DdlRenameTable", "DdlRenameColumn",
        "DdlDropColumn", "DdlAddColumn",
    ]
    add = decls[-1]
    assert add.column.name == "d" and add.column.ty.non_null
    assert add.column.default.value == 7


def test_env_ddl_evolution():
    env = Env()
    env.add(SCHEMA)
    env.add_ddl(parse_decls("alter table users add column email string")[0])
    assert "email" in env.tables["users"].columns
    env.add_ddl(parse_decls("alter table users rename column email to mail")[0])
    assert "mail" in env.tables["users"].columns
    assert "email" not in env.tables["users"].columns
    env.add_ddl(parse_decls("alter table users drop column mail")[0])
    assert "mail" not in env.tables["users"].columns
    env.add_ddl(parse_decls("alter table users rename to people")[0])
    assert "people" in env.tables and "users" not in env.tables
    env.add_ddl(parse_decls("drop table people")[0])
    assert env.tables == {}


def test_env_ddl_errors():
    env = Env()
    env.add(SCHEMA)
    with pytest.raises(SqlppError, match="no such column"):
        env.add_ddl(parse_decls("alter table users drop column nope")[0])
    with pytest.raises(SqlppError, match="already exists"):
        env.add_ddl(parse_decls("alter table users add column name string")[0])
    with pytest.raises(SqlppError, match="no such table"):
        env.add_ddl(parse_decls("drop table ghost")[0])


# ---------------------------------------------------------------------------
# Printer (fmt + analyze verbs, no Spark)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "src,expected",
    [
        (
            "select id, name from users where id = 1 order by name desc limit 3",
            "SELECT id, name FROM users WHERE id = 1 ORDER BY name DESC LIMIT 3",
        ),
        (
            "select count(id) as n from users group by ()",
            "SELECT count(id) AS n FROM users GROUP BY ()",
        ),
        (
            "select a + b * c as x from t",
            "SELECT a + b * c AS x FROM t",
        ),
        (
            "select (a + b) * c as x from t",
            "SELECT (a + b) * c AS x FROM t",
        ),
        (
            "insert into users(id, name) values (1, 'ann') on conflict ignore",
            "INSERT INTO users(id, name) VALUES (1, 'ann') ON CONFLICT IGNORE",
        ),
        (
            "update users set age = age + 1 where id = 2 returning id",
            "UPDATE users SET age = age + 1 WHERE id = 2 RETURNING id",
        ),
        ("delete from users where age is null", "DELETE FROM users WHERE age IS NULL"),
        (
            "alter table users add column email string default 'x'",
            "ALTER TABLE users ADD COLUMN email STRING NULL DEFAULT 'x'",
        ),
    ],
)
def test_fmt_round_trip(src, expected):
    q = parse_query(src) if not src.startswith("alter") else parse_decls(src)[0]
    out = format_query(q)
    assert out == expected
    # canonical output re-parses to the same canonical output (fixpoint)
    q2 = parse_query(out) if not out.startswith("ALTER") else parse_decls(out)[0]
    assert format_query(q2) == out


def test_fmt_decls():
    decls = parse_decls(
        "create table t(a int not null primary key, b string);"
        " create query q as select a from t;"
        " create fieldset fs(from t as x) as select x.a as a"
    )
    assert format_query(decls[0]) == (
        "CREATE TABLE t(a INT NOT NULL PRIMARY KEY, b STRING NULL)"
    )
    assert format_query(decls[1]) == "CREATE QUERY q AS SELECT a FROM t"
    assert format_query(decls[2]) == (
        "CREATE FIELDSET fs(FROM t AS x) AS SELECT x.a AS a"
    )


def test_analyze_prints_row_and_nullability():
    env = Env()
    env.add(SCHEMA)
    out = format_elaborated(analyze(env, "select id, age from users where id = ?x"))
    assert "row: (id: INT NOT NULL, age: INT NULL)" in out
    assert "?x: INT NULL" in out


def test_analyze_left_join_nullable_row():
    env = Env()
    env.add(SCHEMA)
    env.add("create table pets(owner_id int not null, pet string not null)")
    out = format_elaborated(
        analyze(
            env,
            "select u.id as id, p.pet as pet from users as u "
            "left join pets as p on u.id = p.owner_id",
        )
    )
    # LEFT JOIN nullifies the right scope (analyze.ml:801-805)
    assert "pet: STRING NULL" in out


# ---------------------------------------------------------------------------
# Migrations over managed parquet (Spark)
# ---------------------------------------------------------------------------


MIGRATIONS = [
    Migration("init", [Define(SCHEMA)]),
    Migration(
        "seed",
        [Exec("insert into users(id, name, age) values (1, 'ann', 30), (2, 'bob', 41)")],
    ),
    Migration(
        "add-email",
        [
            Define("alter table users add column email string"),
            Exec("update users set email = 'unknown' where email is null"),
        ],
    ),
]


@pytest.fixture()
def mig(spark, tmp_path):
    engine = SqlppEngine(spark)
    return Migrate(engine, str(tmp_path / "db")), engine


def test_migrate_applies_in_order(mig):
    m, engine = mig
    applied = m.migrate(MIGRATIONS)
    assert applied == ["init", "seed", "add-email"]
    rows = {r.id: r for r in engine.fetch_list("select id, name, email from users")}
    assert rows[1].email == "unknown" and rows[2].name == "bob"
    # idempotent: second run applies nothing
    assert m.migrate(MIGRATIONS) == []
    assert m.ls(MIGRATIONS) == [("init", True), ("seed", True), ("add-email", True)]


def test_migrate_incremental_and_divergence(mig):
    m, engine = mig
    assert m.migrate(MIGRATIONS[:2]) == ["init", "seed"]
    assert m.migrate(MIGRATIONS) == ["add-email"]
    with pytest.raises(SqlppError, match="diverged"):
        m.migrate([MIGRATIONS[0], Migration("other", [])])


def test_migrate_column_type_change_chain(mig, spark):
    """The reference's hardest migration shape: change a column's type
    via add + copy + drop + rename (test/sqlpp_sqlite/db.ml)."""
    m, engine = mig
    chain = MIGRATIONS[:2] + [
        Migration(
            "age-to-string",
            [
                Define("alter table users add column age2 string"),
                Exec("update users set age2 = toString(age)"),
                Define(
                    "alter table users drop column age;"
                    " alter table users rename column age2 to age"
                ),
            ],
        )
    ]
    m.migrate(chain)
    assert engine.env.tables["users"].columns["age"].kind == "string"
    rows = {r.id: r.age for r in engine.fetch_list("select id, age from users")}
    assert rows == {1: "30", 2: "41"}


def test_migrate_show(mig):
    m, _ = mig
    out = m.show(MIGRATIONS, "add-email")
    assert "alter table users add column email" in out
    assert "-- exec" in out and "-- define" in out


def test_migrate_resume_fresh_engine(spark, tmp_path):
    """A NEW engine pointed at an existing migration root replays env
    effects (schema incl. later DDL) without re-running storage
    actions — queries work immediately."""
    root = str(tmp_path / "db")
    e1 = SqlppEngine(spark)
    Migrate(e1, root).migrate(MIGRATIONS)

    e2 = SqlppEngine(spark)
    m2 = Migrate(e2, root)
    assert m2.migrate(MIGRATIONS) == []  # nothing new
    assert "email" in e2.env.tables["users"].columns  # DDL replayed
    rows = {r.id: r.email for r in e2.fetch_list("select id, email from users")}
    assert rows == {1: "unknown", 2: "unknown"}


def test_cli_migrate_verbs(capsys, spark, tmp_path):
    from sqlpp_spark.__main__ import main

    mig_file = tmp_path / "migs.py"
    mig_file.write_text(
        "from sqlpp_spark.manage import Define, Exec, Migration\n"
        "MIGRATIONS = [\n"
        "    Migration('init', [Define(\"create table t(id int not null primary key, v string)\")]),\n"
        "    Migration('seed', [Exec(\"insert into t(id, v) values (1, 'a')\")]),\n"
        "]\n"
    )
    root = str(tmp_path / "db")
    rc = main(["migrate", "--migrations", str(mig_file), "--root", root])
    out = capsys.readouterr().out
    assert rc == 0 and "applied init" in out and "applied seed" in out

    rc = main(["migrate-ls", "--migrations", str(mig_file), "--root", root])
    out = capsys.readouterr().out
    assert rc == 0 and "[x] init" in out and "[x] seed" in out

    rc = main(["migrate-show", "seed", "--migrations", str(mig_file), "--root", root])
    out = capsys.readouterr().out
    assert rc == 0 and "insert into t" in out


def test_ddl_drop_table_removes_storage(mig, tmp_path):
    m, engine = mig
    m.migrate([MIGRATIONS[0]])
    path = engine.managed_paths["users"]
    assert os.path.isdir(path)
    m.migrate([MIGRATIONS[0], Migration("drop", [Define("drop table users")])])
    assert not os.path.isdir(path)
    assert "users" not in engine.env.tables


# ---------------------------------------------------------------------------
# CLI (frontend verbs in-process; no Spark)
# ---------------------------------------------------------------------------


def test_error_caret_rendering():
    """Located errors render a source excerpt with a caret at the
    offending range (report.ml:39-72 semantics) — multi-line sources
    get the right line number and column."""
    env = Env()
    env.add(SCHEMA)
    with pytest.raises(SqlppError) as e:
        analyze(env, "select id, nope from users")
    msg = str(e.value)
    assert "line 1, characters 11-15" in msg
    assert "│            ⮬ no such column: nope" in msg

    with pytest.raises(SqlppError) as e:
        analyze(env, "select id,\n       count(id)\nfrom users")
    msg = str(e.value)
    assert "line 2," in msg and "count(id)" in msg and "⮬" in msg


def test_cli_fmt(capsys, tmp_path):
    from sqlpp_spark.__main__ import main

    rc = main(["fmt", "select id from users where id=1"])
    assert rc == 0
    assert capsys.readouterr().out.strip() == "SELECT id FROM users WHERE id = 1"


def test_cli_analyze_with_require(capsys, tmp_path):
    from sqlpp_spark.__main__ import main

    decls = tmp_path / "schema.sqlpp"
    decls.write_text(SCHEMA)
    rc = main(["analyze", "--require", str(decls), "select id, age from users"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "row: (id: INT NOT NULL, age: INT NULL)" in out


def test_cli_plan_and_query_verbs(capsys, spark, sf_dir, tmp_path):
    """plan prints a physical plan; query executes and prints JSON rows.
    Reuses the session fixture (getOrCreate inside the CLI)."""
    from sqlpp_spark.__main__ import main

    rc = main(
        ["plan", "--sf-dir", sf_dir,
         "select r_name from region where r_regionkey = 1"]
    )
    out = capsys.readouterr().out
    assert rc == 0 and "Physical Plan" in out and "PushedFilters" in out

    rc = main(
        ["query", "--sf-dir", sf_dir, "--param", "k=1",
         "select r_regionkey, r_name from region where r_regionkey = ?k"]
    )
    out = capsys.readouterr().out
    assert rc == 0
    import json

    rows = [json.loads(line) for line in out.strip().splitlines()]
    assert rows and rows[0]["r_regionkey"] == 1


def test_fmt_parse_print_fixpoint_property():
    """Property: for generated well-formed selects, format∘parse is a
    fixpoint (canonical text re-parses to itself)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    names = st.sampled_from(["a", "b", "c", "tbl", "x1"])
    lits = st.one_of(
        st.integers(0, 99).map(str),
        st.sampled_from(["'s'", "true", "false", "null : int"]),
    )
    atoms = st.one_of(names, lits)

    def binop(children):
        return st.tuples(
            children, st.sampled_from(["+", "-", "*", "/", "=", "<", "and", "or"]), children
        ).map(lambda t: f"({t[0]} {t[1]} {t[2]})")

    exprs = st.recursive(atoms, binop, max_leaves=6)

    @settings(max_examples=60, deadline=None)
    @given(e1=exprs, e2=exprs, desc=st.booleans(), lim=st.integers(1, 9))
    def check(e1, e2, desc, lim):
        src = f"select {e1} as f1, {e2} as f2 from t where {e1} = {e2} " \
              f"order by f1 {'desc' if desc else ''} limit {lim}"
        once = format_query(parse_query(src))
        twice = format_query(parse_query(once))
        assert once == twice

    check()


def test_cli_error_exit_code(capsys, tmp_path):
    from sqlpp_spark.__main__ import main

    decls = tmp_path / "schema.sqlpp"
    decls.write_text(SCHEMA)
    rc = main(["analyze", "--require", str(decls), "select nope from users"])
    assert rc == 1
    assert "nope" in capsys.readouterr().err


# ---------------------------------------------------------------------------
# Versioned commit protocol (crash atomicity)
# ---------------------------------------------------------------------------


def _mk_users(spark, tmp_path):
    root = str(tmp_path / "db")
    eng = SqlppEngine(spark)
    Migrate(eng, root).migrate([
        Migration("init", [
            Define(SCHEMA),
            Exec("insert into users(id, name, age) values (1, 'ann', 30)"),
        ]),
    ])
    return eng, root


def test_rewrite_commits_new_version_and_gcs_old(spark, tmp_path):
    eng, root = _mk_users(spark, tmp_path)
    path = eng.managed_paths["users"]
    cur = os.path.join(path, "_CURRENT")
    v_before = open(cur).read().strip()
    eng.exec("update users set age = 31 where id = 1")
    v_after = open(cur).read().strip()
    assert v_after != v_before
    # predecessor kept one cycle for open readers, nothing older
    versions = sorted(d for d in os.listdir(path) if d.startswith("_v_"))
    assert versions == sorted([v_before, v_after])
    assert [r.age for r in eng.fetch_list("select age from users")] == [31]


def test_crash_before_pointer_flip_preserves_old_version(spark, tmp_path):
    """An orphan version dir (crash between data write and pointer
    flip) must be invisible to readers and GC'd by the next commit."""
    eng, root = _mk_users(spark, tmp_path)
    path = eng.managed_paths["users"]
    cur = os.path.join(path, "_CURRENT")
    committed = open(cur).read().strip()
    # simulate the crash: a newer version dir exists, pointer unmoved
    orphan = os.path.join(path, "_v_999")
    eng.spark.range(1).write.parquet(orphan)

    e2 = SqlppEngine(spark)
    Migrate(e2, root).migrate([Migration("init", [Define(SCHEMA)])])
    rows = e2.fetch_list("select id, name, age from users")
    assert [tuple(r) for r in rows] == [(1, "ann", 30)]  # old version served
    assert open(cur).read().strip() == committed
    e2.exec("delete from users where id = 99")  # no-op DML -> new commit
    assert not os.path.isdir(orphan)  # orphan GC'd at commit
    assert [r.id for r in e2.fetch_list("select id from users")] == [1]


def test_failed_rewrite_leaves_table_intact(spark, tmp_path):
    """If the new version's write job dies, the pointer never moves and
    the table still serves the last committed version."""
    from sqlpp_spark.engine import commit_version

    eng, root = _mk_users(spark, tmp_path)
    path = eng.managed_paths["users"]
    cur = os.path.join(path, "_CURRENT")
    committed = open(cur).read().strip()

    def boom(_d):
        raise RuntimeError("executor lost")

    with pytest.raises(RuntimeError, match="executor lost"):
        commit_version(path, boom)
    assert open(cur).read().strip() == committed
    assert [r.id for r in eng.fetch_list("select id from users")] == [1]


# -- migration-level transaction (all-or-nothing apply) ---------------------


def test_migration_crash_between_actions_rolls_back(spark, tmp_path):
    """A failure between two actions of ONE migration must leave no
    trace: the first action's write stays invisible (no _CURRENT flip),
    the migration is unrecorded, and a clean re-run applies everything
    — matching the reference's per-migration DB transaction
    (sqlpp_manage.ml:40-131)."""
    eng, root = _mk_users(spark, tmp_path)

    class Boom(Exception):
        pass

    class FailingAction:
        """Duck-typed action that detonates mid-migration."""
        src = "boom"

    mig = Migrate(eng, root)
    bad = Migration("grow", [
        Exec("insert into users(id, name, age) values (2, 'bob', 40)"),
        FailingAction(),
    ])
    with pytest.raises(SqlppError, match="unknown migration action"):
        mig.migrate([Migration("init", [
            Define(SCHEMA),
            Exec("insert into users(id, name, age) values (1, 'ann', 30)"),
        ]), bad])

    # fresh engine sees NOTHING of the failed migration
    e2 = SqlppEngine(spark)
    m2 = Migrate(e2, root)
    assert m2.applied() == ["init"]
    m2._replay_env(Migration("init", [Define(SCHEMA)]))
    rows = [tuple(r) for r in e2.fetch_list("select id, name, age from users")]
    assert rows == [(1, "ann", 30)]

    # and the migration applies cleanly once fixed
    good = Migration("grow", [
        Exec("insert into users(id, name, age) values (2, 'bob', 40)"),
        Exec("update users set age = 31 where id = 1"),
    ])
    e3 = SqlppEngine(spark)
    applied = Migrate(e3, root).migrate([
        Migration("init", [
            Define(SCHEMA),
            Exec("insert into users(id, name, age) values (1, 'ann', 30)"),
        ]),
        good,
    ])
    assert applied == ["grow"]
    rows = sorted(
        tuple(r) for r in e3.fetch_list("select id, name, age from users")
    )
    assert rows == [(1, "ann", 31), (2, "bob", 40)]


def test_migration_crash_after_manifest_rolls_forward(spark, tmp_path):
    """Once the _TXN manifest exists the migration is committed: a
    crash before the intents finish applying must roll FORWARD on the
    next migrate() — storage effects and the history record appear
    together."""
    import json as _json

    eng, root = _mk_users(spark, tmp_path)
    mig = Migrate(eng, root)

    # run the second migration but "crash" before intents apply:
    # capture the manifest the commit would write, then bail
    eng2 = SqlppEngine(spark)
    mig2 = Migrate(eng2, root)
    mig2._recover()
    done = mig2.applied()
    assert done == ["init"]
    mig2._replay_env(Migration("init", [Define(SCHEMA)]))
    m = Migration("grow", [
        Exec("insert into users(id, name, age) values (2, 'bob', 40)"),
        Exec("update users set age = 99 where id = 2"),
    ])
    mig2._begin_txn()
    for act in m.actions:
        mig2._apply_action(act)
    mig2._record(1, m.name, eng2._txn)
    txn = eng2._txn
    eng2._txn = None
    manifest = mig2._txn_manifest()
    with open(manifest, "w") as fh:
        _json.dump({"intents": txn.intents}, fh)
    # crash here: manifest on disk, no _CURRENT flipped yet

    e3 = SqlppEngine(spark)
    m3 = Migrate(e3, root)
    applied = m3.migrate([
        Migration("init", [
            Define(SCHEMA),
            Exec("insert into users(id, name, age) values (1, 'ann', 30)"),
        ]),
        m,
    ])
    assert applied == []  # rolled forward, not re-run
    assert m3.applied() == ["init", "grow"]
    rows = sorted(
        tuple(r) for r in e3.fetch_list("select id, name, age from users")
    )
    assert rows == [(1, "ann", 30), (2, "bob", 99)]


def _crash_after_manifest(spark, tmp_path):
    """Build the crash-window state: _TXN manifest on disk, staged
    version dirs not yet flipped. Returns (root, users_path, grow)."""
    import json as _json

    eng, root = _mk_users(spark, tmp_path)
    eng2 = SqlppEngine(spark)
    mig2 = Migrate(eng2, root)
    mig2._recover()
    mig2._replay_env(Migration("init", [Define(SCHEMA)]))
    m = Migration("grow", [
        Exec("insert into users(id, name, age) values (2, 'bob', 40)"),
    ])
    mig2._begin_txn()
    for act in m.actions:
        mig2._apply_action(act)
    mig2._record(1, m.name, eng2._txn)
    txn = eng2._txn
    eng2._txn = None
    with open(mig2._txn_manifest(), "w") as fh:
        _json.dump({"intents": txn.intents}, fh)
    return root, eng2.managed_paths["users"], m


def test_vacuum_skips_staged_versions_of_pending_txn(spark, tmp_path):
    """vacuum_managed drops only versions OLDER than the active one;
    staged dirs of a crashed-pending transaction (always newer) must
    survive a vacuum run inside the crash window so roll-forward still
    works."""
    from sqlpp_spark.engine import vacuum_managed

    root, path, m = _crash_after_manifest(spark, tmp_path)
    active = open(os.path.join(path, "_CURRENT")).read().strip()
    staged = [
        d for d in os.listdir(path)
        if d.startswith("_v_") and int(d[3:]) > int(active[3:])
    ]
    assert staged  # the pending txn staged at least one newer version
    removed = vacuum_managed(path)
    assert all(f"_v_{n}" not in staged for n in removed)
    for d in staged:
        assert os.path.isdir(os.path.join(path, d))

    # roll-forward still works after the vacuum
    e3 = SqlppEngine(spark)
    m3 = Migrate(e3, root)
    m3.migrate([
        Migration("init", [
            Define(SCHEMA),
            Exec("insert into users(id, name, age) values (1, 'ann', 30)"),
        ]),
        m,
    ])
    assert m3.applied() == ["init", "grow"]
    rows = sorted(tuple(r) for r in e3.fetch_list("select id, name from users"))
    assert rows == [(1, "ann"), (2, "bob")]


def test_recover_surfaces_remediation_when_staged_dir_lost(spark, tmp_path):
    """If a staged dir referenced by the pending manifest is deleted
    externally, migrate() raises a clear remediation error (restore the
    dir or delete the manifest) rather than a bare FileNotFoundError
    forever."""
    import shutil as _shutil

    import pytest as _pytest

    root, path, m = _crash_after_manifest(spark, tmp_path)
    active = open(os.path.join(path, "_CURRENT")).read().strip()
    for d in os.listdir(path):
        if d.startswith("_v_") and int(d[3:]) > int(active[3:]):
            _shutil.rmtree(os.path.join(path, d))
    e3 = SqlppEngine(spark)
    with _pytest.raises(SqlppError, match="roll forward|Remediate"):
        Migrate(e3, root).migrate([Migration("init", [Define(SCHEMA)]), m])


def test_migration_txn_rename_then_write_translates_paths(spark, tmp_path):
    """RENAME TABLE deferred to commit: a later write in the SAME
    migration stages into the old physical path and the intent
    translation carries it through the move."""
    eng, root = _mk_users(spark, tmp_path)
    mig = Migrate(eng, root)
    applied = mig.migrate([
        Migration("init", [
            Define(SCHEMA),
            Exec("insert into users(id, name, age) values (1, 'ann', 30)"),
        ]),
        Migration("rename-and-write", [
            Define("alter table users rename to people"),
            Exec("insert into people(id, name, age) values (2, 'bob', 40)"),
        ]),
    ])
    assert applied == ["rename-and-write"]
    assert not os.path.isdir(os.path.join(root, "users.parquet"))
    assert os.path.isfile(
        os.path.join(root, "people.parquet", "_CURRENT")
    )
    rows = sorted(tuple(r) for r in eng.fetch_list("select id, name from people"))
    assert rows == [(1, "ann"), (2, "bob")]

    # a fresh engine resumes against the renamed table
    e2 = SqlppEngine(spark)
    Migrate(e2, root).migrate([
        Migration("init", [
            Define(SCHEMA),
            Exec("insert into users(id, name, age) values (1, 'ann', 30)"),
        ]),
        Migration("rename-and-write", [
            Define("alter table users rename to people"),
            Exec("insert into people(id, name, age) values (2, 'bob', 40)"),
        ]),
    ])
    assert sorted(r.id for r in e2.fetch_list("select id from people")) == [1, 2]


def test_time_travel_and_vacuum(spark, tmp_path):
    """Version utilities: the predecessor version stays readable after
    a rewrite (time travel one back); vacuum drops everything but the
    active version and the table still serves correctly."""
    from sqlpp_spark.engine import (
        list_versions,
        read_managed_version,
        vacuum_managed,
    )

    eng, root = _mk_users(spark, tmp_path)
    path = eng.managed_paths["users"]
    eng.exec("update users set age = 31 where id = 1")
    versions = list_versions(path)
    assert len(versions) == 2  # active + predecessor
    old = read_managed_version(spark, path, versions[0]).collect()
    new = read_managed_version(spark, path, versions[1]).collect()
    assert [r.age for r in old] == [30] and [r.age for r in new] == [31]
    assert [r.age for r in read_managed_version(spark, path).collect()] == [31]

    removed = vacuum_managed(path)
    assert removed == [versions[0]]
    assert list_versions(path) == [versions[1]]
    assert [r.age for r in eng.fetch_list("select age from users")] == [31]
    with pytest.raises(FileNotFoundError, match="not retained"):
        read_managed_version(spark, path, versions[0])


def test_cli_versions_and_vacuum(capsys, spark, tmp_path):
    from sqlpp_spark.__main__ import main

    eng, root = _mk_users(spark, tmp_path)
    eng.exec("update users set age = 31 where id = 1")
    path = eng.managed_paths["users"]

    assert main(["versions", path]) == 0
    vs = [int(x) for x in capsys.readouterr().out.split()]
    assert len(vs) == 2

    assert main(["vacuum", path]) == 0
    out = capsys.readouterr().out
    assert f"removed _v_{vs[0]}" in out
    assert main(["versions", path]) == 0
    assert [int(x) for x in capsys.readouterr().out.split()] == [vs[1]]
