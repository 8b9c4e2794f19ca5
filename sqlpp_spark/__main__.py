"""CLI — the management verbs of the reference's sqlpp_manage
(sqlpp_manage.ml:259-312), re-expressed over Spark:

    python -m sqlpp_spark fmt     [--require decls.sqlpp] 'SELECT ...'
    python -m sqlpp_spark analyze [--require decls.sqlpp] 'SELECT ...'
    python -m sqlpp_spark plan    [...] 'SELECT ...'   # backend plan
                                                       # (the `sqlpp-sql` analog)
    python -m sqlpp_spark query   [...] [--param NAME=VALUE ...] 'SELECT ...'

``fmt`` and ``analyze`` are pure-frontend (no Spark session — instant).
``plan`` prints the optimized physical plan instead of backend SQL
text: Spark DataFrames ARE our backend SQL. ``query`` executes and
prints JSON rows (Dynamic.exec analog, sqlpp.ml:388-401).

--sf-dir registers the driver parquet tables; --require loads sqlpp
decls (CREATE TABLE/QUERY/FIELDSET) first. --param values parse as
sqlpp literals (int/float/bool/'string'), matching the reference's
param parsing (sqlpp_manage.ml:184-197).
"""

from __future__ import annotations

import argparse
import sys


def _parse_param(v: str):
    if v in ("true", "false"):
        return v == "true"
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        pass
    if len(v) >= 2 and v[0] == "'" and v[-1] == "'":
        return v[1:-1]
    return v


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] in ("versions", "vacuum"):
        vp = argparse.ArgumentParser(prog="sqlpp_spark")
        vp.add_argument("verb", choices=["versions", "vacuum"])
        vp.add_argument("table_dir", help="managed <table>.parquet directory")
        vargs = vp.parse_args(argv)
        from sqlpp_spark.engine import list_versions, vacuum_managed

        if vargs.verb == "versions":
            for v in list_versions(vargs.table_dir):
                print(v)
            return 0
        for v in vacuum_managed(vargs.table_dir):
            print(f"removed _v_{v}")
        return 0
    if argv and argv[0] in ("migrate", "migrate-ls", "migrate-show"):
        mp = argparse.ArgumentParser(prog="sqlpp_spark")
        mp.add_argument("verb", choices=["migrate", "migrate-ls", "migrate-show"])
        mp.add_argument("src", nargs="?", default=None, help="migration name (migrate-show)")
        mp.add_argument("--migrations", required=True, help="python file defining MIGRATIONS")
        mp.add_argument("--root", required=True, help="managed-table directory")
        return _migrate_verbs(mp.parse_args(argv))

    ap = argparse.ArgumentParser(prog="sqlpp_spark")
    ap.add_argument("verb", choices=["fmt", "analyze", "sql", "plan", "query"])
    ap.add_argument("src", help="sqlpp statement text (or - for stdin)")
    ap.add_argument("--require", action="append", default=[], help="decls file")
    ap.add_argument("--param", action="append", default=[], metavar="NAME=VALUE")
    ap.add_argument("--sf-dir", default=None, help="register driver parquet tables")
    ap.add_argument("--dialect", default="duckdb",
                    choices=["duckdb", "sqlite", "postgres"],
                    help="SQL dialect for the sql verb")
    args = ap.parse_args(argv)
    if args.dialect != "duckdb" and args.verb != "sql":
        ap.error("--dialect applies only to the sql verb")

    src = sys.stdin.read() if args.src == "-" else args.src

    from sqlpp_spark.frontend.analyze import Env
    from sqlpp_spark.frontend.errors import SqlppError
    from sqlpp_spark.frontend.parser import parse_query
    from sqlpp_spark.frontend.printer import format_elaborated, format_query

    env = Env()
    for path in args.require:
        with open(path) as f:
            env.add(f.read())

    try:
        if args.verb == "fmt":
            print(format_query(parse_query(src)))
            return 0

        if args.verb == "analyze":
            from sqlpp_spark.frontend.analyze import analyze

            if args.sf_dir:
                _register_testdata_env(env, args.sf_dir)
            print(format_elaborated(analyze(env, src)))
            return 0

        if args.verb == "sql":
            # the reference's sqlpp-sql verb: print the elaborated
            # query as ANSI (DuckDB-compatible) SQL
            from sqlpp_spark.compiler.sqlgen import statement_sql

            if args.sf_dir:
                _register_testdata_env(env, args.sf_dir)
            params = {}
            for p in args.param:
                name, _, value = p.partition("=")
                params[name] = _parse_param(value)
            print(statement_sql(env, src, params, dialect=args.dialect))
            return 0

        # plan / query need Spark
        from sqlpp_spark.engine import SqlppEngine
        from sqlpp_spark.session import get_spark, load_tables

        spark = get_spark("sqlpp_spark_cli")
        engine = SqlppEngine(spark, env)
        if args.sf_dir:
            for name, df in load_tables(spark, args.sf_dir).items():
                engine.register_df(name, df)
        params = {}
        for p in args.param:
            name, _, value = p.partition("=")
            params[name] = _parse_param(value)

        if args.verb == "plan":
            df = engine.query(src, **params)
            df.explain("formatted")  # prints to stdout
            return 0

        df = engine.exec(src, **params)
        if df is not None:
            for line in df.toJSON().collect():
                print(line)
        return 0
    except SqlppError as e:
        print(str(e), file=sys.stderr)
        return 1


def _migrate_verbs(args) -> int:
    """migrate / migrate-ls / migrate-show (sqlpp_manage.ml:259-312):
    the migrations file is a python module defining ``MIGRATIONS``
    (a list of sqlpp_spark.manage.Migration)."""
    import runpy

    from sqlpp_spark.frontend.errors import SqlppError

    ns = runpy.run_path(args.migrations)
    migrations = ns.get("MIGRATIONS")
    if migrations is None:
        print(f"{args.migrations} defines no MIGRATIONS list", file=sys.stderr)
        return 2

    from sqlpp_spark.engine import SqlppEngine
    from sqlpp_spark.manage import Migrate
    from sqlpp_spark.session import get_spark

    engine = SqlppEngine(get_spark("sqlpp_spark_migrate"))
    m = Migrate(engine, args.root)
    try:
        if args.verb == "migrate":
            for name in m.migrate(migrations):
                print(f"applied {name}")
            return 0
        if args.verb == "migrate-ls":
            for name, done in m.ls(migrations):
                print(f"[{'x' if done else ' '}] {name}")
            return 0
        if args.src is None:
            print("migrate-show needs a migration name", file=sys.stderr)
            return 2
        print(m.show(migrations, args.src))
        return 0
    except SqlppError as e:
        print(str(e), file=sys.stderr)
        return 1


def _register_testdata_env(env, sf_dir: str) -> None:
    """Frontend-only table registration from parquet footers (no Spark
    session: pyarrow reads the schema)."""
    import os

    import pyarrow.parquet as pq

    from sqlpp_spark.frontend.types import ty as mk_ty

    _PA = {
        "bool": "bool", "string": "string", "large_string": "string",
        "int8": "int", "int16": "int", "int32": "int", "int64": "int",
        "float": "float", "double": "float", "date32[day]": "date",
    }
    for fn in sorted(os.listdir(sf_dir)):
        if not fn.endswith(".parquet"):
            continue
        name = fn[: -len(".parquet")]
        schema = pq.read_schema(os.path.join(sf_dir, fn))
        cols = {}
        for field in schema:
            t = str(field.type)
            kind = _PA.get(t)
            if kind is None and t.startswith("timestamp"):
                kind = "datetime"
            if kind is None:
                continue
            cols[field.name] = mk_ty(kind, not field.nullable)
        env.add_table(name, cols)


if __name__ == "__main__":
    sys.exit(main())
