"""Migrations + management verbs (SURVEY.md §2.9).

The reference tracks named, ordered migrations in a ``_migrate`` table
and applies each migration's actions transactionally
(sqlpp_manage.ml:40-131, sqlpp_sqlite_manage.ml:19-42). Our port of the
*semantics* to Spark-managed parquet tables:

- a migration is ``Migration(name, actions)`` where each action is
  ``Define(ddl_src)`` (schema evolution, applied to env AND storage) or
  ``Exec(stmt_src)`` (DML run through the engine)
- applied migration names are recorded in a ``_migrate`` parquet table
  (id, name, applied_at); ``migrate()`` skips already-applied ones and
  errors on history divergence (a recorded name missing from the
  migration list), like the reference's ordered-prefix check
- there is no cross-table transaction on plain parquet: each action is
  applied atomically (full-table rewrite), and a failure stops the run
  at that action — documented trade-off vs the reference's SQLite
  transactional apply. On Delta/Iceberg the same runner gains real
  transactions with no code change at call sites.

DDL application to storage:
- ADD COLUMN  → project existing data with the new column (default
  expr if declared, else NULL)
- DROP COLUMN → project it away
- RENAME      → metadata-only env update + column rename projection
- DROP TABLE  → remove the managed directory
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass
from typing import Iterable, List, Optional

from pyspark.sql import DataFrame, functions as F

from sqlpp_spark.engine import SqlppEngine
from sqlpp_spark.frontend import ast as A
from sqlpp_spark.frontend.errors import SqlppError
from sqlpp_spark.frontend.parser import parse_decls


@dataclass
class Define:
    """Schema-evolution action: sqlpp DDL source (one or more
    statements)."""

    src: str


@dataclass
class Exec:
    """DML action: an INSERT/UPDATE/DELETE statement."""

    src: str


@dataclass
class Migration:
    name: str
    actions: List[object]  # Define | Exec


class Migrate:
    """Ordered-migration runner over a SqlppEngine."""

    TRACK = "_migrate"

    def __init__(self, engine: SqlppEngine, root: str):
        self.engine = engine
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- tracking table ----------------------------------------------------

    def _track_path(self) -> str:
        return os.path.join(self.root, f"{self.TRACK}.parquet")

    def applied(self) -> List[str]:
        path = self._track_path()
        if not os.path.isdir(path):
            return []
        rows = (
            self.engine.spark.read.parquet(path)
            .orderBy("id")
            .select("name")
            .collect()
        )
        return [r.name for r in rows]

    def _record(self, idx: int, name: str) -> None:
        spark = self.engine.spark
        row = spark.createDataFrame(
            [(idx, name)], "id int, name string"
        ).withColumn("applied_at", F.current_timestamp())
        mode = "append" if os.path.isdir(self._track_path()) else "overwrite"
        row.write.mode(mode).parquet(self._track_path())

    # -- apply -------------------------------------------------------------

    def migrate(self, migrations: Iterable[Migration]) -> List[str]:
        """Apply pending migrations in order; returns the names applied
        this run. Errors if recorded history diverges from the given
        list (same ordered-prefix rule as the reference runner).
        Already-applied migrations replay their ENV effects only (a
        fresh engine resuming an existing root must see the evolved
        schema without re-touching storage)."""
        migrations = list(migrations)
        done = self.applied()
        for i, name in enumerate(done):
            if i >= len(migrations) or migrations[i].name != name:
                raise SqlppError(
                    f"migration history diverged: applied {name!r} not at "
                    f"position {i} of the migration list"
                )
            self._replay_env(migrations[i])
        newly: List[str] = []
        for i in range(len(done), len(migrations)):
            m = migrations[i]
            for act in m.actions:
                self._apply_action(act)
            self._record(i, m.name)
            newly.append(m.name)
        return newly

    def ls(self, migrations: Iterable[Migration]) -> List[tuple]:
        """(name, applied?) pairs — the `migrate-ls` verb."""
        done = set(self.applied())
        return [(m.name, m.name in done) for m in migrations]

    def show(self, migrations: Iterable[Migration], name: str) -> str:
        """Render a migration's actions — the `migrate-show` verb."""
        for m in migrations:
            if m.name == name:
                out = []
                for act in m.actions:
                    tag = "define" if isinstance(act, Define) else "exec"
                    out.append(f"-- {tag}\n{act.src.strip()}")
                return "\n".join(out)
        raise SqlppError(f"no such migration: {name}")

    def _replay_env(self, m: Migration) -> None:
        """Re-apply a previously-applied migration's schema effects to
        the (fresh) engine env + catalog, without touching storage."""
        eng = self.engine
        for act in m.actions:
            if not isinstance(act, Define):
                continue  # Exec effects live in the data already
            for ddl in parse_decls(act.src):
                if isinstance(ddl, A.DeclTable):
                    if ddl.name not in eng.env.tables:
                        eng.env.add_decl(ddl)
                elif isinstance(ddl, (A.DeclQuery, A.DeclFieldset)):
                    eng.env.add_decl(ddl)
                elif not self._env_ddl_applied(ddl):
                    eng.env.add_ddl(ddl)
        # (re)bind managed storage for every table now in the env
        for name in list(eng.env.tables):
            path = os.path.join(self.root, f"{name}.parquet")
            if os.path.isdir(path) and name not in eng.managed_paths:
                eng.managed_paths[name] = path
                eng.catalog[name] = eng._read_managed_path(path)

    def _env_ddl_applied(self, ddl) -> bool:
        """Replay idempotence: did this evolution already reach the
        env (same engine ran the migration earlier in-process)?"""
        tables = self.engine.env.tables
        if isinstance(ddl, A.DdlDropTable):
            return ddl.table not in tables
        if isinstance(ddl, A.DdlRenameTable):
            return ddl.table not in tables and ddl.new_name in tables
        ti = tables.get(ddl.table)
        if ti is None:
            return False
        if isinstance(ddl, A.DdlRenameColumn):
            return ddl.column not in ti.columns and ddl.new_name in ti.columns
        if isinstance(ddl, A.DdlDropColumn):
            return ddl.column not in ti.columns
        if isinstance(ddl, A.DdlAddColumn):
            return ddl.column.name in ti.columns
        return False

    def _apply_action(self, act) -> None:
        if isinstance(act, Exec):
            self.engine.exec(act.src)
            return
        if not isinstance(act, Define):
            raise SqlppError(f"unknown migration action {type(act).__name__}")
        for ddl in parse_decls(act.src):
            self._apply_ddl(ddl)

    # -- DDL → env + managed storage --------------------------------------

    def _apply_ddl(self, ddl) -> None:
        eng = self.engine
        if isinstance(ddl, A.DeclTable):
            eng.env.add_decl(ddl)
            path = os.path.join(self.root, f"{ddl.name}.parquet")
            if not os.path.isdir(path):
                from sqlpp_spark.compiler.compile import spark_type
                from pyspark.sql import types as T

                schema = T.StructType.fromDDL(
                    ", ".join(
                        f"{c.name} {spark_type(c.ty)}"
                        + (" NOT NULL" if c.ty.non_null else "")
                        for c in ddl.columns
                    )
                )
                empty = eng.spark.createDataFrame([], schema)
                eng.create_managed(ddl.name, path, empty)
            return
        if isinstance(ddl, (A.DeclQuery, A.DeclFieldset)):
            eng.env.add_decl(ddl)
            return

        # evolution statements need the current managed data
        eng.env.add_ddl(ddl)
        if isinstance(ddl, A.DdlDropTable):
            path = eng.managed_paths.pop(ddl.table, None)
            eng.catalog.pop(ddl.table, None)
            if path and os.path.isdir(path):
                shutil.rmtree(path)
            return

        path = eng.managed_paths.get(ddl.table)
        if path is None:
            return  # env-only table (no storage to evolve)
        df = eng._read_managed_path(path)
        if isinstance(ddl, A.DdlRenameTable):
            new_path = os.path.join(os.path.dirname(path), f"{ddl.new_name}.parquet")
            del eng.managed_paths[ddl.table]
            eng.catalog.pop(ddl.table, None)
            shutil.move(path, new_path)
            eng.managed_paths[ddl.new_name] = new_path
            eng.catalog[ddl.new_name] = eng._read_managed_path(new_path)
            return
        if isinstance(ddl, A.DdlRenameColumn):
            out = df.withColumnRenamed(ddl.column, ddl.new_name)
        elif isinstance(ddl, A.DdlDropColumn):
            out = df.drop(ddl.column)
        elif isinstance(ddl, A.DdlAddColumn):
            from sqlpp_spark.compiler.compile import Bindings, Compiler, spark_type
            from sqlpp_spark.frontend.analyze import Analyzer, SelectCtx

            st = spark_type(ddl.column.ty)
            if ddl.column.default is not None:
                an = Analyzer(eng.env)
                ctx = SelectCtx(A.Select())
                elab, _ = an.infer_expr(ctx, ddl.column.default)
                col = Compiler(eng.spark, eng.catalog).expr(elab, Bindings({}), {})
            else:
                col = F.lit(None)
            out = df.withColumn(ddl.column.name, col.cast(st))
        else:
            raise SqlppError(f"unknown DDL {type(ddl).__name__}")
        eng._rewrite(ddl.table, path, out)
