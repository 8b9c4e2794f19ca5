"""Pretty-printer for the sqlpp dialect AST.

Two modes, mirroring the reference's printer/format split:
- ``format_query(ast)`` — source formatting (the `sqlpp-fmt` verb,
  sqlpp_manage.ml:291-300): prints the raw parsed AST back as
  canonical sqlpp text.
- ``format_elaborated(info)`` — prints an ANALYZED query with the
  analyzer's rewrites visible (the `sqlpp-analyze` verb,
  sqlpp_manage.ml:275-289 via sqlpp.ml:32-60): scope-qualified
  references, injected generated fields, and the inferred row type.
  This is the golden-test workhorse format.

Operator precedence mirrors the reference's classify_app'
(syntax.ml:373-386) so parenthesization round-trips.
"""

from __future__ import annotations

from typing import List

from sqlpp_spark.frontend import ast as A

# precedence per syntax.ml:373-386
_PREC = {
    "-u": 100, "u-": 100,
    "*": 90, "/": 90,
    "+": 80, "-": 80,
    ">": 70, ">=": 70, "<": 70, "<=": 70,
    "=": 60, "!=": 60, "is null": 60, "is not null": 60,
    "not": 50,
    "and": 40,
    "or": 30,
}
_BINOPS = {"=", "!=", ">", ">=", "<", "<=", "+", "-", "*", "/", "and", "or"}


def _ord_sfx(o) -> str:
    """desc + explicit nulls only when the source wrote them — fmt
    round-trips what the user typed (the PINNED default lives in the
    engine/SQL printers, not here)."""
    sfx = " DESC" if o.desc else ""
    if o.nulls:
        sfx += f" NULLS {o.nulls.upper()}"
    return sfx


def expr_str(e: A.Expr, prec: int = 0) -> str:
    s, p = _expr(e)
    if p < prec:
        return f"({s})"
    return s


def _expr(e: A.Expr):
    if isinstance(e, A.ELit):
        if e.lit_kind == "string":
            v = str(e.value).replace("'", "''")
            return f"'{v}'", 1000
        if e.lit_kind == "bool":
            return ("true" if e.value else "false"), 1000
        return str(e.value), 1000
    if isinstance(e, A.ENull):
        return "null", 1000
    if isinstance(e, A.EName):
        return e.name, 1000
    if isinstance(e, A.ERef):
        return f"{e.rel}.{e.name}", 1000
    if isinstance(e, A.ENav):
        inner, _ = _expr(e.expr)
        return f"{e.scope}.{inner}", 1000
    if isinstance(e, A.EParam):
        s = f"?{e.name}"
        if e.ascribed is not None:
            s = f"{s} : {e.ascribed}"
        return s, 1000
    if isinstance(e, A.EAscribe):
        if e.convert:  # CAST/TRY_CAST (r15): function-call form roundtrips
            fn = "try_cast" if getattr(e, "safe", False) else "cast"
            return f"{fn}({expr_str(e.expr, 0)} as {e.to_ty.kind})", 1000
        return f"{expr_str(e.expr, 1000)} : {e.to_ty}", 60
    if isinstance(e, A.EIn):
        lhs = (
            expr_str(e.exprs[0], 1000)
            if len(e.exprs) == 1
            else "(" + ", ".join(expr_str(x) for x in e.exprs) + ")"
        )
        kw = "not in" if e.negated else "in"
        return f"{lhs} {kw} ({_body_str(e.select)})", 60
    if isinstance(e, A.EInList):
        items = ", ".join(expr_str(x) for x in e.items)
        kw = "not in" if e.negated else "in"
        return f"{expr_str(e.expr, 61)} {kw} ({items})", 60
    if isinstance(e, A.EExists):
        return f"exists ({_body_str(e.select)})", 1000
    if isinstance(e, A.EScalarSub):
        return f"({_body_str(e.select)})", 1000
    if isinstance(e, A.EQuant):
        return (
            f"{expr_str(e.expr, 61)} {e.op} {e.quant} "
            f"({_body_str(e.select)})",
            60,
        )
    if isinstance(e, A.EMatch):
        parts = [f"match ?{e.param} with"]
        for b in e.branches:
            args = "".join(f" ?{p}" for p in b.params)
            parts.append(f"| {b.tag}{args} -> {expr_str(b.body)}")
        parts.append("end")
        return " ".join(parts), 1000
    if isinstance(e, A.EInterval):  # r16
        return f"interval {e.n} {e.unit}", 1000
    if isinstance(e, A.EWindow):
        args = ", ".join(expr_str(a) for a in e.args)
        if e.nulls_mode is not None:
            # inside the parens — the DuckDB placement (r16)
            args += f" {e.nulls_mode} nulls"
        if e.ref is not None:  # r16: unresolved named-window reference
            return f"{e.fn.lower()}({args}) over {e.ref}", 1000
        spec = _window_spec_str(e.partition_by, e.order_by, e.frame)
        return f"{e.fn.lower()}({args}) over ({spec})", 1000
    if isinstance(e, A.EApp):
        return _app(e)
    raise TypeError(f"expr_str: {type(e).__name__}")


def _window_spec_str(partition_by, order_by, frame) -> str:
    """Window spec body, shared by OVER (..) and the WINDOW clause."""
    spec = []
    if partition_by:
        spec.append(
            "partition by " + ", ".join(expr_str(p) for p in partition_by)
        )
    if order_by:
        spec.append(
            "order by "
            + ", ".join(
                expr_str(o.expr) + _ord_sfx(o).lower() for o in order_by
            )
        )
    if frame is not None:
        def fb(bound) -> str:
            kind, n = bound
            if kind in ("preceding", "following"):
                return f"{n} {kind}"
            return kind

        spec.append(
            f"{frame.mode} between {fb(frame.start)} and {fb(frame.end)}"
        )
    return " ".join(spec)


def _body_str(sel) -> str:
    """Subquery body: plain Select or (r15) compound SetOp."""
    if isinstance(sel, A.SetOp):
        return setop_str(sel)
    return select_str(sel)


def _app(e: A.EApp):
    fn = e.fn.lower()
    if fn in _BINOPS and len(e.args) == 2:
        p = _PREC[fn]
        op = e.fn if fn not in ("and", "or") else fn.upper()
        return (
            f"{expr_str(e.args[0], p)} {op} {expr_str(e.args[1], p + 1)}",
            p,
        )
    if fn in ("-u", "u-") and len(e.args) == 1:
        # the parser emits "-u"; accept the legacy "u-" spelling too
        return f"-{expr_str(e.args[0], 100)}", 100
    if fn == "not" and len(e.args) == 1:
        return f"NOT {expr_str(e.args[0], 51)}", 50
    if fn == "is null" and len(e.args) == 1:
        return f"{expr_str(e.args[0], 61)} IS NULL", 60
    if fn == "is not null" and len(e.args) == 1:
        return f"{expr_str(e.args[0], 61)} IS NOT NULL", 60
    if fn in ("is distinct from", "is not distinct from") and len(e.args) == 2:
        return (
            f"{expr_str(e.args[0], 61)} {fn.upper()} "
            f"{expr_str(e.args[1], 61)}",
            60,
        )
    if fn == "case":
        n = len(e.args)
        parts = ["CASE"]
        for i in range(n // 2):
            parts.append(
                f"WHEN {expr_str(e.args[2 * i])} "
                f"THEN {expr_str(e.args[2 * i + 1])}"
            )
        if n % 2 == 1:
            parts.append(f"ELSE {expr_str(e.args[n - 1])}")
        parts.append("END")
        return " ".join(parts), 1000
    args = ", ".join(expr_str(a) for a in e.args)
    return f"{e.fn}({args})", 1000


def _field_str(f, elaborated: bool) -> str:
    if isinstance(f, A.Field):
        if elaborated and not f.is_used and not f.is_lazy:
            pass  # analyze-mode still prints; emission pruning is Catalyst's
        s = expr_str(f.expr)
        prefix = "with " if f.is_lazy else ""
        name = f.out_name if (elaborated and f.out_name) else f.name
        if name:
            return f"{prefix}{s} AS {name}"
        return f"{prefix}{s}"
    if isinstance(f, A.FieldWithScope):
        return f"withscope {'.'.join(f.path)} AS {f.alias}"
    if isinstance(f, A.FieldFieldset):
        args = ", ".join(".".join(p) for p in f.args)
        prefix = "with " if f.is_lazy else ""
        return f"{prefix}...{f.name}({args})" if args else f"{prefix}...{f.name}()"
    raise TypeError(f"_field_str: {type(f).__name__}")


def _from_str(fr) -> str:
    if fr is None:
        return ""
    if isinstance(fr, A.FromTable):
        return f"{fr.table} AS {fr.alias}" if fr.alias else fr.table
    if isinstance(fr, A.FromSelect):
        if isinstance(fr.select, A.RecursiveQuery):
            inner = format_query(fr.select)  # r17 recursive derived
        elif isinstance(fr.select, A.SetOp):
            inner = setop_str(fr.select)
        else:
            inner = select_str(fr.select)
        kw = "lateral " if getattr(fr, "lateral", False) else ""
        return f"{kw}({inner}) AS {fr.alias}"
    if isinstance(fr, A.FromPivot):
        aggs = getattr(fr, "aggs", None) or [(fr.agg_fn, fr.agg_arg, None)]
        agg_txt = ", ".join(
            f"{fn}({expr_str(arg)})" + (f" as {nm}" if nm else "")
            for fn, arg, nm in aggs
        )
        if getattr(fr, "dynamic", False) and not fr.values:
            in_txt = ""
        else:
            vals = ", ".join(
                expr_str(v) + (f" as {n}" if n else "")
                for v, n in fr.values
            )
            in_txt = f" in ({vals})"
        return (
            f"{_from_str(fr.src)} pivot ({agg_txt} "
            f"for {fr.pivot_col}{in_txt}) as {fr.alias}"
        )
    if isinstance(fr, A.FromUnpivot):
        mode = "include nulls " if fr.include_nulls else ""
        val_names = getattr(fr, "val_names", None) or [fr.val_name]
        vtxt = (
            val_names[0] if len(val_names) == 1
            else "(" + ", ".join(val_names) + ")"
        )

        def grp(g) -> str:
            cs = g if isinstance(g, tuple) else (g,)
            return cs[0] if len(cs) == 1 else "(" + ", ".join(cs) + ")"

        cols = ", ".join(
            grp(g) + (f" as '{l}'" if l is not None else "")
            for g, l in fr.cols
        )
        return (
            f"{_from_str(fr.src)} unpivot {mode}({vtxt} for "
            f"{fr.name_name} in ({cols})) as {fr.alias}"
        )
    if isinstance(fr, A.FromSeries):
        args = [expr_str(fr.start), expr_str(fr.stop)]
        if fr.step is not None:
            args.append(expr_str(fr.step))
        return (
            f"generate_series({', '.join(args)}) AS {fr.alias}({fr.col})"
        )
    if isinstance(fr, A.FromJoin):
        kw = {
            "inner": "JOIN", "left": "LEFT JOIN", "right": "RIGHT JOIN",
            "full": "FULL JOIN", "cross": "CROSS JOIN",
        }[fr.kind]
        on = f" ON {expr_str(fr.on)}" if fr.on is not None else ""
        return f"{_from_str(fr.left)} {kw} {_from_str(fr.right)}{on}"
    raise TypeError(f"_from_str: {type(fr).__name__}")


def setop_str(node: "A.SetOp", elaborated: bool = False) -> str:
    """Compound select (r14). Branches never carry their own tail, so
    bare concatenation round-trips through the parser (INTERSECT binds
    tighter on re-parse, matching the tree)."""
    kw = {"union": "UNION", "intersect": "INTERSECT", "except": "EXCEPT"}[
        node.op
    ]
    if node.all:
        kw += " ALL"
    left = (
        setop_str(node.left, elaborated)
        if isinstance(node.left, A.SetOp)
        else select_str(node.left, elaborated)
    )
    right = (
        setop_str(node.right, elaborated)
        if isinstance(node.right, A.SetOp)
        else select_str(node.right, elaborated)
    )
    parts = [f"{left} {kw} {right}"]
    if getattr(node, "order_all", None) and not node.order_by:
        sfx = " DESC" if node.order_all == "desc" else ""
        parts.append(f"ORDER BY ALL{sfx}")
    if node.order_by:
        items = [
            expr_str(o.expr) + _ord_sfx(o)
            for o in node.order_by
        ]
        parts.append("ORDER BY " + ", ".join(items))
    if node.limit is not None:
        parts.append(f"LIMIT {expr_str(node.limit)}")
    if node.offset is not None:
        parts.append(f"OFFSET {expr_str(node.offset)}")
    return " ".join(parts)


def select_str(sel: A.Select, elaborated: bool = False) -> str:
    parts: List[str] = ["SELECT"]
    if sel.distinct:
        parts.append("DISTINCT")
    if getattr(sel, "distinct_on", None):
        parts.append(
            "DISTINCT ON ("
            + ", ".join(expr_str(x) for x in sel.distinct_on)
            + ")"
        )
    fields = [_field_str(f, elaborated) for f in sel.fields]
    if sel.is_open:
        fields.append("...")
    parts.append(", ".join(fields))
    if sel.from_ is not None:
        parts.append(f"FROM {_from_str(sel.from_)}")
    if sel.where is not None:
        parts.append(f"WHERE {expr_str(sel.where)}")
    if sel.group_by is not None:
        kind = getattr(sel, "group_kind", "plain")
        if getattr(sel, "group_all", False) and not sel.group_by:
            # raw (pre-analysis) GROUP BY ALL roundtrips verbatim;
            # the analyzer resolves it to concrete exprs in place
            parts.append("GROUP BY ALL")
        elif kind in ("rollup", "cube"):
            parts.append(
                f"GROUP BY {kind.upper()} ("
                + ", ".join(expr_str(g) for g in sel.group_by)
                + ")"
            )
        elif kind == "sets":
            sets = ", ".join(
                "(" + ", ".join(
                    expr_str(sel.group_by[i]) for i in idxs
                ) + ")"
                for idxs in (sel.group_sets or [])
            )
            parts.append(f"GROUP BY GROUPING SETS ({sets})")
        elif len(sel.group_by) == 0 and not getattr(sel, "group_all", False):
            parts.append("GROUP BY ()")
        else:
            parts.append("GROUP BY " + ", ".join(expr_str(g) for g in sel.group_by))
    if sel.having is not None:
        parts.append(f"HAVING {expr_str(sel.having)}")
    if getattr(sel, "windows", None):
        parts.append(
            "WINDOW " + ", ".join(
                f"{nw.name} AS ("
                + _window_spec_str(nw.partition_by, nw.order_by, nw.frame)
                + ")"
                for nw in sel.windows
            )
        )
    if sel.qualify is not None:
        parts.append(f"QUALIFY {expr_str(sel.qualify)}")
    if getattr(sel, "order_all", None) and not sel.order_by:
        sfx = " DESC" if sel.order_all == "desc" else ""
        parts.append(f"ORDER BY ALL{sfx}")
    elif sel.order_by:
        items = [
            expr_str(o.expr) + _ord_sfx(o)
            for o in sel.order_by
        ]
        parts.append("ORDER BY " + ", ".join(items))
    if sel.limit is not None:
        parts.append(f"LIMIT {expr_str(sel.limit)}")
    if sel.offset is not None:
        parts.append(f"OFFSET {expr_str(sel.offset)}")
    return " ".join(parts)


def _returning_str(fields) -> str:
    if not fields:
        return ""
    return " RETURNING " + ", ".join(_field_str(f, False) for f in fields)


def format_query(q) -> str:
    """Canonical text for a parsed statement (the `fmt` verb)."""
    if isinstance(q, A.Select):
        return select_str(q)
    if isinstance(q, A.SetOp):
        return setop_str(q)
    if isinstance(q, A.RecursiveQuery):
        def _body(b):
            return setop_str(b) if isinstance(b, A.SetOp) else select_str(b)

        parts = []
        for m in q.members:
            cols = f" ({', '.join(m.columns)})" if m.columns else ""
            kw = "union all" if m.union_all else "union"
            parts.append(
                f"{m.name}{cols} as ({_body(m.base)} {kw} {_body(m.step)})"
            )
        return f"with recursive {', '.join(parts)} {_body(q.main)}"
    if isinstance(q, A.Insert):
        cols = ", ".join(q.columns)
        if q.values is not None:
            rows = ", ".join(
                "(" + ", ".join(expr_str(v) for v in row) + ")" for row in q.values
            )
            body = f"VALUES {rows}"
        else:
            body = (
                setop_str(q.select)
                if isinstance(q.select, A.SetOp)
                else select_str(q.select)
            )
        oc = ""
        if q.on_conflict:
            oc = f" ON CONFLICT {q.on_conflict.upper()}"
        return f"INSERT INTO {q.table}({cols}) {body}{oc}{_returning_str(q.returning)}"
    if isinstance(q, A.Update):
        sets = ", ".join(f"{c} = {expr_str(e)}" for c, e in q.sets)
        fr = f" FROM {_from_str(q.from_)}" if q.from_ is not None else ""
        wh = f" WHERE {expr_str(q.where)}" if q.where is not None else ""
        return f"UPDATE {q.table} SET {sets}{fr}{wh}{_returning_str(q.returning)}"
    if isinstance(q, A.Delete):
        wh = f" WHERE {expr_str(q.where)}" if q.where is not None else ""
        return f"DELETE FROM {q.table}{wh}{_returning_str(q.returning)}"
    # decls / DDL
    if isinstance(q, A.DeclTable):
        cols = ", ".join(_col_def_str(c) for c in q.columns)
        return f"CREATE TABLE {q.name}({cols})"
    if isinstance(q, A.DeclQuery):
        body = (
            setop_str(q.select)
            if isinstance(q.select, A.SetOp)
            else select_str(q.select)
        )
        return f"CREATE QUERY {q.name} AS {body}"
    if isinstance(q, A.DeclFieldset):
        ps = ", ".join(f"FROM {_sty_str(p.sty)} AS {p.alias}" for p in q.params)
        fields = ", ".join(_field_str(f, False) for f in q.select.fields)
        return f"CREATE FIELDSET {q.name}({ps}) AS SELECT {fields}"
    if isinstance(q, A.DdlDropTable):
        return f"DROP TABLE {q.table}"
    if isinstance(q, A.DdlRenameTable):
        return f"ALTER TABLE {q.table} RENAME TO {q.new_name}"
    if isinstance(q, A.DdlRenameColumn):
        return f"ALTER TABLE {q.table} RENAME COLUMN {q.column} TO {q.new_name}"
    if isinstance(q, A.DdlDropColumn):
        return f"ALTER TABLE {q.table} DROP COLUMN {q.column}"
    if isinstance(q, A.DdlAddColumn):
        return f"ALTER TABLE {q.table} ADD COLUMN {_col_def_str(q.column)}"
    raise TypeError(f"format_query: {type(q).__name__}")


def _col_def_str(c: A.ColumnDef) -> str:
    s = f"{c.name} {c.ty}"
    if c.primary_key:
        s += " PRIMARY KEY"
    if c.autoincrement:
        s += " AUTOINCREMENT"
    if c.default is not None:
        s += f" DEFAULT {expr_str(c.default)}"
    return s


def _sty_str(sty) -> str:
    if isinstance(sty, A.STyTable):
        return sty.table
    entries = []
    for kind, n, item in sty.entries:
        if kind == "scope":
            entries.append(f"from {_sty_str(item)} as {n}")
        else:
            entries.append(f"{n} {item}")
    return "(" + ", ".join(entries) + ")"


def format_elaborated(info) -> str:
    """Analyzed-query text + inferred row type — the `analyze` verb.

    Shows the elaborated projection (scope-qualified ERef navigation,
    generated ``_i`` fields the analyzer injected into open subqueries)
    followed by the inferred row, nullability included — the format the
    reference's golden tests diff (test/sqlpp/nested.t etc.)."""
    import copy as _copy

    if isinstance(info.select, A.SetOp):
        # compound select (r14): branches are plain elaborated selects
        lines = [setop_str(info.select, elaborated=True)]
    else:
        sel = _copy.copy(info.ctx.select)
        sel.fields = info.ctx.fields  # elaborated projection incl. generated _i
        lines = [select_str(sel, elaborated=True)]
    row = ", ".join(f"{n}: {t}" for n, t in info.row)
    lines.append(f"row: ({row})")
    if info.params:
        ps = ", ".join(
            f"?{n}: {e.ty if e.ty is not None else '_'}" for n, e in info.params.items()
        )
        lines.append(f"params: ({ps})")
    return "\n".join(lines)
