"""Recursive-descent parser for the sqlpp dialect.

Grammar per sqlpp/parser.mly (see SURVEY.md §2.1-§2.7). Operator
precedence follows syntax.ml:373-386: OR 30 < AND 40 < NOT 50 <
(= != IS NULL IN) 60 < comparisons 70 < (+ -) 80 < (* /) 90 <
unary- 100. We deliberately FIX the reference's parser bug where
binary `*` is parsed as `-` (parser.mly:355, SURVEY.md §2.11).

Flexible lists (trailing commas) are allowed everywhere the reference
allows them (flex_list in parser.mly).
"""

from __future__ import annotations

from typing import List, Optional

from sqlpp_spark.frontend import ast as A
from sqlpp_spark.frontend.errors import Loc, SqlppError
from sqlpp_spark.frontend.lexer import Token, tokenize
from sqlpp_spark.frontend.types import Ty, parse_ty_name


class Parser:
    def __init__(self, src: str):
        self.src = src
        self.toks = tokenize(src)
        self.i = 0

    # -- token helpers ----------------------------------------------------

    @property
    def cur(self) -> Token:
        return self.toks[self.i]

    def peek(self, k: int = 1) -> Token:
        j = min(self.i + k, len(self.toks) - 1)
        return self.toks[j]

    def advance(self) -> Token:
        t = self.cur
        self.i += 1
        return t

    def at_kw(self, *kws: str) -> bool:
        return self.cur.kind == "kw" and self.cur.value.lower() in kws

    def eat_kw(self, *kws: str) -> bool:
        if self.at_kw(*kws):
            self.advance()
            return True
        return False

    def expect_kw(self, kw: str) -> Token:
        if not self.at_kw(kw):
            self.fail(f"expected {kw.upper()}")
        return self.advance()

    def at_punct(self, p: str) -> bool:
        return self.cur.kind == "punct" and self.cur.value == p

    def eat_punct(self, p: str) -> bool:
        if self.at_punct(p):
            self.advance()
            return True
        return False

    def expect_punct(self, p: str) -> Token:
        if not self.at_punct(p):
            self.fail(f"expected {p!r}")
        return self.advance()

    def expect_ident(self) -> Token:
        if self.cur.kind != "ident":
            # contextual: allow non-reserved keywords as identifiers
            if self.cur.kind == "kw" and self.cur.value.lower() not in {
                "select", "from", "where", "group", "having", "order",
                "limit", "offset", "join", "on", "as", "with", "withscope",
                "end", "null", "not", "and", "or", "in", "exists", "is",
            }:
                return self.advance()
            self.fail("expected identifier")
        return self.advance()

    def fail(self, msg: str):
        raise SqlppError(msg, self.cur.loc, self.src)

    # -- entry points -----------------------------------------------------

    def parse_query(self):
        q = self._query()
        self.eat_punct(";")
        if self.cur.kind != "eof":
            self.fail("unexpected trailing input")
        return q

    def _query(self):
        if self.at_kw("with"):
            return self._with_query()
        if self.at_kw("select"):
            return self.select_compound()
        if self.at_kw("insert"):
            return self.insert()
        if self.at_kw("update"):
            return self.update()
        if self.at_kw("delete"):
            return self.delete()
        self.fail("expected SELECT, INSERT, UPDATE or DELETE")

    def _with_query(self):
        """SQL CTEs (r15): ``WITH name AS (compound) [, ...] SELECT``
        — inlined at PARSE time: every FROM/subquery reference to a
        CTE name substitutes a deep copy of its body as a derived
        table (the same semantics as the dialect's named-query
        inlining; multiple references = multiple copies, exactly like
        views). Later CTE bodies see earlier CTEs; recursion is a
        located error. Unambiguous with the projection-position
        ``with expr as name`` — only the query-LEADING keyword opens
        a CTE list."""
        self.advance()  # WITH
        recursive = self._eat_ident("recursive")  # contextual keyword
        raw: list = []  # (name, columns, body, loc)
        while True:
            name_tok = self.expect_ident()
            name = name_tok.value
            if any(n == name for n, _c, _b, _l in raw):
                self.fail(f"duplicate CTE name {name!r}")
            columns: list[str] = []
            if self.eat_punct("("):
                while True:
                    columns.append(self.expect_ident().value)
                    if not self.eat_punct(","):
                        break
                self.expect_punct(")")
            self.expect_kw("as")
            self.expect_punct("(")
            body = self.select_compound()
            self.expect_punct(")")
            raw.append((name, columns, body, name_tok.loc))
            if not self.eat_punct(","):
                break
        if not self.at_kw("select"):
            self.fail("WITH <name> AS (...) must be followed by SELECT")
        q = self.select_compound()

        # r18: classify members by the reference graph over ALL CTE
        # names (mutual cycles need forward refs within a cycle, so
        # classification must see the whole list). A member is
        # RECURSIVE iff it references itself or sits in a reference
        # cycle; everything else stays a plain parse-time-inlined CTE
        # exactly as before (a plain CTE may reference recursive
        # names — its body inlines into the main SELECT, where those
        # names are in scope).
        names = [n for n, _c, _b, _l in raw]
        refs = [
            frozenset(m for m in names if _refs_table(body, m))
            for _n, _c, body, _l in raw
        ]
        sccs = _sccs(names, refs)  # list[list[int]], evaluation order
        in_cycle = {
            i
            for comp in sccs
            for i in comp
            if len(comp) > 1 or names[i] in refs[i]
        }
        if in_cycle and not recursive:
            self.fail(
                f"recursive CTE {names[min(in_cycle)]!r} must be "
                "spelled WITH RECURSIVE"
            )
        scc_of = {i: k for k, comp in enumerate(sccs) for i in comp}
        # cross-SCC references must point at strata that are fully
        # DECLARED earlier (DuckDB's binder enforces the same: a
        # forward reference outside a cycle is an error) — this also
        # makes evaluation order = declaration order of strata
        last_ix = {k: max(comp) for k, comp in enumerate(sccs)}
        for i, rs in enumerate(refs):
            if i not in in_cycle:
                continue
            for m in rs:
                j = names.index(m)
                if scc_of[j] != scc_of[i] and last_ix[scc_of[j]] > i:
                    self.fail(
                        f"recursive CTE {names[i]!r}: forward "
                        f"reference to {m!r} outside its cycle "
                        "(declare it earlier)"
                    )
        members: list = []
        plains: list = []  # (name, body), declaration order
        stratum_of: dict[int, int] = {}
        n_strata = 0
        for k, comp in enumerate(sccs):
            if any(i in in_cycle for i in comp):
                stratum_of[k] = n_strata
                n_strata += 1
        for i, (name, columns, body, loc) in enumerate(raw):
            # earlier plain CTEs substitute into every later body
            # (standard earlier-only visibility), recursive or not
            for n0, b0 in plains:
                _subst_cte(body, n0, b0)
            if i in in_cycle:
                comp = sccs[scc_of[i]]
                cycle_names = {names[j] for j in comp}
                base, step, all_ = self._split_recursive(
                    name, body, cycle_names
                )
                if all_ and len(comp) > 1:
                    self.fail(
                        f"recursive CTE {name!r}: UNION ALL is not "
                        "supported in a mutually recursive cycle "
                        "(use UNION — bag semantics over a cycle "
                        "do not terminate)"
                    )
                # linearity (r19): delta-binding (the semi-naive
                # working table) is only equivalent to the closure
                # when a step references its cycle exactly once.
                #   - a SELF reference appearing more than once
                #     (non-linear self-join, e.g. tc JOIN tc) is a
                #     located error — PG rejects the same shape
                #     ("recursive reference ... must not appear more
                #     than once") and DuckDB's working-table answer
                #     there (delta x delta: only power-of-two path
                #     lengths survive, probed) is not the closure any
                #     user means; the linear form (tc JOIN edges)
                #     expresses the same queries.
                #   - a step referencing MULTIPLE cycle tables (or a
                #     mutual partner twice) is marked non-linear: the
                #     compiler re-evaluates it over the ACCUMULATED
                #     results (stratified-closure semantics — probed
                #     equal to DuckDB's native mutual evaluation),
                #     because delta x delta would miss new x old rows.
                n_self = _count_refs(step, name)
                if n_self > 1:
                    self.fail(
                        f"recursive CTE {name!r}: the recursive "
                        "self-reference must not appear more than "
                        f"once in the step (found {n_self}); rewrite "
                        "the non-linear self-join as a linear step "
                        "over the base relation"
                    )
                n_cycle_refs = sum(
                    _count_refs(step, cn) for cn in cycle_names
                )
                members.append(A.RecMember(
                    name=name, columns=columns, base=base, step=step,
                    union_all=all_, refs=refs[i],
                    scc=stratum_of[scc_of[i]],
                    nonlinear=n_cycle_refs > 1, loc=loc,
                ))
            else:
                if columns:
                    self.fail(
                        "CTE column lists are only supported on "
                        "recursive members"
                    )
                plains.append((name, body))
        # REVERSE order: a body inlined later must not have its
        # forward references resolved by an even-later substitution
        for n, b in reversed(plains):
            _subst_cte(q, n, b)
        if members:
            return A.RecursiveQuery(
                members=members, main=q, loc=members[0].loc,
            )
        return q

    def _split_recursive(self, name: str, body, cycle_names=None):
        """Split a recursive CTE body into (base, step, union_all).
        Standard shape: the OUTERMOST set operation must be a UNION
        whose left side (the base case, itself possibly compound)
        never references the member's cycle (itself, plus its mutual
        partners — r18) and whose right side (the step) does. A base
        MAY reference recursive members of EARLIER strata: those are
        completed results by the time this stratum seeds."""
        cycle = cycle_names if cycle_names is not None else {name}
        if not isinstance(body, A.SetOp) or body.op != "union":
            self.fail(
                f"recursive CTE {name!r} must be <base> UNION [ALL] "
                "<step>"
            )
        if body.order_by or body.limit is not None or body.offset is not None \
                or getattr(body, "order_all", None):
            self.fail(
                "ORDER BY / LIMIT / OFFSET are not supported on a "
                "recursive CTE body"
            )
        for m in cycle:
            if _refs_table(body.left, m):
                self.fail(
                    f"recursive CTE {name!r}: the base case (left of "
                    "UNION) must not reference the CTE"
                    + ("" if m == name else f" cycle member {m!r}")
                )
        # (body refs the cycle and base doesn't => the step does)
        return body.left, body.right, body.all

    def parse_decls(self) -> list:
        decls = []
        while self.cur.kind != "eof":
            decls.append(self.decl())
            self.eat_punct(";")
        return decls

    # -- declarations -----------------------------------------------------

    def decl(self):
        start = self.cur.loc
        if self.at_kw("drop", "alter"):
            return self.ddl()
        self.expect_kw("create")
        if self.eat_kw("table"):
            name = self.expect_ident().value
            self.expect_punct("(")
            cols = self._comma_list(self._col_def, end=")")
            self.expect_punct(")")
            return A.DeclTable(name, cols, loc=Loc.span(start, self.toks[self.i - 1].loc))
        if self.eat_kw("query"):
            name = self.expect_ident().value
            self.expect_kw("as")
            sel_start = self.cur.loc.start
            # r14: compound bodies; r17: WITH bodies (plain CTEs
            # inline at parse time, WITH RECURSIVE yields a
            # RecursiveQuery body — a recursive view)
            if self.at_kw("with"):
                sel = self._with_query()
            else:
                sel = self.select_compound()
            src = self.src[sel_start : self.toks[self.i - 1].loc.end]
            return A.DeclQuery(name, sel, src, loc=Loc.span(start, self.toks[self.i - 1].loc))
        if self.eat_kw("fieldset"):
            name = self.expect_ident().value
            params: List[A.FieldsetParam] = []
            if self.eat_punct("("):
                params = self._comma_list(self._fieldset_param, end=")")
                self.expect_punct(")")
            self.expect_kw("as")
            self.expect_kw("select")
            fields = self._comma_list(self._fieldset_field, end=None)
            sel = A.Select(fields=fields, loc=Loc.span(start, self.toks[self.i - 1].loc))
            return A.DeclFieldset(name, params, sel, "", loc=sel.loc)
        self.fail("expected TABLE, QUERY or FIELDSET")

    def ddl(self):
        """DDL evolution statements (ddl.ml:2-15): DROP TABLE, ALTER
        TABLE RENAME TO / RENAME COLUMN / DROP COLUMN / ADD COLUMN."""
        start = self.cur.loc
        if self.eat_kw("drop"):
            self.expect_kw("table")
            name = self.expect_ident().value
            return A.DdlDropTable(name, loc=Loc.span(start, self.toks[self.i - 1].loc))
        self.expect_kw("alter")
        self.expect_kw("table")
        table = self.expect_ident().value
        if self.eat_kw("rename"):
            if self.eat_kw("to"):
                new = self.expect_ident().value
                return A.DdlRenameTable(table, new, loc=Loc.span(start, self.toks[self.i - 1].loc))
            self.expect_kw("column")
            old = self.expect_ident().value
            self.expect_kw("to")
            new = self.expect_ident().value
            return A.DdlRenameColumn(table, old, new, loc=Loc.span(start, self.toks[self.i - 1].loc))
        if self.eat_kw("drop"):
            self.expect_kw("column")
            col = self.expect_ident().value
            return A.DdlDropColumn(table, col, loc=Loc.span(start, self.toks[self.i - 1].loc))
        if self.eat_kw("add"):
            self.expect_kw("column")
            col = self._col_def()
            return A.DdlAddColumn(table, col, loc=Loc.span(start, self.toks[self.i - 1].loc))
        self.fail("expected RENAME, DROP COLUMN or ADD COLUMN")

    def _col_def(self) -> A.ColumnDef:
        name = self.expect_ident().value
        ty = self._ty()
        col = A.ColumnDef(name, ty)
        while True:
            if self.eat_kw("primary"):
                self.expect_kw("key")
                col.primary_key = True
            elif self.eat_kw("autoincrement"):
                col.autoincrement = True
            elif self.eat_kw("default"):
                col.default = self.expr()
            else:
                break
        return col

    def _fieldset_param(self) -> A.FieldsetParam:
        self.expect_kw("from")
        sty = self._sty()
        if self.eat_kw("as"):
            alias = self.expect_ident().value
        elif isinstance(sty, A.STyTable):
            alias = sty.table
        else:
            self.fail("anonymous struct scope parameter needs AS alias")
        return A.FieldsetParam(sty, alias)

    def _sty(self):
        if self.eat_punct("("):
            entries = []
            while not self.at_punct(")"):
                if self.eat_kw("from"):
                    sty = self._sty()
                    if self.eat_kw("as"):
                        n = self.expect_ident().value
                    elif isinstance(sty, A.STyTable):
                        n = sty.table
                    else:
                        self.fail("anonymous nested scope needs AS alias")
                    entries.append(("scope", n, sty))
                else:
                    n = self.expect_ident().value
                    entries.append(("field", n, self._ty()))
                if not self.eat_punct(","):
                    break
            self.expect_punct(")")
            return A.STyStruct(entries)
        return A.STyTable(self.expect_ident().value)

    def _fieldset_field(self) -> A.Field:
        loc = self.cur.loc
        e = self.expr()
        self.expect_kw("as")
        n = self.expect_ident().value
        return A.Field(expr=e, name=n, explicit_name=True, loc=loc)

    _ty_had_spec = False  # whether the last _ty() saw an explicit null/not-null

    def _ty(self) -> Ty:
        t = self.expect_ident()
        ty = parse_ty_name(t.value, t.loc, self.src)
        if self.eat_kw("not"):
            self.expect_kw("null")
            self._ty_had_spec = True
            return ty.with_non_null(True)
        if self.eat_kw("null"):
            self._ty_had_spec = True
            return ty.with_non_null(False)
        self._ty_had_spec = False
        return ty.with_non_null(False)  # bare type defaults nullable

    # -- select -----------------------------------------------------------

    def select(self) -> A.Select:
        sel = self._select_core()
        self._select_tail(sel)
        sel.loc = Loc.span(sel.loc, self.toks[self.i - 1].loc)
        return sel

    def _select_core(self) -> A.Select:
        """One SELECT through HAVING — no ORDER BY/LIMIT/OFFSET tail
        (the tail belongs to the enclosing compound when this core is
        a set-operation branch, r14)."""
        start = self.cur.loc
        self.expect_kw("select")
        sel = A.Select(loc=start)
        if self.eat_kw("distinct"):
            if self.eat_kw("on"):  # r16: DISTINCT ON (exprs)
                self.expect_punct("(")
                sel.distinct_on = self._comma_list(self.expr, end=")")
                self.expect_punct(")")
            else:
                sel.distinct = True
        sel.fields = []
        while True:
            f = self._field(sel)
            if f is not None:
                sel.fields.append(f)
            if not self.eat_punct(","):
                break
            if self._field_list_ends():
                break
        if self.eat_kw("from"):
            sel.from_ = self._from()
        if self.eat_kw("where"):
            sel.where = self.expr()
        if self.eat_kw("group"):
            self.expect_kw("by")
            if self.at_kw("all"):
                # r15: GROUP BY ALL — group by every projection
                # expression that contains no aggregate (DuckDB
                # convention); resolved in the analyzer
                self.advance()
                sel.group_by = []
                sel.group_all = True
            elif self._at_ident("rollup", "cube"):
                # r14: GROUP BY ROLLUP/CUBE (exprs)
                sel.group_kind = self.advance().value.lower()
                self.expect_punct("(")
                sel.group_by = self._comma_list(self.expr, end=")")
                self.expect_punct(")")
            elif (
                self._at_ident("grouping")
                and self.peek().kind == "ident"
                and self.peek().value.lower() == "sets"
            ):
                # r14: GROUP BY GROUPING SETS ((a, b), (a), ())
                self.advance()
                self.advance()
                sel.group_kind = "sets"
                self.expect_punct("(")
                exprs: List[A.Expr] = []
                sel.group_sets = []
                while True:
                    self.expect_punct("(")
                    idxs: List[int] = []
                    if not self.at_punct(")"):
                        for ex in self._comma_list(self.expr, end=")"):
                            exprs.append(ex)
                            idxs.append(len(exprs) - 1)
                    self.expect_punct(")")
                    sel.group_sets.append(idxs)
                    if not self.eat_punct(","):
                        break
                self.expect_punct(")")
                # duplicates across sets dedup in the analyzer (by
                # elaborated expr_key); indices remap there
                sel.group_by = exprs
            elif self.eat_punct("("):
                self.expect_punct(")")
                sel.group_by = []
            else:
                sel.group_by = self._comma_list(self.expr, end=None)
        if self.eat_kw("having"):
            sel.having = self.expr()
        if self._at_ident("window"):  # r16: named windows (contextual)
            self.advance()
            while True:
                wloc = self.cur.loc
                wname = self.expect_ident().value
                self.expect_kw("as")
                self.expect_punct("(")
                parts, orders, frame = self._window_spec_body()
                self.expect_punct(")")
                sel.windows.append(
                    A.NamedWindow(
                        name=wname, partition_by=parts, order_by=orders,
                        frame=frame,
                        loc=Loc.span(wloc, self.toks[self.i - 1].loc),
                    )
                )
                if not self.eat_punct(","):
                    break
        if self._eat_ident("qualify"):  # r14: window-result filter
            sel.qualify = self.expr()
        sel.loc = Loc.span(start, self.toks[self.i - 1].loc)
        return sel

    def _select_tail(self, sel) -> None:
        """ORDER BY / LIMIT / OFFSET — attaches to a Select or to the
        outermost SetOp (both carry the same three fields)."""
        if self.eat_kw("order"):
            self.expect_kw("by")
            if self.at_kw("all"):
                # r15: ORDER BY ALL [DESC] — sort by every output
                # column left-to-right (DuckDB's determinism sugar);
                # desugars in the analyzer once output columns exist
                self.advance()
                desc = self.eat_kw("desc")
                if not desc:
                    self.eat_kw("asc")
                sel.order_all = "desc" if desc else "asc"
            else:
                sel.order_by = self._comma_list(self._order_item, end=None)
        if self.eat_kw("limit"):
            sel.limit = self.expr()
        if self.eat_kw("offset"):
            sel.offset = self.expr()

    def select_compound(self):
        """SELECT with optional UNION [ALL] / INTERSECT [ALL] /
        EXCEPT [ALL] chain (r14, beyond reference). INTERSECT binds
        tighter; chains associate left; the trailing ORDER BY / LIMIT
        / OFFSET applies to the whole compound (standard SQL)."""
        start = self.cur.loc
        node = self._intersect_chain()
        while self.at_kw("union", "except"):
            if self.eat_kw("union"):
                op = "union"
            else:
                self.expect_kw("except")
                op = "except"
            all_ = bool(self.eat_kw("all"))
            right = self._intersect_chain()
            node = A.SetOp(
                op=op, all=all_, left=node, right=right,
                loc=Loc.span(start, self.toks[self.i - 1].loc),
            )
        self._select_tail(node)
        if self.at_kw("union", "intersect", "except"):
            self.fail(
                "ORDER BY/LIMIT/OFFSET apply to the whole set operation "
                "and must come after the last branch"
            )
        node.loc = Loc.span(start, self.toks[self.i - 1].loc)
        return node

    def _intersect_chain(self):
        start = self.cur.loc
        node = self._select_core()
        while self.eat_kw("intersect"):
            all_ = bool(self.eat_kw("all"))
            node = A.SetOp(
                op="intersect", all=all_, left=node,
                right=self._select_core(),
                loc=Loc.span(start, self.toks[self.i - 1].loc),
            )
        return node

    def _field_list_ends(self) -> bool:
        return (
            self.cur.kind in ("eof",)
            or self.at_kw("from", "where", "group", "having", "order", "limit", "offset")
            or self.at_punct(")")
            or self.at_punct(";")
        )

    def _at_ident(self, *names: str) -> bool:
        return self.cur.kind == "ident" and self.cur.value.lower() in names

    def _eat_ident(self, *names: str) -> bool:
        if self._at_ident(*names):
            self.advance()
            return True
        return False

    def _eat_nulls_mode(self) -> Optional[str]:
        """``IGNORE NULLS`` / ``RESPECT NULLS`` inside a call's parens
        (r16, the DuckDB placement — keeps raw dialect source runnable
        on the oracle engine; IGNORE is a reserved keyword via ON
        CONFLICT IGNORE, RESPECT a contextual ident)."""
        mode = None
        if self.cur.kind == "kw" and self.cur.value.lower() == "ignore":
            mode = "ignore"
        elif self._at_ident("respect"):
            mode = "respect"
        if mode is not None and self.peek().kind == "ident" \
                and self.peek().value.lower() == "nulls":
            self.advance()
            self.advance()
            return mode
        return None

    def _window_spec_body(self):
        """The inside of an OVER (..) or WINDOW w AS (..) spec:
        [PARTITION BY ..] [ORDER BY ..] [frame]. Caller handles the
        parens."""
        parts: list = []
        orders: list = []
        if (
            self.cur.kind == "ident"
            and self.cur.value.lower() == "partition"
        ):
            self.advance()
            self.expect_kw("by")
            parts.append(self.expr())
            while self.eat_punct(","):
                parts.append(self.expr())
        if self.eat_kw("order"):
            self.expect_kw("by")
            orders.append(self._order_item())
            while self.eat_punct(","):
                orders.append(self._order_item())
        frame = self._window_frame()
        return parts, orders, frame

    def _window_frame(self):
        """Optional explicit frame in an OVER clause (r14):
        ``ROWS|RANGE [BETWEEN <bound> AND <bound> | <bound>]`` with
        bounds UNBOUNDED PRECEDING/FOLLOWING, CURRENT ROW, or
        ``<int> PRECEDING/FOLLOWING``. The frame keywords are
        contextual identifiers (like OVER/PARTITION) — not reserved."""
        start_loc = self.cur.loc
        if self._eat_ident("rows"):
            mode = "rows"
        elif self._eat_ident("range"):
            mode = "range"
        else:
            return None

        def bound() -> tuple:
            if self._eat_ident("unbounded"):
                if self._eat_ident("preceding"):
                    return ("unbounded preceding", None)
                if self._eat_ident("following"):
                    return ("unbounded following", None)
                self.fail("expected PRECEDING or FOLLOWING")
            if self._eat_ident("current"):
                if not self._eat_ident("row"):
                    self.fail("expected ROW after CURRENT")
                return ("current row", None)
            t = self.cur
            if t.kind == "int":
                self.advance()
                if self._eat_ident("preceding"):
                    return ("preceding", int(t.value))
                if self._eat_ident("following"):
                    return ("following", int(t.value))
                self.fail("expected PRECEDING or FOLLOWING")
            self.fail(
                "expected UNBOUNDED/CURRENT ROW/<int> frame bound"
            )

        if self._eat_ident("between"):
            start = bound()
            self.expect_kw("and")
            end = bound()
        else:
            start = bound()
            end = ("current row", None)
        return A.WindowFrame(
            mode=mode, start=start, end=end,
            loc=Loc.span(start_loc, self.toks[self.i - 1].loc),
        )

    def _order_item(self) -> A.OrderItem:
        e = self.expr()
        desc = False
        if self.eat_kw("desc"):
            desc = True
        else:
            self.eat_kw("asc")
        nulls = None
        if self._at_ident("nulls"):  # late r14, contextual ident
            self.advance()
            if self._at_ident("first"):
                nulls = "first"
            elif self._at_ident("last"):
                nulls = "last"
            else:
                self.fail("expected FIRST or LAST after NULLS")
            self.advance()
        return A.OrderItem(e, desc, nulls)

    def _field(self, sel: A.Select):
        loc = self.cur.loc
        if self.cur.kind == "ellipsis":
            self.advance()
            if self.cur.kind == "ident":
                return self._fieldset_splice(loc, is_lazy=False)
            sel.is_open = True
            return None
        if self.at_kw("withscope"):
            self.advance()
            path = self._scopename()
            self.expect_kw("as")
            alias = self.expect_ident().value
            return A.FieldWithScope(path, alias, loc=loc)
        if self.at_kw("with"):
            self.advance()
            if self.cur.kind == "ellipsis":
                self.advance()
                return self._fieldset_splice(loc, is_lazy=True)
            e = self.expr()
            name = None
            if self.eat_kw("as"):
                name = self.expect_ident().value
            return A.Field(expr=e, name=name, is_lazy=True, explicit_name=name is not None, loc=loc)
        e = self.expr()
        name = None
        if self.eat_kw("as"):
            name = self.expect_ident().value
        return A.Field(expr=e, name=name, explicit_name=name is not None, loc=loc)

    def _fieldset_splice(self, loc: Loc, is_lazy: bool) -> A.FieldFieldset:
        name = self.expect_ident().value
        args: List[List[str]] = []
        if self.eat_punct("("):
            while not self.at_punct(")"):
                args.append(self._scopename())
                if not self.eat_punct(","):
                    break
            self.expect_punct(")")
        end = self.toks[self.i - 1].loc
        return A.FieldFieldset(name, args, is_lazy, loc=Loc.span(loc, end))

    def _scopename(self) -> List[str]:
        parts = [self.expect_ident().value]
        while self.at_punct(".") and self.peek().kind in ("ident", "kw"):
            self.advance()
            parts.append(self.expect_ident().value)
        return parts

    def _from(self):
        item = self._from_one()
        while True:
            if self.at_kw("join") or self.at_kw("inner"):
                if self.eat_kw("inner"):
                    self.expect_kw("join")
                else:
                    self.advance()
                right = self._lateral_or_from_one()
                self.expect_kw("on")
                cond = self.expr()
                item = A.FromJoin(item, right, "inner", cond, loc=right.loc)
            elif self.at_kw("left") or self.at_kw("right") or self.at_kw("full"):
                # r14 (beyond reference — parser.mly has LEFT only):
                # RIGHT/FULL [OUTER] JOIN, same ON-required grammar
                kind = self.cur.value.lower()
                self.advance()
                self.eat_kw("outer")
                self.expect_kw("join")
                right = self._lateral_or_from_one()
                self.expect_kw("on")
                cond = self.expr()
                item = A.FromJoin(item, right, kind, cond, loc=right.loc)
            elif self.at_kw("cross"):
                # r14: CROSS JOIN takes no ON condition
                self.advance()
                self.expect_kw("join")
                right = self._lateral_or_from_one()
                item = A.FromJoin(item, right, "cross", None, loc=right.loc)
            else:
                return item

    def _lateral_or_from_one(self):
        """JOIN operand, optionally ``LATERAL (select ...) AS name``
        (r17 — contextual keyword; the body may reference columns of
        FROM items to its left)."""
        if not self._at_ident("lateral"):
            return self._from_one()
        self.advance()
        if not self.at_punct("("):
            self.fail("LATERAL takes a parenthesized SELECT body")
        right = self._from_one()
        if not isinstance(right, A.FromSelect):
            self.fail("LATERAL takes a derived-table SELECT body")
        right.lateral = True
        return right

    def _from_one(self):
        loc = self.cur.loc
        if self.eat_punct("("):
            if self.at_kw("values"):
                return self._from_values(loc)
            # r14: derived tables accept compound selects too —
            # select_compound returns a plain Select when no set
            # operator follows (identical to the old behavior);
            # r17: WITH bodies (plain CTEs inline; WITH RECURSIVE
            # yields a RecursiveQuery derived table)
            if self.at_kw("with"):
                sel = self._with_query()
            else:
                sel = self.select_compound()
            self.expect_punct(")")
            self.expect_kw("as")
            alias = self.expect_ident().value
            return self._pivot_suffix(
                A.FromSelect(sel, alias, loc=Loc.span(loc, self.toks[self.i - 1].loc))
            )
        table = self.expect_ident().value
        if table.lower() == "generate_series" and self.at_punct("("):
            # r15: range table function — FROM generate_series(a, b
            # [, step]) AS t(i)
            self.advance()
            args = self._comma_list(self.expr, end=")")
            self.expect_punct(")")
            if len(args) not in (2, 3):
                self.fail("generate_series takes (start, stop [, step])")
            self.expect_kw("as")
            alias = self.expect_ident().value
            self.expect_punct("(")
            col = self.expect_ident().value
            self.expect_punct(")")
            return A.FromSeries(
                args[0], args[1], args[2] if len(args) == 3 else None,
                alias, col, loc=Loc.span(loc, self.toks[self.i - 1].loc),
            )
        alias = None
        if self.eat_kw("as"):
            alias = self.expect_ident().value
        return self._pivot_suffix(
            A.FromTable(table, alias, loc=Loc.span(loc, self.toks[self.i - 1].loc))
        )

    def _pivot_suffix(self, item):
        """Optional ``PIVOT (...)`` / ``UNPIVOT (...)`` suffix after a
        table or derived table (r18, contextual keywords — only taken
        when followed by their parenthesized spec, so tables named
        pivot still parse)."""
        while self._at_ident("pivot") or self._at_ident("unpivot"):
            kind = self.cur.value.lower()
            nxt = self.toks[self.i + 1] if self.i + 1 < len(self.toks) else None
            include_nulls = False
            if kind == "unpivot" and nxt is not None and (
                getattr(nxt, "value", "").lower() in ("include", "exclude")
            ):
                self.advance()
                mode = self.expect_ident().value.lower()
                self._expect_ident_kw("nulls")
                include_nulls = mode == "include"
            elif nxt is None or not (
                nxt.kind == "punct" and nxt.value == "("
            ):
                break
            else:
                self.advance()
            start = self.cur.loc
            self.expect_punct("(")
            if kind == "pivot":
                aggs: list = []
                while True:
                    agg_fn = self.expect_ident().value
                    self.expect_punct("(")
                    agg_arg = self.expr()
                    self.expect_punct(")")
                    agg_name = None
                    if self.eat_kw("as"):
                        agg_name = self.expect_ident().value
                    aggs.append((agg_fn, agg_arg, agg_name))
                    if not self.eat_punct(","):
                        break
                if len(aggs) > 1 and any(n is None for _f, _a, n in aggs):
                    self.fail(
                        "multi-aggregate PIVOT requires AS names on "
                        "every aggregate (unnamed columns like "
                        "'2023_sum(amt)' cannot be referenced)"
                    )
                self._expect_ident_kw("for")
                col = self.expect_ident().value
                values: list = []
                dynamic = True
                if self.eat_kw("in"):
                    dynamic = False
                    self.expect_punct("(")
                    while True:
                        v = self.expr()
                        name = None
                        if self.eat_kw("as"):
                            name = self.expect_ident().value
                        values.append((v, name))
                        if not self.eat_punct(","):
                            break
                    self.expect_punct(")")
                self.expect_punct(")")
                if not self.eat_kw("as"):
                    self.fail("PIVOT requires AS <alias>")
                alias = self.expect_ident().value
                if not values and not dynamic:
                    self.fail("PIVOT needs at least one IN value")
                item = A.FromPivot(
                    item, aggs[0][0], aggs[0][1], col, values, alias,
                    aggs=aggs, dynamic=dynamic,
                    loc=Loc.span(start, self.toks[self.i - 1].loc),
                )
            else:
                # single form:  (v FOR k IN (c1 [AS 'l'], ...))
                # multi  form:  ((a, b) FOR k IN ((c1, c2) [AS 'l'], ...))
                if self.eat_punct("("):
                    val_names = [self.expect_ident().value]
                    while self.eat_punct(","):
                        val_names.append(self.expect_ident().value)
                    self.expect_punct(")")
                else:
                    val_names = [self.expect_ident().value]
                self._expect_ident_kw("for")
                name_name = self.expect_ident().value
                self.expect_kw("in")
                self.expect_punct("(")
                cols: list = []
                while True:
                    if self.eat_punct("("):
                        grp = [self.expect_ident().value]
                        while self.eat_punct(","):
                            grp.append(self.expect_ident().value)
                        self.expect_punct(")")
                    else:
                        grp = [self.expect_ident().value]
                    label = None
                    if self.eat_kw("as"):
                        t = self.cur
                        if t.kind == "string":
                            label = t.value
                            self.advance()
                        else:
                            label = self.expect_ident().value
                    if len(grp) != len(val_names):
                        self.fail(
                            f"UNPIVOT group ({', '.join(grp)}) has "
                            f"{len(grp)} columns but the value list "
                            f"names {len(val_names)}"
                        )
                    cols.append((tuple(grp), label))
                    if not self.eat_punct(","):
                        break
                self.expect_punct(")")
                self.expect_punct(")")
                if not self.eat_kw("as"):
                    self.fail("UNPIVOT requires AS <alias>")
                alias = self.expect_ident().value
                if len(set(val_names)) != len(val_names):
                    self.fail("duplicate UNPIVOT value column name")
                if name_name in val_names:
                    self.fail("UNPIVOT value and name columns must differ")
                item = A.FromUnpivot(
                    item, val_names[0], name_name, cols,
                    val_names=val_names, include_nulls=include_nulls,
                    alias=alias,
                    loc=Loc.span(start, self.toks[self.i - 1].loc),
                )
        return item

    def _expect_ident_kw(self, word: str) -> None:
        t = self.cur
        if not (t.kind == "ident" and t.value.lower() == word) and not (
            getattr(t, "kind", None) == "kw" and t.value.lower() == word
        ):
            self.fail(f"expected {word.upper()}")
        self.advance()

    def _from_values(self, loc: Loc):
        """``(VALUES (e, ..), ..) AS t(c1, ..)`` inline table source
        (r15, beyond reference). Desugars at parse time — like
        BETWEEN/ILIKE/CTEs — into a UNION ALL compound of FROM-less
        single-row selects, the portable spelling every backend
        printer and the Spark compiler already handle; set-op arity
        and type-lub checks cover row-shape validation. The column
        list is REQUIRED (no engine-specific default names leak in).
        VALUES lists are inline dimensions: Catalyst constant-folds
        the union into a local relation, so at scale the join against
        one is a broadcast, never a shuffle."""
        self.expect_kw("values")
        rows: List[List[A.Expr]] = []
        while True:
            self.expect_punct("(")
            rows.append(self._comma_list(self.expr, end=")"))
            self.expect_punct(")")
            if not rows[-1]:
                self.fail("VALUES row requires at least one expression")
            if not self.eat_punct(","):
                break
        self.expect_punct(")")
        self.expect_kw("as")
        alias = self.expect_ident().value
        self.expect_punct("(")
        cols = [t.value for t in self._comma_list(self.expect_ident, end=")")]
        self.expect_punct(")")
        end = self.toks[self.i - 1].loc
        if len(set(cols)) != len(cols):
            self.fail("duplicate column name in VALUES alias list")
        for r in rows:
            if len(r) != len(cols):
                self.fail(
                    f"VALUES row has {len(r)} expressions but the alias "
                    f"list names {len(cols)} columns"
                )
        branches = []
        for r in rows:
            fields = [
                A.Field(expr=e, name=c, explicit_name=True, loc=e.loc)
                for e, c in zip(r, cols)
            ]
            branches.append(A.Select(fields=fields, loc=loc))
        node = branches[0]
        for b in branches[1:]:
            node = A.SetOp(op="union", all=True, left=node, right=b, loc=loc)
        return A.FromSelect(node, alias, loc=Loc.span(loc, end))

    # -- DML --------------------------------------------------------------

    def insert(self) -> A.Insert:
        loc = self.cur.loc
        self.expect_kw("insert")
        self.expect_kw("into")
        table = self.expect_ident().value
        ins = A.Insert(table=table, loc=loc)
        if self.eat_punct("("):
            ins.columns = [t.value for t in self._comma_list(self.expect_ident, end=")")]
            self.expect_punct(")")
            if self.eat_kw("values"):
                ins.values = self._comma_list(self._tuple, end=None)
            else:
                ins.select = self.select_compound()  # r14: compounds OK
        elif self.eat_kw("set"):
            sets = self._comma_list(self._set_item, end=None)
            ins.columns = [n for n, _ in sets]
            ins.values = [[e for _, e in sets]]
        else:
            self.fail("expected column list or SET")
        if self.eat_kw("on"):
            self.expect_kw("conflict")
            if self.eat_kw("ignore"):
                ins.on_conflict = "ignore"
            elif self.eat_kw("replace"):
                ins.on_conflict = "replace"
            else:
                self.fail("expected IGNORE or REPLACE")
        if self.eat_kw("returning"):
            ins.returning = self._comma_list(self._simple_field, end=None)
        return ins

    def _tuple(self) -> List[A.Expr]:
        self.expect_punct("(")
        es = self._comma_list(self.expr, end=")")
        self.expect_punct(")")
        return es

    def _set_item(self):
        n = self.expect_ident().value
        if not (self.cur.kind == "op" and self.cur.value == "="):
            self.fail("expected =")
        self.advance()
        return (n, self.expr())

    def _simple_field(self) -> A.Field:
        loc = self.cur.loc
        e = self.expr()
        name = None
        if self.eat_kw("as"):
            name = self.expect_ident().value
        return A.Field(expr=e, name=name, is_used=True, explicit_name=name is not None, loc=loc)

    def update(self) -> A.Update:
        loc = self.cur.loc
        self.expect_kw("update")
        table = self.expect_ident().value
        upd = A.Update(table=table, loc=loc)
        self.expect_kw("set")
        upd.sets = self._comma_list(self._set_item, end=None)
        if self.eat_kw("from"):
            upd.from_ = self._from()
        if self.eat_kw("where"):
            upd.where = self.expr()
        if self.eat_kw("returning"):
            upd.returning = self._comma_list(self._simple_field, end=None)
        return upd

    def delete(self) -> A.Delete:
        loc = self.cur.loc
        self.expect_kw("delete")
        self.expect_kw("from")
        table = self.expect_ident().value
        d = A.Delete(table=table, loc=loc)
        if self.eat_kw("where"):
            d.where = self.expr()
        if self.eat_kw("returning"):
            d.returning = self._comma_list(self._simple_field, end=None)
        return d

    # -- expressions ------------------------------------------------------

    BINOP_BP = {
        "or": 30,
        "and": 40,
        "=": 60, "!=": 60, "<>": 60,
        "<": 70, "<=": 70, ">": 70, ">=": 70,
        "+": 80, "-": 80, "||": 80,  # r15: SQL concat operator
        "*": 90, "/": 90, "%": 90,  # reference bug parsed * as -; fixed
    }

    def expr(self, min_bp: int = 0) -> A.Expr:
        e = self._expr_prefix()
        while True:
            t = self.cur
            # postfix: fn(args) OVER (window spec) — r13 window
            # functions; OVER is contextual (plain ident), recognized
            # only right after a function application and before '('
            if (
                isinstance(e, A.EApp)
                and t.kind == "ident"
                and t.value.lower() == "over"
                and self.peek().kind == "punct"
                and self.peek().value == "("
                and 95 >= min_bp
            ):
                self.advance()
                self.expect_punct("(")
                parts, orders, frame = self._window_spec_body()
                self.expect_punct(")")
                e = A.EWindow(
                    fn=e.fn, args=e.args, partition_by=parts,
                    order_by=orders, frame=frame,
                    nulls_mode=getattr(e, "win_nulls", None),
                    loc=Loc.span(e.loc, self.toks[self.i - 1].loc),
                )
                continue
            # postfix: fn(args) OVER name — r16 named-window reference
            # (the WINDOW clause defines name); resolved in the
            # analyzer
            if (
                isinstance(e, A.EApp)
                and t.kind == "ident"
                and t.value.lower() == "over"
                and self.peek().kind == "ident"
                and 95 >= min_bp
            ):
                self.advance()
                wname = self.expect_ident().value
                e = A.EWindow(
                    fn=e.fn, args=e.args, ref=wname,
                    nulls_mode=getattr(e, "win_nulls", None),
                    loc=Loc.span(e.loc, self.toks[self.i - 1].loc),
                )
                continue
            # postfix: IS [NOT] NULL, IS [NOT] DISTINCT FROM rhs
            # (bp 60). DISTINCT FROM is SQL's two-valued null-safe
            # comparison (r15, beyond reference): never NULL, NULLs
            # compare equal to each other and distinct from values.
            if t.kind == "kw" and t.value.lower() == "is" and 60 >= min_bp:
                self.advance()
                neg = self.eat_kw("not")
                if self.eat_kw("distinct"):
                    self.expect_kw("from")
                    rhs = self.expr(61)
                    fn = "IS NOT DISTINCT FROM" if neg else "IS DISTINCT FROM"
                    e = A.EApp(fn, [e, rhs], loc=Loc.span(e.loc, rhs.loc))
                else:
                    self.expect_kw("null")
                    fn = "IS NOT NULL" if neg else "IS NULL"
                    e = A.EApp(fn, [e], loc=Loc.span(e.loc, self.toks[self.i - 1].loc))
                continue
            # postfix: ascription `: ty [expr]` (binds tight)
            if t.kind == "punct" and t.value == ":" and 95 >= min_bp:
                self.advance()
                ty = self._ty()
                if self.cur.kind == "ident" and self.cur.value.lower() == "expr":
                    self.advance()
                    if isinstance(e, A.EParam):
                        e.is_expr_param = True
                        e.ascribed = ty
                        continue
                    self.fail("EXPR ascription only valid on parameters")
                if isinstance(e, A.EParam):
                    e.ascribed = ty
                    e.null_spec = ty.non_null if self._ty_had_spec else None
                    continue
                e = A.EAscribe(expr=e, to_ty=ty, loc=Loc.span(e.loc, self.toks[self.i - 1].loc))
                continue
            # IN (select) / IN (value, ...) / NOT IN (bp 60)
            if t.kind == "kw" and t.value.lower() == "in" and 60 >= min_bp:
                self.advance()
                e = self._in_tail(e, negated=False)
                continue
            if (
                t.kind == "kw"
                and t.value.lower() == "not"
                and self.peek().kind == "kw"
                and self.peek().value.lower() == "in"
                and 60 >= min_bp
            ):
                self.advance()
                self.advance()
                e = self._in_tail(e, negated=True)
                continue
            # postfix: [NOT] LIKE pattern (r14 — sugar for the like()
            # extension fn; LIKE is a contextual ident) and
            # [NOT] BETWEEN lo AND hi (r14 — desugars at parse time to
            # (e >= lo AND e <= hi), exact in 3VL like every engine's
            # own BETWEEN lowering; bounds parse at bp 61 so the AND
            # separator isn't consumed)
            if (
                t.kind == "ident"
                and t.value.lower() in ("like", "ilike", "between")
                and 60 >= min_bp
            ):
                e = self._like_or_between(e, t.value.lower(), False)
                continue
            if (
                t.kind == "kw"
                and t.value.lower() == "not"
                and self.peek().kind == "ident"
                and self.peek().value.lower() in ("like", "ilike",
                                                  "between")
                and 60 >= min_bp
            ):
                kind = self.peek().value.lower()
                self.advance()
                e = self._like_or_between(e, kind, True)
                continue
            op = None
            if t.kind == "op":
                op = t.value
            elif t.kind == "kw" and t.value.lower() in ("and", "or"):
                op = t.value.lower()
            if op is None:
                return e
            bp = self.BINOP_BP.get(op)
            if bp is None or bp < min_bp:
                return e
            self.advance()
            # r15: quantified comparison `x op ANY/SOME/ALL (select)`
            # — ANY/SOME/ALL are contextual idents right after a
            # comparison op and before '('. `= ANY` / `!= ALL`
            # desugar to the IN machinery (full correlation support);
            # the other op/quantifier pairs build EQuant.
            cmp_op = {"<>": "!="}.get(op, op)
            if (
                cmp_op in ("=", "!=", "<", "<=", ">", ">=")
                and t.kind == "op"
                and (
                    self._at_ident("any", "some")
                    or self.at_kw("all")
                )
                and self.peek().kind == "punct"
                and self.peek().value == "("
            ):
                quant = "all" if self.cur.value.lower() == "all" else "any"
                self.advance()
                self.expect_punct("(")
                sel = self.select_compound()
                self.expect_punct(")")
                loc = Loc.span(e.loc, self.toks[self.i - 1].loc)
                if cmp_op == "=" and quant == "any":
                    e = A.EIn(exprs=[e], select=sel, negated=False, loc=loc)
                elif cmp_op == "!=" and quant == "all":
                    e = A.EIn(exprs=[e], select=sel, negated=True, loc=loc)
                else:
                    e = A.EQuant(
                        op=cmp_op, quant=quant, expr=e, select=sel, loc=loc
                    )
                continue
            rhs = self.expr(bp + 1)  # left-assoc
            # r15: || and % are spellings of existing functions —
            # concat is NULL-propagating on both lowerings (prints as
            # ||), mod carries the engine's NULL-on-zero guard
            name = {
                "and": "AND", "or": "OR", "<>": "!=",
                "||": "concat", "%": "mod",
            }.get(op, op)
            e = A.EApp(name, [e, rhs], loc=Loc.span(e.loc, rhs.loc))

    def _case(self) -> A.Expr:
        """``CASE WHEN c THEN v [WHEN ..]* [ELSE e] END`` (r14,
        beyond reference — searched form only; CASE/WHEN/THEN/ELSE are
        contextual idents, END is the match keyword). Represented as
        ``EApp("case", [c1, v1, c2, v2, ..., else?])`` — an odd arg
        count means the ELSE branch is present."""
        start = self.cur.loc
        self.advance()  # CASE
        operand = None
        if not self._at_ident("when"):
            # r15: simple CASE — `CASE x WHEN v THEN r ...` desugars
            # to the searched form with `x = v` arms (exact: a NULL
            # operand never matches, the ELSE applies — both engines)
            operand = self.expr()
        args: List[A.Expr] = []
        while self._eat_ident("when"):
            cond = self.expr()
            if operand is not None:
                import copy as _copy
                cond = A.EApp(
                    "=", [_copy.deepcopy(operand), cond], loc=cond.loc
                )
            args.append(cond)
            if not self._eat_ident("then"):
                self.fail("expected THEN")
            args.append(self.expr())
        if not args:
            self.fail("expected WHEN")
        if self._eat_ident("else"):
            args.append(self.expr())
        self.expect_kw("end")
        return A.EApp(
            "case", args, loc=Loc.span(start, self.toks[self.i - 1].loc)
        )

    def _like_or_between(self, e: A.Expr, kind: str, negated: bool) -> A.Expr:
        import copy as _copy

        start = e.loc
        self.advance()  # consume LIKE / ILIKE / BETWEEN
        if kind in ("like", "ilike"):
            pat = self.expr(61)
            loc = Loc.span(start, self.toks[self.i - 1].loc)
            if kind == "ilike":
                # r15: ILIKE desugars to like(lower(e), lower(pat)) —
                # the pattern is a literal (the like() rule), so it
                # lowercases at parse time; %/_/\ are case-free, so
                # the escape validation is unaffected
                if isinstance(pat, A.ELit) and pat.lit_kind == "string":
                    pat = A.ELit(pat.value.lower(), "string", loc=pat.loc)
                e = A.EApp("lower", [e], loc=e.loc)
            out = A.EApp("like", [e, pat], loc=loc)
        else:
            lo = self.expr(61)
            self.expect_kw("and")
            hi = self.expr(61)
            loc = Loc.span(start, self.toks[self.i - 1].loc)
            ge = A.EApp(">=", [e, lo], loc=loc)
            le = A.EApp("<=", [_copy.deepcopy(e), hi], loc=loc)
            out = A.EApp("AND", [ge, le], loc=loc)
        if negated:
            out = A.EApp("NOT", [out], loc=out.loc)
        return out

    def _expr_prefix(self) -> A.Expr:
        t = self.cur
        if t.kind == "kw" and t.value.lower() == "not":
            self.advance()
            inner = self.expr(50)
            return A.EApp("NOT", [inner], loc=Loc.span(t.loc, inner.loc))
        if t.kind == "op" and t.value == "-":
            self.advance()
            inner = self.expr(100)
            return A.EApp("-u", [inner], loc=Loc.span(t.loc, inner.loc))
        return self._expr_primary()

    def _expr_primary(self) -> A.Expr:
        t = self.cur
        # r16: INTERVAL <int> <unit> literal — contextual ('interval'
        # stays a valid column name unless followed by an int)
        if (
            t.kind == "ident" and t.value.lower() == "interval"
            and self.peek().kind == "int"
        ):
            self.advance()
            n_tok = self.cur
            self.advance()
            u_tok = self.cur
            if u_tok.kind not in ("ident", "kw"):
                self.fail("expected an interval unit")
            unit = u_tok.value.lower().rstrip("s")
            if unit not in A.INTERVAL_UNITS:
                self.fail(
                    "interval unit must be one of "
                    + "/".join(A.INTERVAL_UNITS)
                )
            self.advance()
            return A.EInterval(
                n=int(n_tok.value), unit=unit,
                loc=Loc.span(t.loc, u_tok.loc),
            )
        if t.kind == "int":
            self.advance()
            return A.ELit(int(t.value), "int", loc=t.loc)
        if t.kind == "float":
            self.advance()
            return A.ELit(float(t.value), "float", loc=t.loc)
        if t.kind == "string":
            self.advance()
            return A.ELit(t.value, "string", loc=t.loc)
        if t.kind == "kw" and t.value.lower() in ("true", "false"):
            self.advance()
            return A.ELit(t.value.lower() == "true", "bool", loc=t.loc)
        if t.kind == "kw" and t.value.lower() == "null":
            self.advance()
            return A.ENull(loc=t.loc)
        if t.kind == "param":
            self.advance()
            return A.EParam(name=t.value, loc=t.loc)
        if t.kind == "kw" and t.value.lower() == "exists":
            self.advance()
            self.expect_punct("(")
            sel = self.select_compound()  # r15: compound bodies allowed
            self.expect_punct(")")
            return A.EExists(select=sel, loc=Loc.span(t.loc, self.toks[self.i - 1].loc))
        if t.kind == "kw" and t.value.lower() == "match":
            return self._match()
        if t.kind == "ident" and t.value.lower() == "case":
            return self._case()
        if t.kind == "punct" and t.value == "(":
            self.advance()
            # scalar subquery: (select ...) in expression position
            # (beyond-reference extension; see ast.EScalarSub)
            if self.cur.kind == "kw" and self.cur.value.lower() == "select":
                # r15: compounds parse here too — the analyzer emits
                # the targeted not-supported error for scalar position
                sel = self.select_compound()
                self.expect_punct(")")
                return A.EScalarSub(
                    select=sel,
                    loc=Loc.span(t.loc, self.toks[self.i - 1].loc),
                )
            e = self.expr()
            if self.eat_punct(","):
                # tuple-IN: (a, b, ...) [NOT] IN (select ...)
                es = [e] + self._comma_list(self.expr, end=")")
                self.expect_punct(")")
                neg = self.eat_kw("not")
                self.expect_kw("in")
                self.expect_punct("(")
                sel = self.select_compound()  # r15: compounds allowed
                self.expect_punct(")")
                return A.EIn(
                    exprs=es, select=sel, negated=neg,
                    loc=Loc.span(t.loc, self.toks[self.i - 1].loc),
                )
            self.expect_punct(")")
            return e
        if t.kind in ("ident", "kw"):
            # name | fn(args) | nav
            name_tok = self.expect_ident()
            if self.at_punct("("):
                self.advance()
                fn_l = name_tok.value.lower()
                # r15 spelling sugar for THE most common SQL forms:
                # count(*) == count(1) (both count rows; the formatter
                # normalizes to count(1)), and count(DISTINCT x)
                # desugars to the dialect's count_distinct(x)
                if fn_l == "extract":
                    # r15: EXTRACT(part FROM x) — sugar for the
                    # per-part datetime field functions
                    part_tok = self.expect_ident()
                    part = part_tok.value.lower()
                    if part not in ("year", "month", "day", "hour",
                                    "minute", "second", "week",
                                    "quarter", "dayofyear", "doy",
                                    "dayofweek", "dow"):
                        self.fail(
                            "EXTRACT part must be one of year, month, "
                            "day, hour, minute, second, week, quarter, "
                            "dayofyear/doy, dayofweek/dow"
                        )
                    part = {"doy": "dayofyear", "dow": "dayofweek"}.get(
                        part, part
                    )
                    self.expect_kw("from")
                    inner = self.expr()
                    self.expect_punct(")")
                    return A.EApp(
                        part, [inner],
                        loc=Loc.span(name_tok.loc, self.toks[self.i - 1].loc),
                    )
                if fn_l == "position":
                    # r15: POSITION(needle IN haystack) — ANSI sugar
                    # for strpos(haystack, needle); needle parses at
                    # bp 61 so the IN separator isn't consumed as the
                    # membership operator
                    needle = self.expr(61)
                    self.expect_kw("in")
                    hay = self.expr()
                    self.expect_punct(")")
                    return A.EApp(
                        "strpos", [hay, needle],
                        loc=Loc.span(name_tok.loc, self.toks[self.i - 1].loc),
                    )
                if fn_l in ("cast", "try_cast"):
                    # r15: CAST(expr AS TY) — CONVERTING cast (the
                    # `expr : TY` ascription checks and erases; CAST
                    # changes the value's type). TRY_CAST (third
                    # wave): NULL where CAST would raise.
                    inner = self.expr()
                    self.expect_kw("as")
                    ty = self._ty()
                    self.expect_punct(")")
                    return A.EAscribe(
                        expr=inner, to_ty=ty, convert=True,
                        safe=(fn_l == "try_cast"),
                        loc=Loc.span(name_tok.loc, self.toks[self.i - 1].loc),
                    )
                if fn_l == "count" and self.cur.kind == "op" \
                        and self.cur.value == "*" \
                        and self.peek().kind == "punct" \
                        and self.peek().value == ")":
                    star = self.advance()
                    self.expect_punct(")")
                    app = A.EApp(
                        "count", [A.ELit(1, "int", loc=star.loc)],
                        loc=Loc.span(name_tok.loc, self.toks[self.i - 1].loc),
                    )
                    if self._at_ident("filter") and self.peek().kind == "punct" \
                            and self.peek().value == "(":
                        app = self._agg_filter(app)
                    return app
                if fn_l in ("count", "sum", "avg", "min", "max") \
                        and self.at_kw("distinct"):
                    # r15 third wave: DISTINCT args for the classic
                    # five — count/sum/avg dedup before aggregating
                    # (distinct spellings in compile/print); min/max
                    # DISTINCT is a no-op and desugars away
                    self.advance()
                    arg = self.expr()
                    self.expect_punct(")")
                    fn_name = {
                        "count": "count_distinct",
                        "sum": "sum_distinct",
                        "avg": "avg_distinct",
                    }.get(fn_l, fn_l)
                    app = A.EApp(
                        fn_name, [arg],
                        loc=Loc.span(name_tok.loc, self.toks[self.i - 1].loc),
                    )
                    if self._at_ident("filter") and self.peek().kind == "punct" \
                            and self.peek().value == "(":
                        app = self._agg_filter(app)
                    return app
                # zero-arg application — the reference's own tests use
                # now() (analyze.ml:597 types "now", [])
                args = [] if self.at_punct(")") else self._comma_list(self.expr, end=")")
                win_nulls = self._eat_nulls_mode()
                self.expect_punct(")")
                app = A.EApp(
                    name_tok.value, args, win_nulls=win_nulls,
                    loc=Loc.span(name_tok.loc, self.toks[self.i - 1].loc),
                )
                if self._at_ident("filter") and self.peek().kind == "punct" \
                        and self.peek().value == "(":
                    app = self._agg_filter(app)
                return app
            if self.at_punct("."):
                self.advance()
                inner = self._nav_tail()
                return A.ENav(
                    scope=name_tok.value, expr=inner, loc=Loc.span(name_tok.loc, inner.loc)
                )
            return A.EName(name=name_tok.value, loc=name_tok.loc)
        self.fail("expected expression")

    _FILTERABLE_AGGS = {
        "count", "sum", "min", "max", "avg", "count_distinct",
        "sum_distinct", "avg_distinct",
        # r14: the CASE-desugar stays exact for every NULL-skipping
        # single-argument aggregate (string_agg is 2-arg, excluded)
        "stddev", "variance", "stddev_pop", "var_pop",
        "bool_and", "bool_or", "string_agg",
        # r16: bitwise folds skip NULLs; count_if counts TRUE only
        # (a CASE with no ELSE yields NULL = not TRUE) — both exact
        "bit_and", "bit_or", "bit_xor", "count_if",
        # r15: sketch aggregates skip NULLs too, so the CASE desugar
        # stays exact; the precision/percentile literals stay as
        # written (multi-arg, handled like string_agg below)
        "approx_count_distinct", "approx_percentile",
        # r15 third wave: median is 1-arg NULL-skipping; the
        # bivariate stats skip the PAIR when either side is NULL, so
        # FILTER wraps BOTH arguments (see _agg_filter)
        "median", "corr", "covar_samp", "covar_pop",
        "arg_min", "arg_max", "percentile_cont", "mode",
    }
    # FILTER wraps only the VALUE argument for these — the remaining
    # arguments are plan-parameterizing literals
    _FILTER_VALUE_ARG_ONLY = {
        "string_agg", "approx_count_distinct", "approx_percentile",
        "percentile_cont",
    }

    def _agg_filter(self, e: A.EApp) -> A.EApp:
        """``agg(x) FILTER (WHERE p)`` (r14) — parse-time desugar to
        ``agg(CASE WHEN p THEN x END)``, exact for every aggregate in
        the dialect (they all skip NULLs; COUNT counts non-NULL, so
        filtered-out rows vanish from the count too). FILTER is a
        contextual identifier."""
        start = e.loc
        fnl = e.fn.lower()
        if fnl not in self._FILTERABLE_AGGS:
            self.fail("FILTER is only valid on aggregate functions")
        if fnl in ("string_agg", "corr", "covar_samp", "covar_pop",
                   "arg_min", "arg_max"):
            # 2-arg forms: string_agg's CASE wraps the VALUE argument
            # only (the separator is a literal); the bivariate stats
            # wrap BOTH arguments below (a pair with either side NULL
            # is skipped, so NULLing both is exact)
            if len(e.args) != 2:
                self.fail(f"{fnl} expects 2 arguments")
        elif fnl in self._FILTER_VALUE_ARG_ONLY:
            if not e.args:
                self.fail(f"{fnl} expects at least 1 argument")
        elif len(e.args) != 1:
            self.fail("FILTER requires a single-argument aggregate")
        self.advance()  # FILTER
        self.expect_punct("(")
        self.expect_kw("where")
        pred = self.expr()
        self.expect_punct(")")
        loc = Loc.span(start, self.toks[self.i - 1].loc)
        if fnl in ("corr", "covar_samp", "covar_pop",
                   "arg_min", "arg_max"):
            import copy as _copy

            wrapped = [
                A.EApp("case", [_copy.deepcopy(pred) if i else pred, a],
                       loc=loc)
                for i, a in enumerate(e.args)
            ]
            return A.EApp(e.fn, wrapped, loc=loc)
        case = A.EApp("case", [pred, e.args[0]], loc=loc)
        return A.EApp(e.fn, [case, *e.args[1:]], loc=loc)

    def _in_tail(self, e: A.Expr, negated: bool) -> A.Expr:
        """After ``x [NOT] IN`` — a parenthesized subquery (EIn) or a
        value list (EInList, r14). A select always leads with the
        SELECT keyword, so one token of lookahead decides."""
        start = e.loc
        self.expect_punct("(")
        if self.at_kw("select"):
            sel = self.select_compound()  # r15: compounds allowed
            self.expect_punct(")")
            return A.EIn(
                exprs=[e], select=sel, negated=negated,
                loc=Loc.span(start, self.toks[self.i - 1].loc),
            )
        items = self._comma_list(self.expr, end=")")
        self.expect_punct(")")
        if not items:
            self.fail("IN list requires at least one value")
        return A.EInList(
            expr=e, items=items, negated=negated,
            loc=Loc.span(start, self.toks[self.i - 1].loc),
        )

    def _nav_tail(self) -> A.Expr:
        """After `name.` — either nested nav, an app, a paren expr, or a name."""
        if self.at_punct("("):
            self.advance()
            e = self.expr()
            self.expect_punct(")")
            return e
        name_tok = self.expect_ident()
        if self.at_punct("("):
            self.advance()
            args = [] if self.at_punct(")") else self._comma_list(self.expr, end=")")
            self.expect_punct(")")
            return A.EApp(
                name_tok.value, args, loc=Loc.span(name_tok.loc, self.toks[self.i - 1].loc)
            )
        if self.at_punct("."):
            self.advance()
            inner = self._nav_tail()
            return A.ENav(scope=name_tok.value, expr=inner, loc=Loc.span(name_tok.loc, inner.loc))
        return A.EName(name=name_tok.value, loc=name_tok.loc)

    def _match(self) -> A.EMatch:
        start = self.cur.loc
        self.expect_kw("match")
        if self.cur.kind != "param":
            self.fail("expected parameter after MATCH")
        pname = self.advance().value
        self.expect_kw("with")
        self.eat_punct("|")
        branches = []
        while True:
            tag = self.expect_ident().value
            params: List[str] = []
            if self.cur.kind == "param":
                params = [self.advance().value]
            elif self.eat_punct("("):
                while self.cur.kind == "param":
                    params.append(self.advance().value)
                    if not self.eat_punct(","):
                        break
                self.expect_punct(")")
            if self.cur.kind != "arrow":
                self.fail("expected ->")
            self.advance()
            body = self.expr()
            branches.append(A.EMatchBranch(tag, params, body))
            if not self.eat_punct("|"):
                break
        self.expect_kw("end")
        return A.EMatch(
            param=pname, branches=branches, loc=Loc.span(start, self.toks[self.i - 1].loc)
        )

    # -- util -------------------------------------------------------------

    def _comma_list(self, fn, end: Optional[str]):
        items = [fn()]
        while self.eat_punct(","):
            if end is not None and self.at_punct(end):
                break
            if end is None and (self._field_list_ends() or self.cur.kind == "eof"):
                break
            items.append(fn())
        return items


def parse_query(src: str):
    return Parser(src).parse_query()


def parse_decls(src: str):
    return Parser(src).parse_decls()


# -- CTE inlining (r15) -------------------------------------------------------


def _cte_exprs(sel):
    """Every raw expression hanging off an unanalyzed Select."""
    out = []
    for it in sel.fields or []:
        ex = getattr(it, "expr", None)
        if ex is not None:
            out.append(ex)
    for ex in (sel.where, sel.having, sel.qualify, sel.limit, sel.offset):
        if ex is not None:
            out.append(ex)
    for g in sel.group_by or []:
        out.append(g)
    for o in sel.order_by or []:
        out.append(o.expr)
    return out


def _subst_from(f, name, body):
    import copy as _copy

    if isinstance(f, A.FromTable) and f.table == name:
        return A.FromSelect(
            _copy.deepcopy(body), f.alias or name, loc=f.loc
        )
    if isinstance(f, A.FromJoin):
        f.left = _subst_from(f.left, name, body)
        f.right = _subst_from(f.right, name, body)
        return f
    if isinstance(f, A.FromSelect):
        _subst_cte(f.select, name, body)
        return f
    if isinstance(f, (A.FromPivot, A.FromUnpivot)):
        f.src = _subst_from(f.src, name, body)
        return f
    return f


def _subst_cte(q, name, body) -> None:
    """Replace every reference to CTE ``name`` inside query ``q``
    (FROM positions and IN/EXISTS/scalar subqueries, at any depth)
    with a derived-table copy of ``body``. Mutates in place."""
    if isinstance(q, A.SetOp):
        _subst_cte(q.left, name, body)
        _subst_cte(q.right, name, body)
        return
    if q.from_ is not None:
        q.from_ = _subst_from(q.from_, name, body)
    for ex in _cte_exprs(q):
        for sub in A.iter_subquery_selects(ex):
            _subst_cte(sub, name, body)


def _refs_table(q, name) -> bool:
    if isinstance(q, A.SetOp):
        return _refs_table(q.left, name) or _refs_table(q.right, name)

    def in_from(f):
        if isinstance(f, A.FromTable):
            return f.table == name
        if isinstance(f, A.FromJoin):
            return in_from(f.left) or in_from(f.right)
        if isinstance(f, A.FromSelect):
            return _refs_table(f.select, name)
        if isinstance(f, (A.FromPivot, A.FromUnpivot)):
            return in_from(f.src)
        return False

    if q.from_ is not None and in_from(q.from_):
        return True
    for ex in _cte_exprs(q):
        for sub in A.iter_subquery_selects(ex):
            if _refs_table(sub, name):
                return True
    return False


def _count_refs(q, name) -> int:
    """Occurrence count of table *name* in a (possibly compound)
    select body — FROM items, joins, derived tables, pivot sources,
    and subqueries in expressions. Drives the linearity check on
    recursive steps: a step is LINEAR iff its total cycle-reference
    count is exactly one; only then is the tandem delta-binding
    (semi-naive) evaluation equivalent to the accumulated fixpoint."""
    if isinstance(q, A.SetOp):
        return _count_refs(q.left, name) + _count_refs(q.right, name)

    def in_from(f) -> int:
        if isinstance(f, A.FromTable):
            return 1 if f.table == name else 0
        if isinstance(f, A.FromJoin):
            return in_from(f.left) + in_from(f.right)
        if isinstance(f, A.FromSelect):
            return _count_refs(f.select, name)
        if isinstance(f, (A.FromPivot, A.FromUnpivot)):
            return in_from(f.src)
        return 0

    n = in_from(q.from_) if q.from_ is not None else 0
    for ex in _cte_exprs(q):
        for sub in A.iter_subquery_selects(ex):
            n += _count_refs(sub, name)
    return n


def _sccs(names: list, refs: list) -> list:
    """Strongly connected components of the CTE member reference
    graph (r18 mutual recursion), returned in a REVERSE-topological-
    compatible evaluation order: every component appears after the
    components it references (ties broken by first declaration, so
    strata evaluate in declaration order). Iterative Tarjan — member
    lists are tiny, but recursion depth should still not depend on
    user input."""
    n = len(names)
    ix = {m: i for i, m in enumerate(names)}
    adj = [[ix[m] for m in sorted(rs) if m in ix] for rs in refs]
    index = [None] * n
    low = [0] * n
    on_stack = [False] * n
    stack: list = []
    comps: list = []
    counter = [0]
    for root in range(n):
        if index[root] is not None:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work.pop()
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack[v] = True
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if index[w] is None:
                    work.append((v, i + 1))
                    work.append((w, 0))
                    recurse = True
                    break
                if on_stack[w]:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack[w] = False
                    comp.append(w)
                    if w == v:
                        break
                comps.append(sorted(comp))
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])
    # Order strata by FIRST DECLARATION (node ids are declaration
    # positions). This is topologically valid because _with_query
    # separately rejects forward cross-SCC references — every
    # surviving cross-component edge points at an earlier-declared
    # component.
    comps.sort(key=min)
    return comps
