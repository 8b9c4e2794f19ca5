"""AST for the sqlpp dialect — raw (parser output) and elaborated
(analyzer output) share these nodes; analysis rewrites in place the way
the reference progressively elaborates its single AST (SURVEY.md §3).

Node inventory mirrors sqlpp/syntax.ml:149-251 (selectsyn, insertsyn,
updatesyn, deletesyn, exprsyn, decls) without copying its code.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

from sqlpp_spark.frontend.errors import NO_LOC, Loc
from sqlpp_spark.frontend.types import Ty

# ---------------------------------------------------------------------------
# Expressions
# ---------------------------------------------------------------------------


@dataclass
class Expr:
    loc: Loc = field(default=NO_LOC, kw_only=True)
    ty: Optional[Ty] = field(default=None, kw_only=True)  # set by analyzer


@dataclass
class ELit(Expr):
    value: object = None  # int | str | bool
    lit_kind: str = "int"  # int | string | bool


@dataclass
class ENull(Expr):
    pass


@dataclass
class EName(Expr):
    name: str = ""


@dataclass
class ENav(Expr):
    """scope.expr navigation; nested navs parse as ENav(a, ENav(b, e))."""

    scope: str = ""
    expr: Expr = None


@dataclass
class ERef(Expr):
    """Elaborated depth-1 reference: <relation>.<field> (analyzer output)."""

    rel: str = ""
    name: str = ""


@dataclass
class EApp(Expr):
    fn: str = ""
    args: List[Expr] = field(default_factory=list)
    # r16: IGNORE/RESPECT NULLS parsed inside the call parens (the
    # DuckDB placement, so raw dialect source stays oracle-runnable);
    # only meaningful once the app becomes an EWindow — the analyzer
    # rejects it anywhere else
    win_nulls: Optional[str] = None  # 'ignore' | 'respect'


@dataclass
class EIn(Expr):
    exprs: List[Expr] = field(default_factory=list)
    select: "Select" = None
    negated: bool = False
    # r12: correlated comparison conjuncts lifted by the analyzer —
    # [(op, inner_elab, outer_elab)], op oriented inner-first; the
    # compiler folds them into the semi/anti-join condition
    corr: list = field(default_factory=list)


@dataclass
class EInList(Expr):
    """``x [NOT] IN (e1, e2, ...)`` — literal/expression value list
    (r14, beyond reference; EIn covers the subquery form). Compiles to
    Catalyst's In/InSet via Column.isin (not an OR chain), which keeps
    long lists a single predicate-pushdown-able expression."""

    expr: Expr = None
    items: List[Expr] = field(default_factory=list)
    negated: bool = False


@dataclass
class EExists(Expr):
    select: "Select" = None
    corr: list = field(default_factory=list)  # as EIn.corr (r12)


@dataclass
class EScalarSub(Expr):
    """Scalar-position subquery ``(select agg(..) from .. group by ())``
    — a BEYOND-REFERENCE extension (r11): the reference's subselects
    appear only in FROM/IN/EXISTS positions (analyze.ml:430-442).
    The select must project exactly one field, a single global
    aggregate (``group by ()``, the dialect's global-agg spelling), so
    the ≤1-row property holds by construction — no runtime multi-row
    error path. Comparison conjuncts (= != < <= > >=) referencing the
    OUTER scope are decorrelated by the analyzer into ``corr``
    (op, inner_expr, outer_expr) triples — op oriented inner-first —
    compiled as a grouped left join (pure-equality case) or via
    distinct outer keys (any theta op, r12); they are re-inserted
    into the analyzed select's WHERE (marked ``_corr``) so the SQL
    printers emit the standard correlated form."""

    select: "Select" = None
    corr: list = field(default_factory=list)  # [(op, inner_elab, outer_elab)]
    agg_fn: str = ""  # lowercase fn of the lone aggregate (count → 0)


@dataclass
class EQuant(Expr):
    """``x op ANY/ALL (subquery)`` quantified comparison for the
    ORDERED ops (r15, beyond reference — standard SQL's other
    quantified forms; ``= ANY`` and ``!= ALL`` desugar at parse time
    to the IN machinery, which also carries their correlated forms).
    Ops here: ``< <= > >=`` with either quantifier, plus ``!= ANY``
    and ``= ALL``. Uncorrelated or equality-correlated (theta
    correlation is a targeted analyzer error). Uncorrelated forms
    compile to a broadcast one-row aggregate marker
    (count / non-null count / min / max — bounded state, map-side
    combinable: the 100 TB shape) joined on TRUE, then a CASE that is
    EXACT in Kleene 3VL: empty set decides (FALSE for ANY, TRUE for
    ALL); a witness/falsifier among the non-null values decides;
    otherwise a NULL probe or NULL element yields UNKNOWN."""

    op: str = "<"  # '<' '<=' '>' '>=' '!=' (ANY) / '=' (ALL)
    quant: str = "any"  # 'any' | 'all'
    expr: Expr = None
    select: object = None  # Select | SetOp
    # equality-correlation triples as EIn.corr (r15: the marker
    # aggregates group by these keys instead of reducing globally)
    corr: list = field(default_factory=list)


@dataclass
class EAscribe(Expr):
    """``expr : TY`` checked-and-erased ascription (reference
    semantics) — or, with ``convert=True`` (r15), ``CAST(expr AS TY)``
    which CONVERTS and is kept through compile/print."""

    expr: Expr = None
    to_ty: Ty = None
    convert: bool = False
    # r15: TRY_CAST — converting cast that yields NULL where CAST
    # would raise (malformed strings, overflow); implies convert
    safe: bool = False


@dataclass
class EParam(Expr):
    name: str = ""
    ascribed: Optional[Ty] = None  # ?p:ty [null|not null]
    null_spec: Optional[bool] = None  # True=not null, False=null, None=bare
    is_expr_param: bool = False  # ?p:ty expr


@dataclass
class EWindow(Expr):
    """Window-function application (r13, beyond-reference):
    ``fn(args) OVER (PARTITION BY .. ORDER BY .. [frame])``. Ranking
    and offset functions require an ORDER BY (enforced by the
    analyzer); without an explicit frame the SQL defaults apply (with
    ORDER BY: RANGE UNBOUNDED PRECEDING..CURRENT ROW; without: the
    whole partition), identical in Spark and the SQL printers' target
    engines. r14 adds explicit ``ROWS/RANGE [BETWEEN .. AND ..]``
    frames (aggregate/value functions only — Spark rejects frames on
    ranking/offset fns, and the other engines ignore them there)."""

    fn: str = ""
    args: List[Expr] = field(default_factory=list)
    partition_by: List[Expr] = field(default_factory=list)
    order_by: List["OrderItem"] = field(default_factory=list)
    frame: Optional["WindowFrame"] = None
    # r16: IGNORE/RESPECT NULLS on lag/lead/nth_value/first_value/
    # last_value (None = engine default, i.e. respect)
    nulls_mode: Optional[str] = None  # 'ignore' | 'respect'
    # r16: ``OVER w`` named-window reference; the analyzer replaces it
    # with the WINDOW clause's spec (partition/order/frame) in place
    ref: Optional[str] = None


# frame bound kinds, in frame order (start must not sort after end)
FRAME_BOUND_ORDER = {
    "unbounded preceding": 0, "preceding": 1, "current row": 2,
    "following": 3, "unbounded following": 4,
}


@dataclass
class WindowFrame:
    """Explicit window frame (r14): ``mode`` is 'rows' or 'range';
    bounds are (kind, n) with kind from FRAME_BOUND_ORDER and n the
    integer offset for 'preceding'/'following' (None otherwise)."""

    mode: str = "rows"  # 'rows' | 'range'
    start: tuple = ("unbounded preceding", None)
    end: tuple = ("current row", None)
    loc: Loc = NO_LOC

    def contains_current_row(self) -> bool:
        """True when the frame provably includes CURRENT ROW for every
        row — then aggregate/value functions keep their no-frame
        nullability (the frame is never empty)."""
        so = FRAME_BOUND_ORDER[self.start[0]]
        eo = FRAME_BOUND_ORDER[self.end[0]]
        return so <= 2 <= eo


@dataclass
class EMatchBranch:
    tag: str = ""
    params: List[str] = field(default_factory=list)
    body: Expr = None


@dataclass
class EMatch(Expr):
    param: str = ""
    branches: List[EMatchBranch] = field(default_factory=list)


# ---------------------------------------------------------------------------
# Select & friends
# ---------------------------------------------------------------------------


@dataclass
class Field:
    """One projection entry (syntax.ml:212-214)."""

    expr: Expr = None
    name: Optional[str] = None  # explicit AS name
    is_lazy: bool = False  # `with expr as name`
    loc: Loc = NO_LOC
    # analyzer state:
    out_name: Optional[str] = None  # final output name
    is_used: bool = False
    is_generated: bool = False
    explicit_name: bool = False


@dataclass
class FieldWithScope:
    path: List[str] = field(default_factory=list)
    alias: str = ""
    loc: Loc = NO_LOC


@dataclass
class FieldFieldset:
    name: str = ""
    args: List[List[str]] = field(default_factory=list)  # scope paths
    is_lazy: bool = False
    loc: Loc = NO_LOC


@dataclass
class FromTable:
    table: str = ""
    alias: Optional[str] = None
    loc: Loc = NO_LOC


@dataclass
class FromSelect:
    select: "Select" = None
    alias: str = ""
    loc: Loc = NO_LOC
    # r17: JOIN LATERAL (select ...) — the body may reference columns
    # of FROM items to its left; the analyzer lifts the correlation
    # (analyze._analyze_lateral) and the compiler decorrelates to a
    # hash join / pre-windowed top-k (compile._join_lateral)
    lateral: bool = False


@dataclass
class FromSeries:
    """``FROM generate_series(start, stop [, step]) AS t(col)`` (r15,
    beyond reference) — the synthetic-range/date-spine table function.
    Bounds are INCLUSIVE on both ends (DuckDB/PG convention); step
    defaults to 1 and must be a nonzero int literal or bound int
    param. Compiles to spark.range (split across executors — a range
    is embarrassingly parallel at any scale); prints natively on
    DuckDB/PG, raises on SQLite."""

    start: Expr = None
    stop: Expr = None
    step: Optional[Expr] = None
    alias: str = ""
    col: str = ""
    loc: Loc = NO_LOC


@dataclass
class FromJoin:
    left: object = None  # From*
    right: object = None  # FromTable | FromSelect
    kind: str = "inner"  # inner | left
    on: Expr = None
    loc: Loc = NO_LOC


@dataclass
class OrderItem:
    expr: Expr = None
    desc: bool = False
    # late r14: explicit NULLS FIRST/LAST ("first" | "last" | None).
    # None means the dialect's PINNED default — NULLS LAST for both
    # directions (DuckDB's rule, keeping raw dialect source runnable
    # on the oracle engine) — which the Spark compiler enforces and
    # every SQL printer spells out explicitly, because the backends
    # disagree when left implicit (Spark ASC defaults nulls-first,
    # PG DESC nulls-first, SQLite ASC nulls-first).
    nulls: str = None


@dataclass
class Select:
    fields: List[object] = field(default_factory=list)  # Field | FieldWithScope | FieldFieldset
    from_: object = None  # From* | None
    where: Optional[Expr] = None
    group_by: Optional[List[Expr]] = None  # [] means GROUP BY ()
    # r14: 'plain' | 'rollup' | 'cube' | 'sets'; for 'sets',
    # group_sets holds one list of expr-indices (into group_by) per set
    group_kind: str = "plain"
    group_sets: Optional[List[List[int]]] = None
    having: Optional[Expr] = None
    qualify: Optional[Expr] = None  # r14: filter on window results
    order_by: List[OrderItem] = field(default_factory=list)
    limit: Optional[Expr] = None
    offset: Optional[Expr] = None
    is_open: bool = False  # `...` present
    distinct: bool = False  # extension (not in reference grammar)
    # r16: SELECT DISTINCT ON (exprs) — keep the first row per key
    # group in ORDER BY order (PG semantics: ORDER BY must lead with
    # the ON expressions)
    distinct_on: Optional[List[Expr]] = None
    # r15: GROUP BY ALL (group by every non-aggregate projection
    # expression) and ORDER BY ALL [DESC] (sort by every output
    # column left-to-right) — DuckDB's determinism sugar; both
    # desugar in the analyzer against the resolved projection
    group_all: bool = False
    order_all: "Optional[str]" = None  # None | 'asc' | 'desc'
    # r16: named windows — WINDOW w AS (PARTITION BY .. ORDER BY ..
    # [frame]) [, ..], referenced as fn() OVER w; the analyzer
    # substitutes the spec into each referencing EWindow
    windows: List["NamedWindow"] = field(default_factory=list)
    loc: Loc = NO_LOC


@dataclass
class EInterval(Expr):
    """INTERVAL <int> <unit> literal (r16, beyond reference) — only
    valid as the right operand of + / - on a DATETIME; the analyzer
    rejects every other position. Units: second minute hour day week
    month quarter year (plural accepted, normalized to singular)."""

    n: int = 0
    unit: str = ""


INTERVAL_UNITS = (
    "second", "minute", "hour", "day", "week", "month", "quarter",
    "year",
)


@dataclass
class NamedWindow:
    """One WINDOW-clause entry (r16, beyond reference — standard SQL /
    DuckDB named windows)."""

    name: str = ""
    partition_by: List[Expr] = field(default_factory=list)
    order_by: List["OrderItem"] = field(default_factory=list)
    frame: Optional["WindowFrame"] = None
    loc: Loc = NO_LOC


@dataclass
class SetOp:
    """Compound select (r14, beyond reference — the reference grammar
    has no set operations, parser.mly; the keywords were already
    reserved, lexer.py). ``left``/``right`` are Select or nested SetOp;
    INTERSECT binds tighter than UNION/EXCEPT and chains associate
    left, mirroring standard SQL. ORDER BY / LIMIT / OFFSET live only
    on the OUTERMOST node and apply to the whole compound; the parser
    rejects them on inner branches."""

    op: str = "union"  # 'union' | 'intersect' | 'except'
    all: bool = False  # bag semantics (UNION ALL / INTERSECT ALL / EXCEPT ALL)
    left: object = None  # Select | SetOp
    right: object = None  # Select | SetOp
    order_by: List[OrderItem] = field(default_factory=list)
    limit: Optional[Expr] = None
    offset: Optional[Expr] = None
    order_all: "Optional[str]" = None  # r15: ORDER BY ALL on compounds
    loc: Loc = NO_LOC


@dataclass
class FromPivot:
    """``FROM <src> PIVOT (agg(expr) FOR col IN (lit [AS name], ...))
    [AS alias]`` (r18, beyond reference — Spark/Oracle/T-SQL pivot
    with a static IN list). Parse-level only: the analyzer desugars
    it into grouped conditional aggregation over the source — the
    portable spelling every backend runs natively — so the compiler
    and printers never see this node. Implicit group keys are every
    source column not referenced by the pivot clause (Spark's rule)."""

    src: object = None  # FromTable | FromSelect
    agg_fn: str = ""  # first aggregate (compat accessor)
    agg_arg: Expr = None
    pivot_col: str = ""
    values: List[tuple] = field(default_factory=list)  # (ELit, name|None)
    alias: Optional[str] = None
    # r19: full aggregate list [(fn, arg, name|None), ...]; multiple
    # aggregates require AS names (parser-enforced — unnamed
    # multi-agg columns like '2023_sum(amt)' are unreferenceable in
    # a dialect without quoted identifiers)
    aggs: List[tuple] = field(default_factory=list)
    # r19: IN list omitted — values discovered at plan time by one
    # DISTINCT job over the pivot column (engine-provided hook,
    # capped by spark.sqlpp.pivot.maxValues)
    dynamic: bool = False
    loc: Loc = NO_LOC


@dataclass
class FromUnpivot:
    """``FROM <src> UNPIVOT [INCLUDE NULLS] (val FOR name IN (col
    [AS 'label'], ...)) [AS alias]`` (r18, beyond reference — melt).
    Parse-level only: the analyzer desugars into ONE scan of the
    source cross-joined with a constant generate_series(1, N) spine
    plus CASE dispatch on the spine index — never the N-scan UNION
    ALL naive melt (at 100 TB the source is read once; the N-row
    spine is a broadcast). Spark's Expand-based DataFrame.unpivot is
    the marginal further optimization; the series+CASE plan already
    keeps the single scan and runs natively on every SQL backend."""

    src: object = None  # FromTable | FromSelect
    val_name: str = ""  # first value column (compat accessor)
    name_name: str = ""
    # (cols_tuple, label|None) — cols_tuple arity == len(val_names)
    # (r19 multi-column groups; the single-column form is arity 1)
    cols: List[tuple] = field(default_factory=list)
    # r19: all value columns, e.g. UNPIVOT ((a, b) FOR k IN ((c1, c2)))
    val_names: List[str] = field(default_factory=list)
    include_nulls: bool = False
    alias: Optional[str] = None
    loc: Loc = NO_LOC


@dataclass
class RecMember:
    """One recursive CTE member of a WITH RECURSIVE (r18 — multiple
    members, including mutual cycles). ``refs`` is the set of member
    names the ORIGINAL body references (parser-computed, drives SCC
    classification); ``scc`` is the member's stratum index in
    evaluation order (SCCs of the member reference graph, ordered by
    first declaration — members sharing an scc form a mutual cycle
    and iterate in tandem)."""

    name: str = ""
    columns: List[str] = field(default_factory=list)  # optional rename list
    base: object = None  # Select | SetOp — must not reference its SCC
    step: object = None  # Select | SetOp — references the SCC
    union_all: bool = False
    refs: frozenset = frozenset()
    scc: int = 0
    # True when the step's total cycle-reference count exceeds one
    # (non-linear rule): the compiler must re-evaluate over the
    # accumulated results instead of delta-binding (parser-computed)
    nonlinear: bool = False
    loc: Loc = NO_LOC


@dataclass
class RecursiveQuery:
    """``WITH RECURSIVE name [(cols)] AS (base UNION [ALL] step)
    [, ...] <main>`` (r17 single member; r18 multiple members and
    mutual cycles — beyond reference: the reference grammar has no
    CTEs at all, parser.mly). Unlike plain CTEs (inlined at parse
    time, parser._with_query) recursive members cannot be substituted
    away: steps and ``main`` reference member names as tables, bound
    iteratively at execution (compiler._compile_recursive — the same
    bounded-superstep loop the engine uses for BFS / pagerank in
    queries/web_queries.py). ``union_all`` selects bag semantics per
    member: UNION (distinct) feeds only globally-new rows to the next
    iteration, the standard fixpoint form. Members evaluate stratum
    by stratum (declaration order of SCCs): a later member's
    references to an earlier stratum see the COMPLETED result — the
    DuckDB/PG stratified semantics — while members inside one SCC
    iterate in tandem (UNION-distinct only, where semi-naive and
    accumulated evaluation provably coincide for monotone steps)."""

    members: List[RecMember] = field(default_factory=list)
    main: object = None  # Select | SetOp
    loc: Loc = NO_LOC


# ---------------------------------------------------------------------------
# DML statements
# ---------------------------------------------------------------------------


@dataclass
class Insert:
    table: str = ""
    columns: List[str] = field(default_factory=list)
    values: Optional[List[List[Expr]]] = None  # VALUES rows
    select: Optional[Select] = None  # INSERT ... SELECT
    on_conflict: Optional[str] = None  # 'ignore' | 'replace'
    returning: List[Field] = field(default_factory=list)
    loc: Loc = NO_LOC


@dataclass
class Update:
    table: str = ""
    alias: Optional[str] = None
    sets: List[Tuple[str, Expr]] = field(default_factory=list)
    from_: object = None
    where: Optional[Expr] = None
    returning: List[Field] = field(default_factory=list)
    loc: Loc = NO_LOC


@dataclass
class Delete:
    table: str = ""
    alias: Optional[str] = None
    where: Optional[Expr] = None
    returning: List[Field] = field(default_factory=list)
    loc: Loc = NO_LOC


# ---------------------------------------------------------------------------
# Declarations (schema env)
# ---------------------------------------------------------------------------


@dataclass
class ColumnDef:
    name: str = ""
    ty: Ty = None
    primary_key: bool = False
    autoincrement: bool = False
    default: Optional[Expr] = None


@dataclass
class DeclTable:
    name: str = ""
    columns: List[ColumnDef] = field(default_factory=list)
    loc: Loc = NO_LOC


@dataclass
class DeclQuery:
    name: str = ""
    select: Select = None
    src: str = ""  # original source for re-parse at use site
    loc: Loc = NO_LOC


@dataclass
class STyTable:
    table: str = ""


@dataclass
class STyStruct:
    # entries: ('field', name, ty) | ('scope', name, STy)
    entries: List[tuple] = field(default_factory=list)


@dataclass
class FieldsetParam:
    sty: object = None  # STyTable | STyStruct
    alias: str = ""


@dataclass
class DeclFieldset:
    name: str = ""
    params: List[FieldsetParam] = field(default_factory=list)
    select: Select = None
    src: str = ""
    loc: Loc = NO_LOC


# ---------------------------------------------------------------------------
# DDL evolution statements (ddl.ml:2-15; env sync sqlpp.ml:123-196)
# ---------------------------------------------------------------------------


@dataclass
class DdlDropTable:
    table: str = ""
    loc: Loc = NO_LOC


@dataclass
class DdlRenameTable:
    table: str = ""
    new_name: str = ""
    loc: Loc = NO_LOC


@dataclass
class DdlRenameColumn:
    table: str = ""
    column: str = ""
    new_name: str = ""
    loc: Loc = NO_LOC


@dataclass
class DdlDropColumn:
    table: str = ""
    column: str = ""
    loc: Loc = NO_LOC


@dataclass
class DdlAddColumn:
    table: str = ""
    column: ColumnDef = None
    loc: Loc = NO_LOC


DDL_NODES = (
    DeclTable, DdlDropTable, DdlRenameTable, DdlRenameColumn,
    DdlDropColumn, DdlAddColumn,
)


# ---------------------------------------------------------------------------
# Structural equality key (hash-consing equivalent)
# ---------------------------------------------------------------------------


def expr_key(e: Expr) -> tuple:
    """Canonical structural key for elaborated expressions — the
    engine's stand-in for the reference's Eq_class hash-consing
    (sqlpp_std.ml:12-44): equal keys ⇒ same generated field is reused
    and GROUP BY membership matches by expression equality."""
    if isinstance(e, ELit):
        return ("lit", e.lit_kind, e.value)
    if isinstance(e, ENull):
        return ("null",)
    if isinstance(e, ERef):
        return ("ref", e.rel, e.name)
    if isinstance(e, EName):
        return ("name", e.name)
    if isinstance(e, ENav):
        return ("nav", e.scope, expr_key(e.expr))
    if isinstance(e, EApp):
        return ("app", e.fn, tuple(expr_key(a) for a in e.args))
    if isinstance(e, EAscribe):
        if e.convert:  # CAST converts — NOT erased (r15)
            return ("cast", e.to_ty.kind, expr_key(e.expr))
        return expr_key(e.expr)  # ascriptions are erased (printer.ml:162)
    if isinstance(e, EParam):
        return ("param", e.name)
    if isinstance(e, EInterval):  # r16
        return ("interval", e.n, e.unit)
    if isinstance(e, EIn):
        return ("in", e.negated, tuple(expr_key(x) for x in e.exprs), id(e.select))
    if isinstance(e, EInList):
        return (
            "inlist", e.negated, expr_key(e.expr),
            tuple(expr_key(x) for x in e.items),
        )
    if isinstance(e, EExists):
        return ("exists", id(e.select))
    if isinstance(e, EScalarSub):
        return ("scalarsub", id(e.select))
    if isinstance(e, EQuant):
        return ("quant", e.op, e.quant, expr_key(e.expr), id(e.select))
    if isinstance(e, EWindow):
        return (
            "window", e.fn,
            tuple(expr_key(a) for a in e.args),
            tuple(expr_key(x) for x in e.partition_by),
            tuple((expr_key(o.expr), o.desc) for o in e.order_by),
        )
    if isinstance(e, EMatch):
        return (
            "match",
            e.param,
            tuple((b.tag, tuple(b.params), expr_key(b.body)) for b in e.branches),
        )
    raise TypeError(f"expr_key: {type(e)}")


def iter_subquery_selects(e):
    """Yield every RAW subquery body (Select | SetOp) under an
    unanalyzed expression — the parse-time CTE inliner (r15) walks
    these to substitute CTE references inside IN/EXISTS/scalar
    subqueries too."""
    if e is None:
        return
    if isinstance(e, (EIn, EExists, EScalarSub, EQuant)):
        yield e.select
    for child in getattr(e, "args", None) or []:
        yield from iter_subquery_selects(child)
    if isinstance(e, EIn):
        for x in e.exprs:
            yield from iter_subquery_selects(x)
    if isinstance(e, EQuant):
        yield from iter_subquery_selects(e.expr)
    if isinstance(e, EInList):
        yield from iter_subquery_selects(e.expr)
        for x in e.items:
            yield from iter_subquery_selects(x)
    if isinstance(e, EWindow):
        for x in [*e.partition_by, *[o.expr for o in e.order_by]]:
            yield from iter_subquery_selects(x)
    if isinstance(e, (EAscribe, ENav)):
        yield from iter_subquery_selects(e.expr)
    if isinstance(e, EMatch):
        for b in e.branches:
            yield from iter_subquery_selects(b.body)


def expr_has_subquery(e) -> bool:
    """IN (subquery) / EXISTS anywhere below ``e`` — such expressions
    need elaboration (sub_ctx) before SQL printing, and DataFrame-level
    join rewrites instead of a scalar Column in the engine."""
    if e is None:
        return False
    if isinstance(e, (EIn, EExists, EScalarSub, EQuant)):
        return True
    for child in getattr(e, "args", None) or []:
        if expr_has_subquery(child):
            return True
    if isinstance(e, EInList):
        return expr_has_subquery(e.expr) or any(
            expr_has_subquery(x) for x in e.items
        )
    if isinstance(e, EWindow):
        return any(
            expr_has_subquery(x)
            for x in [*e.partition_by, *[o.expr for o in e.order_by]]
        )
    if isinstance(e, (EAscribe, ENav)):
        return expr_has_subquery(e.expr)
    if isinstance(e, EMatch):
        return any(expr_has_subquery(b.body) for b in e.branches)
    return False
