"""Lexer for the sqlpp dialect (token surface per sqlpp/lexer.ml:112-264).

Notable tokens: `...` (open-select / fieldset splice), `?name` params,
`->` match arrows, `|` branch separator, `:` type ascriptions. Only
int/string/bool literals exist in the reference (syntax.ml:140); we
additionally lex float literals as an extension.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from sqlpp_spark.frontend.errors import Loc, SqlppError

KEYWORDS = {
    "select", "from", "where", "group", "by", "having", "order", "limit",
    "offset", "join", "left", "on", "as", "with", "withscope", "create",
    "table", "query", "fieldset", "insert", "into", "values", "set",
    "update", "delete", "returning", "match", "end", "null", "not",
    "true", "false", "and", "or", "in", "exists", "is", "asc", "desc",
    "conflict", "do", "nothing", "ignore", "replace", "primary", "key",
    "autoincrement", "default", "union", "all", "intersect", "except",
    "distinct", "cross", "inner", "outer", "right", "full",
    "alter", "drop", "rename", "add", "column", "to",
}

TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>--[^\n]*)
  | (?P<ellipsis>\.\.\.)
  | (?P<float>\d+\.\d+)
  | (?P<int>\d+)
  | (?P<string>'(?:[^']|'')*')
  | (?P<param>\?[A-Za-z_][A-Za-z0-9_]*)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<arrow>->)
  | (?P<op>!=|<=|>=|<>|=|<|>|\+|-|\*|/|\|\||%)
  | (?P<punct>[(),.;:|])
    """,
    re.VERBOSE,
)


@dataclass(frozen=True)
class Token:
    kind: str  # kw | ident | int | float | string | param | op | punct | ellipsis | arrow | eof
    value: str
    loc: Loc


def tokenize(src: str) -> list[Token]:
    out: list[Token] = []
    pos = 0
    n = len(src)
    while pos < n:
        m = TOKEN_RE.match(src, pos)
        if not m:
            raise SqlppError(f"unexpected character {src[pos]!r}", Loc(pos, pos + 1), src)
        kind = m.lastgroup
        text = m.group()
        loc = Loc(m.start(), m.end())
        if kind in ("ws", "comment"):
            pass
        elif kind == "ident":
            if text.lower() in KEYWORDS:
                # keep original case: contextual keywords double as
                # identifiers (e.g. variant tags like `All`)
                out.append(Token("kw", text, loc))
            else:
                out.append(Token("ident", text, loc))
        elif kind == "string":
            out.append(Token("string", text[1:-1].replace("''", "'"), loc))
        elif kind == "param":
            out.append(Token("param", text[1:], loc))
        else:
            out.append(Token(kind, text, loc))
        pos = m.end()
    out.append(Token("eof", "", Loc(n, n)))
    return out
