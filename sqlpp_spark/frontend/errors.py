"""Located analysis/parse errors with caret snippets.

The reference renders errors with a source excerpt and a caret pointing
at the offending range (sqlpp/report.ml:39-72); we do the same so query
authors get compile-time errors before any Spark job runs.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Loc:
    """Character-offset range into the query source."""

    start: int
    end: int

    @staticmethod
    def span(a: "Loc", b: "Loc") -> "Loc":
        return Loc(a.start, b.end)


NO_LOC = Loc(0, 0)


class SqlppError(Exception):
    def __init__(self, message: str, loc: Loc | None = None, src: str | None = None):
        self.message = message
        self.loc = loc
        self.src = src
        super().__init__(self.render())

    def render(self) -> str:
        if self.loc is None or self.src is None:
            return self.message
        line_start = self.src.rfind("\n", 0, self.loc.start) + 1
        line_end = self.src.find("\n", self.loc.start)
        if line_end == -1:
            line_end = len(self.src)
        line_no = self.src.count("\n", 0, self.loc.start) + 1
        col = self.loc.start - line_start
        line = self.src[line_start:line_end]
        caret = " " * col + "⮬ " + self.message
        return f"line {line_no}, characters {col}-{self.loc.end - line_start}\n│ {line}\n│ {caret}"


def err(message: str, loc: Loc | None = None, src: str | None = None):
    raise SqlppError(message, loc, src)
