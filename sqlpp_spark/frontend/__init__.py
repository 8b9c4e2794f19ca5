"""sqlpp dialect frontend: lexer → parser → analyzer → elaborated AST.

Reproduces the reference's elaboration semantics (sqlpp/analyze.ml,
sqlpp/scope.ml, sqlpp/syntax.ml — see SURVEY.md §1-§3) in pure Python.
The elaborated AST is consumed by sqlpp_spark.compiler to build PySpark
DataFrame plans.
"""

from sqlpp_spark.frontend.errors import SqlppError  # noqa: F401
from sqlpp_spark.frontend.parser import parse_decls, parse_query  # noqa: F401
