"""sqlpp_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of andreypopp/sqlpp (reference surveyed in
SURVEY.md), extended with large-scale data-pipeline operators.

Two layers (SURVEY.md §7):

1. Frontend (pure Python): sqlpp-dialect lexer/parser/analyzer with the
   reference's elaboration semantics — nullability lattice, scope
   composition, fieldsets, lazy ``with`` fields, open selects, typed
   params (reference: sqlpp/analyze.ml, sqlpp/syntax.ml).
2. Backend (Spark): a compiler from the elaborated AST to PySpark
   DataFrame plans; Catalyst + Tungsten do all physical planning.

Extension operators (beyond the reference surface) live in
``sqlpp_spark.ops`` (dedup, similarity, text analysis, multimodal) and
``sqlpp_spark.streaming``.
"""

from sqlpp_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
