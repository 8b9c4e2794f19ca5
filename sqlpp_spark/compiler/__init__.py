from sqlpp_spark.compiler.compile import Compiler  # noqa: F401
