from sqlpp_spark.sources.tables import read_table  # noqa: F401
