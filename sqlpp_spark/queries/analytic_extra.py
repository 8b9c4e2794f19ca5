"""Analytic-SQL extension queries (round 2): PIVOT/UNPIVOT, the
ranking-window suite, ordered string aggregation, and correlated
scalar subqueries. The reference supports none of these (its grammar
stops at joins + basic aggregates — parser.mly); they are part of the
beyond-reference Spark surface alongside relational.py's set ops and
window functions.

Determinism contract (same as relational.py): monetary aggregates are
exact decimals cast to double at the end; ranking windows carry a
total-order tiebreak wherever row POSITION matters (ntile/row_number);
rank/percent_rank/cume_dist order by the value alone — their outputs
are tie-stable. Correlated subqueries compare pure decimal/integer
quantities so decorrelation order cannot perturb the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sqlpp_spark.queries import register, table

DEC2 = "decimal(18,2)"

_PIVOT_YEARS = list(range(1995, 2002))


@register(
    "q_pivot_nation_year",
    oracle="""
SELECT n_name,
       """
    + ",\n       ".join(
        f"CAST(SUM(CASE WHEN year(o_orderdate) = {y} "
        f"THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_{y}"
        for y in _PIVOT_YEARS
    )
    + """
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n_name
ORDER BY n_name
""",
)
def q_pivot_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-nation revenue spread across order years as columns.
    Spark's relational pivot compiles to a single partial-aggregated
    hash aggregate over (nation, year) — one shuffle, never a
    per-year self-join. Empty cells are NULL on both engines."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "n_name",
            F.year("o_orderdate").alias("o_year"),
            F.col("o_totalprice").cast(DEC2).alias("price"),
        )
    )
    piv = joined.groupBy("n_name").pivot("o_year", _PIVOT_YEARS).agg(F.sum("price"))
    return piv.select(
        "n_name",
        *[F.col(str(y)).cast("double").alias(f"rev_{y}") for y in _PIVOT_YEARS],
    ).orderBy("n_name")


@register(
    "q_unpivot_priority_metrics",
    oracle="""
WITH base AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS DOUBLE) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_rev
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, metric, value FROM (
  SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value FROM base
  UNION ALL
  SELECT o_orderpriority, 'total_rev' AS metric, total_rev AS value FROM base
)
ORDER BY o_orderpriority, metric
""",
)
def q_unpivot_priority_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide metrics -> long rows) via the native unpivot
    operator — a zero-shuffle generate/expand node, not a UNION of
    self-reads that would rescan the aggregate per metric."""
    o = table(spark, sf_dir, "orders")
    base = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(DEC2)).cast("double").alias("total_rev"),
    )
    return base.unpivot(
        ["o_orderpriority"], ["n_orders", "total_rev"], "metric", "value"
    ).orderBy("o_orderpriority", "metric")


@register(
    "q_window_rank_suite",
    oracle="""
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey, spend,
       CAST(row_number() OVER w_total AS BIGINT) AS rn,
       CAST(ntile(4) OVER w_total AS BIGINT) AS quartile,
       CAST(rank() OVER w_val AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w_val AS BIGINT) AS drnk,
       percent_rank() OVER w_val AS pct_rank,
       cume_dist() OVER w_val AS cume
FROM spend
WINDOW w_total AS (ORDER BY spend DESC, o_custkey ASC),
       w_val AS (ORDER BY spend DESC)
ORDER BY rn
""",
)
def q_window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-window family over customer spend. Position-
    dependent functions (row_number, ntile) use a TOTAL order; value-
    rank functions (rank/dense_rank/percent_rank/cume_dist) order by
    the value alone so ties produce identical outputs on both engines.
    percent_rank/cume_dist are single divisions of exact integer
    counts — bit-equal unrounded. Scale note: a GLOBAL rank is a total
    order by definition — the single-partition window here operates on
    the per-customer aggregate (|customers| rows, not the fact table);
    at 100 TB one would segment ranks by a partition key or accept the
    aggregate-sized sort, exactly as in any engine."""
    o = table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(DEC2)).cast("double").alias("spend")
    )
    w_total = W.orderBy(F.col("spend").desc(), F.col("o_custkey").asc())
    w_val = W.orderBy(F.col("spend").desc())
    return spend.select(
        "o_custkey",
        "spend",
        F.row_number().over(w_total).cast("bigint").alias("rn"),
        F.ntile(4).over(w_total).cast("bigint").alias("quartile"),
        F.rank().over(w_val).cast("bigint").alias("rnk"),
        F.dense_rank().over(w_val).cast("bigint").alias("drnk"),
        F.percent_rank().over(w_val).alias("pct_rank"),
        F.cume_dist().over(w_val).alias("cume"),
    ).orderBy("rn")


@register(
    "q_string_agg_regions",
    oracle="""
SELECT r_name,
       CAST(COUNT(*) AS BIGINT) AS n_nations,
       string_agg(n_name, ',' ORDER BY n_name) AS nations_csv
FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
GROUP BY r_name
ORDER BY r_name
""",
)
def q_string_agg_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG): collect_list -> array_sort
    -> array_join gives an order-deterministic result regardless of
    partitioning (collect_list order alone is not deterministic)."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return (
        r.join(n, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nations"),
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations_csv"
            ),
        )
        .orderBy("r_name")
    )


_CORR_SQL = """
SELECT o.o_orderkey, o.o_custkey, CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
FROM {orders} o
WHERE CAST(o.o_totalprice AS DECIMAL(18,2))
        * (SELECT COUNT(*) FROM {orders} i WHERE i.o_custkey = o.o_custkey) * 2
      > (SELECT SUM(CAST(i.o_totalprice AS DECIMAL(18,2)))
         FROM {orders} i WHERE i.o_custkey = o.o_custkey) * 3
ORDER BY o.o_orderkey
"""


@register("q_correlated_scalar", oracle=_CORR_SQL.format(orders="orders"))
def q_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries: orders priced above 1.5x their
    customer's average, phrased as `price * n * 2 > sum * 3` so the
    comparison stays in exact decimal/integer arithmetic. Catalyst
    decorrelates both subqueries into one aggregate + join over a
    single scan (check .explain: no per-row re-execution); DuckDB does
    the same rewrite, which is why the oracle is the identical query."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("q_corr_orders")
    return spark.sql(_CORR_SQL.format(orders="q_corr_orders"))
