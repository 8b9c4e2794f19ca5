"""Core relational query suite — the operator inventory of SURVEY.md §2
expressed Spark-first over the driver's TPC-H-ish tables, each with a
DuckDB oracle.

Determinism contract with the oracle: monetary aggregates are computed
over exact decimals (order-independent) and cast to double at the end,
so Spark and DuckDB produce bit-identical values regardless of
partitioning / summation order. Integer sums are cast to BIGINT on the
DuckDB side (DuckDB widens BIGINT sums to HUGEINT otherwise). Every
LIMIT query carries a total-order tiebreak.

Operator coverage map (reference → query):
- SELECT/WHERE/GROUP BY/HAVING/ORDER/LIMIT/OFFSET (analyze.ml:623-702) →
  q1, q3, q_having, q_order_limit_offset
- inner/left joins, theta joins (analyze.ml:786-824) → q3, q5, q10,
  q_left_join_orders, q_theta_join, q_cross_join
- IN / EXISTS / NOT EXISTS subqueries (analyze.ml:430-445) →
  q_in_subquery, q_semi_exists, q_anti_not_exists
- aggregates count/sum/max/min + GROUP BY () (analyze.ml:546-554,
  parser.mly:258) → q1, q6, q_global_agg
- scalar fns =,!=,<,>,AND,OR,NOT,arith,IS NULL,nullif,coalesce,
  toString,date/datetime (analyze.ml:546-621) → q_case_scalar,
  q_string_funcs, q_date_funcs
- beyond-reference Spark extensions: distinct, set ops, windows,
  count(distinct), rollup/cube → q_distinct .. q_cube
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sqlpp_spark.queries import register, table

# Exact-decimal casts: prices/quantities carry ≤2 fractional digits,
# rates (discount/tax) ≤4. Decimal arithmetic is exact at these scales,
# so aggregation order cannot perturb the result.
DEC2 = "decimal(18,2)"
DEC4 = "decimal(18,4)"


def _d2(c):
    return F.col(c).cast(DEC2)


def _d4(c):
    return F.col(c).cast(DEC4)


def _disc_price():
    # l_extendedprice * (1 - l_discount), exact
    return _d2("l_extendedprice") * (F.lit(1).cast(DEC4) - _d4("l_discount"))


SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))"
)

# Rates need only 8 digits; the narrow precision keeps the triple
# product price*(1-disc)*(1+tax) within 38 digits, i.e. EXACT in both
# Spark (18+8+1 then 27+8+1 = 36) and DuckDB (18+8=26 then 34) — a
# wider cast overflows and each engine rounds differently mid-way.
DECR = "decimal(8,4)"


def _dr(c):
    return F.col(c).cast(DECR)


def _charge():
    # l_extendedprice * (1 - l_discount) * (1 + l_tax), exact
    return (
        _d2("l_extendedprice")
        * (F.lit(1).cast(DECR) - _dr("l_discount"))
        * (F.lit(1).cast(DECR) + _dr("l_tax"))
    )


SQL_CHARGE = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))"
    " * (CAST(1 AS DECIMAL(8,4)) + CAST(l_tax AS DECIMAL(8,4)))"
)


# --------------------------------------------------------------------------
# TPC-H-flavored headline queries
# --------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    headline=True,
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(SUM({SQL_CHARGE}), 2) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: scan-heavy group-aggregate. One shuffle on the two
    low-cardinality group keys; partial aggregation happens map-side, so
    at 100 TB the shuffle moves only (6 groups × partials)."""
    l = table(spark, sf_dir, "lineitem")
    charge = _charge()
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_d2("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_d2("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_disc_price()).cast("double").alias("sum_disc_price"),
            # round to scale 2 first: a scale-10 sum's unscaled int128
            # exceeds 2^53, where decimal→double double-rounds
            # differently per engine (DuckDB int128/10^s vs JVM BigDecimal)
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            (F.sum(_d2("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_d2("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(_d4("l_discount")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    headline=True,
    oracle=f"""
SELECT l_orderkey,
       CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: selective dim filter → join → top-k. customer is NOT
    broadcast-hinted: it scales WITH the fact tables (1:10 with
    orders), so a hard hint becomes an executor OOM at the 100 TB
    north star. AQE broadcasts it while its post-filter size fits
    autoBroadcastJoinThreshold and switches to shuffle-hash beyond —
    the plan you want at every scale (round-9 verdict ask #2)."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    headline=True,
    oracle=f"""
SELECT n_name, CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way star join. True dimensions (supplier, nation,
    region) carry broadcast hints; customer does NOT — it scales with
    the facts, so AQE decides (broadcast while it fits, shuffle-hash
    at 100×). Only orders⋈lineitem must shuffle on orderkey."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"))
    )


@register(
    "q6_revenue_forecast",
    headline=True,
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.04 AND 0.06
  AND l_quantity < 24
""",
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan + filter + global aggregate. Filters push to
    the parquet reader; the 'shuffle' is a single-row partial-agg
    gather. (reference requires GROUP BY () for global aggregates —
    SURVEY §2.5; DataFrame .agg is that form.)"""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_d2("l_extendedprice") * _d4("l_discount")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q10_returned_items",
    headline=True,
    oracle=f"""
SELECT c_custkey, c_name,
       CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue per customer, top 20.
    nation keeps its broadcast hint (true dimension, 25 rows at any
    SF); customer is unhinted — it scales with the facts, AQE picks
    broadcast vs shuffle-hash by measured size."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Join forms
# --------------------------------------------------------------------------


@register(
    "q_left_join_orders",
    oracle="""
SELECT c_custkey,
       COUNT(o_orderkey) AS order_count,
       CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
FROM customer
LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
""",
)
def q_left_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT JOIN with nullable right side (reference: Join_left makes the
    right scope nullable, analyze.ml:801-805); COUNT(col) skips nulls so
    customers without orders report 0."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("order_count"),
            F.coalesce(F.sum(_d2("o_totalprice")), F.lit(0).cast(DEC2))
            .cast("double")
            .alias("total_spent"),
        )
    )


@register(
    "q_semi_exists",
    oracle="""
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
)
""",
)
def q_semi_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS subquery (reference Expr_exists, analyze.ml:443-445) →
    left-semi join: no duplication, right side never materializes into
    the output."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "q_anti_not_exists",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
)
""",
)
def q_anti_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left-anti join. The subquery is date-filtered
    (customers with no RECENT order) so the result is non-empty at
    every SF — an unfiltered version matches trivially on 0 rows
    because the generator gives every customer at least one order."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "q_in_subquery",
    oracle="""
SELECT p_partkey, p_name, p_retailprice
FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
""",
)
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x IN (subquery) (reference Expr_in, analyze.ml:430-442) → semi
    join on the subquery's single column."""
    p = table(spark, sf_dir, "part")
    sub = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 49)
        .select("l_partkey")
    )
    return p.join(sub, p.p_partkey == sub.l_partkey, "left_semi").select(
        "p_partkey", "p_name", "p_retailprice"
    )


@register(
    "q_theta_join",
    oracle="""
SELECT n_name, COUNT(*) AS n_pairs
FROM supplier
JOIN customer ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
""",
)
def q_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join (reference allows arbitrary ON conditions,
    parser.mly:297-311): equi-key on nationkey carries the hash
    partitioning; the inequality is a post-join filter, so this stays a
    hash join rather than a nested-loop cross product."""
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        s.join(c, (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "q_cross_join",
    oracle="""
SELECT r_name, COUNT(*) AS n_nations
FROM region CROSS JOIN nation
GROUP BY r_name
""",
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (reference: JOIN ... ON TRUE, test/sqlpp/with-scope.t:84-99)."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return r.crossJoin(n).groupBy("r_name").agg(F.count(F.lit(1)).alias("n_nations"))


# --------------------------------------------------------------------------
# Aggregation / filtering forms
# --------------------------------------------------------------------------


@register(
    "q_having",
    oracle="""
SELECT n_name, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
HAVING COUNT(*) > 20
""",
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (analyze.ml:662-670): post-aggregation filter."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_d2("c_acctbal")).cast("double").alias("total_bal"),
        )
        .filter(F.col("n_customers") > 20)
    )


@register(
    "q_global_agg",
    oracle="""
SELECT COUNT(*) AS n_rows,
       CAST(MIN(l_shipdate) AS TIMESTAMP) AS first_ship,
       CAST(MAX(l_shipdate) AS TIMESTAMP) AS last_ship,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
       CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
       CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price
FROM lineitem
""",
)
def q_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global aggregation over the fact table (GROUP BY () in the
    reference grammar, parser.mly:258)."""
    l = table(spark, sf_dir, "lineitem")
    return l.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
        F.sum(_d2("l_quantity")).cast("double").alias("total_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


@register(
    "q_count_distinct",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — beyond-reference (SURVEY §2.5 'not present');
    Spark expands to a two-phase aggregate automatically."""
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "q_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets — beyond-reference extension."""
    l = table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_d2("l_quantity")).cast("double").alias("qty"),
    )


@register(
    "q_grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — one aggregation pass computes the
    per-returnflag, per-shipmode, and grand totals."""
    l = table(spark, sf_dir, "lineitem")
    return l.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []], "l_returnflag", "l_linestatus"
    ).agg(F.count(F.lit(1)).alias("n"))


@register(
    "q_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets — beyond-reference extension."""
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_d2("o_totalprice")).cast("double").alias("total"),
    )


# --------------------------------------------------------------------------
# Sort / limit / set ops / distinct
# --------------------------------------------------------------------------


@register(
    "q_order_limit_offset",
    oracle="""
SELECT o_orderkey, o_totalprice, o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10 OFFSET 5
""",
)
def q_order_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT + OFFSET (reference analyze.ml:671-697; OFFSET
    independent of LIMIT)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .offset(5)
        .limit(10)
    )


@register(
    "q_distinct",
    oracle="""
SELECT DISTINCT c_mktsegment, c_nationkey
FROM customer
""",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT — beyond-reference extension (hash aggregate on all cols)."""
    return table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@register(
    "q_union",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — beyond-reference set op (SURVEY §2.6 'absent')."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "q_union_all",
    oracle="""
SELECT k, COUNT(*) AS n FROM (
  SELECT c_nationkey AS k FROM customer
  UNION ALL
  SELECT s_nationkey AS k FROM supplier
) GROUP BY k
""",
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.unionAll(s).groupBy("k").agg(F.count(F.lit(1)).alias("n"))


@register(
    "q_except",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000
""",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct). The supplier side is balance-filtered so the
    difference is non-empty at every SF — unfiltered, suppliers cover
    all 25 nations and the result trivially matches on 0 rows."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.subtract(s)  # EXCEPT (distinct) semantics


@register(
    "q_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


# --------------------------------------------------------------------------
# Window functions (beyond-reference)
# --------------------------------------------------------------------------


@register(
    "q_window_topk_per_group",
    headline=True,
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
  FROM orders
) WHERE rn <= 3
""",
)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via row_number window. One shuffle on the
    partition key; Spark's WindowGroupLimit pushes the rn<=3 limit into
    the sort at physical level (rank-limit optimization)."""
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "q_window_running_sum",
    oracle="""
SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
            OVER (PARTITION BY l_suppkey
                  ORDER BY l_shipdate, l_orderkey, l_linenumber
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_revenue
FROM lineitem
WHERE l_suppkey <= 10
""",
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum window with a total order (decimal-exact so the
    incremental accumulation matches the oracle bit-for-bit)."""
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 10)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return l.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(_d2("l_extendedprice")).over(w).cast("double").alias("running_revenue"),
    )


@register(
    "q_window_lag_lead",
    oracle="""
SELECT user_id, event_id,
       epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
         AS micros_since_prev
FROM events
WHERE user_id <= 20
""",
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG over event time — the building block for sessionization.
    Deltas stay in integer microseconds (exact on both engines)."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") <= 20)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    return e.select(
        "user_id",
        "event_id",
        (F.unix_micros("ts") - F.unix_micros(prev)).alias("micros_since_prev"),
    )


# --------------------------------------------------------------------------
# Scalar expression / function coverage
# --------------------------------------------------------------------------


@register(
    "q_case_scalar",
    oracle="""
SELECT CASE WHEN o_totalprice > 250000 THEN 'big'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'small' END AS bucket,
       COUNT(*) AS n,
       COUNT(NULLIF(o_orderstatus = 'F', TRUE)) AS n_not_finished,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY 1
""",
)
def q_case_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/WHEN buckets + the reference's count(nullif(cond, true))
    count-where idiom (test/sqlpp_sqlite/main.ml project_stats)."""
    o = table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") > 250000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("bucket")
    )
    return o.groupBy(bucket).agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.nullif(F.col("o_orderstatus") == "F", F.lit(True))).alias(
            "n_not_finished"
        ),
        F.sum(_d2("o_totalprice")).cast("double").alias("total"),
    )


@register(
    "q_string_funcs",
    oracle="""
SELECT UPPER(p_brand) AS brand_uc,
       SUBSTRING(p_type, 1, 6) AS type_prefix,
       COUNT(*) AS n,
       CAST(SUM(CAST(LENGTH(p_name) AS BIGINT)) AS BIGINT) AS name_chars,
       MIN(p_name || '#' || p_brand) AS first_tag
FROM part
GROUP BY 1, 2
""",
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar library (beyond-reference: SURVEY §2.7 notes the
    reference has no string functions beyond toString)."""
    p = table(spark, sf_dir, "part")
    return (
        p.groupBy(
            F.upper("p_brand").alias("brand_uc"),
            F.substring("p_type", 1, 6).alias("type_prefix"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("p_name").cast("bigint")).alias("name_chars"),
            F.min(F.concat_ws("#", "p_name", "p_brand")).alias("first_tag"),
        )
    )


@register(
    "q_date_funcs",
    oracle="""
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS order_year,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS order_month,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY 1, 2
""",
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date part extraction (reference date()/datetime() validate-and-
    construct, analyze.ml:601-620; extraction is beyond-reference)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_d2("o_totalprice")).cast("double").alias("total"),
        )
    )


@register(
    "q_coalesce_nullif",
    oracle="""
SELECT c_custkey,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS segment,
       CAST(c_custkey AS VARCHAR) AS custkey_str
FROM customer
WHERE c_custkey <= 100
""",
)
def q_coalesce_nullif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nullif/coalesce/toString — the reference's scalar builtins
    (analyze.ml:573-600)."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "segment"
        ),
        F.col("c_custkey").cast("string").alias("custkey_str"),
    )


# --------------------------------------------------------------------------
# Events (batch window aggregation / sessionization)
# --------------------------------------------------------------------------


@register(
    "q_events_tumbling",
    headline=True,
    oracle="""
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
)
def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling time-window aggregation in batch form (streaming twin in
    sqlpp_spark.streaming uses the same grouping via F.window)."""
    e = table(spark, sf_dir, "events")
    return e.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(DEC2)).cast("double").alias("total_value"),
    )


@register(
    "q_events_sessionize",
    oracle="""
WITH gaps AS (
  SELECT user_id, event_id, ts,
         CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE OR
                   LAG(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM gaps
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       CAST(MIN(ts) AS TIMESTAMP) AS session_start,
       CAST(MAX(ts) AS TIMESTAMP) AS session_end
FROM sessions
GROUP BY user_id, session_id
""",
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: lag-gap detection + cumulative session ids.
    Single shuffle on user_id serves both windows and the final group."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    new_session = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    return (
        e.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(wsum).cast("bigint"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )
