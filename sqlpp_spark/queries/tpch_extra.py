"""TPC-H-adapted query suite, part 2 — the remaining TPC-H query
shapes over the driver's trimmed star schema (no partsupp, no
commit/receipt dates, no shipmode/phone; Q4/Q12/Q21/Q22 are adapted
to the columns that exist, and Q2/Q11/Q16/Q20 — the partsupp
queries — derive the supplier×part relation from lineitem shipment
history, preserving each query's subquery shape).

Every query follows the determinism contract of relational.py:
monetary aggregates over exact decimals cast to double at the end,
ratios as double divisions of exact decimal sums (identical IEEE
op sequence in Spark and DuckDB), total-order tiebreaks under LIMIT.

Scale notes (100 TB):
- nation/region are broadcast explicitly (constant-size dims);
  supplier/part/customer joins are left to AQE, which will pick
  broadcast at small SF and shuffle-hash at large
- every aggregation is partial-aggregable (sum/count of decimals) —
  the shuffle moves per-group partials, not rows
- EXISTS/NOT EXISTS compile to left-semi/left-anti joins on the join
  key — no row duplication, no correlated per-row subquery
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlpp_spark.queries import register, table
from sqlpp_spark.queries.relational import (
    DEC2, DEC4, SQL_DISC_PRICE, _d2, _d4, _disc_price,
)


def _n(spark, sf_dir):
    return F.broadcast(table(spark, sf_dir, "nation"))


# ---------------------------------------------------------------------------
# Q4 (adapted): order-priority checking. TPC-H counts orders with a
# late lineitem (commitdate < receiptdate); without those columns we
# count orders with any lineitem shipped after the order date.
# ---------------------------------------------------------------------------


@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS → left-semi join on the join key + theta condition; the
    quarter filter prunes orders before the join."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    o = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    sem = o.join(
        l,
        on=[o.o_orderkey == l.l_orderkey, l.l_shipdate > o.o_orderdate],
        how="left_semi",
    )
    return (
        sem.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q7: volume shipping between two nations (supplier nation ↔ customer
# nation, both directions), revenue per year.
# ---------------------------------------------------------------------------

_N1, _N2 = "NATION_1", "NATION_2"


@register(
    "q7_nation_trade",
    oracle=f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
         {SQL_DISC_PRICE} AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = '{_N1}' AND n2.n_name = '{_N2}')
     OR (n1.n_name = '{_N2}' AND n2.n_name = '{_N1}')
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-way join; the two-nation disjunction is applied AFTER the
    broadcast nation joins so Catalyst pushes each side's IN-filter
    into the semi-joined dimension."""
    s = table(spark, sf_dir, "supplier")
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n1 = _n(spark, sf_dir).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _n(spark, sf_dir).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        s.join(l, s.s_suppkey == l.l_suppkey)
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == _N1) & (F.col("cust_nation") == _N2))
            | ((F.col("supp_nation") == _N2) & (F.col("cust_nation") == _N1))
        )
    )
    return (
        j.select(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
            _disc_price().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("volume").cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8: market share of one supplier nation within one customer region
# for one part type, by order year.
# ---------------------------------------------------------------------------

_Q8_NATION, _Q8_REGION, _Q8_TYPE = "NATION_7", "ASIA", "ECONOMY"


@register(
    "q8_market_share",
    oracle=f"""
SELECT o_year,
       CAST(SUM(CASE WHEN nation = '{_Q8_NATION}' THEN volume
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
       / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         {SQL_DISC_PRICE} AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = '{_Q8_REGION}' AND p_type = '{_Q8_TYPE}'
) all_nations
GROUP BY o_year
ORDER BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-sum ratio per year; both sums are exact decimals, so
    the double division is order-independent."""
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == _Q8_TYPE)
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n1 = _n(spark, sf_dir).select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    r = F.broadcast(table(spark, sf_dir, "region")).filter(F.col("r_name") == _Q8_REGION)
    n2 = _n(spark, sf_dir).select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    j = (
        p.join(l, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("c_nationkey") == F.col("cn_key"))
        .join(r, F.col("cn_region") == F.col("r_regionkey"))
        .join(n2, F.col("s_nationkey") == F.col("sn_key"))
    )
    vol = _disc_price()
    zero = F.lit(0).cast(DEC2)
    base = j.select(
        F.year("o_orderdate").cast("bigint").alias("o_year"),
        vol.alias("volume"),
        F.col("nation"),
    )
    return (
        base.groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("nation") == _Q8_NATION, F.col("volume")).otherwise(zero)).cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9 (adapted): profit by supplier nation and order year. Without
# ps_supplycost, profit = discounted revenue.
# ---------------------------------------------------------------------------


@register(
    "q9_profit_by_nation",
    oracle=f"""
SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         {SQL_DISC_PRICE} AS amount
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN nation ON s_nationkey = n_nationkey
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
)
def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    n = _n(spark, sf_dir)
    j = (
        s.join(l, s.s_suppkey == l.l_suppkey)
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            _disc_price().alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# Q12 (adapted): priority classification. TPC-H buckets by shipmode;
# we bucket 1997 shipments by return flag, counting urgent vs other
# order priorities.
# ---------------------------------------------------------------------------


@register(
    "q12_priority_class",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Q13: customer order-count distribution (two-level aggregation over a
# left join — customers with zero orders count in the c_count=0 bucket).
# ---------------------------------------------------------------------------


@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# Q14: promotion revenue share for one month.
# ---------------------------------------------------------------------------


@register(
    "q14_promo_revenue",
    oracle=f"""
SELECT 100.00 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {SQL_DISC_PRICE}
                              ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
       / CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    vol = _disc_price()
    zero = F.lit(0).cast(DEC2)
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.00)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(zero)).cast("double")
                / F.sum(vol).cast("double")
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q15: top supplier(s) by quarterly revenue — scalar-max equality join.
# ---------------------------------------------------------------------------


@register(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS tr
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(tr AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE tr = (SELECT MAX(tr) FROM revenue)
ORDER BY s_suppkey
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The max is compared on the exact DECIMAL revenue (bit-stable in
    both engines); only the output casts to double."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price()).alias("tr")
    )
    mx = rev.agg(F.max("tr").alias("mx"))
    s = table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.tr == mx.mx)
        .join(s, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", F.col("tr").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q17: small-quantity-order revenue — per-part average threshold.
# ---------------------------------------------------------------------------

_Q17_BRAND = "Brand#13"


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
WITH part_avg AS (
  SELECT l_partkey AS pk,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_q
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN part_avg ON pk = l_partkey
WHERE p_brand = '{_Q17_BRAND}' AND l_quantity < 0.2 * avg_q
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated avg-per-part subquery becomes a groupBy + equi
    join; the threshold avg is an exact-decimal sum divided in double
    (same op order both engines)."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == _Q17_BRAND)
    pa = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum(_d2("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_q")
    )
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(pa, F.col("pk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_q"))
        .agg(
            (F.sum(_d2("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# Q18: large-volume customers (HAVING-filtered subaggregate join).
# ---------------------------------------------------------------------------


@register(
    "q18_large_volume_customers",
    oracle="""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(sum_qty AS DOUBLE) AS sum_qty
FROM (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300
) big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(_d2("l_quantity")).alias("sum_qty_dec"))
        .filter(F.col("sum_qty_dec") > 300)
    )
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19: bracketed discount revenue (OR of brand/size/quantity brackets —
# the whole disjunction pushes into the scan).
# ---------------------------------------------------------------------------


@register(
    "q19_bracketed_revenue",
    oracle=f"""
SELECT CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 15 AND 35)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 25 AND 50)
""",
)
def q19_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")

    def bracket(brand, s_lo, s_hi, q_lo, q_hi):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s_lo, s_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )

    cond = (
        bracket("Brand#1", 1, 15, 1, 21)
        | bracket("Brand#2", 10, 30, 15, 35)
        | bracket("Brand#3", 20, 50, 25, 50)
    )
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q22 (adapted): rich customers gone idle — balance above the positive
# average, no orders since 2000, grouped by nation.
# ---------------------------------------------------------------------------


@register(
    "q22_idle_rich_customers",
    oracle="""
SELECT n_name AS nation, CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
    FROM customer WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
  )
GROUP BY n_name
ORDER BY n_name
""",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-aggregate threshold (broadcast one-row join) + NOT EXISTS
    (left-anti join against the date-filtered orders)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    n = _n(spark, sf_dir)
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_d2("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    rich = (
        c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
    )
    return (
        rich.join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_d2("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# Q21 (adapted): suppliers who kept orders waiting. TPC-H marks a
# lineitem late when l_receiptdate > l_commitdate; without those
# columns a lineitem is late when it ships more than 30 days after the
# order date. The reference shape (EXISTS another supplier in the same
# order, NOT EXISTS another LATE supplier) is what the oracle runs;
# the Spark plan uses the equivalent per-order aggregate rewrite.
# ---------------------------------------------------------------------------

_Q21_NATION = "NATION_3"
_Q21_LATE_DAYS = 30


@register(
    "q21_waiting_suppliers",
    oracle=f"""
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND n_name = '{_Q21_NATION}'
  AND l1.l_shipdate > o_orderdate + INTERVAL {_Q21_LATE_DAYS} DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL {_Q21_LATE_DAYS} DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference q21 correlates lineitem against itself twice (EXISTS /
    NOT EXISTS with a supplier inequality) — at 100 TB that is two extra
    shuffles of the fact table. The equivalent per-order aggregate
    rewrite computes, in ONE pass over the order's lineitems,

      n_supp      = COUNT(DISTINCT l_suppkey)
      n_late_supp = COUNT(DISTINCT l_suppkey) FILTER (WHERE late)

    and a late row qualifies iff n_supp >= 2 (some other supplier
    exists) and n_late_supp = 1 (the only late supplier is this row's
    own — it is late, so it is IN the set; cardinality 1 means no
    OTHER late supplier). One orderkey shuffle replaces both
    correlated self-joins; the DuckDB oracle runs the literal
    EXISTS/NOT EXISTS form, so the gate proves the rewrite.
    """
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    li = l.join(o, l.l_orderkey == o.o_orderkey).withColumn(
        "is_late",
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {_Q21_LATE_DAYS} DAYS"),
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    waiting = (
        li.filter(F.col("is_late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    s = table(spark, sf_dir, "supplier")
    n = _n(spark, sf_dir).filter(F.col("n_name") == _Q21_NATION)
    return (
        waiting.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q2/Q11/Q16/Q20 (adapted): the four queries TPC-H writes against
# partsupp. The trimmed schema has no partsupp table, but lineitem
# carries (l_partkey, l_suppkey), so the supplier×part relation is
# derived from shipment history: unit cost = min(extendedprice /
# quantity) a supplier ever charged for a part, and "stock value" =
# discounted revenue actually shipped. Shapes (correlated min, scalar
# threshold against a global aggregate, NOT IN, nested grouped IN)
# are preserved exactly.
# ---------------------------------------------------------------------------

_Q2_TYPE = "STANDARD"
_Q2_MAX_SIZE = 15
_Q2_REGION = "EUROPE"


@register(
    "q2_min_cost_supplier",
    oracle=f"""
WITH sp AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = '{_Q2_REGION}'
),
offer AS (
  SELECT sp.pk, sp.sk, sp.unit_cost, eu.s_name, eu.s_acctbal, eu.n_name
  FROM sp JOIN eu ON s_suppkey = sp.sk
),
best AS (SELECT pk, MIN(unit_cost) AS min_cost FROM offer GROUP BY pk)
SELECT o.s_acctbal, o.s_name, o.n_name,
       p_partkey, p_name, o.unit_cost
FROM offer o
JOIN best b ON b.pk = o.pk AND o.unit_cost = b.min_cost
JOIN part ON p_partkey = o.pk
WHERE p_type = '{_Q2_TYPE}' AND p_size <= {_Q2_MAX_SIZE}
ORDER BY o.s_acctbal DESC, o.n_name, o.s_name, p_partkey
LIMIT 100
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 adapted (reference test coverage: the correlated-min
    scalar subquery shape). The correlated ``MIN(unit_cost) WHERE
    pk = outer.pk`` decorrelates into a per-part window min + equality
    filter (ties kept, same as Q2) — ONE lineitem scan instead of the
    self-join form's two, and the window exchange on pk feeds the part
    join directly; unit_cost is a double division with identical IEEE
    sequence in both engines, and min() is order-independent so the
    equality key is bit-stable."""
    from pyspark.sql import Window

    l = table(spark, sf_dir, "lineitem")
    sp = l.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    s = table(spark, sf_dir, "supplier")
    n = _n(spark, sf_dir)
    r = F.broadcast(table(spark, sf_dir, "region")).filter(
        F.col("r_name") == _Q2_REGION
    )
    eu = (
        s.join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(r, F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offer = sp.join(eu, F.col("s_suppkey") == F.col("sk"))
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_type") == _Q2_TYPE) & (F.col("p_size") <= _Q2_MAX_SIZE)
    )
    return (
        offer.withColumn(
            "min_cost", F.min("unit_cost").over(Window.partitionBy("pk"))
        )
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .join(p, F.col("p_partkey") == F.col("pk"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


_Q11_NATION = "NATION_3"
_Q11_MULT = 1.5


@register(
    "q11_important_parts",
    oracle=f"""
WITH val AS (
  SELECT l_partkey, SUM({SQL_DISC_PRICE}) AS v
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = '{_Q11_NATION}'
  GROUP BY l_partkey
),
tot AS (SELECT SUM(v) AS t, COUNT(*) AS c FROM val)
SELECT l_partkey, CAST(v AS DOUBLE) AS part_value
FROM val, tot
WHERE CAST(v AS DOUBLE) > CAST(t AS DOUBLE) / c * {_Q11_MULT}
ORDER BY part_value DESC, l_partkey
""",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 adapted (scalar subquery against a global aggregate):
    parts whose shipped value from one nation's suppliers exceeds a
    multiple of that nation's mean per-part value (scale-free — a
    fixed fraction of the total degenerates as part count grows with
    SF). The global aggregate is a 1-row frame broadcast into the
    filter (no driver collect); per-part values are exact decimal
    partial aggs, compared in double with the identical
    cast-then-divide sequence in both engines."""
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = _n(spark, sf_dir).filter(F.col("n_name") == _Q11_NATION)
    val = (
        l.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_disc_price()).alias("v"))
    )
    tot = val.agg(F.sum("v").alias("t"), F.count(F.lit(1)).alias("c"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(
            F.col("v").cast("double")
            > F.col("t").cast("double") / F.col("c") * F.lit(_Q11_MULT)
        )
        .select("l_partkey", F.col("v").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), "l_partkey")
    )


_Q16_EXCL_BRAND = "Brand#9"
_Q16_EXCL_TYPE = "PROMO"
_Q16_SIZES = (1, 5, 9, 14, 19, 23, 36, 45)


@register(
    "q16_supplier_part_counts",
    oracle=f"""
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> '{_Q16_EXCL_BRAND}'
  AND p_type <> '{_Q16_EXCL_TYPE}'
  AND p_size IN {_Q16_SIZES}
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adapted (NOT IN + COUNT DISTINCT): distinct suppliers
    able to supply each (brand, type, size), excluding suppliers with
    a negative balance. NOT IN over a never-null key compiles to a
    left-anti join (broadcast: the exclusion list is a filtered dim);
    COUNT(DISTINCT) is the only full shuffle and is keyed on the
    3-column group — partial dedup happens map-side."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != _Q16_EXCL_BRAND)
        & (F.col("p_type") != _Q16_EXCL_TYPE)
        & (F.col("p_size").isin(*_Q16_SIZES))
    )
    bad = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        l.join(F.broadcast(bad), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


_Q20_NAME_PREFIX = "red"
_Q20_REGION = "ASIA"
_Q20_QTY = 50


@register(
    "q20_excess_suppliers",
    oracle=f"""
SELECT s_name, s_acctbal, n_name
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
JOIN region ON r_regionkey = n_regionkey
WHERE r_name = '{_Q20_REGION}'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE '{_Q20_NAME_PREFIX}%'
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_suppkey, l_partkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > {_Q20_QTY}
  )
ORDER BY s_name
""",
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adapted (IN over a grouped-HAVING subquery): suppliers
    in a region who shipped more than a threshold quantity of any
    '{prefix}%' part in 1997. The IN compiles to a left-semi join on
    s_suppkey; the inner aggregate groups on (supp, part) so its
    shuffle key matches the lineitem access pattern, and the part
    name filter prunes before the join."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith(_Q20_NAME_PREFIX)
    )
    heavy = (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_d2("l_quantity")).alias("q"))
        .filter(F.col("q") > _Q20_QTY)
        .select("l_suppkey")
    )
    s = table(spark, sf_dir, "supplier")
    n = _n(spark, sf_dir)
    r = F.broadcast(table(spark, sf_dir, "region")).filter(
        F.col("r_name") == _Q20_REGION
    )
    return (
        s.join(heavy, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(r, F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_name", "s_acctbal", "n_name")
        .orderBy("s_name")
    )
