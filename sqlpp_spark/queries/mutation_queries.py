"""Registry entries for the table-maintenance operators
(ops/mutation.py): SCD2 dimension merge and snapshot diff.

Both run over deterministic derived inputs (an SCD2-shaped dimension
built from ``customer``; a mutated second version of ``documents``) so
the DuckDB oracle replays the exact same merge/diff and the hashes are
bit-comparable at any SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlpp_spark.ops.hashing import hash64_sql
from sqlpp_spark.queries import register, table

_EFF = "2024-06-01 00:00:00"
_T0 = "2020-01-01 00:00:00"


def _dim(spark, sf_dir):
    """SCD2-shaped dimension from customer: everyone current since T0."""
    return table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_acctbal",
        "c_mktsegment",
        F.lit(_T0).cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )


def _updates(spark, sf_dir):
    """Deterministic update batch: custkey%3==0 gets acctbal+100,
    custkey%5==0 gets a new segment (both when %15==0), everyone else
    arrives unchanged (no-op rows exercise change detection); plus one
    brand-new key per 25 existing ones."""
    c = table(spark, sf_dir, "customer")
    upd = c.select(
        "c_custkey",
        "c_name",
        F.when(
            F.col("c_custkey") % 3 == 0, F.col("c_acctbal") + F.lit(100.0)
        )
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
        F.when(F.col("c_custkey") % 5 == 0, F.lit("MACHINERY2"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )
    new = c.filter(F.col("c_custkey") % 25 == 0).select(
        (F.col("c_custkey") + F.lit(1000000)).alias("c_custkey"),
        F.concat(F.lit("NEW_"), F.col("c_name")).alias("c_name"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("STARTUP").alias("c_mktsegment"),
    )
    return upd.unionByName(new)


_SCD2_ORACLE = f"""
WITH dim AS (
  SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
         TIMESTAMP '{_T0}' AS valid_from,
         CAST(NULL AS TIMESTAMP) AS valid_to
  FROM customer
),
upd AS (
  SELECT c_custkey, c_name,
         CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 100.0
              ELSE c_acctbal END AS c_acctbal,
         CASE WHEN c_custkey % 5 = 0 THEN 'MACHINERY2'
              ELSE c_mktsegment END AS c_mktsegment
  FROM customer
  UNION ALL
  SELECT c_custkey + 1000000, 'NEW_' || c_name, 0.0, 'STARTUP'
  FROM customer WHERE c_custkey % 25 = 0
),
j AS (
  SELECT d.*, u.c_custkey AS uk, u.c_name AS un,
         u.c_acctbal AS ua, u.c_mktsegment AS um,
         (d.c_name IS DISTINCT FROM u.c_name
          OR d.c_acctbal IS DISTINCT FROM u.c_acctbal
          OR d.c_mktsegment IS DISTINCT FROM u.c_mktsegment) AS chg
  FROM dim d FULL OUTER JOIN upd u ON d.c_custkey = u.c_custkey
),
kept AS (
  SELECT c_custkey, c_name, c_acctbal, c_mktsegment, valid_from,
         CASE WHEN uk IS NOT NULL AND chg THEN TIMESTAMP '{_EFF}'
              ELSE valid_to END AS valid_to
  FROM j WHERE valid_from IS NOT NULL
),
opened AS (
  SELECT uk AS c_custkey, un AS c_name, ua AS c_acctbal,
         um AS c_mktsegment, TIMESTAMP '{_EFF}' AS valid_from,
         CAST(NULL AS TIMESTAMP) AS valid_to
  FROM j WHERE uk IS NOT NULL AND (valid_from IS NULL OR chg)
)
SELECT * FROM kept UNION ALL SELECT * FROM opened
"""


@register("dim_scd2_merge", oracle=_SCD2_ORACLE)
def dim_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD merge (MERGE INTO dim USING updates): changed keys
    close their current row at the effective timestamp and open a new
    one; new keys open; no-op updates touch nothing; history never
    joins. See ops/mutation.py scd2_merge for the scale argument."""
    from sqlpp_spark.ops.mutation import scd2_merge

    return scd2_merge(
        _dim(spark, sf_dir),
        _updates(spark, sf_dir),
        key_cols=["c_custkey"],
        tracked_cols=["c_name", "c_acctbal", "c_mktsegment"],
        effective_ts=F.lit(_EFF).cast("timestamp"),
    )


_DIFF_ORACLE = f"""
WITH old AS (
  SELECT doc_id, {hash64_sql("concat_ws(chr(31), coalesce(CAST(text AS VARCHAR), chr(30)), coalesce(CAST(lang AS VARCHAR), chr(30)))")} AS old_hash
  FROM documents
),
new AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' [v2]' ELSE text END AS text,
         lang
  FROM documents WHERE doc_id % 13 <> 0
  UNION ALL
  SELECT doc_id + 1000000, 'fresh document ' || CAST(doc_id AS VARCHAR), lang
  FROM documents WHERE doc_id % 17 = 0
),
nh AS (
  SELECT doc_id, {hash64_sql("concat_ws(chr(31), coalesce(CAST(text AS VARCHAR), chr(30)), coalesce(CAST(lang AS VARCHAR), chr(30)))")} AS new_hash
  FROM new
)
SELECT COALESCE(old.doc_id, nh.doc_id) AS doc_id,
       CASE WHEN old_hash IS NULL THEN 'added'
            WHEN new_hash IS NULL THEN 'removed'
            WHEN old_hash = new_hash THEN 'unchanged'
            ELSE 'changed' END AS change,
       old_hash, new_hash
FROM old FULL OUTER JOIN nh ON old.doc_id = nh.doc_id
"""


@register("corpus_snapshot_diff", oracle=_DIFF_ORACLE)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-version diff between the documents table and a mutated
    second version (1/13 removed, 1/7 edited, 1/17 added as new ids):
    per-doc added/removed/changed/unchanged via content hashes — only
    (id, hash) shuffles. See ops/mutation.py snapshot_diff."""
    from sqlpp_spark.ops.mutation import snapshot_diff

    d = table(spark, sf_dir, "documents")
    old = d.select("doc_id", "text", "lang")
    new = (
        d.filter(F.col("doc_id") % 13 != 0)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" [v2]"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
            "lang",
        )
        .unionByName(
            d.filter(F.col("doc_id") % 17 == 0).select(
                (F.col("doc_id") + F.lit(1000000)).alias("doc_id"),
                F.concat(
                    F.lit("fresh document "), F.col("doc_id").cast("string")
                ).alias("text"),
                "lang",
            )
        )
    )
    return snapshot_diff(old, new, key_cols=["doc_id"], content_cols=["text", "lang"])


_PIT_SPLIT = "2024-01-15 00:00:00"


def _versioned_dim(spark, sf_dir):
    """SCD2 dimension with versions straddling the events time range:
    even custkeys have a version change mid-January (balance +500),
    odd custkeys a single open-ended version."""
    c = table(spark, sf_dir, "customer")
    single = c.filter(F.col("c_custkey") % 2 == 1).select(
        "c_custkey", "c_acctbal", "c_mktsegment",
        F.lit(_T0).cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    even = c.filter(F.col("c_custkey") % 2 == 0)
    v1 = even.select(
        "c_custkey", "c_acctbal", "c_mktsegment",
        F.lit(_T0).cast("timestamp").alias("valid_from"),
        F.lit(_PIT_SPLIT).cast("timestamp").alias("valid_to"),
    )
    v2 = even.select(
        "c_custkey",
        (F.col("c_acctbal") + F.lit(500.0)).alias("c_acctbal"),
        "c_mktsegment",
        F.lit(_PIT_SPLIT).cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    return single.unionByName(v1).unionByName(v2)


@register(
    "dim_pointintime_join",
    oracle=f"""
WITH dim AS (
  SELECT c_custkey, c_acctbal, c_mktsegment,
         TIMESTAMP '{_T0}' AS valid_from,
         CAST(NULL AS TIMESTAMP) AS valid_to
  FROM customer WHERE c_custkey % 2 = 1
  UNION ALL
  SELECT c_custkey, c_acctbal, c_mktsegment,
         TIMESTAMP '{_T0}', TIMESTAMP '{_PIT_SPLIT}'
  FROM customer WHERE c_custkey % 2 = 0
  UNION ALL
  SELECT c_custkey, c_acctbal + 500.0, c_mktsegment,
         TIMESTAMP '{_PIT_SPLIT}', CAST(NULL AS TIMESTAMP)
  FROM customer WHERE c_custkey % 2 = 0
)
SELECT e.event_id, e.user_id, e.ts,
       d.c_acctbal AS dim_c_acctbal,
       d.c_mktsegment AS dim_c_mktsegment
FROM events e
LEFT JOIN dim d
  ON d.c_custkey = e.user_id
 AND e.ts >= d.valid_from
 AND (d.valid_to IS NULL OR e.ts < d.valid_to)
""",
)
def dim_pointintime_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension enrichment (label-leakage-safe feature
    join): every event joins the SCD2 customer version valid AT the
    event's timestamp — events before/after the mid-January version
    split of even-keyed customers see different balances. See
    ops/temporal.py pointintime_join."""
    from sqlpp_spark.ops.temporal import pointintime_join

    e = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    d = _versioned_dim(spark, sf_dir).withColumnRenamed("c_custkey", "user_id")
    return pointintime_join(
        e, d, on=["user_id"], payload=["c_acctbal", "c_mktsegment"]
    )
