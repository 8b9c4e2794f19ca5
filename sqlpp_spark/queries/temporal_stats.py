"""Temporal-join and statistical-aggregate registry entries.

As-of join and bounded range join (ops/temporal.py) run over the
events table; the DuckDB oracles express the same semantics as
correlated subqueries (fine at oracle SF; the Spark side is the scale
formulation — see ops/temporal.py docstring).

Statistical moments are computed from exact decimal sums with the
identical double-arithmetic formula on both engines, so results are
bit-equal regardless of partitioning (a direct stddev()/corr() call
would be order-dependent in floating point and engine-specific).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlpp_spark.ops.temporal import asof_join, range_count
from sqlpp_spark.queries import register, table

# ---------------------------------------------------------------------------
# As-of join: each purchase sees the latest click by the same user
# ---------------------------------------------------------------------------


@register(
    "asof_last_click",
    oracle="""
SELECT p.event_id, p.user_id, p.ts,
       (SELECT MAX(c.ts) FROM events c
        WHERE c.user_id = p.user_id AND c.event_type = 'click'
          AND c.ts <= p.ts) AS asof_ts,
       (SELECT c.value FROM events c
        WHERE c.user_id = p.user_id AND c.event_type = 'click'
          AND c.ts <= p.ts
        ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS asof_value
FROM events p
WHERE p.event_type = 'purchase'
""",
)
def asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward-inclusive as-of join, union+window formulation (one
    shuffle on user_id, no range explosion)."""
    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value", "event_id"
    )
    return asof_join(
        purchases, clicks, on=["user_id"], payload=["ts", "value"],
        right_order="event_id",
    )


# ---------------------------------------------------------------------------
# Bounded range join: clicks in the hour before each purchase
# ---------------------------------------------------------------------------


@register(
    "range_click_count",
    oracle="""
SELECT p.event_id, p.user_id, p.ts,
       CAST((SELECT COUNT(*) FROM events c
        WHERE c.user_id = p.user_id AND c.event_type = 'click'
          AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts) AS BIGINT)
       AS n_clicks
FROM events p
WHERE p.event_type = 'purchase'
""",
)
def range_click_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed range join: equi-join on (user, hour-bucket) with a
    residual range filter — 2× left expansion instead of a per-user
    cross product."""
    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    return range_count(
        purchases, clicks, on=["user_id"], window_seconds=3600,
        count_col="n_clicks",
    )


# ---------------------------------------------------------------------------
# Statistical moments from exact decimal sums
# ---------------------------------------------------------------------------

_QD = "CAST(l_quantity AS DECIMAL(9,2))"
_PD = "CAST(l_extendedprice AS DECIMAL(12,2))"


@register(
    "q_stat_moments",
    oracle=f"""
SELECT l_returnflag,
       n,
       s_q / nd AS mean_qty,
       (nd * s_qq - s_q * s_q) / (nd * (nd - 1.0)) AS var_qty,
       sqrt((nd * s_qq - s_q * s_q) / (nd * (nd - 1.0))) AS stddev_qty,
       ROUND((nd * s_qp - s_q * s_p)
         / sqrt((nd * s_qq - s_q * s_q) * (nd * s_pp - s_p * s_p)), 12) AS corr_qty_price
FROM (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) AS DOUBLE) AS nd,
         CAST(SUM({_QD}) AS DOUBLE) AS s_q,
         CAST(SUM({_PD}) AS DOUBLE) AS s_p,
         CAST(SUM({_QD} * {_QD}) AS DOUBLE) AS s_qq,
         CAST(SUM({_PD} * {_PD}) AS DOUBLE) AS s_pp,
         CAST(SUM({_QD} * {_PD}) AS DOUBLE) AS s_qp
  FROM lineitem GROUP BY l_returnflag
) sums
ORDER BY l_returnflag
""",
)
def q_stat_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance / stddev / Pearson correlation per return flag.
    All five sufficient statistics come out of ONE partial-aggregable
    shuffle as exact decimals; the moments are then identical double
    expressions on both engines. corr is ROUND(·,12): its s_pp/s_qp
    inputs exceed 2^53 unscaled, so the decimal→double conversion
    itself is 1-ulp engine-dependent (the other moments only consume
    sub-2^53 sums and stay bit-exact unrounded)."""
    l = table(spark, sf_dir, "lineitem")
    qd = F.col("l_quantity").cast("decimal(9,2)")
    pd_ = F.col("l_extendedprice").cast("decimal(12,2)")
    sums = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.lit(1)).cast("double").alias("nd"),
        F.sum(qd).cast("double").alias("s_q"),
        F.sum(pd_).cast("double").alias("s_p"),
        F.sum(qd * qd).cast("double").alias("s_qq"),
        F.sum(pd_ * pd_).cast("double").alias("s_pp"),
        F.sum(qd * pd_).cast("double").alias("s_qp"),
    )
    nd, s_q, s_p = F.col("nd"), F.col("s_q"), F.col("s_p")
    s_qq, s_pp, s_qp = F.col("s_qq"), F.col("s_pp"), F.col("s_qp")
    var_q = (nd * s_qq - s_q * s_q) / (nd * (nd - F.lit(1.0)))
    return (
        sums.select(
            "l_returnflag",
            "n",
            (s_q / nd).alias("mean_qty"),
            var_q.alias("var_qty"),
            F.sqrt(var_q).alias("stddev_qty"),
            F.round(
                (nd * s_qp - s_q * s_p)
                / F.sqrt((nd * s_qq - s_q * s_q) * (nd * s_pp - s_p * s_p)),
                12,
            ).alias("corr_qty_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_quantity_percentiles",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS p25,
       quantile_cont(l_quantity, 0.50) AS p50,
       quantile_cont(l_quantity, 0.75) AS p75
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def q_quantity_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles via the histogram quantile
    (``ops/stats.py quantile_cont_hist``): l_quantity has ~50 distinct
    values, so the histogram collapses map-side and the quantile is
    exact with no per-group row sort — the form that survives 100 TB
    where ``F.percentile``'s single sort buffer would not."""
    from sqlpp_spark.ops.stats import quantile_cont_hist

    l = table(spark, sf_dir, "lineitem")
    return quantile_cont_hist(
        l,
        ["l_returnflag"],
        "l_quantity",
        [0.25, 0.50, 0.75],
        ["p25", "p50", "p75"],
    ).orderBy("l_returnflag")


@register(
    "q_value_histogram",
    # DuckDB has no width_bucket — the CASE below is its exact
    # definition for (min=0, max=100, n=20): bucket width is 5.0
    # exactly, so floor(v/5.0)+1 is bit-identical to Spark's
    # floor((v-min)/((max-min)/n))+1
    oracle="""
SELECT CASE WHEN value < 0.0 THEN 0
            WHEN value >= 100.0 THEN 21
            ELSE CAST(floor(value / 5.0) AS BIGINT) + 1 END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY 1 ORDER BY 1
""",
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via width_bucket — single shuffle on the
    bucket id."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.width_bucket("value", F.lit(0.0), F.lit(100.0), F.lit(20))
            .cast("bigint")
            .alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Semi-structured (JSON) column extraction
# ---------------------------------------------------------------------------


@register(
    "events_json_extract",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS min_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS max_k
FROM events
GROUP BY event_type
""",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column path: promote a JSON attribute
    (``props.k``) to a typed column in the SCAN stage via
    ``get_json_object`` (JVM-side Jackson parse, no Python), then
    aggregate. At 100 TB the promotion runs once per row in
    whole-stage codegen and only the typed 8-byte value shuffles —
    never the JSON text. For a stable schema, land the promoted column
    to parquet at ingest (sources/files.convert_to_parquet) so later
    queries skip the parse entirely."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "events_json_schema_promote",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_parsed,
       CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_k
FROM (
  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events
)
""",
)
def events_json_schema_promote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with an explicit schema (the declared-schema stance,
    SURVEY §1.3, applied to semi-structured data): malformed documents
    become NULL fields instead of runtime errors — count them so data
    quality is observable."""
    e = table(spark, sf_dir, "events")
    parsed = e.select(
        F.from_json("props", "k bigint").alias("p")
    ).select(F.col("p.k").alias("k"))
    return parsed.agg(
        F.count(F.lit(1)).alias("n_parsed"),
        F.sum(F.col("k").isNull().cast("bigint")).alias("n_null_k"),
    )


# ---------------------------------------------------------------------------
# Z-order layout key
# ---------------------------------------------------------------------------

_Z_BITS = 12


def _zorder_oracle() -> str:
    from sqlpp_spark.ops.partitioning import zorder_key_sql

    z = zorder_key_sql(
        "CAST(user_id AS DOUBLE)", "value", 0.0, 1000.0, 0.0, 100.0,
        bits=_Z_BITS,
    )
    return f"""
SELECT event_id, {z} AS zkey FROM events
"""


@register("events_zorder_key", oracle=_zorder_oracle())
def events_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) layout key over (user_id, value) — the
    file-skipping layout lever: range-partitioning + sorting a write by
    this key gives every file a tight bounding box in BOTH columns, so
    min/max stats prune files for predicates on either. Pure
    shift/mask codegen, bounds as plan literals; bit-for-bit oracled."""
    from sqlpp_spark.ops.partitioning import zorder_key

    e = table(spark, sf_dir, "events")
    z = zorder_key(
        F.col("user_id"), F.col("value"), 0.0, 1000.0, 0.0, 100.0,
        bits=_Z_BITS,
    )
    return e.select("event_id", z.alias("zkey"))


# ---------------------------------------------------------------------------
# Hypertable-style gap-filled rollups + continuous-aggregate cascade
# (ops/temporal.py gapfill / rollup_cascade)
# ---------------------------------------------------------------------------

_GF_BUCKET = 3600  # hourly
_GF_US = _GF_BUCKET * 1_000_000


def _gapfill_oracle(method: str) -> str:
    fill = {
        "locf": "last_value(vd IGNORE NULLS) OVER wb",
        "interpolate": (
            "CASE WHEN v IS NOT NULL THEN vd ELSE"
            " last_value(vd IGNORE NULLS) OVER wb"
            " + (first_value(vd IGNORE NULLS) OVER wf"
            "    - last_value(vd IGNORE NULLS) OVER wb)"
            " * ((pos - last_value(CASE WHEN v IS NOT NULL THEN pos END"
            "       IGNORE NULLS) OVER wb)"
            "    / (first_value(CASE WHEN v IS NOT NULL THEN pos END"
            "       IGNORE NULLS) OVER wf"
            "       - last_value(CASE WHEN v IS NOT NULL THEN pos END"
            "       IGNORE NULLS) OVER wb)) END"
        ),
    }[method]
    return f"""
WITH b AS (
  SELECT user_id, epoch_us(ts) // {_GF_US} AS pos,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(value AS DECIMAL(18,2))) AS v
  FROM events GROUP BY 1, 2
),
ext AS (SELECT user_id, MIN(pos) AS mn, MAX(pos) AS mx FROM b GROUP BY 1),
grid AS (
  SELECT user_id, CAST(u.x AS BIGINT) AS pos
  FROM ext, unnest(generate_series(mn, mx)) u(x)
),
j AS (
  SELECT g.user_id, g.pos, b.n, b.v, CAST(b.v AS DOUBLE) AS vd
  FROM grid g LEFT JOIN b USING (user_id, pos)
)
SELECT user_id,
       CAST(to_timestamp(pos * {_GF_BUCKET}) AS TIMESTAMP) AS bucket_ts,
       pos, COALESCE(n, 0) AS n_events,
       {fill} AS bucket_value
FROM j
WINDOW wb AS (PARTITION BY user_id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       wf AS (PARTITION BY user_id ORDER BY pos
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
"""


@register("events_gapfill_locf", oracle=_gapfill_oracle("locf"))
def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimescaleDB time_bucket_gapfill + locf semantics: per-user
    hourly value sums on a DENSE bucket grid, empty buckets carrying
    the last observed sum forward. Grid size is span/bucket × users —
    independent of event count; see ops/temporal.py gapfill."""
    from sqlpp_spark.ops.temporal import gapfill

    return gapfill(
        table(spark, sf_dir, "events"),
        group_cols=["user_id"],
        bucket_seconds=_GF_BUCKET,
        method="locf",
    )


@register("events_gapfill_interpolate", oracle=_gapfill_oracle("interpolate"))
def events_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill with linear interpolation across interior gaps
    (leading/trailing gaps stay NULL — timescale interpolate
    semantics). Interpolation arithmetic is double-from-exact-decimal
    with integer bucket distances: bit-stable in both engines."""
    from sqlpp_spark.ops.temporal import gapfill

    return gapfill(
        table(spark, sf_dir, "events"),
        group_cols=["user_id"],
        bucket_seconds=_GF_BUCKET,
        method="interpolate",
    )


@register(
    "events_rollup_cascade",
    headline=True,
    oracle="""
SELECT event_type,
       CAST(to_timestamp((epoch_us(ts) // 86400000000) * 86400) AS TIMESTAMP)
         AS bucket_ts,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
         AS avg_value
FROM events
GROUP BY 1, 2
""",
)
def events_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate cascade: 15-min → hourly → daily rollups,
    each level RE-AGGREGATED from the previous (raw rows touched once).
    The oracle aggregates raw straight to daily — hash-equality proves
    the re-aggregation identity the materialized-rollup design relies
    on. See ops/temporal.py rollup_cascade for the 100 TB argument."""
    from sqlpp_spark.ops.temporal import rollup_cascade

    return rollup_cascade(
        table(spark, sf_dir, "events"),
        group_cols=["event_type"],
        levels=(900, 3600, 86400),
    )


# ---------------------------------------------------------------------------
# Product-analytics operators: ordered funnel, cohort retention
# ---------------------------------------------------------------------------

_FUN_W1, _FUN_W2 = 7200, 43200  # click within 2 h of first view; buy within 12 h


@register(
    "events_funnel_steps",
    headline=True,
    oracle=f"""
WITH u1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1
),
u2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN u1 USING (user_id)
  WHERE event_type = 'click' AND e.ts >= t1
    AND e.ts < t1 + INTERVAL {_FUN_W1} SECOND
  GROUP BY 1
),
u3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN u2 USING (user_id)
  WHERE event_type = 'purchase' AND e.ts >= t2
    AND e.ts < t2 + INTERVAL {_FUN_W2} SECOND
  GROUP BY 1
)
SELECT u1.user_id, t1, t2, t3
FROM u1 LEFT JOIN u2 USING (user_id) LEFT JOIN u3 USING (user_id)
""",
)
def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click-within-2h → purchase-within-12h):
    per-user earliest completion time of each step, NULLs past the
    drop-off point. Stepwise per-user aggregates, every shuffle on the
    same user key — see ops/temporal.py funnel."""
    from sqlpp_spark.ops.temporal import funnel

    return funnel(
        table(spark, sf_dir, "events"),
        steps=[("view", None), ("click", _FUN_W1), ("purchase", _FUN_W2)],
    )


_COHORT_WEEK = 604800
_COHORT_US = _COHORT_WEEK * 1_000_000


@register(
    "events_cohort_retention",
    oracle=f"""
WITH f AS (
  SELECT user_id, MIN(epoch_us(ts) // {_COHORT_US}) AS cohort
  FROM events GROUP BY 1
),
a AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_COHORT_US} AS w FROM events
),
j AS (SELECT a.user_id, f.cohort, a.w FROM a JOIN f USING (user_id)),
ret AS (
  SELECT cohort, w - cohort AS week_offset,
         COUNT(DISTINCT user_id) AS n_users
  FROM j GROUP BY 1, 2
),
sz AS (
  SELECT cohort, COUNT(DISTINCT user_id) AS s FROM j WHERE w = cohort GROUP BY 1
)
SELECT CAST(to_timestamp(cohort * {_COHORT_WEEK}) AS TIMESTAMP) AS cohort_ts,
       week_offset, CAST(n_users AS BIGINT) AS n_users,
       CAST(n_users AS DOUBLE) / s AS retention
FROM ret JOIN sz USING (cohort)
""",
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-event week,
    distinct-active counts per week offset, retention as a share of
    the cohort's week-0 size. See ops/temporal.py cohort_retention."""
    from sqlpp_spark.ops.temporal import cohort_retention

    return cohort_retention(table(spark, sf_dir, "events"))


_ZS_WIN = 9  # current row + 9 preceding


@register(
    "events_rolling_zscore",
    oracle=f"""
WITH w AS (
  SELECT event_id, user_id, ts, value,
         SUM(CAST(value AS DECIMAL(18,2))) OVER win AS s,
         SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
           OVER win AS ss,
         CAST(COUNT(*) OVER win AS BIGINT) AS n
  FROM events
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN {_ZS_WIN} PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, ts, n,
       round(
         CASE WHEN n > 1 AND
                   CAST(ss AS DOUBLE) / n
                   - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n) > 0
              THEN (value - CAST(s AS DOUBLE) / n)
                   / sqrt(CAST(ss AS DOUBLE) / n
                          - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
              ELSE NULL END, 6) AS zscore
FROM w
""",
)
def events_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly signal: each event scored against the
    mean/std of its user's last {N}+1 events. Sums run over EXACT
    decimals inside the window (order-independent under any
    partitioning); the variance/sqrt/division happen once per row in a
    fixed double expression — identical IEEE sequence in both engines.
    One shuffle on user_id; the window is row-bounded so state per
    partition is O(window)."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-_ZS_WIN, 0)
    )
    vd = F.col("value").cast("decimal(18,2)")
    s = F.sum(vd).over(win).cast("double")
    ss = F.sum(vd * vd).over(win).cast("double")
    n = F.count(F.lit(1)).over(win).cast("bigint")
    mean = s / n
    var = ss / n - mean * mean
    z = F.when(
        (n > 1) & (var > 0), (F.col("value") - mean) / F.sqrt(var)
    ).otherwise(F.lit(None).cast("double"))
    return e.select(
        "event_id", "user_id", "ts", n.alias("n"), F.round(z, 6).alias("zscore")
    )


@register(
    "stats_approx_percentiles",
    # r14: third member of the sketch family (HLL distinct, Misra-
    # Gries heavy hitters, GK quantiles) — tolerance-boolean oracle:
    # the hash covers the EXACT percentiles plus sketch_ok; the
    # engine-specific GK estimate stays out of the hash. l_quantity
    # has ~50 unit-spaced values, so a rank error of n/accuracy
    # (~0.01%) can move the estimate at most one adjacent value:
    # |approx - exact_interpolated| <= 1.0 is the physics bound.
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS p25,
       quantile_cont(l_quantity, 0.50) AS p50,
       quantile_cont(l_quantity, 0.75) AS p75,
       TRUE AS sketch_ok
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
)
def stats_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GK-sketch percentiles (percentile_approx — fixed-size
    partial-aggregable state, the 100 TB quantile path for columns
    with UNBOUNDED distinct values where the exact histogram op
    cannot collapse) validated in-row against the exact histogram
    quantiles: sketch_ok = every approx within 1.0 of exact."""
    from sqlpp_spark.ops.stats import quantile_cont_hist

    l = table(spark, sf_dir, "lineitem")
    exact = quantile_cont_hist(
        l, ["l_returnflag"], "l_quantity",
        [0.25, 0.50, 0.75], ["p25", "p50", "p75"],
    )
    approx = l.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", [0.25, 0.50, 0.75], 10000)
        .alias("__a")
    )
    ok = (
        (F.abs(F.element_at("__a", 1) - F.col("p25")) <= 1.0)
        & (F.abs(F.element_at("__a", 2) - F.col("p50")) <= 1.0)
        & (F.abs(F.element_at("__a", 3) - F.col("p75")) <= 1.0)
    )
    return (
        exact.join(approx, on="l_returnflag")
        .select("l_returnflag", "p25", "p50", "p75", ok.alias("sketch_ok"))
        .orderBy("l_returnflag")
    )
