"""Theta-correlated LATERAL top-k crossover rehearsal (r19, r18
verdict task 2 done-criterion).

The r19 lowering (compiler/compile.py _join_lateral_theta_topk)
evaluates per DISTINCT probe value and chooses between two
strategies:

  nlj    — distinct probes x sub theta join, one window per probe.
           Worst case D x S comparisons AND up to that many rows
           through the window (heavier than the quantifier nested
           loop, which only aggregates cells).
  banded — width_bucket the theta key; per-bucket top-h window +
           map-side sequence/explode prefix completion + the
           in-bucket residual join (~D*S/NB comparisons). All hash
           equi-joins (plan-pinned in test_plans.py).

This tool sweeps (distinct probes D, sub rows S) through the real
engine path with each strategy FORCED via
spark.sqlpp.lateral.bandedThreshold, asserts both return identical
(count, checksum) results, and records walls — proving the nested
loop never fires above the default 1e8 threshold because the banded
plan is already faster there. NLJ legs whose predicted wall exceeds
the budget are skipped with the prediction recorded (no silent
caps).

Output: LATERAL_TOPK_REHEARSAL.json + a markdown table for
SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

N_OUTER = 1_000_000  # outer rows (distinct probes D <= N_OUTER)
BUDGET_SEC = 240.0
K = 3  # LIMIT per probe

GRID = [
    # (distinct_probes, sub_rows)
    (100, 10_000),
    (10_000, 10_000),
    (10_000, 100_000),
    (100_000, 10_000),
    (100_000, 100_000),
    (1_000_000, 100_000),
]

SRC = (
    "select count(1) as n, cast(sum(x.sid) as int) as chk "
    "from probe_t as o cross join lateral ("
    "select s.sid as sid from sub_t as s where s.v < o.p "
    f"order by s.amt desc, s.sid asc limit {K}) as x group by ()"
)


def get_spark() -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def build_engine(spark, d: int, s: int):
    from sqlpp_spark.engine import SqlppEngine

    eng = SqlppEngine(spark)
    probe = (
        spark.range(N_OUTER)
        .select((F.col("id") % d).alias("p"))
        .persist()
    )
    probe.count()
    sub = (
        spark.range(s)
        .select(
            F.col("id").alias("sid"),
            (F.pmod(F.hash(F.col("id") + 1), F.lit(d))).alias("v"),
            (F.pmod(F.hash(F.col("id") + 2), F.lit(1_000_000))).alias("amt"),
        )
        .persist()
    )
    sub.count()
    eng.register_df("probe_t", probe)
    eng.register_df("sub_t", sub)
    return eng, probe, sub


def main() -> None:
    spark = get_spark()
    results = []
    cps = None  # measured probe-comparisons/sec for the NLJ leg
    for d, s in GRID:
        comparisons = d * s
        point = {"distinct_probes": d, "sub_rows": s,
                 "comparisons": comparisons}
        run_nlj = not (cps is not None and comparisons / cps > BUDGET_SEC)
        if not run_nlj:
            point["nlj_skipped"] = True
            point["nlj_predicted_sec"] = round(comparisons / cps, 1)
        eng, probe, sub = build_engine(spark, d, s)
        strategies = [("banded", "1")]
        if run_nlj:
            strategies.insert(0, ("nlj", "1e30"))
        for strat, thresh in strategies:
            spark.conf.set("spark.sqlpp.lateral.bandedThreshold", thresh)
            t0 = time.monotonic()
            rows = eng.query(SRC).collect()
            wall = time.monotonic() - t0
            point[f"{strat}_sec"] = round(wall, 2)
            point[f"{strat}_n"] = rows[0]["n"] if rows else 0
            point[f"{strat}_chk"] = rows[0]["chk"] if rows else None
        spark.conf.unset("spark.sqlpp.lateral.bandedThreshold")
        if run_nlj:
            assert point["nlj_n"] == point["banded_n"], point
            assert point["nlj_chk"] == point["banded_chk"], point
            if comparisons >= 1e8:
                cps = comparisons / max(point["nlj_sec"], 1e-3)
        probe.unpersist()
        sub.unpersist()
        nlj_txt = (
            f"nlj={point['nlj_sec']:>7.2f}s" if run_nlj
            else f"nlj SKIP (~{point['nlj_predicted_sec']}s)"
        )
        print(f"D={d:>9,} S={s:>9,}  {nlj_txt} | "
              f"banded={point['banded_sec']:>7.2f}s")
        results.append(point)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "LATERAL_TOPK_REHEARSAL.json",
    )
    with open(out, "w") as f:
        json.dump({"n_outer": N_OUTER, "k": K, "budget_sec": BUDGET_SEC,
                   "points": results}, f, indent=2)
    print("wrote", out)
    spark.stop()


if __name__ == "__main__":
    main()
