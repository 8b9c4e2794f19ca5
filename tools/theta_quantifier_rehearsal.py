"""Theta-correlated quantifier cardinality rehearsal (round-16
verdict ask #4).

The r16 theta-quantifier decorrelation (compiler/compile.py, the
``corr and any(op != '=')`` branch of the four-cell marker) reduces
per-row evaluation to per-DISTINCT-probe evaluation, but the probe x
subquery theta join is necessarily a nested loop (non-equi
condition): |distinct probes| x |sub| comparisons worst case. This
tool measures where that wall actually is on local[32] by sweeping
|distinct probes| D and |sub| S through the real engine path:

    select count(1) as n from probe_t as o
    where o.x > any (select s.v from sub_t as s where s.k < o.p)

and (same data) the ALL variant. Each point records wall seconds and
the implied comparisons/sec; points whose predicted wall exceeds the
budget are skipped with the prediction recorded (no silent caps).

Output: THETA_REHEARSAL.json + a markdown table for SCALING.md.
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
BUDGET_SEC = 240.0  # per-point cap; predicted-over-budget points skip

GRID = [
    # (distinct_probes, sub_rows)
    (100, 10_000),
    (100, 100_000),
    (10_000, 10_000),
    (10_000, 100_000),
    (100_000, 10_000),
    (100_000, 100_000),
    (1_000_000, 10_000),
    (1_000_000, 100_000),
]


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
        .select(
            (F.col("id") % d).alias("p"),
            (F.pmod(F.hash(F.col("id")), F.lit(100))).alias("x"),
        )
        .persist()
    )
    probe.count()
    sub = (
        spark.range(s)
        .select(
            (F.pmod(F.hash(F.col("id") + 1), F.lit(d))).alias("k"),
            (F.pmod(F.hash(F.col("id") + 2), F.lit(50))).alias("v"),
        )
        .persist()
    )
    sub.count()
    eng.register_df("probe_t", probe)
    eng.register_df("sub_t", sub)
    return eng, probe, sub


SRC_ANY = (
    "select count(1) as n from probe_t as o "
    "where o.x > any (select s.v from sub_t as s where s.k < o.p) "
    "group by ()"
)
SRC_ALL = (
    "select count(1) as n from probe_t as o "
    "where o.x >= all (select s.v from sub_t as s where s.k < o.p) "
    "group by ()"
)


def main() -> None:
    spark = get_spark()
    results = []
    cps = None  # measured comparisons/sec, updated as points complete
    for d, s in GRID:
        comparisons = d * s
        point = {"distinct_probes": d, "sub_rows": s,
                 "comparisons": comparisons}
        run_nlj = not (cps is not None and comparisons / cps > BUDGET_SEC)
        if not run_nlj:
            point["nlj_skipped"] = True
            point["nlj_predicted_sec"] = round(comparisons / cps, 1)
        eng, probe, sub = build_engine(spark, d, s)
        # two strategies head-to-head on identical data: the nested
        # loop (threshold forced out of reach) vs the r17 banded
        # band-join (default thresholds); NLJ legs whose predicted
        # wall exceeds the budget record the prediction instead
        strategies = [("banded", "1e8")]
        if run_nlj:
            strategies.insert(0, ("nlj", "1e30"))
        for strat, thresh in strategies:
            spark.conf.set(
                "spark.sqlpp.quantifier.bandedThreshold", thresh
            )
            for label, src in (("any", SRC_ANY), ("all", SRC_ALL)):
                t0 = time.monotonic()
                rows = eng.query(src).collect()
                wall = time.monotonic() - t0
                point[f"{strat}_{label}_sec"] = round(wall, 2)
                point[f"{strat}_{label}_rows"] = rows[0]["n"] if rows else 0
        spark.conf.unset("spark.sqlpp.quantifier.bandedThreshold")
        if run_nlj:
            for label in ("any", "all"):
                assert (point[f"nlj_{label}_rows"]
                        == point[f"banded_{label}_rows"]), point
            # update the NLJ throughput estimate from the slower leg
            slow = max(point["nlj_any_sec"], point["nlj_all_sec"])
            if comparisons >= 1e8:  # ignore fixed-cost-dominated pts
                cps = comparisons / max(slow, 1e-3)
        probe.unpersist()
        sub.unpersist()
        nlj_txt = (
            f"nlj any={point['nlj_any_sec']:>7.2f}s "
            f"all={point['nlj_all_sec']:>7.2f}s"
            if run_nlj else
            f"nlj SKIP (~{point['nlj_predicted_sec']}s)"
        )
        print(f"D={d:>9,} S={s:>9,}  {nlj_txt} | banded "
              f"any={point['banded_any_sec']:>7.2f}s "
              f"all={point['banded_all_sec']:>7.2f}s")
        results.append(point)
    out = {
        "n_outer_rows": N_OUTER,
        "budget_sec": BUDGET_SEC,
        "grid": results,
        "note": (
            "theta probe x sub join is a nested loop; wall scales as "
            "D*S once past fixed cost. Points past the budget record "
            "the prediction instead of running."
        ),
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "THETA_REHEARSAL.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out)[:400])
    spark.stop()


if __name__ == "__main__":
    main()
