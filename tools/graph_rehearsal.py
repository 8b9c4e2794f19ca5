"""Graph-family scale rehearsal (round-12 verdict ask #3).

The r12 graph operators (PageRank, label propagation, triangle
counting) have DuckDB oracles and plan pins but their 100 TB
arguments — degree-oriented wedge join kills hub explosion, per-round
localCheckpoint keeps lineage flat, only 8-byte ids shuffle — were
argued, not measured. This tool builds a HUB-HEAVY power-law link
graph at two tiers (1× and 10× edges) and measures:

- wall / shuffle MB / reduce-side max-over-median task ratios for
  web-style pagerank (5 iter), label_propagate (3 iter),
  triangle_counts;
- the arboricity claim directly: wedge count under degree
  orientation (Σ C(outdeg,2)) vs the NAIVE adjacency wedge count
  (Σ C(deg,2)) the hub would force — and its growth 1×→10×.

Graph: edge endpoints drawn Zipf-ish via floor(1/u) capped at N
(deterministic md5 hash of the edge index — same fixture every run;
P(node 1) ≈ 0.5, so the hub holds ~half of all endpoints: a harsher
skew than any real crawl graph).

Output: merges a "graph_tier" section into SKEW_REHEARSAL.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from scale_rehearsal import get_spark_with_ui  # noqa: E402
from skew_rehearsal import run_one  # noqa: E402

from sqlpp_spark.ops.hashing import HASH_MOD, hash64  # noqa: E402
from sqlpp_spark.ops.web import (  # noqa: E402
    label_propagate,
    pagerank,
    triangle_counts,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TIERS = {
    "x1": {"edges": 150_000, "nodes": 50_000},
    "x10": {"edges": 1_500_000, "nodes": 500_000},
}
FIX = "/tmp/graphfix"


def zipf_node(salt: str, n_nodes: int):
    """Hub + uniform mixture: with prob 0.25 a Zipf draw over the first
    1000 ids (floor(1/u) — node 1 alone takes ~12% of ALL endpoints),
    else uniform over the full id range. Pure floor(1/u) collapses the
    graph to ~1k distinct nodes (everything lands on tiny ids); the
    mixture keeps the graph genuinely n_nodes-sized while planting
    hubs orders of magnitude above the median degree — the shape a
    real crawl graph has and the shape that breaks naive wedge joins."""
    u = (hash64(F.concat(F.lit(salt), F.lit("u|"), F.col("id").cast("string")))
         + 1).cast("double") / float(HASH_MOD)
    pick = (hash64(F.concat(F.lit(salt), F.lit("p|"),
                            F.col("id").cast("string")))
            ).cast("double") / float(HASH_MOD)
    hub = F.least(F.floor(1.0 / u), F.lit(1000))
    unif = (F.lit(1000) + F.floor(u * (n_nodes - 1000))).cast("bigint")
    return F.when(pick < 0.25, hub).otherwise(unif).cast("bigint")


def build_fixture(spark) -> None:
    for tier, cfg in TIERS.items():
        path = f"{FIX}/{tier}"
        if os.path.isdir(path):
            continue
        (
            spark.range(cfg["edges"])
            .select(
                zipf_node(f"gs|{tier}|", cfg["nodes"]).alias("src"),
                zipf_node(f"gd|{tier}|", cfg["nodes"]).alias("dst"),
            )
            .write.mode("overwrite").parquet(path)
        )


def wedge_counts(spark, edges) -> dict:
    """Oriented vs naive wedge counts — the join-size driver of the
    triangle computation. Naive = Σ C(deg,2) over the undirected
    adjacency (what a hub forces without orientation); oriented =
    Σ C(outdeg,2) under (degree, id) orientation (what our plan joins,
    bounded by arboricity ~ √m per node)."""
    canon = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        canon.select(F.col("a").alias("node"))
        .unionByName(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    naive = deg.select(
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2).alias("w")
    ).collect()[0]["w"]
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("__da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("__db"))
    withdeg = canon.join(da, "a").join(db, "b")
    fwd = F.struct(F.col("__da").alias("d"), F.col("a").alias("n")) < \
        F.struct(F.col("__db").alias("d"), F.col("b").alias("n"))
    outdeg = (
        withdeg.select(F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"))
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("od"))
    )
    orient = outdeg.select(
        F.sum(F.col("od") * (F.col("od") - 1) / 2).alias("w"),
        F.max("od").alias("mx"),
    ).collect()[0]
    n_edges = canon.count()
    return {
        "distinct_edges": n_edges,
        "naive_wedges": int(naive),
        "oriented_wedges": int(orient["w"]),
        "max_oriented_outdeg": int(orient["mx"]),
        "sqrt_m": round(n_edges ** 0.5, 1),
    }


def main() -> None:
    spark = get_spark_with_ui()
    build_fixture(spark)
    out: dict = {"tiers": {k: dict(v) for k, v in TIERS.items()}, "ops": {}}

    def seeds_of(edges):
        # ~1% of nodes carry one of 7 labels — the curation shape
        return (
            edges.select(F.col("src").alias("node")).distinct()
            .filter(F.col("node") % 97 == 0)
            .select("node", (F.col("node") % 7).alias("label"))
        )

    def bfs_sources(spark_, d):
        from pyspark.sql import functions as FF
        e = spark_.read.parquet(d)
        return (
            e.select(FF.col("src").alias("node")).distinct()
            .filter(FF.col("node") % 997 == 0)
        )

    builders = {
        "pagerank_5iter": lambda s, d: pagerank(
            s.read.parquet(d), n_iter=5
        ),
        "bfs_6hops": lambda s, d: __import__(
            "sqlpp_spark.ops.web", fromlist=["bfs_distance"]
        ).bfs_distance(s.read.parquet(d), bfs_sources(s, d), max_hops=6),
        "label_propagation_3iter": lambda s, d: label_propagate(
            seeds_of(s.read.parquet(d)), s.read.parquet(d), n_iter=3
        ),
        "triangle_clustering": lambda s, d: triangle_counts(
            s.read.parquet(d)
        ),
    }
    for name, b in builders.items():
        out["ops"][name] = {}
        for tier in TIERS:
            rec = run_one(spark, b, f"{FIX}/{tier}")
            out["ops"][name][tier] = rec
            print(f"{name} {tier}: {rec}", flush=True)
        a, c = out["ops"][name]["x1"]["sec"], out["ops"][name]["x10"]["sec"]
        out["ops"][name]["wall_growth_10x"] = round(c / a, 2) if a else None

    out["wedges"] = {}
    for tier in TIERS:
        t0 = time.perf_counter()
        w = wedge_counts(spark, spark.read.parquet(f"{FIX}/{tier}"))
        w["sec"] = round(time.perf_counter() - t0, 3)
        out["wedges"][tier] = w
        print(f"wedges {tier}: {w}", flush=True)
    w1, w10 = out["wedges"]["x1"], out["wedges"]["x10"]
    out["wedges"]["oriented_growth_10x"] = round(
        w10["oriented_wedges"] / max(w1["oriented_wedges"], 1), 2
    )
    out["wedges"]["naive_growth_10x"] = round(
        w10["naive_wedges"] / max(w1["naive_wedges"], 1), 2
    )
    out["wedges"]["naive_over_oriented_x10"] = round(
        w10["naive_wedges"] / max(w10["oriented_wedges"], 1), 1
    )

    path = os.path.join(REPO, "SKEW_REHEARSAL.json")
    doc = json.load(open(path)) if os.path.exists(path) else {}
    doc["graph_tier"] = out
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print("merged graph_tier into SKEW_REHEARSAL.json")


if __name__ == "__main__":
    main()
