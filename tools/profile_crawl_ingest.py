"""Stage-attributed profile of `pipeline_crawl_ingest` (VERDICT r11
ask #1: the largest headline row has no committed profile — name the
dominant stage before optimizing).

Method: rebuild the pipeline as cumulative PREFIXES, each materialized
by an aggregate that forces the stage's payload column (a bare count()
would let column pruning skip the very work being measured), and time
every prefix in interleaved rounds. median(prefix k) - median(prefix
k-1) attributes wall time to stage k. Nothing is cached between
prefixes — each one honestly re-runs its upstream, exactly like the
real query.

Usage: python tools/profile_crawl_ingest.py [rounds]
Writes PROFILE_pipeline_crawl_ingest.json at the repo root.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sqlpp_spark.ops import web as W  # noqa: E402
from sqlpp_spark.ops import dedup as D  # noqa: E402
from sqlpp_spark.ops import text as X  # noqa: E402
from sqlpp_spark.ops.warc import (  # noqa: E402
    html_text_col, synthesize_warc_media, warc_records_segmented,
)
from sqlpp_spark.queries.web_queries import _PSL_RULES, _with_url4  # noqa: E402
from sqlpp_spark.session import get_spark  # noqa: E402
from sqlpp_spark.sources.tables import read_table  # noqa: E402


def _prefixes(spark, sf_dir):
    """[(stage_name, build() -> DataFrame already reduced to a tiny
    aggregate row)] — cumulative, in pipeline order, mirroring the
    registered builder (r12 shape: persisted docs + narrow-key cap +
    winner-text passage dedup). Prefixes that persist record the
    frames on ``_sqlpp_persisted`` so the timing loop releases them."""
    from pyspark import StorageLevel

    from sqlpp_spark.ops.corpus import exact_k_sample

    def base():
        return _with_url4(read_table(spark, sf_dir, "documents"))

    def p0_scan():
        return base().agg(F.sum(F.length("text")).alias("v"))

    def p1_synthesize():
        a = synthesize_warc_media(base(), uri_col="url")
        return a.agg(F.sum(F.length("payload")).alias("v"))

    def p2_parse():
        a = synthesize_warc_media(base(), uri_col="url")
        recs = warc_records_segmented(a, spread=False).filter(
            (F.col("rec_type") == "response")
            & (F.col("http_status") == 200)
        )
        return recs.agg(F.sum(F.length("body")).alias("v"))

    def _docs(persist):
        a = synthesize_warc_media(base(), uri_col="url")
        recs = warc_records_segmented(a, spread=False).filter(
            (F.col("rec_type") == "response")
            & (F.col("http_status") == 200)
        )
        docs = recs.select(
            F.col("archive_id").alias("doc_id"),
            F.col("target_uri").alias("url"),
            html_text_col(F.col("body")).alias("text"),
        )
        if persist:
            docs = docs.persist(StorageLevel.MEMORY_AND_DISK)
            docs.count()
        return docs

    def p3_html_text():
        return _docs(False).agg(F.sum(F.length("text")).alias("v"))

    def _capped():
        docs = _docs(True)
        psl = W.psl_rules_df(spark, _PSL_RULES)
        narrow = W.with_registrable_domain(
            docs.select(
                "doc_id",
                F.lower(W.url_domain(F.col("url"))).alias("__h0"),
            ),
            "__h0", psl, "__host",
        ).drop("__h0")
        picks = exact_k_sample(
            narrow, k=10, group_col="__host", key_col="doc_id",
            salt="s0", n_buckets=64,
        ).select("doc_id")
        capped = docs.drop("url").join(picks, "doc_id", "left_semi")
        capped._sqlpp_persisted = [docs]
        return capped

    def p4_domain_cap():
        capped = _capped()
        out = capped.agg(F.sum(F.length("text")).alias("v"))
        out._sqlpp_persisted = capped._sqlpp_persisted
        return out

    def _cleaned():
        capped = _capped()
        cleaned = D.passage_dedup(capped, passage_tokens=8)
        cleaned._sqlpp_persisted = [
            *capped._sqlpp_persisted,
            *getattr(cleaned, "_sqlpp_persisted", ()),
        ]
        return cleaned

    def p5_passage_dedup():
        cleaned = _cleaned()
        out = cleaned.agg(
            F.sum(F.length("clean_text")).alias("v"),
            F.sum("n_kept").alias("k"),
        )
        out._sqlpp_persisted = cleaned._sqlpp_persisted
        return out

    def p6_full():
        cleaned = _cleaned()
        final = cleaned.filter(F.col("n_kept") > 0).select(
            "doc_id", "clean_text", "n_kept", "n_dropped",
            X.quality_score(F.col("clean_text")).alias("quality"),
        )
        out = final.agg(
            F.sum("quality").alias("v"), F.count(F.lit(1)).alias("n"),
        )
        out._sqlpp_persisted = cleaned._sqlpp_persisted
        return out

    return [
        ("scan+url", p0_scan),
        ("synthesize_warc", p1_synthesize),
        ("segment+parse_warc", p2_parse),
        ("html_text", p3_html_text),
        ("domain_cap", p4_domain_cap),
        ("passage_dedup", p5_passage_dedup),
        ("quality+filter", p6_full),
    ]


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_crawl_ingest")
    from sqlpp_spark.ops import release_intermediates

    prefixes = _prefixes(spark, sf_dir)

    def run(build):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = build()
        df.collect()
        dt = time.perf_counter() - t0
        release_intermediates(df)
        return dt

    # warm every plan once (codegen JIT)
    for _, build in prefixes:
        run(build)
    times: dict[str, list[float]] = {name: [] for name, _ in prefixes}
    loads = []
    for _ in range(rounds):
        loads.append(os.getloadavg()[0])
        for name, build in prefixes:
            times[name].append(run(build))
    med = {name: round(statistics.median(ts), 4)
           for name, ts in times.items()}
    names = [n for n, _ in prefixes]
    attributed = {}
    prev = 0.0
    for n in names:
        attributed[n] = round(med[n] - prev, 4)
        prev = med[n]
    out = {
        "target": "pipeline_crawl_ingest",
        "sf_dir": sf_dir,
        "rounds": rounds,
        "loadavg": loads,
        "cumulative_median_s": med,
        "stage_attributed_s": attributed,
        "stage_share": {
            n: round(attributed[n] / med[names[-1]], 3) for n in names
        },
        "all_runs_s": {n: [round(t, 4) for t in ts]
                       for n, ts in times.items()},
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PROFILE_pipeline_crawl_ingest.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"cumulative": med, "attributed": attributed},
                     indent=1))


if __name__ == "__main__":
    main()
