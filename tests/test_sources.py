"""Multi-format source parity: the same query gives the same result
whether the table arrived as parquet, ORC, CSV, or JSON lines."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sqlpp_spark.sources.files import convert_to_parquet, read_any


@pytest.fixture(scope="module")
def region(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/region.parquet")


def _agg(df):
    return sorted(
        tuple(r)
        for r in df.groupBy("r_regionkey")
        .agg(F.count(F.lit(1)).alias("n"), F.min("r_name").alias("nm"))
        .collect()
    )


@pytest.mark.parametrize("fmt", ["orc", "csv", "json"])
def test_format_roundtrip_parity(spark, region, tmp_path, fmt):
    path = str(tmp_path / f"region_{fmt}")
    w = region.write.mode("overwrite")
    if fmt == "csv":
        w = w.option("header", "true")
    w.format(fmt).save(path)
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in region.schema.fields)
    back = read_any(spark, path, fmt=fmt, schema=schema)
    assert _agg(back) == _agg(region)


def test_extension_inference_and_bad_format(spark, region, tmp_path):
    path = str(tmp_path / "r.json")
    region.write.mode("overwrite").json(path)
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in region.schema.fields)
    assert _agg(read_any(spark, path, schema=schema)) == _agg(region)
    with pytest.raises(ValueError, match="unsupported format"):
        read_any(spark, path, fmt="avro")


def test_convert_to_parquet_partitioned(spark, region, tmp_path):
    import os

    out = str(tmp_path / "region_pq")
    convert_to_parquet(region, out, partition_by=["r_regionkey"])
    assert any(d.startswith("r_regionkey=") for d in os.listdir(out))
    back = spark.read.parquet(out)
    # partition column round-trips (type widens via hive partitioning)
    assert back.count() == region.count()


def test_partition_pruning_reads_only_matching_dirs(spark, tmp_path):
    """Hive-partitioned layout + a partition-column filter must prune
    at PLANNING time: the scan's file list contains only the matching
    partition directory, and the physical plan carries the predicate
    as a PartitionFilter (zero data read from other partitions — the
    100 TB point of partitioned writes)."""
    import io
    import os
    from contextlib import redirect_stdout

    from sqlpp_spark.sources.tables import read_table

    events = read_table(spark, "/root/testdata/sf0.001", "events")
    out = str(tmp_path / "events_by_type")
    convert_to_parquet(events, out, partition_by=["event_type"])

    one = spark.read.parquet(out).filter(F.col("event_type") == "click")
    # NB: inputFiles() lists the base relation BEFORE pruning — the
    # contract lives in the physical plan's PartitionFilters
    buf = io.StringIO()
    with redirect_stdout(buf):
        one.explain("formatted")
    plan = buf.getvalue()
    pf_line = next(
        (l for l in plan.splitlines() if "PartitionFilters" in l), ""
    )
    assert "event_type" in pf_line, plan
    # and the pruned scan returns exactly the partition's rows
    expect = events.filter(F.col("event_type") == "click").count()
    assert one.count() == expect > 0
