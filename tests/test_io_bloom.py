"""io_bloom_skip contract: the bloom-filtered layout REALLY carries
parquet bloom filters (footer-asserted through parquet-mr via the
session JVM — pyarrow 16 does not expose bloom offsets), the point
lookup pushes to the scan, and values match the flat table."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from avk_job_skill_analytics_spark.plans.schemas import load
from avk_job_skill_analytics_spark.registry.io_queries import (
    bloom_events_layout,
    io_bloom_skip,
)

SF_DIR = "/root/testdata/sf0.001"


def _bloom_offsets(spark, parquet_file: str, column: str) -> list[int]:
    """Per-row-group bloom filter offsets for a column (parquet-mr
    footer read; -1 means no bloom filter was written)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(parquet_file)
    infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        path, conf
    )
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
    try:
        offsets = []
        blocks = reader.getFooter().getBlocks()
        for bi in range(blocks.size()):
            cols = blocks.get(bi).getColumns()
            for ci in range(cols.size()):
                cc = cols.get(ci)
                if cc.getPath().toDotString() == column:
                    offsets.append(cc.getBloomFilterOffset())
        return offsets
    finally:
        reader.close()


def test_layout_writes_bloom_filters(spark):
    layout = bloom_events_layout(spark, SF_DIR)
    files = sorted(glob.glob(f"{layout}/*.parquet"))
    assert files
    offs = _bloom_offsets(spark, files[0], "event_id")
    assert offs and all(o > 0 for o in offs), offs
    # the untracked column must NOT carry one (option is per-column)
    v_offs = _bloom_offsets(spark, files[0], "value")
    assert all(o == -1 for o in v_offs), v_offs


def test_dict_sibling_has_dictionary_and_pushes(spark):
    """io_dict_skip's key keeps its dictionary page (the exact
    pruning path), and the lookup pushes to the scan."""
    from avk_job_skill_analytics_spark.registry.io_queries import (
        io_dict_skip,
    )

    layout = bloom_events_layout(spark, SF_DIR)
    f = sorted(glob.glob(f"{layout}/*.parquet"))[0]
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        jvm.org.apache.hadoop.fs.Path(f), conf
    )
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
    try:
        cols = reader.getFooter().getBlocks().get(0).getColumns()
        dict_off = {
            cols.get(i).getPath().toDotString():
                cols.get(i).getDictionaryPageOffset()
            for i in range(cols.size())
        }
    finally:
        reader.close()
    assert dict_off["user_id"] > 0      # dictionary present: exact prune
    assert dict_off["event_id"] == 0    # disabled: bloom carries it
    df = io_dict_skip(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(user_id" in plan, plan[:2000]
    assert df.count() > 0


def test_lookup_pushes_and_matches_flat_table(spark):
    df = io_bloom_skip(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(event_id" in plan, plan[:2000]
    got = {r["event_type"]: (r["n"], r["total_value"])
           for r in df.collect()}
    flat = (
        load(spark, SF_DIR, "events")
        .filter(F.col("event_id").isin(13, 777, 131313131))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 2).alias("total_value"))
    )
    want = {r["event_type"]: (r["n"], r["total_value"])
            for r in flat.collect()}
    assert got == want
