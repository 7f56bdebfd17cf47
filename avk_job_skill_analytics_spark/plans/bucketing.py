"""Bucketed tables — pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a fact-fact join (orders ↔ lineitem,
clicks ↔ purchases) is shuffling both sides on the join key. Bucketing
pays that shuffle ONCE at write time: ``bucketBy(n, key)`` hash-
partitions rows into a fixed number of buckets per output partition,
and every later equi-join or aggregation on the key reads the buckets
co-located — the scan reports its hash partitioning, EnsureRequirements
sees the distribution already satisfied, and no Exchange is planned.

Rules that make it work (asserted in tests/test_plan_quality.py):
- both sides bucketed on their join key with the SAME bucket count;
- ``sortBy`` on the key lets SortMergeJoin skip its sorts too;
- bucket count sizes the parallelism of every downstream stage —
  pick ~(total size / target partition size), not executor count.

The reference has no storage layer at all (CSV in, SQL Server out,
SURVEY.md §2.1); this is the Spark-native answer to "load once, join
many times".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str,
                   buckets: int = 16, sort: bool = True,
                   path: str | None = None) -> None:
    """Persist ``df`` as a parquet table bucketed (and by default
    sorted) on ``key``. Overwrites the table if it exists. With
    ``path`` the table is external (data at ``path``, catalog entry
    droppable without touching files) — use this from code that must
    survive a fresh session, because a MANAGED table's warehouse
    directory outlives the in-memory catalog and a later session
    fails with LOCATION_ALREADY_EXISTS."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def time_clustered(df: DataFrame, ts_col: str, n_files: int) -> DataFrame:
    """Range-cluster a frame on a (time) column before writing: global
    range partitioning into ``n_files`` output partitions, each sorted
    within itself. Every output file then covers a narrow, disjoint
    ``ts_col`` range, so parquet footer min/max stats satisfy or
    reject whole files for any range predicate — sort-based data
    skipping, the within-partition complement to Hive-style directory
    partitioning (which would explode file counts if pushed to this
    granularity). The range exchange samples the column to pick
    balanced boundaries, so skew in event-time density does not skew
    file sizes."""
    return df.repartitionByRange(n_files, ts_col).sortWithinPartitions(ts_col)
