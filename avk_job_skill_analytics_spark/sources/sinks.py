"""Sinks S5–S6 (SURVEY.md §2.1).

The reference writes one CSV object per day to S3
(src/data_extract.py:239-248) and appends to SQL Server in 100-row
pyodbc batches (src/load_sqlserver.py:70-98). Spark-native versions:
partitioned parquet for the curated zone, single-file CSV only at the
external boundary, and the JDBC writer with per-partition batched
inserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def csv_sink(df: DataFrame, path: str, single_file: bool = False,
             mode: str = "overwrite", **options) -> None:
    """S5 — CSV out (header, no index). ``single_file=True`` matches
    the reference's one-object-per-day layout via coalesce(1) — fine
    for daily extracts, wrong for big results (single-writer
    bottleneck); leave False to write one file per partition."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", True).options(**options).csv(path)


def parquet_sink(df: DataFrame, path: str, partition_by: list[str] | None = None,
                 mode: str = "overwrite") -> None:
    """Curated-zone sink: date-partitioned parquet. Partitioning by
    ingest date gives partition pruning for the incremental pattern
    (the reference's filename-embedded date, done natively)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def jdbc_sink(df: DataFrame, url: str, table: str,
              properties: dict[str, str] | None = None,
              batchsize: int = 1000, num_partitions: int | None = None,
              mode: str = "append") -> None:
    """S6 — warehouse append (dbo.job_data). The reference commits
    100-row pyodbc batches single-threaded; Spark's JDBC writer runs
    one connection per partition with ``batchsize`` rows per round
    trip. ``num_partitions`` caps writer concurrency so the target DB
    isn't overwhelmed."""
    if num_partitions is not None:
        df = df.coalesce(num_partitions)
    (
        df.write.mode(mode)
        .option("batchsize", batchsize)
        .jdbc(url, table, properties=properties or {})
    )
