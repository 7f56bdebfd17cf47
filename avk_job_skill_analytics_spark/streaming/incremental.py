"""Structured Streaming — the incremental file-arrival pattern
(SURVEY.md §2.9) plus beyond-reference event-time windowing.

The reference's operational core is micro-batch incremental
processing: list the bucket, diff against processed names, handle new
files, mark them done (src/transform.py:186-198,
src/load_sqlserver.py:110-127). In Spark that whole mechanism IS the
file streaming source: the checkpoint tracks processed files
(subsuming S7/S8 and the loaded_files tracker), and
``trigger(availableNow=True)`` gives the reference's "drain whatever
arrived, then stop" daily-batch behavior. ``foreachBatch`` carries the
JDBC/idempotent sink.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def incremental_file_pipeline(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    checkpoint_dir: str,
    sink: Callable[[DataFrame, int], None],
    transform: Callable[[DataFrame], DataFrame] | None = None,
    fmt: str = "parquet",
) -> None:
    """Process exactly the files not yet seen by the checkpoint, apply
    ``transform``, hand each micro-batch to ``sink(df, epoch_id)``, and
    stop (availableNow). Re-running with the same checkpoint is a no-op
    when nothing new arrived — the reference's idle-scan behavior.

    ``sink`` runs per micro-batch on the driver; write idempotently
    (e.g. overwrite-by-epoch or manifest-append) for exactly-once."""
    reader = spark.readStream.format(fmt).schema(schema)
    if fmt == "csv":
        reader = reader.option("header", True)
    stream = reader.load(source_dir)
    if transform is not None:
        stream = transform(stream)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def tumbling_window_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time tumbling-window counts with a watermark for late
    data (beyond-reference: the reference stamps processing time and
    has no event-time semantics). Works on both batch and streaming
    DataFrames — same plan, Catalyst handles either mode."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            key_col,
            "n",
            "total_value",
        )
    )


def run_streaming_window_counts(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    checkpoint_dir: str,
    query_name: str = "window_counts",
) -> DataFrame:
    """Drive ``tumbling_window_counts`` as a real streaming query over
    a parquet directory: availableNow + complete-mode memory sink,
    synchronous drain, result returned as a DataFrame."""
    stream = (
        spark.readStream.format("parquet").schema(schema).load(source_dir)
    )
    agg = tumbling_window_counts(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {query_name}")
