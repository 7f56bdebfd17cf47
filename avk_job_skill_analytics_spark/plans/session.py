"""SparkSession factory tuned for this engine.

The reference has no engine config at all (eager single-threaded
pandas); here we centralize the Spark settings that matter for the
100 TB design point:

- AQE on (runtime re-plan: auto-broadcast, skew-join splitting,
  partition coalescing) — subsumes every manual rewrite the reference
  performs (SURVEY.md §4).
- shuffle partitions sized to the local core count for tests; on a
  real cluster this is overridden to ~2-3x total cores (AQE coalesces
  down, so erring high is safe).
- session timezone pinned to UTC so timestamp semantics are stable
  across engines (the DuckDB oracle uses UTC-naive timestamps).
- Arrow enabled for the few Pandas-UDF paths (skills UD1, multimodal).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "avk-job-skill-analytics-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 4)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # runtime bloom-filter pruning: selective joins push a bloom
        # filter of the build side into the probe-side scan — at the
        # 100 TB point this skips whole row groups before the shuffle
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bound Arrow batch memory for mapInPandas over wide/binary
        # payload columns (multimodal ops): batches of megabyte-scale
        # assets must not default to 10k rows each
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # driver testdata carries INT64 TIMESTAMP(NANOS) parquet columns,
        # which Spark's reader has no timestamp type for; read as long
        # nanos and convert in plans.schemas.load
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime-settable defaults to an externally
    provided session (the driver hands us one in ``entry``).

    Shuffle partitions are right-sized to the core count ONLY when
    the session still carries Spark's stock default (200) — an
    untuned external session would otherwise pay ~200 tiny tasks per
    shuffle at gate scale (dd_minhash_lsh 12.8 s -> ~4 s at sf0.01,
    measured on a vanilla local[8] session). A session anyone
    deliberately configured is left alone, so tests pinning
    shuffle_partitions=4 and scoped_shuffle blocks are unaffected.
    """
    try:
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            cores = spark.sparkContext.defaultParallelism
            spark.conf.set("spark.sql.shuffle.partitions",
                           str(max(int(cores), 4)))
    except Exception:
        pass
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "2048",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static confs on a running session: keep going
    return spark


import contextlib


@contextlib.contextmanager
def scoped_shuffle(spark, n: int):
    """Temporarily set spark.sql.shuffle.partitions.

    Iterative operators (connected components, k-means) run many tiny
    shuffle stages whose per-partition fixed cost dominates when the
    frames are far smaller than the session default partition count;
    size the loop's shuffles to the DATA (rows per partition), restore
    the default for everything else. Same principle as the streaming
    drains' state-store sizing."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(int(n)))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def sized_partitions(spark, n_rows: int, rows_per_partition: int = 50_000) -> int:
    """Partition count for an iterative loop: enough to keep
    ``rows_per_partition`` per task, never more than the session
    default (the cluster-scale ceiling), never fewer than 4."""
    try:
        default = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        default = 200
    return max(4, min(default, n_rows // rows_per_partition + 1))


def tiny_df(spark, rows, schema: str):
    """Driver-built tiny frame as ONE partition from birth.

    ``createDataFrame(list, schema)`` spreads even a handful of local
    rows over defaultParallelism pickled Python partitions, so every
    downstream consumer pays ~32 Python-worker round trips (and a
    ``coalesce(1)`` would evaluate them SEQUENTIALLY in one task —
    the round-10 tiny-write pathology). ``parallelize(rows, 1)``
    keeps the whole frame one cheap task: measured ~1.3 s → ~0.9 s
    warm (6.4 s → 1.9 s first-use) for a 31-row frame feeding two
    window phases. Rows and dtypes are identical — the schema string
    governs both paths — so results never change, only task count."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(list(rows), 1), schema
    )


_SCRATCH_PERSISTED: list = []


def scratch_persist(df, keep: int = 8):
    """``persist()`` with SESSION-LIFETIME bounds (guide §5: unpersist
    when done): the frame is registered in a bounded FIFO and the
    oldest entries beyond ``keep`` are unpersisted as new ones arrive.

    The within-query persists (shared shingle frames, LSH candidate
    frames, prefix-filter doc arrays) are consumed entirely by the
    query that created them, but a long-lived session running many
    such queries would otherwise accumulate every one of them in
    storage memory until eviction pressure. Eviction here is safe by
    construction: unpersisting a frame that somehow IS still
    referenced only degrades to recomputation, never to wrong
    results. ``keep`` comfortably exceeds the largest number of
    scratch frames any single query pins at once (3)."""
    df.persist()
    _SCRATCH_PERSISTED.append(df)
    while len(_SCRATCH_PERSISTED) > keep:
        old = _SCRATCH_PERSISTED.pop(0)
        try:
            old.unpersist()
        except Exception:
            pass
    return df
