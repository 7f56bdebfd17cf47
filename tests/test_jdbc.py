"""S6 JDBC warehouse edge against a REAL database (embedded Derby —
its jars ship inside pyspark/jars, so no install is needed).

The reference appends to SQL Server in 100-row pyodbc batches
(src/load_sqlserver.py:70-98); these tests prove the Spark twin's
contract end-to-end: batched distributed append + read-back parity,
and the exactly-once foreachBatch upsert (stage bulk-load + set-based
merge) including the crash-redelivery replay that motivates it.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from avk_job_skill_analytics_spark.sources import sinks
from avk_job_skill_analytics_spark.streaming.incremental import (
    _jdbc_upsert_batch_fn,
)

DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture()
def derby_url():
    tmp = tempfile.mkdtemp(prefix="derby_test_")
    yield f"jdbc:derby:{tmp}/db;create=true"
    shutil.rmtree(tmp, ignore_errors=True)


def test_jdbc_roundtrip_batched_append(spark, derby_url):
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") * 2.5).alias("v"),
        F.concat(F.lit("row_"), F.col("id").cast("string")).alias("s"),
    )
    sinks.jdbc_sink(
        df, derby_url, "t_roundtrip", properties=DERBY_PROPS,
        batchsize=16, num_partitions=4, mode="overwrite",
    )
    back = spark.read.jdbc(derby_url, "t_roundtrip", properties=DERBY_PROPS)
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in df.collect()
    )


def test_foreach_batch_jdbc_upsert_merges_and_replays(spark, derby_url):
    cols = ["user_id", "ts", "event_id", "value"]
    empty = spark.createDataFrame([], "user_id long, ts long, event_id long, value double")
    sinks.jdbc_sink(empty, derby_url, "state", properties=DERBY_PROPS,
                    mode="overwrite")
    sink = _jdbc_upsert_batch_fn(
        derby_url, "state", "user_id", ("ts", "event_id"), DERBY_PROPS, 100
    )

    b0 = spark.createDataFrame(
        [(1, 10, 100, 1.0), (1, 20, 101, 2.0), (2, 10, 102, 3.0)], cols
    )
    sink(b0, 0)
    # crash-redelivery of the SAME batch must be a no-op state-wise
    sink(b0, 0)
    got = {
        r.user_id: (r.ts, r.event_id, r.value)
        for r in spark.read.jdbc(derby_url, "state",
                                 properties=DERBY_PROPS).collect()
    }
    assert got == {1: (20, 101, 2.0), 2: (10, 102, 3.0)}

    # a later batch upserts existing keys and inserts new ones
    b1 = spark.createDataFrame(
        [(1, 30, 103, 9.0), (3, 5, 104, 4.0)], cols
    )
    sink(b1, 1)
    got = {
        r.user_id: (r.ts, r.event_id, r.value)
        for r in spark.read.jdbc(derby_url, "state",
                                 properties=DERBY_PROPS).collect()
    }
    assert got == {
        1: (30, 103, 9.0),
        2: (10, 102, 3.0),
        3: (5, 104, 4.0),
    }
