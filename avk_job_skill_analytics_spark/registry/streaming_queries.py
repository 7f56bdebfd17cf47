"""Streaming / incremental-processing inventory (SURVEY.md §2.9).

``stream_tumbling_counts`` runs a REAL Structured Streaming query
(parquet file source → watermark → event-time tumbling window →
availableNow → memory sink) and returns the drained result; the
oracle is plain SQL because epoch-aligned 1-hour windows equal
date_trunc('hour'). This is the engine's event-time path, exercised
end-to-end, not a batch approximation.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..streaming.incremental import tumbling_window_counts

QUERIES = {}
ORACLES = {}


def _q(name, oracle=None):
    def reg(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return reg


# events.parquet carries ts as INT64 TIMESTAMP(NANOS); the streaming
# schema reads it as long and the plan converts (same convention as
# plans.schemas.load)
_EVENTS_NANOS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


@_q(
    "stream_tumbling_counts",
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
              count(*) AS n, round(sum(value), 2) AS total_value
       FROM events GROUP BY window_start, event_type""",
)
def stream_tumbling_counts(spark, sf_dir):
    """Event-time tumbling 1-hour window counts via an actual
    streaming query (availableNow drain into a memory sink)."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    # the file streaming source wants a directory; expose the single
    # events.parquet through a temp dir symlink
    src_dir = tempfile.mkdtemp(prefix="stream_src_")
    os.symlink(f"{sf_dir}/events.parquet", f"{src_dir}/events.parquet")
    stream = (
        spark.readStream.format("parquet")
        .schema(_EVENTS_NANOS)
        .load(src_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    agg = tumbling_window_counts(stream)
    name = f"wc_{uuid.uuid4().hex[:12]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
