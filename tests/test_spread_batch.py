"""spread_batch contracts (streaming/batched_index.py).

The streaming drains repartition narrow micro-batches before the
per-row signing work; repartition changes row-to-partition mapping,
which must never reach a compared value (VERDICT r10 #8), and the
shuffle-partition conf lookup must tolerate non-numeric values like
"auto" (ADVICE r10)."""

from __future__ import annotations

from pyspark.sql import functions as F

from avk_job_skill_analytics_spark.streaming.batched_index import (
    spread_batch,
)
from avk_job_skill_analytics_spark.streaming.minhash_stream import (
    _sign_documents,
)


def _docs(spark, n=40):
    # single input partition, like an availableNow micro-batch with
    # maxFilesPerTrigger=1
    return spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(i, f"document number {i} " * (3 + i % 5)) for i in range(n)],
            1,
        ),
        "doc_id long, text string",
    )


def test_spread_batch_value_neutral(spark):
    """The full signing pass (shingle MD5 array + minhash signature
    columns — the heaviest per-row work any drain runs after
    spread_batch) must produce identical values with and without the
    spread."""
    docs = _docs(spark)
    cols = None
    out = {}
    for tag, frame in (("plain", docs), ("spread", spread_batch(docs))):
        signed = _sign_documents(frame, "doc_id", "text", 5, 16, 42)
        signed = signed.withColumn("_sh", F.sort_array("_sh"))
        cols = signed.columns
        out[tag] = sorted(
            tuple(r) for r in signed.collect()
        )
    assert out["plain"] == out["spread"], f"columns {cols} diverged"


def test_spread_batch_increases_parallelism(spark):
    docs = _docs(spark)
    assert docs.rdd.getNumPartitions() == 1
    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert spread_batch(docs).rdd.getNumPartitions() == target


def test_spread_batch_tolerates_non_numeric_conf(spark, monkeypatch):
    """Distributions that accept 'auto' for shuffle partitions must
    not fail every micro-batch: spread_batch falls back to
    defaultParallelism."""
    docs = _docs(spark)
    real_get = spark.conf.get

    def fake_get(key, default=None):
        if key == "spark.sql.shuffle.partitions":
            return "auto"
        return real_get(key, default)

    monkeypatch.setattr(type(spark.conf), "get",
                        lambda self, key, default=None: fake_get(key, default))
    spread = spread_batch(docs)
    assert spread.rdd.getNumPartitions() >= 1
