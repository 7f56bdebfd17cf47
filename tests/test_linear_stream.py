"""Tests for the incremental logistic-regression trainer
(streaming/linear_stream.py): trajectory parity with driver-side
sequential steps, marker-lost redelivery, and the latest-state
compaction."""

from __future__ import annotations

import os

from avk_job_skill_analytics_spark.operators import linearmodel as lm
from avk_job_skill_analytics_spark.streaming.fsio import IndexFS
from avk_job_skill_analytics_spark.streaming.linear_stream import (
    _logreg_train_batch_fn,
    compact_logreg_weights,
    serve_logreg_weights,
)

SCHEMA = "x0 double, x1 double, y double"
STATS = ["w_bias", "w_x"]


def _batches(spark):
    b0 = spark.createDataFrame(
        [(1.0, 0.1, 0.0), (1.0, 0.2, 0.0), (1.0, 0.9, 1.0)], SCHEMA
    )
    b1 = spark.createDataFrame(
        [(1.0, 0.8, 1.0), (1.0, 0.3, 0.0)], SCHEMA
    )
    b2 = spark.createDataFrame([(1.0, 0.95, 1.0)], SCHEMA)
    return b0, b1, b2


def _serve(spark, d):
    return {
        r["stat"]: r["value"]
        for r in serve_logreg_weights(spark, d, STATS).collect()
    }


def test_stream_steps_match_sequential_driver_steps(spark, tmp_path):
    """The journaled trajectory must equal driver-side sequential
    mini-batch steps — same exact integer arithmetic, same order."""
    d = str(tmp_path / "model")
    os.makedirs(d)
    sink = _logreg_train_batch_fn(d, ["x0", "x1"], "y", 1.0, 2.0)
    expect, n_seen = [0, 0], 0
    for i, b in enumerate(_batches(spark)):
        sink(b, i)
        row = b.selectExpr(
            "count(*) AS n",
            *(f"{g} AS g{j}" for j, g in enumerate(
                lm.grad_exprs(expect, ["x0", "x1"], "y"))),
        ).collect()[0]
        expect = lm.update_weights(
            expect, [row["g0"], row["g1"]], int(row["n"]), 1.0, 2.0
        )
        n_seen += int(row["n"])
    got = _serve(spark, d)
    assert [got["w_bias"], got["w_x"]] == expect
    assert got["n_batches"] == 3 and got["n_seen"] == n_seen


def test_marker_lost_redelivery_is_idempotent(spark, tmp_path):
    """Redelivering the newest batch after its marker is lost must
    recompute the identical step (the uncommitted state dir is
    excluded from the latest-state read), not stack a second one."""
    d = str(tmp_path / "model")
    os.makedirs(d)
    sink = _logreg_train_batch_fn(d, ["x0", "x1"], "y", 1.0, 2.0)
    b0, b1, _ = _batches(spark)
    sink(b0, 0)
    sink(b1, 1)
    before = _serve(spark, d)
    fs = IndexFS(spark, d)
    fs.delete("_batch_1")
    sink(b1, 1)
    assert _serve(spark, d) == before
    # committed-marker redelivery short-circuits entirely
    sink(b1, 1)
    assert _serve(spark, d) == before


def test_compaction_keeps_only_newest_state(spark, tmp_path):
    d = str(tmp_path / "model")
    os.makedirs(d)
    sink = _logreg_train_batch_fn(d, ["x0", "x1"], "y", 1.0, 2.0)
    for i, b in enumerate(_batches(spark)):
        sink(b, i)
    before = _serve(spark, d)
    stats = compact_logreg_weights(spark, d)
    # latest-state merge: exactly d rows survive
    assert stats["rows"] == len(STATS)
    assert _serve(spark, d) == before
    # training keeps absorbing after the fold
    b3 = spark.createDataFrame([(1.0, 0.05, 0.0)], SCHEMA)
    sink(b3, 3)
    after = _serve(spark, d)
    assert after["n_batches"] == 4 and after != before


def test_empty_batch_commits_marker_without_step(spark, tmp_path):
    d = str(tmp_path / "model")
    os.makedirs(d)
    sink = _logreg_train_batch_fn(d, ["x0", "x1"], "y", 1.0, 2.0)
    b0, _, _ = _batches(spark)
    sink(b0, 0)
    before = _serve(spark, d)
    empty = spark.createDataFrame([], SCHEMA)
    sink(empty, 1)
    got = _serve(spark, d)
    assert got == before  # seq does not advance on empty arrivals
