"""Incremental (mini-batch SGD) logistic-regression training on a
labeled stream — the shared commit protocol's latest-state layout.

Unlike Naive Bayes (``classify_stream``), whose sufficient
statistics are associative deltas, a gradient-descent trajectory is
ORDER-DEPENDENT: the step taken on batch k is evaluated at the
weights left by batch k-1. The journal therefore stores the model
STATE after each committed step (d+0 micro-weight rows per batch —
bytes, not corpus), not deltas:

- each micro-batch reads the latest committed state, takes ONE exact
  GD step on its own rows (the engine-exact integer micro-gradient
  arithmetic of ``operators/linearmodel`` — one aggregate over the
  batch, a d-integer driver update), and appends the new state
  exactly once under the marker protocol (redelivered batches
  short-circuit, so a crash between step and commit replays to the
  identical state);
- serving reads the max-``seq`` committed state — O(batches) tiny
  files, bounded by compaction;
- compaction is the protocol's latest-state merge: fold committed
  state partitions into one generation holding only the newest
  ``seq`` (journaled rename-free cutover, tombstone grace, crash
  recovery — the shared ``batched_index`` machinery unchanged).

The registry oracle replays the whole trajectory in SQL — per-batch
source CTEs in arrival order, one unrolled (gradient, update) pair
per batch — so the served weights are hash-verified against the
exact mini-batch SGD semantics, not merely "some converged model".

Empty micro-batches (no rows surviving the feature filter) commit a
marker but take no step — ``seq`` advances only with real steps, so
the trajectory is invariant to empty-trigger noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import linearmodel as lm
from .fsio import (
    IndexFS,
    committed_batch_ids,
    ensure_protocol,
    legacy_overlay_ids,
    recover_compaction,
)

__all__ = [
    "foreach_batch_logreg_train",
    "serve_logreg_weights",
    "compact_logreg_weights",
]

_SCHEMA = "j int, w_micro long, cum_n long, seq long"


def _delete_weight_batches(fs, bs: list[str]) -> None:
    for b in bs:
        fs.delete(f"weights/batch={b}")


def _probes(fs):
    return (
        lambda: fs.is_dir("weights/batch=-1"),
        lambda b: fs.is_dir(f"weights/batch={b}"),
    )


def _committed_weight_dirs(fs) -> list[str]:
    committed = committed_batch_ids(fs) | legacy_overlay_ids(
        fs, *_probes(fs)
    )
    return [
        fs.uri(f"weights/{name}")
        for name in fs.listdir("weights")
        if name.startswith("batch=")
        and name.split("=", 1)[1] in committed
    ]


def _latest_state(spark, fs, d: int) -> tuple[list[int], int, int]:
    """(micro-weights, cum_n, seq) of the newest committed step —
    zeros before the first. Reads O(batches·d) tiny rows; the 1-row
    collect per field is the bounded-driver discipline."""
    dirs = _committed_weight_dirs(fs)
    if not dirs:
        return [0] * d, 0, 0
    df = spark.read.schema(_SCHEMA).parquet(*dirs)
    top = df.orderBy(F.desc("seq"), "j").limit(d).collect()
    if not top:
        return [0] * d, 0, 0
    w = [0] * d
    for r in top:
        w[r["j"]] = int(r["w_micro"])
    return w, int(top[0]["cum_n"]), int(top[0]["seq"])


def _logreg_train_batch_fn(index_dir: str, feature_cols: list[str],
                           label_col: str,
                           lr_num: float, lr_den: float,
                           compact_every: int | None = None):
    """Per-batch training body, exposed for redelivery tests."""

    def sink(bdf: DataFrame, batch_id: int) -> None:
        spark = bdf.sparkSession
        fs = IndexFS(spark, index_dir)
        if fs.exists(f"_batch_{batch_id}"):
            return
        ensure_protocol(fs, *_probes(fs))
        recover_compaction(fs, _delete_weight_batches)
        d = len(feature_cols)
        w, cum_n, seq = _latest_state(spark, fs, d)
        exprs = ["count(*) AS n"] + [
            f"{g} AS g{j}"
            for j, g in enumerate(
                lm.grad_exprs(w, feature_cols, label_col))
        ]
        row = bdf.selectExpr(*exprs).collect()[0]
        n = int(row["n"])
        if n > 0:
            grads = [int(row[f"g{j}"]) for j in range(d)]
            w = lm.update_weights(w, grads, n, lr_num, lr_den)
            rows = [(j, w[j], cum_n + n, seq + 1) for j in range(d)]
            # single-partition from birth: createDataFrame spreads d
            # python rows over defaultParallelism partitions, and
            # coalesce(1) then evaluates ALL parent python partitions
            # sequentially inside the one write task (~4 s per tiny
            # state write — same pathology as ann_index round 10);
            # parallelize(_, 1) keeps the write one cheap task
            spark.createDataFrame(
                spark.sparkContext.parallelize(rows, 1), _SCHEMA
            ).write.mode("overwrite").parquet(
                fs.uri(f"weights/batch={batch_id}")
            )
        fs.touch(f"_batch_{batch_id}")
        if compact_every:
            committed_now = committed_batch_ids(fs) | {str(batch_id)}
            n_real = sum(
                1
                for name in fs.listdir("weights")
                if name.startswith("batch=")
                and not name.startswith("batch=-")
                and name.split("=", 1)[1] in committed_now
            )
            if n_real >= compact_every:
                compact_logreg_weights(spark, index_dir)

    return sink


def foreach_batch_logreg_train(stream: DataFrame, index_dir: str,
                               feature_cols: list[str],
                               label_col: str,
                               lr_num: float = 1.0,
                               lr_den: float = 2.0,
                               compact_every: int | None = None
                               ) -> "object":
    """Train the logistic model incrementally: each labeled
    micro-batch takes one exact GD step from the latest committed
    state and journals the new state exactly once."""
    sink = _logreg_train_batch_fn(
        index_dir, feature_cols, label_col, lr_num, lr_den,
        compact_every=compact_every,
    )
    return stream.writeStream.foreachBatch(sink)


def serve_logreg_weights(spark, index_dir: str,
                         stat_names: list[str]) -> DataFrame:
    """The CURRENT model as a (stat, value) BIGINT ledger:
    per-feature micro-weights of the newest committed step plus the
    step count and cumulative rows consumed."""
    fs = IndexFS(spark, index_dir)
    d = len(stat_names)
    w, cum_n, seq = _latest_state(spark, fs, d)
    rows = [(s, w[j]) for j, s in enumerate(stat_names)]
    rows += [("n_batches", seq), ("n_seen", cum_n)]
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        "stat string, value long",
    )


def compact_logreg_weights(spark, index_dir: str,
                           marker_horizon: int = 1000) -> dict:
    """Fold committed state partitions into ONE generation holding
    only the newest ``seq`` — the latest-state merge: older steps
    are superseded by construction, so serving is invariant while
    the committed file count drops to one."""
    from .batched_index import compact_batched_index

    def _merge(df, b):
        mx = df.agg(F.max("seq").alias("m"))
        return (
            df.join(F.broadcast(mx), df.seq == mx.m, "left_semi")
            .repartition(b)
            .localCheckpoint()
        )

    return compact_batched_index(
        spark, index_dir, {"weights": _merge},
        marker_horizon=marker_horizon,
    )
