"""Incremental Naive Bayes TRAINING on a labeled document stream —
the shared commit protocol's fifth layout, and the first whose
compaction is a SUM-merge rather than a concatenation.

The model's sufficient statistics are per-term integer count pairs
(c1, c0): they are associative and commutative, so

- each micro-batch appends only its own count DELTAS
  (``counts/batch=<id>``: (term, c1, c0) — O(arrivals) per trigger,
  the corpus is never rescanned);
- serving derives the weights from the SUM of committed deltas —
  totals (t1, t0) and the vocabulary size fall out of the same
  aggregate, so the served weight table is bit-identical to batch
  training over the union of arrivals;
- compaction folds committed delta partitions into one summed
  generation — same journaled rename-free tombstone-graced protocol,
  but the generation holds ``SUM(deltas)``, not their concatenation,
  and serving is invariant because integer addition is associative.

This closes the classifier lifecycle the way the ANN family closed
retrieval's: train incrementally (here), gate at ingest
(``stream_nb_gate``), serve batch (``txt_nb_classifier``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.classify import _llr_fp
from ..operators.textstats import tokens
from .fsio import (
    IndexFS,
    committed_batch_ids,
    ensure_protocol,
    legacy_overlay_ids,
    recover_compaction,
)

__all__ = [
    "foreach_batch_nb_train",
    "serve_nb_weights",
    "compact_nb_counts",
]


def _delete_nb_batches(fs, bs: list[str]) -> None:
    for b in bs:
        fs.delete(f"counts/batch={b}")


def _probes(fs):
    return (
        lambda: fs.is_dir("counts/batch=-1"),
        lambda b: fs.is_dir(f"counts/batch={b}"),
    )


def _committed_count_dirs(fs, committed: set[str]) -> list[str]:
    return [
        fs.uri(f"counts/{name}")
        for name in fs.listdir("counts")
        if name.startswith("batch=")
        and name.split("=", 1)[1] in committed
    ]


def _batch_deltas(bdf: DataFrame, id_col: str, text_col: str,
                  label_col: str) -> DataFrame:
    """One micro-batch's sufficient-statistic deltas: per-term
    (c1, c0) token counts by class."""
    toks = tokens(bdf, id_col, text_col).join(
        bdf.select(F.col(id_col), F.col(label_col).alias("_y")), id_col
    )
    return toks.groupBy("term").agg(
        F.sum(F.col("_y")).cast("long").alias("c1"),
        F.sum(F.lit(1) - F.col("_y")).cast("long").alias("c0"),
    )


def _nb_train_batch_fn(index_dir: str, id_col: str, text_col: str,
                       label_col: str,
                       compact_every: int | None = None):
    """Per-batch training body, exposed for redelivery tests."""

    def sink(bdf: DataFrame, batch_id: int) -> None:
        spark = bdf.sparkSession
        fs = IndexFS(spark, index_dir)
        if fs.exists(f"_batch_{batch_id}"):
            return
        ensure_protocol(fs, *_probes(fs))
        recover_compaction(fs, _delete_nb_batches)
        deltas = _batch_deltas(bdf, id_col, text_col, label_col)
        deltas.write.mode("overwrite").parquet(
            fs.uri(f"counts/batch={batch_id}")
        )
        fs.touch(f"_batch_{batch_id}")
        if compact_every:
            committed_now = committed_batch_ids(fs) | {str(batch_id)}
            n_real = sum(
                1
                for name in fs.listdir("counts")
                if name.startswith("batch=")
                and not name.startswith("batch=-")
                and name.split("=", 1)[1] in committed_now
            )
            if n_real >= compact_every:
                compact_nb_counts(spark, index_dir)

    return sink


def foreach_batch_nb_train(stream: DataFrame, index_dir: str,
                           id_col: str, text_col: str, label_col: str,
                           compact_every: int | None = None) -> "object":
    """Train the NB model incrementally: each labeled micro-batch
    appends its per-term count deltas exactly once; the served
    weights always reflect every committed arrival, with no corpus
    rescan and no model rebuild."""
    sink = _nb_train_batch_fn(index_dir, id_col, text_col, label_col,
                              compact_every=compact_every)
    return stream.writeStream.foreachBatch(sink)


def serve_nb_weights(spark, index_dir: str) -> DataFrame:
    """The CURRENT model: sum the committed count deltas per term,
    derive totals and vocabulary from the same aggregate, and emit
    the fixed-point log-likelihood-ratio weights — bit-identical to
    batch-training on the union of committed arrivals, because the
    sufficient statistics are exact integers and the one float op per
    term consumes identical operands. Read-only (legacy overlay, no
    stamping)."""
    fs = IndexFS(spark, index_dir)
    committed = committed_batch_ids(fs) | legacy_overlay_ids(
        fs, *_probes(fs)
    )
    dirs = _committed_count_dirs(fs, committed)
    if not dirs:
        return spark.createDataFrame([], "term string, w_fp long")
    cnt = (
        spark.read.parquet(*dirs)
        .groupBy("term")
        .agg(F.sum("c1").alias("_c1"), F.sum("c0").alias("_c0"))
    )
    tot = cnt.agg(
        F.sum("_c1").alias("_t1"),
        F.sum("_c0").alias("_t0"),
        F.count(F.lit(1)).alias("_v"),
    )
    return cnt.crossJoin(F.broadcast(tot)).select(
        "term",
        _llr_fp(
            F.col("_c1") + F.lit(1), F.col("_t1") + F.col("_v"),
            F.col("_c0") + F.lit(1), F.col("_t0") + F.col("_v"),
        ).alias("w_fp"),
    )


def compact_nb_counts(spark, index_dir: str, buckets: int = 1,
                      marker_horizon: int = 1000) -> dict:
    """Fold committed delta partitions into ONE summed generation:
    the protocol's first associative-merge compaction — the
    generation holds per-term SUM(c1), SUM(c0) over everything it
    consumed, so the post-compaction serve aggregates fewer rows to
    the same integers. The cutover body is the layout-generic
    ``batched_index.compact_batched_index`` with a CALLABLE layout
    (the SUM-merge, localCheckpoint-ed so the count and the write
    share one computation) — journal, tombstone grace, and crash
    recovery are the shared machinery unchanged."""
    from .batched_index import compact_batched_index

    def _merge(df, b):
        return (
            df.groupBy("term")
            .agg(
                F.sum("c1").cast("long").alias("c1"),
                F.sum("c0").cast("long").alias("c0"),
            )
            .repartition(b)
            .localCheckpoint()
        )

    return compact_batched_index(
        spark, index_dir, {"counts": _merge},
        buckets=buckets, marker_horizon=marker_horizon,
    )
