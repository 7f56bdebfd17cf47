"""Growing lexical (BM25) index maintenance on a document stream —
the fourth instantiation of the shared exactly-once commit protocol
(streaming/fsio: LSH bands/sets, IVF-PQ cells, the raw-arrivals log,
now term postings).

A stored lexical index is two tables under one root, both plain
``batch=<id>``-partitioned parquet on any Hadoop filesystem:

- ``postings/batch=<id>``: (doc_id, term, tf) — each arriving
  document's term frequencies, written once per micro-batch;
- ``doclen/batch=<id>``: (doc_id, dl) — the per-document token
  counts the BM25 length normalization needs corpus-wide.

Appends are per-batch overwrite directories committed by the
``_batch_<id>`` marker (a redelivered batch rewrites identical rows
and converges; a clean replay short-circuits); compaction folds
committed batches into a negative generation under the journaled,
rename-free, tombstone-graced protocol — identical semantics to the
LSH/IVF-PQ indexes because it IS the same code.

Serving (:func:`serve_bm25`) reads ONLY committed partitions, pushes
the query-term predicate into the postings scan (parquet row-group
pruning on the sorted term column), and hands the statistics to the
same ``retrieval.bm25_rank`` core the batch query uses — so a drained
stream's served ranking hash-matches the one-shot batch BM25 over the
same documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .batched_index import spread_batch

from ..operators.retrieval import bm25_rank
from ..operators.textstats import tokens
from .fsio import (
    IndexFS,
    committed_batch_ids,
    ensure_protocol,
    legacy_overlay_ids,
    recover_compaction,
)


def _legacy_probes(fs):
    """(legacy_gen_probe, batch_dir_probe) for this layout."""
    return (
        lambda: fs.is_dir("postings/batch=-1"),
        lambda b: fs.is_dir(f"postings/batch={b}"),
    )

__all__ = [
    "foreach_batch_bm25_maintain",
    "serve_bm25",
    "compact_bm25_index",
]

_TABLES = ("postings", "doclen")


def _delete_bm25_batches(fs, bs: list[str]) -> None:
    """Layout callback for the shared commit protocol: each batch's
    rows live in one ``batch=<b>`` directory per table."""
    for table in _TABLES:
        for b in bs:
            fs.delete(f"{table}/batch={b}")


def _committed_dirs(fs, table: str, committed: set[str]) -> list[str]:
    return [
        fs.uri(f"{table}/{name}")
        for name in fs.listdir(table)
        if name.startswith("batch=")
        and name.split("=", 1)[1] in committed
    ]


def _bm25_maintain_batch_fn(index_dir: str, id_col: str, text_col: str,
                            compact_every: int | None = None):
    """The per-batch maintenance body, exposed for redelivery tests.
    Per trigger: one explode over the ARRIVALS only → their (doc,
    term, tf) postings and (doc, dl) lengths land in per-batch
    overwrite directories, the marker commits them. O(arrivals) per
    trigger; the index is never rewritten (compaction amortizes)."""

    def sink(bdf: DataFrame, batch_id: int) -> None:
        spark = bdf.sparkSession
        fs = IndexFS(spark, index_dir)
        if fs.exists(f"_batch_{batch_id}"):
            return
        ensure_protocol(fs, *_legacy_probes(fs))
        recover_compaction(fs, _delete_bm25_batches)
        toks = tokens(
            spread_batch(bdf), id_col, text_col
        ).localCheckpoint()
        tf = toks.groupBy(id_col, "term").agg(
            F.count(F.lit(1)).alias("_tf")
        )
        dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("_dl"))
        # term-sorted postings: serving's isin(term) predicate prunes
        # parquet row groups instead of decoding every posting.
        # sortWithinPartitions, not a global sort: row-group pruning
        # only needs tight per-row-group term ranges (each output
        # FILE sorted), and the global sort paid a range-sampling job
        # plus a rangepartitioning exchange per micro-batch for
        # cross-file ordering nothing reads (guide §2.4 — the
        # compactor re-clusters the generation the same way)
        tf.sortWithinPartitions("term").write.mode("overwrite").parquet(
            fs.uri(f"postings/batch={batch_id}")
        )
        dl.write.mode("overwrite").parquet(
            fs.uri(f"doclen/batch={batch_id}")
        )
        fs.touch(f"_batch_{batch_id}")
        if compact_every:
            committed_now = committed_batch_ids(fs) | {str(batch_id)}
            n_real = sum(
                1
                for name in fs.listdir("postings")
                if name.startswith("batch=")
                and not name.startswith("batch=-")
                and name.split("=", 1)[1] in committed_now
            )
            if n_real >= compact_every:
                compact_bm25_index(spark, index_dir)

    return sink


def foreach_batch_bm25_maintain(stream: DataFrame, index_dir: str,
                                id_col: str, text_col: str,
                                compact_every: int | None = None
                                ) -> "object":
    """Maintain the stored BM25 index from a document stream: each
    micro-batch's postings and lengths append exactly once;
    ``compact_every`` bounds the partition count with the sink's own
    journaled compaction trigger. Serving picks the new documents up
    on its next committed-set resolution — no index rebuild."""
    sink = _bm25_maintain_batch_fn(index_dir, id_col, text_col,
                                   compact_every=compact_every)
    return stream.writeStream.foreachBatch(sink)


def serve_bm25(spark, index_dir: str, terms: list[str], id_col: str,
               k: int = 10, k1: str = "1.2", b: str = "0.75",
               digits: int = 4) -> DataFrame:
    """BM25 top-k FROM the stored index: committed postings
    partitions only (marker/journal overlay — a half-written append
    is invisible), the query-term filter pushed into the parquet scan,
    and the shared ``bm25_rank`` scoring core — hash-identical to the
    batch BM25 over the same committed documents."""
    fs = IndexFS(spark, index_dir)
    # pre-v2 compat, READ-ONLY: overlay a legacy sentinel into this
    # read's committed view (serving must not write to the root)
    committed = committed_batch_ids(fs) | legacy_overlay_ids(
        fs, *_legacy_probes(fs)
    )
    p_dirs = _committed_dirs(fs, "postings", committed)
    d_dirs = _committed_dirs(fs, "doclen", committed)
    if not p_dirs:
        return spark.createDataFrame(
            [], f"{id_col} long, n_terms long, bm25_fp long, rk long"
        )
    tf = (
        spark.read.parquet(*p_dirs)
        .filter(F.col("term").isin(list(terms)))
        .select(id_col, "term", "_tf")
    )
    dl = spark.read.parquet(*d_dirs).select(id_col, "_dl")
    return bm25_rank(tf, dl, id_col, k=k, k1=k1, b=b, digits=digits)


def compact_bm25_index(spark, index_dir: str, buckets: int = 1,
                       marker_horizon: int = 1000) -> dict:
    """Fold the committed per-batch posting/length directories into
    one fresh negative generation per table — the same journaled,
    rename-free, tombstone-graced protocol as the LSH and IVF-PQ
    compactors (fsio module docstring), with the generation's
    postings re-sorted on term so serving keeps its row-group
    pruning. Returns {'postings_files_before', 'postings_files_after',
    'rows'}. The cutover body is the layout-generic
    ``batched_index.compact_batched_index`` (postings via a CALLABLE
    layout for the sortWithinPartitions, doclen plain)."""
    from .batched_index import compact_batched_index

    stats = compact_batched_index(
        spark, index_dir,
        {
            "postings": lambda df, b:
                df.repartition(b).sortWithinPartitions("term"),
            "doclen": None,
        },
        buckets=buckets, marker_horizon=marker_horizon,
    )
    return {
        "postings_files_before": stats["files_before"],
        "postings_files_after": stats["files_after"],
        "rows": stats["rows"],
    }
