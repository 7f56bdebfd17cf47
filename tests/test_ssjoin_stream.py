"""Crash-window and exactness tests for the streaming EXACT
prefix-postings index (streaming/ssjoin_stream) — the same discipline
the LSH maintenance suite locks: redelivery neither duplicates index
rows nor re-emits pairs, a pre-marker crash replays identically, and
compaction preserves behavior through the shared journaled
protocol."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from avk_job_skill_analytics_spark.streaming.batched_index import (
    committed_table_dirs,
)
from avk_job_skill_analytics_spark.streaming.fsio import IndexFS
from avk_job_skill_analytics_spark.streaming.ssjoin_stream import (
    _ssjoin_maintain_batch_fn,
    compact_ssjoin_index,
    signed_sets,
)

T1 = "the quick brown fox jumps over the lazy dog again and again"
T1B = "the quick brown fox jumps over the lazy dog again and AGAIN"
T2 = "unrelated words entirely about other topics and nothing more"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(spark, d):
    return {
        (r["id_a"], r["id_b"])
        for r in spark.read.parquet(f"{d}/pairs").collect()
    }


def test_signed_sets_prefix_length(spark):
    """prefix length = n - ceil(t*n) + 1 over the hash-sorted set,
    and the prefix is a prefix of the sorted set."""
    out = signed_sets(
        _df(spark, [(1, T1)]), "doc_id", "text", 3, 1, 2
    ).collect()[0]
    n = out["_n"]
    assert n == len(set(out["_sh"])) == len(out["_sh"])
    assert out["_sh"] == sorted(out["_sh"])
    assert len(out["_pref"]) == n - (n + 1) // 2 + 1
    assert out["_pref"] == out["_sh"][: len(out["_pref"])]


def test_ssjoin_maintain_detects_cross_batch_pair(spark, tmp_path):
    d = str(tmp_path / "idx")
    os.makedirs(d)
    sink = _ssjoin_maintain_batch_fn(d, "doc_id", "text", 3, 1, 2)
    sink(_df(spark, [(1, T1), (2, T2)]), 0)
    # empty index + no similar co-arrivals: no pairs
    assert _pairs(spark, d) == set()
    sink(_df(spark, [(3, T1B)]), 1)
    assert _pairs(spark, d) == {(1, 3)}
    # exact values: verify inter/uni against python sets of shingles
    sh = lambda t: {                        # noqa: E731
        " ".join(t.split()[i:i + 3])
        for i in range(len(t.split()) - 2)
    }
    inter = len(sh(T1) & sh(T1B))
    uni = len(sh(T1) | sh(T1B))
    row = spark.read.parquet(f"{d}/pairs").filter(
        F.col("id_a") == 1
    ).collect()[0]
    assert (row["inter"], row["uni"]) == (inter, uni)
    assert row["jacc_fp"] == 1_000_000 * inter // uni


def test_ssjoin_redelivery_is_exactly_once(spark, tmp_path):
    d = str(tmp_path / "idx")
    os.makedirs(d)
    fs = IndexFS(spark, d)
    sink = _ssjoin_maintain_batch_fn(d, "doc_id", "text", 3, 1, 2)
    sink(_df(spark, [(1, T1)]), 0)
    sink(_df(spark, [(3, T1B)]), 1)

    def idx_rows():
        return sorted(
            map(tuple,
                spark.read.parquet(*committed_table_dirs(fs, "postings"))
                .collect())
        )

    before = idx_rows()
    pairs_before = _pairs(spark, d)
    sink(_df(spark, [(1, T1)]), 0)          # clean replay: marker skip
    sink(_df(spark, [(3, T1B)]), 1)
    assert idx_rows() == before
    assert _pairs(spark, d) == pairs_before == {(1, 3)}


def test_ssjoin_crash_before_marker_replays_identically(spark, tmp_path):
    """Artifacts written, marker lost: the redelivered batch must not
    see its own half-written dirs (candidates come from the batch
    self-join + COMMITTED postings only) and must converge to the
    crash-free result."""
    d = str(tmp_path / "idx")
    os.makedirs(d)
    fs = IndexFS(spark, d)
    sink = _ssjoin_maintain_batch_fn(d, "doc_id", "text", 3, 1, 2)
    sink(_df(spark, [(1, T1)]), 0)
    # batch 1 carries an intra-batch near-dup pair (3, 4):
    # co-arriving duplicates pair INSIDE their own batch (self-join
    # of the batch's prefix postings — crawl/replay bursts are the
    # common case), and a marker-loss replay recomputes the identical
    # pair set, which overwrites itself
    sink(_df(spark, [(3, T1B), (4, T1B + " x")]), 1)
    fs.delete("_batch_1")                   # simulate marker loss
    sink(_df(spark, [(3, T1B), (4, T1B + " x")]), 1)
    got = _pairs(spark, d)
    assert got == {(1, 3), (1, 4), (3, 4)}
    assert fs.exists("_batch_1")


def test_ssjoin_compaction_preserves_behavior(spark, tmp_path):
    d = str(tmp_path / "idx")
    os.makedirs(d)
    fs = IndexFS(spark, d)
    sink = _ssjoin_maintain_batch_fn(d, "doc_id", "text", 3, 1, 2)
    sink(_df(spark, [(1, T1)]), 0)
    sink(_df(spark, [(2, T2)]), 1)

    def rows():
        return sorted(
            map(tuple,
                spark.read.parquet(*committed_table_dirs(fs, "postings"))
                .collect())
        )

    before = rows()
    stats = compact_ssjoin_index(spark, d)
    assert stats["files_after"] <= stats["files_before"]
    assert rows() == before
    # tombstone grace: consumed dirs survive one cycle on disk
    assert os.path.exists(f"{d}/postings/batch=0")
    # redelivered pre-compaction batch still short-circuits
    sink(_df(spark, [(1, T1)]), 0)
    assert rows() == before
    # a genuinely new batch appends and collides with compacted rows
    sink(_df(spark, [(31, T1B)]), 2)
    assert (1, 31) in _pairs(spark, d)


def test_ssjoin_auto_compaction_bounds_files(spark, tmp_path):
    d = str(tmp_path / "idx")
    os.makedirs(d)
    fs = IndexFS(spark, d)
    sink = _ssjoin_maintain_batch_fn(
        d, "doc_id", "text", 3, 1, 2, compact_every=2
    )
    for b in range(6):
        sink(_df(spark, [(100 + b, T1 + f" v{b}")]), b)
    # every 2nd real batch folds into a generation, so the committed
    # VIEW (what a reader actually lists — consumed dirs are excluded
    # even through their tombstone grace) never accumulates real
    # batch directories beyond the trigger threshold
    view = committed_table_dirs(fs, "postings")
    real_in_view = [p for p in view if "batch=-" not in p]
    gens_in_view = [p for p in view if "batch=-" in p]
    assert len(real_in_view) <= 2, view
    assert gens_in_view, view
    # and the near-dup chain was still detected across generations
    assert len(_pairs(spark, d)) >= 5
