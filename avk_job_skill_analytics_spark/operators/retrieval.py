"""Lexical + hybrid retrieval over the document corpus: distributed
BM25 scoring, reciprocal-rank fusion of lexical and vector rankings,
and exact re-ranking of PQ candidate lists.

The reference's BI layer has no retrieval engine; these are the three
retrieval primitives a training-data / RAG pipeline needs at corpus
scale, composed from the engine's existing token and ANN relations:

- **BM25** (Robertson & Zaragoza, FnTIR'09 — the Okapi weighting):
  scoring is two hash aggregates over the exploded token relation
  (per-doc tf, per-term df) plus a one-row corpus-stats broadcast;
  the query-term filter pushes below the tf aggregate, so the
  shuffled relation is |docs containing a query term| rows, never the
  corpus. Per-term partial scores quantize to fixed-point BEFORE the
  per-doc sum (exact integer addition — no cross-engine float
  accumulation-order drift), the engine-exactness discipline the ADC
  and PageRank paths established.
- **RRF** (Cormack, Clarke & Buettcher, SIGIR'09): rank-only fusion,
  1/(k0+rank) folded as EXACT integer contributions
  (floor(1e6/(k0+rank)) — no floats anywhere), so hybrid
  lexical+vector retrieval needs no score calibration between
  incommensurable scales.
- **Refine** (the FAISS IndexRefine discipline; Jégou et al.
  TPAMI'11 §V.A): the compressed-domain IVF-PQ top-R candidate list
  joins back to the raw vectors — a broadcast of |Q|·R candidate ids
  against the corpus, never a corpus shuffle — and exact L2 re-ranks
  the short list, recovering most of the recall PQ compression gave
  up at the cost of R raw-vector reads per query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .exactlog import log_frac
from .similarity import ivfpq_topk
from .textstats import tokens

__all__ = ["bm25_topk", "bm25_rank", "rrf_fuse", "ivfpq_refine_topk",
           "cascade_rerank"]


def _fp(x: Column, digits: int) -> Column:
    """Round-half-up fixed-point quantization in ONE rounding —
    floor(x·10^digits + 0.5), no round() first (Spark's BigDecimal
    round vs DuckDB's float round diverge at half boundaries; the
    exactlog discipline). Quantize each float term BEFORE any
    aggregation so summation order can't matter."""
    scale = F.lit(float(10 ** digits))
    return F.floor(x * scale + F.lit(0.5)).cast("long")


def bm25_topk(docs: DataFrame, id_col: str, text_col: str,
              terms: list[str], k: int = 10, k1: str = "1.2",
              b: str = "0.75", digits: int = 4) -> DataFrame:
    """BM25 top-``k`` documents for a bag-of-words query.

    Plan shape (the scalable lexical-retrieval decomposition):

    1. one explode → per-doc token counts ``dl`` (one shuffle on id);
    2. the query-term ``isin`` filter pushes below the (doc, term)
       tf aggregate, so only matching postings shuffle;
    3. ``df`` per query term aggregates from tf (≤ |terms| rows —
       broadcast), corpus stats (N, total tokens) are a one-row
       broadcast;
    4. per-(doc, term) partial scores quantize to 10^-digits
       fixed-point, the per-doc SUM is exact integer addition, and
       the final top-k is one bounded window.

    idf is the Lucene/ATIRE variant ln((N - df + 0.5)/(df + 0.5) + 1)
    (non-negative for df ≤ N). ``k1``/``b`` are passed as STRINGS and
    cast to double on both engines (a bare 1.2 literal is DECIMAL in
    DuckDB — the known parity trap). Returns (doc_id, n_terms,
    bm25_fp, rk)."""
    toks = tokens(docs, id_col, text_col)
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("_dl"))
    tf = (
        toks.filter(F.col("term").isin(list(terms)))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    return bm25_rank(tf, dl, id_col, k=k, k1=k1, b=b, digits=digits)


def bm25_rank(tf: DataFrame, dl: DataFrame, id_col: str, k: int = 10,
              k1: str = "1.2", b: str = "0.75",
              digits: int = 4) -> DataFrame:
    """The BM25 scoring core over pre-built statistics — shared by
    the batch query (tf from a fresh explode) and stored-index
    serving (tf from committed posting partitions, where the term
    filter became a parquet pushdown). ``tf``: (id, term, _tf)
    already restricted to the query terms; ``dl``: (id, _dl) for the
    WHOLE corpus (document-length normalization needs corpus stats,
    not just matching docs)."""
    stats = dl.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_dl").alias("_tot"),
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    k1c = F.lit(k1).cast("double")
    bc = F.lit(b).cast("double")
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
    )
    # Lucene/ATIRE idf ln((N - df + 0.5)/(df + 0.5) + 1) re-spelled
    # as ONE log of one exact integer fraction (2N+2)/(2df+1) — same
    # value algebraically, but ln() now receives an identical double
    # on both engines (exactlog discipline).
    idf = log_frac(
        F.lit(2) * F.col("_n") + F.lit(2),
        F.lit(2) * F.col("_df") + F.lit(1),
    )
    # dl/avgdl written as dl * N / total — one canonical operand
    # order shared with the oracle so the doubles are bit-identical
    norm = F.col("_dl").cast("double") * F.col("_n") / F.col("_tot")
    score = (
        idf * F.col("_tf") * (k1c + F.lit(1.0))
        / (F.col("_tf") + k1c * (F.lit(1.0) - bc + bc * norm))
    )
    per_doc = (
        scored.withColumn("_s_fp", _fp(score, digits))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("_s_fp").alias("bm25_fp"),
        )
    )
    # top-k via sort+limit plans as TakeOrderedAndProject (per-partition
    # heaps, no corpus-sized single-partition window); the rank window
    # then runs over exactly k rows
    topk = per_doc.orderBy(F.desc("bm25_fp"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("bm25_fp"), F.asc(id_col))
    return topk.withColumn("rk", F.row_number().over(w)).select(
        F.col(id_col),
        F.col("n_terms").cast("long").alias("n_terms"),
        F.col("bm25_fp").cast("long").alias("bm25_fp"),
        F.col("rk").cast("long").alias("rk"),
    )


def rrf_fuse(systems: list[tuple[str, DataFrame]], id_col: str,
             k: int = 10, k0: int = 60) -> DataFrame:
    """Reciprocal-rank fusion of ranked lists: each system
    contributes floor(1e6 / (k0 + rank)) for the documents in its
    list — EXACT integer arithmetic end to end, so fusing a BM25
    integer score scale with a cosine float scale needs no
    calibration and replays bit-for-bit on any engine.

    ``systems``: [(name, frame with (id_col, rk))]. The per-doc fold
    is one union + one hash aggregate over |systems|·topn rows
    (bounded — rank lists, never corpora). Returns (doc_id,
    <name>_rk... per system, 0 = absent, rrf_fp, rk)."""
    tagged = None
    for name, frame in systems:
        t = frame.select(
            F.col(id_col),
            F.lit(name).alias("_sys"),
            F.col("rk").cast("long").alias("_rk"),
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    contrib = F.floor(F.lit(1_000_000) / (F.lit(int(k0)) + F.col("_rk")))
    per_doc = tagged.groupBy(id_col).agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("_sys") == name, F.col("_rk"))),
                F.lit(0),
            ).cast("long").alias(f"{name}_rk")
            for name, _ in systems
        ],
        F.sum(contrib).cast("long").alias("rrf_fp"),
    )
    # fused candidates are already bounded (|systems|·topn), but the
    # same sort+limit-then-rank shape keeps the plan window-free until
    # exactly k rows remain
    topk = per_doc.orderBy(F.desc("rrf_fp"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("rrf_fp"), F.asc(id_col))
    return topk.withColumn(
        "rk", F.row_number().over(w).cast("long")
    )


def ivfpq_refine_topk(corpus: DataFrame, queries: DataFrame,
                      id_col: str, vec_col: str, k: int = 5,
                      r: int = 20, n_cells: int = 8, n_probe: int = 2,
                      m: int = 8, sub_d: int = 8, k_star: int = 8,
                      round_digits: int = 6) -> DataFrame:
    """Two-stage retrieval: IVF-PQ integer ADC proposes the top-``r``
    candidates per query from the compressed domain, then the short
    list joins back to the RAW vectors for an exact L2 re-rank of the
    top-``k`` — the refine stage that recovers the recall PQ
    compression gave up, at r raw-vector reads per query instead of a
    corpus scan.

    Scale shape: the candidate list (|Q|·r rows of ids) BROADCASTS
    against the corpus — the raw-vector fetch is a broadcast
    semi-join, never a corpus shuffle — and the exact distance reuses
    the ADC fixed-point convention (single-rounding: floor(d·1e6 + 0.5)) so
    ranking is engine-exact. Returns (query_id, neighbor_id, dist_fp,
    rk)."""
    cand = ivfpq_topk(
        corpus, queries, id_col, vec_col, k=r, n_cells=n_cells,
        n_probe=n_probe, m=m, sub_d=sub_d, k_star=k_star,
        round_digits=round_digits,
    ).select("query_id", "neighbor_id")
    raw = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
    )
    sq = F.aggregate(
        F.zip_with(
            F.col("_qv"), F.col("_cv"),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    exact = (
        raw.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn(
            "dist_fp",
            F.floor(
                sq * F.lit(1_000_000.0) + F.lit(0.5)
            ).cast("long"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("dist_fp"), F.asc("neighbor_id")
    )
    return (
        exact.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "dist_fp",
                F.col("rk").cast("long").alias("rk"))
    )


def cascade_rerank(docs: DataFrame, embeddings: DataFrame,
                   doc_id_col: str, text_col: str, vec_id_col: str,
                   vec_col: str, terms: list[str], query_vec: DataFrame,
                   n_candidates: int = 50, k: int = 10,
                   round_digits: int = 6) -> DataFrame:
    """Two-stage cascade retrieval: cheap lexical candidate
    generation, expensive vector scoring on the short list only — the
    canonical serving topology when the exact scorer is too costly to
    run corpus-wide (the candidate-generation / reranking split of
    every production retrieval stack).

    Stage 1 is :func:`bm25_topk` (top ``n_candidates`` — postings of
    the query terms are the only corpus rows that shuffle). Stage 2
    joins the BOUNDED candidate list (broadcast) to its raw vectors
    and exact-cosine re-ranks against the single broadcast query
    vector, so the expensive dot products number ``n_candidates``,
    not |corpus|. Returns (doc_id, bm25_fp, lex_rk, cosine, rk).

    ``query_vec`` is a 1-row (id, vec) frame; at 100 TB the stage-2
    vector fetch is an id-equi-join against the vector store's
    bucketed layout — still |candidates| reads."""
    cand = bm25_topk(docs, doc_id_col, text_col, terms,
                     k=n_candidates)
    qv = query_vec.select(F.col(vec_col).alias("_qv"))
    vecs = embeddings.select(
        F.col(vec_id_col).alias("doc_id"),
        F.col(vec_col).alias("_cv"),
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("_qv"), F.col("_cv"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.col(c), F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    ))
    scored = (
        vecs.join(F.broadcast(cand), "doc_id")
        .crossJoin(F.broadcast(qv))
        .withColumn("cosine",
                    F.round(dot / (nrm("_qv") * nrm("_cv")),
                            round_digits))
    )
    w = Window.orderBy(F.desc("cosine"), F.asc("doc_id"))
    return (
        scored.withColumnRenamed("rk", "lex_rk")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", "bm25_fp",
                F.col("lex_rk").cast("long").alias("lex_rk"),
                "cosine", F.col("rk").cast("long").alias("rk"))
    )
