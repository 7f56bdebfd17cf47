"""Distributed multinomial Naive Bayes — train AND serve as pure
aggregations over the token relation, engine-exact end to end.

The quality/language classifier every curation pipeline eventually
needs (fastText-style filtering à la CCNet/Gopher pipelines), done
Spark-first: training is two hash aggregates (per-(term, class)
counts + class totals), the model is a per-term weight table, and
scoring is one join + one exact integer sum per document. No
iterative optimization, no Python UDFs, no driver-side data.

Engine-exactness: every count is an exact integer; each term's
log-likelihood-ratio weight is ONE log of an exact integer fraction
(Laplace-smoothed), quantized to 10^-6 fixed point BEFORE any
aggregation — so document scores are exact integer sums and the
DuckDB oracle replays them bit-for-bit (the PMI / unigram-LM
discipline).

Scale: the weight table is |vocab| rows — a well-distributed shuffle
join on ``term`` against the token relation (broadcast it when the
vocabulary fits, which a word-level vocab usually does); nothing else
shuffles beyond the two training aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .exactlog import as_dec, log_fp
from .textstats import tokens

__all__ = ["nb_train_weights", "nb_score", "nb_prior_fp"]


def _llr_fp(num_a, den_a, num_b, den_b):
    """fp6 of ln((num_a/den_a) / (num_b/den_b)) as ONE log of one
    exact integer fraction — cross-multiplied so both engines feed
    libm the identical double (exactlog discipline; decimal carriers
    keep 1e12-scale token counts from wrapping the cross products)."""
    return log_fp(
        as_dec(num_a) * as_dec(den_b), as_dec(num_b) * as_dec(den_a)
    )


def nb_train_weights(docs: DataFrame, id_col: str, text_col: str,
                     label_col: str) -> DataFrame:
    """Train the binary multinomial NB model: per-term fixed-point
    log-likelihood-ratio weights w(t) = ln(P(t|pos) / P(t|neg)) with
    add-one smoothing over the shared vocabulary. ``label_col`` must
    be 0/1. Returns (term, w_fp) — the whole model is this table plus
    the prior from :func:`nb_score`'s stats aggregate."""
    toks = tokens(docs, id_col, text_col).join(
        docs.select(F.col(id_col), F.col(label_col).alias("_y")), id_col
    )
    cnt = toks.groupBy("term").agg(
        F.sum(F.col("_y")).alias("_c1"),
        F.sum(F.lit(1) - F.col("_y")).alias("_c0"),
    )
    tot = toks.agg(
        F.sum(F.col("_y")).alias("_t1"),
        F.sum(F.lit(1) - F.col("_y")).alias("_t0"),
        F.countDistinct("term").alias("_v"),
    )
    return cnt.crossJoin(F.broadcast(tot)).select(
        "term",
        _llr_fp(
            F.col("_c1") + F.lit(1), F.col("_t1") + F.col("_v"),
            F.col("_c0") + F.lit(1), F.col("_t0") + F.col("_v"),
        ).alias("w_fp"),
    )


def nb_prior_fp(docs: DataFrame, label_col: str) -> int:
    """The model's class-prior term as one fixed-point integer —
    compute it ONCE on the training corpus and freeze it alongside
    the weight table (scoring a stream with a per-batch prior would
    make the gate drift with arrival mix, not with content)."""
    row = docs.agg(
        F.sum(F.col(label_col)).alias("_n1"),
        F.sum(F.lit(1) - F.col(label_col)).alias("_n0"),
    ).select(
        _llr_fp(F.col("_n1"), F.lit(1), F.col("_n0"), F.lit(1))
        .alias("_p")
    ).collect()[0]
    return int(row["_p"])


def nb_score(docs: DataFrame, weights: DataFrame, id_col: str,
             text_col: str, label_col: str,
             prior_fp: int | None = None) -> DataFrame:
    """Score every document under the trained model: score(d) =
    prior_fp + Σ_t tf(d, t)·w_fp(t) — one (doc, term) aggregate, one
    join on term, one exact integer sum. ``prior_fp`` freezes the
    prior (serving a stream with the training-corpus prior); None
    computes it from ``docs`` (train-equals-score corpora). Returns
    (doc_id, score_fp, pred, actual) with pred = score > 0."""
    tf = tokens(docs, id_col, text_col).groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("_tf")
    )
    if prior_fp is None:
        prior = docs.agg(
            F.sum(F.col(label_col)).alias("_n1"),
            F.sum(F.lit(1) - F.col(label_col)).alias("_n0"),
        ).select(_llr_fp(F.col("_n1"), F.lit(1), F.col("_n0"),
                         F.lit(1)).alias("_prior_fp"))
    else:
        prior = docs.sparkSession.range(1).select(
            F.lit(int(prior_fp)).cast("long").alias("_prior_fp")
        )
    # LEFT joins end to end: an out-of-vocabulary term contributes 0
    # (no evidence), and a document with NO matching terms — or no
    # tokens at all — scores prior-only instead of silently vanishing
    # from the gate (a gate that neither passes nor rejects an
    # arrival under-counts it)
    term_scores = (
        tf.join(weights, "term", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("_tf") * F.coalesce(F.col("w_fp"), F.lit(0)))
            .alias("_s")
        )
    )
    return (
        docs.select(F.col(id_col),
                    F.col(label_col).cast("long").alias("actual"))
        .join(term_scores, id_col, "left")
        .crossJoin(F.broadcast(prior))
        .select(
            F.col(id_col),
            (F.coalesce(F.col("_s"), F.lit(0)) + F.col("_prior_fp"))
            .cast("long").alias("score_fp"),
            "actual",
        )
        .select(
            id_col,
            "score_fp",
            (F.col("score_fp") > 0).cast("long").alias("pred"),
            "actual",
        )
    )
