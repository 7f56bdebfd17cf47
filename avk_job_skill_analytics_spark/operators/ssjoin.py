"""Exact set-similarity self-join with prefix filtering (AllPairs /
PPJoin family: Bayardo, Ma & Srikant, WWW'07; Xiao, Wang, Lin & Yu,
WWW'08).

The engine's LSH family (operators/dedup.py) finds near-duplicates
probabilistically — banded MinHash admits false negatives by design.
This module is the EXACT counterpart for a Jaccard threshold ``t``:
every pair at or above the threshold is guaranteed to be produced,
with the prefix filter doing the pruning work LSH banding does, but
losslessly:

- order each document's tokens by ascending GLOBAL document
  frequency (rarest token first, ties by term): the ordering key is
  the (df, term) pair itself, joined from the vocabulary relation —
  no global integer rank is ever materialized, so there is no
  single-partition vocabulary sort anywhere in the plan;
- a set x with |x| tokens can only reach Jaccard ``t`` with a set
  sharing at least one of x's first ``|x| - ceil(t*|x|) + 1`` tokens
  in that global order (the prefix-filter principle), so only the
  PREFIX postings — dominated by rare tokens with short posting
  lists — are self-joined;
- the size filter ``min(|x|,|y|) >= t * max(|x|,|y|)`` (a Jaccard
  necessary condition) prunes candidates before verification;
- verification counts the exact intersection only for surviving
  candidate pairs (semi-join pruned token join).

All threshold arithmetic is exact-integer: ``t`` is a rational
``t_num/t_den`` so ``ceil(t*n)`` is ``(t_num*n + t_den - 1) div
t_den`` on both engines, and the emitted Jaccard is the fixed-point
``floor(1e6 * inter / union)``.

Scale notes (100 TB): the only corpus-wide shuffles are the distinct
tokenization, the df join on ``term`` (well-distributed by
construction), one groupBy(id) that materializes each document as its
(df, term)-sorted term array (bounded by document length, never
global), and the prefix-token self-join, whose input is the prefix
postings (a ``1 - t`` fraction of each document's tokens, and the
globally rarest ones at that). Verification is a map-side
array_intersect over the already-materialized doc arrays — no
token-level equijoin, so no hot-term blowup in the verify stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["prefix_filter_pairs"]


def prefix_filter_pairs(sets: DataFrame, id_col: str,
                        term_col: str = "term",
                        t_num: int = 1, t_den: int = 2) -> DataFrame:
    """All pairs of set ids with Jaccard >= t_num/t_den over a
    DISTINCT (id, term) set relation — tokens, shingles, skills, or
    any other set elements the caller already materialized.

    Returns (id_a, id_b, inter, uni, jacc_fp) with id_a < id_b —
    ``inter``/``uni`` the exact intersection/union sizes and
    ``jacc_fp`` the 1e-6 fixed-point Jaccard. EXACT: no false
    negatives (unlike the MinHash-LSH path), the prefix filter only
    prunes pairs that provably cannot reach the threshold."""
    toks = sets.select(F.col(id_col), F.col(term_col).alias("term"))

    # global rarity ORDER comes from the (df, term) key pair itself —
    # joined per token, never materialized as a single-partition rank
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    ranked = toks.join(vocab, "term")
    # ONE groupBy materializes each document as its (df, term)-sorted
    # term array: the size, the prefix slice, AND both verification
    # sides all project from this frame, replacing the former
    # sizes-aggregate + join + per-doc row_number window + token-level
    # verification equijoin + groupBy (four extra exchanges, and the
    # verify join's hot-term blowup) — measured 8.7 s -> 2.0 s warm at
    # sf0.1, byte-identical output. array_sort on the struct orders by
    # (_df, term) ascending, exactly the window's (asc _df, asc term);
    # (df, term) pairs are unique within a doc, so positions agree.
    arr = (
        ranked.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("_df", "term"))
            ).alias("_a")
        )
        .select(
            F.col(id_col),
            F.transform("_a", lambda x: x.getField("term"))
            .alias("_terms"),
        )
        .withColumn("_n", F.size("_terms"))
    )
    from ..plans.session import scratch_persist

    arr = scratch_persist(arr)
    # prefix length p = n - ceil(t*n) + 1, ceil in exact integers
    ceil_tn = F.floor(
        (F.lit(t_num) * F.col("_n") + F.lit(t_den - 1)) / F.lit(t_den)
    )
    plen = (F.col("_n") - ceil_tn + F.lit(1)).cast("int")
    pref = (
        arr.select(
            F.col(id_col), F.col("_n"),
            F.posexplode(F.slice("_terms", F.lit(1), plen))
            .alias("_p0", "term"),
        )
        .select(
            id_col, "term", "_n",
            (F.col("_p0") + 1).alias("_pos"),
        )
    )

    a = pref.select(
        F.col(id_col).alias("id_a"), "term",
        F.col("_n").alias("_na"), F.col("_pos").alias("_pa"),
    )
    b = pref.select(
        F.col(id_col).alias("id_b"), "term",
        F.col("_n").alias("_nb"), F.col("_pos").alias("_pb"),
    )
    # required overlap α = ceil(t/(1+t)·(na+nb)) in exact integers
    alpha = F.floor(
        (F.lit(t_num) * (F.col("_na") + F.col("_nb"))
         + F.lit(t_num + t_den - 1))
        / F.lit(t_num + t_den)
    )
    cand = (
        a.join(b, "term")
        .filter(F.col("id_a") < F.col("id_b"))
        # size filter: min >= t * max, exact integers
        .filter(
            F.least("_na", "_nb") * F.lit(t_den)
            >= F.lit(t_num) * F.greatest("_na", "_nb")
        )
        # positional filter (PPJoin, Xiao et al. WWW'08 §3): with the
        # shared token at sorted position p, the overlap can't exceed
        # the shorter remaining suffix + 1 — prune pairs whose bound
        # is already below the required α (lossless: the bound is an
        # upper bound on the true intersection)
        .filter(
            F.least(
                F.col("_na") - F.col("_pa"),
                F.col("_nb") - F.col("_pb"),
            ) + F.lit(1) >= alpha
        )
        .select("id_a", "id_b")
        .distinct()
    )

    # exact verification on the surviving candidates only: the sorted
    # term arrays are already materialized per doc, so the exact
    # intersection is a map-side array_intersect — no token-level
    # equijoin, no per-pair groupBy
    va = arr.select(F.col(id_col).alias("id_a"),
                    F.col("_terms").alias("_ta"),
                    F.col("_n").alias("_na"))
    vb = arr.select(F.col(id_col).alias("id_b"),
                    F.col("_terms").alias("_tb"),
                    F.col("_n").alias("_nb"))
    inter = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a", "id_b", "_na", "_nb",
            F.size(F.array_intersect("_ta", "_tb")).alias("inter"),
        )
    )
    uni = F.col("_na") + F.col("_nb") - F.col("inter")
    return (
        inter.filter(
            F.col("inter") * F.lit(t_den) >= F.lit(t_num) * uni
        )
        .select(
            "id_a",
            "id_b",
            F.col("inter").cast("long").alias("inter"),
            uni.cast("long").alias("uni"),
            F.floor(F.lit(1_000_000) * F.col("inter") / uni)
            .cast("long")
            .alias("jacc_fp"),
        )
    )
