"""Entity resolution / record linkage, Spark-first.

The classic large-scale linkage pipeline (Fellegi & Sunter, "A Theory
for Record Linkage", JASA 1969; Christen, "Data Matching", 2012):

1. **Blocking** — never score all n^2 pairs. Records are grouped by a
   cheap deterministic key (here: ``(nation, last-3-digits-of-name)``)
   and only within-block pairs are generated. One shuffle on the block
   key; the self-join is co-partitioned, so no data moves twice.
2. **Skew guard** — a real registry always has a junk block (empty
   names, a default city). Blocks larger than ``max_block`` are dropped
   *before* the pair join, bounding worst-case pair fan-out at
   ``max_block^2 / 2`` per block regardless of input skew — the same
   cap discipline as dedup.candidate_pairs' LSH buckets.
3. **Scoring** — Fellegi-Sunter agreement weights. Each field
   comparison contributes a fixed integer weight (scaled
   ``log2(m/u)`` of that field's match/unmatch probabilities,
   precomputed driver-side); the pair's score is their sum, so the
   whole step is pure Column arithmetic inside whole-stage codegen —
   no UDF, no shuffle beyond the blocking join itself.
4. **Clustering** — accepted pairs form a graph; connected components
   (graph.connected_components_twostar, O(log n) rounds) assign each
   record a canonical ``entity_id`` = min rec_id of its component.
5. **Survivorship** — one grouped aggregation folds each entity's
   records into a golden record with per-field merge rules.

Reference parity note: the reference engine has no linkage operator —
this family belongs to the beyond-reference training-data toolbox
(linking job records across boards is the job-analytics version of
the problem; SURVEY.md §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import graph
from .exactlog import as_dec

# Fellegi-Sunter agreement / disagreement weights (scaled integer
# log2(m/u) ratios, precomputed so Spark and the SQL oracle share the
# exact constants).  Field order: identifier digits, account balance,
# market segment.
W_ID_AGREE, W_ID_DISAGREE = 28, -8
W_BAL_AGREE, W_BAL_DISAGREE = 12, -6
W_SEG_AGREE, W_SEG_DISAGREE = 8, -10
THRESH_MATCH = 30   # score >= -> match
THRESH_POSSIBLE = 10  # score in [possible, match) -> clerical review


# the blocking key's digit width resolves to the historical 3 at
# every verified ledger scale and widens one digit per decade past
# ~200K records — pinned by exact INTEGER threshold comparisons so
# both engines pick the same width at every count (no libm log10 at
# a power-of-10 boundary can flip it).
_BLOCK_NATIONS = 25
_BLOCK_TARGET = 8
_BLOCK_BASE_DIGITS = 3
_BLOCK_MAX_DIGITS = 8


def adaptive_block_digits(n_recs: int) -> int:
    """Blocking-key digit width that holds expected block population
    ~flat as the registry grows. A FIXED right-3 key is a bounded
    space of 1000 cells per nation — at a 100x registry every cell
    carries 100x the records, the census cap rightfully drops ALL of
    them, and candidate generation silently degenerates to zero
    pairs (the sf10 probe's finding; the same bounded-key-space
    class as fixed LSH bands and 4x16 Hamming bands). One extra
    digit per decade of growth keeps expected block size constant;
    the census cap still bounds the worst case."""
    d = _BLOCK_BASE_DIGITS
    for k in range(_BLOCK_BASE_DIGITS, _BLOCK_MAX_DIGITS):
        if n_recs > _BLOCK_NATIONS * _BLOCK_TARGET * 10 ** k:
            d += 1
    return d


def block_key(name_col: str = "name", nation_col: str = "nation",
              digits: int = _BLOCK_BASE_DIGITS):
    """(nation, last-``digits`` of the trailing digit run) — cheap,
    deterministic, survives the case/prefix perturbations that break
    exact-name matching, and spreads uniformly (the digits are the
    entity's serial number). ``digits`` is the scale lever
    (:func:`adaptive_block_digits`)."""
    tail = F.regexp_extract(F.col(name_col), r"([0-9]+)$", 1)
    return (F.col(nation_col),
            F.substring(tail, -digits, digits).alias("blk"))


def candidate_pairs_blocked(recs: DataFrame, max_block: int = 16,
                            digits: int = _BLOCK_BASE_DIGITS,
                            ) -> DataFrame:
    """Within-block candidate pairs with both sides' attributes.

    Census first (one hash-agg on the block key), oversized blocks
    dropped, then the self-join on the same key — Catalyst plans
    census + both join sides into one shuffle of the block key, and
    the pair count is bounded by ``n_blocks * max_block^2 / 2``.
    """
    nation, blk = block_key(digits=digits)
    keyed = recs.withColumn("blk", blk)
    census = keyed.groupBy("nation", "blk").agg(
        F.count(F.lit(1)).alias("blk_n")
    )
    bounded = keyed.join(
        census.filter(F.col("blk_n") <= max_block), ["nation", "blk"]
    )
    a = bounded.select(
        "nation", "blk", "blk_n",
        *[F.col(c).alias(f"a_{c}") for c in
          ("rec_id", "src", "name", "acctbal", "segment")],
    )
    b = bounded.select(
        "nation", "blk",
        *[F.col(c).alias(f"b_{c}") for c in
          ("rec_id", "src", "name", "acctbal", "segment")],
    )
    return a.join(b, ["nation", "blk"]).filter(
        F.col("a_rec_id") < F.col("b_rec_id")
    )


def fs_score(pairs: DataFrame) -> DataFrame:
    """Fellegi-Sunter integer score + decision for each candidate pair.

    Field comparisons:
    - identifier digits equal (the trailing digit run of the name) —
      the strong identifier;
    - account balance within 0.5 — a tolerant numeric agreement;
    - market segment equal, with NULL on either side contributing 0
      (an absent value is evidence of nothing, per Fellegi-Sunter's
      missing-at-random treatment).
    """
    dig = lambda c: F.regexp_extract(F.col(c), r"([0-9]+)$", 1)  # noqa: E731
    id_w = F.when(dig("a_name") == dig("b_name"), F.lit(W_ID_AGREE)) \
        .otherwise(F.lit(W_ID_DISAGREE))
    bal_w = F.when(
        F.abs(F.col("a_acctbal") - F.col("b_acctbal")) <= 0.5,
        F.lit(W_BAL_AGREE),
    ).otherwise(F.lit(W_BAL_DISAGREE))
    seg_w = F.when(
        F.col("a_segment").isNull() | F.col("b_segment").isNull(), F.lit(0)
    ).when(F.col("a_segment") == F.col("b_segment"), F.lit(W_SEG_AGREE)) \
        .otherwise(F.lit(W_SEG_DISAGREE))
    scored = pairs.withColumn(
        "score", (id_w + bal_w + seg_w).cast("long")
    )
    return scored.withColumn(
        "decision",
        F.when(F.col("score") >= THRESH_MATCH, F.lit("match"))
        .when(F.col("score") >= THRESH_POSSIBLE, F.lit("possible"))
        .otherwise(F.lit("nonmatch")),
    )


def resolve_entities(recs: DataFrame, matches: DataFrame) -> DataFrame:
    """Canonical entity id per record: connected components over the
    accepted pairs (two-star, O(log n) rounds), then every unmatched
    record is its own singleton entity."""
    comp = graph.connected_components_twostar(
        matches.select(
            F.col("a_rec_id").alias("doc_a"),
            F.col("b_rec_id").alias("doc_b"),
        )
    )
    return recs.join(
        comp.select(
            F.col("doc_id").alias("rec_id"),
            F.col("cluster_id").alias("_ent"),
        ),
        "rec_id",
        "left",
    ).withColumn(
        "entity_id", F.coalesce(F.col("_ent"), F.col("rec_id"))
    ).drop("_ent")


def golden_records(resolved: DataFrame) -> DataFrame:
    """Survivorship: fold each multi-record entity into one golden row.

    Merge rules (each a plain aggregate — one shuffle on entity_id):
    - ``name``: min() — with the 'crm'-source canonical names sorting
      below the perturbed 'web' ones in ASCII, min is
      source-priority survivorship expressed as an aggregate;
    - ``acctbal``: max() — most-recently-observed balance wins (the
      perturbed copy is the later observation);
    - ``segment``: min() over non-NULLs — NULL-tolerant consensus;
    - provenance counts for the audit trail.
    """
    return (
        resolved.groupBy("entity_id")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.countDistinct("src").alias("n_sources"),
            F.min("name").alias("name"),
            F.round(F.max("acctbal"), 2).alias("acctbal"),
            F.min("segment").alias("segment"),
        )
        .filter(F.col("n_records") >= 2)
    )


def blocking_audit(recs: DataFrame, cands: DataFrame,
                   truth: DataFrame) -> DataFrame:
    """Blocking-quality audit — the two numbers every record-linkage
    textbook demands before trusting a blocking scheme: REDUCTION
    RATIO (how much of the all-pairs quadratic the blocks pruned) and
    PAIR COMPLETENESS (how many TRUE duplicate pairs survived into
    the candidate set; every pair lost here is an unrecoverable
    linkage miss, including pairs dropped with over-cap blocks).

    ``cands`` and ``truth`` are (a_rec_id, b_rec_id) relations with
    a < b. One-row output, all exact integers: n·(n−1)/2 all-pairs,
    fp6 ratios via the shared identical-spelling floor division; the
    truth join is a broadcast semi-join (truth is duplicate-sized,
    not corpus-sized)."""
    n = recs.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    nc = cands.agg(F.count(F.lit(1)).cast("long").alias("_nc"))
    nt = truth.agg(F.count(F.lit(1)).cast("long").alias("_nt"))
    nf = cands.join(
        F.broadcast(truth), ["a_rec_id", "b_rec_id"], "left_semi"
    ).agg(F.count(F.lit(1)).cast("long").alias("_nf"))
    # n·(n−1) carried in decimal(38,0) (oracle: HUGEINT) — the long
    # product overflows at n ≳ 3.04e9, inside the 100 TB design
    # point; the /2 is exact (consecutive integers ⇒ even product),
    # and the reduction ratio keeps the 1e6-scaled product exact too,
    # with ONE double division at the end (ADVICE r9). n_all_pairs is
    # REPORTED AS A STRING: a BIGINT cast would go NULL on Spark but
    # hard-error on DuckDB beyond n ≈ 4.3e9 (ADVICE r10) — the string
    # render of the exact decimal degrades identically on both
    # engines at any n.
    ap_d = as_dec(F.col("_n")) * as_dec(F.col("_n") - 1) / F.lit(2)
    ap = ap_d.cast("decimal(38,0)").cast("string")
    red = F.floor(
        (as_dec(F.lit(1_000_000)) * (ap_d - F.col("_nc")))
        .cast("double") / ap_d.cast("double")
    ).cast("long")
    comp = F.when(
        F.col("_nt") > 0,
        F.floor(F.lit(1_000_000) * F.col("_nf") / F.col("_nt")),
    ).cast("long")
    return (
        n.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nf))
        .select(
            F.col("_n").alias("n_records"),
            ap.alias("n_all_pairs"),
            F.col("_nc").alias("n_candidates"),
            red.alias("reduction_fp"),
            F.col("_nt").alias("n_true"),
            F.col("_nf").alias("n_true_found"),
            comp.alias("completeness_fp"),
        )
    )
