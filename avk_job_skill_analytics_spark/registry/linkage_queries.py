"""Entity-resolution query family (er_*) — record linkage over a
synthesized dirty registry.

The testdata customers are clean, so — like dd_exact_groups does for
duplicate documents — the dirty input is synthesized in-query with
deterministic perturbations: every third customer also appears as a
second-source record whose name is case-mangled and re-prefixed, whose
balance drifted by +0.25, and whose segment is sometimes missing. The
er_* pipeline then has to re-link what the synthesis split: block,
score (Fellegi-Sunter), cluster, survive.

Every stage is oracle-checked: the DuckDB twin replays the identical
synthesis, blocking key, integer agreement weights, recursive
transitive closure, and survivorship folds, so row counts, schemas,
and value hashes must all match.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import linkage
from ..operators.linkage import (
    THRESH_MATCH,
    THRESH_POSSIBLE,
    W_BAL_AGREE,
    W_BAL_DISAGREE,
    W_ID_AGREE,
    W_ID_DISAGREE,
    W_SEG_AGREE,
    W_SEG_DISAGREE,
)
from ..plans.schemas import load

QUERIES = {}
ORACLES = {}


def _q(name, oracle=None):
    def reg(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return reg


# ------------------------------------------------- dirty registry input
def dirty_registry(spark, sf_dir):
    """Two-source record registry: the 'crm' side is every customer
    verbatim; the 'web' side re-observes every third customer with
    deterministic dirt (case/prefix mangling, +0.25 balance drift,
    segment dropped for every ninth key). rec_id = 2*custkey (+1 for
    the web copy) keeps the two observations distinct and the ground
    truth recoverable for tests."""
    c = load(spark, sf_dir, "customer")
    a = c.select(
        (F.col("c_custkey") * 2).alias("rec_id"),
        F.lit("crm").alias("src"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nation"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("segment"),
    )
    b = c.filter(F.col("c_custkey") % 3 == 0).select(
        (F.col("c_custkey") * 2 + 1).alias("rec_id"),
        F.lit("web").alias("src"),
        F.lower(F.regexp_replace("c_name", "Customer#", "cust ")).alias(
            "name"
        ),
        F.col("c_nationkey").alias("nation"),
        (F.col("c_acctbal") + F.lit(0.25)).alias("acctbal"),
        F.when(
            F.col("c_custkey") % 9 == 0, F.lit(None).cast("string")
        ).otherwise(F.col("c_mktsegment")).alias("segment"),
    )
    return a.unionByName(b)


_RECS_SQL = """
  recs AS (
    SELECT c_custkey * 2 AS rec_id, 'crm' AS src, c_name AS name,
           c_nationkey AS nation, c_acctbal AS acctbal,
           c_mktsegment AS segment
    FROM customer
    UNION ALL
    SELECT c_custkey * 2 + 1, 'web',
           lower(replace(c_name, 'Customer#', 'cust ')),
           c_nationkey, c_acctbal + 0.25,
           CASE WHEN c_custkey % 9 = 0 THEN NULL ELSE c_mktsegment END
    FROM customer WHERE c_custkey % 3 = 0)
"""

_MAX_BLOCK = 16


def _blocked_pairs(recs):
    """Candidate pairs at the ADAPTIVE blocking-key width (r14):
    one count() sizes the registry, linkage.adaptive_block_digits
    picks the digit width (3 at every verified ledger scale), and
    the oracle replays the identical integer-threshold formula in
    _BLK_DIGITS_SQL."""
    digits = linkage.adaptive_block_digits(recs.count())
    return linkage.candidate_pairs_blocked(
        recs, max_block=_MAX_BLOCK, digits=digits
    )

# blocking-key width replays linkage.adaptive_block_digits through
# exact integer threshold comparisons (r14): resolves to the
# historical 3 at every verified ledger scale, +1 digit per decade
# past ~200K records so the 1000-cells-per-nation key space can
# never saturate the census cap into zero candidates.
_BLK_DIGITS_SQL = str(linkage._BLOCK_BASE_DIGITS) + "".join(
    f" + (CASE WHEN count(*) > "
    f"{linkage._BLOCK_NATIONS * linkage._BLOCK_TARGET * 10 ** k} "
    "THEN 1 ELSE 0 END)"
    for k in range(linkage._BLOCK_BASE_DIGITS,
                   linkage._BLOCK_MAX_DIGITS)
)

_CAND_SQL = f"""
  blkparams AS (SELECT {_BLK_DIGITS_SQL} AS blkd FROM recs),
  keyed AS MATERIALIZED (
    SELECT r.*, right(regexp_extract(name, '([0-9]+)$', 1),
                      CAST(blkd AS INTEGER)) AS blk
    FROM recs r, blkparams),
  census AS (SELECT nation, blk, count(*) AS blk_n
             FROM keyed GROUP BY nation, blk),
  bounded AS MATERIALIZED (
    SELECT k.*, c.blk_n FROM keyed k
    JOIN census c USING (nation, blk) WHERE c.blk_n <= {_MAX_BLOCK}),
  cand AS (
    SELECT a.nation, a.blk, a.blk_n,
           a.rec_id AS a_rec_id, b.rec_id AS b_rec_id,
           a.name AS a_name, b.name AS b_name,
           a.acctbal AS a_acctbal, b.acctbal AS b_acctbal,
           a.segment AS a_segment, b.segment AS b_segment
    FROM bounded a JOIN bounded b
      ON a.nation = b.nation AND a.blk = b.blk
     AND a.rec_id < b.rec_id)
"""

_SCORE_SQL = f"""
  scored AS MATERIALIZED (
    SELECT cand.*,
           CAST(CASE WHEN regexp_extract(a_name, '([0-9]+)$', 1)
                        = regexp_extract(b_name, '([0-9]+)$', 1)
                     THEN {W_ID_AGREE} ELSE {W_ID_DISAGREE} END
              + CASE WHEN abs(a_acctbal - b_acctbal) <= 0.5
                     THEN {W_BAL_AGREE} ELSE {W_BAL_DISAGREE} END
              + CASE WHEN a_segment IS NULL OR b_segment IS NULL THEN 0
                     WHEN a_segment = b_segment
                     THEN {W_SEG_AGREE} ELSE {W_SEG_DISAGREE} END
             AS BIGINT) AS score
    FROM cand)
"""

_RESOLVE_SQL = f"""
  matches AS (SELECT a_rec_id, b_rec_id FROM scored
              WHERE score >= {THRESH_MATCH}),
  edges AS (SELECT a_rec_id AS s, b_rec_id AS d FROM matches
            UNION SELECT b_rec_id, a_rec_id FROM matches),
  reach(v, r) AS (
    SELECT s, s FROM edges
    UNION
    SELECT e.s, r.r FROM edges e JOIN reach r ON e.d = r.v),
  comp AS (SELECT v AS rec_id, min(r) AS ent FROM reach GROUP BY v),
  resolved AS MATERIALIZED (
    SELECT k.*, coalesce(c.ent, k.rec_id) AS entity_id
    FROM recs k LEFT JOIN comp c USING (rec_id))
"""


@_q(
    "er_candidate_pairs",
    f"""WITH {_RECS_SQL}, {_CAND_SQL}
       SELECT a_rec_id AS rec_a, b_rec_id AS rec_b,
              nation, blk, blk_n
       FROM cand""",
)
def er_candidate_pairs(spark, sf_dir):
    """ER stage 1 — blocked candidate generation: one shuffle on the
    ``(nation, name-digit-tail)`` blocking key, census-capped at 16
    records per block so a skewed junk block can never quadratically
    explode the pair count (the LSH-bucket-cap discipline applied to
    linkage). Emits the pair inventory with its block provenance —
    the audit that shows candidate cost stayed bounded."""
    recs = dirty_registry(spark, sf_dir)
    pairs = _blocked_pairs(recs)
    return pairs.select(
        F.col("a_rec_id").alias("rec_a"),
        F.col("b_rec_id").alias("rec_b"),
        "nation", "blk", "blk_n",
    )


@_q(
    "er_fellegi_sunter",
    f"""WITH {_RECS_SQL}, {_CAND_SQL}, {_SCORE_SQL}
       SELECT a_rec_id AS rec_a, b_rec_id AS rec_b, score,
              CASE WHEN score >= {THRESH_MATCH} THEN 'match'
                   ELSE 'possible' END AS decision
       FROM scored WHERE score >= {THRESH_POSSIBLE}""",
)
def er_fellegi_sunter(spark, sf_dir):
    """ER stage 2 — Fellegi-Sunter scoring (JASA 1969): each candidate
    pair sums fixed integer agreement weights (scaled log2(m/u)) over
    three field comparators — identifier digits, balance-within-0.5,
    segment-with-NULL-neutral. Pure Column arithmetic in whole-stage
    codegen; the match / possible(clerical-review) bands fall out of
    two thresholds. Integer weights make the score exactly replayable
    on any engine — no float log accumulation to drift."""
    recs = dirty_registry(spark, sf_dir)
    scored = linkage.fs_score(
        _blocked_pairs(recs)
    )
    return scored.filter(F.col("decision") != "nonmatch").select(
        F.col("a_rec_id").alias("rec_a"),
        F.col("b_rec_id").alias("rec_b"),
        "score", "decision",
    )


@_q(
    "er_entity_clusters",
    f"""WITH RECURSIVE {_RECS_SQL}, {_CAND_SQL}, {_SCORE_SQL},
       {_RESOLVE_SQL}
       SELECT entity_id, count(*) AS n_records,
              count(DISTINCT src) AS n_sources
       FROM resolved GROUP BY entity_id""",
)
def er_entity_clusters(spark, sf_dir):
    """ER stage 3 — canonical entities: accepted matches form an edge
    list, connected components (two-star alternation, O(log n) rounds
    — the 100 TB-safe variant) assign every record its component's
    min rec_id, and unmatched records stay singleton entities. The
    oracle replays the closure with a recursive CTE; identical
    (entity, size, source-count) rows prove the clustering, not just
    the pair list, matches."""
    recs = dirty_registry(spark, sf_dir)
    scored = linkage.fs_score(
        _blocked_pairs(recs)
    )
    resolved = linkage.resolve_entities(
        recs, scored.filter(F.col("decision") == "match")
    )
    return resolved.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.countDistinct("src").alias("n_sources"),
    )


@_q(
    "er_golden_record",
    f"""WITH RECURSIVE {_RECS_SQL}, {_CAND_SQL}, {_SCORE_SQL},
       {_RESOLVE_SQL}
       SELECT entity_id, count(*) AS n_records,
              count(DISTINCT src) AS n_sources,
              min(name) AS name,
              round(max(acctbal), 2) AS acctbal,
              min(segment) AS segment
       FROM resolved GROUP BY entity_id HAVING count(*) >= 2""",
)
def er_golden_record(spark, sf_dir):
    """ER stage 4 — survivorship: every multi-record entity folds to
    one golden row in a single grouped aggregation (name: min = the
    canonical 'Customer#' form, which ASCII-sorts below the mangled
    'cust ' copies — source priority expressed as an aggregate;
    balance: max = latest observation; segment: NULL-tolerant min).
    The golden table is what downstream joins consume instead of the
    dirty registry."""
    recs = dirty_registry(spark, sf_dir)
    scored = linkage.fs_score(
        _blocked_pairs(recs)
    )
    resolved = linkage.resolve_entities(
        recs, scored.filter(F.col("decision") == "match")
    )
    return linkage.golden_records(resolved).select(
        "entity_id", "n_records", "n_sources", "name", "acctbal",
        "segment",
    )


@_q(
    "er_blocking_audit",
    f"""WITH {_RECS_SQL}, {_CAND_SQL},
       n AS (SELECT count(*) AS n FROM recs),
       t AS (SELECT count(*) AS n_true FROM recs WHERE src = 'web'),
       c AS (SELECT count(*) AS n_cand,
               sum(CASE WHEN a_rec_id % 2 = 0
                         AND b_rec_id = a_rec_id + 1
                        THEN 1 ELSE 0 END) AS n_found
             FROM cand)
       SELECT CAST(n AS BIGINT) AS n_records,
              CAST(CAST(n AS HUGEINT) * (n - 1) // 2 AS VARCHAR)
                  AS n_all_pairs,
              CAST(n_cand AS BIGINT) AS n_candidates,
              CAST(floor(CAST(1000000 *
                         (CAST(n AS HUGEINT) * (n - 1) // 2 - n_cand)
                         AS DOUBLE)
                         / CAST(CAST(n AS HUGEINT) * (n - 1) // 2
                                AS DOUBLE)) AS BIGINT)
                  AS reduction_fp,
              CAST(n_true AS BIGINT) AS n_true,
              CAST(n_found AS BIGINT) AS n_true_found,
              CAST(CASE WHEN n_true > 0
                   THEN floor(1000000 * n_found / n_true) END
                   AS BIGINT) AS completeness_fp
       FROM n, t, c""",
)
def er_blocking_audit(spark, sf_dir):
    """ER stage-0 audit — reduction ratio and pair completeness of
    the blocking scheme (operators/linkage.blocking_audit): the
    registry's recoverable ground truth (every web record's true
    match is its rec_id−1 crm twin) joins against the capped
    candidate set, so pairs lost to over-cap block drops are charged
    as linkage misses. One-row card, exact integers + fp6 ratios."""
    recs = dirty_registry(spark, sf_dir)
    cands = _blocked_pairs(recs).select("a_rec_id", "b_rec_id")
    truth = recs.filter(F.col("src") == "web").select(
        (F.col("rec_id") - 1).alias("a_rec_id"),
        F.col("rec_id").alias("b_rec_id"),
    )
    return linkage.blocking_audit(recs, cands, truth)
