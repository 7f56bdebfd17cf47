"""Entity-resolution operator guarantees (values are oracle-checked by
verify_local; these tests pin the *contracts*: blocking cap, linkage
ground truth, survivorship rules)."""

from __future__ import annotations

from pyspark.sql import functions as F

from avk_job_skill_analytics_spark.operators import linkage
from avk_job_skill_analytics_spark.registry.linkage_queries import (
    dirty_registry,
)
from tests.conftest import SF_DIR


def test_block_cap_bounds_pair_fanout(spark):
    # 40 records in ONE block (same nation, same digit tail) must be
    # dropped by the census cap, not exploded into 780 pairs.
    rows = [(i, "crm", "Junk#000000999", 7, 100.0, "AUTO")
            for i in range(40)]
    recs = spark.createDataFrame(
        rows, ["rec_id", "src", "name", "nation", "acctbal", "segment"]
    )
    pairs = linkage.candidate_pairs_blocked(recs, max_block=16)
    assert pairs.count() == 0
    # and the same 40 records split across distinct tails DO pair
    ok = spark.createDataFrame(
        [(i, "crm", f"Junk#{i:09d}", 7, 100.0, "AUTO") for i in range(4)]
        + [(100 + i, "web", f"junk {i:09d}", 7, 100.1, "AUTO")
           for i in range(4)],
        ["rec_id", "src", "name", "nation", "acctbal", "segment"],
    )
    assert linkage.candidate_pairs_blocked(ok, max_block=16).count() == 4


def test_linkage_recovers_ground_truth(spark):
    # Every synthesized web copy (rec_id = 2k+1, k%3==0) must match its
    # crm original (rec_id = 2k) and nothing else: precision = recall = 1.
    recs = dirty_registry(spark, SF_DIR)
    scored = linkage.fs_score(linkage.candidate_pairs_blocked(recs))
    matches = scored.filter(F.col("decision") == "match").select(
        "a_rec_id", "b_rec_id"
    )
    got = {(r.a_rec_id, r.b_rec_id) for r in matches.collect()}
    web_ids = {r.rec_id for r in
               recs.filter(F.col("src") == "web").collect()}
    want = {(w - 1, w) for w in web_ids}
    assert got == want
    assert len(got) == len(web_ids)


def test_survivorship_rules(spark):
    recs = dirty_registry(spark, SF_DIR)
    scored = linkage.fs_score(linkage.candidate_pairs_blocked(recs))
    resolved = linkage.resolve_entities(
        recs, scored.filter(F.col("decision") == "match")
    )
    golden = linkage.golden_records(resolved)
    joined = golden.join(
        recs.filter(F.col("src") == "crm").select(
            F.col("rec_id").alias("entity_id"),
            F.col("name").alias("crm_name"),
            F.col("acctbal").alias("crm_bal"),
            F.col("segment").alias("crm_seg"),
        ),
        "entity_id",
    )
    bad = joined.filter(
        (F.col("name") != F.col("crm_name"))          # crm name survives
        | (F.col("acctbal") != F.round(F.col("crm_bal") + 0.25, 2))
        | F.col("segment").isNull()                   # NULL never survives
        | (F.col("segment") != F.col("crm_seg"))
    )
    assert golden.count() > 0
    assert bad.count() == 0
    # every golden entity is exactly the 2-record crm+web pair
    assert golden.filter(F.col("n_records") != 2).count() == 0
    assert golden.filter(F.col("n_sources") != 2).count() == 0


def test_blocking_audit_charges_lost_pairs(spark):
    """A blocking scheme that separates one true pair must show
    completeness < 100% while reduction stays high; all-pairs,
    candidate and truth counts are exact."""
    from avk_job_skill_analytics_spark.operators.linkage import (
        blocking_audit,
    )

    # 6 records; candidates = pairs co-blocked by the scheme under
    # test: truth (0,1) found, truth (2,3) LOST (different blocks),
    # plus one non-true candidate (4,5).
    recs = spark.createDataFrame(
        [(i,) for i in range(6)], "rec_id long")
    cands = spark.createDataFrame(
        [(0, 1), (4, 5)], "a_rec_id long, b_rec_id long")
    truth = spark.createDataFrame(
        [(0, 1), (2, 3)], "a_rec_id long, b_rec_id long")
    r = blocking_audit(recs, cands, truth).collect()[0].asDict()
    assert r["n_records"] == 6
    assert r["n_all_pairs"] == "15"  # string render (overflow-proof)
    assert r["n_candidates"] == 2
    assert r["reduction_fp"] == (1_000_000 * 13) // 15
    assert r["n_true"] == 2 and r["n_true_found"] == 1
    assert r["completeness_fp"] == 500_000


def test_adaptive_block_digits_thresholds():
    """The r14 blocking-key scale lever: width resolves to the
    historical 3 at every verified ledger scale (sf0.01/0.1/1
    registry sizes — including the EXACT sf1 boundary of 200,000
    records, pinned by strict integer comparison, no libm), and
    widens one digit per decade after."""
    from avk_job_skill_analytics_spark.operators.linkage import (
        adaptive_block_digits,
    )

    assert adaptive_block_digits(2_000) == 3       # sf0.01
    assert adaptive_block_digits(20_000) == 3      # sf0.1
    assert adaptive_block_digits(200_000) == 3     # sf1 (boundary)
    assert adaptive_block_digits(200_001) == 4
    assert adaptive_block_digits(2_000_000) == 4   # sf10
    assert adaptive_block_digits(20_000_000) == 5
    assert adaptive_block_digits(10 ** 12) == 8    # hi clamp
