"""Tests for the round-8 additions: prefix-filtered exact
set-similarity join (operators/ssjoin.py), hard-negative mining and
cascade rerank (similarity/retrieval), and the classifier evaluation
card (operators/evalmetrics.py)."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from avk_job_skill_analytics_spark.operators import (
    dedup,
    evalmetrics,
    retrieval,
    similarity,
    ssjoin,
)

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------ prefix-filter exact ss-join
def test_prefix_filter_matches_bruteforce_jaccard(spark):
    """The filter must be LOSSLESS: every pair at/above the threshold
    appears, none below it, with exact intersection/union counts —
    verified against an all-pairs brute force on the same sets."""
    rows = [
        (1, "a b c d"),
        (2, "a b c e"),          # J(1,2) = 3/5
        (3, "a b c d"),          # J(1,3) = 1
        (4, "x y z w"),          # disjoint from 1-3
        (5, "x y z q r"),        # J(4,5) = 3/6 = 1/2 (boundary)
        (6, "p"),                # singleton
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sets = {i: set(t.split()) for i, t in rows}
    toks = df.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).distinct()
    got = {
        (r["id_a"], r["id_b"]): (r["inter"], r["uni"], r["jacc_fp"])
        for r in ssjoin.prefix_filter_pairs(
            toks, "doc_id", "term", t_num=1, t_den=2
        ).collect()
    }
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        uni = len(sets[a] | sets[b])
        if 2 * inter >= uni:
            want[(a, b)] = (inter, uni, 1_000_000 * inter // uni)
    assert got == want
    assert (1, 2) in got and (4, 5) in got  # boundary pair kept


def test_prefix_filter_prunes_candidates_on_corpus(spark):
    """On the sf0.001 corpus the survivors equal the brute-force
    shingle-Jaccard pairs (no false negatives, no extras)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sh = dedup.word_shingles(docs, "doc_id", "text", k=3)
    pairs = ssjoin.prefix_filter_pairs(
        sh, "doc_id", "shingle", t_num=1, t_den=2
    ).collect()
    by_doc = {}
    for r in sh.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["shingle"])
    brute = set()
    for a, b in itertools.combinations(sorted(by_doc), 2):
        i = len(by_doc[a] & by_doc[b])
        u = len(by_doc[a] | by_doc[b])
        if u and 2 * i >= u:
            brute.add((a, b))
    assert {(r["id_a"], r["id_b"]) for r in pairs} == brute
    for r in pairs:
        assert 2 * r["inter"] >= r["uni"]


# ------------------------------------------------- hard-negative mining
def test_hard_negatives_exclude_own_label(spark):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5)
    out = similarity.hard_negative_topk(
        e, q, "vec_id", "embedding", "label", k=3
    )
    labels = {r["vec_id"]: r["label"] for r in e.collect()}
    per_q = {}
    for r in out.collect():
        assert labels[r["neighbor_id"]] != labels[r["query_id"]]
        per_q.setdefault(r["query_id"], []).append(r["rk"])
    assert set(per_q) == {r["vec_id"] for r in q.collect()}
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_hard_negatives_are_hardest(spark):
    """Each returned negative must beat every non-returned
    different-label candidate on (rounded cosine, id) order."""
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = e.filter(F.col("vec_id") == 0)
    out = similarity.hard_negative_topk(
        e, q, "vec_id", "embedding", "label", k=2
    ).collect()
    all_neg = similarity.hard_negative_topk(
        e, q, "vec_id", "embedding", "label", k=10**6
    ).collect()
    order = [r["neighbor_id"] for r in sorted(
        all_neg, key=lambda r: (-r["cosine"], r["neighbor_id"])
    )]
    assert [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rk"])] \
        == order[:2]


# ----------------------------------------------------- cascade rerank
def test_cascade_rerank_subset_of_candidates(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    terms = ["scan", "hash", "merge"]
    cand = retrieval.bm25_topk(docs, "doc_id", "text", terms, k=20)
    out = retrieval.cascade_rerank(
        docs, emb, "doc_id", "text", "vec_id", "embedding", terms,
        emb.filter(F.col("vec_id") == 0), n_candidates=20, k=5,
    ).collect()
    cand_ids = {r["doc_id"] for r in cand.collect()}
    assert 0 < len(out) <= 5
    cos = None
    for r in sorted(out, key=lambda r: r["rk"]):
        assert r["doc_id"] in cand_ids          # stage 2 never expands
        if cos is not None:
            assert r["cosine"] <= cos           # rerank order is cosine
        cos = r["cosine"]


# ------------------------------------------------- evaluation metrics
def test_binary_metrics_hand_computed(spark):
    """Ties included: scores [3,3,2,1], labels [1,0,1,0].
    pairs pos>neg: (s3 vs s1)=1, (s2 vs s1)=1; ties: (s3,s3)=1
    => U = 2 + 0.5 = 2.5, AUC = 2.5/4 = 0.625."""
    rows = [(1, 3, 1, 1), (2, 3, 1, 0), (3, 2, 1, 1), (4, 1, 0, 0)]
    df = spark.createDataFrame(
        rows, "doc_id long, score_fp long, pred long, actual long"
    )
    m = evalmetrics.binary_metrics(
        df, "score_fp", "pred", "actual"
    ).collect()[0]
    assert (m["n"], m["n_pos"]) == (4, 2)
    assert (m["tp"], m["fp"], m["fn"], m["tn"]) == (2, 1, 0, 1)
    assert m["auc_fp"] == 625_000
    assert m["prec_fp"] == 666_666         # floor(1e6 * 2/3)
    assert m["rec_fp"] == 1_000_000
    assert m["f1_fp"] == 800_000           # 2*2/(4+1+0)


def test_binary_metrics_perfect_separation(spark):
    rows = [(i, 100 + i, 1, 1) for i in range(5)] + [
        (10 + i, i, 0, 0) for i in range(5)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, score_fp long, pred long, actual long"
    )
    m = evalmetrics.binary_metrics(
        df, "score_fp", "pred", "actual"
    ).collect()[0]
    assert m["auc_fp"] == 1_000_000
    assert m["f1_fp"] == 1_000_000


def test_calibration_bins_match_global_rank(spark):
    """The decomposed rank must equal a naive global row_number
    binning — equal-count bins, ties split deterministically by id."""
    rows = [(i, (i * 7) % 5, i % 2) for i in range(40)]  # heavy ties
    df = spark.createDataFrame(
        rows, "doc_id long, score_fp long, actual long"
    )
    out = {r["bin"]: r for r in evalmetrics.calibration_bins(
        df, "doc_id", "score_fp", "actual", n_bins=4
    ).collect()}
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    want = {}
    for rn, (i, s, y) in enumerate(ordered):
        b = rn * 4 // 40
        n, pos, ssum = want.get(b, (0, 0, 0))
        want[b] = (n + 1, pos + y, ssum + s)
    assert set(out) == set(want)
    for b, (n, pos, ssum) in want.items():
        assert out[b]["n"] == n == 10       # equal-count
        assert out[b]["n_pos"] == pos
        assert out[b]["sum_score_fp"] == ssum
        assert out[b]["rate_fp"] == 1_000_000 * pos // n


def test_pr_curve_hand_computed(spark):
    """scores [3,3,2,1], labels [1,0,1,0]: thr=3 -> tp1 fp1;
    thr=2 -> tp2 fp1; thr=1 -> tp2 fp2."""
    rows = [(1, 3, 1), (2, 3, 0), (3, 2, 1), (4, 1, 0)]
    df = spark.createDataFrame(rows, "doc_id long, score_fp long, actual long")
    out = {r["thr"]: r for r in evalmetrics.pr_curve(
        df, "score_fp", "actual"
    ).collect()}
    assert (out[3]["tp"], out[3]["fp"]) == (1, 1)
    assert (out[2]["tp"], out[2]["fp"]) == (2, 1)
    assert (out[1]["tp"], out[1]["fp"]) == (2, 2)
    assert out[2]["prec_fp"] == 666_666
    assert out[2]["rec_fp"] == 1_000_000
    assert out[2]["f1_fp"] == 1_000_000 * 4 // 5      # 2*2/(2+1+2)
    best = evalmetrics.best_threshold(
        df, "score_fp", "actual"
    ).collect()
    assert len(best) == 1 and best[0]["thr"] == 2


def test_best_threshold_tie_breaks_stricter(spark):
    """Two thresholds with identical F1 -> the higher one wins."""
    rows = [(1, 10, 1), (2, 5, 1), (3, 1, 0)]
    df = spark.createDataFrame(rows, "doc_id long, score_fp long, actual long")
    curve = {r["thr"]: r["f1_fp"] for r in evalmetrics.pr_curve(
        df, "score_fp", "actual"
    ).collect()}
    best = evalmetrics.best_threshold(df, "score_fp", "actual").collect()[0]
    top = max(curve.values())
    assert best["f1_fp"] == top
    assert best["thr"] == max(t for t, f in curve.items() if f == top)


def test_decayed_counts_exact(spark):
    """Two events for one user, 0 and 7 days old: weights 1.0 and
    0.5 -> decayed_fp = 1_500_000; values decay the same way."""
    from avk_job_skill_analytics_spark.operators import temporal

    rows = [
        (1, "2024-01-08 12:00:00", 4.0),
        (1, "2024-01-01 12:00:00", 2.0),
        (2, "2024-01-08 00:00:00", 10.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, value double") \
        .withColumn("ts", F.to_timestamp("ts"))
    out = {r["user_id"]: r for r in temporal.decayed_counts(
        df, "user_id", "ts", "value", half_life_days=7
    ).collect()}
    assert out[1]["n_events"] == 2
    assert out[1]["decayed_fp"] == 1_500_000           # 1.0 + 0.5
    assert out[1]["decayed_value_fp"] == 5_000_000     # 4.0 + 1.0
    assert out[2]["decayed_fp"] == 1_000_000
    assert out[2]["decayed_value_fp"] == 10_000_000


def test_grouped_metrics_slices_and_guards(spark):
    """One healthy slice (matches the global card on its subset), one
    single-class slice (NULL auc, defined recall), one slice with no
    predicted positives (NULL precision)."""
    rows = (
        [("a", i, 3 - (i % 3), 1 if i % 3 else 0, 1 if i % 2 else 0)
         for i in range(8)]
        + [("b", 100 + i, 5, 1, 1) for i in range(4)]     # all-positive
        + [("c", 200 + i, 1, 0, i % 2) for i in range(4)]  # never predicts
    )
    df = spark.createDataFrame(
        rows,
        "src string, doc_id long, score_fp long, pred long, actual long",
    )
    out = {r["src"]: r for r in evalmetrics.grouped_binary_metrics(
        df, "src", "score_fp", "pred", "actual"
    ).collect()}
    assert set(out) == {"a", "b", "c"}
    ga = evalmetrics.binary_metrics(
        df.filter(F.col("src") == "a"), "score_fp", "pred", "actual"
    ).collect()[0]
    for c in ("n", "n_pos", "tp", "fp", "fn", "tn",
              "auc_fp", "prec_fp", "rec_fp", "f1_fp"):
        assert out["a"][c] == ga[c], c
    assert out["b"]["auc_fp"] is None          # single class
    assert out["b"]["rec_fp"] == 1_000_000
    assert out["c"]["prec_fp"] is None         # tp+fp == 0
    assert out["c"]["tp"] == 0


def test_semihard_negatives_under_positive_bar(spark):
    from avk_job_skill_analytics_spark.operators import similarity

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5)
    out = similarity.semihard_negative_topk(
        e, q, "vec_id", "embedding", "label", k=3
    ).collect()
    assert out
    hard = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in similarity.hard_negative_topk(
            e, q, "vec_id", "embedding", "label", k=10**6
        ).collect()
    }
    labels = {r["vec_id"]: r["label"] for r in e.collect()}
    for r in out:
        assert labels[r["neighbor_id"]] != labels[r["query_id"]]
        assert r["cosine"] < r["pos_sim"]       # inside the margin band
        # and it IS the hardest negative below the bar: nothing
        # harder with a different label sits between it and the bar
        # other than ones also returned
        assert (r["query_id"], r["neighbor_id"]) in hard


def test_match_distribution_proportions(spark):
    """Retained counts approximate the target mix; the binding group
    keeps everything; acceptance is deterministic."""
    from avk_job_skill_analytics_spark.operators import sampling

    rows = ([(i, "big") for i in range(3000)]
            + [(10000 + i, "small") for i in range(300)])
    df = spark.createDataFrame(rows, "doc_id long, g string")
    out = {r["g"]: r for r in sampling.match_distribution(
        df, "doc_id", "g", lambda g: F.lit(1).cast("long")
    ).collect()}
    # equal weights: small (n/w = 300) binds and keeps all rows
    assert out["small"]["n_after"] == out["small"]["n_before"] == 300
    # big downsamples toward ~300 (hash-coin variance at n=3000)
    assert abs(out["big"]["n_after"] - 300) < 60
    again = {r["g"]: r["n_after"] for r in sampling.match_distribution(
        df, "doc_id", "g", lambda g: F.lit(1).cast("long")
    ).collect()}
    assert again == {g: r["n_after"] for g, r in out.items()}


def test_ab_test_readout_card_and_degenerate_z(spark):
    """The experiment card: exact counts per hash arm, z NULL when
    the pooled rate is degenerate (everyone converts), z signed the
    right way when arm B converts more."""
    from avk_job_skill_analytics_spark.operators import experiment

    def arm(uid):
        return ((uid * 2654435761) % 4294967296 * 2) >> 32

    # users 1..40, one event each; arm-B users convert, arm-A never
    rows = [(u, "purchase" if arm(u) == 1 else "view")
            for u in range(1, 41)]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    card = experiment.ab_test_readout(
        df, "user_id", F.col("event_type") == "purchase"
    ).collect()[0]
    n_a = sum(1 for u in range(1, 41) if arm(u) == 0)
    assert card["n_a"] == n_a and card["n_b"] == 40 - n_a
    assert card["conv_a"] == 0 and card["conv_b"] == card["n_b"]
    assert card["rate_a_fp"] == 0 and card["rate_b_fp"] == 1_000_000
    assert card["lift_fp"] == 1_000_000
    assert card["z_fp"] is not None and card["z_fp"] > 0

    # degenerate: everyone converts -> pooled p = 1 -> se = 0 -> NULL z
    all_conv = spark.createDataFrame(
        [(u, "purchase") for u in range(1, 41)],
        "user_id long, event_type string")
    card2 = experiment.ab_test_readout(
        all_conv, "user_id", F.col("event_type") == "purchase"
    ).collect()[0]
    assert card2["z_fp"] is None and card2["lift_fp"] == 0

    # multiple events per user count once (max, not sum)
    dup = spark.createDataFrame(
        [(7, "purchase"), (7, "purchase"), (7, "view"),
         (8, "view"), (8, "view")],
        "user_id long, event_type string")
    card3 = experiment.ab_test_readout(
        dup, "user_id", F.col("event_type") == "purchase"
    ).collect()[0]
    assert card3["conv_a"] + card3["conv_b"] == 1
    assert card3["n_a"] + card3["n_b"] == 2


def test_srm_check_balanced_and_broken(spark):
    """Balanced arms -> chi2 0, no alarm; an assignment bug that
    drops one arm's users -> alarm fires."""
    from avk_job_skill_analytics_spark.operators import experiment

    def arm(uid):
        return ((uid * 2654435761) % 4294967296 * 2) >> 32

    ids = list(range(1, 201))
    ev = spark.createDataFrame([(u, "view") for u in ids],
                               "user_id long, event_type string")
    ok = experiment.srm_check(ev, "user_id").collect()[0]
    assert ok["n_a"] + ok["n_b"] == 200
    assert not ok["srm_suspect"]

    # "bug": only arm-0 users reach the logs
    only_a = [u for u in ids if arm(u) == 0]
    ev2 = spark.createDataFrame([(u, "view") for u in only_a],
                                "user_id long, event_type string")
    bad = experiment.srm_check(ev2, "user_id").collect()[0]
    assert bad["n_b"] == 0
    assert bad["chi2_fp"] == 1_000_000 * len(only_a)
    assert bad["srm_suspect"]


def test_cuped_removes_covariate_driven_false_lift(spark):
    """The exactness law: when Y is EXACTLY linear in the covariate
    (Y = 100*X, zero true effect), theta recovers the slope, rho2 is
    1, and the CUPED lift is exactly 0 — even though the arms'
    covariates are imbalanced, so the RAW lift reports a spurious
    effect. This is precisely the failure CUPED exists to remove."""
    from avk_job_skill_analytics_spark.operators import experiment
    from pyspark.sql import functions as F  # noqa: F811

    def arm(uid):
        return ((uid * 2654435761) % 4294967296 * 2) >> 32

    rows = []
    for u in range(1, 121):
        a = arm(u)
        x = (u % 5) + 1 + (3 if a == 1 else 0)  # arm-imbalanced X
        y = 100 * x                             # exact linear outcome
        for _ in range(x):                      # x pre-period events
            rows.append((u, "view", 0.0, 5))
        rows.append((u, "purchase", y / 100.0, 20))  # post outcome
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, value double, day int")
    card = experiment.cuped_readout(
        ev, "user_id",
        F.col("day") <= 10,
        F.when(F.col("event_type") == "purchase",
               F.round(F.col("value") * 100).cast("long"))
        .otherwise(F.lit(0)),
    ).collect()[0]
    assert card["n_a"] + card["n_b"] == 120
    # Y = 100*X exactly => cov = 100*var(X) => theta = 100 exactly
    assert card["theta_fp"] == 100_000_000
    # the 3-unit X imbalance fabricates ~300 cents of raw lift
    assert card["lift_raw_fp"] > 250_000_000
    assert card["lift_cuped_fp"] == 0       # ...which CUPED removes
    assert card["rho2_fp"] == 1_000_000     # X explains everything


def test_cuped_degenerate_covariate(spark):
    """Constant X -> var(X)=0 -> theta/lift_cuped NULL, raw lift
    still reported."""
    from avk_job_skill_analytics_spark.operators import experiment
    from pyspark.sql import functions as F  # noqa: F811

    ev = spark.createDataFrame(
        [(u, "purchase", 1.0, 20) for u in range(1, 41)],
        "user_id long, event_type string, value double, day int")
    card = experiment.cuped_readout(
        ev, "user_id", F.col("day") <= 10,
        F.round(F.col("value") * 100).cast("long"),
    ).collect()[0]
    assert card["theta_fp"] is None
    assert card["lift_cuped_fp"] is None
    assert card["lift_raw_fp"] == 0


def test_bootstrap_lift_ci_brackets_and_replays(spark):
    """The CI brackets the point estimate for a well-behaved signal,
    a genuinely different outcome shifts the whole interval, and the
    hash-derived weights make the result identical across runs."""
    from avk_job_skill_analytics_spark.operators import experiment

    def arm(uid):
        return ((uid * 2654435761) % 4294967296 * 2) >> 32

    # arm-B users spend 10.00, arm-A users spend 5.00 (one purchase)
    rows = [(u, "purchase", 10.0 if arm(u) == 1 else 5.0)
            for u in range(1, 201)]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, value double")
    cents = F.when(F.col("event_type") == "purchase",
                   F.round(F.col("value") * 100).cast("long")) \
        .otherwise(F.lit(0))
    card = experiment.bootstrap_lift_ci(
        ev, "user_id", cents, n_replicas=40).collect()[0]
    assert card["n_replicas"] == 40
    # constant within-arm outcomes: every resample's lift is exactly
    # 500 cents regardless of weights -> degenerate-tight CI
    assert card["lift_point_fp"] == 500_000_000
    assert card["lift_lo_fp"] == 500_000_000
    assert card["lift_hi_fp"] == 500_000_000

    # heterogeneous outcomes: CI widens and brackets the point
    rows2 = [(u, "purchase", float((u % 7) + (10 if arm(u) else 5)))
             for u in range(1, 201)]
    ev2 = spark.createDataFrame(
        rows2, "user_id long, event_type string, value double")
    c2 = experiment.bootstrap_lift_ci(
        ev2, "user_id", cents, n_replicas=40).collect()[0]
    assert c2["lift_lo_fp"] < c2["lift_point_fp"] < c2["lift_hi_fp"]
    assert c2["lift_lo_fp"] < c2["lift_hi_fp"]
    # determinism: a second run is bit-identical
    again = experiment.bootstrap_lift_ci(
        ev2, "user_id", cents, n_replicas=40).collect()[0]
    assert tuple(c2) == tuple(again)


def test_stratified_readout_simpsons_guard(spark):
    """Per-stratum lifts and the post-stratified pooled lift: a
    stratum with a missing arm reports NULL lift and is excluded
    from the pooled weight mass; the pooled value is the weighted
    integer sum of per-stratum contributions."""
    from avk_job_skill_analytics_spark.operators import experiment

    def arm(uid):
        return ((uid * 2654435761) % 4294967296 * 2) >> 32

    # stratum g1: ids 1..80; stratum g2: only arm-0 ids (degenerate)
    g2_only_a = [u for u in range(81, 200) if arm(u) == 0][:10]
    rows = [(u, "purchase" if (arm(u) == 1 and u % 2 == 0) else "view")
            for u in range(1, 81)] + \
           [(u, "view") for u in g2_only_a]
    ev = spark.createDataFrame(rows, "user_id long, event_type string")
    strata = spark.createDataFrame(
        [(u, "g1") for u in range(1, 81)]
        + [(u, "g2") for u in g2_only_a],
        "k long, seg string")
    out = {r["stratum"]: r for r in experiment.stratified_readout(
        ev, "user_id", F.col("event_type") == "purchase",
        strata, "k", "seg").collect()}
    g1, g2 = out["g1"], out["g2"]
    assert g2["n_b"] == 0 and g2["lift_fp"] is None
    assert g2["weight_fp"] is None           # excluded from the mass
    assert g1["weight_fp"] == 1_000_000      # g1 carries all weight
    assert g1["rate_a_fp"] == 0 and g1["lift_fp"] == g1["rate_b_fp"]
    # pooled = g1's contribution alone (weight 1.0 * lift)
    assert g1["pooled_lift_fp"] == g1["lift_fp"]
    assert g2["pooled_lift_fp"] == g1["pooled_lift_fp"]


def test_cohen_kappa_hand_computed_and_degenerate(spark):
    """2x2 hand case; perfect agreement -> kappa 1; constant
    annotators -> pe = 1 -> NULL kappa; NULL labels excluded."""
    from avk_job_skill_analytics_spark.operators.evalmetrics import (
        cohen_kappa,
    )

    # confusion: a=yes,b=yes:20  a=yes,b=no:5  a=no,b=yes:10  a=no,b=no:15
    rows = ([("y", "y")] * 20 + [("y", "n")] * 5
            + [("n", "y")] * 10 + [("n", "n")] * 15
            + [(None, "y"), ("y", None)])          # excluded
    df = spark.createDataFrame(rows, "a string, b string")
    m = cohen_kappa(df, "a", "b").collect()[0]
    assert m["n"] == 50 and m["n_agree"] == 35
    assert m["po_fp"] == 700_000
    # pe = (25*30 + 25*20) / 2500 = 0.5 -> kappa = 0.2/0.5 = 0.4
    assert m["pe_fp"] == 500_000
    assert m["kappa_fp"] == 400_000

    same = spark.createDataFrame(
        [("x", "x"), ("z", "z"), ("x", "x")], "a string, b string")
    assert cohen_kappa(same, "a", "b").collect()[0]["kappa_fp"] \
        == 1_000_000

    const = spark.createDataFrame(
        [("k", "k")] * 4, "a string, b string")
    c = cohen_kappa(const, "a", "b").collect()[0]
    assert c["pe_fp"] == 1_000_000 and c["kappa_fp"] is None


def test_welch_t_hand_computed_and_degenerate(spark):
    """Hand case with unequal variances; single-user arms and
    zero-variance degenerate cases yield NULL t/df."""
    import math

    from avk_job_skill_analytics_spark.operators import experiment

    def arm(uid):
        return ((uid * 2654435761) % 4294967296 * 2) >> 32

    a_users = [u for u in range(1, 100) if arm(u) == 0][:4]
    b_users = [u for u in range(1, 100) if arm(u) == 1][:3]
    a_vals = [10.0, 12.0, 14.0, 16.0]      # mean 13, var 20/3
    b_vals = [20.0, 30.0, 40.0]            # mean 30, var 100
    rows = [(u, "purchase", v) for u, v in zip(a_users, a_vals)] + \
           [(u, "purchase", v) for u, v in zip(b_users, b_vals)]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, value double")
    cents = F.when(F.col("event_type") == "purchase",
                   F.round(F.col("value") * 100).cast("long")) \
        .otherwise(F.lit(0))
    card = experiment.welch_t_readout(ev, "user_id", cents).collect()[0]
    assert (card["n_a"], card["n_b"]) == (4, 3)
    assert card["mean_a_fp"] == 1_300_000_000   # 1300 cents
    assert card["mean_b_fp"] == 3_000_000_000
    # hand Welch on cents: va=66666.66.., vb=1e6
    va, vb = 200000 / 3, 1_000_000.0
    se2 = va / 4 + vb / 3
    t = (3000 - 1300) / math.sqrt(se2)
    df = se2 * se2 / ((va / 4) ** 2 / 3 + (vb / 3) ** 2 / 2)
    assert abs(card["t_fp"] - round(t * 1e6)) <= 2
    assert abs(card["df_fp"] - round(df * 1e6)) <= 2

    # degenerate: constant outcomes in both arms -> se2 = 0 -> NULL
    ev2 = spark.createDataFrame(
        [(u, "purchase", 5.0) for u in a_users + b_users],
        "user_id long, event_type string, value double")
    c2 = experiment.welch_t_readout(ev2, "user_id", cents).collect()[0]
    assert c2["t_fp"] is None and c2["df_fp"] is None
    assert c2["lift_fp"] == 0


def test_ratio_delta_degenerate_and_sign(spark):
    """Zero denominators -> NULL ratios; a genuinely higher per-event
    revenue in arm B yields positive lift; identical arms -> lift 0."""
    from avk_job_skill_analytics_spark.operators import experiment

    def arm(uid):
        return ((uid * 2654435761) % 4294967296 * 2) >> 32

    a_users = [u for u in range(1, 200) if arm(u) == 0][:10]
    b_users = [u for u in range(1, 200) if arm(u) == 1][:10]
    rows = []
    for i, u in enumerate(a_users):
        rows += [(u, "view", 0.0)] * 4 + [(u, "purchase", 4.0 + i % 3)]
    for i, u in enumerate(b_users):
        rows += [(u, "view", 0.0)] * 2 + [(u, "purchase", 4.0 + i % 3)]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, value double")
    cents = F.when(F.col("event_type") == "purchase",
                   F.round(F.col("value") * 100).cast("long")) \
        .otherwise(F.lit(0))
    views = F.when(F.col("event_type") == "view", 1).otherwise(0)
    card = experiment.ratio_delta_readout(
        ev, "user_id", cents, views).collect()[0]
    # B spends the same per user over half the views: ratio doubles
    assert card["ratio_b_fp"] > card["ratio_a_fp"] > 0
    assert card["lift_fp"] > 0 and card["z_fp"] is not None

    # denominator absent in one arm -> NULL ratio and z
    ev2 = spark.createDataFrame(
        [(a_users[0], "purchase", 5.0), (b_users[0], "view", 0.0)],
        "user_id long, event_type string, value double")
    c2 = experiment.ratio_delta_readout(
        ev2, "user_id", cents, views).collect()[0]
    assert c2["ratio_a_fp"] is None and c2["z_fp"] is None


def test_quantile_lift_shifted_distribution(spark):
    """Arm B = arm A's spend + 100 cents shift: every quantile lift
    is exactly 100 cents."""
    from avk_job_skill_analytics_spark.operators import experiment

    def arm(uid):
        return ((uid * 2654435761) % 4294967296 * 2) >> 32

    a_users = [u for u in range(1, 300) if arm(u) == 0][:20]
    b_users = [u for u in range(1, 300) if arm(u) == 1][:20]
    rows = [(u, "purchase", float(i + 1)) for i, u in enumerate(a_users)]
    rows += [(u, "purchase", float(i + 2)) for i, u in enumerate(b_users)]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, value double")
    cents = F.when(F.col("event_type") == "purchase",
                   F.round(F.col("value") * 100).cast("long")) \
        .otherwise(F.lit(0))
    out = {r["q_pmil"]: r for r in experiment.quantile_lift(
        ev, "user_id", cents).collect()}
    assert set(out) == {500, 900, 990}
    for r in out.values():
        assert abs(r["lift"] - 100.0) < 1e-9


def test_welch_single_user_arm_no_crash(spark):
    """A 1-user arm must yield NULL t/df, not an ANSI
    divide-by-zero from eager condition evaluation."""
    from avk_job_skill_analytics_spark.operators import experiment

    def arm(uid):
        return ((uid * 2654435761) % 4294967296 * 2) >> 32

    a = [u for u in range(1, 50) if arm(u) == 0][:1]
    b = [u for u in range(1, 50) if arm(u) == 1][:3]
    ev = spark.createDataFrame(
        [(u, "purchase", 1.0 + u % 5) for u in a + b],
        "user_id long, event_type string, value double")
    cents = F.when(F.col("event_type") == "purchase",
                   F.round(F.col("value") * 100).cast("long")) \
        .otherwise(F.lit(0))
    card = experiment.welch_t_readout(ev, "user_id", cents).collect()[0]
    assert card["n_a"] == 1
    assert card["t_fp"] is None and card["df_fp"] is None


def test_mde_card_scales_with_n(spark):
    """More users -> smaller detectable effect; the card equals the
    closed form on hand data."""
    import math

    from avk_job_skill_analytics_spark.operators import experiment

    def arm(uid):
        return ((uid * 2654435761) % 4294967296 * 2) >> 32

    def build(n_per_arm):
        a = [u for u in range(1, 2000) if arm(u) == 0][:n_per_arm]
        b = [u for u in range(1, 2000) if arm(u) == 1][:n_per_arm]
        rows = [(u, "purchase", float(10 + i % 5))
                for i, u in enumerate(a + b)]
        return spark.createDataFrame(
            rows, "user_id long, event_type string, value double")

    cents = F.when(F.col("event_type") == "purchase",
                   F.round(F.col("value") * 100).cast("long")) \
        .otherwise(F.lit(0))
    small = experiment.mde_card(build(10), "user_id", cents).collect()[0]
    big = experiment.mde_card(build(100), "user_id", cents).collect()[0]
    assert small["mde_abs_fp"] > big["mde_abs_fp"] > 0
    # closed form check on the small card
    ys = {}
    a = [u for u in range(1, 2000) if arm(u) == 0][:10]
    b = [u for u in range(1, 2000) if arm(u) == 1][:10]
    vals = [1000 + (i % 5) * 100 for i in range(20)]
    av, bv = vals[:10], vals[10:]
    def var(x):
        m = sum(x) / len(x)
        return sum((v - m) ** 2 for v in x) / (len(x) - 1)
    mde = 2.801585 * math.sqrt(var(av) / 10 + var(bv) / 10)
    assert abs(small["mde_abs_fp"] - round(mde * 1e6)) <= 2


def test_binary_metrics_degenerate_inputs_yield_null(spark):
    """Single-class input or an empty predicted-positive set must
    yield NULL for the undefined ratios (the grouped twin's
    contract), not a division blow-up / ANSI error."""
    # all-positive labels, nothing predicted positive
    rows = [(1, 5, 0, 1), (2, 3, 0, 1)]
    df = spark.createDataFrame(
        rows, "doc_id long, score_fp long, pred long, actual long"
    )
    m = evalmetrics.binary_metrics(
        df, "score_fp", "pred", "actual"
    ).collect()[0]
    assert m["auc_fp"] is None             # n0 == 0: AUC undefined
    assert m["prec_fp"] is None            # tp + fp == 0
    assert m["rec_fp"] == 0                # n1 > 0, tp == 0
    # all-negative labels: recall and AUC undefined, f1 undefined
    rows = [(1, 5, 0, 0), (2, 3, 0, 0)]
    df = spark.createDataFrame(
        rows, "doc_id long, score_fp long, pred long, actual long"
    )
    m = evalmetrics.binary_metrics(
        df, "score_fp", "pred", "actual"
    ).collect()[0]
    assert m["auc_fp"] is None and m["rec_fp"] is None
    assert m["f1_fp"] is None
    # pr_curve on an all-negative frame: rec_fp NULL on every row
    curve = evalmetrics.pr_curve(df, "score_fp", "actual").collect()
    assert curve and all(r["rec_fp"] is None for r in curve)


def test_lift_table_hand_computed(spark):
    """A perfectly-ranked scorer over 10 rows with 2 positives at the
    top: bin 0 captures both positives (capture 100%, lift 5x at 20%
    population share); later bins decay to lift 1x."""
    from avk_job_skill_analytics_spark.operators.evalmetrics import (
        lift_table,
    )

    rows = [(i, 1_000_000 - i * 1000, 1 if i < 2 else 0)
            for i in range(10)]
    scored = spark.createDataFrame(
        rows, "id long, score_fp long, y int"
    )
    out = {
        r["bin"]: r.asDict()
        for r in lift_table(scored, "id", "score_fp", "y",
                            n_bins=5).collect()
    }
    assert len(out) == 5
    # bin 0 = top 2 rows = both positives
    assert out[0]["n"] == 2 and out[0]["n_pos"] == 2
    assert out[0]["capture_fp"] == 1_000_000       # 2/2 positives
    # share = 2/10 -> 200000; lift = floor(1e6 * 1e6 / 2e5) = 5e6
    assert out[0]["lift_fp"] == 5_000_000
    # last bin: capture still 100%, share 100% -> lift exactly 1.0
    assert out[4]["cum_n"] == 10 and out[4]["cum_pos"] == 2
    assert out[4]["lift_fp"] == 1_000_000


def test_lift_table_no_positives_guard(spark):
    """Zero positives: the capture ratio does not exist, so
    capture_fp and lift_fp are NULL (the module's NULL-for-undefined
    contract) — 0 would be indistinguishable from 'scorer captured
    nothing', which is a real value."""
    from avk_job_skill_analytics_spark.operators.evalmetrics import (
        lift_table,
    )

    scored = spark.createDataFrame(
        [(i, i * 10, 0) for i in range(6)],
        "id long, score_fp long, y int",
    )
    out = lift_table(scored, "id", "score_fp", "y", n_bins=3).collect()
    assert all(
        r["capture_fp"] is None and r["lift_fp"] is None for r in out
    )


def test_roc_points_hand_computed_and_guarded(spark):
    """ROC endpoints and a mid-threshold on a tiny scored frame, plus
    the single-class NULL guard."""
    from avk_job_skill_analytics_spark.operators.evalmetrics import (
        roc_points,
    )

    scored = spark.createDataFrame(
        [(90, 1), (80, 1), (70, 0), (60, 1), (50, 0)],
        "score_fp long, y int",
    )
    out = {r["thr"]: r.asDict()
           for r in roc_points(scored, "score_fp", "y").collect()}
    # thr=90: tp=1 fp=0 -> tpr 1/3, fpr 0
    assert out[90]["tpr_fp"] == 333_333 and out[90]["fpr_fp"] == 0
    assert out[90]["youden_fp"] == 333_333
    # thr=60: tp=3 fp=1 -> tpr 1.0, fpr 1/2
    assert out[60]["tpr_fp"] == 1_000_000
    assert out[60]["fpr_fp"] == 500_000
    # lowest threshold accepts everything
    assert out[50]["tpr_fp"] == 1_000_000
    assert out[50]["fpr_fp"] == 1_000_000 and out[50]["youden_fp"] == 0

    ones = spark.createDataFrame(
        [(10, 1), (20, 1)], "score_fp long, y int"
    )
    rows = roc_points(ones, "score_fp", "y").collect()
    assert all(r["fpr_fp"] is None for r in rows)   # n0=0 guard
