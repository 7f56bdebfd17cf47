"""Tests for the round-14 learner primitives: GD logistic regression
(operators/linearmodel.py), the Gini decision stump
(operators/trees.py), and common-neighbor link prediction
(operators/graph.common_neighbor_topk)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from avk_job_skill_analytics_spark.operators import linearmodel as lm
from avk_job_skill_analytics_spark.operators import trees
from avk_job_skill_analytics_spark.operators.graph import (
    common_neighbor_topk,
)


# ------------------------------------------------------- logreg GD
def _sep_frame(spark):
    """Linearly separable toy set: y = 1 iff x > 0.5."""
    rows = [(i / 20.0, 1.0 if i / 20.0 > 0.5 else 0.0)
            for i in range(21)]
    return spark.createDataFrame(rows, "x double, y double").selectExpr(
        "1.0 AS x0", "x AS x1", "y"
    )


def test_logreg_gd_learns_separable_sign(spark):
    feats = _sep_frame(spark)
    w, n = lm.logreg_fit_gd(feats, ["x0", "x1"], "y", iters=8,
                            lr_num=4.0, lr_den=1.0)
    assert n == 21
    # slope must be positive (y increases with x), bias negative
    # (decision boundary sits inside (0, 1))
    assert w[1] > 0 and w[0] < 0
    rep = lm.logreg_report(feats, ["x0", "x1"], "y", w,
                           ["w_bias", "w_x"])
    stats = {r["stat"]: r["value"] for r in rep.collect()}
    assert stats["n_total"] == 21
    # a fitted separable stump should beat majority class (11/21)
    assert stats["n_correct"] >= 15
    assert stats["w_bias"] == w[0] and stats["w_x"] == w[1]


def test_logreg_gd_deterministic_across_runs(spark):
    feats = _sep_frame(spark).repartition(4)
    w1, _ = lm.logreg_fit_gd(feats, ["x0", "x1"], "y", iters=3)
    w2, _ = lm.logreg_fit_gd(feats.repartition(2), ["x0", "x1"], "y",
                             iters=3)
    # micro-quantized gradient sums are exact BIGINTs — partitioning
    # must not change a single weight
    assert w1 == w2


def test_logreg_update_matches_sql_floor_semantics():
    # the driver-side update must be the same floor((lr·G)/(lr_den·n))
    # the oracle computes — including negative gradients
    w = lm.update_weights([0, 0], [-7, 7], n=3, lr_num=1.0, lr_den=2.0)
    assert w[0] == -math.floor(-7 / 6) and w[1] == -math.floor(7 / 6)


# -------------------------------------------------------- gini stump
def test_gini_stump_finds_clean_split(spark):
    # y == 1 exactly when x >= 10 -> the 9.0 threshold separates
    # perfectly and must win with a pure-split score
    rows = [(float(x), 1 if x >= 10 else 0) for x in range(20)]
    df = spark.createDataFrame(rows, "x double, y int")
    out = trees.gini_stump(
        df, [("x", "x", [3.0, 6.0, 9.0, 12.0, 15.0])], "y"
    ).collect()
    assert len(out) == 1
    best = out[0]
    assert best["threshold"] == 9.0
    assert best["n_left"] == 10 and best["pos_left"] == 0
    assert best["n_right"] == 10 and best["pos_right"] == 10
    # pure split: score = 10 + 10 = 20 exactly
    assert best["score_fp"] == 20_000_000


def test_gini_stump_ranks_informative_feature_first(spark):
    # x1 splits the label perfectly, x2 is constant-noise
    rows = [(float(x), 1.0, 1 if x >= 5 else 0) for x in range(10)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y int")
    out = trees.gini_stump(
        df,
        [("good", "x1", [2.0, 4.5, 7.0]), ("noise", "x2", [0.5, 2.0])],
        "y",
    ).collect()
    assert [r["feature"] for r in out][0] == "good"
    assert out[0]["threshold"] == 4.5


# ------------------------------------------------- link prediction
def test_common_neighbor_topk_scores_and_excludes_edges(spark):
    # path graph 1-2-3 plus hub 0 connected to all: (1,3) share
    # neighbors {0, 2}; every pair containing 0 is an existing edge
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 2), (2, 3)], "src long, dst long"
    )
    out = common_neighbor_topk(edges, k=10).collect()
    pairs = {(r["u"], r["v"]): r for r in out}
    assert (1, 3) in pairs
    r = pairs[(1, 3)]
    assert r["cn"] == 2
    assert r["deg_u"] == 2 and r["deg_v"] == 2
    # jaccard = 2/(2+2-2) = 1.0
    assert r["jaccard_fp"] == 1_000_000
    # existing edges never appear as candidates
    assert all((u, v) not in {(0, 1), (0, 2), (0, 3), (1, 2), (2, 3)}
               for u, v in pairs)


def test_common_neighbor_center_cap_drops_hub_wedges(spark):
    # star: hub 0 with leaves 1..9 — with the cap forced to 1 the
    # only wedge center (0, degree 9) is dropped, so no candidates
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 10)], "src long, dst long"
    )
    capped = common_neighbor_topk(edges, k=10, min_center_cap=1)
    assert capped.count() == 0
    full = common_neighbor_topk(edges, k=50, min_center_cap=64)
    # uncapped: all C(9,2) leaf pairs share the hub
    assert full.count() == 36
