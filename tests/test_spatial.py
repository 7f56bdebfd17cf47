"""Spatial grid operators: the bounded-radius kNN must be LOSSLESS
(grid probe ⊇ circle) including cell-boundary and negative-coordinate
cases, with deterministic tie-breaks."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F  # noqa: F401

from avk_job_skill_analytics_spark.operators import spatial


def _brute(points, queries, radius, k):
    want = {}
    for qid, qlat, qlon in queries:
        cands = []
        for pid, plat, plon in points:
            d2 = (plat - qlat) ** 2 + (plon - qlon) ** 2
            if d2 <= radius * radius:
                cands.append((d2, pid))
        for rk, (d2, pid) in enumerate(sorted(cands)[:k], 1):
            want[(qid, pid)] = (d2, rk)
    return want


def test_radius_knn_matches_bruteforce_with_boundaries(spark):
    """Deterministic LCG points spanning negative coords and exact
    cell boundaries; grid result == brute-force circle, always."""
    st = 11
    pts, qs = [], []
    state = 7
    for i in range(300):
        state = (state * 1103515245 + 12345) % (1 << 31)
        lat = state % 200 - 100            # [-100, 100)
        state = (state * 1103515245 + 12345) % (1 << 31)
        lon = state % 200 - 100
        pts.append((i, lat, lon))
    # queries on and off cell boundaries (step divides some coords)
    qs = [(0, 0, 0), (1, st, st), (2, -st, st), (3, 99, -100),
          (4, -100, -100), (5, 50, 50)]
    p_df = spark.createDataFrame(pts, "pid long, lat long, lon long")
    q_df = spark.createDataFrame(qs, "qid long, lat long, lon long")
    for radius, k in [(st, 3), (25, 5), (3, 2)]:
        got = {
            (r["query_id"], r["point_id"]): (r["dist2"], r["rk"])
            for r in spatial.radius_knn(
                p_df, "pid", "lat", "lon", q_df, "qid", "lat", "lon",
                radius=radius, k=k, step=st,
            ).collect()
        }
        assert got == _brute(pts, qs, radius, k), (radius, k)


def test_radius_knn_empty_and_tie_order(spark):
    """A query with nothing in range yields no rows; equidistant
    points rank by id ascending (total order)."""
    pts = [(1, 10, 0), (2, -10, 0), (3, 0, 10)]   # all dist2 = 100
    p_df = spark.createDataFrame(pts, "pid long, lat long, lon long")
    q_df = spark.createDataFrame(
        [(7, 0, 0), (8, 1000, 1000)], "qid long, lat long, lon long")
    out = spatial.radius_knn(
        p_df, "pid", "lat", "lon", q_df, "qid", "lat", "lon",
        radius=10, k=2, step=10,
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(
            (r["rk"], r["point_id"]))
    assert 8 not in by_q                    # out of range: no rows
    assert sorted(by_q[7]) == [(1, 1), (2, 2)]  # ties by id asc


def test_cell_density_totals(spark):
    pts = [(i, i % 3 * 100, 0) for i in range(30)]  # 3 cells x 10
    p_df = spark.createDataFrame(pts, "pid long, lat long, lon long")
    out = spatial.cell_density(p_df, "lat", "lon", step=100,
                               top_n=2).collect()
    assert len(out) == 2
    assert all(r["n_points"] == 10 for r in out)
    # tie on count -> cell coords ascending
    assert [(r["cell_lat"], r["cell_lon"]) for r in out] == \
        [(0, 0), (1, 0)]


def test_point_in_polygon_concave_and_exact(spark):
    """Ray casting must respect the CONCAVE notch (a bounding box or
    convex hull would misclassify it), stay exact on integer coords,
    and use the half-open edge rule deterministically."""
    import pandas as pd
    from pyspark.sql import functions as F

    from avk_job_skill_analytics_spark.operators.spatial import (
        point_in_polygon,
    )

    # L-shape: (0,0)(60,0)(60,20)(20,20)(20,35)(0,35) in (lat, lon)
    ring = [(0, 0), (60, 0), (60, 20), (20, 20), (20, 35), (0, 35)]
    cases = [
        (10, 10, True),    # lower arm
        (50, 10, True),    # upper arm
        (50, 30, False),   # inside the notch: OUTSIDE the L
        (10, 30, True),    # lower-right arm
        (70, 10, False),   # above
        (10, 40, False),   # right of everything
        (-5, 10, False),   # below
    ]
    df = spark.createDataFrame(pd.DataFrame(
        [(la, lo) for la, lo, _ in cases], columns=["lat", "lon"]
    ))
    verts = F.array(*[
        F.struct(F.lit(a).cast("long").alias("lat"),
                 F.lit(b).cast("long").alias("lon"))
        for a, b in ring
    ])
    got = df.select(
        "lat", "lon", point_in_polygon("lat", "lon", verts).alias("i")
    ).collect()
    want = {(la, lo): exp for la, lo, exp in cases}
    for r in got:
        assert r.i == want[(r.lat, r.lon)], (r.lat, r.lon, r.i)
