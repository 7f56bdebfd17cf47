"""Spatial grid operators — the scalable join pattern for
geo-tagged corpora (store/dedup points of interest, geo-stratify
training data, nearest-facility analytics).

Coordinates are INTEGER micro-degrees (1e-6°, the common wire
format): all distances are exact integer squared sums in quantized
planar space — no trig, no floats — so every result hash-replays in
the SQL oracle, and no libm divergence between engines can bite.
(For continental extents a production caller projects first; the
grid machinery is projection-agnostic.)

Scale shape: the classic grid-partitioned spatial join. Points
bucket into step-sized cells (one hash-agg or map-only stamp);
a bounded-radius query probes only the (2·ceil(r/step)+1)² cell
neighborhood, so the candidate join is |queries| × local density,
never |queries| × |corpus|. Dense-cell skew is ordinary join skew —
AQE or the dq_skew_report → salt pipeline applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["grid_cell", "radius_knn", "cell_density"]


def grid_cell(lat_col, lon_col, step: int):
    """(cell_lat, cell_lon) floor-grid coordinates of a point in
    micro-degrees — the single bucketing definition shared by build
    and probe sides (and mirrored in the oracle SQL)."""
    return (
        F.floor(F.col(lat_col) / F.lit(step)).cast("long"),
        F.floor(F.col(lon_col) / F.lit(step)).cast("long"),
    )


def radius_knn(points: DataFrame, p_id: str, p_lat: str, p_lon: str,
               queries: DataFrame, q_id: str, q_lat: str, q_lon: str,
               radius: int, k: int, step: int | None = None,
               ) -> DataFrame:
    """k nearest ``points`` within ``radius`` micro-degrees of each
    query (bounded-radius kNN — the semantics a grid can serve
    EXACTLY: every point within the radius lives in a probed cell,
    so there are no false negatives by construction).

    Returns (query_id, point_id, dist2, rk), rk = 1..k ordered by
    (dist2, point_id) — a total order, so ties are deterministic.
    Queries with nothing in range produce no rows.

    Plan: points get cell stamps (map-only); each query explodes to
    its (2·ceil(r/step)+1)² probe cells; an equi-join on the cell
    key pairs queries with local candidates only; the exact integer
    circle filter and a per-query rank window finish. Cost is
    |queries| × ring² × density — never a cross join, never a
    corpus-wide shuffle beyond the one candidate equi-join."""
    step = step or radius
    ring = -(-radius // step)  # ceil
    p_cl, p_cn = grid_cell(p_lat, p_lon, step)
    pts = points.select(
        F.col(p_id).alias("_pid"),
        F.col(p_lat).alias("_plat"), F.col(p_lon).alias("_plon"),
        p_cl.alias("_cl"), p_cn.alias("_cn"),
    )
    q_cl, q_cn = grid_cell(q_lat, q_lon, step)
    offs = list(range(-ring, ring + 1))
    qs = queries.select(
        F.col(q_id).alias("_qid"),
        F.col(q_lat).alias("_qlat"), F.col(q_lon).alias("_qlon"),
        q_cl.alias("_qcl"), q_cn.alias("_qcn"),
    ).select(
        "*",
        F.explode(F.array(*[F.lit(o) for o in offs])).alias("_dl"),
    ).select(
        "*",
        F.explode(F.array(*[F.lit(o) for o in offs])).alias("_dn"),
    ).select(
        "_qid", "_qlat", "_qlon",
        (F.col("_qcl") + F.col("_dl")).alias("_cl"),
        (F.col("_qcn") + F.col("_dn")).alias("_cn"),
    )
    # widen BEFORE squaring: with IntegerType micro-degree columns
    # the delta itself fits int, but its square past ~46k micro-deg
    # wraps 32 bits (wrong ranks or ANSI ARITHMETIC_OVERFLOW)
    dlat = (F.col("_plat") - F.col("_qlat")).cast("long")
    dlon = (F.col("_plon") - F.col("_qlon")).cast("long")
    dist2 = dlat * dlat + dlon * dlon
    cand = (
        qs.join(pts, ["_cl", "_cn"])
        .select(
            F.col("_qid").alias("query_id"),
            F.col("_pid").alias("point_id"),
            dist2.cast("long").alias("dist2"),
        )
        .filter(F.col("dist2") <= F.lit(radius) * F.lit(radius))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("dist2"), F.asc("point_id"))
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def cell_density(points: DataFrame, lat_col: str, lon_col: str,
                 step: int, top_n: int = 20) -> DataFrame:
    """The heatmap query: points per grid cell, densest ``top_n``
    first (count desc, then cell coords asc for a total order). One
    hash-agg shuffle on the cell key + a TakeOrdered top-n."""
    cl, cn = grid_cell(lat_col, lon_col, step)
    return (
        points.groupBy(cl.alias("cell_lat"), cn.alias("cell_lon"))
        .agg(F.count(F.lit(1)).alias("n_points"))
        .orderBy(F.desc("n_points"), F.asc("cell_lat"),
                 F.asc("cell_lon"))
        .limit(top_n)
    )


def point_in_polygon(lat_col, lon_col, verts_col):
    """EXACT integer ray-casting point-in-polygon test as a pure
    Column expression (no trig, no floats, no UDF): cast a ray in
    the +lon direction and count edge crossings with the half-open
    rule ``(y1 > py) != (y2 > py)``; the "ray passes left of the
    intersection" comparison is cross-multiplied by (y2 - y1) with
    the inequality flipped for descending edges, so every operand
    stays an exact integer and the SQL oracle replays bit-for-bit.

    ``verts_col`` is an ``array<struct<lat: long, lon: long>>``
    simple ring (first vertex NOT repeated). Returns a boolean
    Column: odd crossing count = inside. Cost is O(vertices) per
    (point, polygon) pair inside whole-stage codegen — pair small
    polygon sets with ``F.broadcast`` and the corpus never
    shuffles."""
    py, px = F.col(lat_col), F.col(lon_col)
    n = F.size(verts_col)

    def crossing(i):
        a = F.element_at(verts_col, i + 1)
        b = F.element_at(verts_col, ((i + 1) % n) + 1)
        y1, x1, y2, x2 = a["lat"], a["lon"], b["lat"], b["lon"]
        straddles = (y1 > py) != (y2 > py)
        d = y2 - y1
        left = (px - x1) * d
        right = (x2 - x1) * (py - y1)
        hit = F.when(d > 0, left < right).otherwise(left > right)
        return F.when(straddles & hit, 1).otherwise(0)

    crossings = F.aggregate(
        F.sequence(F.lit(0), n - 1), F.lit(0),
        lambda acc, i: acc + crossing(i),
    )
    return crossings % 2 == 1
