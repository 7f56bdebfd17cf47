"""Decision-stump split search (beyond-reference).

The tree-learner node primitive done Spark-first: find, for every
feature, the threshold that best separates a binary label by the
Gini criterion. One corpus scan computes each feature's grid-bucket
index as a pure Column expression (``size(filter(array(<grid>),
t -> x > t))`` — no join, no UDF), a ``stack`` pivots the d bucket
ids to long form row-locally, and ONE partial+final aggregate
reduces the corpus to the tiny (feature × bucket) class histogram —
O(d·|grid|) rows on the wire regardless of corpus size. Threshold
scoring then runs on that histogram frame (cumulative sums via a
bounded range join against the literal grid), so the split search
costs a single scan + a single micro-shuffle at any scale — the
exact shape a distributed GBDT/random-forest node evaluation uses
(per-feature quantized histograms, cf. LightGBM's histogram
algorithm).

Engine-exactness: bucket ids and class counts are integers; the
Gini purity score ``(posL²+negL²)/nL + (posR²+negR²)/nR`` is
computed in DOUBLE with a fixed association order — every product,
sum and division is individually correctly rounded, so Spark and
the DuckDB oracle land on bit-identical doubles; the published
``score_fp`` is its floored micro-unit BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .clustering import sql_double


def bucket_expr(x_sql: str, thresholds: list[float]) -> str:
    """Grid-bucket index: |{t in grid : x > t}| — 0..len(grid).
    ``x <= grid[i]``  ⇔  ``bucket <= i``."""
    arr = ", ".join(sql_double(t) for t in thresholds)
    return f"size(filter(array({arr}), t -> ({x_sql}) > t))"


def bucket_expr_duckdb(x_sql: str, thresholds: list[float]) -> str:
    """The oracle's spelling of bucket_expr (DuckDB list lambdas)."""
    arr = ", ".join(sql_double(t) for t in thresholds)
    return f"len(list_filter([{arr}], t -> ({x_sql}) > t))"


def score_sql(pos_l: str, n_l: str, pos_t: str, n_t: str) -> str:
    """Gini purity of a (left, right) split with a pinned association
    order, from the left cumulative counts and the feature totals.
    Shared verbatim by the Spark plan and the DuckDB oracle so both
    engines compute bit-identical doubles."""
    neg_l = f"({n_l} - {pos_l})"
    pos_r = f"({pos_t} - {pos_l})"
    n_r = f"({n_t} - {n_l})"
    neg_r = f"({n_r} - {pos_r})"
    left = (f"(((CAST({pos_l} AS DOUBLE) * {pos_l})"
            f" + (CAST({neg_l} AS DOUBLE) * {neg_l}))"
            f" / CAST({n_l} AS DOUBLE))")
    right = (f"(((CAST({pos_r} AS DOUBLE) * {pos_r})"
             f" + (CAST({neg_r} AS DOUBLE) * {neg_r}))"
             f" / CAST({n_r} AS DOUBLE))")
    return f"({left} + {right})"


def gini_stump(df: DataFrame,
               features: list[tuple[str, str, list[float]]],
               label_col: str) -> DataFrame:
    """Best threshold split per feature.

    ``features``: (name, x_sql, thresholds) triples; ``label_col``
    is a 0/1-valued SQL expression. Returns one row per feature (its
    best split, ties broken by lower threshold) ordered by score
    descending — the multi-feature argmax a tree booster runs per
    node.
    """
    spark = df.sparkSession
    buckets = [
        f"{bucket_expr(x, thr)} AS b_{name}"
        for name, x, thr in features
    ]
    stack_args = ", ".join(
        f"'{name}', b_{name}" for name, _, _ in features
    )
    hist = (
        df.selectExpr(f"CAST({label_col} AS BIGINT) AS y", *buckets)
        .selectExpr(
            f"stack({len(features)}, {stack_args}) AS (feature, bucket)",
            "y",
        )
        .groupBy("feature", "bucket")
        .agg({"*": "count", "y": "sum"})
        .withColumnRenamed("count(1)", "cnt")
        .withColumnRenamed("sum(y)", "pos")
    )
    hist.createOrReplaceTempView("_stump_hist")
    grid_rows = ", ".join(
        f"('{name}', {i}, {sql_double(t)})"
        for name, _, thr in features
        for i, t in enumerate(thr)
    )
    spark.sql(
        f"SELECT col1 AS feature, col2 AS i, col3 AS thr "
        f"FROM VALUES {grid_rows}"
    ).createOrReplaceTempView("_stump_grid")
    score = score_sql("c.pos_l", "c.n_l", "t.pos_t", "t.n_t")
    return spark.sql(f"""
        WITH tot AS (
          SELECT feature, sum(cnt) AS n_t, sum(pos) AS pos_t
          FROM _stump_hist GROUP BY feature),
        cum AS (
          SELECT g.feature, g.i, g.thr,
                 sum(h.cnt) AS n_l, sum(h.pos) AS pos_l
          FROM _stump_grid g JOIN _stump_hist h
            ON h.feature = g.feature AND h.bucket <= g.i
          GROUP BY g.feature, g.i, g.thr),
        scored AS (
          SELECT c.feature, c.thr,
                 CAST(c.n_l AS BIGINT) AS n_left,
                 CAST(c.pos_l AS BIGINT) AS pos_left,
                 CAST(t.n_t - c.n_l AS BIGINT) AS n_right,
                 CAST(t.pos_t - c.pos_l AS BIGINT) AS pos_right,
                 CAST(floor(({score}) * 1000000.0) AS BIGINT)
                     AS score_fp
          FROM cum c JOIN tot t ON t.feature = c.feature
          WHERE c.n_l > 0 AND t.n_t - c.n_l > 0),
        ranked AS (
          SELECT *, row_number() OVER (
                   PARTITION BY feature
                   ORDER BY score_fp DESC, thr) AS rk
          FROM scored)
        SELECT feature, thr AS threshold, n_left, pos_left,
               n_right, pos_right, score_fp
        FROM ranked WHERE rk = 1
        ORDER BY score_fp DESC, feature, threshold
    """)
