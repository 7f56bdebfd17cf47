"""Distributed dense linear algebra over embedding columns.

The communication pattern that makes second-order statistics viable at
100 TB: never shuffle the vectors. Each partition folds its rows into
a d x d partial Gram matrix locally (numpy matmul over an Arrow batch),
and only those d*(d+1)/2-entry partials — kilobytes, independent of
row count — move in the final aggregate. This is the standard
tree-aggregated Gram/covariance scheme (e.g. Spark MLlib's
RowMatrix.computeGramianMatrix; re-derived here over DataFrames so the
result is engine-checkable).

Exactness: inputs are quantized to integer ``scale``-ths BEFORE any
sum (float32 -> float64 widening is exact, one IEEE multiply, floor).
All accumulation is int64, so the Gram entries are bit-identical
across engines, partition layouts, and reruns — unlike a float
covariance, whose partition-order accumulation the DuckDB oracle could
never reproduce. |q| <= scale and int64 holds ~9.2e18, so overflow
needs n * (scale*max|v|)^2 > 9.2e18 — at scale=1e6 and unit-normish
embeddings that is ~3e6 rows per PARTITION-fold times... the partials
are per-partition, bounded by rows-per-partition (~50k by SCALING.md),
and the final cross-partition sum is widened to DECIMAL(38,0) before
the cast back, so the headroom at cluster scale is 1e20+.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT_SCALE = 10 ** 6


def gram_matrix(df: DataFrame, vec_col: str, d: int,
                scale: int = QUANT_SCALE) -> DataFrame:
    """Upper-triangle integer Gram matrix of the quantized vectors:
    (i, j, gram) for 1 <= i <= j <= d, where gram =
    sum over rows of floor(v_i*scale) * floor(v_j*scale).

    One mapInPandas pass emitting d*(d+1)/2 partial rows per
    partition, one groupBy sum over (i, j) — the shuffle payload is
    O(d^2 * partitions), never O(rows)."""
    iu, ju = zip(*[(i, j) for i in range(1, d + 1)
                   for j in range(i, d + 1)])

    def part(pdfs):
        import numpy as np
        import pandas as pd

        acc = np.zeros((d, d), dtype=np.int64)
        for pdf in pdfs:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            q = np.floor(m * scale).astype(np.int64)
            acc += q.T @ q
        tri = acc[np.array(iu) - 1, np.array(ju) - 1]
        yield pd.DataFrame(
            {"i": np.array(iu, dtype=np.int32),
             "j": np.array(ju, dtype=np.int32),
             "part_gram": tri}
        )

    partials = df.select(vec_col).mapInPandas(part, "i int, j int, part_gram long")
    return (
        partials.groupBy("i", "j")
        .agg(
            F.sum(F.col("part_gram").cast("decimal(38,0)"))
            .cast("long")
            .alias("gram")
        )
    )


def pca_top_component(df: DataFrame, vec_col: str, d: int,
                      scale: int = QUANT_SCALE) -> DataFrame:
    """Leading principal component of the embedding cloud — the
    direction a curation pipeline whitens against or prunes along
    (e.g. SemDeDup-style anisotropy checks).

    Distributed part: the integer Gram matrix above plus the integer
    column-sum vector — both O(d^2)/O(d) aggregates. Driver part: a
    d x d eigensolve (trivial; d is 64-1024 for embedding tables,
    never row-scaled). Sign convention: the largest-|loading|
    coordinate is made positive so the answer is unique. Returns
    (dim, loading, explained_frac) with loading the unit eigenvector
    entry, rounded to 6 to absorb LAPACK's platform variance."""
    import numpy as np

    g = {(r["i"], r["j"]): r["gram"]
         for r in gram_matrix(df, vec_col, d, scale).collect()}
    sums_rows = (
        df.select(F.posexplode(vec_col).alias("p", "x"))
        .groupBy("p")
        .agg(
            F.sum(F.floor(F.col("x").cast("double") * scale).cast("long"))
            .alias("s")
        )
        .collect()
    )
    n = df.count()
    s = np.zeros(d)
    for r in sums_rows:
        s[r["p"]] = r["s"]
    gm = np.zeros((d, d))
    for (i, j), v in g.items():
        gm[i - 1, j - 1] = v
        gm[j - 1, i - 1] = v
    cov = (gm - np.outer(s, s) / n) / n / (scale * scale)
    w, vecs = np.linalg.eigh(cov)
    top = vecs[:, -1]
    top = top * np.sign(top[np.argmax(np.abs(top))] or 1.0)
    frac = float(w[-1] / w.sum()) if w.sum() else 0.0
    spark = df.sparkSession
    rows = [(i + 1, round(float(top[i]), 6), round(frac, 6))
            for i in range(d)]
    return spark.createDataFrame(
        rows, "dim int, loading double, explained_frac double"
    )
