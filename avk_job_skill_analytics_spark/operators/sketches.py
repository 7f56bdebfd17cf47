"""KMV (k-minimum-values / bottom-k) distinct sketches.

``agg_approx_distinct`` covers HyperLogLog++, but HLL register
contents are engine-specific — the driver can only rows-only-check
it. KMV (Bar-Yossef et al., "Counting distinct elements in a data
stream", RANDOM'02; Beyer et al. SIGMOD'07 for the unbiased
estimator) is the sketch you reach for when the pipeline ALSO needs
cross-engine reproducibility: the sketch is just the k smallest
values of a deterministic hash, so two engines that share the hash
produce byte-identical sketches and identical estimates — fully
oracle-verifiable, like every other operator here.

Properties the 100 TB design point cares about:

- one hash + one bounded per-group top-k — no full distinct shuffle;
  the shuffled payload per group is capped at k longs;
- MERGEABLE: union two sketches and re-take the k smallest — daily
  sketches roll up to monthly without touching raw data
  (:func:`kmv_merge`);
- estimator (k-1) * H / h_k (H = hash-space size, h_k = k-th
  smallest hash) with exact integer arithmetic, so the estimate is
  bit-identical across engines and runs — usable as a stable
  filter/alert threshold, which an HLL estimate is not.

All hashing is the engine-portable 60-bit MD5 family
(operators/hashing.py); error is ~1/sqrt(k-2) (≈13% at k=64,
≈6% at k=256).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .hashing import md5_long

HASH_SPACE = 1 << 60  # md5_long yields the top 60 bits of the digest


def kmv_sketch(df: DataFrame, group_cols: list[str], value_col: str,
               k: int = 64) -> DataFrame:
    """Per-group KMV sketch: (group..., sketch array<long> of the k
    smallest distinct hash values, ascending).

    Shape: distinct on (group, hash) — one hash-aggregate shuffle —
    then a per-group bounded rank. The rank window sorts only each
    group's distinct hashes; payload leaving the shuffle is <= k rows
    per group either way because row_number is applied before the
    collect."""
    h = (
        df.select(*group_cols, md5_long(F.col(value_col).cast("string")).alias("_h"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("_h")
    return (
        h.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list("_h")).alias("sketch"))
    )


def kmv_estimate(sketch: Column, k: int = 64) -> Column:
    """Distinct-count estimate from a KMV sketch column: exact size
    when the group had fewer than k distinct values (the sketch IS
    the distinct set), else (k-1) * HASH_SPACE div h_k in exact
    decimal arithmetic (no float rounding — engine-portable)."""
    h_k = F.element_at(sketch, k)
    num = (
        F.lit(k - 1).cast("decimal(38,0)")
        * F.lit(HASH_SPACE).cast("decimal(38,0)")
    )
    return F.when(F.size(sketch) < k, F.size(sketch).cast("long")).otherwise(
        F.floor(num / h_k.cast("decimal(38,0)")).cast("long")
    )


def kmv_merge(a: Column, b: Column, k: int = 64) -> Column:
    """Merge two sketches: union, dedup, keep the k smallest — the
    rollup operation (day -> month) that never touches raw data."""
    return F.slice(F.array_sort(F.array_union(a, b)), 1, k)
