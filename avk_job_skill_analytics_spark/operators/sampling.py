"""Sampling (SURVEY.md §2.6 O4).

The reference draws a seeded exact-n sample
(`df.sample(n, random_state=42)`, src/data_extract.py:100-101) before
its expensive LLM enrichment. Three Spark-native recipes with
different scale/determinism trade-offs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import knuth_bucket


def sample_exact_n(df: DataFrame, n: int, seed: int = 42) -> DataFrame:
    """Exact-n seeded sample — closest to pandas `.sample(n, seed)`.
    Global TakeOrdered over rand(seed): bounded heap per partition,
    single N-row merge. Fine for the reference's n~250; for huge n
    prefer `sample_fraction`."""
    return (
        df.withColumn("_r", F.rand(seed))
        .orderBy("_r")
        .limit(n)
        .drop("_r")
    )


def sample_fraction(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """Approximate-fraction Bernoulli sample — fully parallel, no
    shuffle, the scale path. Row count is binomial around
    fraction*N, not exact (documented divergence from pandas)."""
    return df.sample(withReplacement=False, fraction=fraction, seed=seed)


def sample_hash_bucket(df: DataFrame, key: str, pct: int,
                       modulus: int = 100) -> DataFrame:
    """Deterministic, engine-portable sample: keep rows whose
    multiplicative key hash falls in the first `pct` of `modulus`
    buckets. No shuffle, no RNG — the same rows are selected on any
    engine, which makes it oracle-verifiable and stable across reruns
    (useful for repeatable pipeline debugging at 100 TB)."""
    bucket = knuth_bucket(F.col(key), modulus)
    return df.filter(bucket < pct)


def priority_sample(df: DataFrame, key: str, k: int,
                    seed: str = "psample-v1") -> DataFrame:
    """Bottom-k priority sample — the MERGEABLE exact-k uniform sample
    (the order-statistics trick behind KMV sketches and distributed
    reservoirs): every row gets a deterministic priority
    ``md5_long(seed|key)`` and the k smallest win. Because min-k of a
    union equals min-k of min-k's, partial samples from partitions,
    days, or micro-batches merge associatively and idempotently into
    exactly the sample the one-shot pass would draw — no RNG state to
    coordinate. Plan: TakeOrderedAndProject (per-partition bounded
    heap + one k-row merge), never a global sort."""
    from .hashing import md5_long

    pr = md5_long(
        F.concat(F.lit(seed + "|"), F.col(key).cast("string"))
    )
    return (
        df.withColumn("priority", pr)
        .orderBy("priority")
        .limit(k)
    )


def sample_by(df: DataFrame, strata_col: str, fractions: dict,
              seed: int = 42) -> DataFrame:
    """Spark-native stratified Bernoulli sample (`df.sampleBy`): each
    stratum keeps ~its fraction of rows. Fully parallel, no shuffle;
    row counts are binomial, and the RNG is engine-private — use
    :func:`sample_stratified` when reruns/oracles must select the
    exact same rows."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def sample_stratified(df: DataFrame, strata_col: str, key: str,
                      pcts: dict, default_pct: int = 0,
                      modulus: int = 100) -> DataFrame:
    """Deterministic stratified sample: per-stratum keep-rates applied
    through the same multiplicative hash-bucket rule as
    :func:`sample_hash_bucket`, so any engine selects the exact same
    rows (oracle-verifiable, rerun-stable).

    ``pcts`` maps stratum value -> integer percent kept (out of
    ``modulus``); unlisted strata keep ``default_pct``. No shuffle and
    no RNG: the filter is a scan-level CASE over a hash of the key, so
    at 100 TB this is a single embarrassingly-parallel pass."""
    bucket = knuth_bucket(F.col(key), modulus)
    pct = F.lit(default_pct)
    for value, p in pcts.items():
        pct = F.when(F.col(strata_col) == value, F.lit(p)).otherwise(pct)
    return df.filter(bucket < pct)


def sample_weighted(df: DataFrame, key: str, weight,
                    modulus: int = 1_000_000) -> DataFrame:
    """Deterministic importance sampling: keep each row with
    probability equal to its per-row ``weight`` expression (clamped to
    [0,1]) — the standard quality-weighted downsampling step of a
    training-data mix, made rerun-stable and oracle-verifiable by
    replacing the RNG with the same multiplicative key hash as
    :func:`sample_hash_bucket` (finer-grained: millionths). No
    shuffle; one scan-level comparison per row at any corpus size."""
    bucket = knuth_bucket(F.col(key), modulus)
    w = F.least(F.lit(1.0), F.greatest(F.lit(0.0), weight))
    return df.filter(bucket.cast("double") < w * F.lit(float(modulus)))


def assign_split(df: DataFrame, key: str,
                 splits: dict | None = None,
                 modulus: int = 100) -> DataFrame:
    """Deterministic train/val/test assignment — the dataset-split
    step of a training pipeline, done as a pure column expression so
    the same row lands in the same split on any engine, at any scale,
    on every rerun (no RNG, no shuffle, no state to persist).

    ``splits`` maps split name -> integer share of ``modulus``
    (default train/val/test = 90/5/5; shares must sum to ``modulus``).
    Buckets come from the same multiplicative hash as
    :func:`sample_hash_bucket`; consecutive bucket ranges are carved
    in the dict's iteration order. Adding data never moves an existing
    row between splits — the hash depends only on the key — which is
    the property that keeps eval sets uncontaminated as the corpus
    grows."""
    splits = splits or {"train": 90, "val": 5, "test": 5}
    if sum(splits.values()) != modulus:
        raise ValueError("split shares must sum to modulus")
    bucket = knuth_bucket(F.col(key), modulus)
    expr, lo = None, 0
    for name, share in splits.items():
        lo += share
        cond = bucket < lo
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)


def global_shuffle(df: DataFrame, key: str, seed: int = 7,
                   num_buckets: int = 1024,
                   out: str = "shuffle_pos") -> DataFrame:
    """Deterministic global permutation — the training-order shuffle a
    data pipeline runs last, as a POSITION COLUMN (0-based, dense)
    instead of a physically sorted single stream.

    The naive spelling (ORDER BY hash + an unpartitioned row_number)
    funnels the corpus through one reducer. The scale spelling keyed
    here: md5 the key with the seed, RANGE-bucket the rows on the
    hash's top bits (so bucket order IS hash order — a modulo bucket
    would interleave), rank WITHIN each bucket (windows partitioned by
    bucket — parallel), count per bucket, prefix-sum the (tiny) bucket
    histogram, broadcast the offsets back, position = bucket offset +
    local rank. One window shuffle over the corpus + one broadcast
    join; works unchanged at 10^12 rows with num_buckets ~ cluster
    cores x 4 (md5 uniformity keeps range buckets balanced — no
    sampling pass needed, unlike a generic range partitioner).

    Deterministic and engine-portable (MD5 + integer ops, no RNG), so
    the oracle's naive ORDER BY spelling must agree bit-for-bit.
    Re-seeding re-permutes; appending rows re-ranks only buckets the
    new keys land in... positions after the smallest changed hash
    shift, which is inherent to dense global positions.

    PRECONDITION — ``key`` values must be unique. Rows sharing a key
    share the (_h, key) sort tuple, so row_number breaks the tie by
    partition arrival order and their RELATIVE positions can swap
    between runs (each duplicate still gets a distinct position, and
    all other rows are unaffected). Bit-for-bit stability therefore
    holds only for unique keys; dedupe first, or pass a composite
    key column that is unique."""
    from .hashing import md5_long

    bits = num_buckets.bit_length() - 1
    if (1 << bits) != num_buckets:
        raise ValueError("num_buckets must be a power of two")
    h = md5_long(F.concat(F.col(key).cast("string"), F.lit(f":{seed}")))
    # md5_long yields the top 60 bits of the digest; the top `bits`
    # of those are the range bucket
    b = F.shiftright(h, 60 - bits).cast("int")
    tagged = df.withColumn("_h", h).withColumn("_b", b)
    from pyspark.sql import Window

    w = Window.partitionBy("_b").orderBy("_h", key)
    ranked = tagged.withColumn("_rk", F.row_number().over(w))
    hist = tagged.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
    # prefix sum over the bucket histogram: num_buckets rows, an
    # intentionally tiny unpartitioned window (aggregated frame)
    wo = Window.orderBy("_b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offs = hist.withColumn(
        "_off", F.sum("_n").over(wo) - F.col("_n")
    ).select("_b", "_off")
    return (
        ranked.join(F.broadcast(offs), "_b")
        .withColumn(out, (F.col("_off") + F.col("_rk") - 1).cast("long"))
        .drop("_h", "_b", "_rk", "_off")
    )


def match_distribution(df: DataFrame, id_col: str, group_col: str,
                       weight) -> DataFrame:
    """Deterministic rejection sampling to a TARGET group mix — the
    source-rebalancing primitive of corpus curation (downsample
    over-represented sources so retained counts follow the target
    proportions, keeping as much data as possible).

    ``weight`` is a Column expression over ``group_col`` giving the
    target integer weight w_g. The binding group m (the one whose
    n/w is smallest) is kept whole; every other group g keeps each
    row with probability (n_m * w_g) / (w_m * n_g) via the
    engine-portable Knuth-hash coin — the acceptance test is a pure
    integer comparison (DECIMAL(38,0) products, overflow-safe at
    corpus counts), so the retained set is deterministic and
    oracle-replayable.

    Plan shape: one group-count aggregate, a 1-row broadcast of the
    binding group (tiny |groups|-row ordered pick), then a pure
    map-side filter over the corpus — no window or shuffle touches
    the data rows. Returns the per-group audit (group, n_before,
    target_w, n_after)."""
    grp = F.col(group_col)
    counts = df.groupBy(grp.alias("_g")).agg(
        F.count(F.lit(1)).alias("_n")
    ).withColumn("_w", weight(F.col("_g")))
    binding = (
        counts.orderBy(
            (F.col("_n").cast("double") / F.col("_w")).asc(),
            F.asc("_g"),
        )
        .limit(1)
        .select(F.col("_n").alias("_nm"), F.col("_w").alias("_wm"))
    )
    dec = "decimal(38,0)"
    u = knuth_bucket(F.col(id_col), 1_000_000)
    kept = (
        df.select(F.col(id_col), grp.alias("_g"))
        .withColumn("_u", u)
        .join(F.broadcast(counts), "_g")
        .crossJoin(F.broadcast(binding))
        .filter(
            F.col("_u").cast(dec) * F.col("_wm").cast(dec)
            * F.col("_n").cast(dec)
            < F.lit(1_000_000).cast(dec) * F.col("_nm").cast(dec)
            * F.col("_w").cast(dec)
        )
        .groupBy("_g")
        .agg(F.count(F.lit(1)).alias("_kept"))
    )
    return (
        counts.join(kept, "_g", "left")
        .select(
            F.col("_g").alias(group_col),
            F.col("_n").cast("long").alias("n_before"),
            F.col("_w").cast("long").alias("target_w"),
            F.coalesce(F.col("_kept"), F.lit(0)).cast("long")
            .alias("n_after"),
        )
    )
