"""Distributed Bloom-filter build + broadcast prefilter.

The 100 TB decontamination join (operators/dedup.decontaminate) keys a
shuffle by SHINGLE over the whole training corpus — linear, but every
training shingle still flows into the join. When the held-out side is
small (eval suites are thousands of docs vs billions), the classic fix
is a Bloom prefilter: build an m-bit filter over the held-out shingle
set, broadcast it (m/64 longs — kilobytes), and drop non-matching
training shingles AT THE SCAN, before the shuffle. Only true hits plus
an ~(1-e^(-jn/m))^j false-positive sliver reach the exact join, which
then removes the false positives — the final answer is bit-identical
to the unfiltered join.

Spark's optimizer injects a similar runtime filter for plain equi-joins
(spark.sql.optimizer.runtime.bloomFilter.enabled), but not through this
explode → distinct → join pipeline shape, and not engine-portably: this
filter is built from the md5/affine hash family in operators/hashing.py,
so the same bitmap can be exported to any engine that shares the hash.

Everything is deterministic: fixed hash coefficients (seed below), a
fixed power-of-two m, and an OR-aggregated bitmap — so the filter (and
therefore the plan) is reproducible run-to-run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import MERSENNE_P, md5_long, minhash_coeffs

BLOOM_SEED = 11


def bloom_bitmap(values: DataFrame, value_col: str, m_bits: int = 1 << 17,
                 j: int = 3) -> DataFrame:
    """1-row DataFrame holding an m_bits Bloom filter over the distinct
    values of ``value_col``, as ``bloom array<long>`` (m_bits/64 words,
    0-based, little-endian bits within a word).

    Fully distributed: each value expands to its j bit positions, the
    positions OR-aggregate into <= m_bits/64 (word, bits) rows, and one
    final 1-row aggregate assembles the dense array. Nothing larger
    than the bitmap itself ever concentrates anywhere.

    m_bits must be a power of two well below 2^31 (positions come from
    the affine family mod m — the double-mod bias vs MERSENNE_P is
    < m/P, irrelevant for m <= 2^20)."""
    assert m_bits % 64 == 0 and m_bits & (m_bits - 1) == 0
    n_words = m_bits // 64
    h = (md5_long(F.col(value_col).cast("string")) % MERSENNE_P).alias("_h")
    probes = [
        (((F.lit(a) * F.col("_h") + F.lit(b)) % MERSENNE_P) % m_bits)
        for a, b in minhash_coeffs(j, seed=BLOOM_SEED)
    ]
    pos = (
        values.select(h)
        .select(F.explode(F.array(*probes)).alias("p"))
        .distinct()
    )
    words = pos.groupBy((F.col("p") / 64).cast("int").alias("w")).agg(
        F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))"))
        .alias("bits")
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("_m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(F.element_at("_m", i), F.lit(0).cast("long")),
        ).alias("bloom")
    )


def bloom_might_contain(value: Column, m_bits: int = 1 << 17,
                        j: int = 3) -> Column:
    """Membership test against a ``bloom`` column in scope (join the
    1-row :func:`bloom_bitmap` frame in with a broadcast crossJoin).
    Pure JVM expressions — the test runs inside whole-stage codegen at
    the scan, which is the whole point of the prefilter."""
    h = md5_long(value.cast("string")) % MERSENNE_P
    cond = F.lit(True)
    for a, b in minhash_coeffs(j, seed=BLOOM_SEED):
        p = ((F.lit(a) * h + F.lit(b)) % MERSENNE_P) % m_bits
        word = F.element_at("bloom", (p / 64).cast("int") + 1)
        hit = (
            word.bitwiseAND(
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
                )
            )
            != 0
        )
        cond = cond & hit
    return cond


def bloom_decontaminate(df: DataFrame, benchmark: DataFrame, id_col: str,
                        text_col: str, k: int = 5,
                        m_bits: int = 1 << 17, j: int = 3) -> DataFrame:
    """decontaminate() with a Bloom prefilter on the training side —
    bit-identical output (the exact join removes the filter's false
    positives), but at 100 TB the shingle shuffle carries only the
    ~fp-rate sliver of the corpus instead of all of it.

    Cites the same contract as operators/dedup.decontaminate (GPT-3
    appendix C n-gram overlap rule): returns (id, n_shared,
    contaminated) for every training doc."""
    from .dedup import word_shingles

    bench_sh = (
        word_shingles(benchmark, id_col, text_col, k)
        .select("shingle")
        .distinct()
    )
    bloom = bloom_bitmap(bench_sh, "shingle", m_bits, j)
    doc_sh = word_shingles(df, id_col, text_col, k)
    survivors = doc_sh.crossJoin(F.broadcast(bloom)).filter(
        bloom_might_contain(F.col("shingle"), m_bits, j)
    )
    hits = (
        survivors.join(bench_sh, "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        df.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
            (F.coalesce("n_shared", F.lit(0)) > 0).alias("contaminated"),
        )
    )
