"""Experiment (A/B test) readout over an event stream — the
analysis-side companion of the engine's hash-based assignment
primitives (``sampling.assign_split``).

A deployed curation/product change is judged by exactly this query:
users deterministically assigned to arms by the engine-portable
Knuth-hash coin (no assignment table to store or join — the user id
IS the assignment), a per-user conversion flag, per-arm counts, and
the pooled two-proportion z statistic. Everything integer stays
integer (counts, fixed-point rates); the z-score's float pipeline
uses one canonical operand order on both engines, so even the
statistic replays bit-for-bit in the oracle.

Scale shape: one per-user aggregate (map-side combined), one 2-row
arm aggregate, then 1-row broadcasts — the corpus is touched once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ab_test_readout"]


def ab_test_readout(events: DataFrame, user_col: str,
                    conv_expr) -> DataFrame:
    """One-row experiment card: (n_a, n_b, conv_a, conv_b,
    rate_a_fp, rate_b_fp, lift_fp, z_fp).

    Arm = Knuth multiplicative hash of the user id mod 2 (the
    engine-portable coin shared with o4_sample_hash); conversion =
    the user emitted >= 1 event satisfying the boolean Column
    ``conv_expr``; z is the pooled two-proportion statistic with
    every double op in one canonical order (NULL when the pooled
    rate is degenerate — 0% or 100% convert, zero standard error).
    1e-6 fixed point throughout."""
    converted = events.groupBy(F.col(user_col)).agg(
        F.max(conv_expr.cast("int")).alias("_c")
    )
    arm = (
        (F.col(user_col) * F.lit(2654435761))
        % F.lit(4294967296) % F.lit(2)
    )
    per_arm = converted.withColumn("_arm", arm).groupBy("_arm").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_c").alias("_cv"),
    )
    a = per_arm.filter(F.col("_arm") == 0).select(
        F.col("_n").alias("_na"), F.col("_cv").alias("_ca")
    )
    b = per_arm.filter(F.col("_arm") == 1).select(
        F.col("_n").alias("_nb"), F.col("_cv").alias("_cb")
    )
    d = "double"
    pa = F.col("_ca").cast(d) / F.col("_na")
    pb = F.col("_cb").cast(d) / F.col("_nb")
    p = (F.col("_ca") + F.col("_cb")).cast(d) \
        / (F.col("_na") + F.col("_nb"))
    se = F.sqrt(
        p * (F.lit(1.0) - p)
        * (F.lit(1.0) / F.col("_na") + F.lit(1.0) / F.col("_nb"))
    )
    mil = F.lit(1_000_000)
    fp6 = lambda x: F.floor(  # noqa: E731 — shared half-up convention
        F.round(x, 6) * F.lit(1_000_000.0) + F.lit(0.5)
    ).cast("long")
    return a.crossJoin(F.broadcast(b)).select(
        F.col("_na").cast("long").alias("n_a"),
        F.col("_nb").cast("long").alias("n_b"),
        F.col("_ca").cast("long").alias("conv_a"),
        F.col("_cb").cast("long").alias("conv_b"),
        F.floor(mil * F.col("_ca") / F.col("_na")).cast("long")
        .alias("rate_a_fp"),
        F.floor(mil * F.col("_cb") / F.col("_nb")).cast("long")
        .alias("rate_b_fp"),
        fp6(pb - pa).alias("lift_fp"),
        F.when(se > F.lit(0.0), fp6((pb - pa) / se)).alias("z_fp"),
    )
