"""DP-release mechanism contracts: determinism, bounded magnitude,
suppression, and contribution bounding."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from avk_job_skill_analytics_spark.operators import privacy


def test_noise_deterministic_and_bounded(spark):
    df = spark.createDataFrame(
        [(f"key{i}",) for i in range(200)], ["k"]
    )
    out = df.select(
        "k", privacy.dp_noise(F.col("k"), "seed-a", 0.5).alias("n1"),
        privacy.dp_noise(F.col("k"), "seed-a", 0.5).alias("n2"),
        privacy.dp_noise(F.col("k"), "seed-b", 0.5).alias("other"),
    ).collect()
    mags = [abs(r.n1) for r in out]
    assert all(r.n1 == r.n2 for r in out)           # replayable
    assert max(mags) <= 12                          # truncation cap
    assert any(r.n1 != r.other for r in out)        # seed matters
    # magnitude tail roughly geometric: P(|n|>=1) ~ exp(-eps) ~ 0.61
    frac_nonzero = sum(m >= 1 for m in mags) / len(mags)
    assert abs(frac_nonzero - math.exp(-0.5)) < 0.15


def test_thresholds_monotone():
    t = privacy.geometric_thresholds(0.5, cap=12)
    assert t == sorted(t) and len(set(t)) == 12
    assert 0 < t[0] < (1 << 59) and t[-1] < (1 << 59)


def test_release_suppresses_small_groups(spark):
    # a 2-row group can never clear tau=20 (max noise is +12)
    rows = [("big", i) for i in range(100)] + [("tiny", 0), ("tiny", 1)]
    df = spark.createDataFrame(rows, ["g", "x"])
    agg = df.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    noisy = agg.withColumn(
        "noisy_n", F.col("n") + privacy.dp_noise(F.col("g"), "s", 0.5)
    ).filter(F.col("noisy_n") >= 20)
    got = {r.g for r in noisy.collect()}
    assert got == {"big"}


def test_contribution_bounding_caps_bot_user(spark):
    # one bot user with 1000 max-value events moves the bounded sum by
    # at most cap_events * clamp = 150.00
    from pyspark.sql import Window

    rows = [(i, 1, 9_999.0) for i in range(1000)] + [
        (10_000 + i, 100 + i, 10.0) for i in range(20)
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "value"])
    w = Window.partitionBy("user_id").orderBy("event_id")
    cents = F.floor(
        F.least(F.greatest(F.col("value"), F.lit(0.0)), F.lit(50.0)) * 100
    ).cast("long")
    capped = (
        df.select("user_id", "event_id", cents.alias("cents"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
    )
    total = capped.agg(F.sum("cents")).collect()[0][0]
    # bot: 3 * 5000 cents; honest users: 20 * 1000 cents
    assert total == 3 * 5000 + 20 * 1000
