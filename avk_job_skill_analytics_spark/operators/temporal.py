"""Temporal joins Spark lacks as built-ins — expressed as one shuffle.

As-of join ("for each left row, the latest right row at or before its
timestamp, per key") is the backbone of attribution, point-in-time
feature lookup, and slowly-changing-dimension reads. Spark has no
native operator; the naive spelling — equi-join on key, filter
``r.t <= l.t``, then argmax per left row — materializes every
(left × earlier-right) pair before pruning, which explodes on hot
keys.

The scalable spelling used here is the union trick: tag both inputs,
union them into one frame, and run a single
``last(payload, ignorenulls=True)`` window ordered by
(time, side, payload) per key. Every right row's payload flows
forward to exactly the left rows it should match — one shuffle on the
key, no pair blow-up, O(n log n) per partition for the sort. Skewed
keys are handled the same way any window is (AQE cannot split a
window partition, so pre-bucket pathological keys upstream if one key
exceeds a task).

DuckDB's native ``ASOF JOIN`` provides the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_time: str, right_time: str) -> DataFrame:
    """Backward as-of join: append each right row's payload columns to
    every left row with ``left[left_time] >= right[right_time]``
    (latest such right row wins; inclusive at equality).

    ``right``'s non-key columns (including ``right_time``) become the
    appended payload — rename them before the call if they collide
    with left column names. Left rows with no eligible right row keep
    NULL payload (left-join semantics; filter afterwards for inner).

    Ties: several right rows per (key, time) are broken by the
    largest payload struct (field order = right's column order) —
    deterministic, but pre-aggregate the right side to one row per
    (key, time) when you need a specific winner."""
    payload = [c for c in right.columns if c != on]
    r = right.select(
        F.col(on),
        F.col(right_time).alias("_t"),
        F.struct(*payload).alias("_rpay"),
        F.lit(0).alias("_side"),
    )
    l = left.withColumn("_t", F.col(left_time)).withColumn(
        "_side", F.lit(1)
    )
    u = l.unionByName(r, allowMissingColumns=True)
    # right rows sort before left rows at equal time (inclusive >=);
    # last() then carries the newest payload forward to each left row
    w = (
        Window.partitionBy(on)
        .orderBy(F.asc("_t"), F.asc("_side"), F.asc("_rpay"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = u.withColumn("_m", F.last("_rpay", ignorenulls=True).over(w))
    out_cols = [c for c in left.columns] + [
        F.col(f"_m.{c}").alias(c) for c in payload
    ]
    return matched.filter(F.col("_side") == 1).select(*out_cols)


def decayed_counts(df: DataFrame, key_col: str, ts_col: str,
                   value_col: str, half_life_days: int = 7,
                   digits: int = 6) -> DataFrame:
    """Exponentially time-decayed engagement features per key: each
    event contributes ``2^(-age_days / half_life)`` toward a decayed
    count and ``value * 2^(-age_days / half_life)`` toward a decayed
    value sum, anchored at the corpus max date (a 1-row broadcast, so
    the feature is deterministic for a given snapshot). The standard
    recency-weighted feature of engagement/CTR pipelines — a 30-day
    half-life count is "how active is this user lately" in one
    number.

    Engine-exactness: the decay weight is quantized to 10^-digits
    fixed point PER EVENT before the integer sum (the repo's shared
    discipline — summation order can never matter), and the age is a
    whole-day integer so ``pow(2, -d/h)`` sees identical arguments on
    both engines. One map-side-combined aggregate; no window, no
    shuffle beyond the groupBy.

    Returns (key, n_events, decayed_fp, decayed_value_fp)."""
    ref = df.agg(
        F.max(F.to_date(F.col(ts_col))).alias("_ref")
    )
    half = F.lit(float(half_life_days))
    age = F.datediff(F.col("_ref"), F.to_date(F.col(ts_col)))
    w = F.pow(F.lit(2.0), -age.cast("double") / half)
    scale = F.lit(float(10 ** digits))
    w_fp = F.floor(F.round(w, digits) * scale + F.lit(0.5)).cast("long")
    wv_fp = F.floor(
        F.round(w * F.col(value_col).cast("double"), digits) * scale
        + F.lit(0.5)
    ).cast("long")
    return (
        df.crossJoin(F.broadcast(ref))
        .groupBy(F.col(key_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(w_fp).cast("long").alias("decayed_fp"),
            F.sum(wv_fp).cast("long").alias("decayed_value_fp"),
        )
    )
