"""Set operations & anti-join semantics (SURVEY.md §2.3, §2.7).

U1 union-by-name, U2 keep-first dedup, J1 manifest anti-join — the
reference's `pd.concat`, `drop_duplicates(keep='first')`, and
processed-file set-difference, with deterministic Spark semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def union_by_name(frames: Sequence[DataFrame]) -> DataFrame:
    """U1 — `pd.concat` equivalent (src/data_extract.py:56-66, :214).
    Column-name-aligned union; missing columns become NULL. Schemas are
    normalized upstream (P1), so this is usually a pure no-shuffle
    union of partitions."""
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def dedup_keep_first(df: DataFrame, keys: Sequence[str],
                     order: Sequence[Column]) -> DataFrame:
    """U2 — pandas `drop_duplicates(subset=keys)` keeps the FIRST row
    per key in input order (src/transform.py:138); Spark's
    `dropDuplicates` keeps an arbitrary one. For parity we make the
    winner deterministic: row_number over (keys, order) == 1.

    One shuffle on `keys` (same cost as dropDuplicates); the window
    sort is per-group, not global."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def dedup_any(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """U2 (fast path) — when the caller doesn't care which duplicate
    survives, plain dropDuplicates is cheaper: map-side partial
    aggregation collapses duplicates before the shuffle."""
    return df.dropDuplicates(list(keys))


def anti_join(df: DataFrame, exclude: DataFrame, on: str | Sequence[str],
              broadcast_exclude: bool = True) -> DataFrame:
    """J1 — set-membership exclusion: the processed-file diff
    (src/transform.py:192-196) and tracker lookup
    (src/load_sqlserver.py:113-115) as one operator. The manifest side
    is tiny (one row per ingested file) → broadcast, so the data side
    never shuffles."""
    if broadcast_exclude:
        exclude = F.broadcast(exclude)
    return df.join(exclude, on, "left_anti")
