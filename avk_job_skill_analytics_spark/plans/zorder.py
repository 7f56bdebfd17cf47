"""Z-order (Morton-curve) multi-dimensional clustering.

``time_clustered`` (bucketing.py) makes ONE column's min/max file
stats tight; a second filter column gains nothing from it. Z-ordering
interleaves the bits of several normalized columns into one Morton
key and range-sorts the write on that key, so every output file
covers a small hyper-rectangle of the combined space — range
predicates on ANY of the clustered columns reject whole files off
parquet footer stats. This is the open algorithm behind Delta/Iceberg
``OPTIMIZE ZORDER BY``; at 100 TB a two-column z-layout turns a
(user, value-band) probe from a full scan into reading roughly the
files whose rectangle intersects the probe — O(fraction per dim)
instead of 1.

The Morton key is a pure Column expression (shift/AND/OR loops
unrolled at plan-build time — whole-stage codegen, no UDF). Column
values are first normalized to ``bits``-bit integers against their
observed min/max; the one-row bounds collect is driver-side control,
not data movement. The key orders the LAYOUT only — queries never
read it — so engine parity of results does not depend on it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(cols: list[Column], bits: int = 8) -> Column:
    """Morton-interleave ``bits``-bit non-negative integer columns:
    output bit (b * ndims + i) is bit b of column i. Unrolled into a
    flat OR-of-shifts expression that stays inside codegen."""
    ndims = len(cols)
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        c = c.cast("long")
        for b in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftrightunsigned(c, b).bitwiseAND(F.lit(1)),
                    b * ndims + i,
                )
            )
    return z


def _normalize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Scale a numeric column into [0, 2^bits) against known bounds."""
    span = (hi - lo) or 1.0
    scaled = ((col.cast("double") - F.lit(float(lo))) / F.lit(span)) * (
        (1 << bits) - 1
    )
    return F.least(
        F.lit((1 << bits) - 1),
        F.greatest(F.lit(0), F.round(scaled, 0).cast("long")),
    )


def zorder_clustered(df: DataFrame, cols: list[str], n_files: int,
                     bits: int = 8) -> DataFrame:
    """Rewrite plan: normalize ``cols`` against their observed
    min/max, Morton-interleave them, and range-partition + sort the
    frame on the z-key ready for a parquet write. The helper column
    is dropped after the sort, so the stored schema is unchanged."""
    bounds = df.agg(
        *[F.min(c).alias(f"_lo_{c}") for c in cols],
        *[F.max(c).alias(f"_hi_{c}") for c in cols],
    ).first()
    z = interleave_bits(
        [
            _normalize(
                F.col(c), bounds[f"_lo_{c}"], bounds[f"_hi_{c}"], bits
            )
            for c in cols
        ],
        bits,
    )
    return (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
