"""Range (interval) join — the binned equi-join spelling.

``fact.value BETWEEN band.lo AND band.hi`` has no hash key, so Spark
plans it as a nested-loop join: every fact row is compared against
every band. Fine for 5 bands; catastrophic for 10⁵ intervals (tariff
tables, IP ranges, genomic bins).

The scale spelling quantizes the value axis: pick a bin width w, map
each fact to bin ``floor(value / w)``, replicate each band to every
bin its interval overlaps, hash-join on the bin id, and keep a
residual BETWEEN filter for exactness. Per fact row the work drops
from O(bands) to O(bands overlapping its bin). Pick ``w`` near the
median band width: much smaller multiplies the band replication;
much larger puts many bands in each bin and the residual filter does
the work again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def binned_range_join(facts: DataFrame, value_col: str, bands: DataFrame,
                      lo_col: str, hi_col: str,
                      bin_width: float) -> DataFrame:
    """Inner-join ``facts`` to ``bands`` on
    ``lo <= value < hi`` via bin quantization. Returns facts columns +
    bands columns. Bands must be finite intervals (cap open-ended
    bands at the domain max before calling)."""
    b = bands.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bin_width).cast("long"),
                F.floor(F.col(hi_col) / bin_width).cast("long"),
            )
        ),
    )
    f = facts.withColumn(
        "_bin", F.floor(F.col(value_col) / bin_width).cast("long")
    )
    return (
        f.join(b, "_bin")
        .filter(
            (F.col(value_col) >= F.col(lo_col))
            & (F.col(value_col) < F.col(hi_col))
        )
        .drop("_bin")
    )
