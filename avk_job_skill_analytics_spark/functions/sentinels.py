"""F13 — sentinel fills (src/transform.py:121-125;
src/data_extract.py:153, :202-203).

The reference mixes NaN, '' and sentinel strings. Engine policy
(SURVEY.md §7.4): real NULLs internally, sentinels applied once at the
curation edge so output value-parity holds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# column → sentinel, straight from the reference
SENTINELS: dict[str, str] = {
    "company_name": "Unknown",
    "technical_skills": "not listed",
    "soft_skills": "communication, teamwork",
    "country": "United States",
}


def fill_sentinels(df: DataFrame, sentinels: dict[str, str] | None = None) -> DataFrame:
    """Replace NULL *and* empty/whitespace-only strings with each
    column's sentinel (pandas NaN and '' both map to the sentinel in
    the reference)."""
    for col, default in (sentinels or SENTINELS).items():
        if col in df.columns:
            df = df.withColumn(
                col,
                F.when(
                    F.col(col).isNull() | (F.trim(F.col(col)) == ""),
                    F.lit(default),
                ).otherwise(F.col(col)),
            )
    return df
