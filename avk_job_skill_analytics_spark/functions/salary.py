"""F4/F8 — salary normalization & numeric parsing
(src/data_extract.py:205-212; src/transform.py:104-105).

Rules: strip '$' and ',' → parse float (unparseable → NULL, matching
``pd.to_numeric(errors='coerce')``); values <= hourly_threshold are
treated as hourly wages and annualized (x 2000 working hours); result
floored to int.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HOURLY_THRESHOLD = 1000.0
HOURS_PER_YEAR = 2000.0


def parse_numeric(col: Column | str) -> Column:
    """F8 — pd.to_numeric(errors='coerce'): cast to double, NULL on
    failure. Spark 4 runs ANSI mode by default (malformed casts THROW),
    so coerce semantics require try_cast."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("double")


def normalize_salary(col: Column | str,
                     hourly_threshold: float = HOURLY_THRESHOLD,
                     hours_per_year: float = HOURS_PER_YEAR) -> Column:
    """F4 — '$120,000' → 120000; '45.5' (hourly) → 91000; junk → NULL.

    floor() before the int cast keeps truncation semantics identical
    across engines (some SQL engines round on double→int casts)."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(c.cast("string"), r"[$,]", "")
    num = cleaned.try_cast("double")  # ANSI-safe coerce-to-null
    annual = F.when(num <= hourly_threshold, num * hours_per_year).otherwise(num)
    return F.floor(annual).cast("int")
