"""F7/F9/F11/F12 — timestamp parsing and the date hierarchy
(src/transform.py:102-103, :145-146; PBIX auto date hierarchy).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_timestamp(col: Column | str) -> Column:
    """F7 — pd.to_datetime(errors='coerce'): NULL on failure.
    try_to_timestamp, because Spark 4's default ANSI mode makes
    to_timestamp throw on unparseable input."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(c)


def year_of(col: Column | str) -> Column:
    """F9 — derived job_posted_year (src/transform.py:145-146)."""
    return F.year(F.col(col) if isinstance(col, str) else col)


def month_of(col: Column | str) -> Column:
    """F12 — Month level of the BI date hierarchy."""
    return F.month(F.col(col) if isinstance(col, str) else col)


def day_of(col: Column | str) -> Column:
    """F12 — Day level of the BI date hierarchy."""
    return F.dayofmonth(F.col(col) if isinstance(col, str) else col)


def stamp_posted_ts(date_str: str, hour_expr: Column | None = None) -> Column:
    """F11 — the reference stamps each extracted row with the file's
    date plus a random business-hours time (src/data_extract.py:217-225).
    Randomness is banned in verification, so the time component is an
    injectable expression (default: a fixed 09:00:00)."""
    time_part = hour_expr if hour_expr is not None else F.lit("09:00:00")
    return F.to_timestamp(F.concat_ws(" ", F.lit(date_str), time_part))
