"""End-to-end curation pipeline — the reference's three ETL stages as
lazy DataFrame transformations (SURVEY.md §3).

Reference shape: extract (multi-source → normalize → union → CSV)
→ transform (per-file pandas cleaning) → load (row-batched inserts).
Engine shape: ONE logical plan per sink — Catalyst fuses the entire
chain (casts, regex cleaning, fills, dedup, filters, derived columns)
into a scan → project → window(dedup) → filter pipeline with a single
shuffle (the dedup), regardless of how many files feed it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import (
    city_from_location,
    clean_job_title,
    fill_sentinels,
    infer_job_type,
    normalize_salary,
    normalize_skill_list,
    normalize_text,
    parse_timestamp,
)
from ..operators.setops import dedup_keep_first, union_by_name
from ..sources.normalize import conform
from .schemas import FINAL_COLS

SALARY_MIN, SALARY_MAX = 20_000, 400_000  # P5 (src/transform.py:141-142)
DEDUP_KEYS = ("company_name", "job_title", "job_location", "job_posted_site")


def extract_normalize(frames: Sequence[DataFrame]) -> DataFrame:
    """Extract stage: per-source frames (already column-mapped via
    sources.normalize.normalize_columns) conformed to FINAL_COLS and
    unioned — the reference's multi-source combine
    (src/data_extract.py:160-214)."""
    return union_by_name([conform(f, FINAL_COLS) for f in frames])


def curate(
    raw: DataFrame,
    order: Sequence[Column] | None = None,
    dedup_keys: Sequence[str] = DEDUP_KEYS,
    salary_range: tuple[int, int] = (SALARY_MIN, SALARY_MAX),
    title_case: bool = True,
) -> DataFrame:
    """Transform stage — transform_data (src/transform.py:99-150) in
    reference order:

    1.  F7/F8 type casts (coerce-to-null)
    2.  F1 text normalization (strip+lower on the 5 text cols)
    3.  F2 title cleaning → ``cleaned_job_title``
    4.  F3 employment-type inference
    5.  F13 sentinel fills
    6.  F5 skill-list normalization
    7.  U2 keep-first dedup (deterministic winner via ``order``)
    8.  P5 salary outlier band
    9.  F9/F10 derived columns (year, city)

    ``order`` defaults to the natural column order surrogate: callers
    that need exact pandas keep-first parity pass the ingest sequence
    column here."""
    df = raw
    # 1. casts
    if "job_posted_date" in df.columns:
        df = df.withColumn("job_posted_date", parse_timestamp("job_posted_date"))
    if "salary" in df.columns:
        df = df.withColumn("salary", normalize_salary("salary"))
    # 2. text normalize
    for c in ("company_name", "job_title", "job_location", "country",
              "job_posted_site"):
        if c in df.columns:
            df = df.withColumn(c, normalize_text(c))
    # 3./4. title + type
    df = df.withColumn(
        "cleaned_job_title", clean_job_title("job_title", title_case=title_case)
    )
    type_src = (
        F.concat_ws(" ", "job_type", "job_title")
        if "job_type" in df.columns
        else F.col("job_title")
    )
    df = df.withColumn("job_type", infer_job_type(type_src))
    # 5. fills
    df = fill_sentinels(df)
    # 6. skills
    for c in ("technical_skills", "soft_skills"):
        if c in df.columns:
            df = df.withColumn(c, normalize_skill_list(c))
    # 7. dedup
    keys = [k for k in dedup_keys if k in df.columns]
    if keys:
        tie = list(order) if order else [F.monotonically_increasing_id().asc()]
        df = dedup_keep_first(df, keys, tie)
    # 8. salary band
    if "salary" in df.columns:
        df = df.filter(F.col("salary").between(*salary_range))
    # 9. derived
    if "job_posted_date" in df.columns:
        df = df.withColumn("job_posted_year", F.year("job_posted_date"))
    if "job_location" in df.columns:
        df = df.withColumn("city", city_from_location(F.col("job_location")))
    return df


DEFAULT_ID_COLS = ("company_name", "job_title", "job_location",
                   "job_posted_site", "job_posted_date")


def to_warehouse(curated: DataFrame,
                 id_cols: Sequence[str] = DEFAULT_ID_COLS) -> DataFrame:
    """Load-stage projection: surrogate JobId + the fact columns the
    BI model reads (dbo.job_data + cleaned_job_title). The key is the
    engine-portable md5 hash (operators/hashing.md5_long) of the
    identifying columns joined on an unprintable separator — not
    monotonically_increasing_id — so reloads, re-runs, and OTHER
    engines produce identical stable ids."""
    from ..operators.hashing import md5_long

    cols = [c for c in id_cols if c in curated.columns]
    return curated.withColumn(
        "job_id",
        md5_long(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])),
    )


def jobskills_bridge(warehouse: DataFrame) -> DataFrame:
    """The PBIX jobskills entity: explode normalized technical_skills
    to one row per (job_id, skill token) (SURVEY.md §1.1(4))."""
    return (
        warehouse.select(
            "job_id",
            "job_title",
            F.explode(F.split("technical_skills", r",\s*")).alias(
                "technical_skill"
            ),
        )
        .filter(F.trim("technical_skill") != "")
    )
