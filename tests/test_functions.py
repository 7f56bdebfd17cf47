"""Table-driven parity tests for the scalar curation functions
(SURVEY.md §5.4) — expected values derived from the reference's pandas
semantics (/root/reference/src/transform.py, src/data_extract.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from avk_job_skill_analytics_spark.functions import (
    city_from_location,
    clean_job_title,
    fill_sentinels,
    infer_job_type,
    normalize_salary,
    normalize_skill_list,
    normalize_text,
    parse_numeric,
    parse_timestamp,
)


def one(spark, value, expr):
    df = spark.createDataFrame([(value,)], "x string")
    return df.select(expr(F.col("x")).alias("y")).collect()[0]["y"]


# ---------------------------------------------------------------- F2 titles
@pytest.mark.parametrize(
    "raw,expected",
    [
        ("Senior Data Engineer II (Remote) - Platform", "Data Engineer"),
        # 'staff' is NOT in the reference's noise list (transform.py:85-86)
        ("Staff Software Engineer [Hybrid] / Infra", "Staff Software Engineer"),
        ("VP of Engineering | Ads", "Of Engineering"),
        ("Vice President, Data Platform", "Data Platform"),
        ("Hiring Immediate Joiner - Data Engineer", ""),
        ("Apply via LinkedIn", "Apply Linkedin"),
        ("Principal Engineer III - Streaming", "Engineer"),
        ("Jr Developer", "Developer"),
        ("Data   Analyst#42", "Data Analyst"),
        ("Machine Learning {NLP} Scientist IV", "Machine Learning Scientist"),
    ],
)
def test_clean_job_title(spark, raw, expected):
    assert one(spark, raw, clean_job_title) == expected


def test_clean_job_title_extra_noise_words(spark):
    from avk_job_skill_analytics_spark.functions.text import EXTRA_NOISE_WORDS

    raw = "Staff Software Engineer [Hybrid] / Infra"
    assert one(
        spark, raw,
        lambda c: clean_job_title(c, extra_noise_words=EXTRA_NOISE_WORDS),
    ) == "Software Engineer"


def test_clean_job_title_idempotent(spark):
    titles = ["Senior Data Engineer II (Remote) - Platform", "Jr Developer"]
    df = spark.createDataFrame([(t,) for t in titles], ["x"])
    once = df.select(clean_job_title(F.col("x")).alias("y"))
    twice = once.select(clean_job_title(F.col("y")).alias("y"))
    assert [r["y"] for r in once.collect()] == [r["y"] for r in twice.collect()]


# -------------------------------------------------------------- F3 job type
@pytest.mark.parametrize(
    "raw,expected",
    [
        ("full-time", "Full-Time"),
        ("Full Time engineer", "Full-Time"),
        ("intern and part time", "Internship, Part-Time"),
        ("contract", "Contract"),
        ("temp", "Temporary"),
        ("freelancing gig", "Freelance"),
        ("ft", "Full-Time"),
        ("nothing here", "Not specified"),
        ("", "Not specified"),
    ],
)
def test_infer_job_type(spark, raw, expected):
    assert one(spark, raw, infer_job_type) == expected


# ---------------------------------------------------------------- F4 salary
@pytest.mark.parametrize(
    "raw,expected",
    [
        ("$120,000", 120000),
        ("85000", 85000),
        ("45.5", 91000),      # hourly heuristic: <=1000 -> x2000
        ("30", 60000),
        ("1000", 2000000),    # boundary: inclusive
        ("1001", 1001),
        ("N/A", None),
        ("", None),
    ],
)
def test_normalize_salary(spark, raw, expected):
    assert one(spark, raw, normalize_salary) == expected


def test_parse_numeric_coerce(spark):
    assert one(spark, "12.5", parse_numeric) == 12.5
    assert one(spark, "junk", parse_numeric) is None


# ------------------------------------------------------------- F7 timestamp
def test_parse_timestamp_coerce(spark):
    assert one(spark, "not-a-date", parse_timestamp) is None
    assert one(spark, "2025-10-01 09:15:00", parse_timestamp) is not None


# ----------------------------------------------------------------- F5 skills
@pytest.mark.parametrize(
    "raw,expected",
    [
        ("Python, SQL , spark", "python, sql, spark"),
        ("java, ,kubernetes", "java, kubernetes"),
        ("", "not listed"),
        ("   ", "not listed"),
        (None, "not listed"),
        (",,,", "not listed"),
    ],
)
def test_normalize_skill_list(spark, raw, expected):
    assert one(spark, raw, normalize_skill_list) == expected


# ------------------------------------------------------------------ F10 city
@pytest.mark.parametrize(
    "raw,expected",
    [
        ("Seattle, WA", "Seattle"),
        ("New York, NY, USA", "New York"),
        ("remote", "remote"),
    ],
)
def test_city_from_location(spark, raw, expected):
    assert one(spark, raw, city_from_location) == expected


# ----------------------------------------------------------------- F1 normalize
def test_normalize_text(spark):
    assert one(spark, "  MiXeD Case  ", normalize_text) == "mixed case"


# ---------------------------------------------------------------- F13 sentinels
def test_fill_sentinels(spark):
    df = spark.createDataFrame(
        [(None, "", "  ", None)],
        "company_name string, technical_skills string, soft_skills string, country string",
    )
    row = fill_sentinels(df).collect()[0]
    assert row["company_name"] == "Unknown"
    assert row["technical_skills"] == "not listed"
    assert row["soft_skills"] == "communication, teamwork"
    assert row["country"] == "United States"
