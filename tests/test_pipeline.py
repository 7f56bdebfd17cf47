"""End-to-end curation pipeline tests (SURVEY.md §5.2) over the dirty
FIXTURES.md §A1 rows — transform_data parity plus warehouse/bridge."""

from __future__ import annotations

from pyspark.sql import functions as F

from avk_job_skill_analytics_spark.plans.pipeline import (
    curate,
    jobskills_bridge,
    to_warehouse,
)


def curated(raw_jobs):
    return curate(raw_jobs, order=[F.col("seq").asc()]).cache()


def test_dedup_keep_first(raw_jobs):
    df = curated(raw_jobs)
    amazon = df.filter(F.col("company_name") == "amazon").collect()
    # rows 1 and 2 normalize to the same dedup key; seq=1 must win
    assert len(amazon) == 1
    assert amazon[0]["seq"] == 1
    assert amazon[0]["salary"] == 120000


def test_salary_band(raw_jobs):
    df = curated(raw_jobs)
    sal = [r["salary"] for r in df.collect()]
    assert all(20000 <= s <= 400000 for s in sal)
    # row 5 (9.99M) and row 6 (null) dropped
    assert df.filter(F.col("company_name") == "meta").count() == 0
    assert df.filter(F.col("company_name") == "tiny co").count() == 0


def test_hourly_salary_annualized(raw_jobs):
    df = curated(raw_jobs)
    stripe = df.filter(F.col("company_name") == "stripe").collect()[0]
    assert stripe["salary"] == 60000


def test_derived_columns(raw_jobs):
    df = curated(raw_jobs)
    row = df.filter(F.col("company_name") == "amazon").collect()[0]
    assert row["job_posted_year"] == 2025
    assert row["city"] == "seattle"
    assert row["cleaned_job_title"] == "Data Engineer"
    assert row["job_type"] == "Full-Time"


def test_sentinels_applied(raw_jobs):
    df = curated(raw_jobs)
    ml = df.filter(F.col("cleaned_job_title") == "Ml Scientist").collect()[0]
    assert ml["company_name"] == "Unknown"
    assert ml["technical_skills"] == "not listed"
    assert ml["soft_skills"] == "communication, teamwork"
    assert ml["country"] == "United States"


def test_curate_idempotent_on_rerun(raw_jobs):
    """Re-curating already-curated data must not change row count
    (dedup/filters are stable)."""
    df = curated(raw_jobs)
    again = curate(df, order=[F.col("seq").asc()])
    assert again.count() == df.count()


def test_warehouse_stable_ids(raw_jobs):
    df = curated(raw_jobs)
    w1 = to_warehouse(df).select("job_id").collect()
    w2 = to_warehouse(df).select("job_id").collect()
    assert sorted(r["job_id"] for r in w1) == sorted(r["job_id"] for r in w2)
    assert len({r["job_id"] for r in w1}) == len(w1)  # unique surrogate keys


def test_jobskills_bridge(raw_jobs):
    w = to_warehouse(curated(raw_jobs))
    bridge = jobskills_bridge(w)
    amazon_id = w.filter(F.col("company_name") == "amazon").collect()[0]["job_id"]
    toks = sorted(
        r["technical_skill"]
        for r in bridge.filter(F.col("job_id") == amazon_id).collect()
    )
    assert toks == ["python", "spark", "sql"]
    # bridge never contains empty tokens
    assert bridge.filter(F.trim("technical_skill") == "").count() == 0
