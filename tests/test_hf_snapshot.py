"""S4 HuggingFace snapshot source — the reference's load-or-empty
contract (src/data_extract.py:73-79) over offline parquet/CSV mirrors.
"""

from __future__ import annotations

import os

import pytest

from avk_job_skill_analytics_spark.sources.readers import hf_snapshot_source

COLMAP = {
    "title": "job_title",
    "country": "job_country",
    "salary": "job_salary_missing",  # absent in the snapshot -> ''
}


@pytest.fixture()
def snapshot_pdf():
    import pandas as pd

    return pd.DataFrame(
        {
            "job_title": ["Data Engineer", "ML Scientist", "Analyst"],
            "job_country": ["United States", "Sudan", "United States"],
            "job_via": ["via LinkedIn", "via X", "via Y"],
        }
    )


def test_parquet_snapshot_with_colmap(spark, tmp_path, snapshot_pdf):
    snap = str(tmp_path / "snap")
    spark.createDataFrame(snapshot_pdf).write.parquet(snap)
    out = hf_snapshot_source(spark, snap, column_map=COLMAP)
    assert out.columns == ["title", "country", "salary"]
    rows = {r["title"]: r for r in out.collect()}
    assert rows["Data Engineer"]["country"] == "United States"
    assert rows["Data Engineer"]["salary"] == ""  # absent column -> ''


def test_csv_snapshot_when_no_parquet(spark, tmp_path, snapshot_pdf):
    snap = tmp_path / "snap_csv"
    snap.mkdir()
    snapshot_pdf.to_csv(snap / "part-000.csv", index=False)
    out = hf_snapshot_source(spark, str(snap), column_map=COLMAP)
    assert out.count() == 3
    assert out.columns == ["title", "country", "salary"]


def test_missing_snapshot_is_empty_no_columns(spark, tmp_path):
    out = hf_snapshot_source(spark, str(tmp_path / "nope"))
    assert out.columns == []  # the exact pd.DataFrame() shape
    assert out.count() == 0


def test_missing_snapshot_with_colmap_unions_cleanly(
    spark, tmp_path, snapshot_pdf
):
    snap = str(tmp_path / "snap")
    spark.createDataFrame(snapshot_pdf).write.parquet(snap)
    real = hf_snapshot_source(spark, snap, column_map=COLMAP)
    empty = hf_snapshot_source(
        spark, str(tmp_path / "nope"), column_map=COLMAP
    )
    assert empty.columns == real.columns
    assert empty.count() == 0
    both = real.unionByName(empty, allowMissingColumns=True)
    assert both.count() == real.count()  # pd.concat-with-empty no-op


def test_provenance_column(spark, tmp_path, snapshot_pdf):
    snap = str(tmp_path / "snap")
    spark.createDataFrame(snapshot_pdf).write.parquet(snap)
    out = hf_snapshot_source(
        spark, snap, column_map=COLMAP, with_provenance=True
    )
    assert "_source_file" in out.columns
    assert all(
        os.path.basename(r["_source_file"]).endswith(".parquet")
        for r in out.select("_source_file").collect()
    )
