"""S3 Excel edge: stdlib SpreadsheetML codec + distributed read/write.

The reference ingests .xlsx job files with pd.read_excel
(src/data_extract.py:58, :64); this env has no openpyxl, so the codec
is the ECMA-376 subset implemented in sources/xlsx.py and the
distributed paths are binaryFile→mapInPandas (read) and
mapInPandas side-effect writers (write).
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from avk_job_skill_analytics_spark.sources import sinks, xlsx
from avk_job_skill_analytics_spark.sources.readers import excel_source


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="xlsx_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("shared", [False, True], ids=["inline", "sst"])
def test_codec_roundtrip(shared):
    cols = ["name", "qty", "price", "ok"]
    rows = [
        ("widget & co", 3, 19.99, True),
        ('<a href="x">', 0, -1.5, False),
        (None, None, None, None),
        ("éüñ", 42, 0.001, True),
    ]
    blob = xlsx.build_xlsx_bytes(cols, rows, shared_strings=shared)
    parsed, width = xlsx.parse_xlsx_bytes(blob)
    got_cols, body = xlsx.rows_to_table(parsed, width)
    assert got_cols == cols
    assert body[0] == ["widget & co", "3", "19.99", "true"]
    assert body[1] == ['<a href="x">', "0", "-1.5", "false"]
    assert body[2] == [None, None, None, None]
    assert body[3] == ["éüñ", "42", "0.001", "true"]


def test_codec_sparse_cells_keep_column_gaps():
    # hand-build a sheet where row 2 skips column B (real producers do
    # this — absent cells, not empty ones)
    blob = xlsx.build_xlsx_bytes(["a", "b", "c"], [("x", None, "z")])
    parsed, width = xlsx.parse_xlsx_bytes(blob)
    cols, body = xlsx.rows_to_table(parsed, width)
    assert cols == ["a", "b", "c"]
    assert body == [["x", None, "z"]]


def test_headerless_and_missing_header_names():
    blob = xlsx.build_xlsx_bytes(["x", "", "z"], [("1", "2", "3")])
    parsed, width = xlsx.parse_xlsx_bytes(blob)
    cols, body = xlsx.rows_to_table(parsed, width)
    assert cols == ["x", "c1", "z"]
    cols_nh, body_nh = xlsx.rows_to_table(parsed, width, header=False)
    assert cols_nh == ["c0", "c1", "c2"]
    assert len(body_nh) == 2


def test_excel_source_distributed_multifile(spark, tmpdir):
    xlsx.write_xlsx(
        f"{tmpdir}/a.xlsx", ["k", "v"], [("a", 1), ("b", 2)]
    )
    xlsx.write_xlsx(
        f"{tmpdir}/b.xlsx", ["k", "v"], [("c", 3)], shared_strings=True
    )
    df = excel_source(spark, f"{tmpdir}/*.xlsx", with_provenance=True)
    rows = df.collect()
    got = {(r.k, r.v) for r in rows}
    assert got == {("a", "1"), ("b", "2"), ("c", "3")}
    assert all(r._source_file.endswith(".xlsx") for r in rows)
    assert len({r._source_file for r in rows}) == 2


def test_xlsx_sink_roundtrip(spark, tmpdir):
    df = spark.range(50).selectExpr(
        "id", "cast(id * 1.5 as string) as v"
    )
    manifest = sinks.xlsx_sink(df, f"{tmpdir}/out", num_files=3).collect()
    assert sum(m.n_rows for m in manifest) == 50
    assert 1 <= len(manifest) <= 3
    back = excel_source(spark, f"{tmpdir}/out/*.xlsx")
    assert back.columns == ["id", "v"]
    assert {int(r.id) for r in back.collect()} == set(range(50))


def test_xlsx_python_datasource_roundtrip(spark, tmpdir):
    from avk_job_skill_analytics_spark.sources.xlsx_datasource import (
        register,
    )

    register(spark)
    df = spark.range(40).selectExpr(
        "id", "concat('row_', id) as label", "cast(id * 0.5 as string) as v"
    )
    df.repartition(3).write.format("xlsx").mode("overwrite").save(
        f"{tmpdir}/ds_out"
    )
    back = spark.read.format("xlsx").load(f"{tmpdir}/ds_out/*.xlsx")
    assert back.columns == ["id", "label", "v"]
    got = {(r.id, r.label, r.v) for r in back.collect()}
    want = {
        (str(i), f"row_{i}", str(i * 0.5)) for i in range(40)
    }
    assert got == want


def test_xlsx_datasource_overwrite_replaces_contents(spark, tmpdir):
    """mode('overwrite') on a NON-fresh directory must replace the
    previous save's part files, not append alongside them (a re-run
    used to double the data); append must keep both saves."""
    import os

    from avk_job_skill_analytics_spark.sources.xlsx_datasource import (
        register,
    )

    register(spark)
    out = f"{tmpdir}/ds_over"
    df = spark.range(10).selectExpr("id", "concat('r', id) as label")
    df.repartition(2).write.format("xlsx").mode("overwrite").save(out)
    df.repartition(2).write.format("xlsx").mode("overwrite").save(out)
    back = spark.read.format("xlsx").load(f"{out}/*.xlsx")
    assert back.count() == 10  # NOT 20

    df.repartition(2).write.format("xlsx").mode("append").save(out)
    assert spark.read.format("xlsx").load(f"{out}/*.xlsx").count() == 20

    # no stage dotfiles survive a completed job
    assert not [f for f in os.listdir(out) if f.startswith(".part-")]
    # part names are deterministic per (job, partition)
    names = sorted(f for f in os.listdir(out) if f.endswith(".xlsx"))
    assert all(n.startswith("part-0000") for n in names)


def test_excel_source_dropmalformed_quarantines_bad_file(spark, tmpdir):
    from avk_job_skill_analytics_spark.sources.readers import (
        excel_scan_report,
    )

    xlsx.write_xlsx(f"{tmpdir}/good_a.xlsx", ["k", "v"], [("a", 1)])
    xlsx.write_xlsx(f"{tmpdir}/good_b.xlsx", ["k", "v"], [("b", 2)])
    with open(f"{tmpdir}/bad.xlsx", "wb") as f:
        f.write(b"PK\x03\x04 not actually a zip")

    # FAILFAST: the corrupt file kills the read
    import pytest
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception):
        excel_source(spark, f"{tmpdir}/*.xlsx", mode="FAILFAST").collect()

    # DROPMALFORMED: survivors load, corrupt file is quarantined
    got = {
        (r.k, r.v)
        for r in excel_source(
            spark, f"{tmpdir}/*.xlsx", mode="DROPMALFORMED"
        ).collect()
    }
    assert got == {("a", "1"), ("b", "2")}

    # the audit twin names the quarantined file
    rep = {r.file.rsplit("/", 1)[-1]: (r.ok, r.n_rows)
           for r in excel_scan_report(spark, f"{tmpdir}/*.xlsx").collect()}
    assert rep["good_a.xlsx"] == (True, 1)
    assert rep["good_b.xlsx"] == (True, 1)
    assert rep["bad.xlsx"][0] is False
