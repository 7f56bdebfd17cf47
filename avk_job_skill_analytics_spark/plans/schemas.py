"""Explicit StructType schemas.

The reference infers schemas on every read (``src/transform.py:158``)
and re-checks column existence defensively. We declare them once
(SURVEY.md §1.3-1.4): raw job postings (``FINAL_COLS``,
``src/data_extract.py:160-164``), the curated fact table, the exploded
``jobskills`` bridge, the idempotency manifest, and the driver
testdata tables.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Canonical 11-column raw schema (reference FINAL_COLS,
# src/data_extract.py:160-164). All strings at the raw boundary —
# CSV interchange carries no types.
RAW_JOBS = T.StructType(
    [
        T.StructField("company_name", T.StringType()),
        T.StructField("job_title", T.StringType()),
        T.StructField("job_type", T.StringType()),
        T.StructField("job_location", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("salary", T.StringType()),
        T.StructField("job_posted_date", T.StringType()),
        T.StructField("job_posted_site", T.StringType()),
        T.StructField("technical_skills", T.StringType()),
        T.StructField("soft_skills", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)

FINAL_COLS = [f.name for f in RAW_JOBS.fields]

# Curated fact table: raw cols after typing + cleaning, plus derived
# columns (src/transform.py:145-148) and the BI surrogate key /
# cleaned title (job-skill.pbix semantic model, SURVEY.md §1.1).
JOBS_CURATED = T.StructType(
    [
        T.StructField("job_id", T.LongType()),
        T.StructField("company_name", T.StringType()),
        T.StructField("job_title", T.StringType()),
        T.StructField("cleaned_job_title", T.StringType()),
        T.StructField("job_type", T.StringType()),
        T.StructField("job_location", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("salary", T.IntegerType()),
        T.StructField("job_posted_date", T.TimestampType()),
        T.StructField("job_posted_year", T.IntegerType()),
        T.StructField("job_posted_site", T.StringType()),
        T.StructField("technical_skills", T.StringType()),
        T.StructField("soft_skills", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)

# Exploded skills bridge (PBIX jobskills entity, SURVEY.md §1.1(4)).
JOBSKILLS = T.StructType(
    [
        T.StructField("job_id", T.LongType()),
        T.StructField("job_title", T.StringType()),
        T.StructField("technical_skills", T.StringType()),  # single token
    ]
)

# Idempotent-load manifest (src/load_sqlserver.py:16; loaded_files.db).
MANIFEST = T.StructType([T.StructField("file_name", T.StringType())])

# Driver testdata (TESTDATA.md / FIXTURES.md §B). Parquet already
# carries these; declared here for streaming reads (readStream needs
# an explicit schema) and for documentation.
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# testdata columns stored as INT64 TIMESTAMP(NANOS) in parquet; Spark
# reads them as long nanos (spark.sql.legacy.parquet.nanosAsLong) and
# we convert to micro-precision timestamps here. DuckDB truncates
# nanos→micros the same way (integer div by 1000).
_NANO_TS_COLS: dict[str, tuple[str, ...]] = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def load(spark, sf_dir: str, name: str):
    """Read one driver testdata table as a DataFrame (timestamps
    normalized to TimestampType)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    try:
        # self-heal on externally created sessions (the driver hands us
        # one): without this, TIMESTAMP(NANOS) parquet columns are
        # unreadable. Runtime-settable; verified on Spark 4.1.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _NANO_TS_COLS.get(name, ()):
        field = df.schema[c] if c in df.columns else None
        if field is not None and isinstance(field.dataType, T.LongType):
            # integer div keeps full precision (ns epoch > 2^53 would
            # lose bits through double division)
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df
