"""avk_job_skill_analytics_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark engine providing the query and
data-processing capabilities of the reference system
``imsvarma/avk-job-skill-analytics`` (an ETL + BI analytics stack for
job-posting data), re-expressed Spark-first:

- ``sources/``    — scans, sinks, and the idempotent-load manifest
                    (SURVEY.md §2.1: S1–S8).
- ``functions/``  — scalar column expressions (SURVEY.md §2.8: F1–F14),
                    all pure Catalyst expressions, no UDFs.
- ``operators/``  — the analytics query library (§2.3–2.7: joins,
                    aggregations, top-k, set ops) plus beyond-reference
                    scale operators (dedup, similarity search, text
                    analysis, multimodal plumbing).
- ``plans/``      — SparkSession factory, filter-context (P7), and the
                    end-to-end curation pipeline.
- ``streaming/``  — the incremental file-arrival pattern (§2.9) as
                    Structured Streaming availableNow.

Everything is DataFrame/Column expressions compiled by Catalyst;
Pandas UDFs appear only where built-ins genuinely cannot express the
semantics (external skill extraction UD1, multimodal decode).
"""

__version__ = "0.1.0"
