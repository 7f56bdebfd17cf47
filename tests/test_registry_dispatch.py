"""Registry dispatch contract: every ``queries()`` callable must be
self-sufficient on a session the engine did not build.

The driver constructs its own SparkSession and may run individual
``queries()`` entries without calling ``entry()`` first; until round
11 only ``entry()`` applied ``tune_session`` (UTC timezone,
nanosAsLong), so timestamp-sensitive queries silently depended on
call order. ``registry.all_queries`` now wraps every callable with an
idempotent ``tune_session`` — these tests pin that.
"""

from __future__ import annotations

import duckdb
import pytest

from avk_job_skill_analytics_spark.registry import PRIORITY, all_queries

SF_DIR = "/root/testdata/sf0.001"


def test_priority_window_names_resolve():
    qs = all_queries()
    names = list(qs)
    # the driver samples the first 50 registered queries: the curated
    # window must lead, in order, and fit the sample
    assert names[: len(PRIORITY)] == list(PRIORITY)
    assert len(PRIORITY) == 50


def test_ts_query_matches_on_virgin_non_utc_session(spark):
    """day(ts) bucketing must not shift when the caller's session
    carries a non-UTC timezone: the dispatch wrapper re-pins UTC."""
    qs = all_queries()
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = qs["dq_psi_buckets"](spark, SF_DIR)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        got = {r["bucket"]: (r["n_a"], r["n_b"]) for r in df.collect()}
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    import __spark_entry__ as E

    want = {
        b: (na, nb)
        for b, na, nb in con.execute(
            E.oracle_sql()["dq_psi_buckets"]
        ).fetchall()
    }
    assert got == want


def test_loaded_timestamps_are_ntz(spark):
    """The stronger property behind the virgin-session test: loaded
    ts columns are TIMESTAMP_NTZ (timestamp_micros conversion), so
    day()/hour() extraction is timezone-INDEPENDENT by type — a
    non-UTC driver session cannot shift bucket splits even before the
    dispatch wrapper re-pins UTC. DuckDB reads the same parquet as
    naive timestamps, so the engines agree by construction."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from avk_job_skill_analytics_spark.plans.schemas import load

    ev = load(spark, SF_DIR, "events")
    assert isinstance(ev.schema["ts"].dataType, T.TimestampNTZType)
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        n_utc = ev.filter(F.dayofmonth("ts") <= 15).count()
        spark.conf.set(
            "spark.sql.session.timeZone", "America/New_York"
        )
        n_ny = ev.filter(F.dayofmonth("ts") <= 15).count()
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert n_utc == n_ny


def test_tune_session_rightsizes_only_stock_shuffle(spark):
    """tune_session fixes Spark's stock 200 shuffle partitions on an
    untuned session but never overrides a deliberate setting."""
    from avk_job_skill_analytics_spark.plans.session import tune_session

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "200")
        tune_session(spark)
        got = int(spark.conf.get("spark.sql.shuffle.partitions"))
        assert got != 200 and got >= 4
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        tune_session(spark)
        assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
