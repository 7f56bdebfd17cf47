"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``avk_job_skill_analytics_spark/``; queries
and oracles are registered in ``avk_job_skill_analytics_spark/registry``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from avk_job_skill_analytics_spark.plans.session import tune_session  # noqa: E402
from avk_job_skill_analytics_spark.registry import all_oracles, all_queries  # noqa: E402

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Flagship = a7_pricing_summary (multi-key grouped aggregation over
    lineitem — the engine's spine: scan → partial agg → shuffle →
    final agg; SURVEY.md §7.2 milestone 0 widened per §2.4 A7).
    """
    tune_session(spark)
    return all_queries()["a7_pricing_summary"](spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted → rows-only check)."""
    return all_oracles()
