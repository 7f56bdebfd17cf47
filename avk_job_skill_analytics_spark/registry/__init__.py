"""Query registry — the driver-facing inventory.

Each submodule exposes ``QUERIES: dict[name, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, sql]`` (ANSI SQL for the DuckDB oracle; a
query missing from ORACLES gets the driver's weaker rows-only check).
``all_queries()`` / ``all_oracles()`` merge them for __spark_entry__.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    core_queries,
    dq_queries,
    io_queries,
    linkage_queries,
    pipeline_queries,
    scalar_queries,
    scale_queries,
    streaming_queries,
    tpch_queries,
    window_queries,
)

_MODULES = (
    core_queries,
    dq_queries,
    scalar_queries,
    scale_queries,
    streaming_queries,
    pipeline_queries,
    io_queries,
    window_queries,
    tpch_queries,
    linkage_queries,
)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
