"""Every oracle output column must carry an engine-stable type.

Round-11 root cause of the 3-round-old driver-gate hash failures on
``dq_psi_drift`` / ``ml_information_value``: DuckDB widens
``sum(BIGINT)`` to HUGEINT, and HUGEINT's *fetched representation* is
duckdb-build-dependent (Python int via fetchall, float64/Decimal via
pandas/arrow in other builds) — so a column that hash-matches in this
container can render differently in the driver's environment. The
exact blast radius was every oracle whose final projection carried a
HUGEINT or DECIMAL column: dq_psi_drift, ml_information_value,
stream_psi_drift, io_table_checksum, tpch_q12_late_shipments — the
first two being precisely the two perpetually-red driver rows.

This test pins the invariant: oracle result columns may only use
types whose fetched value is identical across duckdb fetch paths
(BIGINT and narrower ints, VARCHAR, BOOLEAN, DOUBLE, DATE,
TIMESTAMP). Wide integers must be CAST to BIGINT when they fit or to
VARCHAR when they don't (io_table_checksum's 38-digit sum).
"""

from __future__ import annotations

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events"
    " documents embeddings"
).split()

ALLOWED = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT",
    "VARCHAR", "BOOLEAN", "DOUBLE", "FLOAT",
    "DATE", "TIMESTAMP", "TIMESTAMP WITH TIME ZONE",
    # arrays of stable elements fetch as Python lists via fetchall on
    # both engines; their rendering under OTHER fetch paths is
    # unproven, so array-output queries stay out of the driver-sample
    # priority window (registry PRIORITY list).
    "DOUBLE[]", "FLOAT[]", "INTEGER[]", "BIGINT[]", "VARCHAR[]",
}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return c


def test_no_engine_variant_oracle_types(con):
    import __spark_entry__ as E

    bad = {}
    for name, sql in E.oracle_sql().items():
        rows = con.execute(
            f"DESCRIBE SELECT * FROM ({sql}) LIMIT 0"
        ).fetchall()
        offenders = [
            (col, typ)
            for col, typ, *_ in rows
            if typ.upper() not in ALLOWED
        ]
        if offenders:
            bad[name] = offenders
    assert not bad, (
        "oracle columns with engine-variant fetch types (cast to"
        f" BIGINT or VARCHAR): {bad}"
    )


def test_priority_window_has_no_array_outputs(con):
    """The comment in ALLOWED is a CONSTRAINT, not advice: array
    outputs fetch stably via fetchall but their rendering under other
    duckdb fetch paths is unproven, so no PRIORITY-window (driver-
    sampled) query may emit one. Window rotations (r12+) must keep
    satisfying this mechanically, not by reviewer memory."""
    import __spark_entry__ as E
    from avk_job_skill_analytics_spark.registry import PRIORITY

    oracles = E.oracle_sql()
    offenders = {}
    for name in PRIORITY:
        sql = oracles.get(name)
        if sql is None:
            continue          # rows-only queries have no oracle
        types = [
            r[1] for r in con.execute(
                f"DESCRIBE SELECT * FROM ({sql}) LIMIT 0"
            ).fetchall()
        ]
        arr = [t for t in types if t.endswith("[]") or "STRUCT" in t
               or "MAP" in t]
        if arr:
            offenders[name] = arr
    assert not offenders, offenders
