"""intlog: the libm-free integer ln must be (a) bit-identical across
Spark, DuckDB, and the pure-Python spec on arbitrary in-range
fractions, and (b) accurate to ~1e-12 against math.log. (a) is the
driver-gate property — no libm build can flip a compared integer when
no libm call exists; (b) keeps the statistic honest."""

from __future__ import annotations

import math
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from avk_job_skill_analytics_spark.operators.intlog import (
    LN2_S,
    SCALE,
    contrib_fp6_py,
    contrib_fp6_sql,
    fp6_from_ln14_sql,
    fp6_ratio_sql,
    ln14_ctes,
    ln14_py,
    sdiv10_ctes,
    sdiv10_py,
    sdiv10_steps,
    with_ln14,
)

random.seed(0xA5)


def _pairs(n=250):
    ps = [
        (1, 1), (2, 1), (1, 2), (3, 7),
        (10 ** 29, 10 ** 29 + 1), (10 ** 29 + 1, 10 ** 29),
        (1, 1 << 40), (1 << 40, 1),       # exponent-range extremes
        ((1 << 40) - 1, 1), (1, (1 << 40) - 1),
        (999_999, 1_000_000), (1_000_001, 1_000_000),
    ]
    while len(ps) < n:
        num = random.randint(1, 10 ** random.randint(1, 29))
        den = random.randint(1, 10 ** random.randint(1, 29))
        if 2 ** -40 <= num / den <= 2 ** 40:
            ps.append((num, den))
    return ps


PAIRS = _pairs()
EXPECT = {(n, d): ln14_py(n, d) for n, d in PAIRS}


def test_python_twin_accuracy():
    worst = 0.0
    for n, d in PAIRS:
        worst = max(worst, abs(ln14_py(n, d) / SCALE - math.log(n / d)))
    assert worst < 1e-12, worst


def test_ln2_constant():
    assert LN2_S == math.floor(0.69314718055994530942 * 1e14)
    assert ln14_py(2, 1) == LN2_S


def test_spark_matches_python_bitexact(spark):
    df = spark.createDataFrame(
        [(str(n), str(d)) for n, d in PAIRS], "ns string, ds string"
    ).select(
        F.col("ns").cast("decimal(38,0)").alias("num"),
        F.col("ds").cast("decimal(38,0)").alias("den"),
    )
    out = with_ln14(df, "num", "den", "ln14").collect()
    assert len(out) == len(PAIRS)
    for r in out:
        assert int(r.ln14) == EXPECT[(int(r.num), int(r.den))]


def test_duckdb_matches_python_bitexact():
    con = duckdb.connect()
    con.execute("CREATE TABLE t (num HUGEINT, den HUGEINT)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [(str(n), str(d)) for n, d in PAIRS],
    )
    frag, rel = ln14_ctes("t", "num", "den", "ln14")
    rows = con.execute(
        f"WITH {frag} SELECT num, den, ln14 FROM {rel}"
    ).fetchall()
    assert len(rows) == len(PAIRS)
    for num, den, got in rows:
        assert int(got) == EXPECT[(int(num), int(den))]


def test_fp6_from_ln14_half_up():
    con = duckdb.connect()
    # ln(2) -> 693147.18... -> 693147; ln(1/2) -> -693147.18 -> -693147
    for num, den, want in [(2, 1, 693147), (1, 2, -693147),
                           (1, 1, 0), (3, 1, 1098612)]:
        frag, rel = ln14_ctes(
            f"(SELECT CAST({num} AS HUGEINT) AS num,"
            f" CAST({den} AS HUGEINT) AS den)", "num", "den", "l")
        got = con.execute(
            f"WITH {frag} SELECT {fp6_from_ln14_sql('l', 'duckdb')}"
            f" FROM {rel}").fetchone()[0]
        assert got == want, (num, den, got, want)


def test_fp6_ratio_exact_half_up(spark):
    con = duckdb.connect()
    cases = [(1, 3), (2, 3), (1, 2), (7, 4), (10 ** 18 + 1, 10 ** 18),
             (1, 10 ** 12), (999_999_500_000, 10 ** 12)]
    for num, den in cases:
        want = (2 * 10 ** 6 * num + den) // (2 * den)
        got_d = con.execute(
            f"SELECT {fp6_ratio_sql(f'CAST({num} AS HUGEINT)', f'CAST({den} AS HUGEINT)', 'duckdb')}"
        ).fetchone()[0]
        got_s = spark.range(1).select(F.expr(fp6_ratio_sql(
            f"CAST({num} AS DECIMAL(38,0))",
            f"CAST({den} AS DECIMAL(38,0))", "spark")).alias("v")
        ).collect()[0].v
        assert got_d == want and got_s == want, (num, den)


def test_sdiv10_signed_cross_engine(spark):
    con = duckdb.connect()
    cases = [(1, 3), (-1, 3), (0, 5), (10 ** 29, 10 ** 29 + 7),
             (-(10 ** 29), 10 ** 29 + 7), (5, 5), (-5, 5)]
    con.execute("CREATE TABLE s (num HUGEINT, den HUGEINT)")
    con.executemany("INSERT INTO s VALUES (?, ?)",
                    [(str(a), str(b)) for a, b in cases])
    frag, rel = sdiv10_ctes("s", "num", "den", "d10")
    for num, den, got in con.execute(
            f"WITH {frag} SELECT num, den, d10 FROM {rel}").fetchall():
        assert int(got) == sdiv10_py(int(num), int(den))
    df = spark.createDataFrame(
        [(str(a), str(b)) for a, b in cases], "ns string, ds string"
    ).select(F.col("ns").cast("decimal(38,0)").alias("num"),
             F.col("ds").cast("decimal(38,0)").alias("den"))
    for nm, ex in sdiv10_steps("num", "den", "d10", "spark"):
        df = df.withColumn(nm, F.expr(ex))
    for r in df.collect():
        assert int(r.d10) == sdiv10_py(int(r.num), int(r.den))


def test_contrib_fp6_cross_engine(spark):
    con = duckdb.connect()
    cases = [(0, 0), (10 ** 10, LN2_S), (-(10 ** 10), -LN2_S),
             (5_000_000_000, -LN2_S), (1, 1), (-1, -1)]
    for d10, l14 in cases:
        want = contrib_fp6_py(d10, l14)
        got_d = con.execute(
            "SELECT " + contrib_fp6_sql(
                f"CAST({d10} AS HUGEINT)", f"CAST({l14} AS HUGEINT)",
                "duckdb")).fetchone()[0]
        got_s = spark.range(1).select(F.expr(contrib_fp6_sql(
            f"CAST({d10} AS DECIMAL(38,0))",
            f"CAST({l14} AS DECIMAL(38,0))", "spark")).alias("v")
        ).collect()[0].v
        assert got_d == want and got_s == want, (d10, l14)
    # value sanity: d10 = 1e10 (ratio 1.0) times ln14 = ln2*1e14
    # -> contribution 0.693147 -> fp6 693147
    assert contrib_fp6_py(10 ** 10, LN2_S) == 693147


def test_out_of_unit_ratio_monotone():
    """ln14 must be strictly monotone over a fine grid spanning
    several exponent boundaries (catches off-by-one in the range
    reduction, where a wrong e would jump by ~ln2)."""
    prev = None
    for num in range(1, 4096):
        v = ln14_py(num, 64)
        if prev is not None:
            assert v > prev
        prev = v


@pytest.mark.parametrize("shift", range(0, 41))
def test_exact_powers_of_two(shift):
    up = ln14_py(1 << shift, 1)
    dn = ln14_py(1, 1 << shift)
    assert up == shift * LN2_S
    assert dn == -shift * LN2_S


def test_no_double_rounding_spelling_anywhere():
    """Regression lock for the round-10 sweep: no oracle may ever
    reintroduce floor(round(x, d) * scale + 0.5) — the
    double-rounding spelling where Spark's BigDecimal HALF_UP and
    DuckDB's float rounding can disagree on bit-identical doubles."""
    import re

    import __spark_entry__ as E

    for name, sql in E.oracle_sql().items():
        flat = re.sub(r"\s+", "", sql).lower()
        assert "floor(round(" not in flat, (
            f"{name}: double-rounding fixed point crept back in"
        )


def test_psi_at_trillion_row_counts(spark):
    """The 100 TB design claim, executed: psi_from_counts over
    bucket-count frames with 1e12-scale totals (the counts ARE the
    sufficient statistics, so trillion-row snapshots reduce to
    n_buckets integers) must neither overflow decimal(38,0) nor
    deviate from a pure-Python integer replay of the exact same
    algorithm (intlog spec functions on arbitrary-precision ints)."""
    from avk_job_skill_analytics_spark.operators.dataquality import (
        psi_from_counts,
    )
    from avk_job_skill_analytics_spark.operators.intlog import (
        contrib_fp6_py,
        ln14_py,
        sdiv10_py,
    )

    n_buckets = 5
    counts_a = [400_000_000_000, 300_000_000_000, 200_000_000_000,
                99_999_999_999, 1]
    counts_b = [100_000_000_000, 350_000_000_000, 250_000_000_000,
                299_999_999_998, 2]
    a = spark.createDataFrame(
        [(i, c) for i, c in enumerate(counts_a)], "bucket int, n_a long"
    )
    b = spark.createDataFrame(
        [(i, c) for i, c in enumerate(counts_b)], "bucket int, n_b long"
    )
    got = {r["bucket"]: r.asDict()
           for r in psi_from_counts(a, b, n_buckets).collect()}

    M = 1_000_000
    ta, tb = sum(counts_a), sum(counts_b)
    exp_contribs = {}
    for i in range(n_buckets):
        pa_num = counts_a[i] * M + ta
        pb_num = counts_b[i] * M + tb
        lr14 = ln14_py(pa_num * tb, pb_num * ta)
        d10 = sdiv10_py(pa_num * tb - pb_num * ta, ta * tb * M)
        exp_contribs[i] = contrib_fp6_py(d10, lr14)
        exp_share_a = (2 * M * pa_num + ta * M) // (2 * ta * M)
        assert got[i]["share_a_fp"] == exp_share_a
        assert got[i]["contrib_fp"] == exp_contribs[i], i
    assert got[0]["psi_fp"] == sum(exp_contribs.values())
    # sanity: a genuinely drifted pair produces a big positive PSI
    assert got[0]["psi_fp"] > 100_000
