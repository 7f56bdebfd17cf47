"""Cross-engine-exact logarithms and fixed-point quantization.

Every oracle-replayed query that touches ``ln`` must feed libm the
IDENTICAL double on both engines, because IEEE-754 specifies +,-,*,/
and casts exactly but ``log`` only to within 1 ulp (JVM ``Math.log``
vs DuckDB's libm CAN differ in the last bit). The repo-wide
discipline (proven by ``classify._llr_fp``; mandated for the whole
family after the round-8 ``dq_psi_drift`` / ``ml_information_value``
driver-gate flips):

1. **One log of one exact integer fraction.** Cross-multiply every
   smoothed / compound ratio until ``ln`` receives
   ``num/den`` where ``num`` and ``den`` are exact integers
   (``decimal(38,0)`` ↔ DuckDB HUGEINT at the 100-TB design point).
   Integer arithmetic and the two int→double casts and the single
   division are all exactly specified, so both engines hand libm
   the same bits.
2. **Single-rounding fixed point** (``fp6_floor``):
   ``floor(x·1e6 + 0.5)`` with NO ``round(x, 6)`` first. Spark's
   ``round`` goes through BigDecimal's shortest-decimal string
   (HALF_UP on the decimal rendering) while DuckDB rounds in float
   arithmetic — near a ``·5e-7`` boundary the two DISAGREE on
   bit-identical input. ``floor(x·1e6 + 0.5)`` is two exactly
   specified float ops + floor: bit-identical input ⇒ identical
   integer, always. The only residual hazard is the 1-ulp libm skew
   on the log OUTPUT, which flips the integer only when
   ``x·1e6 + 0.5`` sits within ~1 ulp of an integer —
   ``tests/test_log_boundaries.py`` sweeps the registry's log
   queries on testdata and asserts a wide margin.

Each Spark builder has a ``*_sql`` twin generating the DuckDB
spelling with the SAME operand order, so a registry entry cannot
drift from its oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "DEC",
    "as_dec",
    "frac",
    "log_frac",
    "fp6_floor",
    "log_fp",
    "as_dec_sql",
    "frac_sql",
    "log_frac_sql",
    "fp6_floor_sql",
    "log_fp_sql",
]

DEC = "decimal(38,0)"
_MIL = 1_000_000.0


def as_dec(x) -> Column:
    """Exact-integer carrier for cross-multiplied numerators /
    denominators: decimal(38,0) (DuckDB twin: HUGEINT). Longs wrap at
    ~9.2e18, which a 1e12-row count times the 1e6 smoothing scale
    already threatens; 38 digits hold any product this repo forms."""
    return (x if isinstance(x, Column) else F.lit(x)).cast(DEC)


def frac(num: Column, den: Column) -> Column:
    """The double ``num/den`` of two exact integers: two exact casts
    + one correctly-rounded division — bit-identical across engines."""
    return num.cast("double") / den.cast("double")


def log_frac(num: Column, den: Column) -> Column:
    """``ln(num/den)`` with the log fed one exact integer fraction —
    the only place a 1-ulp engine skew can enter."""
    return F.log(frac(num, den))


def fp6_floor(x: Column) -> Column:
    """Half-up 1e-6 fixed point in ONE rounding:
    ``floor(x*1e6 + 0.5)`` as BIGINT. No ``round(x, 6)`` first — see
    module docstring for why double-rounding is engine-divergent."""
    return F.floor(x * F.lit(_MIL) + F.lit(0.5)).cast("long")


def log_fp(num: Column, den: Column) -> Column:
    """fp6 of ``ln(num/den)`` over exact integers — the shared
    spelling for every log-carrying metric (LLR, WOE, PSI, idf,
    PMI, entropy...)."""
    return fp6_floor(log_frac(num, den))


# ------------------------------------------------------------------
# DuckDB twins — identical operand order, HUGEINT carrier.

def as_dec_sql(expr: str) -> str:
    return f"CAST({expr} AS HUGEINT)"


def frac_sql(num: str, den: str) -> str:
    return f"(CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE))"


def log_frac_sql(num: str, den: str) -> str:
    return f"ln{frac_sql(num, den)}"


def fp6_floor_sql(expr: str) -> str:
    return (f"CAST(floor({expr} * CAST(1000000 AS DOUBLE)"
            f" + CAST('0.5' AS DOUBLE)) AS BIGINT)")


def log_fp_sql(num: str, den: str) -> str:
    return fp6_floor_sql(log_frac_sql(num, den))
