"""Integer-only fixed-point natural log — ZERO libm calls.

``exactlog`` (round 9) made every oracle-replayed ``ln`` receive one
bit-identical double on both engines, leaving exactly one residual
hazard: the 1-ulp freedom IEEE-754 grants ``log`` itself. JVM
``StrictMath.log`` and whatever libm the driver's DuckDB build links
CAN disagree in the last bit, and at a ``fp6`` rounding boundary that
single ulp flips the compared integer — the round-8/round-9
``dq_psi_drift`` / ``ml_information_value`` driver-gate failures that
persisted even after the exactlog rewrite passed locally (VERDICT r9
"What's wrong" #1: the divergence is live in the driver's libm, not
in this container's).

This module removes libm from the equation entirely: ``ln(num/den)``
is evaluated in PURE INTEGER ARITHMETIC — decimal(38,0) on Spark,
HUGEINT on DuckDB — using only +, -, *, %, comparisons, and
floor-division of POSITIVE operands. Every one of those operations is
exactly specified, so the two engines produce the SAME integer on
every input, always. No boundary can flip, because there is no float
anywhere in the compared value's lineage.

Algorithm (classic range-reduced atanh series, all fixed-point):

1. **Exponent.** ``e = floor(log2(num/den))`` from two monotone
   comparison chains — ``num div 2^k >= den`` counts the positive
   side, ``(den-1) div 2^(k-1) >= num`` (⇔ ``num·2^(k-1) < den``,
   exactly, without forming the overflowing product) the negative.
2. **Mantissa.** ``m = (num/den)/2^e ∈ [1, 2)`` as the exact fraction
   ``(num·2^max(-e,0), den·2^max(e,0))`` — the shifted side is
   bounded by TWICE the other input by construction, so no overflow
   regardless of ``e``. The power of two is the product of the chain
   indicators (monotone ⇒ ``Π(c_k ? 2 : 1) = 2^Σc_k``).
3. **z.** ``z = (m-1)/(m+1) ∈ [0, 1/3)`` quantized to scale 1e14 by
   TWO-STAGE floor division (numerator·1e7 stays under 38 digits).
4. **Series.** ``ln m = 2·Σ_{j≥0} z^(2j+1)/(2j+1)`` — 15 terms
   (``(1/3)^29/29 < 1e-15``), powers advanced by two rescaling
   floor-divisions per step.
5. ``ln(num/den)·1e14 ≈ e·floor(ln2·1e14) + ln m`` — a SIGNED
   integer, built from exact products and sums only.

Accuracy: every floor loses < 1e-14 and ~35 floors participate, so
``|ln14/1e14 − ln(num/den)| < 1e-12`` (property-tested against
``math.log`` in tests/test_intlog.py). Determinism: bit-exact across
engines — also property-tested, Spark vs DuckDB vs the pure-Python
twin on random fractions.

Preconditions (asserted by callers): ``1 ≤ num, den < 1.5e30`` and
``num/den ∈ [2^-40, 2^40]``. The PSI/IV callers satisfy the bound up
to ``1e12`` rows per snapshot (1e18-scale smoothed numerators × 1e12
totals), i.e. beyond the 100 TB design point.

Floor-division spelling per engine (positive operands only, so
truncation ≡ floor on both):

- Spark: ``CAST((a - a % b) / b AS DECIMAL(38,0))`` — the ``a % b``
  subtraction makes the decimal division EXACT (integral quotient;
  the capped decimal(38,6) result type would otherwise HALF_UP-round
  a fractional quotient). ``a div b`` is NOT usable: IntegralDivide
  casts through long and wraps for 38-digit operands.
- DuckDB: ``a // b`` (HUGEINT, truncating).

Reference parity: the PSI/WOE statistics themselves mirror the
reference's BI layer drift/screening cards (SURVEY.md §2.11); this
module is pure cross-engine verification infrastructure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "K_EXP",
    "SCALE",
    "LN2_S",
    "idiv_sql",
    "big_sql",
    "ln14_steps",
    "apply_steps",
    "with_ln14",
    "ln14_ctes",
    "ln14_py",
    "fp6_from_ln14_sql",
    "fp6_from_ln14_py",
    "fp6_ratio_sql",
    "fp6_ratio_py",
    "contrib_fp6_sql",
    "contrib_fp6_py",
    "sdiv10_steps",
    "sdiv10_ctes",
    "sdiv10_py",
]

K_EXP = 40                     # |floor(log2(num/den))| <= 40
SCALE = 10 ** 14               # ln fixed-point scale
HALF = 10 ** 7                 # two-stage division half-scale
N_TERMS = 15                   # series terms j = 0..14 (z^29 last)
LN2_S = 69314718055994         # floor(ln(2) * 1e14)

_BIG = {"spark": "DECIMAL(38,0)", "duckdb": "HUGEINT"}


def big_sql(x, dialect: str) -> str:
    """An integer literal/expression as the dialect's exact wide-int
    carrier (decimal(38,0) <-> HUGEINT)."""
    return f"CAST({x} AS {_BIG[dialect]})"


def idiv_sql(a: str, b: str, dialect: str) -> str:
    """Exact floor division of POSITIVE wide integers — see module
    docstring for why Spark needs the mod-subtract spelling."""
    if dialect == "spark":
        return (f"CAST((({a}) - (({a}) % ({b}))) / ({b})"
                f" AS DECIMAL(38,0))")
    return f"(({a}) // ({b}))"


def _pow2(k: int) -> int:
    return 1 << k


def ln14_steps(num_col: str, den_col: str, out_col: str,
               dialect: str, pfx: str = "_il",
               k_exp: int = K_EXP) -> list[tuple[str, str]]:
    """The ordered (column, expression) chain computing
    ``out_col = round-down-ish(ln(num_col/den_col) * 1e14)`` as a
    signed wide integer. Each expression references only the two
    input columns and EARLIER steps, so the chain drops into a
    ``withColumn`` sequence (Spark) or a CTE ladder (DuckDB) —
    naming the steps is what keeps the SQL text linear instead of
    exponentially expanded."""
    d = dialect
    B = lambda x: big_sql(x, d)  # noqa: E731
    n, dn = f"({num_col})", f"({den_col})"

    # monotone indicator chains: up_k <=> num >= den * 2^k,
    # down_k <=> num * 2^(k-1) < den  (both via division, no overflow)
    ups = [
        f"(CASE WHEN {idiv_sql(n, B(_pow2(k)), d)} >= {dn}"
        f" THEN 1 ELSE 0 END)"
        for k in range(1, k_exp + 1)
    ]
    downs = [
        f"(CASE WHEN {idiv_sql(f'({dn} - {B(1)})', B(_pow2(k - 1)), d)}"
        f" >= {n} THEN 1 ELSE 0 END)"
        for k in range(1, k_exp + 1)
    ]
    up2 = " * ".join(u.replace("THEN 1", f"THEN {B(2)}")
                     .replace("ELSE 0", f"ELSE {B(1)}") for u in ups)
    down2 = " * ".join(w.replace("THEN 1", f"THEN {B(2)}")
                       .replace("ELSE 0", f"ELSE {B(1)}") for w in downs)

    steps: list[tuple[str, str]] = []
    steps.append((f"{pfx}_e",
                  f"CAST(({' + '.join(ups)}) - ({' + '.join(downs)})"
                  f" AS BIGINT)"))
    steps.append((f"{pfx}_mn", f"{n} * {down2}"))
    steps.append((f"{pfx}_md", f"{dn} * {up2}"))
    steps.append((f"{pfx}_p", f"({pfx}_mn - {pfx}_md)"))
    steps.append((f"{pfx}_q", f"({pfx}_mn + {pfx}_md)"))
    # z at scale 1e14 via two-stage division (P*1e7 < 1e38 twice)
    steps.append((f"{pfx}_h1",
                  idiv_sql(f"({pfx}_p * {B(HALF)})", f"{pfx}_q", d)))
    steps.append((
        f"{pfx}_z",
        f"({pfx}_h1 * {B(HALF)} + "
        + idiv_sql(f"(({pfx}_p * {B(HALF)} - {pfx}_h1 * {pfx}_q)"
                   f" * {B(HALF)})", f"{pfx}_q", d)
        + ")",
    ))
    # odd powers of z, each advanced by z^2 with two rescales
    prev = f"{pfx}_z"
    terms = [f"{pfx}_z"]
    for j in range(1, N_TERMS):
        u = idiv_sql(f"({prev} * {pfx}_z)", B(SCALE), d)
        w = f"{pfx}_w{j}"
        steps.append((w, idiv_sql(f"({u} * {pfx}_z)", B(SCALE), d)))
        terms.append(idiv_sql(w, B(2 * j + 1), d))
        prev = w
    steps.append((
        out_col,
        f"(CAST({pfx}_e AS {_BIG[d]}) * {B(LN2_S)}"
        f" + {B(2)} * ({' + '.join(terms)}))",
    ))
    return steps


def apply_steps(df: DataFrame, steps: list[tuple[str, str]],
                keep: list[str] | None = None) -> DataFrame:
    """Apply a step chain as ONE projection using Spark's lateral
    column aliases (each step expression references earlier steps by
    name inside the same SELECT). A ``withColumn`` loop would
    re-analyze the accumulated plan per step — ~3.7 s of driver time
    for the 22-step ln ladder (round 10, measured); one ``selectExpr``
    analyzes once. Values are identical: the aliases name the same
    expressions the loop would build."""
    out = df.selectExpr("*", *[f"{e} AS {n}" for n, e in steps])
    if keep is not None:
        out = out.drop(*[n for n, _ in steps if n not in keep])
    return out


def with_ln14(df: DataFrame, num_col: str, den_col: str,
              out_col: str, pfx: str = "_il") -> DataFrame:
    """Append ``out_col = ln14(num_col/den_col)`` to a DataFrame via
    the step chain (intermediates dropped). Pure per-row scalar
    arithmetic — no shuffle, no UDF, stays inside codegen."""
    steps = ln14_steps(num_col, den_col, out_col, "spark", pfx)
    return apply_steps(df, steps, keep=[out_col])


def _steps_ctes(src: str, head: list[tuple[str, str]],
                steps: list[tuple[str, str]],
                pfx: str) -> tuple[str, str]:
    """A step chain as a DuckDB CTE ladder: one SELECT * per step so
    the SQL text stays LINEAR in the step count (inlining would
    expand exponentially). Returns (fragment, final_relation)."""
    first = ", ".join(f"{e} AS {n}" for n, e in head)
    ctes = [f"{pfx}0 AS (SELECT *{', ' + first if head else ''}"
            f" FROM {src})"]
    prev = f"{pfx}0"
    for i, (name, expr) in enumerate(steps, start=1):
        rel = f"{pfx}{i}"
        ctes.append(f"{rel} AS (SELECT *, {expr} AS {name}"
                    f" FROM {prev})")
        prev = rel
    return ",\n       ".join(ctes), prev


def ln14_ctes(src: str, num_expr: str, den_expr: str, out_col: str,
              pfx: str = "_il", k_exp: int = K_EXP) -> tuple[str, str]:
    """DuckDB CTE ladder: returns (fragment, final_relation). The
    fragment is a comma-joined list of CTE definitions (append after
    an existing WITH list); the final relation carries every ``src``
    column plus ``out_col``. ``num_expr``/``den_expr`` may be
    arbitrary expressions over ``src`` columns."""
    steps = ln14_steps(f"{pfx}_num", f"{pfx}_den", out_col,
                       "duckdb", pfx, k_exp=k_exp)
    return _steps_ctes(
        src,
        [(f"{pfx}_num", num_expr), (f"{pfx}_den", den_expr)],
        steps, pfx)


def sdiv10_ctes(src: str, num_expr: str, den_expr: str, out_col: str,
                pfx: str = "_sd") -> tuple[str, str]:
    """DuckDB CTE ladder for the signed scale-1e10 ratio."""
    steps = sdiv10_steps(f"{pfx}_num", f"{pfx}_den", out_col,
                         "duckdb", pfx)
    return _steps_ctes(
        src,
        [(f"{pfx}_num", num_expr), (f"{pfx}_den", den_expr)],
        steps, pfx)


def ln14_py(num: int, den: int, k_exp: int = K_EXP) -> int:
    """Pure-Python twin — the executable spec both engines must
    match bit-for-bit (Python ints are exact; // of positives is the
    same floor both dialects compute)."""
    assert num >= 1 and den >= 1
    e = 0
    for k in range(1, k_exp + 1):
        if num // _pow2(k) >= den:
            e += 1
    for k in range(1, k_exp + 1):
        if (den - 1) // _pow2(k - 1) >= num:
            e -= 1
    mn = num * _pow2(max(-e, 0))
    md = den * _pow2(max(e, 0))
    p, q = mn - md, mn + md
    h1 = (p * HALF) // q
    z = h1 * HALF + ((p * HALF - h1 * q) * HALF) // q
    acc, w = z, z
    for j in range(1, N_TERMS):
        w = (((w * z) // SCALE) * z) // SCALE
        acc += w // (2 * j + 1)
    return e * LN2_S + 2 * acc


# 1e17 offset keeps the quantizing division's operands positive so
# truncation == floor on both engines (|ln14| <= ~2.8e15 << 1e17).
_FP6_OFF = 10 ** 17
_FP6_DIV = 10 ** 8


def fp6_from_ln14_sql(ln14: str, dialect: str) -> str:
    """Half-up 1e-6 fixed point of a scale-1e14 integer log:
    ``floor((ln14 + 0.5e8)/1e8)`` — spelled with a positive offset
    so no engine's negative-division convention can matter."""
    inner = idiv_sql(
        f"({ln14} + {big_sql(_FP6_OFF + _FP6_DIV // 2, dialect)})",
        big_sql(_FP6_DIV, dialect), dialect)
    return f"CAST({inner} - {_FP6_OFF // _FP6_DIV} AS BIGINT)"


def fp6_from_ln14_py(ln14: int) -> int:
    return (ln14 + _FP6_OFF + _FP6_DIV // 2) // _FP6_DIV \
        - _FP6_OFF // _FP6_DIV


def fp6_ratio_sql(num: str, den: str, dialect: str) -> str:
    """EXACT half-up fp6 of a ratio of positive wide integers:
    ``floor(num/den*1e6 + 0.5) = floor((2e6*num + den) / (2*den))``
    — one integer floor division, no float anywhere."""
    inner = idiv_sql(
        f"({big_sql(2_000_000, dialect)} * ({num}) + ({den}))",
        f"({big_sql(2, dialect)} * ({den}))", dialect)
    return f"CAST({inner} AS BIGINT)"


def fp6_ratio_py(num: int, den: int) -> int:
    return (2_000_000 * num + den) // (2 * den)


# contrib = (d10/1e10) * (ln14/1e14); fp6 half-up of it is
# floor((d10*ln14 + 0.5e18)/1e18) — signed, so a 1e27 positive offset
# (|d10*ln14| <= ~3e25) makes truncation == floor on both engines.
_CTR_OFF = 10 ** 27
_CTR_DIV = 10 ** 18


def contrib_fp6_sql(d10: str, ln14: str, dialect: str) -> str:
    """Half-up fp6 of the PRODUCT of a scale-1e10 signed ratio and a
    scale-1e14 signed log — the (p_a − p_b)·ln(p_a/p_b) shape shared
    by PSI contributions and IV contributions."""
    inner = idiv_sql(
        f"(({d10}) * ({ln14})"
        f" + {big_sql(_CTR_OFF + _CTR_DIV // 2, dialect)})",
        big_sql(_CTR_DIV, dialect), dialect)
    return f"CAST({inner} - {_CTR_OFF // _CTR_DIV} AS BIGINT)"


def contrib_fp6_py(d10: int, ln14: int) -> int:
    return (d10 * ln14 + _CTR_OFF + _CTR_DIV // 2) // _CTR_DIV \
        - _CTR_OFF // _CTR_DIV


def sdiv10_steps(num_col: str, den_col: str, out_col: str,
                 dialect: str, pfx: str = "_sd") -> list[tuple[str, str]]:
    """SIGNED ratio quantized to scale 1e10 by two-stage positive
    floor division (truncation toward zero on |num|, sign
    re-applied): ``out = sign(num) * floor(|num|*1e10 / den)``.
    Precondition: |num| <= den * 1.1 and den < 1.5e30."""
    d = dialect
    B = lambda x: big_sql(x, d)  # noqa: E731
    n, dn = f"({num_col})", f"({den_col})"
    h = 10 ** 5
    steps: list[tuple[str, str]] = []
    steps.append((f"{pfx}_a", f"abs({n})"))
    steps.append((f"{pfx}_g",
                  f"(CASE WHEN {n} < {B(0)} THEN {B(-1)}"
                  f" ELSE {B(1)} END)"))
    steps.append((f"{pfx}_h1", idiv_sql(f"({pfx}_a * {B(h)})", dn, d)))
    steps.append((
        out_col,
        f"({pfx}_g * ({pfx}_h1 * {B(h)} + "
        + idiv_sql(f"(({pfx}_a * {B(h)} - {pfx}_h1 * {dn}) * {B(h)})",
                   dn, d)
        + "))",
    ))
    return steps


def sdiv10_py(num: int, den: int) -> int:
    sgn = -1 if num < 0 else 1
    a = abs(num)
    h = 10 ** 5
    h1 = (a * h) // den
    return sgn * (h1 * h + ((a * h - h1 * den) * h) // den)
