"""PII detection and redaction (beyond-reference LLM-pipeline surface).

Training-data curation scrubs personally identifiable information
before anything reaches a model. This is the scan-speed path: every
detector is a plain regular expression evaluated inside whole-stage
codegen — no Python boundary, no shuffle, embarrassingly parallel at
any corpus size. The patterns deliberately stick to the regex subset
shared by Java (Spark) and RE2 (DuckDB/Go) — no backreferences, no
lookaround — so oracle engines count and redact identically.

Counts are computed against the ORIGINAL text, each category
independently; redaction then applies sequentially (emails first, so
digit runs inside an address can't be double-claimed by the phone
pattern)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Category -> (pattern, replacement token), in redaction order.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    "phone": (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
}


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-category match counts on the raw text (long columns)."""
    return {
        name: F.regexp_count(text, F.lit(pat)).cast("long")
        for name, (pat, _) in PII_PATTERNS.items()
    }


def redact_text(text: Column) -> Column:
    """The scrubbed text: every category replaced by its token, in
    PII_PATTERNS order."""
    out = text
    for pat, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, token)
    return out


def redact_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Scan-and-scrub: (id, n_email, n_ssn, n_phone, n_ipv4, n_pii,
    redacted). One codegen'd projection — the 100 TB cost is exactly
    one pass over the text bytes."""
    counts = pii_counts(F.col(text_col))
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.select(
        F.col(id_col),
        *[c.alias(f"n_{name}") for name, c in counts.items()],
        total.alias("n_pii"),
        redact_text(F.col(text_col)).alias("redacted"),
    )


# ------------------------- validated detectors (checksum, not regex)
CC_CANDIDATE = r"\b\d{4}[ -]?\d{4}[ -]?\d{4}[ -]?\d{4}\b"


def luhn_valid(digits: Column) -> Column:
    """Luhn checksum (ISO/IEC 7812) as a pure column expression: from
    the right, double every second digit (subtract 9 when it exceeds
    9), sum, valid iff the total is divisible by 10. Naive \\d{16}
    regexes flag order ids and timestamps; the checksum is what
    separates a plausible PAN from a random digit run, and running it
    as sequence→transform→aggregate keeps the validation inside
    codegen — no UDF, no shuffle."""
    clean = F.regexp_replace(digits, r"[ -]", "")
    rev = F.reverse(clean)
    contrib = F.transform(
        F.sequence(F.lit(1), F.length(rev)),
        lambda i: F.when(
            i % 2 == 0,
            F.when(
                F.substring(rev, i, 1).cast("int") * 2 > 9,
                F.substring(rev, i, 1).cast("int") * 2 - 9,
            ).otherwise(F.substring(rev, i, 1).cast("int") * 2),
        ).otherwise(F.substring(rev, i, 1).cast("int")),
    )
    total = F.aggregate(contrib, F.lit(0), lambda a, x: a + x)
    return (F.length(clean) >= 13) & (total % 10 == 0)


def credit_card_audit(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Candidate-vs-validated card ledger per document: extract every
    16-digit candidate run, validate each with the Luhn fold, report
    (n_cc_candidates, n_cc_valid). The gap between the two columns is
    the false-positive mass a regex-only scrubber would have redacted
    (or worse, a counter would have reported as leakage)."""
    cands = F.regexp_extract_all(F.col(text_col), F.lit(CC_CANDIDATE), 0)
    return df.select(
        F.col(id_col),
        F.size(cands).cast("long").alias("n_cc_candidates"),
        F.size(F.filter(cands, luhn_valid)).cast("long").alias("n_cc_valid"),
    )


# ------------------------------- differential-privacy release helpers
#
# Two-sided geometric ("discrete Laplace") noise — the standard DP
# mechanism for integer counts (Ghosh, Roughgarden & Sundararajan,
# "Universally Utility-Maximizing Privacy Mechanisms", STOC 2009).
# The noise draw is derived from a keyed hash of the release key
# instead of an RNG: u = md5_long(seed|key) is uniform on [0, 2^60),
# the low bit picks the sign, and the magnitude is how many
# precomputed integer thresholds T_i = floor(2^59 * (1 - alpha^i))
# the remaining 59 bits exceed, so P(|noise| >= i) ~ alpha^i with
# alpha = exp(-eps/sensitivity).  Every comparison is exact integer
# arithmetic on constants computed once driver-side — bit-identical
# on any engine, which is what makes the release auditable/replayable
# (a production deployment would swap the hash for a sealed RNG seed;
# the mechanism and its calibration are unchanged).

import math

_DP_BITS = 59


def geometric_thresholds(eps: float, cap: int = 12) -> list[int]:
    """T_i = floor(2^59 * (1 - alpha^i)), i = 1..cap, alpha=exp(-eps).
    The magnitude of the noise is #{i : v >= T_i} for v uniform on
    [0, 2^59) — a geometric tail truncated at cap (the truncation
    bias is alpha^cap, negligible for cap >= 12 at eps >= 0.5)."""
    alpha = math.exp(-eps)
    return [int((1 - alpha ** i) * (1 << _DP_BITS)) for i in
            range(1, cap + 1)]


def dp_noise(key: Column, seed: str, eps: float, cap: int = 12) -> Column:
    """Keyed two-sided geometric noise as a BIGINT column."""
    from .hashing import md5_long

    u = md5_long(F.concat(F.lit(seed + "|"), key))
    sign = (u % 2) * 2 - 1
    v = F.floor(u / 2).cast("long")
    mag = None
    for t in geometric_thresholds(eps, cap):
        term = (v >= F.lit(t)).cast("long")
        mag = term if mag is None else mag + term
    return (sign * mag).cast("long")


def dp_noise_sql(key_expr: str, seed: str, eps: float,
                 cap: int = 12) -> str:
    """DuckDB twin of dp_noise — same thresholds, same hash."""
    from .hashing import md5_long_sql

    u = md5_long_sql(f"concat('{seed}|', {key_expr})")
    mag = " + ".join(
        f"CASE WHEN (({u}) // 2) >= {t} THEN 1 ELSE 0 END"
        for t in geometric_thresholds(eps, cap)
    )
    return f"CAST(((({u}) % 2) * 2 - 1) * ({mag}) AS BIGINT)"


def k_anonymity_audit(df, quasi_cols: list[str], k: int = 5):
    """k-anonymity audit over a quasi-identifier tuple (Sweeney 2002):
    how many equivalence classes are smaller than k, and what fraction
    of ROWS sits in them — the re-identification exposure a release
    review asks for before data leaves the pipeline.

    One hash aggregate on the quasi-identifier tuple plus a 1-row
    rollup: linear, map-side combined, no skew concern (the hot
    classes are by definition the safe ones). Returns a single row
    (k, n_rows, n_classes, n_small_classes, n_risky_rows, risky_frac
    rounded 6)."""
    from pyspark.sql import functions as F

    classes = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("n"))
    return classes.agg(
        F.lit(k).alias("k"),
        F.sum("n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).alias("n_classes"),
        F.sum((F.col("n") < k).cast("int")).cast("long").alias(
            "n_small_classes"
        ),
        F.sum(F.when(F.col("n") < k, F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_risky_rows"),
        F.round(
            F.sum(F.when(F.col("n") < k, F.col("n")).otherwise(0))
            / F.sum("n"),
            6,
        ).alias("risky_frac"),
    )


def erasure_audit(tables, subject_pred) -> "DataFrame":
    """Right-to-erasure impact audit: before a deletion cohort is
    purged, report per table how many rows reference a cohort member
    and how many survive — the card a data-protection officer signs
    off on, and the reconciliation target the purge job must hit
    (post-purge, every n_purge must read 0).

    ``tables``: list of (name, df); ``subject_pred(df) -> Column``
    returns the boolean "row belongs to a cohort member" predicate
    for that table (NULL references are NOT cohort rows — an
    anonymous row needs no erasure). One conditional aggregate per
    table — each table is scanned once, no joins, no shuffle beyond
    the 1-row aggregates."""
    out = None
    for name, df in tables:
        pred = subject_pred(df)
        card = df.agg(
            F.lit(name).alias("table_name"),
            F.coalesce(F.sum(pred.cast("long")), F.lit(0))
            .cast("long").alias("n_purge"),
            F.coalesce(
                F.sum((~F.coalesce(pred, F.lit(False))).cast("long")),
                F.lit(0),
            ).cast("long").alias("n_keep"),
        )
        out = card if out is None else out.unionByName(card)
    return out


def l_diversity_audit(df, quasi_cols: list[str], sensitive_col: str,
                      l: int = 3):  # noqa: E741 — the metric's own name
    """l-diversity audit (Machanavajjhala et al., 2007) — the
    homogeneity check k-anonymity misses: an equivalence class can
    be large yet reveal everyone's sensitive value if that value is
    constant within it. Counts classes whose sensitive-value
    diversity falls below ``l`` and the row mass exposed.

    One aggregate on (quasi-tuple): per class, size and exact
    distinct sensitive values; then a 1-row rollup. Returns (l,
    n_rows, n_classes, n_low_diversity_classes, n_exposed_rows,
    exposed_frac rounded 6)."""
    classes = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(F.col(sensitive_col)).alias("ndv"),
    )
    low = F.col("ndv") < l
    return classes.agg(
        F.lit(l).alias("l"),
        F.sum("n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(low.cast("int")).cast("long")
        .alias("n_low_diversity_classes"),
        F.sum(F.when(low, F.col("n")).otherwise(0)).cast("long")
        .alias("n_exposed_rows"),
        F.round(
            F.sum(F.when(low, F.col("n")).otherwise(0))
            / F.sum("n"), 6
        ).alias("exposed_frac"),
    )


def pseudonymize(df: DataFrame, key_col: str, salt: str,
                 out_col: str = "pseudonym") -> DataFrame:
    """Deterministic keyed pseudonymization: replace an identifier
    with ``md5_long(salt | key)`` — the de-identification step that
    keeps JOINS working: the same (salt, key) maps to the same
    pseudonym in every table, on every engine, in every run, so
    referential integrity survives while the raw identifier never
    leaves the trust boundary (rotate the salt to break linkage with
    previously released data). One projection inside whole-stage
    codegen, no UDF, no lookup table to guard — the mapping is the
    hash itself. (Caveat, by design: a pseudonym is reversible by
    anyone holding the salt and the key space — this is
    de-identification for internal joins, not anonymization; pair
    with k-anonymity/dp for releases.)"""
    from .hashing import md5_long

    return df.withColumn(
        out_col,
        md5_long(
            F.concat(F.lit(salt + "|"),
                     F.col(key_col).cast("string"))
        ),
    )
