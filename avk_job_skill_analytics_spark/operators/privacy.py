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
