"""F3 — employment-type inference (src/transform.py:44-64).

The reference concatenates job_type + title, regex-detects each label,
multi-labels the row, sorts the labels, joins with ', ', defaults to
'Not specified'. Implemented as pure array expressions:
``array(when(rlike,label)...) → filter nulls → array_sort → array_join``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# label → case-insensitive detection regex (mirrors src/transform.py:49-58)
JOB_TYPE_PATTERNS: dict[str, str] = {
    "Full-Time": r"(?i)\bfull[\s_-]?time\b|\bft\b",
    "Part-Time": r"(?i)\bpart[\s_-]?time\b|\bpt\b",
    "Contract": r"(?i)\bcontract(or)?\b",
    "Internship": r"(?i)\bintern(ship)?\b",
    "Temporary": r"(?i)\btemp(orary)?\b",
    "Freelance": r"(?i)\bfreelanc(e|er|ing)\b",
}

DEFAULT_JOB_TYPE = "Not specified"


def infer_job_type(text: Column | str,
                   patterns: dict[str, str] | None = None,
                   default: str = DEFAULT_JOB_TYPE) -> Column:
    """Multi-label type inference over free text. Labels are emitted in
    sorted order joined by ', ' (matching the reference's
    ``', '.join(sorted(found))``)."""
    c = F.col(text) if isinstance(text, str) else text
    pats = patterns or JOB_TYPE_PATTERNS
    hits = F.array(
        *[F.when(c.rlike(rx), F.lit(label)) for label, rx in pats.items()]
    )
    found = F.array_sort(F.filter(hits, lambda x: x.isNotNull()))
    return F.coalesce(
        F.nullif(F.array_join(found, ", "), F.lit("")), F.lit(default)
    )
