"""Drift guard for the canonical Knuth-hash SQL spelling.

Several registry oracles inline the overflow-free split-multiply
hash as a literal SQL string (readability inside long oracle
bodies) instead of calling :func:`hashing.knuth32_sql`. Those
copies were verified byte-identical once — this test keeps them
identical MECHANICALLY: every occurrence of the multiplier constant
in registry source must sit inside a span that matches the exact
template ``knuth32_sql(expr)`` emits (same arg in both slots), so
any future edit to the canonical hash that misses an inlined copy
fails here instead of silently forking the oracle-side hash.
"""

from __future__ import annotations

import glob
import os
import re

from avk_job_skill_analytics_spark.operators.hashing import knuth32_sql

REGISTRY = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "avk_job_skill_analytics_spark", "registry",
)
CONST = "2654435761"
# the canonical template with each expr slot as a capture group
_ARG = r"([A-Za-z_][\w.]*)"
PAT = re.compile(
    re.escape(knuth32_sql("\x00")).replace(re.escape("\x00"), _ARG)
)


def test_every_inlined_knuth_copy_matches_canonical():
    offenders = {}
    for path in sorted(glob.glob(os.path.join(REGISTRY, "*.py"))):
        with open(path) as f:
            src = re.sub(r"\s+", " ", f.read())
        spans = [
            m.span() for m in PAT.finditer(src)
            if m.group(1) == m.group(2)
        ]
        bad = [
            i for i in range(len(src))
            if src.startswith(CONST, i)
            and not any(s <= i < e for s, e in spans)
        ]
        if bad:
            offenders[os.path.basename(path)] = [
                src[max(0, i - 80):i + 40] for i in bad
            ]
    assert not offenders, (
        "inlined Knuth-hash spellings diverged from"
        f" hashing.knuth32_sql: {offenders}"
    )


def test_canonical_copies_exist():
    """The guard above must actually be guarding something: the
    registry is expected to contain inlined copies (if they are ever
    all converted to f-string calls, this test — and the guard — can
    be retired together)."""
    total = 0
    for path in glob.glob(os.path.join(REGISTRY, "*.py")):
        with open(path) as f:
            total += f.read().count(CONST)
    assert total >= 10
