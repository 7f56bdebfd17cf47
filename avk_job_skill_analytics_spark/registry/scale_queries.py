"""Beyond-reference scale operators (dedup / similarity / text analysis)."""

from __future__ import annotations

QUERIES = {}
ORACLES = {}
