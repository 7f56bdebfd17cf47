"""Streaming / incremental-processing inventory (SURVEY.md §2.9)."""

from __future__ import annotations

QUERIES = {}
ORACLES = {}
