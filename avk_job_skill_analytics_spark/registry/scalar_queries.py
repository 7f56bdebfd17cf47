"""Scalar-function inventory (SURVEY.md §2.8) bound to driver testdata."""

from __future__ import annotations

QUERIES = {}
ORACLES = {}
