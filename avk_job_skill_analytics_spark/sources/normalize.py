"""P1/P2 — schema normalization at the extract edge
(src/data_extract.py:160-200).

The reference ingests heterogeneous sources (Kaggle CSV, HuggingFace
dataset, Excel) and maps each to the canonical 11-column schema with
per-source column maps and ``""`` fallbacks for absent columns. Here
that is a single select-with-alias projection — Catalyst prunes the
unused source columns all the way into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_columns(df: DataFrame, colmap: dict[str, str]) -> DataFrame:
    """Project ``df`` to ``colmap`` keys: ``{dst: src}``; a missing
    ``src`` column becomes ``lit("")`` (the reference's fallback,
    src/data_extract.py:166-170)."""
    cols = [
        (F.col(src) if src in df.columns else F.lit("")).alias(dst)
        for dst, src in colmap.items()
    ]
    return df.select(*cols)


def conform(df: DataFrame, final_cols: list[str]) -> DataFrame:
    """P2 — fixed final-schema ordering (FINAL_COLS,
    src/data_extract.py:160-164); absent columns become ''."""
    return df.select(
        *[
            (F.col(c) if c in df.columns else F.lit("")).alias(c)
            for c in final_cols
        ]
    )
