"""Distributed linear-model training (beyond-reference).

Full-batch gradient-descent logistic regression done Spark-first:
each iteration is ONE corpus scan reduced to a d-element gradient by
a partial+final aggregate (the classic ``treeAggregate`` GD shape —
map-side combine leaves d BIGINTs per partition on the wire, so the
shuffle is O(partitions·d) no matter the corpus size), and the
driver holds only the d-integer weight vector between rounds — the
same bounded-driver discipline as clustering.kmeans_fit's k×dim
centroid collect.

Engine-exact verification discipline (the kmeans/PCA playbook
applied to GD):

- the sigmoid is the RATIONAL approximation
  ``σ̃(z) = 0.5 + z / (2·(1+|z|))`` — only +, ×, /, abs, all IEEE
  correctly-rounded, so per-row values are bit-identical across
  engines (libm ``exp`` carries no such guarantee and would break
  the hash);
- per-row gradient contributions are quantized to integer
  micro-units with ``floor(g·1e6)`` BEFORE summation, so the
  reduction is an exact BIGINT sum — associativity-safe under any
  partitioning/combine order;
- the weight update runs driver-side in exact integer arithmetic
  with one deterministic double division per component
  (``floor((lr_num·G) / (lr_den·n))`` — products stay below 2^53
  for any corpus below ~4×10^9 rows at the bounded feature scale,
  and every individual double op is correctly rounded, so the
  DuckDB oracle's unrolled replay lands on the identical integers);
- weights re-enter the plan as inlined ``repr`` round-trip double
  literals (clustering.sql_double), bit-equal to the oracle's
  in-SQL ``CAST(W AS DOUBLE) / 1000000.0``.

Predictions use the exact decision rule ``z >= 0`` (σ̃ and the true
sigmoid agree on sign), so the confusion counts are integers.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

from .clustering import sql_double

MICRO = 1_000_000


def _z_sql(w_micro: list[int], feature_cols: list[str],
           as_literal: bool = True) -> str:
    """The margin expression with a FIXED left-to-right association:
    ``(((w0·x0) + w1·x1) + w2·x2) ...`` — written identically by the
    Spark plan and the oracle so every intermediate double matches.
    ``feature_cols[0]`` is conventionally a literal ``1.0`` bias."""
    if as_literal:
        ws = [sql_double(w / MICRO) for w in w_micro]
    else:  # oracle-side: weights come from a CTE in micro units
        ws = [f"(CAST({w} AS DOUBLE) / 1000000.0)" for w in w_micro]
    z = f"({ws[0]} * {feature_cols[0]})"
    for w, x in zip(ws[1:], feature_cols[1:]):
        z = f"({z} + ({w} * {x}))"
    return z


def resid_sql(z: str, label_col: str) -> str:
    """σ̃(z) − y with the rational sigmoid (exact IEEE ops only)."""
    return (f"((0.5 + (({z}) / (2.0 * (1.0 + abs({z}))))) "
            f"- {label_col})")


def grad_exprs(w_micro: list[int], feature_cols: list[str],
               label_col: str, as_literal: bool = True) -> list[str]:
    """Per-feature micro-gradient aggregate expressions: the exact
    BIGINT sums of ``floor((r · x_j) · 1e6)``."""
    z = _z_sql(w_micro, feature_cols, as_literal)
    r = resid_sql(z, label_col)
    return [
        f"sum(CAST(floor((({r}) * {x}) * 1000000.0) AS BIGINT))"
        for x in feature_cols
    ]


def update_weights(w_micro: list[int], grads: list[int], n: int,
                   lr_num: float, lr_den: float) -> list[int]:
    """One exact GD step in micro-units. The double products/division
    are correctly rounded and below 2^53, so the oracle's SQL replay
    (``floor((lr_num·G) / (lr_den·n))``) produces identical ints."""
    return [
        w - math.floor((lr_num * float(g)) / (lr_den * float(n)))
        for w, g in zip(w_micro, grads)
    ]


def logreg_fit_gd(feats: DataFrame, feature_cols: list[str],
                  label_col: str, iters: int = 3,
                  lr_num: float = 1.0, lr_den: float = 2.0
                  ) -> tuple[list[int], int]:
    """Fit by ``iters`` full-batch GD rounds; returns (micro-weights,
    n). One scan per round; the driver never holds more than d
    integers + one row count."""
    w = [0] * len(feature_cols)
    n = None
    for _ in range(iters):
        exprs = ["count(*) AS n"] + [
            f"{g} AS g{j}"
            for j, g in enumerate(
                grad_exprs(w, feature_cols, label_col))
        ]
        row = feats.selectExpr(*exprs).collect()[0]
        n = int(row["n"])
        grads = [int(row[f"g{j}"]) for j in range(len(feature_cols))]
        w = update_weights(w, grads, n, lr_num, lr_den)
    return w, n


def logreg_report(feats: DataFrame, feature_cols: list[str],
                  label_col: str, w_micro: list[int],
                  stat_names: list[str]) -> DataFrame:
    """Final ledger: micro-weights + exact confusion counts at the
    ``z >= 0`` decision rule, stacked as (stat, value) BIGINT rows."""
    z = _z_sql(w_micro, feature_cols)
    agg = feats.selectExpr(
        f"sum(CASE WHEN ({z}) >= 0.0 THEN 1 ELSE 0 END) AS n_pred_pos",
        f"sum(CASE WHEN (CASE WHEN ({z}) >= 0.0 THEN 1.0 ELSE 0.0 END)"
        f" = {label_col} THEN 1 ELSE 0 END) AS n_correct",
        "count(*) AS n_total",
    )
    weight_rows = ", ".join(
        f"'{s}', CAST({w} AS BIGINT)"
        for s, w in zip(stat_names, w_micro)
    )
    k = len(w_micro) + 3
    return agg.selectExpr(
        f"""stack({k}, {weight_rows},
                 'n_pred_pos', CAST(n_pred_pos AS BIGINT),
                 'n_correct', CAST(n_correct AS BIGINT),
                 'n_total', CAST(n_total AS BIGINT)) AS (stat, value)"""
    )
