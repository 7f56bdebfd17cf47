"""Streaming data-quality gate — the expectation suite evaluated
ONLINE as files arrive, instead of by a nightly batch scan.

Each micro-batch pays one fused conditional-count aggregate (the
same ``check_num_den`` expressions the batch suite uses) and folds
the resulting exact integers into bounded driver state. Integer
addition is order-free, so the drained report is bit-identical to
running the batch ``expectation_report`` over the union of every
arrival — the oracle the driver gate replays. Uniqueness is
deliberately unsupported here: countDistinct does not merge by
addition across batches (the KMV sketch family covers streaming
cardinality).

Epoch-guarded against foreachBatch's at-least-once redelivery, same
discipline as the drift/heavy-hitter folds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.session import tiny_df

__all__ = [
    "foreach_batch_dq_fold",
    "dq_state_report_rows",
    "foreach_batch_psi_fold",
    "psi_report_from_state",
    "foreach_batch_ab_fold",
    "ab_monitor_card",
    "foreach_batch_freshness_fold",
    "freshness_report_rows",
    "foreach_batch_key_count_fold",
    "key_count_rows",
]

_MIL = 1_000_000

_MERGEABLE = ("completeness", "range", "membership", "non_negative")


def foreach_batch_dq_fold(stream: DataFrame, checks, state: dict,
                          transform=None) -> "object":
    """writeStream.foreachBatch sink folding a constraint suite.

    ``checks``: (name, kind, *args) tuples restricted to the
    mergeable kinds (completeness / range / membership /
    non_negative) — uniqueness raises at construction, loudly, not
    at drain time. ``state``: {"acc": {name: [num, den]}, "seen":
    set} — 2 integers per constraint, bounded regardless of stream
    length. ``transform``: optional DataFrame->DataFrame applied to
    each batch before the suite (the landing-zone map lives here so
    the gate validates what the pipeline would actually ingest)."""
    from ..operators.dataquality import check_num_den
    from .incremental import epoch_already_applied, epoch_mark_applied

    for chk in checks:
        if chk[1] not in _MERGEABLE:
            raise ValueError(
                f"constraint kind '{chk[1]}' does not merge across "
                "micro-batches; use the batch suite (or the KMV "
                "sketch family for streaming cardinality)"
            )
    state.setdefault("acc", {c[0]: [0, 0] for c in checks})

    def batch_fn(bdf: DataFrame, epoch_id: int) -> None:
        if epoch_already_applied(state, epoch_id):
            return
        if transform is not None:
            bdf = transform(bdf)
        aggs = []
        for chk in checks:
            num, den = check_num_den(chk[1], chk[2:])
            aggs += [num.alias(f"{chk[0]}__num"),
                     den.alias(f"{chk[0]}__den")]
        row = bdf.agg(*aggs).collect()[0]
        for chk in checks:
            acc = state["acc"][chk[0]]
            acc[0] += int(row[f"{chk[0]}__num"] or 0)
            acc[1] += int(row[f"{chk[0]}__den"] or 0)
        epoch_mark_applied(state, epoch_id)

    return stream.writeStream.foreachBatch(batch_fn)


def dq_state_report_rows(state: dict):
    """Render the drained fold state as the batch report's rows:
    (constraint, metric_fp, passed) with the identical integer
    discipline — floor(1e6 * num / den), 0 when the denominator is
    0 — so the streaming gate hash-matches the one-shot suite."""
    import math

    rows = []
    for name, (num, den) in state["acc"].items():
        metric = int(math.floor(_MIL * num / den)) if den > 0 else 0
        rows.append((name, metric, metric == _MIL))
    return rows


def foreach_batch_psi_fold(stream: DataFrame, value_col: str,
                           lo: float, hi: float, n_buckets: int,
                           state: dict) -> "object":
    """writeStream.foreachBatch sink folding the arrivals' PSI
    bucket counts — the distribution-drift monitor running ONLINE.

    Each micro-batch pays one n_buckets-row aggregate with the SAME
    bucketing Column as the batch report (dataquality.psi_bucket);
    the counts are exact integers, so the fold merges by addition
    and is order-free. ``state``: {"counts": [int]*n_buckets,
    "seen": set} — bounded by n_buckets regardless of stream
    length. Drain via ``psi_report_from_state`` for a report
    bit-identical to the batch ``psi_drift``."""
    from ..operators.dataquality import psi_bucket
    from .incremental import epoch_already_applied, epoch_mark_applied

    state.setdefault("counts", [0] * n_buckets)

    def batch_fn(bdf: DataFrame, epoch_id: int) -> None:
        if epoch_already_applied(state, epoch_id):
            return
        rows = (
            bdf.filter(F.col(value_col).isNotNull())
            .groupBy(psi_bucket(value_col, lo, hi, n_buckets)
                     .alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        for r in rows:
            state["counts"][r["bucket"]] += int(r["n"])
        epoch_mark_applied(state, epoch_id)

    return stream.writeStream.foreachBatch(batch_fn)


def psi_report_from_state(spark, ref_df: DataFrame, value_col: str,
                          lo: float, hi: float, n_buckets: int,
                          state: dict) -> DataFrame:
    """Drain the folded arrival counts against a reference snapshot:
    builds the arrivals' count frame from the state integers and
    delegates to dataquality.psi_from_counts — the SAME plan, float
    order, and integer contrib sum as the batch report, so online ==
    offline by construction, not by luck."""
    from ..operators.dataquality import psi_bucket, psi_from_counts

    ref_counts = (
        ref_df.filter(F.col(value_col).isNotNull())
        .groupBy(psi_bucket(value_col, lo, hi, n_buckets)
                 .alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_a"))
    )
    arr = tiny_df(
        spark,
        [(i, n) for i, n in enumerate(state["counts"]) if n > 0],
        "bucket int, n_b long",
    )
    return psi_from_counts(ref_counts, arr, n_buckets)


def foreach_batch_ab_fold(stream: DataFrame, user_col: str,
                          cents_expr, state: dict) -> "object":
    """writeStream.foreachBatch sink folding a live experiment
    dashboard: per-arm EVENT counts and revenue cents — the metrics
    that merge by addition, so the fold is exact and order-free.

    Per-USER metrics (conversion = 'ever purchased') deliberately do
    NOT stream here: they need per-user state that grows with the
    population — that is the batch readout's job (or a stateful
    operator with a user-keyed store). Event-level revenue is what
    live experiment dashboards actually fold. ``state``:
    {"acc": {0: [n, cents], 1: [n, cents]}, "seen": set} — four
    integers, epoch-guarded."""
    from ..operators.experiment import _arm
    from .incremental import epoch_already_applied, epoch_mark_applied

    state.setdefault("acc", {0: [0, 0], 1: [0, 0]})

    def batch_fn(bdf: DataFrame, epoch_id: int) -> None:
        if epoch_already_applied(state, epoch_id):
            return
        rows = bdf.groupBy(_arm(user_col).alias("_a")).agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(cents_expr), F.lit(0)).alias("cents"),
        ).collect()
        for r in rows:
            acc = state["acc"][int(r["_a"])]
            acc[0] += int(r["n"])
            acc[1] += int(r["cents"])
        epoch_mark_applied(state, epoch_id)

    return stream.writeStream.foreachBatch(batch_fn)


def ab_monitor_card(state: dict):
    """Drain the folded per-arm totals to the dashboard row:
    (n_a, n_b, cents_a, cents_b, rev_per_event_a_fp,
    rev_per_event_b_fp, lift_fp) with the batch suite's integer
    discipline — floor(1e6 * cents / n) per arm, fp6 of the
    canonical-order per-event revenue delta."""
    import math

    (na, ca), (nb, cb) = state["acc"][0], state["acc"][1]
    rpe = lambda c, n: int(math.floor(_MIL * c / n)) if n else None
    lift = None
    if na and nb:
        # single rounding (exactlog discipline): Python's round() is
        # HALF_EVEN — a third convention neither engine uses
        lift = int(math.floor(
            (cb / nb - ca / na) * 1_000_000.0 + 0.5))
    return [(na, nb, ca, cb, rpe(ca, na), rpe(cb, nb), lift)]


def foreach_batch_freshness_fold(stream: DataFrame, dim_col: str,
                                 ts_col: str, state: dict) -> "object":
    """writeStream.foreachBatch sink folding per-slice feed freshness.

    Per micro-batch: ONE hash aggregate to (count, max epoch-micros)
    per slice, folded into bounded driver state — (sum, max) both
    merge order-free, so the drained report is bit-identical to the
    batch ``dataquality.freshness`` over the union of every arrival
    (the oracle the driver gate replays). This is the monitor that
    notices a feed STOPPING: a slice whose max stops advancing while
    the global max moves drifts into staleness trigger by trigger.
    ``state``: {"acc": {slice: [n, max_us]}, "seen": set} — two
    numbers per slice, bounded regardless of stream length.
    Epoch-guarded against at-least-once redelivery."""
    from .incremental import epoch_already_applied, epoch_mark_applied

    state.setdefault("acc", {})

    def batch_fn(bdf: DataFrame, epoch_id: int) -> None:
        if epoch_already_applied(state, epoch_id):
            return
        rows = (
            bdf.groupBy(dim_col)
            .agg(
                F.count(F.lit(1)).alias("_n"),
                F.max(
                    F.unix_micros(F.col(ts_col).cast("timestamp"))
                ).alias("_mx"),
            )
            .collect()  # bounded: one row per slice value
        )
        for r in rows:
            acc = state["acc"].setdefault(r[0], [0, None])
            acc[0] += r["_n"]
            acc[1] = (
                r["_mx"] if acc[1] is None else max(acc[1], r["_mx"])
            )
        epoch_mark_applied(state, epoch_id)

    return stream.writeStream.foreachBatch(batch_fn)


def freshness_report_rows(state: dict, max_lag_s: int = 600):
    """Drain the freshness fold into (slice, n, lag_s, stale) rows —
    the same integer arithmetic as the batch operator: whole-second
    lag behind the freshest slice via exact integer floor-division of
    the epoch-micros DIFFERENCE (timezone offsets cancel)."""
    acc = state.get("acc", {})
    if not acc:
        return []
    g = max(v[1] for v in acc.values())
    return [
        (k, v[0], (g - v[1]) // 1_000_000,
         (g - v[1]) // 1_000_000 > max_lag_s)
        for k, v in acc.items()
    ]


def foreach_batch_key_count_fold(stream: DataFrame, key_expr,
                                 state: dict) -> "object":
    """writeStream.foreachBatch sink folding per-key row counts —
    the mergeable primitive under any ONLINE control chart whose
    statistic derives from per-key totals (CUSUM, MAD, seasonal):
    counts merge by addition across micro-batches, so the drained
    per-key series is bit-identical to a one-shot batch aggregate
    over the union of every arrival, and any downstream chart
    operator applied at drain time is exact-online by construction.

    ``key_expr`` is a Column (e.g. ``F.dayofmonth("ts")``); state is
    {"acc": {key: n}, "seen": set} — one integer per key, bounded by
    the key domain regardless of stream length. Epoch-guarded."""
    from .incremental import epoch_already_applied, epoch_mark_applied

    state.setdefault("acc", {})

    def batch_fn(bdf: DataFrame, epoch_id: int) -> None:
        if epoch_already_applied(state, epoch_id):
            return
        rows = (
            bdf.groupBy(key_expr.alias("_k"))
            .agg(F.count(F.lit(1)).alias("_n"))
            .collect()  # bounded: one row per key value
        )
        for r in rows:
            state["acc"][r["_k"]] = (
                state["acc"].get(r["_k"], 0) + r["_n"]
            )
        epoch_mark_applied(state, epoch_id)

    return stream.writeStream.foreachBatch(batch_fn)


def key_count_rows(state: dict):
    """Drain the key-count fold as (key, n) tuples."""
    return [(k, v) for k, v in state.get("acc", {}).items()]
