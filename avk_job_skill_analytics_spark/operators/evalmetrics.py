"""Classifier evaluation over a scored relation: rank-based AUC,
confusion/precision/recall/F1, and calibration bins.

The quality-classifier gate (operators/classify.py, the fastText-
style curation discipline) is only trustworthy with an evaluation
ledger next to it — these are the three reports a corpus-curation
deployment runs after every retrain, computed distributively and in
exact integer arithmetic so they replay bit-for-bit in the oracle:

- **AUC** via the Mann-Whitney U rank statistic with the standard
  tie correction: group once by distinct score, one window over the
  |distinct scores| relation (scores, not rows) for the cumulative
  negative count, then U = sum over score groups of
  ``pos * neg_below + pos * neg_tied / 2``. Doubling both sides
  keeps every term integral: ``2U = sum pos*(2*neg_below +
  neg_tied)``, and ``auc_fp = floor(1e6 * 2U / (2 * n1 * n0))``.
- **Precision / recall / F1** from the confusion counts, each a
  single exact integer division (F1 uses the identity
  ``F1 = 2tp / (2tp + fp + fn)`` — one division, no compounding).
- **Calibration bins**: equal-count score deciles from the
  deterministic (score, id) total order, per-bin positive rate in
  fixed point. The global rank DECOMPOSES — a per-score-group
  row_number (partitioned window, bounded by the largest tie group)
  plus the cumulative count of strictly-lower score groups (the same
  granularity-bounded distinct-score window AUC uses) — so no
  corpus-sized single-partition sort appears anywhere in the plan,
  yet the result is bit-identical to a naive global row_number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .exactlog import fp6_floor

__all__ = ["binary_metrics", "calibration_bins", "pr_curve",
           "best_threshold", "grouped_binary_metrics", "lift_table",
           "roc_points"]


def binary_metrics(scored: DataFrame, score_col: str,
                   pred_col: str, label_col: str) -> DataFrame:
    """One-row evaluation card: (n, n_pos, tp, fp, fn, tn, auc_fp,
    prec_fp, rec_fp, f1_fp), all *_fp in 1e-6 fixed point.

    The rank statistic aggregates per DISTINCT score first, so the
    only window runs over score groups (bounded by score
    granularity), never the scored corpus."""
    by_score = scored.groupBy(
        F.col(score_col).alias("_s")
    ).agg(
        F.sum(F.col(label_col)).alias("_pos"),
        F.sum(F.lit(1) - F.col(label_col)).alias("_neg"),
    )
    w = (
        Window.orderBy(F.asc("_s"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    u2 = by_score.select(
        (
            F.col("_pos")
            * (F.lit(2) * F.coalesce(F.sum("_neg").over(w), F.lit(0))
               + F.col("_neg"))
        ).alias("_u2"),
        "_pos",
        "_neg",
    ).agg(
        F.sum("_u2").alias("_u2"),
        F.sum("_pos").alias("_n1"),
        F.sum("_neg").alias("_n0"),
    )

    conf = scored.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(
            (F.col(pred_col) * F.col(label_col)).cast("long")
        ).alias("_tp"),
        F.sum(
            (F.col(pred_col) * (F.lit(1) - F.col(label_col)))
            .cast("long")
        ).alias("_fp"),
        F.sum(
            ((F.lit(1) - F.col(pred_col)) * F.col(label_col))
            .cast("long")
        ).alias("_fn"),
        F.sum(
            ((F.lit(1) - F.col(pred_col))
             * (F.lit(1) - F.col(label_col))).cast("long")
        ).alias("_tn"),
    )

    mil = F.lit(1_000_000)
    # the same degenerate-input guards as the grouped twin:
    # single-class input or an empty predicted-positive set yields
    # NULL for the undefined ratio instead of a division blow-up
    both = (F.col("_n1") > 0) & (F.col("_n0") > 0)
    return conf.crossJoin(F.broadcast(u2)).select(
        F.col("_n").cast("long").alias("n"),
        F.col("_n1").cast("long").alias("n_pos"),
        F.col("_tp").alias("tp"),
        F.col("_fp").alias("fp"),
        F.col("_fn").alias("fn"),
        F.col("_tn").alias("tn"),
        F.when(
            both,
            F.floor(mil * F.col("_u2")
                    / (F.lit(2) * F.col("_n1") * F.col("_n0"))),
        ).cast("long").alias("auc_fp"),
        F.when(
            F.col("_tp") + F.col("_fp") > 0,
            F.floor(mil * F.col("_tp")
                    / (F.col("_tp") + F.col("_fp"))),
        ).cast("long").alias("prec_fp"),
        F.when(
            F.col("_n1") > 0,
            F.floor(mil * F.col("_tp")
                    / (F.col("_tp") + F.col("_fn"))),
        ).cast("long").alias("rec_fp"),
        F.when(
            F.lit(2) * F.col("_tp") + F.col("_fp") + F.col("_fn") > 0,
            F.floor(mil * F.lit(2) * F.col("_tp")
                    / (F.lit(2) * F.col("_tp") + F.col("_fp")
                       + F.col("_fn"))),
        ).cast("long").alias("f1_fp"),
    )


def calibration_bins(scored: DataFrame, id_col: str, score_col: str,
                     label_col: str, n_bins: int = 10) -> DataFrame:
    """Equal-count calibration bins: (bin, n, n_pos, rate_fp,
    sum_score_fp). bin = floor((rank-1) * n_bins / n) over the
    deterministic (score, id) order — both engines place ties
    identically, so the bins replay exactly.

    The rank is built scalably: within-score-group offset from a
    window PARTITIONED by score (bounded by the largest tie group)
    plus the cumulative size of strictly-lower score groups (window
    over the distinct-score relation) — equivalent to a global
    row_number over (score, id) without the single-partition sort."""
    grp = scored.groupBy(F.col(score_col).alias("_s")).agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    wg = (
        Window.orderBy(F.asc("_s"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    starts = grp.select(
        "_s",
        F.coalesce(F.sum("_cnt").over(wg), F.lit(0)).alias("_start"),
    )
    wi = Window.partitionBy(score_col).orderBy(F.asc(id_col))
    n_total = scored.agg(F.count(F.lit(1)).alias("_nt"))
    binned = (
        scored.withColumn("_off", F.row_number().over(wi))
        .join(starts, on=F.col(score_col) == F.col("_s"))
        .crossJoin(F.broadcast(n_total))
        .withColumn(
            "bin",
            F.floor(
                (F.col("_start") + F.col("_off") - 1)
                * F.lit(n_bins) / F.col("_nt")
            ).cast("long"),
        )
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col(label_col)).cast("long").alias("n_pos"),
            F.floor(
                F.lit(1_000_000) * F.sum(F.col(label_col))
                / F.count(F.lit(1))
            ).cast("long").alias("rate_fp"),
            F.sum(F.col(score_col)).cast("long").alias("sum_score_fp"),
        )
    )


def pr_curve(scored: DataFrame, score_col: str,
             label_col: str) -> DataFrame:
    """The precision-recall curve over every candidate gate
    threshold: one row per DISTINCT score, with the confusion a
    ``score >= threshold`` gate would produce — cumulative positives
    and negatives from a single window over the distinct-score
    relation (granularity-bounded, the corpus never enters a window).
    Returns (thr, tp, fp, prec_fp, rec_fp, f1_fp)."""
    by_score = scored.groupBy(
        F.col(score_col).alias("thr")
    ).agg(
        F.sum(F.col(label_col)).alias("_pos"),
        F.sum(F.lit(1) - F.col(label_col)).alias("_neg"),
    )
    w = (
        Window.orderBy(F.desc("thr"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    totals = scored.agg(
        F.sum(F.col(label_col)).alias("_n1")
    )
    mil = F.lit(1_000_000)
    cum = (
        by_score.withColumn("tp", F.sum("_pos").over(w))
        .withColumn("fp", F.sum("_neg").over(w))
        .crossJoin(F.broadcast(totals))
    )
    return cum.select(
        F.col("thr").cast("long").alias("thr"),
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.floor(mil * F.col("tp") / (F.col("tp") + F.col("fp")))
        .cast("long").alias("prec_fp"),
        F.when(
            F.col("_n1") > 0,
            F.floor(mil * F.col("tp") / F.col("_n1")),
        ).cast("long").alias("rec_fp"),
        # 2tp + fp + fn = tp + fp + n1 — one exact division
        F.floor(
            mil * F.lit(2) * F.col("tp")
            / (F.col("tp") + F.col("fp") + F.col("_n1"))
        ).cast("long").alias("f1_fp"),
    )


def best_threshold(scored: DataFrame, score_col: str,
                   label_col: str) -> DataFrame:
    """The gate threshold maximizing F1 on the PR curve — ties break
    toward the HIGHER threshold (the stricter gate). One bounded
    top-1 over the distinct-score curve; the operational answer to
    "where do I set the quality gate after this retrain"."""
    curve = pr_curve(scored, score_col, label_col)
    w = Window.orderBy(F.desc("f1_fp"), F.desc("thr"))
    return (
        curve.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("thr", "tp", "fp", "prec_fp", "rec_fp", "f1_fp")
    )


def grouped_binary_metrics(scored: DataFrame, group_col: str,
                           score_col: str, pred_col: str,
                           label_col: str) -> DataFrame:
    """The evaluation card PER GROUP (source, language, fold): one
    row per group with the same tie-corrected AUC and confusion
    ratios as :func:`binary_metrics`, every window PARTITIONED by the
    group — the per-source gate report a curation deployment reads to
    catch a classifier that is great on average and broken on one
    slice. Degenerate groups (single-class, or an empty predicted
    positive set) yield NULL for the undefined ratios instead of a
    division blow-up."""
    by_score = scored.groupBy(
        F.col(group_col).alias("grp"),
        F.col(score_col).alias("_s"),
    ).agg(
        F.sum(F.col(label_col)).alias("_pos"),
        F.sum(F.lit(1) - F.col(label_col)).alias("_neg"),
    )
    w = (
        Window.partitionBy("grp").orderBy(F.asc("_s"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    u2 = by_score.select(
        "grp",
        (
            F.col("_pos")
            * (F.lit(2) * F.coalesce(F.sum("_neg").over(w), F.lit(0))
               + F.col("_neg"))
        ).alias("_u2"),
    ).groupBy("grp").agg(F.sum("_u2").alias("_u2"))

    conf = scored.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col(label_col)).alias("_n1"),
        F.sum(F.lit(1) - F.col(label_col)).alias("_n0"),
        F.sum((F.col(pred_col) * F.col(label_col)).cast("long"))
        .alias("_tp"),
        F.sum((F.col(pred_col) * (F.lit(1) - F.col(label_col)))
              .cast("long")).alias("_fp"),
        F.sum(((F.lit(1) - F.col(pred_col)) * F.col(label_col))
              .cast("long")).alias("_fn"),
        F.sum(((F.lit(1) - F.col(pred_col))
               * (F.lit(1) - F.col(label_col))).cast("long"))
        .alias("_tn"),
    )

    mil = F.lit(1_000_000)
    both = (F.col("_n1") > 0) & (F.col("_n0") > 0)
    return conf.join(u2, "grp").select(
        F.col("grp").alias(group_col),
        F.col("_n").cast("long").alias("n"),
        F.col("_n1").cast("long").alias("n_pos"),
        F.col("_tp").alias("tp"),
        F.col("_fp").alias("fp"),
        F.col("_fn").alias("fn"),
        F.col("_tn").alias("tn"),
        F.when(
            both,
            F.floor(mil * F.col("_u2")
                    / (F.lit(2) * F.col("_n1") * F.col("_n0"))),
        ).cast("long").alias("auc_fp"),
        F.when(
            F.col("_tp") + F.col("_fp") > 0,
            F.floor(mil * F.col("_tp")
                    / (F.col("_tp") + F.col("_fp"))),
        ).cast("long").alias("prec_fp"),
        F.when(
            F.col("_n1") > 0,
            F.floor(mil * F.col("_tp")
                    / (F.col("_tp") + F.col("_fn"))),
        ).cast("long").alias("rec_fp"),
        F.when(
            F.lit(2) * F.col("_tp") + F.col("_fp") + F.col("_fn") > 0,
            F.floor(mil * F.lit(2) * F.col("_tp")
                    / (F.lit(2) * F.col("_tp") + F.col("_fp")
                       + F.col("_fn"))),
        ).cast("long").alias("f1_fp"),
    )


def cohen_kappa(df: "DataFrame", a_col: str, b_col: str) -> "DataFrame":
    """Inter-annotator agreement card (Cohen's kappa): (n, n_agree,
    po_fp, pe_fp, kappa_fp) — the QA gate a labeling pipeline runs
    before trusting a batch of human (or LLM-judge) labels.

    po = observed agreement; pe = chance agreement from the two
    annotators' marginals, with the cross-product sum accumulated as
    an exact decimal integer (sum over labels of n_a[l]*n_b[l]) so
    the only floats are three canonical-order divisions. kappa NULL
    when pe = 1 (both annotators constant — agreement is vacuous and
    the statistic is undefined). Cost: one grouped count per label
    pair (<= |labels|^2 cells), then 1-row arithmetic; rows with a
    NULL on either side are excluded (unlabeled != disagreement)."""
    labeled = df.filter(
        F.col(a_col).isNotNull() & F.col(b_col).isNotNull()
    )
    cells = labeled.groupBy(
        F.col(a_col).alias("_la"), F.col(b_col).alias("_lb")
    ).agg(F.count(F.lit(1)).alias("_c"))
    per_a = cells.groupBy("_la").agg(F.sum("_c").alias("_na"))
    per_b = cells.groupBy("_lb").agg(F.sum("_c").alias("_nb"))
    cross = per_a.join(
        per_b, per_a["_la"] == per_b["_lb"], "inner"
    ).agg(
        F.coalesce(
            F.sum((F.col("_na") * F.col("_nb"))
                  .cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("_s")
    )
    tot = cells.agg(
        F.sum("_c").alias("_n"),
        F.coalesce(
            F.sum(F.when(F.col("_la") == F.col("_lb"), F.col("_c"))),
            F.lit(0),
        ).alias("_agree"),
    )
    d = "double"
    po = F.col("_agree").cast(d) / F.col("_n")
    pe = F.col("_s").cast(d) / (F.col("_n").cast(d) * F.col("_n"))
    fp6 = fp6_floor  # single-rounding half-up (exactlog, round 10)
    return tot.crossJoin(F.broadcast(cross)).select(
        F.col("_n").cast("long").alias("n"),
        F.col("_agree").cast("long").alias("n_agree"),
        fp6(po).alias("po_fp"),
        fp6(pe).alias("pe_fp"),
        F.when(pe < F.lit(1.0), fp6((po - pe) / (F.lit(1.0) - pe)))
        .alias("kappa_fp"),
    )


def lift_table(scored: DataFrame, id_col: str, score_col: str,
               label_col: str, n_bins: int = 10) -> DataFrame:
    """Decile gains/lift table — the campaign-targeting readout: rank
    by score DESC, cut into ``n_bins`` equal-count bins (bin 0 = the
    top-scored decile), and report per bin the size, positives, the
    CUMULATIVE counts, the cumulative capture rate (share of all
    positives reached so far) and the cumulative lift (capture rate
    over population share). A useful scorer shows lift >> 1e6 (fp6
    for 1.0) in bin 0 decaying toward 1e6 by the last bin.

    Rank determinism and scale follow ``calibration_bins``: the
    global (score DESC, id ASC) rank decomposes into a
    per-score-group window plus the cumulative size of strictly
    HIGHER score groups — no corpus-sized single-partition sort.
    capture_fp and the population-share denominator are fp6 integers
    on exact counts; lift_fp is the fp6 ratio of those two ROUNDED
    fp6 values (the repo's compare-the-rounded-features discipline),
    so every engine reproduces identical rows. The cumulative window
    at the end runs over n_bins rows — bounded post-aggregate
    state."""
    grp = scored.groupBy(F.col(score_col).alias("_s")).agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    wg = (
        Window.orderBy(F.desc("_s"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    starts = grp.select(
        "_s",
        F.coalesce(F.sum("_cnt").over(wg), F.lit(0)).alias("_start"),
    )
    wi = Window.partitionBy(score_col).orderBy(F.asc(id_col))
    tot = scored.agg(
        F.count(F.lit(1)).alias("_ntot"),
        F.sum(label_col).cast("long").alias("_ptot"),
    )
    binned = (
        scored.withColumn("_off", F.row_number().over(wi))
        .join(starts, on=F.col(score_col) == F.col("_s"))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "bin",
            F.floor(
                (F.col("_start") + F.col("_off") - 1)
                * F.lit(n_bins) / F.col("_ntot")
            ).cast("long"),
        )
    )
    per = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(label_col).cast("long").alias("n_pos"),
        F.first("_ntot").alias("_ntot"),
        F.first("_ptot").alias("_ptot"),
    )
    wc = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = per.select(
        "bin",
        "n",
        "n_pos",
        F.sum("n").over(wc).cast("long").alias("cum_n"),
        F.sum("n_pos").over(wc).cast("long").alias("cum_pos"),
        "_ntot",
        "_ptot",
    )
    # NULL-for-undefined (ADVICE r9): with zero positives the capture
    # ratio does not exist — pinning it to 0 made 'no positives to
    # capture' indistinguishable from 'scorer captured nothing',
    # unlike every other undefined ratio in this module
    capture = F.when(
        F.col("_ptot") > 0,
        F.floor(
            F.lit(1_000_000) * F.col("cum_pos") / F.col("_ptot")
        ),
    ).cast("long")
    share = F.floor(
        F.lit(1_000_000) * F.col("cum_n") / F.col("_ntot")
    ).cast("long")
    return cum.select(
        "bin",
        "n",
        "n_pos",
        "cum_n",
        "cum_pos",
        capture.alias("capture_fp"),
        F.floor(F.lit(1_000_000) * capture / share)
        .cast("long")
        .alias("lift_fp"),
    )


def roc_points(scored: DataFrame, score_col: str,
               label_col: str) -> DataFrame:
    """The ROC curve over every candidate gate threshold — pr_curve's
    twin in (FPR, TPR) space, the view that stays readable under
    class imbalance shifts (precision moves with prevalence, the ROC
    does not). One row per DISTINCT score with the confusion a
    ``score >= threshold`` gate would produce; same
    granularity-bounded distinct-score window as pr_curve, the corpus
    never enters a window. Degenerate single-class inputs yield NULL
    for the undefined rate instead of dividing by zero. Returns
    (thr, tp, fp, tpr_fp, fpr_fp, youden_fp) — youden = tpr − fpr,
    the threshold-picker's balanced-accuracy criterion, computed on
    the ROUNDED fp6 rates."""
    by_score = scored.groupBy(
        F.col(score_col).alias("thr")
    ).agg(
        F.sum(F.col(label_col)).alias("_pos"),
        F.sum(F.lit(1) - F.col(label_col)).alias("_neg"),
    )
    w = (
        Window.orderBy(F.desc("thr"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    totals = scored.agg(
        F.sum(F.col(label_col)).alias("_n1"),
        F.sum(F.lit(1) - F.col(label_col)).alias("_n0"),
    )
    mil = F.lit(1_000_000)
    cum = (
        by_score.withColumn("tp", F.sum("_pos").over(w))
        .withColumn("fp", F.sum("_neg").over(w))
        .crossJoin(F.broadcast(totals))
    )
    tpr = F.when(
        F.col("_n1") > 0, F.floor(mil * F.col("tp") / F.col("_n1"))
    ).cast("long")
    fpr = F.when(
        F.col("_n0") > 0, F.floor(mil * F.col("fp") / F.col("_n0"))
    ).cast("long")
    return cum.select(
        F.col("thr").cast("long").alias("thr"),
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        tpr.alias("tpr_fp"),
        fpr.alias("fpr_fp"),
        (tpr - fpr).alias("youden_fp"),
    )
