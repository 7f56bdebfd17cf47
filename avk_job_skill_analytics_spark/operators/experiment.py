"""Experimentation (A/B testing) family — the analysis-side
companion of the engine's hash-based assignment primitives
(``sampling.assign_split``).

A deployed curation/product change is judged by these cards: the
conversion readout with a pooled two-proportion z
(``ab_test_readout``), the sample-ratio-mismatch guard that must
pass before anyone reads a lift (``srm_check``), CUPED
variance-reduced lift from integer sufficient statistics
(``cuped_readout``), a deterministic Poisson-bootstrap CI
(``bootstrap_lift_ci``), and the per-segment readout with
post-stratified pooling (``stratified_readout`` — the
Simpson's-paradox guard). Users are deterministically assigned by
the engine-portable Knuth-hash coin (no assignment table to store or
join — the user id IS the assignment).

Shared discipline: every data-sized reduction is an EXACT integer
(counts, cents sums, decimal second moments, chi-square numerators,
hash-derived bootstrap weights) — map-side combined and order-free —
while the statistics themselves are a handful of float ops over a
few integers in one canonical operand order, so every card replays
bit-for-bit in the SQL oracle. The corpus is touched once per card.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .exactlog import fp6_floor

__all__ = [
    "ab_test_readout",
    "srm_check",
    "cuped_readout",
    "bootstrap_lift_ci",
    "stratified_readout",
    "welch_t_readout",
    "ratio_delta_readout",
    "quantile_lift",
    "mde_card",
    "POISSON1_THRESHOLDS",
]


def ab_test_readout(events: DataFrame, user_col: str,
                    conv_expr) -> DataFrame:
    """One-row experiment card: (n_a, n_b, conv_a, conv_b,
    rate_a_fp, rate_b_fp, lift_fp, z_fp).

    Arm = Knuth multiplicative hash of the user id mod 2 (the
    engine-portable coin shared with o4_sample_hash); conversion =
    the user emitted >= 1 event satisfying the boolean Column
    ``conv_expr``; z is the pooled two-proportion statistic with
    every double op in one canonical order (NULL when the pooled
    rate is degenerate — 0% or 100% convert, zero standard error).
    1e-6 fixed point throughout."""
    converted = events.groupBy(F.col(user_col)).agg(
        F.max(conv_expr.cast("int")).alias("_c")
    )
    arm = _arm(user_col)
    per_arm = converted.withColumn("_arm", arm).groupBy("_arm").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_c").alias("_cv"),
    )
    a = per_arm.filter(F.col("_arm") == 0).select(
        F.col("_n").alias("_na"), F.col("_cv").alias("_ca")
    )
    b = per_arm.filter(F.col("_arm") == 1).select(
        F.col("_n").alias("_nb"), F.col("_cv").alias("_cb")
    )
    d = "double"
    pa = F.col("_ca").cast(d) / F.col("_na")
    pb = F.col("_cb").cast(d) / F.col("_nb")
    p = (F.col("_ca") + F.col("_cb")).cast(d) \
        / (F.col("_na") + F.col("_nb"))
    se = F.sqrt(
        p * (F.lit(1.0) - p)
        * (F.lit(1.0) / F.col("_na") + F.lit(1.0) / F.col("_nb"))
    )
    mil = F.lit(1_000_000)
    fp6 = fp6_floor  # single-rounding half-up (exactlog, round 10)
    return a.crossJoin(F.broadcast(b)).select(
        F.col("_na").cast("long").alias("n_a"),
        F.col("_nb").cast("long").alias("n_b"),
        F.col("_ca").cast("long").alias("conv_a"),
        F.col("_cb").cast("long").alias("conv_b"),
        F.floor(mil * F.col("_ca") / F.col("_na")).cast("long")
        .alias("rate_a_fp"),
        F.floor(mil * F.col("_cb") / F.col("_nb")).cast("long")
        .alias("rate_b_fp"),
        fp6(pb - pa).alias("lift_fp"),
        F.when(se > F.lit(0.0), fp6((pb - pa) / se)).alias("z_fp"),
    )


def _arm(user_col: str):
    """The engine-portable Knuth-hash coin: arm = the TOP bit of the
    multiplicative hash (hashing.knuth_bucket(id, 2)). The low bit
    would be exactly id parity (K is odd) — a zero-mixing split that
    confounds with any parity-structured id allocation and that
    srm_check can't detect (parity splits are perfectly balanced)."""
    from .hashing import knuth_bucket

    return knuth_bucket(F.col(user_col), 2)


def srm_check(events: DataFrame, user_col: str) -> DataFrame:
    """Sample-ratio-mismatch card for a 50/50 split: (n_a, n_b,
    chi2_fp, srm_suspect).

    For expected equal arms the 1-dof chi-square collapses
    algebraically to (n_a - n_b)^2 / N — an exact integer numerator,
    so the only float op is one division and the statistic replays
    anywhere. srm_suspect fires above the 0.1% critical value
    (10.828): an experiment whose assignment is broken must be
    thrown away before anyone reads its lift card."""
    per_user = events.select(F.col(user_col)).distinct()
    card = per_user.agg(
        F.sum(F.when(_arm(user_col) == 0, 1).otherwise(0))
        .alias("_na"),
        F.sum(F.when(_arm(user_col) == 1, 1).otherwise(0))
        .alias("_nb"),
    )
    na, nb = F.col("_na"), F.col("_nb")
    n = na + nb
    # exact decimal product (1e6 * d^2 wraps a long once the arm gap
    # passes ~3e6 users), then the same double division as the oracle
    chi2_fp = F.when(
        n > 0,
        F.floor(
            (F.lit(1_000_000).cast("decimal(38,0)")
             * (na - nb) * (na - nb)).cast("double") / n
        ),
    ).cast("long")
    return card.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        chi2_fp.alias("chi2_fp"),
        (chi2_fp > F.lit(10_828_000)).alias("srm_suspect"),
    )


def cuped_readout(events: DataFrame, user_col: str, pre_expr,
                  metric_cents) -> DataFrame:
    """CUPED variance-reduced experiment card (Deng et al., WSDM'13):
    (n_a, n_b, theta_fp, lift_raw_fp, lift_cuped_fp, rho2_fp).

    Per user: covariate X = count of pre-period events (rows where
    ``pre_expr`` holds) and outcome Y = integer-cents sum of
    ``metric_cents`` over the rest. theta = cov(X,Y)/var(X) over the
    pooled population; the adjusted per-arm mean is
    mean(Y) - theta * (mean(X) - mean(X)_pooled), and rho^2 =
    cov^2 / (var(X) var(Y)) is the fraction of outcome variance the
    covariate removes.

    Scale story: everything data-sized reduces to INTEGER sufficient
    statistics — n, sum X, sum Y, sum X^2, sum XY, sum Y^2 per arm —
    one map-side-combined pass whose sums are exact and therefore
    independent of partition order; theta and the card are a handful
    of float ops over 6 integers in one canonical order, so the
    result hash-replays. NULL theta/lift when var(X) is degenerate."""
    per_user = events.groupBy(F.col(user_col)).agg(
        F.sum(pre_expr.cast("long")).alias("_x"),
        F.coalesce(
            F.sum(F.when(~pre_expr, metric_cents)), F.lit(0)
        ).cast("long").alias("_y"),
    )
    moments = per_user.withColumn("_arm", _arm(user_col)).groupBy().agg(
        *[
            agg.alias(name)
            for arm in (0, 1)
            for name, agg in (
                (f"n{arm}", F.sum(F.when(F.col("_arm") == arm, 1)
                                  .otherwise(0))),
                (f"sx{arm}", F.sum(F.when(F.col("_arm") == arm,
                                          F.col("_x")).otherwise(0))),
                (f"sy{arm}", F.sum(F.when(F.col("_arm") == arm,
                                          F.col("_y")).otherwise(0))),
                # second moments in decimal(38,0): per-user products
                # fit a long, but their corpus-wide sums must not
                # wrap at 1e9 users (DuckDB's HUGEINT twin is exact
                # the same way — both engines see the same integer)
                (f"sxx{arm}", F.sum(F.when(F.col("_arm") == arm,
                                           F.col("_x") * F.col("_x"))
                                    .otherwise(0)
                                    .cast("decimal(38,0)"))),
                (f"sxy{arm}", F.sum(F.when(F.col("_arm") == arm,
                                           F.col("_x") * F.col("_y"))
                                    .otherwise(0)
                                    .cast("decimal(38,0)"))),
                (f"syy{arm}", F.sum(F.when(F.col("_arm") == arm,
                                           F.col("_y") * F.col("_y"))
                                    .otherwise(0)
                                    .cast("decimal(38,0)"))),
            )
        ]
    )
    d = "double"
    n = (F.col("n0") + F.col("n1")).cast(d)
    sx = (F.col("sx0") + F.col("sx1")).cast(d)
    sy = (F.col("sy0") + F.col("sy1")).cast(d)
    sxx = (F.col("sxx0") + F.col("sxx1")).cast(d)
    sxy = (F.col("sxy0") + F.col("sxy1")).cast(d)
    syy = (F.col("syy0") + F.col("syy1")).cast(d)
    # pooled (co)variances scaled by n^2: integer-derived, one order
    var_x = sxx * n - sx * sx
    var_y = syy * n - sy * sy
    cov = sxy * n - sx * sy
    theta = cov / var_x
    mx_pool = sx / n
    mean_y = lambda a: F.col(f"sy{a}").cast(d) / F.col(f"n{a}")  # noqa: E731
    mean_x = lambda a: F.col(f"sx{a}").cast(d) / F.col(f"n{a}")  # noqa: E731
    adj = lambda a: mean_y(a) - theta * (mean_x(a) - mx_pool)  # noqa: E731
    fp6 = fp6_floor  # single-rounding half-up (exactlog, round 10)
    ok = (F.col("n0") > 0) & (F.col("n1") > 0) & (var_x > F.lit(0.0))
    return moments.select(
        F.col("n0").cast("long").alias("n_a"),
        F.col("n1").cast("long").alias("n_b"),
        F.when(ok, fp6(theta)).alias("theta_fp"),
        F.when(
            (F.col("n0") > 0) & (F.col("n1") > 0),
            fp6(mean_y(1) - mean_y(0)),
        ).alias("lift_raw_fp"),
        F.when(ok, fp6(adj(1) - adj(0))).alias("lift_cuped_fp"),
        F.when(
            ok & (var_y > F.lit(0.0)),
            fp6(cov * cov / (var_x * var_y)),
        ).alias("rho2_fp"),
    )


# Poisson(1) CDF thresholds scaled to 2^60 — exact integer constants
# shared verbatim with the oracle SQL, so the bootstrap weights are
# the same on every engine. Tail capped at 5 (P > 5 is 6e-4; the cap
# is part of the estimator's definition here, not an approximation
# bug — both engines apply it identically).
POISSON1_THRESHOLDS = (
    424136118829305344,     # P(X <= 0)
    848272237658610688,     # P(X <= 1)
    1060340297073263360,    # P(X <= 2)
    1131029650211480960,    # P(X <= 3)
    1148701988496035328,    # P(X <= 4)
)


def _poisson1_weight(u):
    """Poisson(1) draw from a 60-bit uniform integer by inverse CDF —
    pure integer comparisons, engine-portable."""
    w = F.lit(5)
    for k in reversed(range(5)):
        w = F.when(u < F.lit(POISSON1_THRESHOLDS[k]), F.lit(k)) \
            .otherwise(w)
    return w


def bootstrap_lift_ci(events: DataFrame, user_col: str, metric_cents,
                      n_replicas: int = 40) -> DataFrame:
    """Poisson-bootstrap confidence interval for the per-user-mean
    lift (arm B − arm A) — THE distributed bootstrap (resampling by
    per-row independent Poisson(1) weights never materializes a
    resample), made deterministic: replica r's weight for a user is
    inverse-CDF'd from md5(user_id||'#'||r), so the whole CI replays
    bit-for-bit in the oracle.

    One pass builds per-user (arm, y-cents); a bounded explode (×
    ``n_replicas``, map-side combined straight into 2·n_replicas
    groups) accumulates integer weighted sums; each replica's lift is
    one canonical-order float op; the CI is the 2.5%/97.5% order
    statistics of the n_replicas lifts (floor/ceil ranks). Returns
    1 row: (n_replicas, lift_point_fp, lift_lo_fp, lift_hi_fp)."""
    per_user = events.groupBy(F.col(user_col)).agg(
        F.coalesce(F.sum(metric_cents), F.lit(0)).cast("long")
        .alias("_y")
    ).withColumn("_arm", _arm(user_col))
    reps = per_user.select(
        "_arm", "_y", F.col(user_col).alias("_uid"),
        F.explode(F.array(*[F.lit(r) for r in range(n_replicas)]))
        .alias("_r"),
    )
    from .hashing import md5_long

    u = md5_long(
        F.concat(F.col("_uid").cast("string"), F.lit("#"),
                 F.col("_r").cast("string"))
    )
    w = _poisson1_weight(u)
    sums = reps.groupBy("_r", "_arm").agg(
        F.sum(w.cast("long")).alias("_n"),
        F.sum((w * F.col("_y")).cast("decimal(38,0)")).alias("_s"),
    )
    lift = (
        sums.groupBy("_r").agg(
            F.sum(F.when(F.col("_arm") == 0, F.col("_n"))).alias("na"),
            F.sum(F.when(F.col("_arm") == 0, F.col("_s"))).alias("sa"),
            F.sum(F.when(F.col("_arm") == 1, F.col("_n"))).alias("nb"),
            F.sum(F.when(F.col("_arm") == 1, F.col("_s"))).alias("sb"),
        )
        .filter((F.col("na") > 0) & (F.col("nb") > 0))
        .select(
            F.col("_r"),
            (F.col("sb").cast("double") / F.col("nb")
             - F.col("sa").cast("double") / F.col("na")).alias("_lift"),
        )
    )
    fp6 = fp6_floor  # single-rounding half-up (exactlog, round 10)
    # point estimate: the unweighted (all-weights-1) lift
    point = per_user.groupBy().agg(
        F.sum(F.when(F.col("_arm") == 0, 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("_arm") == 0, F.col("_y")).otherwise(0))
        .alias("sa"),
        F.sum(F.when(F.col("_arm") == 1, 1).otherwise(0)).alias("nb"),
        F.sum(F.when(F.col("_arm") == 1, F.col("_y")).otherwise(0))
        .alias("sb"),
    ).select(
        F.when(
            (F.col("na") > 0) & (F.col("nb") > 0),
            fp6(F.col("sb").cast("double") / F.col("nb")
                - F.col("sa").cast("double") / F.col("na")),
        ).alias("lift_point_fp")
    )
    # 2.5% / 97.5% order statistics over the sorted replica lifts
    # (type-1 empirical quantile: index ceil(q * B), 1-based)
    import math

    lo_rank = max(1, math.ceil(0.025 * n_replicas))
    hi_rank = min(n_replicas, math.ceil(0.975 * n_replicas))
    ci = lift.agg(
        F.count(F.lit(1)).cast("long").alias("n_replicas"),
        F.sort_array(F.collect_list(fp6(F.col("_lift"))))
        .alias("_sorted"),
    ).select(
        "n_replicas",
        F.element_at("_sorted", lo_rank).alias("lift_lo_fp"),
        F.element_at("_sorted", hi_rank).alias("lift_hi_fp"),
    )
    return ci.crossJoin(F.broadcast(point)).select(
        "n_replicas", "lift_point_fp", "lift_lo_fp", "lift_hi_fp"
    )


def stratified_readout(events: DataFrame, user_col: str, conv_expr,
                       strata: DataFrame, strata_key: str,
                       strata_col: str) -> DataFrame:
    """Per-stratum experiment readout + post-stratified pooled lift —
    the Simpson's-paradox guard: a lift that flips sign inside a
    segment is invisible on the pooled card, and a segment-skewed
    assignment fabricates pooled lift that no segment actually has.

    One row per stratum: (stratum, n_a, n_b, rate_a_fp, rate_b_fp,
    lift_fp, weight_fp) plus pooled_lift_fp repeated on every row —
    the population-weighted average of per-stratum lifts
    (post-stratification), summed as fixed-point INTEGERS of the
    per-stratum contributions so the headline replays regardless of
    partition order (the PSI report's discipline).

    Cost: one per-user aggregate, one broadcast join to the stratum
    dim, one |strata|x2 aggregate, 1-row broadcasts. Strata with a
    missing arm report NULL lift and are excluded from the pooled
    weight mass (their users can't estimate a contrast)."""
    converted = events.groupBy(F.col(user_col)).agg(
        F.max(conv_expr.cast("int")).alias("_c")
    )
    joined = converted.join(
        F.broadcast(strata.select(
            F.col(strata_key).alias(user_col),
            F.col(strata_col).alias("_stratum"),
        )),
        user_col, "inner",
    ).withColumn("_arm", _arm(user_col))
    per = joined.groupBy("_stratum").agg(
        F.sum(F.when(F.col("_arm") == 0, 1).otherwise(0)).alias("_na"),
        F.sum(F.when(F.col("_arm") == 0, F.col("_c")).otherwise(0))
        .alias("_ca"),
        F.sum(F.when(F.col("_arm") == 1, 1).otherwise(0)).alias("_nb"),
        F.sum(F.when(F.col("_arm") == 1, F.col("_c")).otherwise(0))
        .alias("_cb"),
    )
    d = "double"
    ok = (F.col("_na") > 0) & (F.col("_nb") > 0)
    lift = (F.col("_cb").cast(d) / F.col("_nb")
            - F.col("_ca").cast(d) / F.col("_na"))
    fp6 = fp6_floor  # single-rounding half-up (exactlog, round 10)
    # pooled weight mass counts only strata that CAN estimate a lift
    tot = per.filter(ok).agg(
        F.sum(F.col("_na") + F.col("_nb")).alias("_nw")
    )
    rows = per.crossJoin(F.broadcast(tot)).select(
        F.col("_stratum").alias("stratum"),
        F.col("_na").cast("long").alias("n_a"),
        F.col("_nb").cast("long").alias("n_b"),
        F.when(F.col("_na") > 0,
               F.floor(F.lit(1_000_000) * F.col("_ca") / F.col("_na"))
               .cast("long")).alias("rate_a_fp"),
        F.when(F.col("_nb") > 0,
               F.floor(F.lit(1_000_000) * F.col("_cb") / F.col("_nb"))
               .cast("long")).alias("rate_b_fp"),
        F.when(ok, fp6(lift)).alias("lift_fp"),
        F.when(ok, F.floor(
            F.lit(1_000_000) * (F.col("_na") + F.col("_nb"))
            / F.col("_nw")).cast("long")).alias("weight_fp"),
        F.when(ok, fp6(
            (F.col("_na") + F.col("_nb")).cast(d) / F.col("_nw") * lift
        )).otherwise(F.lit(0)).alias("_contrib_fp"),
    )
    pooled = rows.agg(
        F.sum("_contrib_fp").cast("long").alias("pooled_lift_fp")
    )
    return rows.crossJoin(F.broadcast(pooled)).select(
        "stratum", "n_a", "n_b", "rate_a_fp", "rate_b_fp",
        "lift_fp", "weight_fp", "pooled_lift_fp",
    )


def welch_t_readout(events: DataFrame, user_col: str,
                    metric_cents) -> DataFrame:
    """Welch's unequal-variance t for a continuous per-user metric —
    the mean-revenue companion of the proportion z card: (n_a, n_b,
    mean_a_fp, mean_b_fp, lift_fp, t_fp, df_fp).

    Per-arm sums of the integer-cents metric and its square are
    exact (decimal second moments, the CUPED discipline); the
    sample variances, Welch statistic, and Welch-Satterthwaite
    degrees of freedom are canonical-order float ops over six
    integers, so the card hash-replays. NULL t/df when either arm
    has < 2 users or both variances vanish."""
    per_user = events.groupBy(F.col(user_col)).agg(
        F.coalesce(F.sum(metric_cents), F.lit(0)).cast("long")
        .alias("_y")
    )
    m = per_user.withColumn("_arm", _arm(user_col)).groupBy().agg(
        *[
            agg.alias(name)
            for arm in (0, 1)
            for name, agg in (
                (f"n{arm}", F.sum(F.when(F.col("_arm") == arm, 1)
                                  .otherwise(0))),
                (f"s{arm}", F.sum(F.when(F.col("_arm") == arm,
                                         F.col("_y")).otherwise(0))),
                (f"q{arm}", F.sum(F.when(F.col("_arm") == arm,
                                         F.col("_y") * F.col("_y"))
                                  .otherwise(0)
                                  .cast("decimal(38,0)"))),
            )
        ]
    )
    d = "double"
    mean = lambda a: F.col(f"s{a}").cast(d) / F.col(f"n{a}")  # noqa: E731
    # unbiased sample variance from exact moments:
    # (n*q - s^2) / (n * (n-1))
    var = lambda a: (  # noqa: E731
        (F.col(f"q{a}").cast(d) * F.col(f"n{a}")
         - F.col(f"s{a}").cast(d) * F.col(f"s{a}"))
        / (F.col(f"n{a}").cast(d) * (F.col(f"n{a}") - F.lit(1)))
    )
    se2 = var(0) / F.col("n0") + var(1) / F.col("n1")
    t = (mean(1) - mean(0)) / F.sqrt(se2)
    dof = (se2 * se2) / (
        (var(0) / F.col("n0")) * (var(0) / F.col("n0"))
        / (F.col("n0") - F.lit(1))
        + (var(1) / F.col("n1")) * (var(1) / F.col("n1"))
        / (F.col("n1") - F.lit(1))
    )
    fp6 = fp6_floor  # single-rounding half-up (exactlog, round 10)
    ok = (F.col("n0") > 1) & (F.col("n1") > 1)
    return m.select(
        F.col("n0").cast("long").alias("n_a"),
        F.col("n1").cast("long").alias("n_b"),
        F.when(F.col("n0") > 0, fp6(mean(0))).alias("mean_a_fp"),
        F.when(F.col("n1") > 0, fp6(mean(1))).alias("mean_b_fp"),
        F.when((F.col("n0") > 0) & (F.col("n1") > 0),
               fp6(mean(1) - mean(0))).alias("lift_fp"),
        # nested when: ANSI mode evaluates a compound condition's
        # divisions eagerly, so the se2 > 0 test must sit INSIDE the
        # ok branch (CASE branches are lazy; & is not)
        F.when(ok, F.when(se2 > F.lit(0.0), fp6(t))).alias("t_fp"),
        F.when(ok, F.when(se2 > F.lit(0.0), fp6(dof)))
        .alias("df_fp"),
    )


def ratio_delta_readout(events: DataFrame, user_col: str,
                        num_cents, den_count) -> DataFrame:
    """Delta-method card for a RATIO metric (revenue per session,
    clicks per view — anything whose denominator varies per user):
    (n_a, n_b, ratio_a_fp, ratio_b_fp, lift_fp, z_fp).

    Ratio metrics break the naive per-user-mean t because the
    denominator is random too; the standard fix (Deng et al.,
    KDD'18) linearizes: for arm means N̄, D̄ the ratio r = ΣN/ΣD has
    Var(r) ≈ (var_n − 2r·cov + r²·var_d) / (n·D̄²), all of which
    reduce to the usual exact sufficient statistics — n, ΣN, ΣD,
    ΣN², ΣD², ΣND per arm (decimal second moments). z compares the
    two linearized ratios in one canonical float order; NULL when
    either arm's denominator total is 0 or the combined variance
    vanishes."""
    per_user = events.groupBy(F.col(user_col)).agg(
        F.coalesce(F.sum(num_cents), F.lit(0)).cast("long")
        .alias("_nu"),
        F.coalesce(F.sum(den_count), F.lit(0)).cast("long")
        .alias("_de"),
    )
    m = per_user.withColumn("_arm", _arm(user_col)).groupBy().agg(
        *[
            agg.alias(name)
            for arm in (0, 1)
            for name, agg in (
                (f"n{arm}", F.sum(F.when(F.col("_arm") == arm, 1)
                                  .otherwise(0))),
                (f"sn{arm}", F.sum(F.when(F.col("_arm") == arm,
                                          F.col("_nu")).otherwise(0))),
                (f"sd{arm}", F.sum(F.when(F.col("_arm") == arm,
                                          F.col("_de")).otherwise(0))),
                (f"qn{arm}", F.sum(F.when(F.col("_arm") == arm,
                                          F.col("_nu") * F.col("_nu"))
                                   .otherwise(0)
                                   .cast("decimal(38,0)"))),
                (f"qd{arm}", F.sum(F.when(F.col("_arm") == arm,
                                          F.col("_de") * F.col("_de"))
                                   .otherwise(0)
                                   .cast("decimal(38,0)"))),
                (f"qx{arm}", F.sum(F.when(F.col("_arm") == arm,
                                          F.col("_nu") * F.col("_de"))
                                   .otherwise(0)
                                   .cast("decimal(38,0)"))),
            )
        ]
    )
    d = "double"

    def stats(a):
        n = F.col(f"n{a}").cast(d)
        mn = F.col(f"sn{a}").cast(d) / n
        md = F.col(f"sd{a}").cast(d) / n
        vn = (F.col(f"qn{a}").cast(d) * n
              - F.col(f"sn{a}").cast(d) * F.col(f"sn{a}")) / (n * n)
        vd = (F.col(f"qd{a}").cast(d) * n
              - F.col(f"sd{a}").cast(d) * F.col(f"sd{a}")) / (n * n)
        cv = (F.col(f"qx{a}").cast(d) * n
              - F.col(f"sn{a}").cast(d) * F.col(f"sd{a}")) / (n * n)
        r = F.col(f"sn{a}").cast(d) / F.col(f"sd{a}")
        var_r = (vn - F.lit(2.0) * r * cv + r * r * vd) / (n * md * md)
        return r, var_r

    r0, v0 = stats(0)
    r1, v1 = stats(1)
    se2 = v0 + v1
    fp6 = fp6_floor  # single-rounding half-up (exactlog, round 10)
    ok = (F.col("sd0") > 0) & (F.col("sd1") > 0)
    return m.select(
        F.col("n0").cast("long").alias("n_a"),
        F.col("n1").cast("long").alias("n_b"),
        F.when(F.col("sd0") > 0, fp6(r0)).alias("ratio_a_fp"),
        F.when(F.col("sd1") > 0, fp6(r1)).alias("ratio_b_fp"),
        F.when(ok, fp6(r1 - r0)).alias("lift_fp"),
        # nested when: see welch_t_readout — the variance expression
        # divides by arm totals that are zero exactly when ok is False
        F.when(ok, F.when(se2 > F.lit(0.0),
                          fp6((r1 - r0) / F.sqrt(se2))))
        .alias("z_fp"),
    )


def quantile_lift(events: DataFrame, user_col: str, metric_cents,
                  quantiles=(0.5, 0.9, 0.99)) -> DataFrame:
    """Quantile treatment effects: per-arm EXACT interpolated
    percentiles of the per-user metric and their differences — the
    right lens for heavy-tailed outcomes, where a mean lift can be
    one whale and the median never moved.

    One row per quantile: (q_pmil, q_a, q_b, lift). Exact
    percentiles need the per-arm sorted values, but only of the
    PER-USER frame (one row per user, already a >=1e3x reduction of
    the event corpus); Spark's `percentile` and the oracle's
    quantile_cont share the linear-interpolation definition, so
    values match to the cent (the agg_percentiles precedent)."""
    per_user = events.groupBy(F.col(user_col)).agg(
        F.coalesce(F.sum(metric_cents), F.lit(0)).cast("long")
        .alias("_y")
    ).withColumn("_arm", _arm(user_col))
    qs = F.array(*[F.lit(q) for q in quantiles])
    per_arm = per_user.groupBy("_arm").agg(
        F.percentile(F.col("_y"), qs).alias("_q")
    )
    a = per_arm.filter(F.col("_arm") == 0).select(
        F.col("_q").alias("_qa"))
    b = per_arm.filter(F.col("_arm") == 1).select(
        F.col("_q").alias("_qb"))
    rows = F.array(*[
        F.struct(
            F.lit(int(q * 1000)).alias("q_pmil"),
            F.round(F.element_at("_qa", i + 1), 2).alias("q_a"),
            F.round(F.element_at("_qb", i + 1), 2).alias("q_b"),
            F.round(
                F.element_at("_qb", i + 1)
                - F.element_at("_qa", i + 1), 2
            ).alias("lift"),
        )
        for i, q in enumerate(quantiles)
    ])
    return (
        a.crossJoin(F.broadcast(b))
        .select(F.explode(rows).alias("r"))
        .select("r.*")
    )


def mde_card(events: DataFrame, user_col: str,
             metric_cents) -> DataFrame:
    """Minimum-detectable-effect card — 'is this experiment even big
    enough?': given the CURRENT arms and outcome variance, the
    smallest true lift a 5%-alpha / 80%-power two-sided test would
    detect, in absolute cents and as a fraction of the control mean.

    MDE = (z_{0.975} + z_{0.80}) · sqrt(var_a/n_a + var_b/n_b), with
    the z constants fixed literals (1.959964, 0.841621) and the
    variances from the same exact one-pass sufficient statistics as
    the Welch card. Returns (n_a, n_b, mean_a_fp, mde_abs_fp,
    mde_rel_fp); NULL when either arm has < 2 users."""
    per_user = events.groupBy(F.col(user_col)).agg(
        F.coalesce(F.sum(metric_cents), F.lit(0)).cast("long")
        .alias("_y")
    )
    m = per_user.withColumn("_arm", _arm(user_col)).groupBy().agg(
        *[
            agg.alias(name)
            for arm in (0, 1)
            for name, agg in (
                (f"n{arm}", F.sum(F.when(F.col("_arm") == arm, 1)
                                  .otherwise(0))),
                (f"s{arm}", F.sum(F.when(F.col("_arm") == arm,
                                         F.col("_y")).otherwise(0))),
                (f"q{arm}", F.sum(F.when(F.col("_arm") == arm,
                                         F.col("_y") * F.col("_y"))
                                  .otherwise(0)
                                  .cast("decimal(38,0)"))),
            )
        ]
    )
    d = "double"
    var = lambda a: (  # noqa: E731
        (F.col(f"q{a}").cast(d) * F.col(f"n{a}")
         - F.col(f"s{a}").cast(d) * F.col(f"s{a}"))
        / (F.col(f"n{a}").cast(d) * (F.col(f"n{a}") - F.lit(1)))
    )
    mean_a = F.col("s0").cast(d) / F.col("n0")
    # one literal, not a float sum: 1.959964 + 0.841621 computed at
    # runtime could differ from the oracle's literal by an ulp
    z_sum = F.lit(2.801585)
    mde = z_sum * F.sqrt(var(0) / F.col("n0") + var(1) / F.col("n1"))
    fp6 = fp6_floor  # single-rounding half-up (exactlog, round 10)
    ok = (F.col("n0") > 1) & (F.col("n1") > 1)
    return m.select(
        F.col("n0").cast("long").alias("n_a"),
        F.col("n1").cast("long").alias("n_b"),
        F.when(F.col("n0") > 0, fp6(mean_a)).alias("mean_a_fp"),
        F.when(ok, fp6(mde)).alias("mde_abs_fp"),
        F.when(ok, F.when(mean_a > F.lit(0.0), fp6(mde / mean_a)))
        .alias("mde_rel_fp"),
    )
