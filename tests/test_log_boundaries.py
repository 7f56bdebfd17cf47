"""Boundary-proximity lock for the ln() family (exactlog discipline).

JVM Math.log and DuckDB's libm may disagree by 1 ulp even on an
identical input double. The exactlog spellings guarantee identical
INPUTS; this suite locks the residual hazard — that a 1-ulp skew of
the log OUTPUT could flip a fixed-point integer — by re-running each
log-carrying query with the ln() result perturbed by ±1e-12
RELATIVE (~4500 ulps, three orders of magnitude beyond any real
cross-build skew) and asserting the quantized outputs are
IDENTICAL. If a future query puts a pre-floor value within 1e-12 of
a quantization boundary on testdata, this fails and the query must
be re-spelled (round-8 postmortem: dq_psi_drift /
ml_information_value flipped on the driver's build while passing
locally at three SFs — this lock makes that class of flake
reproducible on any box).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

EPS_UP = 1.0 + 1e-12
EPS_DN = 1.0 - 1e-12


def _perturbed_log_frac(scale: float):
    def log_frac(num, den):
        return F.log(num.cast("double") / den.cast("double")) \
            * F.lit(scale)
    return log_frac


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _assert_invariant(monkeypatch, modules, build):
    """Run ``build()`` unpatched, then with every module's bound
    ``log_frac`` scaled by 1±1e-12; all three results must agree."""
    base = _rows(build())
    for scale in (EPS_UP, EPS_DN):
        for mod, name in modules:
            monkeypatch.setattr(mod, name, _perturbed_log_frac(scale))
        assert _rows(build()) == base, (
            f"log-family output flips under a {scale - 1.0:+.0e} "
            "relative ln() perturbation — pre-floor value sits on a "
            "quantization boundary; re-spell per exactlog"
        )
        monkeypatch.undo()


def _assert_libm_free(df):
    """Round 10: PSI and IV carry NO ln() at all — intlog evaluates
    the log in pure integer arithmetic, so the strongest possible
    lock is structural: no LOG expression anywhere in the plan (a
    perturbation test would have nothing to perturb)."""
    plan = df._jdf.queryExecution().analyzed().toString().lower()
    assert "log(" not in plan and "ln(" not in plan, (
        "a libm log crept back into a query whose driver-gate "
        "history (rounds 8-9) demands the intlog integer spelling"
    )


def test_psi_drift_libm_free(spark):
    from avk_job_skill_analytics_spark.operators import dataquality as DQ

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    a = ev.filter(F.dayofmonth("ts") <= 15)
    b = ev.filter(F.dayofmonth("ts") > 15)
    df = DQ.psi_drift(a, b, "value", 0.0, 500.0, 10)
    _assert_libm_free(df)
    rows = df.collect()
    assert len(rows) == 10 and all(
        r["psi_fp"] == rows[0]["psi_fp"] for r in rows)


def test_information_value_libm_free(spark):
    from avk_job_skill_analytics_spark.operators import dataquality as DQ

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    df = DQ.information_value(
        o, "o_totalprice", F.col("o_orderstatus") == "F",
        0.0, 500_000.0, 10,
    )
    _assert_libm_free(df)
    assert df.count() == 10


def test_nb_weights_boundary_margin(spark, monkeypatch):
    from avk_job_skill_analytics_spark.operators import classify, exactlog

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .withColumn("_y", (F.col("lang") == "en").cast("int"))

    def build():
        w = classify.nb_train_weights(docs, "doc_id", "text", "_y")
        return classify.nb_score(docs, w, "doc_id", "text", "_y")

    # classify routes through exactlog.log_fp, which resolves
    # log_frac from exactlog's module globals at call time
    _assert_invariant(monkeypatch, [(exactlog, "log_frac")], build)


def test_bm25_boundary_margin(spark, monkeypatch):
    from avk_job_skill_analytics_spark.operators import retrieval

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    _assert_invariant(
        monkeypatch, [(retrieval, "log_frac")],
        lambda: retrieval.bm25_topk(
            docs, "doc_id", "text", ["scan", "hash", "merge"], k=10,
        ),
    )


def test_dsir_and_kl_boundary_margin(spark, monkeypatch):
    from avk_job_skill_analytics_spark.operators import textstats

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    raw = docs.filter(F.col("source") != "src0")
    target = docs.filter(F.col("source") == "src0")
    _assert_invariant(
        monkeypatch, [(textstats, "log_frac")],
        lambda: textstats.dsir_importance(raw, target, "doc_id", "text"),
    )
    _assert_invariant(
        monkeypatch, [(textstats, "log_frac")],
        lambda: textstats.kl_by_source(docs, "source", "text"),
    )


def test_pmi_boundary_margin(spark, monkeypatch):
    from avk_job_skill_analytics_spark.operators import textstats

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    _assert_invariant(
        monkeypatch, [(textstats, "log_frac")],
        lambda: textstats.pmi_collocations(docs, "doc_id", "text"),
    )
