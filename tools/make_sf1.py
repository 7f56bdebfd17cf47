"""Materialize an sf1-scale replica of sf0.1 for the scale probe.

The driver's testdata stops at sf0.1 (600K-row lineitem); this tool
builds a 10x dataset at ``<repo>/.bench_sf1/sf1`` so the dd/ann/
stream headliners get one MEASURED data point a decade above the
sweep scale (`BENCH_NOTES.md`). Construction (seedless,
deterministic): each fact table is the union of 10 key-shifted
copies of sf0.1 — replica r adds ``r * 2^33`` to every surrogate
key, shifting primary and foreign keys together so joins stay
consistent within a replica and never collide across replicas.
Region/nation (fkey targets of the unshifted nationkey columns) copy
once. Two content tweaks keep the workload's SHAPE honest at 10x:

- documents: replica r > 0 suffixes every token with ``~r`` so its
  shingle space is disjoint from other replicas — near-dup structure
  scales 10x (10 independent corpora), not 100x (every doc having 9
  verbatim twins would quadratically explode LSH bucket pairs, which
  is a different workload, not a bigger one);
- embeddings: replica r adds ``r * 1e-6`` to every component so
  cosine top-k has no 10-way exact ties.

Usage: ``python tools/make_sf1.py [sf]`` (sf in {1, 10, ...}; default
1 → 10 replicas at ``.bench_sf1/sf1``, 10 → 100 replicas at
``.bench_sf1/sf10`` for the second-decade probe) then
``SPARK_GRAFT_SF_DIR=<repo>/.bench_sf1/sf<sf> python bench.py <queries>``.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from avk_job_skill_analytics_spark.plans.schemas import load  # noqa: E402
from avk_job_skill_analytics_spark.plans.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
SF = int(sys.argv[1]) if len(sys.argv) > 1 else 1
DST = os.path.join(ROOT, ".bench_sf1", f"sf{SF}")
REPLICAS = 10 * SF
OFF = 1 << 33  # far above every sf0.1 surrogate key; 1000 replicas
# still top out near 2^43, far inside the split-multiply hash domain

SHIFT_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONCE = ["region", "nation"]


def replica(df, table: str, r: int):
    out = df
    for k in SHIFT_KEYS[table]:
        out = out.withColumn(k, F.col(k) + F.lit(r * OFF))
    if table == "documents" and r > 0:
        tag = F.lit(f"~{r}")
        out = out.withColumn(
            "text",
            F.array_join(
                F.transform(F.split(F.col("text"), " "),
                            lambda t: F.concat(t, tag)),
                " ",
            ),
        )
    if table == "customer" and (r // 10) > 0:
        # Decade-group decorrelation for the ER workload: replicas
        # share c_name verbatim, so at 100 replicas every name's
        # digit tail appears 100x and lands in ONE blocking cell
        # regardless of the key's width — the census cap rightfully
        # drops ALL of them and candidate generation degenerates to
        # zero pairs (a fixture-shape artifact, not a bigger
        # registry). Groups beyond the first rewrite the name's
        # serial digits to the SHIFTED custkey — what a genuinely
        # 10x registry looks like: serial numbers keep growing.
        # Group 0 (replicas 0-9) stays bit-identical to sf1.
        out = out.withColumn(
            "c_name",
            F.regexp_replace(
                F.col("c_name"), r"[0-9]+$",
                F.lpad(F.col("c_custkey").cast("string"), 12, "0"),
            ),
        )
    if table == "embeddings" and r > 0:
        # Replicas within a decade group (r // 10) keep the sf1
        # construction exactly (so sf1 output is bit-identical to
        # the recorded ledger); each GROUP beyond the first applies
        # a cyclic component rotation — an orthogonal transform that
        # preserves every intra-group cosine while decorrelating
        # hyperplane sign bits ACROSS groups. Without it, sf10's 100
        # replicas of +r*1e-6 are 100-way band twins (cross-replica
        # cosine ~1.0): every LSH bucket inherits 100x occupancy and
        # the near-dup workload becomes quadratic by construction —
        # "a different workload, not a bigger one" (the documents
        # column already avoids this with disjoint ~r shingle
        # suffixes). With the rotation, sf10 is 10 independent
        # copies of the sf1 workload: 10x scale, same shape.
        shift = (r // 10) % 64
        if shift:
            out = out.withColumn(
                "embedding",
                F.concat(
                    F.slice("embedding", shift + 1, 64 - shift),
                    F.slice("embedding", 1, shift),
                ),
            )
        out = out.withColumn(
            "embedding",
            F.transform(F.col("embedding"),
                        lambda x: x + F.lit(r * 1e-6).cast("float")),
        )
    return out


def main() -> None:
    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    os.makedirs(DST, exist_ok=True)
    for table in COPY_ONCE:
        load(spark, SRC, table).write.mode("overwrite").parquet(
            f"{DST}/{table}.parquet"
        )
        print(f"{table}: copied once")
    for table in SHIFT_KEYS:
        base = load(spark, SRC, table)
        out = replica(base, table, 0)
        for r in range(1, REPLICAS):
            out = out.unionByName(replica(base, table, r))
        out.write.mode("overwrite").parquet(f"{DST}/{table}.parquet")
        n = spark.read.parquet(f"{DST}/{table}.parquet").count()
        print(f"{table}: {n} rows")
    print(f"done -> {DST}")


if __name__ == "__main__":
    main()
