"""Capture .explain("formatted") output for registry queries.

Usage: python tools/explain_capture.py OUT_DIR SUFFIX [sf_dir] query [query ...]

Writes OUT_DIR/<query>_<SUFFIX>.txt for each named query — the
physical plan as the optimization rounds' before/after evidence
(plans/r14/<query>_before.txt / _after.txt). Uses the tuned session
(same as bench.py) so the captured plan is the one the bench times.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from avk_job_skill_analytics_spark.plans.session import get_spark  # noqa: E402
from avk_job_skill_analytics_spark.registry import all_queries  # noqa: E402


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", rest
    os.makedirs(out_dir, exist_ok=True)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus), 4))
    queries = all_queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
