"""Per-trigger scale probe for the streaming-index lifecycle queries.

`BENCH_sf1.json` records end-to-end wall for the three most expensive
streaming entries (`stream_ssjoin_maintain`, `stream_index_auto_retrain`,
`stream_bm25_index_maintain`), but end-to-end wall mixes fixture
construction, checkpoint machinery, and the final verification read
with the thing that actually scales: the per-micro-batch sink work.
This tool attaches a StreamingQueryListener while running each registry
query unmodified, and reports, per trigger: input rows and the trigger
execution wall. Run at sf0.1 and sf1 (10x data; build the latter with
``python tools/make_sf1.py`` first) the two points show how per-trigger
cost grows with batch size — the number that predicts 100 TB behaviour,
where batches keep their size and only their COUNT grows.

Usage: ``python tools/probe_stream_sf1.py [sf_dir ...]``
(defaults to /root/testdata/sf0.1 and <repo>/.bench_sf1/sf1).
``--queries a,b,c`` overrides the probed set (r12: used for the
trigger-count-scaling class — stream_minhash_dedup /
stream_heavy_hitters / stream_media_dedup); results MERGE into
BENCH_sf1_TRIGGERS.json by (sf_dir, query) instead of overwriting, so
successive probe runs accumulate one ledger.
Prints one JSON object per (sf_dir, query) with the per-trigger table.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402

from avk_job_skill_analytics_spark.plans.session import get_spark  # noqa: E402
from avk_job_skill_analytics_spark.registry import all_queries  # noqa: E402

QUERIES = [
    "stream_ssjoin_maintain",
    "stream_index_auto_retrain",
    "stream_bm25_index_maintain",
]


class _TriggerTap(StreamingQueryListener):
    """Collect (batchId, numInputRows, triggerExecution ms) per progress
    event. Listener callbacks arrive on a background thread after the
    driving code returns, so callers must give the bus a moment to
    drain (see _drain) before reading ``rows``."""

    def __init__(self) -> None:
        self.rows: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        self.rows.append(
            {
                "batch_id": p.get("batchId"),
                "input_rows": p.get("numInputRows"),
                "trigger_ms": (p.get("durationMs") or {}).get(
                    "triggerExecution"
                ),
            }
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def _drain(tap: _TriggerTap, n_before: int, timeout_s: float = 10.0) -> None:
    """Wait until the listener bus stops delivering new rows."""
    deadline = time.time() + timeout_s
    last = -1
    while time.time() < deadline:
        cur = len(tap.rows)
        if cur == last and cur > n_before:
            return
        last = cur
        time.sleep(0.5)


def main() -> None:
    args = sys.argv[1:]
    queries = list(QUERIES)
    if "--queries" in args:
        i = args.index("--queries")
        queries = args[i + 1].split(",")
        del args[i:i + 2]
    sf_dirs = args or [
        "/root/testdata/sf0.1",
        os.path.join(ROOT, ".bench_sf1", "sf1"),
    ]
    spark = get_spark()
    registry = all_queries()
    tap = _TriggerTap()
    spark.streams.addListener(tap)
    out = []
    for sf_dir in sf_dirs:
        if not os.path.isdir(sf_dir):
            print(f"skip missing {sf_dir}", file=sys.stderr)
            continue
        for name in queries:
            n_before = len(tap.rows)
            t0 = time.time()
            registry[name](spark, sf_dir).count()
            wall = round(time.time() - t0, 3)
            _drain(tap, n_before)
            # availableNow drains end with a 0-row bookkeeping trigger;
            # keep only triggers that processed data.
            triggers = [
                r for r in tap.rows[n_before:] if (r["input_rows"] or 0) > 0
            ]
            rec = {
                "sf_dir": os.path.basename(sf_dir.rstrip("/")),
                "query": name,
                "wall_s": wall,
                "triggers": triggers,
            }
            out.append(rec)
            print(json.dumps(rec), flush=True)
    spark.streams.removeListener(tap)
    path = os.path.join(ROOT, "BENCH_sf1_TRIGGERS.json")
    merged = []
    if os.path.exists(path):
        # a parse failure must ABORT, not silently clobber the
        # accumulated ledger with this run's fragment
        with open(path) as f:
            merged = json.load(f)
    fresh = {(r["sf_dir"], r["query"]) for r in out}
    merged = [
        r for r in merged if (r["sf_dir"], r["query"]) not in fresh
    ] + out
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)


if __name__ == "__main__":
    main()
