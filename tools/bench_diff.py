"""Per-query regression diff between two bench.py JSON outputs.

Usage: python tools/bench_diff.py OLD.json NEW.json [threshold_pct]

Prints queries whose wall time moved more than threshold_pct (default
30%) in either direction, plus added/removed queries and the
total/streaming subtotals — the round-over-round guard against a
query silently degrading while correctness stays green. Exit code 1
if any regression exceeds the threshold (improvements don't fail).
"""

from __future__ import annotations

import json
import re
import sys


def _load(path: str) -> dict:
    """Accept either bench.py's raw JSON line or the driver's
    BENCH_r{N}.json wrapper ({"tail": "...stdout tail..."}), whose
    tail may be truncated at the front — recover what's parseable."""
    d = json.load(open(path))
    if "queries" in d:
        return d
    tail = d.get("tail", "")
    m = re.search(r'\{"metric".*', tail)
    if m:
        try:
            return json.loads(m.group(0))
        except json.JSONDecodeError:
            pass
    # truncated head: scrape "name": number pairs; totals unavailable
    pairs = re.findall(r'"([a-z0-9_]+)":\s*(-?\d+(?:\.\d+)?)', tail)
    queries = {
        k: float(v)
        for k, v in pairs
        if k not in ("metric", "value", "sf", "streaming_subtotal")
    }
    return {"value": float("nan"), "queries": queries,
            "streaming_subtotal": 0.0}


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        raise SystemExit(2)
    old = _load(sys.argv[1])
    new = _load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 30.0
    oq, nq = old["queries"], new["queries"]

    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    regressed = []
    moved = []
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name], nq[name]
        if a <= 0 or b <= 0:  # error sentinel
            continue
        pct = 100.0 * (b - a) / a
        if abs(pct) >= thresh and abs(b - a) >= 0.25:  # ignore sub-250ms jitter
            moved.append((pct, name, a, b))
            if pct > 0:
                regressed.append(name)
    for pct, name, a, b in sorted(moved, reverse=True):
        print(f"{pct:+7.1f}%  {name}: {a:.2f}s -> {b:.2f}s")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"REMOVED ({len(removed)}): {', '.join(removed)}")
    print(
        f"total: {old['value']:.1f}s -> {new['value']:.1f}s | streaming: "
        f"{old.get('streaming_subtotal', 0):.1f}s -> "
        f"{new.get('streaming_subtotal', 0):.1f}s"
    )
    raise SystemExit(1 if (regressed or removed) else 0)


if __name__ == "__main__":
    main()
