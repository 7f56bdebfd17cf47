"""Regenerate COVERAGE.md's §Local-oracle report table from a
verify_local sweep log.

Usage:
    python tools/verify_local.py /root/testdata/sf0.01 | tee /tmp/sweep.log
    python tools/coverage_report.py /tmp/sweep.log

Parses the ``ok``/``ROWS``/``FAIL`` lines and rewrites (1) the
status table between the ``| query | status | rows |`` header and
the next heading, (2) the ``**Totals: ...**`` inventory line, and
(3) the §Local-oracle report header + summary — all derived from the
same sweep log, so the prose counts can never drift from the table
(they were hand-edited through round 8). Running the tool twice on
the same log is idempotent.
"""

from __future__ import annotations

import datetime
import glob
import json
import re
import sys

COVERAGE = "/root/repo/COVERAGE.md"


def _driver_verdicts() -> tuple[str, dict]:
    """The latest driver CORRECTNESS file: per-query provenance so
    the table distinguishes 'the driver's own gate saw this row
    green' from 'verified locally only' (VERDICT r9 #6 — the
    round-over-round brief must lead with the driver's numbers)."""
    files = sorted(glob.glob("/root/repo/CORRECTNESS_r*.json"))
    if not files:
        return "none", {}
    latest = files[-1]
    return latest.rsplit("/", 1)[1], json.load(open(latest))


def main(log_path: str) -> None:
    rows = []
    line_pat = re.compile(r"^(ok|rows|FAIL)\s+(\w+): (\d+) rows")
    for line in open(log_path):
        m = line_pat.match(line.strip())
        if m:
            status = {"ok": "ok", "rows": "rows-only",
                      "FAIL": "FAIL"}[m.group(1)]
            rows.append((m.group(2), status, m.group(3)))
    if not rows:
        raise SystemExit(f"no sweep lines found in {log_path}")
    rows.sort()
    drv_name, drv = _driver_verdicts()

    def prov(q: str) -> str:
        if q not in drv:
            return "local"
        v = drv[q]
        if v.get("hash_match"):
            return "driver ok + local"
        return "driver FAIL + local"

    table = (
        f"| query | status | rows | provenance ({drv_name}) |\n"
        "|---|---|---|---|\n" + "".join(
            f"| `{q}` | {s} | {n} | {prov(q)} |\n" for q, s, n in rows
        )
    )
    src = open(COVERAGE).read()
    start = src.index("| query | status | rows |")
    # table ends at the first blank line that follows it (or EOF —
    # the table is currently the file's last section)
    end = src.find("\n\n", start)
    if end == -1:
        end = len(src.rstrip("\n"))
    src = src[:start] + table.rstrip("\n") + src[end:]
    n_ok = sum(1 for _, s, _ in rows if s == "ok")
    n_ro = sum(1 for _, s, _ in rows if s == "rows-only")
    n_f = sum(1 for _, s, _ in rows if s == "FAIL")

    # (2) the inventory totals line
    src, n1 = re.subn(
        r"\*\*Totals: \d+ queries — \d+ oracle-verified, "
        r"\d+ rows-only by design\*\*",
        f"**Totals: {len(rows)} queries — {n_ok} oracle-verified, "
        f"{n_ro} rows-only by design**",
        src,
    )
    # (3) the local-oracle report header + summary lines
    today = datetime.date.today().isoformat()
    src, n2 = re.subn(
        r"## Local-oracle report \([^)]*\)\n\n"
        r"`python tools/verify_local\.py [^`]*` — [^\n]*\n"
        r"\*\*\d+ hash-matched vs DuckDB, \d+ rows-only by design, "
        r"\d+ failed / \d+\.\*\*",
        "## Local-oracle report (sf0.01, driver's NTZ parquet)\n\n"
        f"`python tools/verify_local.py /root/testdata/sf0.01` — {today}.\n"
        f"**{n_ok} hash-matched vs DuckDB, {n_ro} rows-only by design, "
        f"{n_f} failed / {len(rows)}.**",
        src,
    )
    open(COVERAGE, "w").write(src)
    print(f"table rewritten: {len(rows)} rows "
          f"({n_ok} ok, {n_ro} rows-only, {n_f} FAIL); "
          f"totals line {'updated' if n1 else 'NOT FOUND'}, "
          f"report header {'updated' if n2 else 'NOT FOUND'}")


if __name__ == "__main__":
    main(sys.argv[1])
