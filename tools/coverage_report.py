"""Regenerate COVERAGE.md's §Local-oracle report table from a
verify_local sweep log.

Usage:
    python tools/verify_local.py /root/testdata/sf0.01 | tee /tmp/sweep.log
    python tools/coverage_report.py /tmp/sweep.log

Parses the ``ok``/``ROWS``/``FAIL`` lines and rewrites the status
table between the ``| query | status | rows |`` header and the next
heading, leaving everything else untouched.
"""

from __future__ import annotations

import re
import sys

COVERAGE = "/root/repo/COVERAGE.md"


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
    table = "| query | status | rows |\n|---|---|---|\n" + "".join(
        f"| `{q}` | {s} | {n} |\n" for q, s, n in rows
    )
    src = open(COVERAGE).read()
    start = src.index("| query | status | rows |")
    # table ends at the first blank line that follows it (or EOF —
    # the table is currently the file's last section)
    end = src.find("\n\n", start)
    if end == -1:
        end = len(src.rstrip("\n"))
    open(COVERAGE, "w").write(src[:start] + table.rstrip("\n")
                              + src[end:])
    n_ok = sum(1 for _, s, _ in rows if s == "ok")
    n_ro = sum(1 for _, s, _ in rows if s == "rows-only")
    n_f = sum(1 for _, s, _ in rows if s == "FAIL")
    print(f"table rewritten: {len(rows)} rows "
          f"({n_ok} ok, {n_ro} rows-only, {n_f} FAIL)")


if __name__ == "__main__":
    main(sys.argv[1])
