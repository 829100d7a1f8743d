"""bench.py final-line detail rotation (optimization r14).

VERDICT r13: the drop-priority tie-break used the CURRENT run's
timings, so the driver's same-round 32-core and 8-core runs published
near-disjoint per-query detail sets and the driver's scaling.per_query
comparison came back empty. The key is now (class, md5(round:name)) —
pure function of the committed records and the name — so two runs of
the same tree in the same round drop detail in the same order.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

_BENCH = Path(__file__).resolve().parent.parent / "bench.py"
_spec = importlib.util.spec_from_file_location("bench_mod", _BENCH)
bench = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("bench_mod", bench)
_spec.loader.exec_module(bench)

NAMES = [f"query_{i:02d}" for i in range(40)]


def _drop_order(rnd, prev=(), prev2=(), prev3=()):
    return sorted(
        NAMES,
        key=lambda n: bench._drop_priority(
            n, rnd, set(prev), set(prev2), set(prev3)
        ),
    )


def test_drop_order_is_timing_independent():
    # _drop_priority takes no timing input at all; two same-round runs
    # (the driver's c32/c8 scaling pair) therefore sort identically.
    assert _drop_order(14) == _drop_order(14)


def test_drop_order_rotates_across_rounds():
    # md5(round:name) reshuffles the within-class order each round, so
    # multi-round coverage keeps rotating (astronomically unlikely for
    # two rounds to agree on 40 names).
    assert _drop_order(14) != _drop_order(15)


def test_class_priority_beats_hash():
    # Names already covered by the newest parsed record drop first;
    # names absent from all three records are protected (drop last).
    covered = NAMES[:10]
    protected = NAMES[30:]
    order = _drop_order(14, prev=covered, prev2=NAMES[10:20], prev3=NAMES[20:30])
    assert set(order[:10]) == set(covered)
    assert set(order[-10:]) == set(protected)


def test_bench_file_round_parses_core_suffix():
    # BENCH_r13_c8.json is round 13, not "138" (the digit-scrape bug
    # that let the low-core sibling masquerade as its own rotation
    # generation).
    assert bench._bench_file_round(Path("BENCH_r13_c8.json")) == 13
    assert bench._bench_file_round(Path("BENCH_r04.json")) == 4
    assert bench._bench_file_round(Path("notabench.json")) is None


def test_current_round_is_newest_committed_plus_one():
    # Computed independently of bench.py's parser: the newest committed
    # round, by strict BENCH_r(\d+) prefix match, plus one. Guards the
    # digit-scrape regression (r13_c8 → round "138" → round 139 here)
    # without pinning the test to this round's number.
    import re

    newest = 0
    for p in _BENCH.parent.glob("BENCH_r*.json"):
        m = re.match(r"BENCH_r(\d+)", p.stem)
        if m:
            newest = max(newest, int(m.group(1)))
    assert newest > 0
    assert bench._current_round() == newest + 1
