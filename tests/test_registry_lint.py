"""Registry-wide structural gates.

The driver's CORRECTNESS canonicalizer sorts/hashes results with pandas,
which crashes on list-valued cells (round-3 ``text_inverted_index`` red
row: ``TypeError: unhashable type: 'list'``). These tests keep the local
gate at least as strict as the driver on output shape:

- no registered query emits an Array/Map/Struct output column
- every registered query has a docstring; no oracle table typos
- the round-5 gate window (first 50 of ``_GATE_FIRST``) leads with the
  ROUND5_QUEUE verbatim and spends every refill slot on round-1-only
  evidence, so round 5 closes the full-registry driver-green union.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import lint_registry

from project_final_parquet_spark.registry import (
    _GATE_FIRST,
    _load_all,
    _REGISTRY,
    ROUND5_QUEUE,
    ROUND6_QUEUE,
)


def test_no_complex_output_columns(spark, sf_dir):
    offenders = lint_registry.complex_output_columns(spark, sf_dir)
    assert not offenders, "\n".join(offenders)


def test_static_lint_clean():
    assert lint_registry.static_problems() == []


def test_gate_first_names_registered():
    _load_all()
    unknown = [n for n in _GATE_FIRST if n not in _REGISTRY]
    assert not unknown


def test_round5_window_closes_registry_union():
    """The round-5 contract (VERDICT r4 item 1), asserted mechanically:

    - positions 1-19 are ROUND5_QUEUE verbatim — after this round the
      driver union r1..r5 covers every query registered before the r5
      freeze (registry ∖ gated-union = ∅);
    - every never-driver-gated query (vs CORRECTNESS_r01..r04) is
      either in the window or a declared post-freeze ROUND6_QUEUE name;
    - every refill slot re-gates a query whose LATEST driver evidence
      is round 1 (freshness goes to the oldest green claims first).
    """
    _load_all()
    repo = Path(__file__).resolve().parent.parent
    latest_green: dict[str, int] = {}
    for p in sorted(repo.glob("CORRECTNESS_r0[1234].json")):
        rnd = int(p.stem[-1])
        rec = json.loads(p.read_text())
        for name, row in rec.items():
            if row.get("hash_match") or row.get("rows_match"):
                latest_green[name] = max(latest_green.get(name, 0), rnd)
    window = _GATE_FIRST[:50]
    assert len(window) == len(set(window)) == 50
    assert window[:19] == ROUND5_QUEUE
    never_gated = [n for n in _REGISTRY if n not in latest_green]
    missing = [
        n
        for n in never_gated
        if n not in window and n not in ROUND6_QUEUE
    ]
    assert not missing, f"never-driver-gated queries outside window: {missing}"
    # new-in-round-5 queries are gated immediately (position 20 slot)
    assert "events_rolling_distinct_hll" in window
    refills = [n for n in window[19:] if n in latest_green]
    stale = {n: latest_green[n] for n in refills if latest_green[n] != 1}
    assert not stale, f"refill slots wasted on fresh evidence: {stale}"
