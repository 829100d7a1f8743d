"""Registry-wide structural gates.

The driver's CORRECTNESS canonicalizer sorts/hashes results with pandas,
which crashes on list-valued cells (round-3 ``text_inverted_index`` red
row: ``TypeError: unhashable type: 'list'``). These tests keep the local
gate at least as strict as the driver on output shape:

- no registered query emits an Array/Map/Struct output column
- every registered query has a docstring; no oracle table typos
- the round-4 gate window (first 50 of ``_GATE_FIRST``) contains every
  never-driver-gated query plus the two planned re-gates, so round 4
  closes the full-registry driver-green union.
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


def test_round4_window_closes_registry_union():
    """Positions 1-50 must cover every query with no driver-green row
    across CORRECTNESS_r01..r03 (the never-gated 41 + re-gates)."""
    _load_all()
    repo = Path(__file__).resolve().parent.parent
    gated_green: set[str] = set()
    for p in sorted(repo.glob("CORRECTNESS_r0[123].json")):
        rec = json.loads(p.read_text())
        for name, row in rec.items():
            if row.get("hash_match") or row.get("rows_match"):
                gated_green.add(name)
    never_gated = [n for n in _REGISTRY if n not in gated_green]
    window = set(_GATE_FIRST[:50])
    # post-freeze additions are exempt but must sit at positions 51+ in
    # declared order, so they lead the round-5 rotation
    missing = [
        n for n in never_gated if n not in window and n not in ROUND5_QUEUE
    ]
    assert not missing, f"never-driver-gated queries outside window: {missing}"
    assert _GATE_FIRST[50 : 50 + len(ROUND5_QUEUE)] == ROUND5_QUEUE
    # planned re-gates ride along
    assert "dedup_cluster_components" in window
    assert "text_inverted_index" in window
