"""Registry-wide structural gates.

The driver's CORRECTNESS canonicalizer sorts/hashes results with pandas,
which crashes on list-valued cells (round-3 ``text_inverted_index`` red
row: ``TypeError: unhashable type: 'list'``). These tests keep the local
gate at least as strict as the driver on output shape:

- no registered query emits an Array/Map/Struct output column
- every registered query has a docstring; no oracle table typos
- the round-13 gate window (first 50 of ``_GATE_FIRST``) leads with the
  ROUND13_QUEUE verbatim and spends every refill slot on the oldest
  remaining driver evidence (the last 19 round-4 names, then the oldest
  round-5 names, in their original window order)
- the registry docstring's eager-at-construction contract note names
  every query whose module-local call graph reaches localCheckpoint
"""

from __future__ import annotations

import ast
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import lint_registry

import project_final_parquet_spark.registry as registry_mod
from project_final_parquet_spark.registry import (
    _GATE_FIRST,
    _load_all,
    _REGISTRY,
    ROUND13_QUEUE,
    ROUND14_QUEUE,
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


def _latest_green(max_round: int | None = None) -> dict[str, int]:
    # ADVICE r9: glob every round and parse ALL trailing digits — the
    # old CORRECTNESS_r0[12345678] single-char class broke at round 10
    # (r10 would have parsed as round 0 under stem[-1]).
    import re

    repo = Path(__file__).resolve().parent.parent
    latest: dict[str, int] = {}
    for p in repo.glob("CORRECTNESS_r*.json"):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)", p.stem)
        if not m:
            continue
        rnd = int(m.group(1))
        if max_round is not None and rnd > max_round:
            continue
        rec = json.loads(p.read_text())
        for name, row in rec.items():
            if row.get("hash_match") or row.get("rows_match"):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def test_round13_window_leads_with_queue():
    """The round-13 rotation contract, asserted mechanically:

    - positions 1-18 are ROUND13_QUEUE verbatim (the round-12 in-round
      additions, never driver-gated) — after this round the driver
      union r1..r13 covers every pre-freeze registration (437/437);
    - every never-driver-gated query (vs CORRECTNESS_r01..r12) is
      either in the window or a declared post-freeze ROUND14_QUEUE
      name, and ROUND14_QUEUE contains nothing else;
    - refill slots re-gate the oldest evidence in the ledger: the 19
      remaining round-4 rows first, then only round-5 rows (nothing
      fresher), and no round-1/2/3-evidence rows remain anywhere in
      the ledger after this window runs.
    """
    _load_all()
    latest_green = _latest_green(max_round=12)
    window = _GATE_FIRST[:50]
    assert len(window) == len(set(window)) == 50
    assert window[: len(ROUND13_QUEUE)] == ROUND13_QUEUE
    never_gated = {n for n in _REGISTRY if n not in latest_green}
    assert set(ROUND14_QUEUE) == never_gated - set(window), (
        "ROUND14_QUEUE must be exactly the never-driver-gated "
        "registrations outside the round-13 window"
    )
    refills = window[len(ROUND13_QUEUE):]
    # the 19 round-4 stragglers lead the refills; everything after them
    # carries round-5 evidence (the oldest remaining tier)
    r4 = [n for n in refills if latest_green[n] == 4]
    assert refills[: len(r4)] == r4 and len(r4) == 19, (
        "the last 19 round-4 evidence rows must lead the refill slots"
    )
    fresh = {n: latest_green[n] for n in refills if latest_green[n] > 5}
    assert not fresh, f"refill slots wasted on fresh evidence: {fresh}"
    # no r1/r2/r3-only names remain anywhere in the ledger
    leftover = {
        n
        for n, rnd in latest_green.items()
        if rnd <= 3 and n in _REGISTRY
    }
    assert leftover == set(), leftover


def test_eager_contract_note_is_complete():
    """The registry docstring's eager-query list must name every
    registered query whose module-local call graph reaches a
    ``.localCheckpoint()`` call (construction-time materialization).
    Extra documented names (e.g. the driver-side-collect pattern in
    ml_kmeans) are allowed but must be registered queries."""
    _load_all()
    doc = registry_mod.__doc__
    pkg = Path(registry_mod.__file__).resolve().parent
    flagged: set[str] = set()
    for py in list((pkg / "operators").glob("*.py")) + list(
        (pkg / "streaming").glob("*.py")
    ):
        tree = ast.parse(py.read_text())
        fns = {
            n.name: n
            for n in ast.walk(tree)
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        }

        def has_ckpt(fn: ast.AST) -> bool:
            # .localCheckpoint() or the tracked ckpt.checkpoint() helper
            return any(
                isinstance(n, ast.Call)
                and (
                    (
                        isinstance(n.func, ast.Attribute)
                        and n.func.attr in ("localCheckpoint", "checkpoint")
                    )
                    or (
                        isinstance(n.func, ast.Name)
                        and n.func.id == "checkpoint"
                    )
                )
                for n in ast.walk(fn)
            )

        eager = {name for name, fn in fns.items() if has_ckpt(fn)}
        # propagate through module-local calls to a fixpoint
        changed = True
        while changed:
            changed = False
            for name, fn in fns.items():
                if name in eager:
                    continue
                refs = {
                    n.id
                    for n in ast.walk(fn)
                    if isinstance(n, ast.Name)
                }
                if refs & eager:
                    eager.add(name)
                    changed = True
        flagged |= eager & set(_REGISTRY)
    undocumented = {n for n in flagged if n not in doc}
    assert not undocumented, (
        f"eager queries missing from the registry contract note: "
        f"{sorted(undocumented)}"
    )
    # every name the note claims is eager must at least be a real query
    documented = {n for n in _REGISTRY if n in doc and "_" in n}
    assert flagged <= documented
