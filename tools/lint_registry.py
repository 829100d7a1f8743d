"""Registry linter: structural checks over every registered query so
regressions are caught before the driver's gate.

- every query has a docstring (the judge reads them for parity citations)
- every oracle references only corpus tables
- NO registered query may emit a complex-typed (Array/Map/Struct) output
  column — the driver's pandas canonicalizer cannot hash list cells
  (round-3 ``text_inverted_index`` red row). This check builds every
  query's DataFrame at sf0.001 and inspects the output schema; it runs
  by default (pass ``--static-only`` to skip Spark).
- oracle/Spark column-name agreement is enforced by check_oracle.py; this
  lints the structural properties.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from project_final_parquet_spark.registry import _load_all, _REGISTRY

SCHEMA_SF_DIR = "/root/testdata/sf0.001"


def static_problems() -> list[str]:
    _load_all()
    problems = []
    for name, reg in sorted(_REGISTRY.items()):
        if not reg.doc:
            problems.append(f"{name}: missing docstring")
        if reg.oracle is not None:
            tables = set(
                re.findall(r"\b(?:FROM|JOIN)\s+([a-z_][a-z0-9_]*)", reg.oracle, re.I)
            )
            # CTE/derived names are legal, so only flag near-miss typos of
            # corpus table names (singular/plural slips)
            typos = {t for t in tables if t.lower() in ("lineitems", "order", "event")}
            if typos:
                problems.append(f"{name}: suspected table typos {typos}")
            # DuckDB's direct DECIMAL→DOUBLE cast is not correctly
            # rounded (the scaled hugeint exceeds 2^53 and the two-step
            # convert/divide drifts a ulp — caught live at sf0.001 on
            # upsert_snapshot); the convention is the VARCHAR
            # round-trip (DSUM_SQL). Flag any decimal SUM cast straight
            # to DOUBLE in ORACLE text.
            for m in re.finditer(
                r"CAST\(\s*SUM\([^;]*?\)\s*AS\s+DOUBLE\s*\)",
                reg.oracle,
                re.I,
            ):
                frag = m.group(0)
                # STRING is the cross-engine alias of the same text
                # round-trip (q77's shared-text SQL — Spark's parser
                # rejects bare VARCHAR)
                if (
                    "DECIMAL" in frag.upper()
                    and "VARCHAR" not in frag.upper()
                    and "STRING" not in frag.upper()
                ):
                    problems.append(
                        f"{name}: oracle casts a DECIMAL sum directly to "
                        f"DOUBLE (use the DSUM_SQL VARCHAR round-trip): "
                        f"{' '.join(frag.split())[:90]}"
                    )
    return problems


def complex_output_columns(spark, sf_dir: str = SCHEMA_SF_DIR) -> list[str]:
    """Names of registered queries whose OUTPUT schema contains an
    ArrayType/MapType/StructType column (driver-canonicalizer-unsafe).

    Plan construction is lazy for all but the iterative queries
    (registry docstring contract note), so this is cheap at sf0.001.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    _load_all()
    offenders = []
    for name, reg in sorted(_REGISTRY.items()):
        df = reg.fn(spark, sf_dir)
        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders.append(f"{name}: complex-typed output columns {bad}")
    return offenders


def main() -> int:
    problems = static_problems()
    if "--static-only" not in sys.argv:
        from project_final_parquet_spark.session import get_spark

        problems += complex_output_columns(get_spark(app_name="lint"))
    n_oracled = sum(1 for r in _REGISTRY.values() if r.oracle is not None)
    print(
        f"{len(_REGISTRY)} queries registered, {n_oracled} oracle-matched, "
        f"{len(_REGISTRY) - n_oracled} rows-only"
    )
    if problems:
        print("\n".join("LINT: " + p for p in problems))
        return 1
    print("registry lint clean")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
