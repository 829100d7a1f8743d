"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count, column names, and an order-insensitive value hash.
Strictly exact comparison (stringified values) — if this passes, any
reasonable driver-side hash passes too.

Usage:  python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
from datetime import date, datetime
from decimal import Decimal

import duckdb
import numpy as np


class ComplexCellError(TypeError):
    """A result cell the driver's canonicalizer would crash on."""


def canon_val(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NULL>"
        # repr() round-trips doubles exactly; 17 sig digits
        return repr(v)
    if isinstance(v, (np.floating,)):
        return canon_val(float(v))
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, Decimal):
        # Raw string, scale preserved — NOT float(): float() hid exactly
        # the rendering difference the driver hash caught on round-2
        # q56 (Spark DECIMAL(33,4) vs DuckDB DECIMAL(38,4)). Stricter
        # than any reasonable driver canon: queries must not emit raw
        # DECIMAL output at all (registry convention #2 — cast the final
        # exact sum to DOUBLE on both sides).
        return str(v)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, np.datetime64):
        import pandas as pd

        if np.isnat(v):
            return "<NULL>"
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (np.ndarray, list, tuple, dict)):
        # The DRIVER's pandas-based canonicalizer cannot hash list/dict
        # cells (round-3 text_inverted_index red row: pandas factorize →
        # "unhashable type: 'list'"). Fail here too, so the local gate is
        # never more permissive than the driver on output shape.
        raise ComplexCellError(
            f"complex-typed cell {type(v).__name__}: registered queries "
            "must serialize arrays/maps/structs to strings "
            "(registry lint bans complex output columns)"
        )
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, bool) or isinstance(v, np.bool_):
        return "true" if v else "false"
    return str(v)


def canon_rows(pdf) -> tuple[list[str], list[tuple[str, ...]]]:
    import pandas as pd

    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = []
    for row in pdf.itertuples(index=False, name=None):
        rows.append(tuple(canon_val(v if not (isinstance(v, float) and pd.isna(v)) else None) for v in row))
    rows.sort()
    return cols, rows


def value_hash(rows) -> str:
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.01"
    only = set(a for a in sys.argv[1:] if "/" not in a)

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod
    from project_final_parquet_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    # Loud on a typo'd filter (VERDICT r10): a name that matches zero
    # registered queries must NOT fall through to "all queries match".
    if only:
        unknown = sorted(only - set(qs))
        if unknown:
            print(f"ERROR: unknown query name(s): {unknown}")
            return 2
    failures = []
    checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        checked += 1
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle — rows-only check)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        try:
            s_cols, s_rows = canon_rows(sdf)
            o_cols, o_rows = canon_rows(odf)
        except ComplexCellError as e:
            print(f"FAIL  {name}: {e}")
            failures.append(name)
            continue
        problems = []
        if len(s_rows) != len(o_rows):
            problems.append(f"rowcount spark={len(s_rows)} duckdb={len(o_rows)}")
        if s_cols != o_cols:
            problems.append(f"cols spark={s_cols} duckdb={o_cols}")
        if not problems and value_hash(s_rows) != value_hash(o_rows):
            diffs = [
                (a, b) for a, b in zip(s_rows, o_rows) if a != b
            ][:3]
            problems.append(f"value hash mismatch; first diffs: {diffs}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"OK    {name}: {len(s_rows)} rows, hash {value_hash(s_rows)}")
    print()
    print(f"checked {checked} queries at {sf_dir}")
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    if checked == 0:
        print("ERROR: no queries checked")
        return 2
    print("all queries match their oracles")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
