"""Full-registry scale sweep: run EVERY registered query at a given SF.

The bench harness times the 43 HEADLINE queries; this tool executes the
whole registry (212 queries) through the noop sink at an arbitrary SF
dir — by default sf0.1, 10x the correctness-gate scale — and prints a
per-query timing table plus the slowest N. Purpose: catch a
non-headline query whose plan degrades super-linearly with data size
(e.g. an accidental unpartitioned window or a candidate blow-up) BEFORE
it matters, and record full-surface evidence that the engine's entire
query surface runs at the largest local SF.

Usage:  python tools/sweep_registry.py [sf_dir] [--json OUT]
"""

from __future__ import annotations

import gc
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from project_final_parquet_spark.registry import all_queries
from project_final_parquet_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    out_path = None
    if "--json" in sys.argv:
        out_path = sys.argv[sys.argv.index("--json") + 1]

    spark = get_spark(app_name="sweep_registry")
    queries = all_queries()

    # warm-up outside the measured window
    queries["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name, fn in queries.items():
        gc.collect()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001 — sweep must report, not die
            failures[name] = f"{type(exc).__name__}: {exc}"[:200]
            continue
        sec = round(time.perf_counter() - t0, 3)
        timings[name] = sec
        print(f"{sec:8.3f}  {name}", flush=True)

    total = round(sum(timings.values()), 1)
    print(f"\n{len(timings)} queries ran, {len(failures)} failed, "
          f"total {total}s at {sf_dir}")
    print("\nslowest 15:")
    for name, sec in sorted(timings.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{sec:8.3f}  {name}")
    for name, err in failures.items():
        print(f"FAIL  {name}: {err}")

    if out_path:
        Path(out_path).write_text(
            json.dumps(
                {"sf_dir": sf_dir, "total_sec": total,
                 "queries": timings, "failures": failures},
                indent=1,
            )
        )
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
