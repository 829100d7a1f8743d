"""Full-registry scale sweep: run EVERY registered query at a given SF.

The bench harness times the HEADLINE queries; this tool executes the
whole registry through the noop sink at an arbitrary SF dir — by
default sf0.1, 10x the correctness-gate scale — and prints a per-query
timing table plus the slowest N. Purpose: catch a
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

    # Warm-up outside the measured window (VERDICT r12 item 5: the r12
    # sweep charged position 1 the whole session's codegen/JIT warm-up —
    # sim_ivf_adaptive read 16.5 s in-sweep vs 2-3 s isolated). One
    # aggregation plan alone does not warm enough of the stack, so run
    # a representative trio: whole-stage-codegen agg + sort, a
    # broadcast-join + window, and a Python-worker (pandas UDF) plan so
    # the worker pool and Arrow path are live before timing starts.
    for warm in ("q1_pricing_summary", "q7_top3_orders_per_customer",
                 "embeddings_dim_stats"):
        if warm in queries:
            queries[warm](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()

    def _isolate() -> None:
        # bench.py's isolation verbatim: leftover localCheckpoint
        # blocks pile up across a long run and tax late queries with
        # GC/memory pressure (graph_pagerank 14.5 s mid-suite vs 6.4 s
        # isolated); clearCache + deterministic unpersist + a JVM full
        # GC before each timed query keeps readings honest.
        gc.collect()
        spark.catalog.clearCache()
        try:
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
            spark._jvm.System.gc()
        except Exception:
            pass  # private API; isolation degrades gracefully

    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name, fn in queries.items():
        _isolate()
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
