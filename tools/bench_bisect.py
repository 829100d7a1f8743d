"""Bisect the round-2 driver-bench regression (VERDICT r2 item 2).

BENCH_r02 showed EVERY query shared with round 1 running 1.30-1.95x
slower (+15.4 s on the 14-query shared set) while a local run of the
same set measured faster than round 1. Hypotheses:

  H1  headline-list size: round 2 doubled the list 14 -> 24; JVM heap /
      codegen-cache / GC pressure from the longer same-session run
      slows every query uniformly.
  H2  code/conf: a round-2 registry or session change regressed the
      shared plans themselves.
  H3  environment: driver-machine variance; nothing in-repo changed.

Design (one JVM, interleaved): after a warm-up pass, run 2x(n_reps)
alternating phases — the r1-only 14-query list, then the full r2
24-query list — and compare the shared set's per-query MEDIANS between
phase kinds IN THE SAME SESSION.

  - If shared-set medians under the 24-query phases exceed the 14-query
    phases' by ~1.3-1.9x, H1 reproduces locally.
  - If both phase kinds match BENCH_r01-scale numbers, H1 and H2 are
    excluded locally and the r2 driver numbers were environmental (H3).
  - H2 would additionally show as shared-set medians far above
    BENCH_r01 regardless of phase kind (plans got slower, period).

Writes tools/bench_bisect_result.json and prints a summary.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import HEADLINE  # noqa: E402
from project_final_parquet_spark.registry import all_queries  # noqa: E402
from project_final_parquet_spark.session import get_spark  # noqa: E402

R1_LIST = HEADLINE[:14]  # the round-1 headline set, unchanged since r1

BENCH_R01 = {
    "q1_pricing_summary": 2.153, "q3_star_join_revenue": 3.358,
    "q7_top3_orders_per_customer": 1.279, "q8_running_qty_per_supplier": 1.574,
    "q23_asof_join": 1.504, "dedup_near_minhash_lsh": 4.114,
    "dedup_cluster_components": 6.645, "sim_topk_cosine": 0.78,
    "sim_ann_lsh": 1.392, "ml_kmeans": 3.553, "text_token_stats": 0.284,
    "text_chunking": 0.677, "stream_session_windows": 1.246,
    "enc_roundtrip_agg": 0.983,
}
BENCH_R02_SHARED = {
    "q1_pricing_summary": 2.952, "q3_star_join_revenue": 6.012,
    "q7_top3_orders_per_customer": 1.85, "q8_running_qty_per_supplier": 2.633,
    "q23_asof_join": 2.931, "dedup_near_minhash_lsh": 5.567,
    "dedup_cluster_components": 8.665, "sim_topk_cosine": 1.042,
    "sim_ann_lsh": 2.113, "ml_kmeans": 5.277, "text_token_stats": 0.42,
    "text_chunking": 1.222, "stream_session_windows": 2.398,
    "enc_roundtrip_agg": 1.85,
}


def run_list(queries, names, sf_dir) -> dict[str, float]:
    t: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        queries[name](spark_holder[0], sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        t[name] = time.perf_counter() - t0
    return t


spark_holder = []


def main() -> None:
    n_reps = int(os.environ.get("BISECT_REPS", "5"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark_holder.append(get_spark(app_name="bench_bisect"))
    queries = all_queries()

    # warm-up (JVM/codegen/session init)
    run_list(queries, R1_LIST, sf_dir)

    runs_r1: list[dict[str, float]] = []
    runs_full: list[dict[str, float]] = []
    for i in range(n_reps):
        runs_r1.append(run_list(queries, R1_LIST, sf_dir))
        runs_full.append(run_list(queries, HEADLINE, sf_dir))
        print(
            f"rep {i + 1}/{n_reps}: r1-list "
            f"{sum(runs_r1[-1].values()):.1f}s, full "
            f"{sum(runs_full[-1].values()):.1f}s",
            flush=True,
        )

    med_r1 = {n: statistics.median(r[n] for r in runs_r1) for n in R1_LIST}
    med_full_shared = {
        n: statistics.median(r[n] for r in runs_full) for n in R1_LIST
    }
    tot_r1 = sum(med_r1.values())
    tot_full_shared = sum(med_full_shared.values())

    result = {
        "n_reps": n_reps,
        "sf_dir": sf_dir,
        "shared_set_median_total_in_14q_phase": round(tot_r1, 3),
        "shared_set_median_total_in_24q_phase": round(tot_full_shared, 3),
        "bench_r01_shared_total": round(sum(BENCH_R01.values()), 3),
        "bench_r02_shared_total": round(sum(BENCH_R02_SHARED.values()), 3),
        "per_query": {
            n: {
                "median_14q_phase": round(med_r1[n], 3),
                "median_24q_phase": round(med_full_shared[n], 3),
                "driver_r01": BENCH_R01[n],
                "driver_r02": BENCH_R02_SHARED[n],
            }
            for n in R1_LIST
        },
        "raw_totals_per_rep": {
            "r1_list": [round(sum(r.values()), 3) for r in runs_r1],
            "full_list": [round(sum(r.values()), 3) for r in runs_full],
        },
    }
    ratio = tot_full_shared / tot_r1 if tot_r1 else None
    result["ratio_24q_over_14q_phase"] = round(ratio, 3) if ratio else None
    verdict = (
        "H1: list size reproduces the slowdown"
        if ratio and ratio > 1.25
        else (
            "H2: plans regressed locally regardless of phase"
            if tot_r1 > 1.25 * sum(BENCH_R01.values())
            else "H3: neither list size nor code reproduces the r2 driver "
            "slowdown locally -> environmental (driver-machine) variance"
        )
    )
    result["conclusion"] = verdict
    out = Path(__file__).with_name("bench_bisect_result.json")
    out.write_text(json.dumps(result, indent=1))
    print(json.dumps({k: result[k] for k in (
        "shared_set_median_total_in_14q_phase",
        "shared_set_median_total_in_24q_phase",
        "bench_r01_shared_total",
        "bench_r02_shared_total",
        "ratio_24q_over_14q_phase",
        "conclusion",
    )}, indent=1))


if __name__ == "__main__":
    main()
