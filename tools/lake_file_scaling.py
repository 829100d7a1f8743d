"""Lake-lifecycle FILE-COUNT scaling battery (round-10, VERDICT item 5).

battery12 measured the lake clone/evolution tier only against ROW
scaling (and the staged lakes hold file count constant at
2*_FILES_PER_COMMIT = 8). This tool stages the same sf0.1 orders rows
across 4 / 16 / 64 files and times the read paths whose cost could hide
an O(files) driver stage:

- clone_shallow itself (manifest-only; must be ~flat — it writes
  O(files) JSON, no data I/O)
- the clone's full-scan aggregate read (the lake_clone_shallow gated
  read; linear in DATA, ~flat in file count at fixed data)
- the schema-evolution audit's per-version merged read + NULL
  accounting (the lake_schema_evolution_audit read path)
- the plain manifest-driven read (LakeTable.read + count)

Reading the output: time ratios across the file-count column at FIXED
rows should stay near 1x (small per-file constants are fine); anything
tracking the file count linearly with a large constant flags a
per-file driver loop on the read path.

Usage: python tools/lake_file_scaling.py [--json OUT]
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from project_final_parquet_spark.lake.table import LakeTable
from project_final_parquet_spark.session import get_spark
from project_final_parquet_spark.tables import load

SRC_SF = "/root/testdata/sf0.1"
ROOT = Path("/tmp/spark_graft_scale/lake_files")
_CUTOFF = "1995-06-01 00:00:00"
_EVO_BASE = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
             "o_orderdate"]


def stage(spark, files_per_commit: int) -> LakeTable:
    root = ROOT / f"evo_f{files_per_commit}"
    table = LakeTable(root)
    if table.current_version == 2:
        return table
    if root.exists():
        shutil.rmtree(root)
    orders = load(spark, SRC_SF, "orders")
    cutoff = F.lit(_CUTOFF).cast("timestamp_ntz")
    table.commit_append(
        orders.filter(F.col("o_orderdate") < cutoff).select(*_EVO_BASE),
        stats_cols=("o_orderdate",),
        num_files=files_per_commit,
        range_by="o_orderdate",
    )
    table.commit_append(
        orders.filter(F.col("o_orderdate") >= cutoff),
        stats_cols=("o_orderdate",),
        num_files=files_per_commit,
        range_by="o_orderdate",
    )
    return table


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    spark = get_spark(app_name="lake_file_scaling")
    results: dict[str, dict[str, float]] = {}
    for fpc in (2, 8, 32):
        table = stage(spark, fpc)
        label = f"files={2 * fpc}"
        clone_root = ROOT / f"clone_f{fpc}"
        if clone_root.exists():
            shutil.rmtree(clone_root)
        r: dict[str, float] = {}
        r["clone_op"] = timed(lambda: table.clone_shallow(clone_root))
        clone = LakeTable(clone_root)
        r["clone_read_agg"] = timed(
            lambda: clone.read(spark)
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)), F.sum("o_totalprice"))
            .write.format("noop").mode("overwrite").save()
        )
        def evo_audit():
            for v in table.versions():
                added = [e for e in table.manifest(v) if e.added == v]
                scan = spark.read.option("mergeSchema", "true").parquet(
                    *[e.path for e in added]
                )
                if "o_orderpriority" in scan.columns:
                    scan.filter(F.col("o_orderpriority").isNull()).count()
                else:
                    scan.count()
        r["evo_audit_read"] = timed(evo_audit)
        r["plain_read_count"] = timed(lambda: table.read(spark).count())
        results[label] = r

    cols = ["clone_op", "clone_read_agg", "evo_audit_read",
            "plain_read_count"]
    print(f"{'':>10s} " + " ".join(f"{c:>16s}" for c in cols))
    for label, r in results.items():
        print(f"{label:>10s} " + " ".join(f"{r[c]:16.3f}" for c in cols))
    if "--json" in sys.argv:
        out = sys.argv[sys.argv.index("--json") + 1]
        Path(out).write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
