"""Engine-utility tests: df.observe() metrics (monitoring hooks that
piggyback on a query with zero extra passes) and small-file compaction
(the file-size hygiene every long-lived 100 TB table needs)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F
from pyspark.sql.observation import Observation

from project_final_parquet_spark.tables import load


def test_observe_metrics_piggyback(spark, sf_dir):
    """Observed metrics must match a separate aggregation, computed in
    the SAME job as the consuming action (no second scan)."""
    li = load(spark, sf_dir, "lineitem")
    obs = Observation("li_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(38,10)"))
        .cast("double")
        .alias("sum_qty"),
    )
    out_rows = observed.filter(F.col("l_quantity") >= 45).count()
    got = obs.get
    exp = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(38,10)"))
        .cast("double")
        .alias("sum_qty"),
    ).head()
    assert got["n_rows"] == exp.n_rows
    assert got["sum_qty"] == exp.sum_qty
    assert 0 < out_rows < exp.n_rows


def test_compaction_controls_file_sizes(spark, sf_dir, tmp_path):
    """Fragmented write (many small files) → compacted rewrite: one
    coalesced file, same rows; and maxRecordsPerFile caps the other
    direction (splitting an oversized partition)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    n = li.count()

    frag_dir = str(tmp_path / "fragmented")
    li.repartition(16).write.parquet(frag_dir)
    assert len(glob.glob(f"{frag_dir}/*.parquet")) == 16

    compact_dir = str(tmp_path / "compacted")
    spark.read.parquet(frag_dir).coalesce(1).write.parquet(compact_dir)
    files = glob.glob(f"{compact_dir}/*.parquet")
    assert len(files) == 1
    assert spark.read.parquet(compact_dir).count() == n

    split_dir = str(tmp_path / "split")
    cap = max(n // 4, 1)
    spark.read.parquet(compact_dir).coalesce(1).write.option(
        "maxRecordsPerFile", cap
    ).parquet(split_dir)
    split_files = glob.glob(f"{split_dir}/*.parquet")
    assert len(split_files) >= 4
    assert spark.read.parquet(split_dir).count() == n
