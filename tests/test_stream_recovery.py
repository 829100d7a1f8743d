"""Streaming checkpoint recovery: a stopped query restarted against the
SAME checkpoint must resume exactly-once — already-processed input is
not recounted, new input is picked up. This is the fault-tolerance
contract a 100 TB streaming job relies on (executor/driver loss ⇒
restart from checkpointed offsets + state store)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _agg(stream_df):
    return (
        stream_df.withColumn(
            "ts",
            F.timestamp_micros(
                F.expr(
                    "timestampdiff(MICROSECOND,"
                    " timestamp_ntz'1970-01-01 00:00:00', ts)"
                )
            ),
        )
        .withWatermark("ts", "10 minutes")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,10)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


def test_checkpoint_restart_is_exactly_once(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    full = spark.read.schema(_SCHEMA).parquet(f"{sf_dir}/events.parquet")
    half1 = full.filter("event_id % 2 = 0")
    half2 = full.filter("event_id % 2 = 1")
    half1.write.parquet(f"{src}/batch1")
    # FileStreamSource watches one directory tree; stage batch 1 only
    first_dir = str(tmp_path / "in")
    os.makedirs(first_dir)
    for f in os.listdir(f"{src}/batch1"):
        if f.endswith(".parquet"):
            shutil.copy(f"{src}/batch1/{f}", f"{first_dir}/b1_{f}")

    def run_once(name):
        q = (
            _agg(spark.readStream.schema(_SCHEMA).parquet(first_dir))
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            r.event_type: (r.n, r.sum_value)
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }

    got1 = run_once("t_recovery_a")
    exp1 = {
        r.event_type: (r.n, r.sum_value) for r in _agg(half1).collect()
    }
    assert got1 == exp1

    # add the second half, restart from the SAME checkpoint
    half2.write.parquet(f"{src}/batch2")
    for f in os.listdir(f"{src}/batch2"):
        if f.endswith(".parquet"):
            shutil.copy(f"{src}/batch2/{f}", f"{first_dir}/b2_{f}")

    got2 = run_once("t_recovery_b")
    exp_full = {
        r.event_type: (r.n, r.sum_value) for r in _agg(full).collect()
    }
    # exactly-once: totals equal one full pass — batch-1 rows were NOT
    # double-counted on restart, batch-2 rows were picked up
    assert got2 == exp_full


_RESTART_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
q = (
    spark.readStream.schema(
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string"
    )
    .parquet({in_dir!r})
    .select("event_id", "event_type", "value")
    .writeStream.format("parquet")
    .option("path", {out_dir!r})
    .option("checkpointLocation", {ckpt!r})
    .trigger(availableNow=True)
    .start()
)
q.awaitTermination(180)
spark.stop()
"""


def test_checkpoint_restart_across_real_sessions(spark, sf_dir, tmp_path):
    """REAL restart: a fresh JVM/driver process resumes the checkpoint —
    the actual cluster failure mode (driver loss), not an in-session
    re-start. Process 1 streams batch 1 to a parquet sink and exits;
    batch 2 lands; process 2 resumes from the SAME checkpoint and sink.
    Exactly-once = the sink holds each event_id exactly once."""
    import subprocess
    import sys
    from pathlib import Path

    repo = str(Path(__file__).resolve().parent.parent)
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    full = spark.read.schema(_SCHEMA).parquet(f"{sf_dir}/events.parquet")
    for tag, half in (
        ("b1", full.filter("event_id % 2 = 0")),
        ("b2", full.filter("event_id % 2 = 1")),
    ):
        staged = str(tmp_path / f"staged_{tag}")
        half.write.parquet(staged)
        if tag == "b1":  # batch 2 lands between the two processes
            for f in os.listdir(staged):
                if f.endswith(".parquet"):
                    shutil.copy(f"{staged}/{f}", f"{in_dir}/{tag}_{f}")

    def run_proc():
        script = _RESTART_SCRIPT.format(
            repo=repo, in_dir=in_dir, out_dir=out_dir, ckpt=ckpt
        )
        res = subprocess.run(
            [sys.executable, "-c", script],
            capture_output=True,
            text=True,
            timeout=300,
        )
        assert res.returncode == 0, res.stderr[-2000:]

    run_proc()
    staged = str(tmp_path / "staged_b2")
    for f in os.listdir(staged):
        if f.endswith(".parquet"):
            shutil.copy(f"{staged}/{f}", f"{in_dir}/b2_{f}")
    run_proc()

    sunk = spark.read.parquet(out_dir)
    n_total = full.count()
    assert sunk.count() == n_total  # no duplicates across the restart
    assert sunk.select("event_id").distinct().count() == n_total
