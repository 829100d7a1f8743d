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
