"""Watermark semantics under incremental batches: append-mode windowed
aggregation must finalize windows once the watermark passes, and drop
late rows that arrive behind it."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.mode("append").parquet(path)


def test_late_rows_behind_watermark_are_dropped(spark):
    src = tempfile.mkdtemp(prefix="wm_src_")
    sink = "wm_out"
    ckpt = tempfile.mkdtemp(prefix="wm_ckpt_")

    # batch 1: three events in the 10:00 window, one at 12:00 that pushes
    # the watermark (12:00 - 30min = 11:30) far past the 10:00 window end
    _write_batch(
        spark,
        src,
        [
            (1, "2024-01-01 10:05:00", 1.0),
            (2, "2024-01-01 10:20:00", 2.0),
            (3, "2024-01-01 10:40:00", 4.0),
            (4, "2024-01-01 12:00:00", 8.0),
        ],
    )

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .parquet(src)
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .select(F.unix_micros(F.col("w.start")).alias("ws"), "n", "v")
    )
    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("memory")
        .queryName(sink)
        .start()
    )
    try:
        q.processAllAvailable()
        first = {r.ws: (r.n, r.v) for r in spark.sql(f"SELECT * FROM {sink}").collect()}
        ten_am = 1704103200000000  # 2024-01-01T10:00:00Z in epoch micros
        assert first[ten_am] == (3, 7.0)  # window finalized by the watermark

        # batch 2: one LATE row into the closed 10:00 window (behind the
        # watermark => dropped) and one on-time row at 12:10
        _write_batch(
            spark,
            src,
            [
                (5, "2024-01-01 10:50:00", 100.0),  # late — must be dropped
                (6, "2024-01-01 12:10:00", 16.0),
            ],
        )
        q.processAllAvailable()
        # collect ROWS (not a dict) so duplicate emissions are visible
        after_rows = [
            (r.ws, r.n, r.v) for r in spark.sql(f"SELECT * FROM {sink}").collect()
        ]
        ten_am_rows = [t for t in after_rows if t[0] == ten_am]
        # the finalized 10:00 window was NOT re-emitted or amended
        assert ten_am_rows == [(ten_am, 3, 7.0)]
    finally:
        q.stop()
