"""Stream-stream and stream-static joins under Structured Streaming."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from project_final_parquet_spark.tables import load


def _stage(spark, rows, schema):
    path = tempfile.mkdtemp(prefix="ssj_")
    df = spark.createDataFrame(rows, schema)
    if "ts" in df.columns:
        df = df.withColumn("ts", F.to_timestamp("ts"))
    df.write.mode("append").parquet(path)
    return path


def _read_stream(spark, path, schema):
    return (
        spark.readStream.schema(schema.replace("ts string", "ts timestamp"))
        .parquet(path)
    )


def test_stream_static_join(spark, sf_dir):
    """Streaming events enriched against a static dimension — the common
    fact-stream × dim pattern (dim is broadcast per micro-batch)."""
    ev = _stage(
        spark,
        [(1, "2024-01-01 10:00:00", 3), (2, "2024-01-01 10:01:00", 7)],
        "event_id long, ts string, nationkey int",
    )
    stream = _read_stream(spark, ev, "event_id long, ts timestamp, nationkey int")
    nation = load(spark, sf_dir, "nation")
    joined = stream.join(nation, stream.nationkey == nation.n_nationkey).select(
        "event_id", "n_name"
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_static")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.event_id, r.n_name)
            for r in spark.sql("SELECT * FROM ssj_static").collect()
        }
    finally:
        q.stop()
    assert got == {(1, "NATION_3"), (2, "NATION_7")}


def test_stream_stream_join_with_watermarks(spark):
    """Stream-stream inner join bounded by watermarks + time constraint:
    impressions joined to clicks within 10 minutes."""
    imp_path = _stage(
        spark,
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 10:05:00"),
         (3, "2024-01-01 11:00:00")],
        "ad_id long, ts string",
    )
    clk_path = _stage(
        spark,
        [(1, "2024-01-01 10:04:00"),   # within 10 min of impression 1
         (2, "2024-01-01 10:45:00"),   # too late for impression 2
         (3, "2024-01-01 11:01:00")],  # within 10 min of impression 3
        "ad_id long, ts string",
    )
    imp = (
        _read_stream(spark, imp_path, "ad_id long, ts timestamp")
        .withColumnRenamed("ts", "imp_ts")
        .withWatermark("imp_ts", "20 minutes")
    )
    clk = (
        _read_stream(spark, clk_path, "ad_id long, ts timestamp")
        .withColumnRenamed("ad_id", "c_ad_id")
        .withColumnRenamed("ts", "clk_ts")
        .withWatermark("clk_ts", "20 minutes")
    )
    joined = imp.join(
        clk,
        (imp.ad_id == clk.c_ad_id)
        & (clk.clk_ts >= imp.imp_ts)
        & (clk.clk_ts <= imp.imp_ts + F.expr("INTERVAL 10 MINUTES")),
    ).select("ad_id")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_ss")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(r.ad_id for r in spark.sql("SELECT * FROM ssj_ss").collect())
    finally:
        q.stop()
    assert got == [1, 3]  # impression 2's click fell outside the window
