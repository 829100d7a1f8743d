"""foreachBatch sink: idempotent (exactly-once-style) writes keyed by
batch epoch — the pattern for transactional sinks Spark doesn't ship."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F


def test_foreachbatch_idempotent_epoch_writes(spark):
    src = tempfile.mkdtemp(prefix="feb_src_")
    out = tempfile.mkdtemp(prefix="feb_out_")
    ckpt = tempfile.mkdtemp(prefix="feb_ckpt_")

    spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "id long, v double"
    ).write.mode("append").parquet(src)

    written_epochs = []

    def sink(batch_df, epoch_id):
        # idempotence: one directory per epoch; reprocessing an epoch
        # overwrites instead of duplicating
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out, f"epoch={epoch_id}")
        )
        written_epochs.append(epoch_id)

    q = (
        spark.readStream.schema("id long, v double")
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # second file → second epoch
        spark.createDataFrame([(3, 30.0)], "id long, v double").write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    assert len(written_epochs) >= 2
    back = spark.read.parquet(out)
    assert sorted(r.id for r in back.collect()) == [1, 2, 3]
    # epoch partition column present => replayable/idempotent layout
    assert "epoch" in back.columns
