"""Stream-static enrichment: the streaming form of
``stream_static_enrich`` (readStream events × broadcast static dim)
must match the batch form exactly, and the z-order layout operator's
locality guarantee must hold."""

from __future__ import annotations

from project_final_parquet_spark.operators.layout import layout_zorder_stats
from project_final_parquet_spark.streaming.events import (
    _nation_dims,
    _with_event_time,
    static_enrich,
)
from project_final_parquet_spark.tables import load

from test_streaming import _event_stream, _run_to_completion, _rows


def test_stream_static_enrich_batch_equivalence(spark, sf_dir):
    dims = _nation_dims(spark, sf_dir)  # static side: plain batch frame
    stream = static_enrich(
        _event_stream(spark, sf_dir).withWatermark("ts", "10 minutes"), dims
    )
    _run_to_completion(stream, "t_enrich")
    got = spark.sql("SELECT * FROM t_enrich")
    exp = static_enrich(_with_event_time(load(spark, sf_dir, "events")), dims)
    assert _rows(got) == _rows(exp)
    assert len(_rows(got)) > 0


def test_zorder_bucket_locality(spark, sf_dir):
    """Each Z-bucket (high byte of the 16-bit Morton code) pins the top
    4 bits of BOTH 8-bit coordinates, so every bucket's span in each
    dimension is at most 16 consecutive values — the two-dimensional
    skipping guarantee."""
    rows = layout_zorder_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.zbucket < 256
        assert r.pk_max - r.pk_min <= 15
        assert r.sk_max - r.sk_min <= 15
