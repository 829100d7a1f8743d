"""Avro OCF connector (avrolite): spec-faithful codec + Spark scan.

Parity target: the Avro 1.x Object Container File spec (public) — the
binary encoding (zigzag varints, length-prefixed bytes/strings), the
container layout (magic, metadata map, sync-marker-delimited deflate
blocks). The reference has no connectors (src/parquet_writer.cpp:43);
this closes the SURVEY §2 Avro row the missing spark-avro module left
open.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from project_final_parquet_spark.operators.avro_source import (
    AvroLiteDataSource,
    index_avro_blocks,
    read_avro_block,
    read_avro_container,
    staged_avro_dir,
    write_avro_container,
)

_SCHEMA = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "x", "type": "double"},
        {"name": "maybe", "type": ["null", "string"]},
    ],
}

_row = st.fixed_dictionaries(
    {
        "k": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "s": st.text(max_size=40),
        "x": st.floats(allow_nan=False),
        "maybe": st.one_of(st.none(), st.text(max_size=10)),
    }
)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_row, max_size=20), codec=st.sampled_from(["null", "deflate"]))
def test_container_roundtrip(rows, codec, tmp_path):
    """Arbitrary rows (full int64 range — zigzag varint edges, unicode,
    null union branches, subnormal doubles) round-trip bit-exactly
    through the container, both codecs."""
    p = str(tmp_path / "t.avro")
    write_avro_container(p, _SCHEMA, rows, codec=codec)
    schema, got = read_avro_container(p)
    assert schema == _SCHEMA
    assert got == rows


def test_corrupt_sync_marker_raises(tmp_path):
    p = str(tmp_path / "t.avro")
    write_avro_container(p, _SCHEMA, [{"k": 1, "s": "a", "x": 0.5, "maybe": None}])
    data = bytearray(open(p, "rb").read())
    data[-1] ^= 0xFF  # trailing sync byte
    open(p, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="sync marker"):
        read_avro_container(p)


def test_not_avro_raises(tmp_path):
    p = tmp_path / "junk.avro"
    p.write_bytes(b"PAR1 definitely not avro")
    with pytest.raises(ValueError, match="not an Avro"):
        read_avro_container(str(p))


def test_block_index_and_block_reads(tmp_path):
    """The split index walks block headers seek-only and every block
    reads back independently — the property that makes a huge Avro
    file scan block-parallel."""
    rows = [
        {"k": i, "s": f"s{i}", "x": i * 0.5, "maybe": None} for i in range(57)
    ]
    p = str(tmp_path / "blocks.avro")
    write_avro_container(p, _SCHEMA, rows, rows_per_block=10)
    blocks = index_avro_blocks(p)
    assert [cnt for _, cnt in blocks] == [10, 10, 10, 10, 10, 7]
    reassembled = []
    for off, _cnt in blocks:
        _, br = read_avro_block(p, off)
        reassembled.extend(br)
    assert reassembled == rows


def test_spark_scan_matches_parquet(spark, sf_dir):
    """The connector's scan must agree row-for-row with the parquet
    ground truth, scan one-partition-per-BLOCK, and infer its schema
    from the embedded writer schema (no user schema supplied)."""
    import os

    from pyspark.sql import functions as F

    root = staged_avro_dir(spark, sf_dir)
    spark.dataSource.register(AvroLiteDataSource)
    df = spark.read.format("avrolite").load(root)
    files = sorted(
        os.path.join(root, p) for p in os.listdir(root) if p.endswith(".avro")
    )
    n_blocks = sum(len(index_avro_blocks(p)) for p in files)
    assert n_blocks > len(files)  # multi-block fixture
    assert df.rdd.getNumPartitions() == n_blocks
    assert [f.name for f in df.schema.fields] == [
        "c_custkey",
        "c_name",
        "c_mktsegment",
        "c_acctbal",
    ]
    direct = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_custkey") < 200)
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    )
    got = sorted(map(tuple, df.collect()))
    exp = sorted(map(tuple, direct.collect()))
    assert got == exp and len(got) > 0


def test_streaming_matches_batch(spark, sf_dir, tmp_path):
    """readStream over the Avro directory (availableNow) produces
    exactly the batch read's rows — the repo's stream ≡ batch proof
    pattern, applied to the second custom connector."""
    root = staged_avro_dir(spark, sf_dir)
    spark.dataSource.register(AvroLiteDataSource)
    batch = sorted(
        map(tuple, spark.read.format("avrolite").load(root).collect())
    )
    q = (
        spark.readStream.format("avrolite")
        .load(root)
        .writeStream.format("memory")
        .queryName("avro_stream_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM avro_stream_sink").collect())
    )
    assert got == batch and len(got) > 0
