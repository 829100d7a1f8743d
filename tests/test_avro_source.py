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
    _SHARDS,
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


def test_spark_scan_matches_parquet(spark, sf_dir):
    """The connector's scan must agree row-for-row with the parquet
    ground truth, scan one-partition-per-file, and infer its schema
    from the embedded writer schema (no user schema supplied)."""
    from pyspark.sql import functions as F

    root = staged_avro_dir(spark, sf_dir)
    spark.dataSource.register(AvroLiteDataSource)
    df = spark.read.format("avrolite").load(root)
    assert df.rdd.getNumPartitions() == _SHARDS
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
