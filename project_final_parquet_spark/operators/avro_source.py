"""Avro container connector as a Python Data Source (``avrolite``).

This Spark build ships without the external ``spark-avro`` module, so
the Avro Object Container File format (a PUBLIC spec: magic ``Obj\\x01``,
metadata map carrying ``avro.schema``/``avro.codec``, 16-byte sync
marker, then blocks of ``<count, byte-len, payload, sync>`` with
zigzag-varint binary encoding) is implemented here from the spec,
pure-Python, behind the same Data Source API as the reffile connector
(`reffile_source.py`) — ``spark.read.format("avrolite")``. Closes the
one SURVEY §2 connector row the environment previously blocked; the
reference itself has no connectors at all (src/parquet_writer.cpp:43 —
its only format is its own encrypted columnar file).

Scope: the type surface our corpus needs — null/boolean/int/long/
float/double/bytes/string, records, arrays, maps, and ``[null, T]``
unions; ``null`` and ``deflate`` codecs. Everything executor-side is
factory-local so cloudpickle ships it by value (the round-4
vanilla-session lesson — a driver-side sys.path hack does not reach
data-source worker processes).

Scale: one InputPartition per Avro BLOCK-run (per file here; files are
block-splittable by scanning for the sync marker, which is the
documented upgrade for huge single files). Decode is per-partition
streaming — no driver round-trip, no whole-file JVM copy.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

_MAGIC = b"Obj\x01"


def make_avro_codec():
    """Pure-python Avro binary codec (spec-faithful): returns
    (read_container, write_container). Factory-local for by-value
    pickling into data-source workers."""

    import io as _io
    import json as _json
    import struct as _struct
    import zlib as _zlib

    # --- binary primitives (Avro spec: zigzag varint longs) ---------------

    def _read_long(buf: _io.BytesIO) -> int:
        shift, acc = 0, 0
        while True:
            b = buf.read(1)
            if not b:
                raise ValueError("EOF inside varint")
            byte = b[0]
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
            if shift > 70:
                raise ValueError("varint too long")
        return (acc >> 1) ^ -(acc & 1)  # zigzag decode

    def _write_long(out: bytearray, n: int) -> None:
        n = (n << 1) ^ (n >> 63) if n < 0 else n << 1
        while True:
            if n & ~0x7F:
                out.append((n & 0x7F) | 0x80)
                n >>= 7
            else:
                out.append(n)
                return

    def _read_bytes(buf: _io.BytesIO) -> bytes:
        n = _read_long(buf)
        if n < 0:
            raise ValueError(f"negative byte-length {n}")
        data = buf.read(n)
        if len(data) != n:
            raise ValueError("EOF inside bytes")
        return data

    # --- schema-driven value decode/encode ---------------------------------

    def _decode(schema, buf: _io.BytesIO):
        if isinstance(schema, list):  # union: zigzag index picks branch
            idx = _read_long(buf)
            if not 0 <= idx < len(schema):
                raise ValueError(f"union index {idx} out of range")
            return _decode(schema[idx], buf)
        if isinstance(schema, dict):
            t = schema["type"]
            if t == "record":
                return {
                    f["name"]: _decode(f["type"], buf)
                    for f in schema["fields"]
                }
            if t == "array":
                out = []
                while True:
                    n = _read_long(buf)
                    if n == 0:
                        return out
                    if n < 0:  # negative count ⇒ byte-size follows
                        n = -n
                        _read_long(buf)
                    for _ in range(n):
                        out.append(_decode(schema["items"], buf))
            if t == "map":
                out = {}
                while True:
                    n = _read_long(buf)
                    if n == 0:
                        return out
                    if n < 0:
                        n = -n
                        _read_long(buf)
                    for _ in range(n):
                        k = _read_bytes(buf).decode()
                        out[k] = _decode(schema["values"], buf)
            return _decode(t, buf)  # {"type": "long"} primitive wrapper
        if schema == "null":
            return None
        if schema == "boolean":
            b = buf.read(1)
            if not b:
                raise ValueError("EOF at boolean")
            return b[0] == 1
        if schema in ("int", "long"):
            return _read_long(buf)
        if schema == "float":
            return _struct.unpack("<f", buf.read(4))[0]
        if schema == "double":
            return _struct.unpack("<d", buf.read(8))[0]
        if schema == "bytes":
            return _read_bytes(buf)
        if schema == "string":
            return _read_bytes(buf).decode()
        raise ValueError(f"unsupported avro type {schema!r}")

    def _encode(schema, val, out: bytearray) -> None:
        if isinstance(schema, list):
            idx = 0 if val is None else 1
            if schema[0] != "null":
                raise ValueError("writer only handles [null, T] unions")
            _write_long(out, idx)
            if idx:
                _encode(schema[1], val, out)
            return
        if isinstance(schema, dict):
            t = schema["type"]
            if t == "record":
                for f in schema["fields"]:
                    _encode(f["type"], val[f["name"]], out)
                return
            if t == "array":
                if val:
                    _write_long(out, len(val))
                    for v in val:
                        _encode(schema["items"], v, out)
                _write_long(out, 0)
                return
            _encode(t, val, out)
            return
        if schema == "null":
            return
        if schema == "boolean":
            out.append(1 if val else 0)
        elif schema in ("int", "long"):
            _write_long(out, int(val))
        elif schema == "float":
            out.extend(_struct.pack("<f", val))
        elif schema == "double":
            out.extend(_struct.pack("<d", val))
        elif schema == "bytes":
            _write_long(out, len(val))
            out.extend(val)
        elif schema == "string":
            enc = val.encode()
            _write_long(out, len(enc))
            out.extend(enc)
        else:
            raise ValueError(f"unsupported avro type {schema!r}")

    # --- container file layer ----------------------------------------------

    def read_container(path: str):
        """Avro OCF → (schema dict, list of row dicts)."""
        with open(path, "rb") as f:
            buf = _io.BytesIO(f.read())
        if buf.read(4) != _MAGIC:
            raise ValueError("not an Avro object container file")
        meta = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                k = _read_bytes(buf).decode()
                meta[k] = _read_bytes(buf)
        schema = _json.loads(meta["avro.schema"].decode())
        codec = meta.get("avro.codec", b"null").decode()
        if codec not in ("null", "deflate"):
            raise ValueError(f"unsupported codec {codec!r}")
        sync = buf.read(16)
        if len(sync) != 16:
            raise ValueError("EOF at sync marker")
        rows = []
        while True:
            probe = buf.read(1)
            if not probe:
                break
            buf.seek(-1, 1)
            count = _read_long(buf)
            payload = _read_bytes(buf)
            if codec == "deflate":
                payload = _zlib.decompress(payload, -15)
            block = _io.BytesIO(payload)
            for _ in range(count):
                rows.append(_decode(schema, block))
            if buf.read(16) != sync:
                raise ValueError("sync marker mismatch (corrupt block)")
        return schema, rows

    def write_container(
        path: str, schema: dict, rows: list[dict], codec: str = "deflate"
    ) -> None:
        sync = bytes(
            (i * 29 + 7) & 0xFF for i in range(16)
        )  # fixed marker: deterministic fixtures
        out = bytearray()
        out.extend(_MAGIC)
        meta = {
            "avro.schema": _json.dumps(schema).encode(),
            "avro.codec": codec.encode(),
        }
        _write_long(out, len(meta))
        for k, v in meta.items():
            ke = k.encode()
            _write_long(out, len(ke))
            out.extend(ke)
            _write_long(out, len(v))
            out.extend(v)
        _write_long(out, 0)
        out.extend(sync)
        body = bytearray()
        for r in rows:
            _encode(schema, r, body)
        payload = bytes(body)
        if codec == "deflate":
            c = _zlib.compressobj(9, _zlib.DEFLATED, -15)
            payload = c.compress(payload) + c.flush()
        _write_long(out, len(rows))
        _write_long(out, len(payload))
        out.extend(payload)
        out.extend(sync)
        with open(path, "wb") as f:
            f.write(bytes(out))

    return read_container, write_container


read_avro_container, write_avro_container = make_avro_codec()


def make_avrolite_datasource():
    """DataSource class with factory-local deps (by-value pickling)."""

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    import json as _json
    import os as _os

    _read_container, _ = make_avro_codec()

    _SPARK_TYPES = {
        "long": LongType,
        "int": LongType,
        "double": DoubleType,
        "string": StringType,
    }

    def _paths(path: str) -> list[str]:
        if _os.path.isdir(path):
            return sorted(
                _os.path.join(path, p)
                for p in _os.listdir(path)
                if p.endswith(".avro")
            )
        return [path]

    class AvroLiteReader(DataSourceReader):
        def __init__(self, options: dict, schema: StructType):
            self.options = dict(options)
            self.fields = [f.name for f in schema.fields]

        def partitions(self):
            return [InputPartition(p) for p in _paths(self.options["path"])]

        def read(self, partition):
            _, rows = _read_container(partition.value)
            for r in rows:
                yield tuple(r.get(f) for f in self.fields)

    class AvroLiteDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "avrolite"

        def schema(self):
            # infer from the first file's embedded writer schema
            first = _paths(self.options["path"])[0]
            avro_schema, _ = _read_container(first)
            fields = []
            for f in avro_schema["fields"]:
                t = f["type"]
                if isinstance(t, list):  # [null, T]
                    t = next(x for x in t if x != "null")
                fields.append(
                    StructField(f["name"], _SPARK_TYPES[t](), True)
                )
            return StructType(fields)

        def reader(self, schema: StructType):
            return AvroLiteReader(self.options, schema)

    return AvroLiteDataSource


AvroLiteDataSource = make_avrolite_datasource()


# --- driver-gate query ------------------------------------------------------

_SHARDS = 4
_KEY_LIMIT = 200


def staged_avro_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage customer (c_custkey < 200) as 4 Avro container files
    sharded by custkey % 4 (deflate codec), once per sf."""
    import tempfile

    root = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_sources",
        os.path.basename(sf_dir.rstrip("/")),
        "avro_ds",
    )
    marker = os.path.join(root, "_SUCCESS")
    if not os.path.exists(marker):
        os.makedirs(root, exist_ok=True)
        schema = {
            "type": "record",
            "name": "customer",
            "fields": [
                {"name": "c_custkey", "type": "long"},
                {"name": "c_name", "type": "string"},
                {"name": "c_mktsegment", "type": "string"},
                {"name": "c_acctbal", "type": "double"},
            ],
        }
        rows = (
            load(spark, sf_dir, "customer")
            .filter(F.col("c_custkey") < _KEY_LIMIT)
            .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
            .collect()  # fixture staging only (≤200 rows), not a query path
        )
        for s in range(_SHARDS):
            write_avro_container(
                os.path.join(root, f"part{s}.avro"),
                schema,
                [r.asDict() for r in rows if r.c_custkey % _SHARDS == s],
            )
        open(marker, "w").close()
    return root


@query(
    "src_avro_datasource",
    oracle=f"""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,10))) AS VARCHAR)
                AS DOUBLE) AS total_bal,
           CAST(MAX(c_custkey) AS BIGINT) AS max_key
    FROM customer WHERE c_custkey < {_KEY_LIMIT}
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def src_avro_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro Object Container File connector parity: customer rows
    round-trip through spec-faithful Avro (zigzag varints, deflate
    blocks, sync markers) and come back through
    ``spark.read.format("avrolite")`` — one partition per file — then
    aggregate in plain DataFrame code, matching the same aggregate
    computed from the parquet corpus. Closes the SURVEY §2 connector
    row this Spark build's missing spark-avro module left open.

    Scale: partition-per-file (Avro files are further block-splittable
    on the sync marker — documented upgrade); decode is executor-side
    streaming over blocks, double values transported bit-exactly."""
    path = staged_avro_dir(spark, sf_dir)
    spark.dataSource.register(AvroLiteDataSource)
    df = spark.read.format("avrolite").load(path)
    return (
        df.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(38,10)"))
            .cast("double")
            .alias("total_bal"),
            F.max("c_custkey").cast("long").alias("max_key"),
        )
        .orderBy("c_mktsegment")
    )
