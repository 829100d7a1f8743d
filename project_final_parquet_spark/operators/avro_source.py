"""Avro container connector as a Python Data Source (``avrolite``).

This Spark build ships without the external ``spark-avro`` module, so
the Avro Object Container File format (a PUBLIC spec: magic ``Obj\\x01``,
metadata map carrying ``avro.schema``/``avro.codec``, 16-byte sync
marker, then blocks of ``<count, byte-len, payload, sync>`` with
zigzag-varint binary encoding) is implemented here from the spec,
pure-Python, behind the same Data Source API as the reffile connector
(`reffile_source.py`) — ``spark.read.format("avrolite")`` and
``spark.readStream.format("avrolite")``. Closes the one SURVEY §2
connector row the environment previously blocked; the reference itself
has no connectors at all (src/parquet_writer.cpp:43 — its only format
is its own encrypted columnar file).

Scope: the type surface our corpus needs — null/boolean/int/long/
float/double/bytes/string, records, arrays, maps, and ``[null, T]``
unions; ``null`` and ``deflate`` codecs. Everything executor-side is
factory-local so cloudpickle ships it by value (the round-4
vanilla-session lesson — a driver-side sys.path hack does not reach
data-source worker processes).

Scale: one InputPartition per Avro BLOCK — the sync-marker layout is
exactly what makes Avro splittable, and ``index_avro_blocks`` walks
block headers with seeks (no payload decompression), so a huge
many-block file scans as wide as its block count, and a directory of
files scans file×block wide. Per-partition decode streams one block.
The streaming form tracks a sorted-file-count offset (file-arrival
semantics, replayable ranges), mirroring the reffile connector.
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
    (read_container, write_container, index_blocks, read_block).
    Factory-local for by-value pickling into data-source workers."""

    import io as _io
    import json as _json
    import struct as _struct
    import zlib as _zlib

    # --- binary primitives (Avro spec: zigzag varint longs) ---------------

    def _read_long(buf) -> int:
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

    def _read_bytes(buf) -> bytes:
        n = _read_long(buf)
        if n < 0:
            raise ValueError(f"negative byte-length {n}")
        data = buf.read(n)
        if len(data) != n:
            raise ValueError("EOF inside bytes")
        return data

    # --- schema-driven value decode/encode ---------------------------------

    def _decode(schema, buf):
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

    def _read_header(f):
        """Parse magic + metadata map + sync from an open binary file;
        leaves the handle positioned at the first block."""
        if f.read(4) != _MAGIC:
            raise ValueError("not an Avro object container file")
        meta = {}
        while True:
            n = _read_long(f)
            if n == 0:
                break
            if n < 0:
                n = -n
                _read_long(f)
            for _ in range(n):
                k = _read_bytes(f).decode()
                meta[k] = _read_bytes(f)
        schema = _json.loads(meta["avro.schema"].decode())
        codec = meta.get("avro.codec", b"null").decode()
        if codec not in ("null", "deflate"):
            raise ValueError(f"unsupported codec {codec!r}")
        sync = f.read(16)
        if len(sync) != 16:
            raise ValueError("EOF at sync marker")
        return schema, codec, sync

    def _decode_block(f, schema, codec, sync) -> list:
        count = _read_long(f)
        payload = _read_bytes(f)
        if codec == "deflate":
            payload = _zlib.decompress(payload, -15)
        block = _io.BytesIO(payload)
        rows = [_decode(schema, block) for _ in range(count)]
        if f.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
        return rows

    def _at_eof(f) -> bool:
        probe = f.read(1)
        if not probe:
            return True
        f.seek(-1, 1)
        return False

    def read_container(path: str):
        """Avro OCF → (schema dict, list of row dicts)."""
        with open(path, "rb") as f:
            schema, codec, sync = _read_header(f)
            rows = []
            while not _at_eof(f):
                rows.extend(_decode_block(f, schema, codec, sync))
            return schema, rows

    def index_blocks(path: str) -> list[tuple[int, int]]:
        """[(byte_offset, row_count)] per block — the split index. Walks
        block headers with seeks only (payloads never decompressed), so
        indexing a huge file costs one header read + one tiny seek per
        block: this is what makes Avro scan block-parallel."""
        with open(path, "rb") as f:
            _read_header(f)
            out = []
            while not _at_eof(f):
                pos = f.tell()
                count = _read_long(f)
                size = _read_long(f)
                if count < 0 or size < 0:
                    raise ValueError("negative block header")
                f.seek(size, 1)
                if len(f.read(16)) != 16:
                    raise ValueError("EOF inside block")
                out.append((pos, count))
            return out

    def read_block(path: str, offset: int):
        """(schema, rows) for the single block at ``offset`` — the
        per-partition scan path."""
        with open(path, "rb") as f:
            schema, codec, sync = _read_header(f)
            f.seek(offset)
            return schema, _decode_block(f, schema, codec, sync)

    def read_schema(path: str) -> dict:
        """Header-only read: the embedded writer schema."""
        with open(path, "rb") as f:
            return _read_header(f)[0]

    def write_container(
        path: str,
        schema: dict,
        rows: list[dict],
        codec: str = "deflate",
        rows_per_block: int | None = None,
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
        step = rows_per_block or max(1, len(rows))
        for i in range(0, len(rows), step):
            chunk = rows[i : i + step]
            body = bytearray()
            for r in chunk:
                _encode(schema, r, body)
            payload = bytes(body)
            if codec == "deflate":
                c = _zlib.compressobj(9, _zlib.DEFLATED, -15)
                payload = c.compress(payload) + c.flush()
            _write_long(out, len(chunk))
            _write_long(out, len(payload))
            out.extend(payload)
            out.extend(sync)
        with open(path, "wb") as f:
            f.write(bytes(out))

    return read_container, write_container, index_blocks, read_block, read_schema


(
    read_avro_container,
    write_avro_container,
    index_avro_blocks,
    read_avro_block,
    read_avro_schema,
) = make_avro_codec()


def make_avrolite_datasource():
    """DataSource class with factory-local deps (by-value pickling)."""

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    import os as _os

    (
        _read_container,
        _,
        _index_blocks,
        _read_block,
        _read_schema,
    ) = make_avro_codec()

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
            # one partition per BLOCK: sync markers make Avro
            # splittable, and the index walk never decompresses —
            # a many-block file scans as wide as its block count
            return [
                InputPartition((p, off))
                for p in _paths(self.options["path"])
                for off, _cnt in _index_blocks(p)
            ]

        def read(self, partition):
            path, off = partition.value
            _, rows = _read_block(path, off)
            for r in rows:
                yield tuple(r.get(f) for f in self.fields)

    class AvroLiteStreamReader(SimpleDataSourceStreamReader):
        """File-arrival streaming, mirroring the reffile connector:
        the offset is the count of (sorted) ``.avro`` files consumed;
        ranges replay deterministically for recovery."""

        def __init__(self, options: dict, fields: list[str]):
            self.options = dict(options)
            self.fields = fields

        def initialOffset(self) -> dict:
            return {"idx": 0}

        def _rows(self, paths: list[str]):
            # LIST iterator, not a generator: the prefetch cache
            # copy.copy()s iterators, which generators cannot survive
            out = []
            for p in paths:
                _, rows = _read_container(p)
                out.extend(
                    tuple(r.get(f) for f in self.fields) for r in rows
                )
            return iter(out)

        def read(self, start: dict):
            paths = _paths(self.options["path"])
            return self._rows(paths[start["idx"] :]), {"idx": len(paths)}

        def readBetweenOffsets(self, start: dict, end: dict):
            paths = _paths(self.options["path"])
            return self._rows(paths[start["idx"] : end["idx"]])

    class AvroLiteDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "avrolite"

        def schema(self):
            # header-only read of the first file's embedded writer schema
            avro_schema = _read_schema(_paths(self.options["path"])[0])
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

        def simpleStreamReader(self, schema: StructType):
            return AvroLiteStreamReader(
                self.options, [f.name for f in schema.fields]
            )

    return AvroLiteDataSource


AvroLiteDataSource = make_avrolite_datasource()


# --- driver-gate query ------------------------------------------------------

_SHARDS = 4
_KEY_LIMIT = 200


def staged_avro_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage customer (c_custkey < 200) as 4 Avro container files
    sharded by custkey % 4 (deflate codec, multi-block), once per sf."""
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
                rows_per_block=16,  # multi-block: exercises the split index
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
    ``spark.read.format("avrolite")`` — one partition per BLOCK — then
    aggregate in plain DataFrame code, matching the same aggregate
    computed from the parquet corpus. Closes the SURVEY §2 connector
    row this Spark build's missing spark-avro module left open.

    Scale: partition-per-block via the seek-only split index (Avro's
    sync-marker splittability); decode is executor-side streaming,
    double values transported bit-exactly."""
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
