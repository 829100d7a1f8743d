"""The reference's encrypted columnar file format as a FIRST-CLASS Spark
connector, via the Python Data Source API (new in Spark 4.x):

    spark.dataSource.register(RefFileDataSource)
    spark.read.format("reffile")
         .option("master_key_hex", ...).load("/dir/of/*.ref")

This is the parity capstone for SURVEY.md §2.1 O1-O13: a user of the
reference can point Spark at the reference's OWN files (byte layout per
``encryption/reffile.py`` — [column blobs][AES-GCM footer][u64 length
trailer], reference src/parquet_writer.cpp:165-234) and query them with
the full DataFrame/SQL surface. Decryption runs EXECUTOR-SIDE in pure
Python (``cryptography`` AES-GCM — no SparkSession needed inside the
reader), one partition per file, so a directory of reference files
scans in parallel like any other source.

Key cascade (reference src/parquet_reader.cpp:103-131 semantics):
per-column key wins, else KMS-unwrapped key (the reference's XOR-0xAA
stub contract, ``ReferenceCompatKMS``), else the column is surfaced as
``[ENCRYPTED]`` — masking, not failure, exactly like the reference.
"""

from __future__ import annotations

import json
import os
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StringType, StructField, StructType

from ..registry import query
from ..tables import load

ENCRYPTED_PLACEHOLDER = "[ENCRYPTED]"


# --- pure-python format layer (executor-safe: no SparkSession) -------------


def _aes_gcm_decrypt(blob: bytes, key_hex: str) -> bytes:
    """[12B IV][ct][16B tag] → plaintext (reference crypto_utils.cpp
    layout; cryptography lib takes ct||tag)."""
    from cryptography.hazmat.primitives.ciphers.aead import AESGCM

    return AESGCM(bytes.fromhex(key_hex)).decrypt(blob[:12], blob[12:], None)


def _read_footer(path: str, master_key_hex: str) -> tuple[dict, bytes]:
    with open(path, "rb") as f:
        data = f.read()
    (footer_len,) = struct.unpack("<Q", data[-8:])
    enc_footer = data[-8 - footer_len : -8]
    footer = json.loads(_aes_gcm_decrypt(enc_footer, master_key_hex))
    return footer, data


def _decode_column(plain: str) -> list[str]:
    # "col: value\n" per row (reference src/parquet_reader.cpp:152-159)
    out = []
    for line in plain.split("\n")[:-1]:
        idx = line.find(": ")
        out.append(line[idx + 2 :] if idx >= 0 else "")
    return out


def _kms_unwrap(wrapped_hex: str) -> str:
    # the reference's KMS stub contract: wrap == XOR 0xAA (src/kms.cpp)
    return bytes(b ^ 0xAA for b in bytes.fromhex(wrapped_hex)).hex()


def _resolve_key(entry: dict, opts: dict) -> str | None:
    """Reference read cascade: column key → KMS-unwrapped → None
    (masked)."""
    col_keys = json.loads(opts.get("column_keys", "{}"))
    if entry.get("key_type") == "none":
        return ""  # plaintext blob
    if entry.get("kms_encrypted_key"):
        return _kms_unwrap(entry["kms_encrypted_key"])
    name = entry.get("_col_name")
    if name in col_keys:
        return col_keys[name]
    if opts.get("fallback_key_hex"):
        return opts["fallback_key_hex"]
    return None


def _ref_paths(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, p)
            for p in os.listdir(path)
            if p.endswith(".ref")
        )
    return [path]


def read_ref_file(path: str, opts: dict) -> tuple[list[str], list[list[str]]]:
    """One file → (sorted column names, per-column value lists).
    Unresolvable keys mask the column with [ENCRYPTED] per row."""
    footer, data = _read_footer(path, opts["master_key_hex"])
    cols = sorted(footer["columns"])
    n = footer["row_count"]
    out = []
    for col in cols:
        entry = dict(footer["columns"][col], _col_name=col)
        blob = data[entry["offset"] : entry["offset"] + entry["size"]]
        key = _resolve_key(entry, opts)
        if key is None:
            out.append([ENCRYPTED_PLACEHOLDER] * n)
        elif key == "":
            out.append(_decode_column(blob.decode()))
        else:
            out.append(_decode_column(_aes_gcm_decrypt(blob, key).decode()))
    return cols, out


# --- Spark Python Data Source ----------------------------------------------


class RefFileReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType):
        self.options = dict(options)
        self.fields = [f.name for f in schema.fields]

    def partitions(self):
        # one partition per reference file — a directory of them scans
        # in parallel; the format itself is single-file (SURVEY §1.1)
        return [InputPartition(p) for p in _ref_paths(self.options["path"])]

    def read(self, partition):
        cols, values = read_ref_file(partition.value, self.options)
        idx = {c: i for i, c in enumerate(cols)}
        n = len(values[0]) if values else 0
        for r in range(n):
            yield tuple(
                values[idx[f]][r] if f in idx else None for f in self.fields
            )


class RefFileStreamReader(SimpleDataSourceStreamReader):
    """Streaming form: the offset is the count of (sorted) ``.ref``
    files already consumed, so dropping new reference files into the
    directory feeds micro-batches — file-arrival semantics like the
    built-in file stream source. The Simple reader variant fetches on
    the driver (fine for the single-file-per-column format's small
    files); a partition-parallel ``streamReader`` is the production
    upgrade path, same offset log."""

    def __init__(self, options: dict, fields: list[str]):
        self.options = dict(options)
        self.fields = fields

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def _rows(self, paths: list[str]):
        # a LIST iterator, not a generator: the prefetching cache in
        # SimpleDataSourceStreamReader copy.copy()s the iterator, which
        # generators cannot survive
        out = []
        for p in paths:
            cols, values = read_ref_file(p, self.options)
            idx = {c: i for i, c in enumerate(cols)}
            n = len(values[0]) if values else 0
            for r in range(n):
                out.append(
                    tuple(
                        values[idx[f]][r] if f in idx else None
                        for f in self.fields
                    )
                )
        return iter(out)

    def read(self, start: dict):
        paths = _ref_paths(self.options["path"])
        return self._rows(paths[start["idx"] :]), {"idx": len(paths)}

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay for recovery: offsets name a stable sorted-file range
        paths = _ref_paths(self.options["path"])
        return self._rows(paths[start["idx"] : end["idx"]])


class RefFileDataSource(DataSource):
    """``spark.read.format("reffile")`` / ``spark.readStream.format(
    "reffile")`` — options: ``path``, ``master_key_hex`` (footer),
    optional ``column_keys`` (JSON name→hex), ``fallback_key_hex``.
    Schema = union of footer columns (all STRING, lexicographic),
    inferred from the first file."""

    @classmethod
    def name(cls) -> str:
        return "reffile"

    def schema(self):
        first = _ref_paths(self.options["path"])[0]
        footer, _ = _read_footer(first, self.options["master_key_hex"])
        return StructType(
            [
                StructField(c, StringType())
                for c in sorted(footer["columns"])
            ]
        )

    def reader(self, schema: StructType) -> DataSourceReader:
        return RefFileReader(self.options, schema)

    def simpleStreamReader(self, schema: StructType):
        return RefFileStreamReader(
            self.options, [f.name for f in schema.fields]
        )


# --- driver-gate query ------------------------------------------------------

_MASTER_HEX = "00112233445566778899aabbccddeeff" * 2  # 32B test master key
_SHARDS = 3
_KEY_LIMIT = 30


def staged_ref_dir(spark: SparkSession, sf_dir: str) -> str:
    """Write customer (c_custkey < 30, string-projected) as 3 reference
    files sharded by custkey % 3 (once per sf) using the byte-layout
    writer, KMS-wrapped data key — the files any reference-format
    reader, including the reference itself, can decrypt."""
    import tempfile

    from ..encryption.config import EncryptionConfig
    from ..encryption.reffile import write_reference_format

    root = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_sources",
        os.path.basename(sf_dir.rstrip("/")),
        "ref_ds",
    )
    marker = os.path.join(root, "_SUCCESS")
    if not os.path.exists(marker):
        os.makedirs(root, exist_ok=True)
        cust = (
            load(spark, sf_dir, "customer")
            .filter(F.col("c_custkey") < _KEY_LIMIT)
            .select(
                F.col("c_custkey").cast("string").alias("c_custkey"),
                "c_name",
                "c_mktsegment",
            )
        )
        cfg = EncryptionConfig(master_key_hex=_MASTER_HEX, use_kms=True)
        for s in range(_SHARDS):
            shard = cust.filter(
                F.col("c_custkey").cast("long") % _SHARDS == s
            )
            write_reference_format(shard, os.path.join(root, f"part{s}.ref"), cfg)
        open(marker, "w").close()
    return root


@query(
    "src_reffile_datasource",
    oracle=f"""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(MIN(c_custkey) AS BIGINT) AS min_key,
           CAST(MAX(c_custkey) AS BIGINT) AS max_key
    FROM customer WHERE c_custkey < {_KEY_LIMIT}
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def src_reffile_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end connector parity: customer rows round-trip through the
    reference's encrypted columnar FILE FORMAT (KMS-wrapped data key,
    exact byte layout) and come back through ``spark.read.format(
    "reffile")`` — the Python Data Source API reader decrypting
    executor-side, one partition per file — then aggregate in plain
    DataFrame code. Values must match the same aggregate computed from
    the parquet corpus directly, proving write → encrypt → scan →
    decrypt → decode loses nothing.

    Scale: each reference file is one partition (the format is
    single-file columnar); a directory of N files scans N-wide. The
    decrypt is per-blob (column-granular), so column pruning at the
    reader level would skip whole blobs — the same selective-decrypt
    property the reference's own reader has."""
    path = staged_ref_dir(spark, sf_dir)
    spark.dataSource.register(RefFileDataSource)
    df = (
        spark.read.format("reffile")
        .option("master_key_hex", _MASTER_HEX)
        .load(path)
    )
    return (
        df.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.min(F.col("c_custkey").cast("long")).alias("min_key"),
            F.max(F.col("c_custkey").cast("long")).alias("max_key"),
        )
        .orderBy("c_mktsegment")
    )
