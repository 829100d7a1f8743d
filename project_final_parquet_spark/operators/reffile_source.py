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
stub contract), else the column is surfaced as ``[ENCRYPTED]`` —
masking, not failure, exactly like the reference.

Pickling note (the make_fake_decoder rule, hit for real here): data
source classes are cloudpickled to SEPARATE Python worker processes
that cannot import this package (the driver may run from any cwd with
a sys.path hack). Everything the class touches is therefore defined
INSIDE ``make_reffile_datasource()`` — a dynamically-created class
(``<locals>`` in its qualname) ships by value, module-level classes by
reference, and by-reference breaks with ModuleNotFoundError on the
data-source worker. Verified against a vanilla session from /tmp.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

ENCRYPTED_PLACEHOLDER = "[ENCRYPTED]"


def make_reffile_helpers():
    """Pure-python format layer (executor-safe, by-value picklable):
    returns (read_ref_file, ref_paths)."""

    import json as _json
    import os as _os
    import struct as _struct

    placeholder = ENCRYPTED_PLACEHOLDER  # captured constant, not module ref

    def _aes_gcm_decrypt(blob: bytes, key_hex: str) -> bytes:
        # [12B IV][ct][16B tag] (reference crypto_utils.cpp layout;
        # cryptography lib takes ct||tag)
        from cryptography.hazmat.primitives.ciphers.aead import AESGCM

        return AESGCM(bytes.fromhex(key_hex)).decrypt(
            blob[:12], blob[12:], None
        )

    def _read_footer(path: str, master_key_hex: str):
        with open(path, "rb") as f:
            data = f.read()
        if len(data) < 8:
            raise ValueError(f"file too short for trailer ({len(data)}B)")
        (footer_len,) = _struct.unpack("<Q", data[-8:])
        if footer_len > len(data) - 8:
            raise ValueError(
                f"footer length {footer_len} exceeds file body"
            )
        enc_footer = data[-8 - footer_len : -8]
        footer = _json.loads(_aes_gcm_decrypt(enc_footer, master_key_hex))
        # column blobs live strictly before the footer
        return footer, data, len(data) - 8 - footer_len

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
        # reference read cascade (src/parquet_reader.cpp: config
        # column_keys first, THEN the footer's KMS-wrapped key, then
        # fallback, else masked) — mirrors encryption/cell.py
        # resolve_read_key. A user-supplied per-column key must win
        # even for KMS-written columns (e.g. a rotated/stale wrapped
        # key in the footer, overridden by the known-good plaintext
        # key).
        col_keys = _json.loads(opts.get("column_keys", "{}"))
        if entry.get("key_type") == "none":
            return ""  # plaintext blob
        name = entry.get("_col_name")
        if name in col_keys:
            return col_keys[name]
        if entry.get("kms_encrypted_key"):
            return _kms_unwrap(entry["kms_encrypted_key"])
        if opts.get("fallback_key_hex"):
            return opts["fallback_key_hex"]
        return None

    def ref_paths(path: str) -> list[str]:
        if _os.path.isdir(path):
            return sorted(
                _os.path.join(path, p)
                for p in _os.listdir(path)
                if p.endswith(".ref")
            )
        return [path]

    def read_ref_file(path: str, opts: dict):
        """One file → (sorted column names, per-column value lists).
        Unresolvable keys mask the column with [ENCRYPTED] per row."""
        footer, data, body_end = _read_footer(path, opts["master_key_hex"])
        cols = sorted(footer["columns"])
        n = footer["row_count"]
        out = []
        for col in cols:
            entry = dict(footer["columns"][col], _col_name=col)
            off, size = entry["offset"], entry["size"]
            # hostile-manifest guard: blob must sit inside the body
            # (tests/test_reffile_property.py) — a crafted offset must
            # fail loudly, not decode garbage or fake an empty column
            if not (0 <= off and 0 <= size and off + size <= body_end):
                raise ValueError(
                    f"column {col!r} blob [{off}, {off}+{size}) outside "
                    f"body [0, {body_end})"
                )
            blob = data[off : off + size]
            key = _resolve_key(entry, opts)
            if key is None:
                decoded = [placeholder] * n
            elif key == "":
                decoded = _decode_column(blob.decode())
            else:
                decoded = _decode_column(_aes_gcm_decrypt(blob, key).decode())
            if len(decoded) != n:
                raise ValueError(
                    f"column {col!r} decoded {len(decoded)} rows, "
                    f"footer says {n}"
                )
            out.append(decoded)
        return cols, out

    return read_ref_file, ref_paths


# driver-side handles for tests; the class below captures its own copies
read_ref_file, _ref_paths = make_reffile_helpers()


def make_reffile_datasource():
    """Build the DataSource class with every dependency factory-local so
    cloudpickle ships the whole closure by value to the data-source
    workers (see module docstring)."""

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )
    from pyspark.sql.types import StringType, StructField, StructType

    _read_ref_file, _paths = make_reffile_helpers()

    class RefFileReader(DataSourceReader):
        def __init__(self, options: dict, schema: StructType):
            self.options = dict(options)
            self.fields = [f.name for f in schema.fields]

        def partitions(self):
            # one partition per reference file — a directory of them
            # scans in parallel; the format itself is single-file
            return [InputPartition(p) for p in _paths(self.options["path"])]

        def read(self, partition):
            cols, values = _read_ref_file(partition.value, self.options)
            idx = {c: i for i, c in enumerate(cols)}
            n = len(values[0]) if values else 0
            for r in range(n):
                yield tuple(
                    values[idx[f]][r] if f in idx else None
                    for f in self.fields
                )

    class RefFileStreamReader(SimpleDataSourceStreamReader):
        """Streaming form: the offset is the count of (sorted) ``.ref``
        files consumed, so new reference files arriving in the directory
        feed micro-batches — file-arrival semantics like the built-in
        file stream source. The Simple reader fetches on the driver
        (fine for the format's small single files); a partition-parallel
        ``streamReader`` is the production upgrade path, same offset
        log."""

        def __init__(self, options: dict, fields: list[str]):
            self.options = dict(options)
            self.fields = fields

        def initialOffset(self) -> dict:
            return {"idx": 0}

        def _rows(self, paths: list[str]):
            # LIST iterator, not a generator: the prefetching cache
            # copy.copy()s iterators, which generators cannot survive
            out = []
            for p in paths:
                cols, values = _read_ref_file(p, self.options)
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
            paths = _paths(self.options["path"])
            return self._rows(paths[start["idx"] :]), {"idx": len(paths)}

        def readBetweenOffsets(self, start: dict, end: dict):
            # replay for recovery: offsets name a stable sorted range
            paths = _paths(self.options["path"])
            return self._rows(paths[start["idx"] : end["idx"]])

    class RefFileDataSource(DataSource):
        """``spark.read.format("reffile")`` / ``spark.readStream`` —
        options: ``path``, ``master_key_hex`` (footer), optional
        ``column_keys`` (JSON name→hex), ``fallback_key_hex``. Schema =
        union of footer columns (all STRING, lexicographic), inferred
        from the first file."""

        @classmethod
        def name(cls) -> str:
            return "reffile"

        def schema(self):
            # footer-only read (no blob decrypt needed for the schema)
            first = _paths(self.options["path"])[0]
            import json as _json
            import struct as _struct

            from cryptography.hazmat.primitives.ciphers.aead import AESGCM

            with open(first, "rb") as f:
                data = f.read()
            (flen,) = _struct.unpack("<Q", data[-8:])
            blob = data[-8 - flen : -8]
            key = bytes.fromhex(self.options["master_key_hex"])
            footer = _json.loads(
                AESGCM(key).decrypt(blob[:12], blob[12:], None)
            )
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

    return RefFileDataSource


RefFileDataSource = make_reffile_datasource()


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
