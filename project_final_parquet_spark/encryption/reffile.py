"""Reference FILE-FORMAT layer: byte-layout-compatible writer/reader for
the reference's hand-rolled encrypted columnar format.

Layout (SURVEY.md §1.1/§3; reference src/parquet_writer.cpp:165-234,
src/parquet_reader.cpp:45-78):

    [column blob 0][column blob 1]...[encrypted JSON footer][u64 LE footer length]

- each column blob: AES-GCM over the text encoding ``"<col>: <value>\\n"``
  repeated per row (missing cell → empty value), blob = [12B IV][ct][16B tag]
  (src/parquet_writer.cpp:61-75; src/crypto_utils.cpp:17-18,63-95);
- footer JSON: ``row_count`` + per-column ``{offset, size, mode, iv, tag,
  cipher_size, key_type, kms_encrypted_key?}`` (src/parquet_writer.cpp:
  169-174,113,146), AES-GCM-encrypted with the master key;
- key cascade and ``[ENCRYPTED]`` masking identical to cell.py.

This layer exists for FORMAT parity — the format is single-file by
construction (one blob per column, offsets in one footer), so the writer
pivots via the driver exactly like the reference's single process; the
scalable path for real data is io.py / pme.py. Crypto goes through
Spark's own aes_encrypt/aes_decrypt so there is one AES implementation
engine-wide.

Note: the reference repo's committed ``test_kms.parquet`` artifact does
NOT authenticate against any key in its current main.cpp config (footer
GCM tag mismatch for master/column/fallback keys in both hex-decoded and
raw forms) — it predates the current code, matching the bit-rot of the
reference's tests (SURVEY.md §5.1 item 3). Round-trip fidelity is
therefore proven against this module's own writer, which follows the
documented layout exactly.
"""

from __future__ import annotations

import json
import struct

from pyspark.sql import DataFrame, SparkSession

from .cell import (
    ENCRYPTED_PLACEHOLDER,
    resolve_write_keys,
)
from .config import EncryptionConfig, is_valid_aes_key_hex
from .io import _aes_bytes
from .kms import MockKMS


class ReferenceCompatKMS:
    """The reference's KMS stub CONTRACT (src/kms.cpp:8-30): a fixed
    16-byte data key whose wrapped form is an XOR with 0xAA. Re-stated
    from the SURVEY's behavioral description so files written here can
    be unwrapped by any reader honoring that contract."""

    DATA_KEY = bytes(range(1, 17))

    def generate_data_key(self, kms_key_id: str) -> tuple[bytes, bytes]:
        return self.DATA_KEY, bytes(b ^ 0xAA for b in self.DATA_KEY)

    def decrypt_data_key(self, wrapped: bytes, kms_key_id: str) -> bytes:
        return bytes(b ^ 0xAA for b in wrapped)


def _encode_column(col: str, values: list[str | None]) -> str:
    # "col: value\n" per row; missing → "" (src/parquet_writer.cpp:65-71)
    return "".join(f"{col}: {'' if v is None else v}\n" for v in values)


def _decode_column(plain: str) -> list[str]:
    # split on \n, take substring after the first ": "; malformed → ""
    # (src/parquet_reader.cpp:152-159)
    out = []
    for line in plain.split("\n")[:-1]:
        idx = line.find(": ")
        out.append(line[idx + 2 :] if idx >= 0 else "")
    return out


# The reference format is ONE sequential file with a trailing footer
# (src/parquet_writer.cpp:223-234), so writing it requires a driver-side
# materialization — exactly as the reference itself is RAM-bound
# (src/parquet_reader.cpp:66-69). The cap keeps that explicit: parity
# below it, a loud redirect to the distributed PME path above it.
_WRITE_ROW_CAP = 100_000


def write_reference_format(
    df: DataFrame,
    path: str,
    config: EncryptionConfig,
    kms=None,
) -> None:
    """Write ``df`` (all-string columns) in the reference's file layout.

    Byte-parity layer for SMALL frames only (row cap above): the format
    is inherently single-file/single-pass. For real data volumes use
    ``encryption.pme`` (Spark's native Parquet Modular Encryption) —
    distributed, columnar, and KMS-integrated."""
    if not config.master_key_hex:
        raise ValueError("master key required (footer is always encrypted)")
    kms = kms or (ReferenceCompatKMS() if config.use_kms else None)
    spark = df.sparkSession
    cols = sorted(df.columns)  # lexicographic, std::set semantics
    n = df.limit(_WRITE_ROW_CAP + 1).count()
    if n > _WRITE_ROW_CAP:
        raise ValueError(
            f"write_reference_format materializes rows on the driver and "
            f"is capped at {_WRITE_ROW_CAP} rows (the reference format is "
            f"one sequential file + trailing footer); for large frames "
            f"use project_final_parquet_spark.encryption.pme "
            f"(write_pme_distributed), the distributed encrypted-parquet "
            f"path"
        )
    rows = df.select(*cols).collect()
    keys, meta = resolve_write_keys(cols, config, kms)

    body = b""
    footer_cols: dict[str, dict] = {}
    for col in cols:
        values = [r[col] for r in rows]
        plain = _encode_column(col, values)
        if keys[col] is None:
            blob = plain.encode()
            # the reference writer spells the plaintext (key-failure) case
            # mode='PLAINTEXT', key_type='none' (src/parquet_writer.cpp:146)
            entry = {"mode": "PLAINTEXT", "key_type": "none"}
        else:
            blob = _aes_bytes(spark, plain, keys[col], encrypt=True)
            entry = {
                "mode": "AES_GCM",
                "key_type": meta[col].key_type,
                # IV/tag are embedded in the blob; the footer carries hex
                # copies for parity (informational — the reference reader
                # only uses the embedded ones, src/parquet_reader.cpp:149-150)
                "iv": blob[:12].hex(),
                "tag": blob[-16:].hex(),
                "cipher_size": len(blob) - 28,
            }
            if meta[col].kms_encrypted_key_hex:
                entry["kms_encrypted_key"] = meta[col].kms_encrypted_key_hex
        entry["offset"] = len(body)
        entry["size"] = len(blob)
        footer_cols[col] = entry
        body += blob

    footer = {"row_count": len(rows), "columns": footer_cols}
    enc_footer = _aes_bytes(
        spark, json.dumps(footer), config.master_key_hex, encrypt=True
    )
    with open(path, "wb") as f:
        f.write(body)
        f.write(enc_footer)
        f.write(struct.pack("<Q", len(enc_footer)))


def read_reference_format(
    spark: SparkSession,
    path: str,
    config: EncryptionConfig,
    requested_columns: list[str] | None = None,
    kms=None,
) -> DataFrame:
    """Read a reference-layout file with selective decryption + masking.

    Tail-first parse (footer length → encrypted footer → column slices,
    src/parquet_reader.cpp:45-78); unrequested columns come back as the
    ``[ENCRYPTED]`` literal; empty request decrypts everything."""
    kms = kms or (ReferenceCompatKMS() if config.use_kms else None)
    data = open(path, "rb").read()
    (flen,) = struct.unpack("<Q", data[-8:])
    footer_raw = _aes_bytes(
        spark, data[-8 - flen : -8], config.master_key_hex, encrypt=False
    )
    footer = json.loads(footer_raw.decode())
    n = footer["row_count"]

    requested = set(requested_columns or footer["columns"].keys())
    columns: dict[str, list[str]] = {}
    for col, meta in footer["columns"].items():
        if col not in requested:
            columns[col] = [ENCRYPTED_PLACEHOLDER] * n
            continue
        blob = data[meta["offset"] : meta["offset"] + meta["size"]]
        # plaintext detection keys off mode != AES_GCM (the reference writes
        # mode='PLAINTEXT', key_type='none'; older files from this module
        # spelled it mode='NONE', key_type='plaintext' — accept both)
        if meta["mode"] != "AES_GCM" or meta["key_type"] in ("plaintext", "none"):
            plain = blob.decode()
        else:
            key_hex = config.column_keys.get(col)
            if not (key_hex and is_valid_aes_key_hex(key_hex)):
                if meta.get("kms_encrypted_key") and kms is not None:
                    key_hex = kms.decrypt_data_key(
                        bytes.fromhex(meta["kms_encrypted_key"]), config.kms_key_id
                    ).hex()
                elif config.fallback_key_hex:
                    key_hex = config.fallback_key_hex
                else:
                    raise KeyError(f"no key for column {col!r}")
            plain = _aes_bytes(spark, blob, key_hex, encrypt=False).decode()
        vals = _decode_column(plain)
        vals += [""] * (n - len(vals))  # pad (src/parquet_reader.cpp:162-164)
        columns[col] = vals

    cols = sorted(columns.keys())
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField(c, T.StringType(), False) for c in cols])
    data_rows = [tuple(columns[c][i] for c in cols) for i in range(n)]
    return spark.createDataFrame(data_rows, schema)
