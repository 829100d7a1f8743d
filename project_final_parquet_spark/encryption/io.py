"""Encrypted table write/read — the reference's O1/O2 on Spark.

Layout under ``<path>/``:
- ``data/``       — ordinary Parquet files holding the AES-GCM blobs
  (BinaryType columns). Parquet is columnar + footer-last, i.e. the
  format the reference hand-rolls (SURVEY.md §1.1), with real row
  groups, statistics, and parallel IO.
- ``footer.enc``  — the engine footer (row_count + per-column key_type /
  kms_encrypted_key), JSON, AES-GCM-encrypted with the master key —
  mirroring the reference's encrypted-footer design
  (src/parquet_writer.cpp:223-234; tail-first parse
  src/parquet_reader.cpp:45-78). Encryption of the footer bytes is done
  through Spark's own aes_encrypt so the blob layout matches the column
  blobs ([12B IV][ct][16B tag]).

Scale: the data files are written/read by executors in parallel with
column pruning and predicate pushdown intact — selective decryption here
prunes IO too, which the reference never did (it always slurped the whole
file, src/parquet_reader.cpp:66-69).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cell import Footer, decrypt_columns, encrypt_columns
from .config import EncryptionConfig
from .kms import MockKMS

_FOOTER_NAME = "footer.enc"
_DATA_DIR = "data"


def _aes_bytes(spark: SparkSession, payload: bytes | str, key_hex: str, encrypt: bool) -> bytes:
    """En/decrypt a small driver-side blob with Spark's own AES-GCM
    expression (keeps one crypto implementation engine-wide)."""
    if encrypt:
        expr = F.aes_encrypt(F.lit(payload), F.unhex(F.lit(key_hex)), F.lit("GCM"))
    else:
        expr = F.aes_decrypt(F.lit(payload), F.unhex(F.lit(key_hex)), F.lit("GCM"))
    return bytes(spark.range(1).select(expr.alias("b")).head()[0])


def write_encrypted_table(
    df: DataFrame,
    path: str,
    config: EncryptionConfig,
    kms: MockKMS | None = None,
) -> Footer:
    """Encrypt every column per the key cascade and persist table + footer."""
    if not config.master_key_hex:
        raise ValueError("master (footer) key required to write an encrypted table")
    if config.use_kms and kms is None:
        kms = MockKMS()
    spark = df.sparkSession
    enc_df, footer = encrypt_columns(df, config, kms)
    enc_df.write.mode("overwrite").parquet(os.path.join(path, _DATA_DIR))
    blob = _aes_bytes(
        spark, json.dumps(footer.to_dict()), config.master_key_hex, encrypt=True
    )
    with open(os.path.join(path, _FOOTER_NAME), "wb") as f:
        f.write(blob)
    return footer


def read_footer(spark: SparkSession, path: str, config: EncryptionConfig) -> Footer:
    with open(os.path.join(path, _FOOTER_NAME), "rb") as f:
        blob = f.read()
    raw = _aes_bytes(spark, blob, config.master_key_hex, encrypt=False)
    return Footer.from_dict(json.loads(raw.decode()))


def read_encrypted_table(
    spark: SparkSession,
    path: str,
    config: EncryptionConfig,
    requested_columns: list[str] | None = None,
    kms: MockKMS | None = None,
) -> DataFrame:
    """Read + selectively decrypt; unrequested columns are masked
    ``[ENCRYPTED]`` (empty request = decrypt all, reference semantics)."""
    if config.use_kms and kms is None:
        kms = MockKMS()
    footer = read_footer(spark, path, config)
    df = spark.read.parquet(os.path.join(path, _DATA_DIR))
    return decrypt_columns(df, config, footer, requested_columns, kms)
