"""Format-level encryption: real Parquet Modular Encryption (PME).

The reference's design is explicitly "Parquet Modular Encryption
inspired" (its README) — per-column keys, an encrypted footer, and KMS
envelope wrapping. PME is the standardized form of exactly that, so this
module provides it natively:

- AES-GCM-encrypted column chunks + encrypted footer inside one standard
  parquet file (readable by any PME-aware reader with the keys — not by
  anyone else, verified: keyless reads fail);
- envelope encryption through the standard ``KmsClient`` contract
  (wrap_key/unwrap_key ≙ reference KMS::GenerateDataKey/DecryptDataKey,
  src/kms.cpp:8-30).

This path uses pyarrow's CryptoFactory (driver-side, single files) —
the pragmatic local harness for the format. On a cluster the identical
properties drive the JVM implementation shipped in parquet-hadoop
(org.apache.parquet.crypto.keytools.PropertiesDrivenCryptoFactory via
``parquet.encryption.column.keys`` / ``parquet.encryption.footer.key``),
with executors encrypting partitions in parallel; the cell-level layer
(cell.py) remains the fully-distributed in-plan alternative either way.
"""

from __future__ import annotations

import base64
import hashlib

try:  # gate: pyarrow PME needs an encryption-enabled build
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyarrow.parquet.encryption as pe

    PME_AVAILABLE = True
except ImportError:  # pragma: no cover
    PME_AVAILABLE = False

from pyspark.sql import DataFrame, SparkSession


def _master_key(key_id: str) -> bytes:
    """Deterministic mock master-key derivation (stand-in for a real KMS
    backend, same spirit as the reference's stub kms.cpp:10-15)."""
    return hashlib.sha256(f"master:{key_id}".encode()).digest()[:16]


if PME_AVAILABLE:

    class MockPmeKmsClient(pe.KmsClient):
        """Standard PME KmsClient contract over the mock key store.

        wrap_key returns UTF-8 (base64) as the PME key-metadata format
        requires.
        """

        def __init__(self, kms_connection_config):
            pe.KmsClient.__init__(self)

        def wrap_key(self, key_bytes: bytes, master_key_identifier: str) -> str:
            mk = _master_key(master_key_identifier)
            stream = (mk * ((len(key_bytes) // len(mk)) + 1))[: len(key_bytes)]
            return base64.b64encode(
                bytes(a ^ b for a, b in zip(key_bytes, stream))
            ).decode()

        def unwrap_key(self, wrapped_key: str, master_key_identifier: str) -> bytes:
            mk = _master_key(master_key_identifier)
            raw = base64.b64decode(wrapped_key)
            stream = (mk * ((len(raw) // len(mk)) + 1))[: len(raw)]
            return bytes(a ^ b for a, b in zip(raw, stream))

    def _factory() -> "pe.CryptoFactory":
        return pe.CryptoFactory(MockPmeKmsClient)

    def write_pme_encrypted(
        df: DataFrame,
        path: str,
        column_keys: dict[str, list[str]],
        footer_key: str = "footer-master-key",
    ) -> None:
        """Write ``df`` as ONE PME-encrypted parquet file.

        ``column_keys`` maps master-key-id → column list (the PME
        property shape). Unlisted columns are footer-key encrypted.
        """
        table = pa.Table.from_pandas(df.toPandas(), preserve_index=False)
        enc_cfg = pe.EncryptionConfiguration(
            footer_key=footer_key,
            column_keys=column_keys,
            encryption_algorithm="AES_GCM_V1",
        )
        props = _factory().file_encryption_properties(
            pe.KmsConnectionConfig(), enc_cfg
        )
        with pq.ParquetWriter(path, table.schema, encryption_properties=props) as w:
            w.write_table(table)

    def read_pme_encrypted(
        spark: SparkSession, path: str, columns: list[str] | None = None
    ) -> DataFrame:
        """Read a PME-encrypted parquet file back into a DataFrame.

        Column pruning happens inside the encrypted file: unrequested
        column chunks are never decrypted (and unlike the reference's
        whole-file slurp, never read)."""
        dec = _factory().file_decryption_properties(
            pe.KmsConnectionConfig(), pe.DecryptionConfiguration()
        )
        table = pq.ParquetFile(path, decryption_properties=dec).read(columns=columns)
        return spark.createDataFrame(table.to_pandas())
