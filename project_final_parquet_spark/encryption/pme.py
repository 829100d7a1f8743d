"""Format-level encryption: real Parquet Modular Encryption (PME).

The reference's design is explicitly "Parquet Modular Encryption
inspired" (its README) — per-column keys, an encrypted footer, and KMS
envelope wrapping. PME is the standardized form of exactly that, and
this module provides it through BOTH stacks:

1. **JVM-native (primary, distributed):** parquet-hadoop's
   ``PropertiesDrivenCryptoFactory`` driven through ``df.write.parquet``
   / ``spark.read.parquet`` — executors encrypt/decrypt partitions in
   parallel, nothing funnels through the driver. The KMS side is a
   compiled ``LocalWrapKmsClient`` subclass (jvm/InMemoryKmsClient.java;
   parquet-mr ships only abstract/test KMS clients) whose jar rides on
   ``sparkContext.addJar`` — so the path works on a VANILLA session, no
   session-create classpath needed. All crypto confs travel as
   per-operation reader/writer options, so nothing leaks into unrelated
   scans in the same session.

2. **pyarrow (fallback, driver-side):** single-file CryptoFactory
   harness, kept for environments without the jar/javac and for
   artifact-level format poking.

Both implement the same contract as the reference: envelope encryption
through a KmsClient (wrap_key/unwrap_key ≙ reference
KMS::GenerateDataKey/DecryptDataKey, src/kms.cpp:8-30), per-column
master-key ids (≙ column_keys config, src/main.cpp:109-111), encrypted
footer (≙ footer master key, src/parquet_writer.cpp:223-234). Keyless
reads fail tag authentication in the scan task (tests/test_pme.py).
"""

from __future__ import annotations

import base64
import hashlib
import os
import subprocess
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

try:  # gate: pyarrow PME needs an encryption-enabled build
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyarrow.parquet.encryption as pe

    PME_AVAILABLE = True
except ImportError:  # pragma: no cover
    PME_AVAILABLE = False


def _master_key(key_id: str) -> bytes:
    """Deterministic mock master-key derivation (stand-in for a real KMS
    backend, same spirit as the reference's stub kms.cpp:10-15)."""
    return hashlib.sha256(f"master:{key_id}".encode()).digest()[:16]


# --- JVM-native distributed PME --------------------------------------------

JVM_FACTORY = "org.apache.parquet.crypto.keytools.PropertiesDrivenCryptoFactory"
JVM_KMS_CLASS = "sparkgraft.pme.InMemoryKmsClient"
KEY_LIST_PROPERTY = "sparkgraft.pme.key.list"

_JVM_DIR = Path(__file__).resolve().parent / "jvm"
_JAVA_SRC = _JVM_DIR / "InMemoryKmsClient.java"
# Build products live in a gitignored cache keyed by the source hash —
# NO prebuilt jar is committed (unreviewable bytecode), every session
# loads bytecode compiled from the reviewed .java in this checkout.
_BUILD_DIR = _JVM_DIR / "build"


def _jar_path() -> Path:
    src_hash = hashlib.sha256(_JAVA_SRC.read_bytes()).hexdigest()[:16]
    return _BUILD_DIR / f"sparkgraft-pme-kms-{src_hash}.jar"


def _resolve_dep_jar(jars: Path, pat: str) -> str:
    matches = sorted(jars.glob(pat))
    if not matches:
        raise FileNotFoundError(
            f"PME build dependency {pat!r} not found in {jars} "
            f"(SPARK_HOME={os.environ.get('SPARK_HOME', '<unset>')}). "
            "The JVM PME path needs the parquet/hadoop jars Spark ships."
        )
    # Deterministic pick: highest version sorts last.
    return str(matches[-1])


def _build_jar(jar: Path) -> None:
    """Compile the KmsClient from the committed source (javac 17 + the
    parquet/hadoop jars Spark already ships)."""
    spark_home = os.environ.get("SPARK_HOME", "/opt/spark")
    jars = Path(spark_home) / "jars"
    cp = os.pathsep.join(
        _resolve_dep_jar(jars, pat)
        for pat in (
            "parquet-hadoop-*.jar",
            "parquet-common-*.jar",
            "hadoop-client-api-*.jar",
        )
    )
    classes = _BUILD_DIR / "classes"
    subprocess.run(
        ["javac", "-encoding", "UTF-8", "-proc:none", "-cp", cp,
         "-d", str(classes), str(_JAVA_SRC)],
        check=True,
    )
    tmp = jar.with_suffix(".jar.tmp")
    subprocess.run(
        ["jar", "cf", str(tmp), "-C", str(classes), "."], check=True
    )
    os.replace(tmp, jar)


def ensure_pme_jar(spark: SparkSession) -> str:
    """Make the KMS jar visible to this session's executors (idempotent;
    addJar is the one session-global step — confs stay per-operation).
    Always built from the committed .java source, cached by source hash
    (a source edit invalidates the cache and recompiles)."""
    jar = _jar_path()
    if not jar.exists():
        _BUILD_DIR.mkdir(parents=True, exist_ok=True)
        _build_jar(jar)
    spark.sparkContext._jsc.addJar(str(jar))
    return str(jar)


def _crypto_options(key_ids: list[str]) -> dict[str, str]:
    key_list = ", ".join(
        f"{kid}:{base64.b64encode(_master_key(kid)).decode()}"
        for kid in key_ids
    )
    return {
        "parquet.crypto.factory.class": JVM_FACTORY,
        "parquet.encryption.kms.client.class": JVM_KMS_CLASS,
        KEY_LIST_PROPERTY: key_list,
    }


def write_pme_distributed(
    df: DataFrame,
    path: str,
    column_keys: dict[str, list[str]],
    footer_key: str = "footer-master-key",
) -> None:
    """Executor-parallel PME write: standard ``df.write.parquet`` with
    the crypto factory + key confs as writer options. ``column_keys``
    maps master-key-id → column list; unlisted columns (and the footer)
    are protected by ``footer_key``. Output is ordinary partitioned
    parquet — every part file PME-encrypted — readable by ANY PME-aware
    reader holding the keys."""
    ensure_pme_jar(df.sparkSession)
    opts = _crypto_options([footer_key, *column_keys])
    opts["parquet.encryption.footer.key"] = footer_key
    opts["parquet.encryption.column.keys"] = ";".join(
        f"{kid}:{','.join(cols)}" for kid, cols in column_keys.items()
    )
    df.write.mode("overwrite").options(**opts).parquet(path)


def read_pme_distributed(
    spark: SparkSession, path: str, key_ids: list[str]
) -> DataFrame:
    """Executor-parallel PME read: footer/column decryption happens in
    the scan tasks; column pruning still applies INSIDE the encrypted
    file (unrequested encrypted chunks are never fetched or decrypted)."""
    ensure_pme_jar(spark)
    return spark.read.options(**_crypto_options(key_ids)).parquet(path)


# --- pyarrow fallback (driver-side, single file) ----------------------------

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
        """FALLBACK: write ``df`` as ONE PME-encrypted parquet file via
        pyarrow on the driver — a local format harness for when the JVM
        path (``write_pme_distributed``, the scale-correct form) can't
        run. The ``toPandas`` funnel is the reason it's the fallback."""
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
        """FALLBACK: read a single pyarrow-written PME file on the driver."""
        dec = _factory().file_decryption_properties(
            pe.KmsConnectionConfig(), pe.DecryptionConfiguration()
        )
        table = pq.ParquetFile(path, decryption_properties=dec).read(columns=columns)
        return spark.createDataFrame(table.to_pandas())
