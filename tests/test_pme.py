"""Format-level Parquet Modular Encryption tests — the JVM-native
distributed path (primary) and the pyarrow driver-side fallback."""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

import pytest

from project_final_parquet_spark.encryption import pme


# --- JVM-native distributed PME (PropertiesDrivenCryptoFactory) ------------


@pytest.fixture(scope="module")
def jvm_pme_dir(spark, tmp_path_factory, sf_dir):
    path = str(tmp_path_factory.mktemp("jvm_pme") / "documents_pme")
    df = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).repartition(4)
    pme.write_pme_distributed(
        df,
        path,
        column_keys={"key-text": ["text"], "key-meta": ["lang", "source"]},
        footer_key="footer-master-key",
    )
    return path, df


def test_jvm_pme_roundtrip_matches_source(spark, jvm_pme_dir):
    path, df = jvm_pme_dir
    got = pme.read_pme_distributed(
        spark, path, ["footer-master-key", "key-text", "key-meta"]
    )
    assert sorted(map(tuple, got.select(*df.columns).collect())) == sorted(
        map(tuple, df.collect())
    )


def test_jvm_pme_writes_many_encrypted_parts(jvm_pme_dir):
    # executor-parallel: multiple part files, each one PME-encrypted
    path, _ = jvm_pme_dir
    parts = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(parts) > 1
    # PME files carry the PARE magic instead of PAR1 when the footer is
    # encrypted — check the raw bytes, no reader involved
    with open(os.path.join(path, parts[0]), "rb") as f:
        assert f.read(4) == b"PARE"


def test_jvm_pme_keyless_session_cannot_read(jvm_pme_dir):
    """A FRESH session (separate JVM — in-process KEK caches would
    defeat the point) without the crypto confs must fail the scan."""
    path, _ = jvm_pme_dir
    script = textwrap.dedent(
        f"""
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[2]")
                 .config("spark.ui.enabled", "false").getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        try:
            spark.read.parquet({path!r}).count()
            print("READ_OK")
        except Exception as e:
            # Emit the exception chain so the asserting side can verify
            # the failure is FOOTER DECRYPTION, not startup/path/OOM.
            seen, cur = [], e
            while cur is not None and len(seen) < 8:
                seen.append(f"{{type(cur).__name__}}: {{cur}}")
                cur = cur.__cause__
            print("READ_FAILED :: " + " | ".join(seen))
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=300,
    )
    assert "READ_FAILED" in out.stdout, out.stdout + out.stderr
    # The denial must come from parquet-mr's crypto layer (encrypted
    # footer without keys), not from any incidental failure.
    failure = out.stdout[out.stdout.index("READ_FAILED") :]
    assert (
        "ParquetCrypto" in failure
        or "encrypted footer" in failure.lower()
        or "no encryption key list" in failure.lower()
    ), failure


# --- pyarrow fallback -------------------------------------------------------

pytestmark = pytest.mark.skipif(
    not pme.PME_AVAILABLE, reason="pyarrow PME not available"
)


@pytest.fixture(scope="module")
def pme_file(spark, tmp_path_factory, sf_dir):
    path = str(tmp_path_factory.mktemp("pme") / "documents.parquet")
    df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    pme.write_pme_encrypted(
        df,
        path,
        column_keys={"key-text": ["text"], "key-meta": ["lang", "source"]},
    )
    return path, df


def test_keyless_read_fails(pme_file):
    import pyarrow.parquet as pq

    path, _ = pme_file
    with pytest.raises(Exception):
        pq.read_table(path)


def test_roundtrip_matches_source(spark, pme_file):
    path, df = pme_file
    got = pme.read_pme_encrypted(spark, path)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, df.collect()))


def test_column_pruned_read(spark, pme_file):
    path, df = pme_file
    got = pme.read_pme_encrypted(spark, path, columns=["doc_id", "lang"])
    assert got.columns == ["doc_id", "lang"]
    assert got.count() == df.count()
