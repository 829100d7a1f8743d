"""Format-level Parquet Modular Encryption tests."""

from __future__ import annotations

import os

import pytest

from project_final_parquet_spark.encryption import pme


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
