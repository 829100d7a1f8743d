"""Tests for corpus_prep: NFC normalization, Gini profiling, epoch
shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_final_parquet_spark.registry import all_queries
from project_final_parquet_spark.tables import load


def test_nfc_restores_precomposed_length(spark, sf_dir):
    """Round-trip invariant: decomposing every 'e' then NFC-normalizing
    must restore exactly the raw character count (e+U+0301 -> U+00E9),
    and the decomposed count must exceed it wherever an 'e' exists."""
    rows = all_queries()["text_unicode_normalize"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.chars_nfc == r.chars_raw
        assert r.chars_decomposed >= r.chars_raw


def test_nfc_udf_is_arrow_vectorized(spark, sf_dir):
    """The normalizer must run as an Arrow-batched pandas UDF
    (ArrowEvalPython), never row-at-a-time Python (BatchEvalPython)."""
    plan = (
        all_queries()["text_unicode_normalize"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_gini_matches_direct_computation(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    got = {
        r.col_name: (r.n_distinct, r.gini_impurity)
        for r in all_queries()["profile_gini_impurity"](
            spark, sf_dir
        ).collect()
    }
    for col in ("lang", "source"):
        counts = [
            r.c
            for r in docs.groupBy(col)
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        ]
        total = sum(counts)
        want = 1.0 - sum(c * c for c in counts) / (total * total)
        n, g = got[col]
        assert n == len(counts)
        assert g == want  # rational in the counts: bit-exact
        assert 0.0 <= g < 1.0


def test_epoch_shuffle_permutes_differently_each_epoch(spark, sf_dir):
    rows = all_queries()["sample_epoch_shuffle"](spark, sf_dir).collect()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, []).append(r.doc_id)
    assert sorted(by_epoch) == [0, 1, 2]
    # each epoch's head is a different permutation prefix
    assert by_epoch[0] != by_epoch[1]
    assert by_epoch[1] != by_epoch[2]
    # deterministic: a second evaluation returns the identical order
    again = all_queries()["sample_epoch_shuffle"](spark, sf_dir).collect()
    assert rows == again
