"""Hot-block bounding for the blocked Jaccard join (VERDICT r1 item 4):
tile-salting must keep results identical to the plain blocked self-join
while splitting an oversized block's pair space across many join buckets
instead of one straggler task.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from project_final_parquet_spark.operators.dedup import tiled_block_pairs


@pytest.fixture(scope="module")
def hot_corpus(spark):
    # one hot block ("hot prefix") holding 300 of 330 docs, plus a few
    # small blocks — the shape that stalls a naive blocked join
    rows = [(i, "hot prefix", [f"s{i}", f"s{i + 1}", "shared"]) for i in range(300)]
    rows += [(1000 + i, f"cold {i % 5}", [f"c{i}", "shared"]) for i in range(30)]
    return spark.createDataFrame(
        rows, "doc_id long, block string, sh array<string>"
    ).cache()


def _naive_pairs(t):
    a = t.select(F.col("doc_id").alias("doc_a"), "block", F.col("sh").alias("sh_a"))
    b = t.select(
        F.col("doc_id").alias("doc_b"),
        F.col("block").alias("block_b"),
        F.col("sh").alias("sh_b"),
    )
    return a.join(
        b, (a.block == b.block_b) & (F.col("doc_a") < F.col("doc_b"))
    )


def test_tiled_pairs_identical_to_naive(spark, hot_corpus):
    naive = {
        (r.doc_a, r.doc_b) for r in _naive_pairs(hot_corpus).collect()
    }
    tiled = {
        (r.doc_a, r.doc_b)
        for r in tiled_block_pairs(hot_corpus, cap=16).collect()
    }
    assert tiled == naive
    assert len(naive) == 300 * 299 // 2 + 5 * (6 * 5 // 2)


def test_hot_block_spreads_over_many_join_buckets(spark, hot_corpus):
    # reproduce the a-side salt assignment and check the hot block's
    # 300 a-rows land in ~ceil(300/16) buckets, each ≲ cap-sized
    cap = 16
    sizes = hot_corpus.groupBy("block").agg(F.count(F.lit(1)).alias("__bn"))
    ntiles = F.greatest(F.ceil(F.col("__bn") / F.lit(cap)).cast("int"), F.lit(1))
    salted = (
        hot_corpus.join(sizes, "block")
        .select(
            "block", F.pmod(F.xxhash64("doc_id"), ntiles).cast("int").alias("t")
        )
        .groupBy("block", "t")
        .count()
        .filter(F.col("block") == "hot prefix")
        .collect()
    )
    bucket_sizes = [r["count"] for r in salted]
    assert len(bucket_sizes) >= 15  # ceil(300/16) = 19 salts, most hit
    # hash salting is probabilistic — allow 3× cap slack, but nothing
    # within an order of magnitude of the unsalted 300-row bucket
    assert max(bucket_sizes) <= 3 * cap
    # cold blocks must degenerate to a single unsalted bucket
    cold = (
        hot_corpus.join(sizes, "block")
        .select(
            "block", F.pmod(F.xxhash64("doc_id"), ntiles).cast("int").alias("t")
        )
        .filter(F.col("block") != "hot prefix")
        .select("t")
        .distinct()
        .collect()
    )
    assert {r.t for r in cold} == {0}
