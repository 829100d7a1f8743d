"""Connected-components convergence: pointer doubling must resolve
components whose diameter far exceeds the round count."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_final_parquet_spark.operators.dedup import connected_components


def _sym(spark, pairs):
    df = spark.createDataFrame(pairs, "u long, v long")
    return df.union(df.select(F.col("v").alias("u"), F.col("u").alias("v")))


def test_long_chain_converges_with_pointer_doubling(spark):
    # a 40-node chain: diameter 39 >> 6 rounds, but 2^6 = 64 covers it
    chain = [(i, i + 1) for i in range(40)]
    labels = {r.u: r.label for r in connected_components(_sym(spark, chain), 6).collect()}
    assert set(labels.values()) == {0}
    assert len(labels) == 41


def test_multiple_components_stay_separate(spark):
    edges = [(0, 1), (1, 2), (10, 11), (20, 21), (21, 22), (22, 23)]
    labels = {r.u: r.label for r in connected_components(_sym(spark, edges), 6).collect()}
    comps = {}
    for node, lbl in labels.items():
        comps.setdefault(lbl, set()).add(node)
    assert comps == {0: {0, 1, 2}, 10: {10, 11}, 20: {20, 21, 22, 23}}
