"""PageRank / profiling / class-rebalance behavioral tests (sf0.001)."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_final_parquet_spark.operators.graph import graph_pagerank
from project_final_parquet_spark.operators.pipeline import (
    sample_rebalance_classes,
)
from project_final_parquet_spark.operators.profiling import (
    _COLS,
    profile_table,
)


def test_pagerank_properties(spark, sf_dir):
    rows = graph_pagerank(spark, sf_dir).collect()
    assert len(rows) == 20
    ranks = [r.rank for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    # teleport term bounds every rank below by 0.15
    assert all(r > 0.15 for r in ranks)
    # bipartite hubs: the most-connected side should surface in top-20
    assert {r.node_type for r in rows} <= {"customer", "supplier"}


def test_pagerank_deterministic(spark, sf_dir):
    a = graph_pagerank(spark, sf_dir).collect()
    b = graph_pagerank(spark, sf_dir).collect()
    assert a == b


def test_profile_table_invariants(spark, sf_dir):
    rows = {r.column_name: r for r in profile_table(spark, sf_dir).collect()}
    assert set(rows) == {c for c, _ in _COLS}
    n = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    for r in rows.values():
        assert r.n_rows == n
        assert 0 <= r.n_nulls <= n
        assert 1 <= r.n_distinct <= n
        assert r.min_value <= r.max_value


def test_rebalance_uniform_classes(spark, sf_dir):
    rows = sample_rebalance_classes(spark, sf_dir).collect()
    assert rows
    kept = {r.n_kept for r in rows}
    assert len(kept) == 1, "all classes must be downsampled to one size"
    target = kept.pop()
    assert target == min(r.n_total for r in rows)
    for r in rows:
        assert r.n_kept <= r.n_total
        assert r.kept_checksum > 0


def test_negative_sampling_properties(spark, sf_dir):
    from project_final_parquet_spark.operators.pipeline import sample_negatives

    rows = sample_negatives(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == 20 * 3
    for r in rows:
        assert r.neg_id != r.anchor_id  # collision bump
        assert 0 <= r.neg_id < n_docs
    # deterministic
    assert rows == sample_negatives(spark, sf_dir).collect()


def test_nested_lines_match_flat_agg(spark, sf_dir):
    from pyspark.sql import functions as F
    from project_final_parquet_spark.operators.relational4 import (
        q62_nested_order_lines,
    )

    nested = {
        r.o_orderkey: (r.n_lines, r.max_price)
        for r in q62_nested_order_lines(spark, sf_dir).collect()
    }
    flat = {
        r.l_orderkey: (r.n, r.mx)
        for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter("l_orderkey < 100")
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    }
    assert nested == flat


def test_hll_union_within_bounds(spark, sf_dir):
    from project_final_parquet_spark.operators.relational4 import (
        q63_hll_sketch_union,
    )

    rows = q63_hll_sketch_union(spark, sf_dir).collect()
    assert rows
    assert all(r.within_bounds for r in rows)
