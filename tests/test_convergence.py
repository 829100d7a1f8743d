"""Convergence-aware iteration (VERDICT r1 item 3 / ADVICE):
early-stop variants must equal the fixed-iteration oracle form while
executing fewer rounds, and must NOT silently split components whose
diameter exceeds the fixed round budget.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from project_final_parquet_spark.operators.dedup import (
    connected_components,
    connected_components_converged,
)
from project_final_parquet_spark.operators.ml_kmeans import (
    _cluster_sizes,
    _lloyd,
    ml_kmeans_converged,
)
from project_final_parquet_spark.tables import load


def _sym(spark, pairs):
    df = spark.createDataFrame(pairs, "u long, v long")
    return df.union(df.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _label_map(labels_df):
    return {r.u: r.label for r in labels_df.collect()}


def test_cc_converged_equals_fixed_with_fewer_rounds(spark):
    # pairs/triples (the dedup corpus shape): fixed point after 1
    # effective round, detected on the round after — well under the
    # fixed budget of 6
    edges = [(0, 1), (1, 2), (10, 11), (20, 21), (21, 22), (22, 23)]
    sym = _sym(spark, edges)
    fixed = _label_map(connected_components(sym, 6))
    converged, rounds = connected_components_converged(sym, max_iters=6)
    assert _label_map(converged) == fixed
    assert rounds < 6


def test_cc_converged_survives_diameter_beyond_fixed_budget(spark):
    # 40-node chain, diameter 39: a fixed 4-round run (2^4 = 16) SPLITS
    # the component — the silent failure mode ADVICE flagged — while the
    # converged variant keeps iterating to the fixed point.
    chain = _sym(spark, [(i, i + 1) for i in range(40)])
    split = set(_label_map(connected_components(chain, 4)).values())
    assert len(split) > 1  # the failure mode is real
    labels, rounds = connected_components_converged(chain, max_iters=32)
    assert set(_label_map(labels).values()) == {0}
    assert rounds <= 8  # log-diameter + 1 detection round, not 32


def test_pagerank_eps_stop_bounds_final_error(spark, sf_dir):
    # eps-stop PageRank: terminates well under the budget, and the
    # geometric tail bound holds — once a round's max delta < eps, all
    # later movement is < eps * damp/(1-damp) ≈ 5.67·eps, so ranks are
    # within 6.7·eps of a longer fixed run.
    from project_final_parquet_spark.operators.graph import (
        _ITERS,
        graph_pagerank,
        graph_pagerank_converged,
    )

    # deltas shrink 0.85× per round, so rounds-to-eps ≈ ln(Δ₁/eps)/0.1625
    # — eps=0.02 lands ≈ 30 rounds on this graph, safely inside budget
    eps = 0.02
    top, rounds = graph_pagerank_converged(spark, sf_dir, eps=eps, max_iters=45)
    assert _ITERS < rounds < 45  # converged past the gated form's budget
    got = {r.node_id: r.rank for r in top.collect()}
    # reference: a fixed run 5 rounds longer (safely past the stop)
    from project_final_parquet_spark.operators.graph import (
        _pagerank_ranks,
        _SUPP_OFFSET,
    )
    from project_final_parquet_spark.tables import load

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pair = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("u"),
            (F.col("l_suppkey") + _SUPP_OFFSET).alias("v"),
        )
        .distinct()
    )
    edges = pair.union(
        pair.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    longer, _ = _pagerank_ranks(edges, iters=rounds + 5)
    ref = {r.u: r.rank for r in longer.collect()}
    assert all(abs(ref[n] - got[n]) < 6.7 * eps for n in got)


def test_kmeans_converged_equals_fixed_point(spark, sf_dir):
    sizes, rounds = ml_kmeans_converged(spark, sf_dir, max_iters=25)
    got = [(r.cluster_id, r.n_points, r.min_vec_id) for r in sizes.collect()]
    assert rounds < 25  # genuinely early-stopped
    # a fixed-iteration run of the same length is identical (it IS the
    # same computation), and running PAST the fixed point changes
    # nothing — the definition of Lloyd convergence
    emb = load(spark, sf_dir, "embeddings")
    assigned_more, _ = _lloyd(emb, rounds + 2)
    more = [
        (r.cluster_id, r.n_points, r.min_vec_id)
        for r in _cluster_sizes(assigned_more).collect()
    ]
    assert got == more
