"""Degree-structure analytics on the co-purchase graph (round 9): the
average-neighbor-degree curve (the knn(k) degree-correlation profile
behind the assortativity scalar) and bounded 3-step Katz centrality via
two message-passing joins — the walk-counting shape that generalizes to
any fixed-depth influence score without materializing matrix powers.

Not in the reference (no graph surface — SURVEY.md §2.1); consumes the
shared ``copurchase_edges`` derivation (graph.py:249) like the rest of
the graph family.

Determinism: degrees and walk counts are exact integers; Katz's β=1/8
attenuation is the exact rational (64·w1 + 8·w2 + w3) / 512 evaluated
as one double division; the knn curve is per-vertex double divisions
DSUM-folded per degree bucket; all top-k orderings tiebreak on node id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ckpt import checkpoint
from ..registry import DSUM_SQL, dsum, query
from .graph import copurchase_edges

# The relational edge spec shared by every graph oracle (the Spark side
# uses the basket-bounded array form of copurchase_edges; the self-join
# remains the clearest DuckDB spec — graph.py:261).
_EDGES_CTES = """
    pairs AS (
      SELECT DISTINCT l1.l_orderkey AS ok, l1.l_partkey AS a,
             l2.l_partkey AS b
      FROM lineitem l1
      JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    ),
    edges AS (
      SELECT a, b FROM pairs GROUP BY a, b HAVING COUNT(*) >= 2
    ),
    adj AS (
      SELECT a AS v, b AS nbr FROM edges
      UNION ALL
      SELECT b AS v, a AS nbr FROM edges
    ),
    deg AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY v
    )
"""

_KATZ_TOPK = 20


@query(
    "graph_avg_neighbor_degree",
    oracle=f"""
    WITH {_EDGES_CTES},
    per_v AS (
      SELECT adj.v, MAX(dv.d) AS d,
             CAST(SUM(dn.d) AS BIGINT) AS sum_nbr_deg
      FROM adj
      JOIN deg dv ON dv.v = adj.v
      JOIN deg dn ON dn.v = adj.nbr
      GROUP BY adj.v
    )
    SELECT d AS degree, CAST(COUNT(*) AS BIGINT) AS n_vertices,
           {DSUM_SQL.format(
               expr="CAST(sum_nbr_deg AS DOUBLE) / d"
           )} / COUNT(*) AS avg_neighbor_degree
    FROM per_v GROUP BY d ORDER BY degree
    """,
)
def graph_avg_neighbor_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The degree-correlation curve knn(k): for each degree k, the mean
    (over vertices of degree k) of the average degree of their
    neighbors. Where graph_degree_assortativity compresses mixing into
    one scalar, this curve shows WHERE the mixing happens — a rising
    knn(k) means hubs attach to hubs (assortative core), a falling one
    means hubs fan out to leaves (the dependency/star pattern that
    makes skew-salting necessary downstream).

    Scale: degrees are one map-side count on the shared edge frame;
    the neighbor-degree sum is ONE hash join of the adjacency list
    against the (vertex, degree) frame — co-partitioned on the vertex
    key, Σd rows total, never a 2-hop blow-up. The curve frame is at
    most |distinct degrees| rows.

    The edge list is checkpointed once (optimization r14): the plan
    references the adjacency through deg, dn AND the join input —
    column-pruned subtrees AQE exchange reuse never serves (the r13
    laspeyres finding), so the before-plan re-derived copurchase_edges
    from parquet 12 times. EXECUTES the edge derivation at
    construction (registry contract note)."""
    edges = checkpoint(copurchase_edges(spark, sf_dir))
    adj = edges.select(F.col("a").alias("v"), F.col("b").alias("nbr")).unionAll(
        edges.select(F.col("b").alias("v"), F.col("a").alias("nbr"))
    )
    deg = adj.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("d"))
    dn = deg.select(F.col("v").alias("nbr"), F.col("d").alias("dn"))
    per_v = (
        adj.join(deg, "v")
        .join(dn, "nbr")
        .groupBy("v")
        .agg(
            F.max("d").alias("d"),
            F.sum("dn").cast("long").alias("sum_nbr_deg"),
        )
    )
    return (
        per_v.groupBy(F.col("d").alias("degree"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vertices"),
            (
                dsum(F.col("sum_nbr_deg").cast("double") / F.col("d"))
                / F.count(F.lit(1))
            ).alias("avg_neighbor_degree"),
        )
        .orderBy("degree")
    )


@query(
    "graph_katz_3step",
    oracle=f"""
    WITH {_EDGES_CTES},
    w2 AS (
      SELECT adj.v, CAST(SUM(dn.d) AS BIGINT) AS w2
      FROM adj JOIN deg dn ON dn.v = adj.nbr GROUP BY adj.v
    ),
    w3 AS (
      SELECT adj.v, CAST(SUM(n2.w2) AS BIGINT) AS w3
      FROM adj JOIN w2 n2 ON n2.v = adj.nbr GROUP BY adj.v
    )
    SELECT deg.v AS node, deg.d AS degree,
           CAST(64 * deg.d + 8 * w2.w2 + w3.w3 AS DOUBLE) / 512 AS katz
    FROM deg JOIN w2 ON w2.v = deg.v JOIN w3 ON w3.v = deg.v
    ORDER BY katz DESC, node LIMIT {_KATZ_TOPK}
    """,
)
def graph_katz_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Katz centrality truncated at walk length 3 with attenuation
    β = 1/8: katz(v) = β·w1(v) + β²·w2(v) + β³·w3(v) where wk counts
    length-k walks from v — computed by TWO message-passing joins
    (w2 = neighbor degrees summed, w3 = neighbor w2 summed), never a
    matrix power. Top-20 by score (node-id tiebreak). The bounded-depth
    form is the production Katz: the infinite series needs spectral
    convergence checks, while 3 steps ranks influence identically on
    sparse commerce graphs and costs two joins.

    Determinism: walk counts are exact BIGINTs (w3 ≤ d·max(w2) —
    orders of magnitude under int64 at any realistic degree); the
    single division by 512 is one IEEE op, identical in both engines.

    Scale: both joins are adjacency-vs-vertex-frame hash joins
    co-partitioned on the vertex key (Σd rows shuffled per step —
    the PageRank contribution shape); the result is TakeOrdered
    top-20, no global sort materialized.

    Edge list checkpointed once (optimization r14): deg feeds w2, w2
    feeds w3, and the final three-way join references deg AND w2 AND
    w3 — nested column-pruned consumers that re-derived the edge list
    from parquet 24 times in the before-plan (AQE exchange reuse never
    fires across them, the r13 laspeyres finding). EXECUTES the edge
    derivation at construction (registry contract note)."""
    edges = checkpoint(copurchase_edges(spark, sf_dir))
    adj = edges.select(F.col("a").alias("v"), F.col("b").alias("nbr")).unionAll(
        edges.select(F.col("b").alias("v"), F.col("a").alias("nbr"))
    )
    deg = adj.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("d"))
    dn = deg.select(F.col("v").alias("nbr"), F.col("d").alias("dn"))
    w2 = (
        adj.join(dn, "nbr")
        .groupBy("v")
        .agg(F.sum("dn").cast("long").alias("w2"))
    )
    n2 = w2.select(F.col("v").alias("nbr"), F.col("w2").alias("nw2"))
    w3 = (
        adj.join(n2, "nbr")
        .groupBy("v")
        .agg(F.sum("nw2").cast("long").alias("w3"))
    )
    katz = (
        64 * F.col("d") + 8 * F.col("w2") + F.col("w3")
    ).cast("double") / F.lit(512)
    return (
        deg.join(w2, "v")
        .join(w3, "v")
        .select(
            F.col("v").alias("node"),
            F.col("d").alias("degree"),
            katz.alias("katz"),
        )
        .orderBy(F.desc("katz"), "node")
        .limit(_KATZ_TOPK)
    )


@query(
    "graph_wcc_sizes",
    oracle=f"""
    WITH RECURSIVE {_EDGES_CTES},
    verts AS (SELECT DISTINCT v FROM adj),
    reach(u, label) AS (
      SELECT v AS u, v AS label FROM verts
      UNION
      SELECT adj.v, r.label
      FROM adj JOIN reach r ON adj.nbr = r.u
    ),
    comp AS (
      SELECT u, CAST(MIN(label) AS BIGINT) AS component_id
      FROM reach GROUP BY u
    ),
    sizes AS (
      SELECT component_id, CAST(COUNT(*) AS BIGINT) AS sz
      FROM comp GROUP BY component_id
    )
    SELECT sz AS component_size,
           CAST(COUNT(*) AS BIGINT) AS n_components
    FROM sizes GROUP BY sz ORDER BY component_size
    """,
)
def graph_wcc_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weakly-connected-component size distribution of the co-purchase
    graph — the most basic graph-health readout the family was missing
    (PageRank/k-core/LPA all assume you already know whether the graph
    is one giant component or confetti). Components come from the SAME
    converged min-label propagation dedup_cluster_components uses
    (pointer doubling, iterate-to-fixpoint with per-round checkpoints —
    dedup.py:443), applied to the shared copurchase edge derivation;
    the oracle is the exact recursive-CTE min-reachable-label.

    NOTE: iterative — EXECUTES work at construction (the registry
    contract note lists it).

    Scale: each round is two vertex-key joins + a min-aggregate,
    round count logarithmic in diameter (pointer doubling), per-round
    checkpoint keeps lineage flat; the histogram is two tiny rollups
    over the |V|-row label frame."""
    from ..ckpt import checkpoint, release
    from .dedup import connected_components_converged

    edges = checkpoint(copurchase_edges(spark, sf_dir))
    adj = edges.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
        edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    # hops_per_round=3: the co-purchase graph has non-trivial component
    # diameter (≤ 14-node components at sf0.1 — 7 one-hop rounds), and
    # the round count, not per-round bytes, is what wcc pays for
    # (optimization r14; measured 7 → 3 rounds, see dedup.py)
    labels, _rounds = connected_components_converged(adj, hops_per_round=3)
    release(edges)
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("component_size")
    )
    return (
        sizes.groupBy("component_size")
        .agg(F.count(F.lit(1)).cast("long").alias("n_components"))
        .orderBy("component_size")
    )
