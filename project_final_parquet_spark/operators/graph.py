"""PageRank over the customer↔supplier trade graph — the iterative
link-analysis representative (beside connected components and k-means,
the third classic iterate-until-stable distributed algorithm).

Graph: bipartite, nodes = customers ∪ suppliers (supplier ids offset to
disjoint range), one undirected edge per distinct (customer, supplier)
trading pair from orders⋈lineitem; undirected = each edge contributes
in both directions, so out-degree == degree.

Determinism: contributions rank/degree are per-edge double math
(bit-identical cross-engine), then quantized to a 1e-9 fixed-point
BIGINT (floor of an identical double is identical) and summed as exact
integers — order-free and engine-free, with no decimal-rounding
semantics in play at all. The damping update 0.15 + 0.85·s is a fixed
textual expression over the de-quantized sum, so 3 unrolled rounds
match the DuckDB oracle exactly (the chained-iteration analog of the
scaled-integer trick sim_ivf_probe uses for centroid distances).

Scale (100 TB of edges): per round = one join (ranks⋈edges, both
pre-partitioned on node id — co-partitioned, no re-shuffle of the edge
list after the first round) + one aggregate with map-side combine.
Lineage is truncated per round (localCheckpoint; cluster jobs use
checkpoint()); the production form adds an |Δrank|<ε early stop like
connected_components_converged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

_ITERS = 3
_SUPP_OFFSET = 1_000_000
_DAMP = "0.85"
_TELEPORT = "0.15"
_SCALE = 1_000_000_000  # fixed-point quantum for contributions


def _edges_sql() -> str:
    return f"""
    SELECT DISTINCT o.o_custkey AS u,
           l.l_suppkey + {_SUPP_OFFSET} AS v
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    """


def _pagerank_oracle() -> str:
    sql = f"""
    WITH pair AS ({_edges_sql()}),
    edges AS (
      SELECT u, v FROM pair
      UNION ALL
      SELECT v AS u, u AS v FROM pair
    ),
    deg AS (
      SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY u
    ),
    r0 AS (SELECT u, 1.0 AS rank FROM deg)
    """
    prev = "r0"
    cq = (
        "CAST(floor(r.rank / CAST(d.deg AS DOUBLE) "
        f"* {_SCALE}.0 + 0.5) AS BIGINT)"
    )
    for k in range(1, _ITERS + 1):
        sql += f""",
    s{k} AS (
      SELECT e.v AS u, CAST(SUM({cq}) AS BIGINT) AS s
      FROM edges e
      JOIN {prev} r ON e.u = r.u
      JOIN deg d ON e.u = d.u
      GROUP BY e.v
    ),
    r{k} AS (
      SELECT deg.u,
             {_TELEPORT} + {_DAMP}
               * (CAST(COALESCE(s{k}.s, 0) AS DOUBLE) / {_SCALE}.0) AS rank
      FROM deg LEFT JOIN s{k} ON deg.u = s{k}.u
    )
    """
        prev = f"r{k}"
    sql += f"""
    SELECT u AS node_id,
           CASE WHEN u >= {_SUPP_OFFSET} THEN 'supplier'
                ELSE 'customer' END AS node_type,
           rank
    FROM {prev}
    ORDER BY rank DESC, node_id
    LIMIT 20
    """
    return sql


@query("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 unrolled PageRank rounds (damping 0.85) on the bipartite
    customer↔supplier graph; top-20 nodes by rank. Executes iterations
    at construction (registry contract note on iterative queries)."""
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
    ).localCheckpoint()
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))

    ranks, _rounds = _pagerank_ranks(edges, deg, iters=_ITERS)

    return (
        ranks.select(
            F.col("u").alias("node_id"),
            F.when(F.col("u") >= _SUPP_OFFSET, F.lit("supplier"))
            .otherwise(F.lit("customer"))
            .alias("node_type"),
            "rank",
        )
        .orderBy(F.desc("rank"), "node_id")
        .limit(20)
    )


def _pagerank_ranks(
    edges: DataFrame,
    deg: DataFrame,
    *,
    iters: int | None = None,
    eps: float | None = None,
    max_iters: int = 50,
) -> tuple[DataFrame, int]:
    """Shared PageRank loop. ``iters`` = fixed rounds (the exact-oracle
    form); ``eps`` = production early stop, halting when
    max_u |rank_new − rank_old| < eps. Returns (ranks, rounds run).

    The eps probe is one join + max-aggregate over the checkpointed rank
    frame (n rows, trivially small next to the round's edge join). An
    EXACT cross-engine oracle for the eps form is impossible — the
    damping chain shrinks deltas by 0.85× per round, so an exact double
    fixed point takes ~700 rounds — which is why the gated query keeps
    the fixed-round form and this is the production entry point."""
    damp, tele = float(_DAMP), float(_TELEPORT)
    ranks = deg.select("u", F.lit(1.0).alias("rank"))
    rounds = 0
    budget = iters if iters is not None else max_iters
    for _ in range(budget):
        contrib = edges.join(ranks, "u").join(deg, "u").select(
            F.col("v").alias("dst"),
            F.floor(
                F.col("rank")
                / F.col("deg").cast("double")
                * F.lit(float(_SCALE))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("cq"),
        )
        sums = contrib.groupBy("dst").agg(F.sum("cq").alias("s"))
        new_ranks = (
            deg.join(sums, deg["u"] == sums["dst"], "left")
            .select(
                "u",
                (
                    F.lit(tele)
                    + F.lit(damp)
                    * (
                        F.coalesce(F.col("s"), F.lit(0)).cast("double")
                        / F.lit(float(_SCALE))
                    )
                ).alias("rank"),
            )
            .localCheckpoint()
        )
        rounds += 1
        if eps is not None:
            delta = (
                new_ranks.join(
                    ranks.select("u", F.col("rank").alias("prev")), "u"
                )
                .agg(F.max(F.abs(F.col("rank") - F.col("prev"))).alias("d"))
                .first()["d"]
            )
            ranks = new_ranks
            if delta is not None and delta < eps:
                break
        else:
            ranks = new_ranks
    return ranks, rounds


def graph_pagerank_converged(
    spark: SparkSession,
    sf_dir: str,
    eps: float = 1e-6,
    max_iters: int = 50,
) -> tuple[DataFrame, int]:
    """Production PageRank: iterate until max rank delta < ``eps``
    (bounded by ``max_iters``) instead of a fixed round count. Same
    graph, same per-round plan as the gated ``graph_pagerank``."""
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
    ).localCheckpoint()
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    ranks, rounds = _pagerank_ranks(edges, deg, eps=eps, max_iters=max_iters)
    return (
        ranks.select(
            F.col("u").alias("node_id"),
            F.when(F.col("u") >= _SUPP_OFFSET, F.lit("supplier"))
            .otherwise(F.lit("customer"))
            .alias("node_type"),
            "rank",
        )
        .orderBy(F.desc("rank"), "node_id")
        .limit(20)
    ), rounds


# --- triangle counting over the co-purchase graph ----------------------------


@query(
    "graph_triangle_count",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT l1.l_orderkey AS ok, l1.l_partkey AS a,
             l2.l_partkey AS b
      FROM lineitem l1
      JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    ),
    edges AS (
      SELECT a, b FROM pairs GROUP BY a, b HAVING COUNT(*) >= 2
    ),
    deg AS (
      SELECT v, COUNT(*) AS d FROM (
        SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges
      ) GROUP BY v
    ),
    tri AS (
      SELECT COUNT(*) AS t
      FROM edges e1
      JOIN edges e2 ON e2.a = e1.b
      JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_vertices,
           CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges,
           CAST((SELECT SUM(d * (d - 1) // 2) FROM deg) AS BIGINT)
             AS n_wedges,
           CAST((SELECT t FROM tri) AS BIGINT) AS n_triangles,
           CAST(3 * (SELECT t FROM tri) AS BIGINT)
             / NULLIF((SELECT SUM(d * (d - 1) // 2) FROM deg), 0)
             AS clustering
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the part
    co-purchase graph (edge = two parts bought together in >= 2
    orders). Triangles are counted on the ORIENTED graph (a < b < c,
    each triangle once): edges(a,b) ⋈ edges(b,c) ⋈ edges(a,c) — the
    standard distributed triangle enumeration; wedges Σ d(d-1)/2 give
    the closure ratio (3T / wedges), the density signal behind
    recommendation-graph quality checks.

    Scale: the only quadratic-looking step, per-order part pairs, is
    bounded by basket size (|order|² per order, never |parts|²); the
    oriented edge list keeps each triangle's enumeration unique with
    no post-dedup. The three edge-list references compile to ONE
    shuffle each on their join keys, and Spark's exchange reuse serves
    the repeated groupBy(a,b) exchange from cache rather than
    recomputing. At production scale the orientation is by (degree,
    id) instead of raw id — bounding e1's fan-out by arboricity
    (O(m^1.5) work total) — noted here because id-orientation is
    already exact for counting; integer division `div` keeps wedges
    exact at any degree."""
    # dedupe (order, part) BEFORE the self-join: the smaller relation
    # pays the distinct, and the a<b join then emits each (ok, a, b)
    # exactly once — no second distinct over the larger pair set
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    x, y = li.alias("x"), li.alias("y")
    pairs = x.join(
        y,
        (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
        & (F.col("x.l_partkey") < F.col("y.l_partkey")),
    ).select(
        F.col("x.l_orderkey").alias("ok"),
        F.col("x.l_partkey").alias("a"),
        F.col("y.l_partkey").alias("b"),
    )
    edges = (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("a", "b")
    )
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    nv = deg.agg(F.count(F.lit(1)).cast("long").alias("n_vertices"))
    ne = edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    nw = deg.agg(
        F.sum(F.expr("d * (d - 1) div 2")).cast("long").alias("n_wedges")
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    nt = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a"))
            & (F.col("e3.b") == F.col("e2.b")),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    return (
        nv.crossJoin(ne)
        .crossJoin(nw)
        .crossJoin(nt)
        .withColumn(
            "clustering",
            (F.lit(3) * F.col("n_triangles"))
            / F.nullif(F.col("n_wedges"), F.lit(0)),
        )
    )
