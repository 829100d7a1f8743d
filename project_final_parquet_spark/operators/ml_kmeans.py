"""Iterative distributed k-means (Lloyd's algorithm) over embeddings —
the engine's iterative-algorithm pattern (not in the reference; SURVEY.md
§2.2 has no iterative/ML surface at all).

Determinism discipline (what makes an EXACT DuckDB oracle possible for an
iterative float algorithm):
- init: centroids = embeddings of vec_id 0..k-1 (fixed, no RNG);
- assignment: squared-L2 distance summed as floor-scaled integers →
  argmin is integer comparison, ties break on cluster id;
- update: per-dimension mean via floor-scaled integer sums (exact,
  order-independent) — the same convention as sim_centroids;
- fixed iteration count (the cross-engine-comparable form of a
  convergence loop).

Scale (100 TB): each iteration is one broadcast of k×64 centroid values
+ one map-side assignment + one (cluster, dim)-keyed partial-agg shuffle
whose size is k×64 rows per task — the textbook distributed k-means
shuffle budget. The iteration loop lives on the driver; data never does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

_K = 4
_ITERS = 3
_DIM = 64
_CSCALE = 1_000_000_000  # centroid mean scaling (exact integer sums)
_DSCALE = 1_000_000_000_000  # distance scaling ((v-c)^2 ~ 1e-4)


# --- DuckDB oracle generation ----------------------------------------------


def _sql_dist(vec: str, cent: str) -> str:
    """Σ_d floor((v_d - c_d)² · S) as BIGINT — deterministic distance."""
    return f"""list_aggregate(list_transform(range({_DIM}),
      d -> CAST(floor((CAST({vec}[d+1] AS DOUBLE) - {cent}[d+1])
                      * (CAST({vec}[d+1] AS DOUBLE) - {cent}[d+1])
                      * {_DSCALE}.0) AS BIGINT)), 'sum')"""


def _kmeans_cte_prefix() -> tuple[str, str]:
    """The shared iterative CTE chain (cent0 → assign{N-1}) and the name
    of the final assignment CTE — reused by the purity eval oracle."""
    parts = [
        f"""
    WITH cent0 AS (
      SELECT vec_id AS cid,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c
      FROM embeddings WHERE vec_id < {_K}
    )"""
    ]
    prev = "cent0"
    for i in range(_ITERS):
        parts.append(
            f""",
    assign{i} AS (
      SELECT vec_id, embedding, cid FROM (
        SELECT e.vec_id, e.embedding, c0.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_sql_dist('e.embedding', 'c0.c')}, c0.cid
               ) AS rn
        FROM embeddings e CROSS JOIN {prev} c0
      ) ranked WHERE rn = 1
    ),
    cent{i + 1} AS (
      SELECT cid, list(cd ORDER BY d) AS c FROM (
        SELECT cid, d,
               (CAST(SUM(CAST(floor(CAST(embedding[d+1] AS DOUBLE)
                    * {_CSCALE}.0) AS BIGINT)) AS DOUBLE) / {_CSCALE}.0)
                 / COUNT(*) AS cd
        FROM assign{i} CROSS JOIN (SELECT unnest(range({_DIM})) AS d) dims
        GROUP BY cid, d
      ) t GROUP BY cid
    )"""
        )
        prev = f"cent{i + 1}"
    return "".join(parts), f"assign{_ITERS - 1}"


def _kmeans_oracle() -> str:
    prefix, last = _kmeans_cte_prefix()
    return (
        prefix
        + f"""
    SELECT a.cid AS cluster_id, COUNT(*) AS n_points,
           CAST(MIN(a.vec_id) AS BIGINT) AS min_vec_id
    FROM {last} a
    GROUP BY a.cid
    ORDER BY a.cid
    """
    )


# --- Spark implementation --------------------------------------------------


def _spark_dist(vec, cent):
    diff2 = F.zip_with(
        vec,
        cent,
        lambda x, y: F.floor(
            (x.cast("double") - y) * (x.cast("double") - y) * _DSCALE
        ),
    )
    return F.aggregate(diff2, F.lit(0).cast("long"), lambda a, v: a + v)


def _lloyd(
    emb: DataFrame, iters: int, *, converge: bool = False
) -> tuple[DataFrame, int]:
    """Run Lloyd iterations; returns (assignment frame, rounds executed).

    ``converge=False``: exactly ``iters`` rounds (the oracle form).
    ``converge=True``: stop as soon as a round leaves the assignment
    unchanged (Lloyd's fixed point — once assignments repeat, centroids
    repeat and so does every later round), bounded by ``iters``. The
    stability probe is one join-count over the checkpointed (vec_id, cid)
    frames — tiny next to the round's scoring pass."""
    from pyspark.sql import Window as W

    centroids = emb.filter(F.col("vec_id") < _K).select(
        F.col("vec_id").alias("cid"),
        F.transform("embedding", lambda x: x.cast("double")).alias("c"),
    )
    assigned = None
    rounds = 0
    for _ in range(iters):
        # assignment: broadcast k centroid arrays, argmin by (dist, cid)
        scored = emb.crossJoin(F.broadcast(centroids)).select(
            "vec_id",
            "embedding",
            "cid",
            _spark_dist(F.col("embedding"), F.col("c")).alias("dist"),
        )
        w = W.partitionBy("vec_id").orderBy("dist", "cid")
        # checkpoint the ASSIGNMENT (not the centroids): it truncates
        # lineage equally, the final round's centroid update then never
        # executes (nothing reads it), and the returned aggregation
        # reuses the materialized assignment instead of recomputing it.
        # NOTE: eager — this query executes during construction (see
        # registry.py on iterative queries).
        prev = assigned
        assigned = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "embedding", "cid")
            .localCheckpoint()
        )
        rounds += 1
        if converge and prev is not None:
            moved = (
                assigned.select("vec_id", "cid")
                .join(
                    prev.select(
                        "vec_id", F.col("cid").alias("prev_cid")
                    ),
                    "vec_id",
                )
                .filter(F.col("cid") != F.col("prev_cid"))
            )
            if moved.isEmpty():
                break
        # update: exact per-dimension means via scaled-integer sums
        exploded = assigned.select(
            "cid", F.posexplode("embedding").alias("d", "val")
        ).withColumn("sv", F.floor(F.col("val").cast("double") * _CSCALE))
        per_dim = (
            exploded.groupBy("cid", "d")
            .agg(
                (
                    (F.sum("sv").cast("double") / _CSCALE) / F.count(F.lit(1))
                ).alias("cd")
            )
        )
        centroids = per_dim.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "cd"))),
                lambda s: s["cd"],
            ).alias("c")
        )
    return assigned, rounds


def _cluster_sizes(assigned: DataFrame) -> DataFrame:
    return (
        assigned.groupBy(F.col("cid").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("vec_id").alias("min_vec_id"),
        )
        .orderBy("cluster_id")
    )


@query("ml_kmeans", oracle=_kmeans_oracle())
def ml_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means(k=4, 3 Lloyd iterations) cluster sizes over embeddings."""
    emb = load(spark, sf_dir, "embeddings")
    assigned, _ = _lloyd(emb, _ITERS)
    return _cluster_sizes(assigned)


def ml_kmeans_converged(
    spark: SparkSession, sf_dir: str, max_iters: int = 25
) -> tuple[DataFrame, int]:
    """Production k-means: Lloyd with assignment-stability early stop
    (bounded by ``max_iters``). Returns (cluster sizes, rounds run); a
    round whose assignment matches the previous one is the fixed point,
    so the result equals any longer fixed-iteration run from the same
    init."""
    emb = load(spark, sf_dir, "embeddings")
    assigned, rounds = _lloyd(emb, max_iters, converge=True)
    return _cluster_sizes(assigned), rounds


def _purity_oracle() -> str:
    prefix, last = _kmeans_cte_prefix()
    return (
        prefix
        + f""",
    lab AS (
      SELECT a.cid, e2.label, COUNT(*) AS c
      FROM {last} a JOIN embeddings e2 ON a.vec_id = e2.vec_id
      GROUP BY a.cid, e2.label
    ),
    best AS (
      SELECT cid, label, c,
             ROW_NUMBER() OVER (
               PARTITION BY cid ORDER BY c DESC, label) AS rn,
             SUM(c) OVER (PARTITION BY cid) AS n
      FROM lab
    )
    SELECT cid AS cluster_id,
           CAST(n AS BIGINT) AS n_points,
           CAST(label AS INT) AS majority_label,
           CAST(c AS BIGINT) AS majority_count,
           CAST((1000 * c) // n AS BIGINT) AS purity_x1000
    FROM best WHERE rn = 1
    ORDER BY cluster_id
    """
    )


@query("ml_cluster_purity", oracle=_purity_oracle())
def ml_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-quality evaluation: per k-means cluster, the majority
    ground-truth label and purity (majority share, ×1000 integer) — the
    standard external validation metric, making cluster quality a
    MEASURED number like dedup_eval_recall does for LSH recall. Runs
    the same 3 Lloyd iterations (exact iterative oracle), then one
    (cid, label) count and a cluster-sized window. Executes iterations
    at construction (registry contract note)."""
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings")
    assigned, _ = _lloyd(emb, _ITERS)
    lab = (
        assigned.select("vec_id", "cid")
        .join(emb.select("vec_id", "label"), "vec_id")
        .groupBy("cid", "label")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("cid")
    best = lab.select(
        "cid",
        "label",
        "c",
        F.row_number()
        .over(w.orderBy(F.desc("c"), "label"))
        .alias("rn"),
        F.sum("c").over(w).alias("n"),
    )
    return (
        best.filter(F.col("rn") == 1)
        .select(
            F.col("cid").alias("cluster_id"),
            F.col("n").alias("n_points"),
            F.col("label").cast("int").alias("majority_label"),
            F.col("c").alias("majority_count"),
            F.expr("1000 * c div n").alias("purity_x1000"),
        )
        .orderBy("cluster_id")
    )
