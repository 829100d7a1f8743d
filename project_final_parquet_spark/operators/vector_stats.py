"""Embedding-corpus statistics: the per-dimension profile an embedding
pipeline materializes before normalization / quantization / whitening
(feature scaling needs mean+std per dim; quantizer calibration needs
min/max per dim).

Not in the reference (no vector surface there, SURVEY.md §2.1); extends
the similarity/ANN family (operators/similarity*.py) with the stats
pass its quantizers (int8 scalar, PQ codebooks) assume as given.

Determinism: per-row double arithmetic (float→double widening is exact)
with FLOOR-SCALED BIGINT sums (the ml_kmeans convention) rather than
DECIMAL(38,10): raw float values can terminate at exactly 11 decimal
digits ending in 5 (any odd·2⁻¹¹ does), where Spark's HALF_UP and
DuckDB's tie-rounding disagree by one decimal ulp — floor() has no
ties. Variance uses the E[x²]−E[x]² form over those exact integer sums,
so both engines do identical IEEE ops on identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

_DIM = 64
_VSCALE = 1_000_000_000_000  # 1e-12 granularity; 64·N·0.5·1e12 ≪ 2^63


@query(
    "embeddings_dim_stats",
    oracle=f"""
    WITH flat AS (
      SELECT i AS dim, CAST(embedding[i + 1] AS DOUBLE) AS v
      FROM embeddings
      CROSS JOIN (SELECT unnest(range({_DIM})) AS i) idx
    ),
    agg AS (
      SELECT dim,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(floor(v * {_VSCALE}.0) AS BIGINT)) AS BIGINT)
               AS s1,
             CAST(SUM(CAST(floor(v * v * {_VSCALE}.0) AS BIGINT)) AS BIGINT)
               AS s2,
             MIN(v) AS min_val, MAX(v) AS max_val
      FROM flat GROUP BY dim
    )
    SELECT dim,
           CAST(s1 AS DOUBLE) / {_VSCALE}.0 / n AS mean_val,
           sqrt(CAST(s2 AS DOUBLE) / {_VSCALE}.0 / n
                - (CAST(s1 AS DOUBLE) / {_VSCALE}.0 / n)
                  * (CAST(s1 AS DOUBLE) / {_VSCALE}.0 / n)) AS std_val,
           min_val, max_val
    FROM agg ORDER BY dim
    """,
)
def embeddings_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean / population-std / min / max over the whole
    embedding corpus — the calibration scan for scalar quantization
    (min/max → int8 range) and standardization (mean/std → whitened
    inputs). posexplode flattens each vector to (dim, value); the 64-way
    group is map-side combined, so the shuffle carries 64 partials per
    task regardless of corpus size — the plan is a single pass at any
    scale."""
    emb = load(spark, sf_dir, "embeddings")
    flat = emb.select(
        F.posexplode("embedding").alias("dim", "vf")
    ).select("dim", F.col("vf").cast("double").alias("v"))
    scale = F.lit(float(_VSCALE))
    agg = flat.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.floor(F.col("v") * scale).cast("long")).cast("long").alias("s1"),
        F.sum(F.floor(F.col("v") * F.col("v") * scale).cast("long"))
        .cast("long")
        .alias("s2"),
        F.min("v").alias("min_val"),
        F.max("v").alias("max_val"),
    )
    mean = F.col("s1").cast("double") / scale / F.col("n")
    return agg.select(
        "dim",
        mean.alias("mean_val"),
        F.sqrt(
            F.col("s2").cast("double") / scale / F.col("n") - mean * mean
        ).alias("std_val"),
        "min_val",
        "max_val",
    ).orderBy("dim")


# --- k-NN graph construction -----------------------------------------------

_KNN_SRC = 20  # source vectors whose neighborhoods we materialize
_KNN_K = 3


@query(
    "sim_knn_graph",
    oracle=f"""
    WITH srcs AS (
      SELECT vec_id AS src, embedding AS se FROM embeddings
      WHERE vec_id < {_KNN_SRC}
    ),
    scored AS (
      SELECT s.src, e.vec_id AS dst,
             list_aggregate(list_transform(range(64),
               j -> CAST(s.se[j+1] AS DOUBLE) * CAST(e.embedding[j+1] AS DOUBLE)),
               'sum')
             / (sqrt(list_aggregate(list_transform(range(64),
                  j -> CAST(s.se[j+1] AS DOUBLE) * CAST(s.se[j+1] AS DOUBLE)),
                  'sum'))
                * sqrt(list_aggregate(list_transform(range(64),
                    j -> CAST(e.embedding[j+1] AS DOUBLE)
                         * CAST(e.embedding[j+1] AS DOUBLE)), 'sum')))
               AS cosine
      FROM embeddings e CROSS JOIN srcs s
      WHERE e.vec_id <> s.src
    )
    SELECT src, rank, dst, cosine FROM (
      SELECT src, dst, cosine,
             ROW_NUMBER() OVER (
               PARTITION BY src ORDER BY cosine DESC, dst
             ) AS rank
      FROM scored
    ) t WHERE rank <= {_KNN_K}
    ORDER BY src, rank
    """,
)
def sim_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN graph construction: exact cosine top-{_KNN_K} neighbor edges
    for a source set — the adjacency a graph-based dedup / HNSW build /
    label-propagation pass consumes. The source vectors BROADCAST and
    every corpus partition scores them map-side (one pass over the big
    table, no shuffle of it); the per-src top-k ranks |src|·k rows.

    Scale: cost is |corpus|·|src| dot products, embarrassingly parallel;
    growing the source set shards it (each shard is this same plan), and
    the LSH/IVF variants (sim_ann_lsh, sim_ivf_multiprobe) replace the
    full scan when |src| ≈ |corpus|."""
    emb = load(spark, sf_dir, "embeddings")
    srcs = emb.filter(F.col("vec_id") < _KNN_SRC).select(
        F.col("vec_id").alias("src"), F.col("embedding").alias("se")
    )
    from .similarity import _dot, _norm

    scored = (
        emb.crossJoin(F.broadcast(srcs))
        .filter(F.col("vec_id") != F.col("src"))
        .select(
            "src",
            F.col("vec_id").alias("dst"),
            (
                _dot(F.col("se"), F.col("embedding"))
                / (_norm(F.col("se")) * _norm(F.col("embedding")))
            ).alias("cosine"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("src").orderBy(F.desc("cosine"), "dst")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _KNN_K)
        .select("src", "rank", "dst", "cosine")
        .orderBy("src", "rank")
    )
