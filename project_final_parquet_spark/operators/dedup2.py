"""Cluster canonicalization — the step after near-dup clustering that
actually dedups the corpus: pick ONE representative per duplicate
cluster and report what was dropped.

Survivor policy: richest document wins (max n_chars), ties broken by
lowest doc_id — a total order, so the pick is deterministic and
cross-engine. This is the policy step most dedup pipelines bolt onto
MinHash+CC (keep the longest member, drop the rest).

Scale: inherits the CC labels (pointer-doubling, see dedup.py); the
canonicalization itself is one (component) shuffle — a window
row_number over each cluster plus a size count. Cluster cardinalities
are near-dup groups (pairs/triples, bounded by the LSH bucket sizes),
so no window partition is unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load
from .dedup import _CC_ITERS, _minhash_pairs, _minhash_pairs_sql, connected_components


@query(
    "dedup_canonicalize",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      SELECT doc_a, doc_b FROM ({_minhash_pairs_sql()}) p
    ),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION ALL
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    reach(u, label) AS (
      SELECT u, u AS label FROM (SELECT DISTINCT u FROM edges) n
      UNION
      SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.u
    ),
    labels AS (
      SELECT u AS doc_id, CAST(MIN(label) AS BIGINT) AS component_id
      FROM reach GROUP BY u
    ),
    ranked AS (
      SELECT l.component_id, l.doc_id, d.n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY l.component_id
               ORDER BY d.n_chars DESC, l.doc_id) AS rn
      FROM labels l JOIN documents d ON l.doc_id = d.doc_id
    )
    SELECT component_id,
           CAST(COUNT(*) AS BIGINT) AS cluster_size,
           CAST(MAX(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT)
             AS rep_doc_id,
           CAST(MAX(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT)
             AS rep_n_chars,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped
    FROM ranked
    GROUP BY component_id
    ORDER BY component_id
    """,
)
def dedup_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per near-dup cluster: size, surviving representative (max
    n_chars, tie → min doc_id), and how many members get dropped.
    Executes the CC iterations at construction (see registry contract
    note on iterative queries)."""
    pairs = (
        _minhash_pairs(spark, sf_dir, persist=False, ordered=False)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    edges = pairs.union(
        pairs.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    ).withColumnsRenamed({"doc_a": "u", "doc_b": "v"})
    labels = connected_components(edges, _CC_ITERS).select(
        F.col("u").alias("doc_id"), F.col("label").alias("component_id")
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ranked = labels.join(docs, "doc_id").withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("component_id").orderBy(
                F.desc("n_chars"), "doc_id"
            )
        ),
    )
    return (
        ranked.groupBy("component_id")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias(
                "rep_doc_id"
            ),
            F.max(F.when(F.col("rn") == 1, F.col("n_chars"))).alias(
                "rep_n_chars"
            ),
            (F.count(F.lit(1)) - F.lit(1)).alias("n_dropped"),
        )
        .orderBy("component_id")
    )
