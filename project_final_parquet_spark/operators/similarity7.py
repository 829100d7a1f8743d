"""Round-7 ANN serving-infrastructure audits: IVF cell-balance and the
LSH multiprobe recall curve — the two numbers that TUNE an ANN index
(nlist/assignment balance and the radius-vs-recall trade), measured as
gated queries instead of asserted in prose.

Not in the reference (no vector surface, SURVEY.md §2.1); extends the
similarity family's serving shapes (sim_filtered_topk,
sim_multi_query_topk) with the index-maintenance side.

Determinism: cell stats are pure integers; the recall curve compares
integer candidate sets built from the SAME md5-derived hyperplanes and
the SAME left-fold cosine as sim_ann_lsh / sim_ann_multiprobe, with
every top-k totally ordered by (cosine, vec_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..registry import query
from ..tables import load
from .similarity import (
    _DIM,
    _DOT_SQL,
    _NORM_SQL,
    _bucket_expr,
    _bucket_sql,
    _dot,
    _norm,
)

_RECALL_K = 10
_RADII = [0, 1, 2, 3]


@query(
    "sim_ivf_balance_audit",
    oracle="""
    WITH cells AS (
      SELECT CAST(label AS INT) AS cell,
             CAST(COUNT(*) AS BIGINT) AS n_vectors
      FROM embeddings GROUP BY label
    ),
    tot AS (
      SELECT CAST(SUM(n_vectors) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_cells
      FROM cells
    )
    SELECT c.cell, c.n_vectors,
           CAST((1000000 * c.n_vectors) // t.total AS BIGINT) AS share_ppm,
           CAST((1000 * c.n_vectors * t.n_cells) // t.total AS BIGINT)
             AS vs_mean_x1000,
           t.n_cells, t.total
    FROM cells c CROSS JOIN tot t
    ORDER BY c.cell
    """,
)
def sim_ivf_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell-balance audit: per inverted-file cell (the label
    partitioning sim_ivf_probe / sim_ivf_pq probe), the vector count,
    corpus share (ppm), and the size-vs-mean ratio (×1000) — imbalance
    is THE failure mode of IVF serving (a cell at 10× the mean makes
    every probe touching it pay 10× the scan, and at rest it is the
    partition that skews the layout). This is the audit that decides
    when to re-train the coarse quantizer or split hot cells.

    Scale: ONE map-side-combined count per cell (|cells| rows out),
    one broadcast singleton for the totals — the corpus is touched
    once, nothing else ever exceeds |cells| rows. Pure integer ppm /
    ratio math, floor division on nonnegative values."""
    emb = load(spark, sf_dir, "embeddings")
    cells = emb.groupBy(F.col("label").cast("int").alias("cell")).agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors")
    )
    tot = cells.agg(
        F.sum("n_vectors").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "cell",
            "n_vectors",
            F.expr("1000000 * n_vectors div total")
            .cast("long")
            .alias("share_ppm"),
            F.expr("1000 * n_vectors * n_cells div total")
            .cast("long")
            .alias("vs_mean_x1000"),
            "n_cells",
            "total",
        )
        .orderBy("cell")
    )


@query(
    "sim_ann_recall_curve",
    oracle=f"""
    WITH buck AS (
      SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket
      FROM embeddings
    ),
    q AS (
      SELECT embedding AS qv, bucket AS qb,
             {_NORM_SQL.format(dim=_DIM, a='embedding')} AS nq
      FROM buck WHERE vec_id = 0
    ),
    scored AS (
      SELECT b.vec_id, b.bucket, q.qb,
             {_DOT_SQL.format(dim=_DIM, a='b.embedding', b='q.qv')}
               / ({_NORM_SQL.format(dim=_DIM, a='b.embedding')} * q.nq)
               AS cosine
      FROM buck b CROSS JOIN q
      WHERE b.vec_id <> 0
    ),
    truth AS (
      SELECT vec_id FROM scored
      ORDER BY cosine DESC, vec_id LIMIT {_RECALL_K}
    ),
    radii AS (
      SELECT unnest([{", ".join(str(r) for r in _RADII)}]) AS radius
    ),
    cand AS (
      SELECT r.radius, s.vec_id
      FROM scored s JOIN radii r
        ON bit_count(xor(s.bucket, s.qb)) <= r.radius
    )
    SELECT CAST(c.radius AS BIGINT) AS radius,
           CAST(COUNT(*) AS BIGINT) AS n_candidates,
           CAST(SUM(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hits,
           CAST((1000000 * SUM(CASE WHEN t.vec_id IS NOT NULL
                                    THEN 1 ELSE 0 END)) // {_RECALL_K}
                AS BIGINT) AS recall_ppm
    FROM cand c LEFT JOIN truth t ON c.vec_id = t.vec_id
    GROUP BY c.radius
    ORDER BY radius
    """,
)
def sim_ann_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH multiprobe recall curve, measured: for Hamming probe
    radius 0..3 around the query's hyperplane bucket (the exact
    sim_ann_multiprobe candidate rule), the candidate-set size and
    recall@{_RECALL_K} against the exact cosine top-{_RECALL_K} — the
    radius-vs-cost trade quantified as a gated query (this corpus
    climbs ≈0 → 0.2 → 0.7 → 0.9 while scanning ≈2% → 11% → 34% → 66%,
    tests/test_recall.py's finding promoted to an oracle-checked
    artifact). An ANN deployment picks its operating radius off exactly
    this table.

    Scale: bucketing + cosine are ONE map-side pass against the
    broadcast 1-row query (norms hoisted); the exact truth set is one
    TakeOrdered({_RECALL_K}); candidates per radius are a broadcast
    4-row radius join on a map-side bit_count predicate, and the hit
    probe is a broadcast join against the {_RECALL_K}-row truth set.
    Recall is exact-integer ppm."""
    emb = load(spark, sf_dir, "embeddings")
    buck = emb.select(
        "vec_id",
        "embedding",
        _bucket_expr(F.col("embedding")).alias("bucket"),
    )
    q = buck.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv"),
        F.col("bucket").alias("qb"),
        _norm(F.col("embedding")).alias("nq"),
    )
    cosine = _dot(F.col("embedding"), F.col("qv")) / (
        _norm(F.col("embedding")) * F.col("nq")
    )
    scored = (
        buck.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != 0)
        .select("vec_id", "bucket", "qb", cosine.alias("cosine"))
    )
    truth = (
        scored.orderBy(F.desc("cosine"), "vec_id")
        .limit(_RECALL_K)
        .select(F.col("vec_id").alias("t_vec"))
    )
    radii = spark.range(1).select(
        F.explode(F.array(*[F.lit(r) for r in _RADII])).alias("radius")
    )
    cand = scored.join(
        F.broadcast(radii),
        F.bit_count(F.col("bucket").bitwiseXOR(F.col("qb")))
        <= F.col("radius"),
    ).select("radius", "vec_id")
    hit = F.when(F.col("t_vec").isNotNull(), 1).otherwise(0)
    return (
        cand.join(
            F.broadcast(truth), cand["vec_id"] == F.col("t_vec"), "left"
        )
        .groupBy(F.col("radius").cast("long").alias("radius"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
            F.sum(hit).cast("long").alias("n_hits"),
            F.expr(
                f"CAST(1000000 * sum(CASE WHEN t_vec IS NOT NULL THEN 1 "
                f"ELSE 0 END) div {_RECALL_K} AS BIGINT)"
            ).alias("recall_ppm"),
        )
        .orderBy("radius")
    )
