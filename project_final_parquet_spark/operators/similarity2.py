"""Embedding compression for similarity search: int8 scalar
quantization with exact integer scoring.

The 100 TB angle: a float32×64 embedding column is 256 bytes/row; the
int8 quantized form is 64 bytes + one float scale. Scanning quantized
codes for candidate generation cuts the scan volume 4× and the integer
dot product is exact — so quantized scores are reproducible across
engines (the DuckDB oracle matches bit-for-bit, no epsilon), unlike
float32 SIMD reductions whose sum order varies.

Quantization: q[j] = floor(127 * x[j] / max|x|) — floor, not round,
because Spark's double→int CAST truncates while DuckDB's rounds
half-even; floor() is the one spelling both engines agree on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

_DIM = 64

_MAXABS_SQL = (
    "list_max(list_transform({a}, x -> abs(CAST(x AS DOUBLE))))"
)
_QUANT_SQL = (
    "list_transform({a}, x -> CAST(floor("
    "CAST(x AS DOUBLE) * 127.0 / {m}) AS BIGINT))"
)


def _maxabs(a):
    return F.array_max(F.transform(a, lambda x: F.abs(x.cast("double"))))


def _quant(a, m):
    return F.transform(
        a,
        lambda x: F.floor(x.cast("double") * F.lit(127.0) / m).cast("long"),
    )


@query(
    "sim_scalar_quant",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label,
             {_QUANT_SQL.format(a='embedding',
                                m=_MAXABS_SQL.format(a='embedding'))} AS q
      FROM embeddings
    ),
    qv AS (SELECT q AS qq FROM e WHERE vec_id = 0)
    SELECT e.vec_id, e.label,
           CAST(list_aggregate(list_transform(range({_DIM}),
                j -> e.q[j+1] * qv.qq[j+1]), 'sum') AS BIGINT) AS qscore
    FROM e CROSS JOIN qv
    WHERE e.vec_id <> 0
    ORDER BY qscore DESC, e.vec_id
    LIMIT 10
    """,
)
def sim_scalar_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-quantized top-10 against the vec_id=0 query: quantize every
    embedding to 64 ints, score with an exact integer dot product
    against the broadcast quantized query, TakeOrderedAndProject the
    top 10. Map-side scoring over a 4×-smaller representation; the
    integer score makes the result engine-exact (no float epsilon) —
    the production pattern is quantized candidate generation + float
    re-ranking of the short list (re-ranking is sim_topk_cosine)."""
    emb = load(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        "label",
        _quant(F.col("embedding"), _maxabs(F.col("embedding"))).alias("q"),
    )
    qv = e.filter(F.col("vec_id") == 0).select(F.col("q").alias("qq"))
    qscore = F.aggregate(
        F.zip_with(F.col("q"), F.col("qq"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return (
        e.crossJoin(F.broadcast(qv))
        .filter(F.col("vec_id") != 0)
        .select("vec_id", "label", qscore.alias("qscore"))
        .orderBy(F.col("qscore").desc(), F.col("vec_id"))
        .limit(10)
    )
