"""Corpus-adaptive MinHash banding (round 11): rows-per-band derived
from the corpus size, completing the adaptive triad — LSH planes
(similarity10), IVF cells (similarity11), and now MinHash bands.

The fixed pipeline (dedup.py) bands the K=8 signature as 4 bands × 2
rows forever. Banding collision probability for a random pair is
≈ b·s̄^r (s̄ the typical background Jaccard), while TRUE near-dups at
j ≥ 0.9 collide with prob 1−(1−j^r)^b ≈ 1 at every feasible (b, r).
So as the corpus grows — and candidate volume grows with n² · b·s̄^r —
the production knob is r: more rows per band cuts the background
collision rate geometrically (s̄^r) at a tiny recall cost for real
dups. The integer ladder both engines derive from the corpus count:

    r(n) = 2 if bit_length(n−1) ≤ 12   (n ≤ 4096)
           4 if bit_length(n−1) ≤ 20   (n ≤ ~1M)
           8 otherwise                  b = K / r

At the driver SFs (≤ 4096 docs) r floors at the fixed pipeline's 2, so
the verified pair set is identical to dedup_near_minhash_lsh — the
adaptive index is a strict extension, the similarity10 convention.
Recall floor at the extreme r=8, b=1: j=0.95 dups collide with
probability 0.95^8 ≈ 0.66 per signature — the documented trade at
billion-doc scale, recovered by running two independent signature
seeds (doubles K; same plan shape).

Signature machinery (shingles, md5 base hash, universal-hash
permutations) is SHARED with dedup.py — same literals, so the
signatures are bit-identical across the fixed and adaptive pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load
from .dedup import (
    _JACCARD_T,
    _MH_SIG_SQL,
    _MINHASH_K,
    _minhash_sig_materialized,
    _SH3_SQL,
)


def adaptive_rows_per_band(n: int) -> int:
    """Rows-per-band ladder from the corpus size (module note).
    Integer-only: agrees with the oracle's CASE on LENGTH(BIN(n-1))
    at every n ≥ 1."""
    bl = (n - 1).bit_length()
    return 2 if bl <= 12 else (4 if bl <= 20 else 8)


def _doc_count(spark: SparkSession, sf_dir: str) -> int:
    """Corpus count from parquet FOOTER metadata (zero Spark jobs;
    count() fallback) — the similarity10._corpus_count pattern over
    the documents table."""
    from pathlib import Path

    import pyarrow.parquet as pq

    root = Path(f"{sf_dir.rstrip('/')}/documents.parquet")
    try:
        files = sorted(root.glob("*.parquet")) if root.is_dir() else [root]
        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    except Exception:
        return load(spark, sf_dir, "documents").count()


# 1-row CTE ``nb`` (column ``r``): the adaptive rows-per-band from the
# corpus count.
_NB_SQL = """SELECT CASE WHEN LENGTH(BIN(COUNT(*) - 1)) <= 12 THEN 2
                         WHEN LENGTH(BIN(COUNT(*) - 1)) <= 20 THEN 4
                         ELSE 8 END AS r
             FROM documents"""


def _bands_sql(r: int) -> str:
    """One band construction at a fixed r (b = K/r bands), keyed by
    the ':'-joined signature slice — selected by the nb.r CASE."""
    b = _MINHASH_K // r
    return f"""
      SELECT doc_id, t.b,
             array_to_string(sig[{r}*t.b + 1 : {r}*t.b + {r}], ':') AS bk
      FROM sig CROSS JOIN (SELECT unnest(range({b})) AS b) t
      WHERE (SELECT r FROM nb) = {r}
    """


@query(
    "dedup_minhash_adaptive_bands",
    oracle=f"""
    WITH nb AS ({_NB_SQL}),
    tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    sh AS (SELECT doc_id, {_SH3_SQL} AS sh FROM tok),
    base AS (
      SELECT doc_id, sh,
             list_transform(sh,
               x -> CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)) AS bh
      FROM sh
    ),
    sig AS (SELECT doc_id, sh, {_MH_SIG_SQL} AS sig FROM base),
    bands AS (
      {_bands_sql(2)}
      UNION ALL
      {_bands_sql(4)}
      UNION ALL
      {_bands_sql(8)}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.b = b.b AND a.bk = b.bk AND a.doc_id < b.doc_id
    )
    SELECT (SELECT CAST(r AS BIGINT) FROM nb) AS rows_per_band,
           (SELECT CAST({_MINHASH_K} // r AS BIGINT) FROM nb) AS n_bands,
           c.doc_a, c.doc_b,
           CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
             / len(list_distinct(x.sh || y.sh)) AS jaccard
    FROM cand c
    JOIN sh x ON x.doc_id = c.doc_a
    JOIN sh y ON y.doc_id = c.doc_b
    WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
             / len(list_distinct(x.sh || y.sh)) >= {_JACCARD_T}
    ORDER BY c.doc_a, c.doc_b
    """,
)
def dedup_minhash_adaptive_bands(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MinHash near-dup pairs through CORPUS-ADAPTIVE banding: the
    shared MinHash(8) signatures banded as b × r with r from the
    corpus-size ladder (module note), candidates verified by exact
    Jaccard ≥ 0.5. (rows_per_band, n_bands) are emitted so every gated
    row pins which banding answered — the dedup-tier sibling of
    n_planes/cell_bits. At the driver SFs r = 2 and the pair set is
    identical to dedup_near_minhash_lsh.

    Scale: signatures are map-side (one md5 per shingle + K universal
    hashes); the band explode is ×b ≤ 4; the ONLY shuffle is the
    band-key self-join, whose background collision volume shrinks
    geometrically in r — the knob that keeps candidate count
    ~linear-in-n where fixed 2-row bands go quadratic past ~1M docs.
    Verification touches candidate pairs only."""
    docs = load(spark, sf_dir, "documents")
    r = adaptive_rows_per_band(_doc_count(spark, sf_dir))
    b = _MINHASH_K // r
    # signature frame checkpointed once (optimization r14, see
    # dedup._minhash_sig_materialized; interleaved A/B at sf0.1:
    # lazy 2.63 s vs 2.13 s min-of-4): EXECUTES the signature pass at
    # construction (registry contract note)
    sig = _minhash_sig_materialized(docs)
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("b"),
                        F.concat_ws(
                            ":",
                            *[
                                F.col("sig")[i * r + j].cast("string")
                                for j in range(r)
                            ],
                        ).alias("bk"),
                    )
                    for i in range(b)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.b", "band.bk")
    aa, bb = bands.alias("a"), bands.alias("b")
    cand = (
        aa.join(
            bb,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    x = sig.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    y = sig.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        cand.join(x, "doc_a")
        .join(y, "doc_b")
        .select(
            F.lit(r).cast("long").alias("rows_per_band"),
            F.lit(b).cast("long").alias("n_bands"),
            "doc_a",
            "doc_b",
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= _JACCARD_T)
        .orderBy("doc_a", "doc_b")
    )
