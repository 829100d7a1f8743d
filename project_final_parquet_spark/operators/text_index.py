"""Inverted-index construction and BM25-family ranked retrieval over
``documents`` — the indexing half of a retrieval/decontamination
pipeline (build postings once, rank lexically at query time).

Scale (100 TB of text):
- the index is one explode + one (token) shuffle with map-side partial
  aggregation; postings heads are bounded (first-P doc ids) so no
  reducer accumulates an unbounded list — full postings at production
  scale would be written out partitioned by token range instead.
- ranking broadcasts the per-term df table and the 2-value global stats
  row; the only shuffle on the big side is the per-doc tf groupBy.

Determinism: BM25's ln() idf is replaced by its rational argument
(N - df + 0.5) / (df + 0.5) — a strictly monotone surrogate, so
rankings are preserved while every arithmetic step stays in exact-
literal double math that DuckDB reproduces bit-for-bit; the final
per-doc sum of term scores uses the DECIMAL(38,10) order-independent
sum convention (registry docstring, rule 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

_POSTINGS_HEAD = 5
_TERMS = ["join", "hash", "vector"]
_K1 = "1.2"
_K1P1 = "2.2"
_B = "0.75"


@query(
    "text_inverted_index",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    t2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
    counts AS (
      SELECT token,
             CAST(COUNT(*) AS BIGINT) AS tf_total,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM t2 GROUP BY token
    ),
    heads AS (
      SELECT token,
             array_to_string(
               (list(doc_id ORDER BY doc_id))[1:{_POSTINGS_HEAD}], ','
             ) AS postings_head
      FROM (SELECT DISTINCT token, doc_id FROM t2)
      GROUP BY token
    )
    SELECT c.token, c.tf_total, c.df, h.postings_head
    FROM counts c JOIN heads h USING (token)
    ORDER BY c.df DESC, c.token
    """,
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token → (collection tf, document frequency, first-5 postings).
    One explode + one token-key shuffle; the postings head is bounded
    (sorted set, sliced) so reducers never hold a full posting list.
    The head is serialized to a comma-joined STRING: complex-typed
    output columns are banned in registered queries (the driver's
    pandas canonicalizer cannot hash list cells — round-3 red row;
    enforced by tools/lint_registry.py + tests/test_registry_lint.py)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    return (
        tok.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("tf_total"),
            F.countDistinct("doc_id").alias("df"),
            F.concat_ws(
                ",",
                F.slice(
                    F.sort_array(F.collect_set("doc_id")), 1, _POSTINGS_HEAD
                ).cast("array<string>"),
            ).alias("postings_head"),
        )
        .orderBy(F.desc("df"), "token")
    )


_TERMS_SQL = ", ".join(f"'{t}'" for t in _TERMS)

# The CTE chain producing per-(doc, term) BM25 partial scores — shared
# verbatim by the text_bm25_rank oracle and the hybrid-retrieval RRF
# oracle (operators/retrieval.py), so both engines rank from the exact
# same lexical arithmetic.
BM25_SCORED_CTES = f"""tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
t2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM t2 GROUP BY doc_id),
gstats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
  FROM dl
),
df AS (
  SELECT token, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
  FROM t2 WHERE token IN ({_TERMS_SQL}) GROUP BY token
),
tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS DOUBLE) AS tf
  FROM t2 WHERE token IN ({_TERMS_SQL}) GROUP BY doc_id, token
),
scored AS (
  SELECT tf.doc_id,
    ((gstats.n_docs - df.df + 0.5) / (df.df + 0.5))
      * (tf.tf * {_K1P1}
         / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * CAST(dl.dl AS DOUBLE)
                                          / gstats.avgdl)))
      AS term_score
  FROM tf
  JOIN df USING (token)
  JOIN dl USING (doc_id)
  CROSS JOIN gstats
)"""

# Per-doc total BM25 score (decimal-sum convention) over the CTE chain.
BM25_BYDOC_SQL = """SELECT doc_id,
       CAST(CAST(SUM(CAST(term_score AS DECIMAL(38,10))) AS VARCHAR)
            AS DOUBLE) AS score
FROM scored
GROUP BY doc_id"""

_BM25_ORACLE = f"""
WITH {BM25_SCORED_CTES},
bydoc AS ({BM25_BYDOC_SQL})
SELECT doc_id, score FROM bydoc
ORDER BY score DESC, doc_id
LIMIT 15
"""


def bm25_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc total BM25 score frame ``(doc_id, score)`` for the fixed
    query terms — the shared lexical-scoring plan behind
    ``text_bm25_rank`` (top-15 head) and ``sim_hybrid_rrf`` (rank-fusion
    shortlist). df and the global (N, avgdl) row are broadcast; the
    big-side shuffles are the per-doc tf/dl groupBys; per-doc term
    scores combine under the decimal-sum convention."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    t2 = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.col("token") != "")

    dl = t2.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    glob = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (
            F.sum("dl").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
    )
    hits = t2.filter(F.col("token").isin(_TERMS))
    df_t = hits.groupBy("token").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    tf = hits.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )

    k1, k1p1, b = [F.lit(float(x)) for x in (_K1, _K1P1, _B)]
    term_score = (
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    ) * (
        F.col("tf")
        * k1p1
        / (
            F.col("tf")
            + k1
            * (
                F.lit(1.0)
                - b
                + b * F.col("dl").cast("double") / F.col("avgdl")
            )
        )
    )

    scored = (
        tf.join(F.broadcast(df_t), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(glob))
        .select("doc_id", term_score.alias("term_score"))
    )
    return scored.groupBy("doc_id").agg(
        F.sum(F.col("term_score").cast("decimal(38,10)"))
        .cast("double")
        .alias("score")
    )


@query("text_bm25_rank", oracle=_BM25_ORACLE)
def text_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75, rational idf) top-15 docs for the fixed
    query terms {join, hash, vector} — the ordered head of
    ``bm25_doc_scores`` (TakeOrderedAndProject keeps k rows/partition)."""
    return (
        bm25_doc_scores(spark, sf_dir)
        .orderBy(F.desc("score"), "doc_id")
        .limit(15)
    )


@query(
    "text_prefix_autocomplete",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    counts AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS n
      FROM tok WHERE token <> '' GROUP BY token
    ),
    ranked AS (
      SELECT substr(token, 1, 2) AS prefix, token, n,
             ROW_NUMBER() OVER (
               PARTITION BY substr(token, 1, 2)
               ORDER BY n DESC, token) AS rn
      FROM counts
    )
    SELECT prefix, rn AS rank, token, n
    FROM ranked WHERE rn <= 3
    ORDER BY prefix, rank
    """,
)
def text_prefix_autocomplete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocomplete index construction: top-3 tokens by frequency per
    2-character prefix — the materialized lookup a type-ahead serves
    from. Token counts are one shuffle; the per-prefix top-k is a
    window over the vocab-sized aggregate. At 100 TB the same build
    writes the index partitioned by prefix range so a lookup touches
    one partition."""
    docs = load(spark, sf_dir, "documents").select("text")
    counts = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql import Window as W

    ranked = counts.select(
        F.substring("token", 1, 2).alias("prefix"), "token", "n"
    ).withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("prefix").orderBy(F.desc("n"), "token")
        ),
    )
    return (
        ranked.filter(F.col("rn") <= 3)
        .select("prefix", F.col("rn").alias("rank"), "token", "n")
        .orderBy("prefix", "rank")
    )
