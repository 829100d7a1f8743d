"""LLM-pipeline operators, third tranche: repetition-based quality
filtering (Gopher-style), deterministic corpus sampling, and
pretraining source-mixture weights.

Determinism rules (registry.py docstring): every keep/filter decision
and every weight is computed in INTEGER arithmetic on both engines —
no float thresholds to drift in the last ulp. Sampling is content-hash
based (md5 of the key), so both engines select the exact same rows and
the sample is reproducible under repartitioning, retries, and scale-up
— unlike rand()-based TABLESAMPLE, which is none of those.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

# --- Gopher-style repetition filter ----------------------------------------

# Gopher rules (Rae et al. 2021, table A1) use fractional thresholds
# (top-2-gram fraction > 0.20, duplicate-word fraction > 0.30). Both are
# rescaled to integer cross-multiplications below so the two engines
# can't disagree on a borderline document.


@query(
    "text_repetition_filter",
    oracle="""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    w AS (SELECT doc_id, unnest(t) AS w FROM tok),
    wc AS (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY doc_id, w),
    ws AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
                  CAST(COUNT(*) AS BIGINT) AS n_distinct
           FROM wc GROUP BY doc_id),
    bgx AS (SELECT doc_id,
                   unnest(list_transform(range(len(t) - 1),
                          i -> t[i+1] || ' ' || t[i+2])) AS bg
            FROM tok),
    bgc AS (SELECT doc_id, bg, COUNT(*) AS c FROM bgx GROUP BY doc_id, bg),
    bgs AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS max_bg_cnt
            FROM bgc GROUP BY doc_id)
    SELECT ws.doc_id, ws.n_words, ws.n_distinct,
           CAST(greatest(ws.n_words - 1, 0) AS BIGINT) AS n_bigrams,
           CAST(COALESCE(bgs.max_bg_cnt, 0) AS BIGINT) AS max_bg_cnt,
           NOT (5 * COALESCE(bgs.max_bg_cnt, 0)
                  > greatest(ws.n_words - 1, 0)
                OR 10 * (ws.n_words - ws.n_distinct) > 3 * ws.n_words)
             AS kept
    FROM ws LEFT JOIN bgs ON ws.doc_id = bgs.doc_id
    ORDER BY ws.doc_id
    """,
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filter: a document is dropped
    when its most frequent bigram exceeds 1/5 of all bigrams or its
    duplicate-word fraction exceeds 3/10 — both evaluated as integer
    cross-multiplications. Two map-side-combined aggregations (word
    counts, bigram counts) shuffled on doc_id, then a co-partitioned
    join: at 100 TB this is two passes over the corpus with partial
    aggregation doing the heavy lifting before any shuffle."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    # non-distinct bigrams via the slice+zip form (dedup._ngrams
    # rationale: no CSE inside higher-order-function lambdas)
    cnt = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.transform(
        F.arrays_zip(F.slice(toks, 1, cnt), F.slice(toks, 2, cnt)),
        lambda s: F.concat_ws(" ", s["0"], s["1"]),
    )

    words = docs.select("doc_id", F.explode(toks).alias("w"))
    ws = (
        words.groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_words"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
        )
    )
    bgs = (
        docs.select("doc_id", F.explode(bigrams).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_bg_cnt"))
    )
    n_bigrams = F.greatest(F.col("n_words") - 1, F.lit(0)).cast("long")
    max_bg = F.coalesce(F.col("max_bg_cnt"), F.lit(0)).cast("long")
    kept = ~(
        (5 * max_bg > n_bigrams)
        | (10 * (F.col("n_words") - F.col("n_distinct")) > 3 * F.col("n_words"))
    )
    return (
        ws.join(bgs, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            "n_distinct",
            n_bigrams.alias("n_bigrams"),
            max_bg.alias("max_bg_cnt"),
            kept.alias("kept"),
        )
        .orderBy("doc_id")
    )


# --- deterministic hash sampling -------------------------------------------


@query(
    "sample_stratified_hash",
    oracle="""
    SELECT doc_id, lang, source,
           substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS hp
    FROM documents
    WHERE CASE WHEN lang = 'en'
               THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
               ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0' END
    ORDER BY doc_id
    """,
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified corpus sampling by content hash: 'en' documents kept
    at 2/16, every other language at 1/16, decided by the first hex
    digit of md5(doc_id). Map-only (no shuffle, no RNG state): the same
    rows are selected on any cluster size, any retry, and in the DuckDB
    oracle — the property TABLESAMPLE/rand() cannot give. This is how a
    pretraining mixture downsamples an over-represented language at
    100 TB: a predicate the scan evaluates, nothing more."""
    docs = load(spark, sf_dir, "documents")
    hp = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    keep = F.when(F.col("lang") == "en", hp.isin("0", "1")).otherwise(
        hp == "0"
    )
    return (
        docs.withColumn("hp", hp)
        .filter(keep)
        .select("doc_id", "lang", "source", "hp")
        .orderBy("doc_id")
    )


@query(
    "sample_uniform_topk",
    oracle="""
    SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':u') AS h
    FROM documents
    ORDER BY h, doc_id
    LIMIT 64
    """,
)
def sample_uniform_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size uniform sample: the 64 documents with the smallest
    salted content hash — a deterministic 'reservoir'. Executes as
    TakeOrderedAndProject (per-partition top-64, tiny final merge), so
    the k-row sample costs one scan at any corpus size; growing the
    corpus changes WHICH rows win but never the cost shape."""
    docs = load(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":u")))
    return (
        docs.select("doc_id", h.alias("h"))
        .orderBy("h", "doc_id")
        .limit(64)
    )


# --- pretraining source-mixture weights ------------------------------------


@query(
    "mix_source_weights",
    oracle="""
    WITH s AS (
      SELECT source, lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source, lang
    )
    SELECT source, lang, n_docs, n_tokens,
           CAST((1000000 * n_tokens) // SUM(n_tokens) OVER () AS BIGINT)
             AS weight_ppm
    FROM s ORDER BY source, lang
    """,
)
def mix_source_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining mixture table: token counts per (source, lang) and
    each cell's share of the corpus in parts-per-million — integer
    division, so both engines produce identical weights. Token counting
    is map-side (size of the split array, no explode); the global-total
    window runs over the tiny (source × lang) aggregate, not the
    corpus."""
    docs = load(spark, sf_dir, "documents")
    s = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("long")
        .alias("n_tokens"),
    )
    return (
        s.withColumn(
            "weight_ppm",
            F.expr(
                "CAST((1000000 * n_tokens) DIV SUM(n_tokens) OVER () AS BIGINT)"
            ),
        )
        .select("source", "lang", "n_docs", "n_tokens", "weight_ppm")
        .orderBy("source", "lang")
    )


# --- rare-token density scoring --------------------------------------------


@query(
    "text_rare_token_score",
    oracle="""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    cnt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY w),
    scored AS (
      SELECT w.doc_id,
             COUNT(*) AS n_tokens,
             SUM(64 - length(bin(cnt.c))) AS rarity_sum
      FROM w JOIN cnt USING (w) GROUP BY w.doc_id
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(rarity_sum AS BIGINT) AS rarity_sum,
           CAST((100 * rarity_sum) // n_tokens AS BIGINT)
             AS avg_rarity_x100
    FROM scored ORDER BY doc_id
    """,
)
def text_rare_token_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rare-token density — an integer stand-in for unigram surprisal:
    each token scores 64 − bitwidth(corpus_count), i.e. ~−log2 of its
    corpus frequency, summed per document (transcendental log2 would
    not be bit-reproducible across engines; the bin()-length form is
    exact integer math on both). Two corpus passes: the term-count
    aggregation, then a co-partitioned-on-token join back — both with
    map-side partial aggregation; no vocabulary ever sits on one node
    (contrast text_oov_rate, which broadcasts a top-K vocab — this is
    the unbounded-vocabulary variant of the same scoring template)."""
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    cnt = words.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    rarity = F.lit(64) - F.length(F.bin(F.col("c")))
    scored = (
        words.join(cnt, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(rarity).cast("long").alias("rarity_sum"),
        )
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "rarity_sum",
        F.expr("CAST((100 * rarity_sum) DIV n_tokens AS BIGINT)").alias(
            "avg_rarity_x100"
        ),
    ).orderBy("doc_id")
