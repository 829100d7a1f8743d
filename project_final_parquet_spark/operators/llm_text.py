"""Text-analysis operators for LLM data pipelines over ``documents``.

Not present in the reference (its only string ops are the `"col: value"`
codec, SURVEY.md §2.2) — these are the driver-mandated extension surface:
token statistics, quality scoring, language-ID heuristics, and document
fingerprinting. Everything is built-in `pyspark.sql.functions` (JVM,
whole-stage codegen): tokenization is `split`, set ops are array
functions, hashes are md5 — zero Python in the data path.

Scale (100 TB): all per-document ops are pure map-side (no shuffle);
aggregates shuffle only partially-aggregated group rows; top-k terms is
the only explode+shuffle and is bounded by vocabulary size after
map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

# Shared tokenizer: documents.text is space-separated tokens.
def _tokens(col: str = "text"):
    return F.split(F.col(col), " ")


STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

_STOP_SQL = "['" + "','".join(STOPWORDS) + "']"


@query(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           CAST(length(text) AS INT) AS n_chars,
           CAST(len(list_distinct(string_split(text, ' '))) AS INT)
             AS n_distinct_tokens,
           CAST(length(replace(text, ' ', '')) AS DOUBLE)
             / len(string_split(text, ' ')) AS avg_token_len
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + distinct-token and length statistics."""
    docs = load(spark, sf_dir, "documents")
    toks = _tokens()
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").cast("int").alias("n_chars"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        (
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / F.size(toks)
        ).alias("avg_token_len"),
    )


@query(
    "text_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents
    )
    SELECT doc_id,
           CAST(len(list_intersect(list_distinct(toks), {_STOP_SQL})) AS INT)
             AS n_stopword_kinds,
           CAST(len(list_filter(toks, x -> list_contains({_STOP_SQL}, x))) AS DOUBLE)
             / n AS stopword_ratio,
           CAST(len(list_distinct(toks)) AS DOUBLE) / n AS uniq_ratio,
           CASE
             WHEN CAST(len(list_distinct(toks)) AS DOUBLE) / n >= 0.60 THEN 'high'
             WHEN CAST(len(list_distinct(toks)) AS DOUBLE) / n >= 0.35 THEN 'mid'
             ELSE 'low'
           END AS quality_bucket
    FROM t
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality signals: stopword ratio, uniqueness ratio, bucket."""
    docs = load(spark, sf_dir, "documents")
    toks = _tokens()
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    n = F.size(toks)
    uniq_ratio = F.size(F.array_distinct(toks)).cast("double") / n
    return docs.select(
        "doc_id",
        F.size(F.array_intersect(F.array_distinct(toks), stop)).alias(
            "n_stopword_kinds"
        ),
        (
            F.size(F.filter(toks, lambda x: F.array_contains(stop, x))).cast(
                "double"
            )
            / n
        ).alias("stopword_ratio"),
        uniq_ratio.alias("uniq_ratio"),
        F.when(uniq_ratio >= 0.60, "high")
        .when(uniq_ratio >= 0.35, "mid")
        .otherwise("low")
        .alias("quality_bucket"),
    )


# Tiny per-language marker vocabularies for the n-gram/keyword language-ID
# heuristic. (The synthetic corpus shares one vocabulary across langs, so
# accuracy is meaningless here — the operator and its determinism are
# what's oracle-checked.)
_LANG_MARKERS = {
    "en": ["the", "fast", "key"],
    "de": ["der", "und", "schnell"],
    "es": ["el", "la", "rapido"],
    "fr": ["le", "et", "rapide"],
    "zh": ["de", "kuai", "jian"],
}


def _marker_sql(lang: str) -> str:
    return "['" + "','".join(_LANG_MARKERS[lang]) + "']"


@query(
    "text_lang_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             len(list_intersect(list_distinct(string_split(text, ' ')),
                 {_marker_sql('de')})) AS s_de,
             len(list_intersect(list_distinct(string_split(text, ' ')),
                 {_marker_sql('en')})) AS s_en,
             len(list_intersect(list_distinct(string_split(text, ' ')),
                 {_marker_sql('es')})) AS s_es,
             len(list_intersect(list_distinct(string_split(text, ' ')),
                 {_marker_sql('fr')})) AS s_fr,
             len(list_intersect(list_distinct(string_split(text, ' ')),
                 {_marker_sql('zh')})) AS s_zh
      FROM documents
    ),
    pred AS (
      SELECT doc_id, lang,
             CASE greatest(s_de, s_en, s_es, s_fr, s_zh)
               WHEN s_de THEN 'de' WHEN s_en THEN 'en' WHEN s_es THEN 'es'
               WHEN s_fr THEN 'fr' ELSE 'zh'
             END AS predicted
      FROM scored
    )
    SELECT lang, predicted, COUNT(*) AS n
    FROM pred GROUP BY lang, predicted ORDER BY lang, predicted
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-overlap language ID; returns the (actual, predicted)
    confusion counts. Ties break lexicographically (de<en<es<fr<zh)."""
    docs = load(spark, sf_dir, "documents")
    uniq = F.array_distinct(_tokens())
    scores = {
        lang: F.size(
            F.array_intersect(uniq, F.array(*[F.lit(m) for m in markers]))
        )
        for lang, markers in _LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    predicted = (
        F.when(scores["de"] == best, "de")
        .when(scores["en"] == best, "en")
        .when(scores["es"] == best, "es")
        .when(scores["fr"] == best, "fr")
        .otherwise("zh")
    )
    return (
        docs.select("doc_id", "lang", predicted.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "predicted")
    )


@query(
    "text_fingerprint",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp_content,
           list_min(list_transform(range(len(toks) - 2),
             i -> md5(concat_ws(' ', toks[i+1], toks[i+2], toks[i+3]))))
             AS fp_min_shingle
    FROM t
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: order-insensitive content hash + winnowing-
    style minimum shingle hash (the md5-min is a 1-permutation MinHash)."""
    from .dedup import _ngrams

    docs = load(spark, sf_dir, "documents")
    toks = _tokens()
    # _ngrams (slice+zip) avoids the quadratic lambda-inlining trap; the
    # reference fingerprint is over ALL shingles incl. duplicates, but
    # md5-min over distinct shingles is identical (min ignores repeats).
    shingle_hashes = F.transform(_ngrams(toks, 3), lambda s: F.md5(s))
    return docs.select(
        "doc_id",
        F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " ")).alias(
            "fp_content"
        ),
        F.array_min(shingle_hashes).alias("fp_min_shingle"),
    )


@query(
    "text_bpe_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
                AS INT) AS bpe_ish_tokens,
           CAST(len(regexp_extract_all(text, '[aeiou]+')) AS INT)
             AS vowel_groups
    FROM documents
    """,
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace and a BPE-ish regex segmenter
    (letter runs / digit runs / single punctuation — the pre-tokenizer
    shape GPT-style BPE vocabularies assume). Both are map-side
    expressions; the regex path is the honest proxy for estimating LLM
    token budgets over 100 TB of text."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(_tokens()).alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0
            )
        ).alias("bpe_ish_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[aeiou]+"), 0)).alias(
            "vowel_groups"
        ),
    )


# Polynomial rolling hash: h = (h*B + byte) mod P, the Rabin-Karp form.
# B/P chosen so (P-1)*B + 255 < 2^63 — no overflow in either engine.
_RH_B = 257
_RH_P = 1_000_000_007


@query(
    "text_rolling_hash",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_transform(range(length(text)),
                            i -> ascii(substr(text, i + 1, 1))) AS bytes
      FROM documents
    )
    SELECT doc_id,
           CAST(list_reduce(
                  list_prepend(CAST(0 AS BIGINT),
                               list_transform(bytes, b -> CAST(b AS BIGINT))),
                  (h, b) -> (h * {_RH_B} + b) % {_RH_P}) AS BIGINT)
             AS rolling_hash
    FROM t
    """,
)
def text_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rabin-Karp rolling hash over document bytes — the classic
    content-defined fingerprint (and the primitive for content-defined
    chunking). A sequential integer fold, identical in both engines."""
    docs = load(spark, sf_dir, "documents")
    bytes_arr = F.transform(
        F.split(F.col("text"), ""),
        lambda ch: F.ascii(ch).cast("long"),
    )
    return docs.select(
        "doc_id",
        F.aggregate(
            bytes_arr,
            F.lit(0).cast("long"),
            lambda h, b: (h * _RH_B + b) % _RH_P,
        ).alias("rolling_hash"),
    )


_CHUNK = 16  # tokens per chunk (small so the corpus yields multi-chunk docs)


@query(
    "text_chunking",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
           CAST(len(toks[ci*{_CHUNK}+1 : (ci+1)*{_CHUNK}]) AS INT)
             AS n_chunk_tokens,
           md5(array_to_string(toks[ci*{_CHUNK}+1 : (ci+1)*{_CHUNK}], ' '))
             AS chunk_hash
    FROM t CROSS JOIN LATERAL (
      SELECT unnest(range(CAST(ceil(len(toks) / {_CHUNK}.0) AS INT))) AS ci
    ) c
    ORDER BY doc_id, chunk_idx
    """,
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunking — the context-window splitter of a
    pretraining pipeline. Declarative: explode over chunk indices +
    array slice; no UDTF needed, fully distributed, last chunk ragged."""
    docs = load(spark, sf_dir, "documents")
    toks = _tokens()
    n_chunks = F.ceil(F.size(toks) / F.lit(float(_CHUNK))).cast("int")
    t = docs.select("doc_id", toks.alias("toks"), n_chunks.alias("nc"))
    exploded = t.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), F.col("nc") - 1)).alias("chunk_idx"),
    )
    chunk = F.slice(F.col("toks"), F.col("chunk_idx") * _CHUNK + 1, _CHUNK)
    return exploded.select(
        "doc_id",
        "chunk_idx",
        F.size(chunk).alias("n_chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
    ).orderBy("doc_id", "chunk_idx")


_PACK_BUDGET = 256  # tokens per packed sequence


@query(
    "text_pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, lang, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT lang,
           CAST((cum - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS pack_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
    FROM c
    GROUP BY lang, pack_id
    ORDER BY lang, pack_id
    """,
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents (per lang, in id order) to
    ~fixed-token-budget packs via a cumulative-sum window — the
    offset-based approximation of greedy packing that stays one window
    pass instead of a sequential loop (the 100 TB-compatible form)."""
    from pyspark.sql import Window as W

    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "lang", F.size(_tokens()).cast("long").alias("n_tokens")
    )
    w = (
        W.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    c = t.withColumn("cum", F.sum("n_tokens").over(w))
    return (
        c.select(
            "lang",
            ((F.col("cum") - F.col("n_tokens")) / _PACK_BUDGET)
            .cast("bigint")
            .alias("pack_id"),
            "n_tokens",
        )
        .groupBy("lang", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
        )
        .orderBy("lang", "pack_id")
    )


@query(
    "text_top_terms",
    oracle="""
    SELECT term, COUNT(*) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
    GROUP BY term
    ORDER BY freq DESC, term
    LIMIT 20
    """,
)
def text_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide term frequency top-20 (explode → partial agg → top-k)."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(_tokens()).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("term"))
        .limit(20)
    )
