"""Corpus-curation decision tables (round 9): chunk-dedup IMPACT per
source (what sub-document dedup would actually delete), the
quality-threshold sweep (the tokens-retained curve a filtering team
reads before picking τ), and per-source vocabulary contribution (which
sources introduce the corpus's vocabulary vs merely repeat it).

Not in the reference (no text surface — SURVEY.md §2.1); these are the
decision-table companions to text_chunk_dedup / text_quality_score /
text_heaps_law: those report the phenomenon, these report what a
pipeline ACTING on it would keep.

Determinism: token splits are the shared ``split(text, ' ')``; chunk
hashes reuse pipeline3's md5-of-window convention; ratios are single
double divisions of exact integers; thresholds are shared literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load
from .pipeline3 import _CHUNK_TOK

_SWEEP_TAUS = ("0.35", "0.45", "0.55", "0.65")
_MAX_CHUNKS = 16  # same cap as text_chunk_dedup (docs here are short)


@query(
    "text_chunk_dedup_impact",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, string_split(text, ' ') AS toks
      FROM documents
    ),
    chunks AS (
      SELECT doc_id, source, i AS chunk_idx,
             md5(array_to_string(
               list_slice(toks, i * {_CHUNK_TOK} + 1,
                          (i + 1) * {_CHUNK_TOK}), ' ')) AS chunk_hash
      FROM tok
      CROSS JOIN (SELECT unnest(range({_MAX_CHUNKS})) AS i)
      WHERE len(toks) >= (i + 1) * {_CHUNK_TOK}
    ),
    first_site AS (
      SELECT chunk_hash,
             MIN(doc_id * 1000 + chunk_idx) AS first_site
      FROM chunks GROUP BY chunk_hash
    ),
    marked AS (
      SELECT c.source,
             (c.doc_id * 1000 + c.chunk_idx) <> f.first_site AS removed
      FROM chunks c JOIN first_site f ON f.chunk_hash = c.chunk_hash
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           CAST(SUM(CASE WHEN removed THEN 1 ELSE 0 END) * {_CHUNK_TOK}
                AS BIGINT) AS tokens_removed,
           CAST(COUNT(*) - SUM(CASE WHEN removed THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS kept_frac
    FROM marked GROUP BY source ORDER BY source
    """,
)
def text_chunk_dedup_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What sub-document (chunk-level) dedup would DELETE, per source:
    every fixed {_CHUNK_TOK}-token window is hashed (the text_chunk_dedup
    convention), the globally-first occurrence (min doc_id·1000+idx) is
    the keeper, and every other occurrence counts as removed — reported
    as chunk and token counts plus the surviving fraction per source.
    text_chunk_dedup lists the worst boilerplate; THIS is the budget
    table that says which sources a chunk-dedup pass actually shrinks
    (a source at kept_frac 0.6 is 40%% templated).

    Scale: chunking is map-side; the only shuffles are the chunk-hash
    aggregate (map-side combinable, same shape as dedup_exact) and the
    hash-key join back — candidate sets bounded by occurrence counts,
    never pairwise. Source-grain output."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.split("text", " ").alias("toks")
    )
    chunks = docs.select(
        "doc_id",
        "source",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(_MAX_CHUNKS - 1)),
                lambda i: F.when(
                    F.size("toks") >= (i + 1) * _CHUNK_TOK,
                    F.md5(
                        F.concat_ws(
                            " ",
                            F.slice(
                                F.col("toks"), i * _CHUNK_TOK + 1, _CHUNK_TOK
                            ),
                        )
                    ),
                ),
            )
        ).alias("chunk_idx", "chunk_hash"),
    ).filter(F.col("chunk_hash").isNotNull())
    site = F.col("doc_id") * 1000 + F.col("chunk_idx")
    first = chunks.groupBy("chunk_hash").agg(
        F.min(F.col("doc_id") * 1000 + F.col("chunk_idx")).alias("first_site")
    )
    marked = chunks.join(first, "chunk_hash").select(
        "source", (site != F.col("first_site")).alias("removed")
    )
    rem = F.sum(F.when(F.col("removed"), 1).otherwise(0))
    return (
        marked.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            rem.cast("long").alias("n_removed"),
            (rem * _CHUNK_TOK).cast("long").alias("tokens_removed"),
            (
                (F.count(F.lit(1)) - rem).cast("double") / F.count(F.lit(1))
            ).alias("kept_frac"),
        )
        .orderBy("source")
    )


@query(
    "text_quality_threshold_sweep",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_toks,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')) AS uniq_ratio
      FROM documents
    ),
    tot AS (SELECT CAST(SUM(n_toks) AS BIGINT) AS total_tokens FROM scored),
    taus AS (
      SELECT CAST(unnest([{", ".join(_SWEEP_TAUS)}]) AS DOUBLE) AS tau
    )
    SELECT tau,
           CAST(SUM(CASE WHEN uniq_ratio >= tau THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_kept,
           CAST(SUM(CASE WHEN uniq_ratio >= tau THEN n_toks ELSE 0 END)
                AS BIGINT) AS tokens_kept,
           CAST(SUM(CASE WHEN uniq_ratio >= tau THEN n_toks ELSE 0 END)
                AS DOUBLE) / total_tokens AS token_share
    FROM scored CROSS JOIN taus CROSS JOIN tot
    GROUP BY tau, total_tokens ORDER BY tau
    """,
)
def text_quality_threshold_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The filter-threshold curve: for each candidate quality cutoff τ
    (over the shared uniqueness-ratio score of text_quality_score), the
    documents and tokens a "keep uniq_ratio ≥ τ" gate retains and the
    retained token share. Data teams pick τ by reading THIS table —
    the point where quality gain stops being worth the token budget —
    rather than re-running the pipeline per candidate.

    Determinism: the score is one double division of exact integers;
    the τ grid is shared literals; every comparison and rollup is
    engine-identical.

    Scale: scoring is map-side; the sweep is a 4-row broadcast cross
    join folded into ONE conditional aggregate — the corpus is scanned
    once for all thresholds, not once per threshold."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    scored = docs.select(
        F.size(toks).alias("n_toks"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
            "uniq_ratio"
        ),
    )
    tot = scored.agg(F.sum("n_toks").cast("long").alias("total_tokens"))
    taus = spark.range(1).select(
        F.explode(
            F.array(*[F.expr(t).cast("double") for t in _SWEEP_TAUS])
        ).alias("tau")
    )
    kept = F.col("uniq_ratio") >= F.col("tau")
    return (
        scored.crossJoin(F.broadcast(taus))
        .crossJoin(F.broadcast(tot))
        .groupBy("tau", "total_tokens")
        .agg(
            F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias(
                "n_docs_kept"
            ),
            F.sum(F.when(kept, F.col("n_toks")).otherwise(0))
            .cast("long")
            .alias("tokens_kept"),
            (
                F.sum(F.when(kept, F.col("n_toks")).otherwise(0)).cast(
                    "double"
                )
                / F.col("total_tokens")
            ).alias("token_share"),
        )
        .select("tau", "n_docs_kept", "tokens_kept", "token_share")
        .orderBy("tau")
    )


@query(
    "text_vocab_contribution",
    oracle="""
    WITH flat AS (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    per_src AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(COUNT(DISTINCT tok) AS BIGINT) AS vocab_size
      FROM flat GROUP BY source
    ),
    first AS (SELECT tok, MIN(doc_id) AS fd FROM flat GROUP BY tok),
    owner AS (
      SELECT d.source, CAST(COUNT(*) AS BIGINT) AS vocab_owned
      FROM first f JOIN documents d ON d.doc_id = f.fd
      GROUP BY d.source
    )
    SELECT p.source, p.n_tokens, p.vocab_size,
           CAST(COALESCE(o.vocab_owned, 0) AS BIGINT) AS vocab_owned,
           CAST(COALESCE(o.vocab_owned, 0) AS DOUBLE) / p.vocab_size
             AS owned_frac
    FROM per_src p LEFT JOIN owner o ON o.source = p.source
    ORDER BY p.source
    """,
)
def text_vocab_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which sources CONTRIBUTE vocabulary: per source, token volume,
    in-source vocabulary size, and the number of corpus terms whose
    globally-first occurrence (min doc_id — the deterministic corpus
    order) lands in that source. A source with high volume but near-
    zero owned vocabulary is re-treading the corpus (candidate for
    down-weighting in the mix); the long-tail sources that own
    disproportionate vocabulary are what Heaps-law growth
    (text_heaps_law) is made of.

    Scale: one explode + two token-key aggregates (map-side combined)
    and a doc_id-key join for ownership attribution — the token
    aggregate is the same shuffle text_top_terms pays; no pairwise
    shapes. Source-grain output."""
    docs = load(spark, sf_dir, "documents")
    flat = docs.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("tok")
    )
    per_src = flat.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.countDistinct("tok").cast("long").alias("vocab_size"),
    )
    first = flat.groupBy("tok").agg(F.min("doc_id").alias("fd"))
    owner = (
        first.join(
            docs.select(F.col("doc_id").alias("fd"), "source"), "fd"
        )
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("vocab_owned"))
    )
    return (
        per_src.join(owner, "source", "left")
        .select(
            "source",
            "n_tokens",
            "vocab_size",
            F.coalesce(F.col("vocab_owned"), F.lit(0))
            .cast("long")
            .alias("vocab_owned"),
            (
                F.coalesce(F.col("vocab_owned"), F.lit(0)).cast("double")
                / F.col("vocab_size")
            ).alias("owned_frac"),
        )
        .orderBy("source")
    )


@query(
    "text_bpe_fertility_by_lang",
    oracle="""
    WITH per_doc AS (
      SELECT lang,
             len(string_split(text, ' ')) AS ws,
             len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
               AS bpe,
             n_chars
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ws) AS BIGINT) AS ws_tokens,
           CAST(SUM(bpe) AS BIGINT) AS bpe_tokens,
           CAST(SUM(bpe) AS DOUBLE) / SUM(ws) AS fertility,
           CAST(SUM(n_chars) AS DOUBLE) / SUM(bpe) AS chars_per_token
    FROM per_doc GROUP BY lang ORDER BY lang
    """,
)
def text_bpe_fertility_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tokenizer fertility per language: BPE-ish tokens per whitespace
    word and characters per token (the text_bpe_token_count regex
    tokenizer, rolled up by lang). Fertility is THE cross-lingual
    tokenizer-fairness metric — a language at 2× fertility pays 2× the
    sequence length (and 2× the compute bill) for the same content, so
    this table drives vocabulary re-balancing before a multilingual
    training run.

    Scale: per-doc token counting is map-side regex work; one
    |langs|-key rollup with map-side combine; ratios divide exact
    BIGINTs."""
    docs = load(spark, sf_dir, "documents")
    per = docs.select(
        "lang",
        F.size(F.split("text", " ")).alias("ws"),
        F.size(
            F.expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")
        ).alias("bpe"),
        "n_chars",
    )
    return (
        per.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("ws").cast("long").alias("ws_tokens"),
            F.sum("bpe").cast("long").alias("bpe_tokens"),
            # try_divide (r13 division audit): a language bucket of
            # all-empty documents zeroes the token sums (legal input);
            # NULL, not an ANSI abort (DuckDB double /0 is natively
            # NULL).
            F.try_divide(F.sum("bpe").cast("double"), F.sum("ws")).alias(
                "fertility"
            ),
            F.try_divide(
                F.sum("n_chars").cast("double"), F.sum("bpe")
            ).alias("chars_per_token"),
        )
        .orderBy("lang")
    )
