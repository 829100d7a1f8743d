"""LLM-pipeline operators, second tranche: benchmark decontamination,
PII redaction, and multimodal frame sampling.

Same scale discipline as llm_text.py/dedup.py: JVM expressions for
everything string-shaped, Arrow-batched ``mapInPandas`` only where a
codec boundary forces Python, and every quadratic-looking step bounded
by an equi-join on a precomputed key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load
from .dedup import _ngrams, _toks
from .multimodal import media_frame

# --- benchmark decontamination ---------------------------------------------

_DECON_N = 3  # n-gram order for contamination matching
_DECON_T = 0.3  # overlap fraction that flags a training doc
_DECON_MOD = 10  # doc_id % MOD == 0 stands in for the benchmark suite

_DECON_GRAMS_SQL = """list_distinct(list_transform(range(len(toks) - 2),
      i -> concat_ws(' ', toks[i+1], toks[i+2], toks[i+3])))"""


@query(
    "text_decontaminate",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    g AS (
      SELECT doc_id, unnest({_DECON_GRAMS_SQL}) AS gram FROM tok
    ),
    bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % {_DECON_MOD} = 0),
    cand AS (SELECT * FROM g WHERE doc_id % {_DECON_MOD} <> 0),
    n AS (SELECT doc_id, COUNT(*) AS n_grams FROM cand GROUP BY doc_id),
    m AS (SELECT c.doc_id, COUNT(*) AS n_matched
          FROM cand c JOIN bench b USING (gram) GROUP BY c.doc_id)
    SELECT n.doc_id, n.n_grams, m.n_matched,
           CAST(m.n_matched AS DOUBLE) / n.n_grams AS overlap
    FROM n JOIN m USING (doc_id)
    WHERE CAST(m.n_matched AS DOUBLE) / n.n_grams >= {_DECON_T}
    ORDER BY doc_id
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — THE pretraining hygiene op: flag
    training documents whose distinct 3-gram overlap with a benchmark
    set (here: doc_id % 10 == 0 stands in for the eval suite) reaches
    0.3 — on this corpus that surfaces the genuine near-duplicates of
    benchmark docs (overlaps up to 1.0), not noise. The benchmark gram
    set is orders of magnitude smaller than the corpus, so the match is
    a BROADCAST semi-join against map-side exploded grams — the 100 TB
    corpus is touched once, shuffled only for the tiny per-doc count
    aggregation. (At real scale, grams travel as xxhash64 fingerprints
    instead of strings — same plan, 8-byte keys.)"""
    docs = load(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id", F.explode(_ngrams(_toks(), _DECON_N)).alias("gram")
    )
    bench = (
        grams.filter(F.col("doc_id") % _DECON_MOD == 0)
        .select("gram")
        .distinct()
    )
    cand = grams.filter(F.col("doc_id") % _DECON_MOD != 0)
    n = cand.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    m = (
        cand.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    overlap = F.col("n_matched").cast("double") / F.col("n_grams")
    return (
        n.join(m, "doc_id")
        .select("doc_id", "n_grams", "n_matched", overlap.alias("overlap"))
        .filter(F.col("overlap") >= _DECON_T)
        .orderBy("doc_id")
    )


# --- PII redaction ----------------------------------------------------------

# one pattern dialect-safe in BOTH Java regex (Spark) and RE2 (DuckDB)
_EMAIL_RE = "[A-Za-z0-9._]+@[A-Za-z0-9.]+"


@query(
    "text_pii_redact",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, lang,
             CASE WHEN doc_id % 10 = 0
                  THEN text || ' contact: user' || CAST(doc_id AS VARCHAR)
                       || '@example.com'
                  ELSE text END AS text2
      FROM documents
    ),
    r AS (
      SELECT lang,
             len(regexp_extract_all(text2, '{_EMAIL_RE}')) AS n_emails,
             length(text2) AS len_before,
             length(regexp_replace(text2, '{_EMAIL_RE}', '<EMAIL>', 'g'))
               AS len_after
      FROM w
    )
    SELECT lang,
           CAST(SUM(n_emails) AS BIGINT) AS total_emails,
           CAST(count_if(n_emails > 0) AS BIGINT) AS docs_with_pii,
           CAST(SUM(len_before) AS BIGINT) AS chars_before,
           CAST(SUM(len_after) AS BIGINT) AS chars_after
    FROM r GROUP BY lang ORDER BY lang
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the corpus: detect + replace email addresses
    (deterministically injected into 10% of docs so the assertion bites)
    and account the char-count delta per language. Pure JVM regex
    expressions — redaction at 100 TB is a map-only pass, no shuffle
    before the final small aggregate."""
    docs = load(spark, sf_dir, "documents")
    text2 = F.when(
        F.col("doc_id") % 10 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact: user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com"),
        ),
    ).otherwise(F.col("text"))
    w = docs.select("doc_id", "lang", text2.alias("text2"))
    r = w.select(
        "lang",
        F.size(F.regexp_extract_all("text2", F.lit(_EMAIL_RE), F.lit(0))).alias(
            "n_emails"
        ),
        F.length("text2").alias("len_before"),
        F.length(
            F.regexp_replace("text2", _EMAIL_RE, "<EMAIL>")
        ).alias("len_after"),
    )
    return (
        r.groupBy("lang")
        .agg(
            F.sum(F.col("n_emails").cast("long")).alias("total_emails"),
            F.count_if(F.col("n_emails") > 0).alias("docs_with_pii"),
            F.sum(F.col("len_before").cast("long")).alias("chars_before"),
            F.sum(F.col("len_after").cast("long")).alias("chars_after"),
        )
        .orderBy("lang")
    )


# --- multimodal frame sampling ---------------------------------------------

_FRAME_STRIDE = 8


def make_frame_sampler(stride: int):
    """Stride sampler with the real frame-sampling operator's shape:
    Arrow batches of (doc_id, kind, payload) in, per-item sampled-frame
    stats out. A real video path would seek key frames here; the
    deterministic stand-in takes every ``stride``-th codepoint so the
    DuckDB oracle can reproduce it exactly. Nested closure on purpose —
    cloudpickle ships it by value, executors never import this module."""

    def sample_frames(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            texts = pdf["payload"].map(lambda b: b.decode("utf-8"))
            frames = texts.map(lambda s: s[::stride])
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_frames": frames.map(len).astype("int32"),
                    "frame_cp_sum": frames.map(
                        lambda s: sum(map(ord, s))
                    ).astype("int64"),
                }
            )

    return sample_frames


@query(
    "mm_frame_sample",
    oracle=f"""
    SELECT doc_id,
           ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
           CAST((length(text) + {_FRAME_STRIDE - 1}) // {_FRAME_STRIDE}
                AS INT) AS n_frames,
           CAST(COALESCE(list_aggregate(
                 list_transform(range((length(text) + {_FRAME_STRIDE - 1})
                                      // {_FRAME_STRIDE}),
                   i -> ascii(substr(text, i * {_FRAME_STRIDE} + 1, 1))),
                 'sum'), 0) AS BIGINT) AS frame_cp_sum
    FROM documents
    ORDER BY doc_id
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over multimodal payloads: every {_FRAME_STRIDE}-th
    unit of each blob via Arrow-batched ``mapInPandas`` — the decode/
    sample/extract plumbing of a video pipeline with a deterministic
    stand-in sampler (real codecs aren't in this container; the Spark
    side — schema, batching, partition mapping — is the production
    shape)."""
    mf = media_frame(spark, sf_dir).select("doc_id", "kind", "payload")
    return mf.mapInPandas(
        make_frame_sampler(_FRAME_STRIDE),
        schema="doc_id long, kind string, n_frames int, frame_cp_sum long",
    ).orderBy("doc_id")
