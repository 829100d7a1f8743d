"""Corpus preparation operators: unicode normalization, column
concentration profiling, and deterministic epoch reshuffling.

Not in the reference (its text surface is the `"col: value\\n"` row
encoding, src/parquet_writer.cpp:64); these are the remaining
standard preprocessing steps of an LLM training-data pipeline:

- **NFC normalization** — web text arrives in mixed unicode forms;
  dedup fingerprints and tokenizers must see one canonical form first.
  Spark has no built-in normalizer, so this is the documented slow-path
  done right: an Arrow-batched pandas UDF (`Series.str.normalize`),
  never per-row Python. The DuckDB oracle uses `nfc_normalize` — two
  independent Unicode implementations agreeing on every value is the
  strongest cross-engine check in the text family.
- **Gini impurity profiling** — category-concentration of the corpus's
  grouping columns (the statistic behind dictionary-encoding and
  partition-key choices). Deliberately Gini, not entropy: the
  impurity is a RATIONAL function of the counts (1 - Σc²/N²), so both
  engines compute it bit-identically with no ln/log2 (the same
  transcendental-free trade as dq_distribution_drift's chi-square).
- **Epoch reshuffling** — multi-epoch training wants a DIFFERENT
  document order each epoch without materializing permutations: order
  by an exact-integer Knuth hash of (doc_id, epoch). Resumable and
  coordination-free: any worker can compute any epoch's order for any
  shard independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

# e -> e + COMBINING ACUTE ACCENT: a deterministic decomposed-form
# injection both engines can express, so the ASCII test corpus
# exercises real normalization work.
_COMBINING_ACUTE = "́"


@query(
    "text_unicode_normalize",
    oracle="""
    WITH d AS (
        SELECT lang, text,
               replace(text, 'e', 'e' || chr(769)) AS dec
        FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(length(dec)) AS BIGINT) AS chars_decomposed,
           CAST(SUM(length(nfc_normalize(dec))) AS BIGINT) AS chars_nfc,
           CAST(SUM(length(text)) AS BIGINT) AS chars_raw
    FROM d GROUP BY lang ORDER BY lang
    """,
)
def text_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NFC-normalize the corpus and account for it: every 'e' is first
    decomposed to e+U+0301 (making the ASCII corpus carry real
    combining sequences), then normalized back — chars_nfc must equal
    chars_raw exactly, and the oracle recomputes both sides with
    DuckDB's independent `nfc_normalize`.

    Scale: the normalizer is a vectorized pandas UDF (Arrow batches,
    pandas' ICU-free `str.normalize`), map-side only — no shuffle until
    the final per-language rollup. At 100 TB this fuses into the same
    scan as the other per-doc text features. Defined inside the query
    so cloudpickle ships it by value to Python workers (driver sessions
    never have this repo on the executor sys.path)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(s):
        return s.str.normalize("NFC")

    docs = load(spark, sf_dir, "documents").select(
        "lang",
        "text",
        F.replace(
            F.col("text"), F.lit("e"), F.lit("e" + _COMBINING_ACUTE)
        ).alias("dec"),
    )
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.length("dec")).cast("long").alias("chars_decomposed"),
            F.sum(F.length(nfc(F.col("dec"))))
            .cast("long")
            .alias("chars_nfc"),
            F.sum(F.length("text")).cast("long").alias("chars_raw"),
        )
        .orderBy("lang")
    )


@query(
    "profile_gini_impurity",
    oracle="""
    WITH lang_c AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS c FROM documents GROUP BY lang
    ),
    src_c AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS c FROM documents GROUP BY source
    ),
    stats AS (
        SELECT 'lang' AS col_name,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               CAST(SUM(c * c) AS BIGINT) AS sum_sq,
               CAST(SUM(c) AS BIGINT) AS total
        FROM lang_c
        UNION ALL
        SELECT 'source',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(c * c) AS BIGINT),
               CAST(SUM(c) AS BIGINT)
        FROM src_c
    )
    SELECT col_name, n_distinct,
           1.0 - CAST(sum_sq AS DOUBLE) / CAST(total * total AS DOUBLE)
               AS gini_impurity
    FROM stats ORDER BY col_name
    """,
)
def profile_gini_impurity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Category concentration of the corpus's grouping columns as Gini
    impurity (1 - Σc²/N²): 0 = one value dominates (dict-encode it,
    don't partition by it), near 1-1/k = uniform over k values (a safe
    partition key). Rational in the counts — no logarithm — so Spark
    and DuckDB agree bit-for-bit (entropy would drift in the last ulp
    across libm implementations).

    Scale: one map-side-combined count per column (shuffle carries one
    row per distinct value), then a scalar rollup; the per-column
    frames are unioned driver-free. This is the statistic
    profile_dict_encoding's byte model and the partition-key choice
    both consume."""
    docs = load(spark, sf_dir, "documents")

    def col_stats(col: str) -> DataFrame:
        counts = docs.groupBy(col).agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
        return counts.agg(
            F.lit(col).alias("col_name"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.sum(F.col("c") * F.col("c")).cast("long").alias("sum_sq"),
            F.sum("c").cast("long").alias("total"),
        )
    stats = col_stats("lang").unionByName(col_stats("source"))
    return stats.select(
        "col_name",
        "n_distinct",
        (
            F.lit(1.0)
            - F.col("sum_sq").cast("double")
            / (F.col("total") * F.col("total")).cast("double")
        ).alias("gini_impurity"),
    ).orderBy("col_name")


# Knuth multiplicative hash, exact-integer: operands reduced mod 2^16
# FIRST so the product stays < 2^48 — Spark's silent int64 wrap and
# DuckDB's overflow error can never diverge (the round-4 advice fix,
# same reduction as sample_temperature_mix).
_EPOCHS = 3
_TOPK = 10


def _epoch_hash_sql(expr: str, epoch: str) -> str:
    return (
        f"((({expr}) % 65536) * 2654435761 + ({epoch}) * 40503) % 65536"
    )


@query(
    "sample_epoch_shuffle",
    oracle=f"""
    WITH epochs AS (SELECT UNNEST(range(0, {_EPOCHS})) AS epoch),
    hashed AS (
        SELECT e.epoch, d.doc_id,
               {_epoch_hash_sql("d.doc_id", "e.epoch")} AS h
        FROM documents d CROSS JOIN epochs e
    ),
    ranked AS (
        SELECT epoch, doc_id, h,
               ROW_NUMBER() OVER (
                   PARTITION BY epoch ORDER BY h, doc_id
               ) AS pos
        FROM hashed
    )
    SELECT CAST(epoch AS BIGINT) AS epoch,
           CAST(pos AS BIGINT) AS pos,
           doc_id,
           CAST(h AS BIGINT) AS h
    FROM ranked WHERE pos <= {_TOPK}
    ORDER BY epoch, pos
    """,
)
def sample_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch reshuffle: each epoch orders the corpus
    by an exact-integer Knuth hash of (doc_id, epoch) — a different,
    reproducible permutation per epoch with zero materialized state
    (any worker recomputes any epoch's order for its shard
    independently; resume-safe mid-epoch). The head of each epoch's
    order is returned so the oracle pins the exact permutation prefix.

    Scale: the hash is a map-side expression; the full-epoch form is a
    range shuffle on (epoch, h) — the same cost as one sort per epoch,
    and shard-local when training shards are hash-split (h is uniform
    within any doc_id subset). The TakeOrderedAndProject here is the
    bench-friendly head, not the scale path."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    epochs = spark.range(_EPOCHS).select(F.col("id").alias("epoch"))
    hashed = docs.crossJoin(F.broadcast(epochs)).select(
        "epoch",
        "doc_id",
        (
            (
                (F.col("doc_id") % 65536) * 2654435761
                + F.col("epoch") * 40503
            )
            % 65536
        ).alias("h"),
    )
    w = W.partitionBy("epoch").orderBy("h", "doc_id")
    return (
        hashed.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= _TOPK)
        .select(
            F.col("epoch").cast("long").alias("epoch"),
            F.col("pos").cast("long").alias("pos"),
            "doc_id",
            F.col("h").cast("long").alias("h"),
        )
        .orderBy("epoch", "pos")
    )


# --- length-bucketed batching / padding-waste accounting ---------------------

_BUCKET_EDGES = [25, 50, 75]  # token-count bucket upper bounds
_BATCH_SIZE = 8


def _bucket_case_sql(n: str) -> str:
    arms = " ".join(
        f"WHEN {n} <= {e} THEN 'b{e:03d}'" for e in _BUCKET_EDGES
    )
    return f"CASE {arms} ELSE 'b999' END"


@query(
    "pack_length_buckets",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS BIGINT) AS n
      FROM documents
    ),
    bucketed AS (
      SELECT doc_id, n, {_bucket_case_sql('n')} AS bucket FROM toks
    ),
    batched AS (
      SELECT bucket, n,
             (row_number() OVER (PARTITION BY bucket ORDER BY n, doc_id)
              - 1) // {_BATCH_SIZE} AS batch_id
      FROM bucketed
    ),
    per_batch AS (
      SELECT bucket, batch_id,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(MAX(n) AS BIGINT) AS max_n,
             CAST(SUM(n) AS BIGINT) AS sum_n
      FROM batched GROUP BY bucket, batch_id
    )
    SELECT bucket,
           CAST(SUM(cnt) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_batches,
           CAST(SUM(sum_n) AS BIGINT) AS total_tokens,
           CAST(SUM(max_n * cnt) AS BIGINT) AS padded_tokens,
           CAST(SUM(max_n * cnt) - SUM(sum_n) AS BIGINT) AS pad_waste,
           CAST(SUM(max_n * cnt) - SUM(sum_n) AS DOUBLE)
             / CAST(SUM(max_n * cnt) AS DOUBLE) AS pad_frac
    FROM per_batch
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def pack_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching with padding-waste accounting: documents
    are bucketed by token count (≤25/≤50/≤75/rest), batched 8-at-a-time
    in (n, doc_id) order within each bucket, and each bucket reports how
    many pad tokens batch-max padding would burn (the statistic behind
    choosing bucket edges for trainer batch shaping — unbucketed
    batching pads everything to the global max).

    Scale: token counting is map-side; the ONLY shuffle is the bucket
    partition, and the row_number window is partitioned by bucket (at
    100 TB each bucket further splits by training shard and the batch
    numbering becomes shard-local, exactly like pack_sequences'
    shard-local packing). All arithmetic is integer until the final
    pad_frac division — bit-identical cross-engine."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    n = F.size(
        F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    ).cast("long")
    bucket = F.when(F.col("n") <= _BUCKET_EDGES[0], "b025")
    for e in _BUCKET_EDGES[1:]:
        bucket = bucket.when(F.col("n") <= e, f"b{e:03d}")
    bucket = bucket.otherwise("b999")

    toks = docs.select("doc_id", n.alias("n")).withColumn("bucket", bucket)
    batched = toks.withColumn(
        "batch_id",
        F.expr(f"(row_number() OVER (PARTITION BY bucket ORDER BY n, doc_id) - 1) div {_BATCH_SIZE}"),
    )
    per_batch = batched.groupBy("bucket", "batch_id").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.max("n").alias("max_n"),
        F.sum("n").alias("sum_n"),
    )
    padded = F.sum(F.col("max_n") * F.col("cnt"))
    total = F.sum(F.col("sum_n"))
    return (
        per_batch.groupBy("bucket")
        .agg(
            F.sum("cnt").alias("n_docs"),
            F.count(F.lit(1)).alias("n_batches"),
            total.alias("total_tokens"),
            padded.alias("padded_tokens"),
            (padded - total).alias("pad_waste"),
            (
                (padded - total).cast("double") / padded.cast("double")
            ).alias("pad_frac"),
        )
        .orderBy("bucket")
    )
