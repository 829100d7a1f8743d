"""Training-data pipeline operators, round 3: sequence packing,
curriculum ordering, and point-in-time (temporal) joins over SCD2
history.

These extend the LLM-pipeline surface (no analog in the reference —
its whole pipeline is one encrypted file, SURVEY.md §1): packing turns
cleaned documents into fixed-length training sequences, curriculum
ordering assigns every document a deterministic global training
position, and the point-in-time join is how a feature pipeline reads a
versioned dimension "as of" each fact's timestamp without leaking
future state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

_PACK_L = 2048  # tokens per packed training sequence
_PACK_SHARDS = 8


@query(
    "pack_sequences",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tok,
             md5(CAST(doc_id AS VARCHAR) || ':pk') AS h,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':pk'),
                                      1, 2)) AS INT) % {_PACK_SHARDS} AS shard
      FROM documents
    ),
    placed AS (
      SELECT shard, doc_id, n_tok,
             COALESCE(SUM(n_tok) OVER (
               PARTITION BY shard ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS tok_before
      FROM docs
    )
    SELECT CAST(shard AS INT) AS shard,
           CAST(tok_before // {_PACK_L} AS BIGINT) AS seq_in_shard,
           COUNT(*) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc_id,
           CAST(SUM(n_tok) AS BIGINT) AS tokens_started
    FROM placed
    GROUP BY shard, tok_before // {_PACK_L}
    ORDER BY shard, seq_in_shard
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into fixed-length ({_PACK_L}-token) training
    sequences, sharded: each doc hashes to one of {_PACK_SHARDS} shards,
    takes a deterministic position inside its shard (hash order), and is
    assigned the sequence where its first token lands (documents may
    span a boundary — standard pretraining packing). Emits per-sequence
    occupancy: docs starting there, their token mass.

    Scale: packing needs a RUNNING token offset, which is inherently
    sequential — so the global order is split into hash shards first and
    the cumulative sum runs per shard (one window partition each, all
    shards in parallel, no global single-reducer sort). At 100 TB shard
    count scales with cluster width; determinism (hash order, not input
    order) makes the packing reproducible on any cluster size. All
    integer arithmetic — no float drift surface."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("n_tok"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":pk"))).alias(
            "h"
        ),
    )
    shard = (
        F.conv(F.substring("h", 1, 2), 16, 10).cast("int") % _PACK_SHARDS
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = docs.withColumn("shard", shard).withColumn(
        "tok_before", F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    )
    return (
        placed.groupBy(
            "shard",
            F.expr(f"tok_before div {_PACK_L}").alias("seq_in_shard"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_doc_id"),
            F.sum("n_tok").alias("tokens_started"),
        )
        .orderBy("shard", "seq_in_shard")
    )


@query(
    "curriculum_order",
    oracle="""
    WITH scored AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n,
             len(list_distinct(string_split(text, ' '))) AS n_uniq,
             md5(CAST(doc_id AS VARCHAR) || ':cu') AS h
      FROM documents
    ),
    bucketed AS (
      SELECT doc_id, h,
             CASE WHEN 100 * n_uniq >= 60 * n THEN 0
                  WHEN 100 * n_uniq >= 35 * n THEN 1
                  ELSE 2 END AS bucket
      FROM scored
    ),
    offsets AS (
      SELECT bucket,
             COALESCE(SUM(COUNT(*)) OVER (
               ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS base
      FROM bucketed GROUP BY bucket
    ),
    ranked AS (
      SELECT b.doc_id, b.bucket,
             o.base + ROW_NUMBER() OVER (
               PARTITION BY b.bucket ORDER BY b.h, b.doc_id
             ) - 1 AS curriculum_idx
      FROM bucketed b JOIN offsets o ON b.bucket = o.bucket
    )
    SELECT CAST(curriculum_idx AS BIGINT) AS curriculum_idx,
           CAST(doc_id AS BIGINT) AS doc_id,
           CAST(bucket AS INT) AS bucket
    FROM ranked
    WHERE curriculum_idx < 100
    ORDER BY curriculum_idx
    """,
)
def curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic curriculum: every document gets a GLOBAL training
    position — high-lexical-diversity docs first (bucket 0), then mid,
    then low — shuffled within each bucket by content hash. Emits the
    first 100 positions.

    Scale: a naive global row_number is one reducer over the corpus.
    Here the global index is two-level: per-bucket row_number (parallel
    window partitions) + broadcast bucket offsets (cumulative counts
    over ≤3 rows) — the standard distributed zipWithIndex decomposition.
    Integer-only scoring (100·uniq ≥ 60·n) avoids float thresholds."""
    toks = F.split(F.col("text"), " ")
    scored = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(toks).alias("n"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":cu"))).alias(
            "h"
        ),
    )
    bucketed = scored.select(
        "doc_id",
        "h",
        F.when(100 * F.col("n_uniq") >= 60 * F.col("n"), 0)
        .when(100 * F.col("n_uniq") >= 35 * F.col("n"), 1)
        .otherwise(2)
        .alias("bucket"),
    )
    counts = bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
    offsets = counts.select(
        "bucket",
        F.coalesce(
            F.sum("c").over(
                Window.orderBy("bucket").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("base"),
    )
    rn = F.row_number().over(
        Window.partitionBy("bucket").orderBy("h", "doc_id")
    )
    ranked = bucketed.withColumn("rn", rn).join(
        F.broadcast(offsets), "bucket"
    )
    return (
        ranked.select(
            (F.col("base") + F.col("rn") - 1).alias("curriculum_idx"),
            "doc_id",
            F.col("bucket").cast("int").alias("bucket"),
        )
        .filter(F.col("curriculum_idx") < 100)
        .orderBy("curriculum_idx")
    )


@query(
    "scd2_point_in_time_join",
    oracle="""
    WITH dim AS (
      SELECT user_id,
             epoch_us(ts) AS valid_from_us,
             lead(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS valid_to_us,
             event_id AS version_event_id,
             value AS version_value
      FROM events
      WHERE user_id < 10 AND event_type = 'purchase'
    ),
    probes AS (
      SELECT event_id AS probe_event_id, user_id, epoch_us(ts) AS t
      FROM events
      WHERE user_id < 10 AND event_type = 'click'
    )
    SELECT p.probe_event_id, p.user_id, p.t AS probe_ts_us,
           d.version_event_id, d.version_value
    FROM probes p
    JOIN dim d
      ON p.user_id = d.user_id
     AND d.valid_from_us <= p.t
     AND (d.valid_to_us IS NULL OR p.t < d.valid_to_us)
    ORDER BY p.probe_event_id
    """,
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join: each probe event reads the SCD2
    dimension version that was valid AT ITS TIMESTAMP — the
    leakage-free way a feature pipeline joins a versioned dimension
    (never the current row, never a future version). Dimension = SCD2
    intervals built from purchase events (scd2_build's construction);
    probes = click events; match on key + half-open interval
    [valid_from, valid_to). Clicks before a user's first purchase
    correctly drop out (inner join).

    Scale: equi-join on user_id carries the work; the interval
    predicate is a post-join filter within each key's (bounded) version
    history — same shuffle budget as any keyed join, no range-join
    explosion. Versions-per-key is the state bound, as in scd2_build."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    dim = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts_us", "event_id", "value")
        .select(
            "user_id",
            F.col("ts_us").alias("valid_from_us"),
            F.lead("ts_us").over(w).alias("valid_to_us"),
            F.col("event_id").alias("version_event_id"),
            F.col("value").alias("version_value"),
        )
    )
    probes = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("probe_event_id"),
        "user_id",
        F.col("ts_us").alias("t"),
    )
    joined = probes.join(
        dim,
        (probes["user_id"] == dim["user_id"])
        & (dim["valid_from_us"] <= probes["t"])
        & (dim["valid_to_us"].isNull() | (probes["t"] < dim["valid_to_us"])),
    )
    return joined.select(
        "probe_event_id",
        probes["user_id"].alias("user_id"),
        F.col("t").alias("probe_ts_us"),
        "version_event_id",
        "version_value",
    ).orderBy("probe_event_id")


# --- weighted reservoir sampling -------------------------------------------

_WR_K = 64
_WR_POW = 52  # 13 hex digits = 52 hash bits -> u is an exact dyadic rational


@query(
    "sample_weighted_reservoir",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS weight,
             (CAST(CAST(concat('0x',
                substr(md5(CAST(doc_id AS VARCHAR) || ':wr'), 1, 13))
                AS BIGINT) AS DOUBLE) / {2 ** _WR_POW}.0)
               * CAST(n_chars AS BIGINT) AS priority
      FROM documents
    )
    SELECT doc_id, lang, weight, priority
    FROM keyed
    ORDER BY priority DESC, doc_id
    LIMIT {_WR_K}
    """,
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted reservoir sample (fixed k, heavier docs more likely):
    every doc draws a deterministic uniform u from its salted content
    hash and races with priority u·w; the top-k priorities win — the
    exponential-race (A-ES) scheme with the race key's ln() replaced by
    a rational surrogate, the same cross-engine-determinism trade
    text_bm25_rank makes for idf (ties in u·w are broken by doc_id).

    u = hash_52bits / 2^52 is an EXACT dyadic rational and u·w is one
    correctly-rounded IEEE multiply, so both engines compute bit-equal
    priorities — no transcendental in sight.

    Scale: executes as TakeOrderedAndProject (per-partition top-k, k-row
    final merge) — one scan, no shuffle of the corpus, identical sample
    on any partitioning/cluster size; re-runs are resumable because the
    sample is a pure function of content keys."""
    docs = load(spark, sf_dir, "documents")
    m = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":wr"))),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    w = F.col("n_chars").cast("long")
    priority = (m.cast("double") / F.lit(float(2 ** _WR_POW))) * w
    return (
        docs.select(
            "doc_id",
            "lang",
            w.alias("weight"),
            priority.alias("priority"),
        )
        .orderBy(F.col("priority").desc(), "doc_id")
        .limit(_WR_K)
    )


# --- snapshot reconciliation (diff two table versions) ---------------------


def _order_snapshots(spark: SparkSession, sf_dir: str):
    """Two deterministic versions of orders: v_new deletes every 11th
    key, bumps every 7th key's price by 1.00, and appends an insert
    (key+10M clone) for every 13th key."""
    base = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    k = F.col("o_orderkey")
    kept = base.filter(k % 11 != 0)
    changed = kept.withColumn(
        "o_totalprice",
        F.when(k % 7 == 0, F.col("o_totalprice") + 1.0).otherwise(
            F.col("o_totalprice")
        ),
    )
    inserts = base.filter(k % 13 == 0).withColumn(
        "o_orderkey", k + 10_000_000
    )
    return base, changed.unionByName(inserts)


@query(
    "snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    ),
    new AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 11 <> 0
      UNION ALL
      SELECT o_orderkey + 10000000, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 13 = 0
    ),
    tagged AS (
      SELECT CASE
               WHEN o.o_orderkey IS NULL THEN 'added'
               WHEN n.o_orderkey IS NULL THEN 'removed'
               WHEN o.o_totalprice <> n.o_totalprice
                 OR o.o_orderstatus <> n.o_orderstatus THEN 'changed'
               ELSE 'unchanged'
             END AS change_type,
             COALESCE(o.o_orderkey, n.o_orderkey) AS key,
             COALESCE(n.o_totalprice, 0) - COALESCE(o.o_totalprice, 0)
               AS price_delta
      FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    )
    SELECT change_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(key) AS min_key, MAX(key) AS max_key,
           CAST(CAST(SUM(CAST(price_delta AS DECIMAL(38,10))) AS VARCHAR)
                AS DOUBLE) AS sum_price_delta
    FROM tagged
    GROUP BY change_type
    ORDER BY change_type
    """,
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: diff two versions of a table into
    added / removed / changed / unchanged row classes with per-class
    counts, key range, and net price drift — the audit primitive behind
    CDC validation, backfill verification, and lakehouse snapshot
    compare (complements upsert_snapshot/scd2_build, which APPLY changes;
    this one EXPLAINS them).

    Scale: one full-outer shuffle join on the key (both sides
    co-partition; AQE handles skew), then a 4-group aggregate — no
    driver materialization. At 100 TB the join is the honest cost of a
    full reconcile; partition-level content hashes (profile_table) are
    the cheap pre-filter that skips identical partitions."""
    from ..registry import dsum

    old, new = _order_snapshots(spark, sf_dir)
    o = old.alias("o")
    n = new.alias("n")
    joined = o.join(
        n, F.col("o.o_orderkey") == F.col("n.o_orderkey"), "full_outer"
    )
    change = (
        F.when(F.col("o.o_orderkey").isNull(), "added")
        .when(F.col("n.o_orderkey").isNull(), "removed")
        .when(
            (F.col("o.o_totalprice") != F.col("n.o_totalprice"))
            | (F.col("o.o_orderstatus") != F.col("n.o_orderstatus")),
            "changed",
        )
        .otherwise("unchanged")
    )
    tagged = joined.select(
        change.alias("change_type"),
        F.coalesce(F.col("o.o_orderkey"), F.col("n.o_orderkey")).alias("key"),
        (
            F.coalesce(F.col("n.o_totalprice"), F.lit(0.0))
            - F.coalesce(F.col("o.o_totalprice"), F.lit(0.0))
        ).alias("price_delta"),
    )
    return (
        tagged.groupBy("change_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("key").alias("min_key"),
            F.max("key").alias("max_key"),
            dsum(F.col("price_delta")).alias("sum_price_delta"),
        )
        .orderBy("change_type")
    )
