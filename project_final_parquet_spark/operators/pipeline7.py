"""Round-6 pipeline operators, batch 2: RAKE keyphrase extraction,
soft-dedup weighting, average precision of the probe ranking, and the
difference-in-differences experiment readout.

Not in the reference (SURVEY.md §2.1 — no text-mining/eval surface);
extends the llm_text (keyphrases), dedup (soft weighting), ml_eval
(ranking metrics), and experiment (events_ab_*) families.

Determinism: counts and degrees are exact BIGINTs; every double is a
rational of exact integers or a DSUM (order-independent
DECIMAL(38,10) sum) of such rationals — registry convention #2
throughout; ranks tie-break on unique ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..registry import DSUM_SQL, dsum, query
from ..tables import load
from .vector_stats import PROBE_SCORED_CTES, probe_scores

# The corpus's stopword inventory (synthetic vocabulary has exactly
# these two function words); RAKE splits candidate phrases on them.
_STOPWORDS = ["a", "the"]
_RAKE_TOPK = 15

_STOP_SQL = ", ".join(f"'{s}'" for s in _STOPWORDS)


@query(
    "text_keyphrase_rake",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, pos, token,
             token IN ({_STOP_SQL}) AS is_stop
      FROM (
        SELECT doc_id,
               generate_subscripts(string_split(text, ' '), 1) AS pos,
               unnest(string_split(text, ' ')) AS token
        FROM documents
      ) WHERE token <> ''
    ),
    runs AS (
      SELECT doc_id, pos, token,
             CAST(SUM(CASE WHEN is_stop THEN 1 ELSE 0 END)
                  OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT)
               AS phrase_id,
             is_stop
      FROM tok
    ),
    members AS (
      SELECT doc_id, phrase_id, pos, token FROM runs WHERE NOT is_stop
    ),
    phrases AS (
      SELECT doc_id, phrase_id,
             array_to_string(list(token ORDER BY pos), ' ') AS phrase,
             CAST(COUNT(*) AS BIGINT) AS n_words
      FROM members GROUP BY doc_id, phrase_id
    ),
    wstat AS (
      SELECT m.token,
             CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(p.n_words) AS BIGINT) AS deg
      FROM members m
      JOIN phrases p USING (doc_id, phrase_id)
      GROUP BY m.token
    ),
    pscore AS (
      SELECT p.phrase, p.doc_id, p.phrase_id,
             {DSUM_SQL.format(
                 expr="CAST(w.deg AS DOUBLE) / w.freq"
             )} AS score
      FROM phrases p
      JOIN members m USING (doc_id, phrase_id)
      JOIN wstat w ON m.token = w.token
      GROUP BY p.phrase, p.doc_id, p.phrase_id
    ),
    byphrase AS (
      SELECT phrase,
             CAST(COUNT(*) AS BIGINT) AS n_occurrences,
             MAX(score) AS score
      FROM pscore GROUP BY phrase
    )
    SELECT phrase, n_occurrences, score
    FROM byphrase
    ORDER BY score DESC, phrase
    LIMIT {_RAKE_TOPK}
    """,
)
def text_keyphrase_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010): candidate phrases
    are maximal stopword-free token runs; each word scores
    degree/frequency (degree = total length of phrases it appears in),
    a phrase scores the sum of its word scores, and the corpus-level
    top-15 phrases come back with occurrence counts — the unsupervised
    keyword inventory a corpus triage pass materializes before topic
    labeling or boilerplate review.

    Determinism: identical scores for identical phrase text (word
    stats are corpus-global), so MAX(score) per phrase is exact;
    phrase scores are DSUMs of exact rationals deg/freq; final order
    (score DESC, phrase) is total.

    Scale: tokenization is one explode; phrase assembly is a per-doc
    window (running stopword count — partitioned by doc_id, bounded by
    doc length); word stats are one token-key shuffle (map-side
    combined); phrase scoring joins members to the broadcast-size word
    table and DSUMs per phrase. Top-k is TakeOrderedAndProject. No
    all-pairs, no unpartitioned windows."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    tok = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token"),
        )
        .filter(F.col("token") != "")
        .select(
            "doc_id",
            "pos",
            "token",
            F.col("token").isin(_STOPWORDS).alias("is_stop"),
        )
    )
    runs = tok.select(
        "doc_id",
        "pos",
        "token",
        "is_stop",
        F.sum(F.when(F.col("is_stop"), 1).otherwise(0))
        .over(W.partitionBy("doc_id").orderBy("pos"))
        .cast("long")
        .alias("phrase_id"),
    )
    # attach phrase text + length via ONE window pass over the phrase
    # partition instead of groupBy+self-join — keeps the exploded token
    # stream a single lineage (documents scanned once per consumer, not
    # once per join arm; plan-asserted)
    wp = W.partitionBy("doc_id", "phrase_id").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    members = runs.filter(~F.col("is_stop")).select(
        "doc_id",
        "phrase_id",
        "token",
        F.count(F.lit(1)).over(wp).cast("long").alias("n_words"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "token")).over(wp)
                ),
                lambda s: s["token"],
            ),
        ).alias("phrase"),
    )
    wstat = members.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum("n_words").cast("long").alias("deg"),
    )
    pscore = (
        members.join(F.broadcast(wstat), "token")
        .groupBy("phrase", "doc_id", "phrase_id")
        .agg(
            dsum(F.col("deg").cast("double") / F.col("freq")).alias("score")
        )
    )
    byphrase = pscore.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.max("score").alias("score"),
    )
    return (
        byphrase.select("phrase", "n_occurrences", "score")
        .orderBy(F.desc("score"), "phrase")
        .limit(_RAKE_TOPK)
    )


@query(
    "dedup_soft_weights",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             concat_ws(' ', string_split(text,' ')[1],
                       string_split(text,' ')[2], string_split(text,' ')[3],
                       string_split(text,' ')[4], string_split(text,' ')[5])
               AS fingerprint
      FROM documents
    ),
    clus AS (
      SELECT fingerprint, CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM fp GROUP BY fingerprint
    ),
    hist AS (
      SELECT cluster_size,
             CAST(COUNT(*) AS BIGINT) AS n_clusters,
             CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS DOUBLE) AS eff_docs
      FROM clus GROUP BY cluster_size
    ),
    tot AS (
      SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs,
             CAST(CAST(SUM(CAST(eff_docs AS DECIMAL(38,10)))
                  AS VARCHAR) AS DOUBLE) AS total_eff
      FROM hist
    )
    SELECT h.cluster_size, h.n_clusters, h.n_docs,
           1.0 / h.cluster_size AS soft_weight,
           t.total_docs, t.total_eff,
           t.total_eff / t.total_docs AS retention_ratio
    FROM hist h CROSS JOIN tot t
    ORDER BY h.cluster_size
    """,
)
def dedup_soft_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft deduplication weighting (SoftDeDup: keep every copy but
    train with weight 1/cluster_size, preserving distributional mass
    while removing duplication bias — the alternative to hard-dropping
    that recent pretraining recipes prefer for near-boilerplate).
    Clusters use the first-5-token prefix fingerprint — the SAME
    template-cluster definition as dedup_fingerprint_prefix, the
    duplication mode this corpus actually has (full-text exact
    duplicates don't exist in it). Per cluster size: cluster count,
    doc count, the per-copy weight, and the corpus-level effective
    size (sum of weights = number of clusters) with the retention
    ratio a recipe audit reports.

    Scale: prefix fingerprint map-side, one fingerprint-key shuffle
    (map-side combined) into cluster sizes, then a size histogram
    (bounded by |distinct sizes|) and a broadcast singleton total —
    the exact shape of dedup_fingerprint_prefix with histogram tail.
    Weights are exact rationals; the effective total is a DSUM."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    clus = (
        docs.select(
            F.concat_ws(" ", F.slice(toks, 1, 5)).alias("fingerprint")
        )
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).cast("long").alias("cluster_size"))
    )
    hist = clus.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1)))
        .cast("long")
        .alias("n_docs"),
        F.count(F.lit(1)).cast("double").alias("eff_docs"),
    )
    tot = hist.agg(
        F.sum("n_docs").cast("long").alias("total_docs"),
        dsum(F.col("eff_docs")).alias("total_eff"),
    )
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "cluster_size",
            "n_clusters",
            "n_docs",
            (F.lit(1.0) / F.col("cluster_size")).alias("soft_weight"),
            "total_docs",
            "total_eff",
            (F.col("total_eff") / F.col("total_docs")).alias(
                "retention_ratio"
            ),
        )
        .orderBy("cluster_size")
    )


@query(
    "ml_average_precision",
    oracle=f"""
    WITH {PROBE_SCORED_CTES},
    ranked AS (
      SELECT label,
             ROW_NUMBER() OVER (ORDER BY score DESC, vec_id) AS rn
      FROM scored
    ),
    pos AS (
      SELECT rn,
             ROW_NUMBER() OVER (ORDER BY rn) AS pr
      FROM ranked WHERE label = 0
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pos,
             {DSUM_SQL.format(expr="CAST(pr AS DOUBLE) / rn")} AS ap_sum
      FROM pos
    )
    SELECT n_pos, ap_sum, ap_sum / n_pos AS average_precision
    FROM agg
    """,
)
def ml_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (PR-AUC by the standard step definition) of
    the linear-probe ranking: AP = mean over positives of
    precision-at-their-rank, computed by the two-row_number identity
    precision@rank(p) = positive_rank(p) / global_rank(p) — no running
    window over the whole stream, just two sorts and one DSUM. The
    PR-side complement of ml_linear_probe_auc (ROC-AUC): under class
    imbalance AP moves first, which is why eval harnesses report both.

    Scale: the global rank is the shared probe-sort contract; the
    positive re-rank sorts only the positive subset. Both are single
    sorts of doubles; the reduction is one DSUM of exact-rational
    terms into a single row — bit-identical cross-engine."""
    scored = probe_scores(spark, sf_dir)
    ranked = scored.select(
        "label",
        F.row_number().over(W.orderBy(F.desc("score"), "vec_id")).alias("rn"),
    )
    pos = ranked.filter(F.col("label") == 0).select(
        "rn", F.row_number().over(W.orderBy("rn")).alias("pr")
    )
    agg = pos.agg(
        F.count(F.lit(1)).cast("long").alias("n_pos"),
        dsum(F.col("pr").cast("double") / F.col("rn")).alias("ap_sum"),
    )
    return agg.select(
        "n_pos",
        "ap_sum",
        (F.col("ap_sum") / F.col("n_pos")).alias("average_precision"),
    )


@query(
    "events_diff_in_diff",
    oracle=f"""
    WITH days AS (
      SELECT MIN(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)))
               AS d0,
             MAX(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)))
               AS d1
      FROM events
    ),
    per_user AS (
      SELECT user_id,
             CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
             {DSUM_SQL.format(
                 expr="CASE WHEN date_diff('day', DATE '1970-01-01', "
                 "CAST(ts AS DATE)) < d0 + (d1 - d0 + 1) // 2 "
                 "THEN value ELSE 0.0 END"
             )} AS pre_val,
             {DSUM_SQL.format(
                 expr="CASE WHEN date_diff('day', DATE '1970-01-01', "
                 "CAST(ts AS DATE)) >= d0 + (d1 - d0 + 1) // 2 "
                 "THEN value ELSE 0.0 END"
             )} AS post_val
      FROM events CROSS JOIN days
      GROUP BY user_id
    ),
    arm AS (
      SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_users,
             {DSUM_SQL.format(expr="pre_val")} AS s_pre,
             {DSUM_SQL.format(expr="post_val")} AS s_post
      FROM per_user GROUP BY variant
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN variant = 'A' THEN n_users END) AS n_a,
        MAX(CASE WHEN variant = 'A' THEN s_pre END) AS pre_a,
        MAX(CASE WHEN variant = 'A' THEN s_post END) AS post_a,
        MAX(CASE WHEN variant = 'B' THEN n_users END) AS n_b,
        MAX(CASE WHEN variant = 'B' THEN s_pre END) AS pre_b,
        MAX(CASE WHEN variant = 'B' THEN s_post END) AS post_b
      FROM arm
    )
    SELECT n_a, n_b,
           pre_a / n_a AS mean_pre_a, post_a / n_a AS mean_post_a,
           pre_b / n_b AS mean_pre_b, post_b / n_b AS mean_post_b,
           (post_b / n_b - pre_b / n_b) - (post_a / n_a - pre_a / n_a)
             AS did_estimate
    FROM wide
    """,
)
def events_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences readout over the same experiment frame
    as events_ab_cuped (user-parity arms, midpoint-day pre/post split):
    DiD = (B_post - B_pre) - (A_post - A_pre) on per-user value means —
    the causal-inference workhorse when arms differ at baseline (which
    parity arms do here, making the correction visible). Completes the
    experiment-audit trio: SRM validity gate, CUPED variance reduction,
    DiD baseline correction.

    Scale: identical shape to events_ab_cuped — one user-keyed shuffle
    with conditional DSUMs, one 2-row arm aggregate pivoted to a single
    row by MAX-CASE. Every double is DSUM-then-IEEE, bit-identical
    cross-engine."""
    ev = load(spark, sf_dir, "events")
    day_idx = F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
    days = ev.agg(F.min(day_idx).alias("d0"), F.max(day_idx).alias("d1"))
    mid = F.col("d0") + F.expr("(d1 - d0 + 1) div 2")
    per_user = (
        ev.crossJoin(F.broadcast(days))
        .select(
            "user_id",
            F.when(day_idx < mid, F.col("value")).otherwise(0.0).alias("pv"),
            F.when(day_idx >= mid, F.col("value")).otherwise(0.0).alias("qv"),
        )
        .groupBy("user_id")
        .agg(dsum(F.col("pv")).alias("pre_val"), dsum(F.col("qv")).alias("post_val"))
        .select(
            F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("variant"),
            "pre_val",
            "post_val",
        )
    )
    arm = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        dsum(F.col("pre_val")).alias("s_pre"),
        dsum(F.col("post_val")).alias("s_post"),
    )
    wide = arm.agg(
        F.max(F.when(F.col("variant") == "A", F.col("n_users"))).alias("n_a"),
        F.max(F.when(F.col("variant") == "A", F.col("s_pre"))).alias("pre_a"),
        F.max(F.when(F.col("variant") == "A", F.col("s_post"))).alias("post_a"),
        F.max(F.when(F.col("variant") == "B", F.col("n_users"))).alias("n_b"),
        F.max(F.when(F.col("variant") == "B", F.col("s_pre"))).alias("pre_b"),
        F.max(F.when(F.col("variant") == "B", F.col("s_post"))).alias("post_b"),
    )
    mean = lambda s, n: F.col(s) / F.col(n)  # noqa: E731
    return wide.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        mean("pre_a", "n_a").alias("mean_pre_a"),
        mean("post_a", "n_a").alias("mean_post_a"),
        mean("pre_b", "n_b").alias("mean_pre_b"),
        mean("post_b", "n_b").alias("mean_post_b"),
        (
            (mean("post_b", "n_b") - mean("pre_b", "n_b"))
            - (mean("post_a", "n_a") - mean("pre_a", "n_a"))
        ).alias("did_estimate"),
    )
