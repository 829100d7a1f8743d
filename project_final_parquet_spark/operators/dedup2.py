"""Cluster canonicalization — the step after near-dup clustering that
actually dedups the corpus: pick ONE representative per duplicate
cluster and report what was dropped.

Survivor policy: richest document wins (max n_chars), ties broken by
lowest doc_id — a total order, so the pick is deterministic and
cross-engine. This is the policy step most dedup pipelines bolt onto
MinHash+CC (keep the longest member, drop the rest).

Scale: inherits the CC labels (pointer-doubling, see dedup.py); the
canonicalization itself is one (component) shuffle — a window
row_number over each cluster plus a size count. Cluster cardinalities
are near-dup groups (pairs/triples, bounded by the LSH bucket sizes),
so no window partition is unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..ckpt import checkpoint, release
from ..registry import query
from ..tables import load
from .dedup import (
    _minhash_pairs_materialized,
    _minhash_pairs_sql,
    connected_components_converged,
)


@query(
    "dedup_canonicalize",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      SELECT doc_a, doc_b FROM ({_minhash_pairs_sql()}) p
    ),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION ALL
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    reach(u, label) AS (
      SELECT u, u AS label FROM (SELECT DISTINCT u FROM edges) n
      UNION
      SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.u
    ),
    labels AS (
      SELECT u AS doc_id, CAST(MIN(label) AS BIGINT) AS component_id
      FROM reach GROUP BY u
    ),
    ranked AS (
      SELECT l.component_id, l.doc_id, d.n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY l.component_id
               ORDER BY d.n_chars DESC, l.doc_id) AS rn
      FROM labels l JOIN documents d ON l.doc_id = d.doc_id
    )
    SELECT component_id,
           CAST(COUNT(*) AS BIGINT) AS cluster_size,
           CAST(MAX(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT)
             AS rep_doc_id,
           CAST(MAX(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT)
             AS rep_n_chars,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped
    FROM ranked
    GROUP BY component_id
    ORDER BY component_id
    """,
)
def dedup_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per near-dup cluster: size, surviving representative (max
    n_chars, tie → min doc_id), and how many members get dropped.
    Executes the CC iterations at construction (see registry contract
    note on iterative queries). CC runs to the FIXED POINT
    (``connected_components_converged``, the dedup_cluster_components
    form — exact min-reachable labels regardless of round count; this
    corpus converges in 2 rounds where the fixed form always paid 4,
    r12 sweep finding)."""
    # sig-checkpointed pair materialization (optimization r13 — the
    # shingle→minhash tree is evaluated once, not three times)
    pairs = _minhash_pairs_materialized(spark, sf_dir)
    edges = pairs.union(
        pairs.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    ).withColumnsRenamed({"doc_a": "u", "doc_b": "v"})
    cc_labels, _rounds = connected_components_converged(edges)
    labels = cc_labels.select(
        F.col("u").alias("doc_id"), F.col("label").alias("component_id")
    )
    release(pairs)  # final CC frame is materialized; pairs superseded

    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ranked = labels.join(docs, "doc_id").withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("component_id").orderBy(
                F.desc("n_chars"), "doc_id"
            )
        ),
    )
    return (
        ranked.groupBy("component_id")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias(
                "rep_doc_id"
            ),
            F.max(F.when(F.col("rn") == 1, F.col("n_chars"))).alias(
                "rep_n_chars"
            ),
            (F.count(F.lit(1)) - F.lit(1)).alias("n_dropped"),
        )
        .orderBy("component_id")
    )


# --- candidate-generation quality measurement ------------------------------

# ABSOLUTE truth-universe cap: the all-pairs ground truth runs on the
# EVAL_TRUTH_CAP docs with the lowest md5(doc_id:ev) — a deterministic
# top-k (TakeOrderedAndProject), so the truth stage is O(CAP²) pairs at
# ANY corpus size. A fixed *fraction* (the round-2 form: 1/4 hash
# sample) still explodes quadratically at 100 TB; a fixed count never
# does. CAP=256 binds even at sf0.01 (500 docs), so the capped path is
# what tests exercise.
EVAL_TRUTH_CAP = 256

_EV_UNIVERSE_SQL = (
    "SELECT doc_id, text FROM documents "
    "ORDER BY md5(CAST(doc_id AS VARCHAR) || ':ev'), doc_id "
    f"LIMIT {EVAL_TRUTH_CAP}"
)


def _eval_oracle() -> str:
    from .dedup import _JACCARD_T, _LSH_BANDS, _MH_SIG_SQL, _SH3_SQL

    jac = (
        "CAST(len(list_intersect({a}.sh, {b}.sh)) AS DOUBLE)"
        " / len(list_distinct({a}.sh || {b}.sh))"
    )
    return f"""
    WITH universe AS (
      {_EV_UNIVERSE_SQL}
    ),
    tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM universe),
    sh AS (SELECT doc_id, {_SH3_SQL} AS sh FROM tok),
    truth AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE {jac.format(a='a', b='b')} >= {_JACCARD_T}
    ),
    base AS (
      SELECT doc_id, sh,
             list_transform(sh,
               x -> CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)) AS bh
      FROM sh
    ),
    sig AS (SELECT doc_id, sh, {_MH_SIG_SQL} AS sig FROM base),
    bands AS (
      SELECT doc_id, b, sig[2*b + 1] AS v1, sig[2*b + 2] AS v2
      FROM sig CROSS JOIN (SELECT unnest(range({_LSH_BANDS})) AS b) t
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.b = b.b AND a.v1 = b.v1 AND a.v2 = b.v2
           AND a.doc_id < b.doc_id
    ),
    verified AS (
      SELECT c.doc_a, c.doc_b
      FROM cand c
      JOIN sh x ON x.doc_id = c.doc_a
      JOIN sh y ON y.doc_id = c.doc_b
      WHERE {jac.format(a='x', b='y')} >= {_JACCARD_T}
    ),
    counts AS (
      SELECT (SELECT COUNT(*) FROM truth) AS n_true,
             (SELECT COUNT(*) FROM cand) AS n_cand,
             (SELECT COUNT(*) FROM verified) AS n_cand_true
    )
    SELECT CAST(n_true AS BIGINT) AS n_true,
           CAST(n_cand AS BIGINT) AS n_cand,
           CAST(n_cand_true AS BIGINT) AS n_cand_true,
           CAST(CASE WHEN n_true > 0
                     THEN (1000 * n_cand_true) // n_true END AS BIGINT)
             AS recall_x1000,
           CAST(CASE WHEN n_cand > 0
                     THEN (1000 * n_cand_true) // n_cand END AS BIGINT)
             AS cand_precision_x1000
    FROM counts
    """


@query("dedup_eval_recall", oracle=_eval_oracle())
def dedup_eval_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured quality of the MinHash+LSH candidate stage vs exact
    all-pairs Jaccard ground truth, on the ``EVAL_TRUTH_CAP`` (=256)
    docs with the lowest eval-hash — the "measure, don't guess" eval
    harness for the dedup family. Emits candidate-stage recall and
    precision (×1000, integer floor) against truth = pairs with
    Jaccard ≥ 0.5.

    The all-pairs ground truth is confined to an ABSOLUTE-size sampled
    universe: the truth stage is O(CAP²) pairs regardless of corpus
    size (a fractional sample would still be quadratic at 100 TB),
    selected by deterministic hash order so the sample is unbiased and
    stable across runs/cluster sizes; the top-k itself is a
    TakeOrderedAndProject, no global sort. Verified candidates are a
    subset of truth by construction (same threshold, same Jaccard), so
    recall is verified/truth and the candidate stage's precision is
    verified/candidates."""
    from .dedup import _JACCARD_T, _minhash_candidates, _shingles3, _toks

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    universe = (
        docs.orderBy(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":ev"))),
            "doc_id",
        )
        .limit(EVAL_TRUTH_CAP)
    )

    sh = universe.select("doc_id", _shingles3(_toks()).alias("sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    )
    truth = (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(jac >= _JACCARD_T)
        .select("doc_a", "doc_b")
    )

    sig, cand = _minhash_candidates(universe)
    x = sig.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    y = sig.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    verified = (
        cand.join(x, "doc_a").join(y, "doc_b").filter(jac >= _JACCARD_T)
    ).select("doc_a", "doc_b")

    counts = (
        truth.agg(F.count(F.lit(1)).alias("n_true"))
        .crossJoin(cand.agg(F.count(F.lit(1)).alias("n_cand")))
        .crossJoin(verified.agg(F.count(F.lit(1)).alias("n_cand_true")))
    )
    return counts.select(
        "n_true",
        "n_cand",
        "n_cand_true",
        F.when(
            F.col("n_true") > 0,
            F.expr("1000 * n_cand_true div n_true"),
        ).alias("recall_x1000"),
        F.when(
            F.col("n_cand") > 0,
            F.expr("1000 * n_cand_true div n_cand"),
        ).alias("cand_precision_x1000"),
    )


def _containment_oracle() -> str:
    from .dedup import _LSH_BANDS, _MH_SIG_SQL, _SH3_SQL

    return f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    sh AS (SELECT doc_id, {_SH3_SQL} AS sh FROM tok),
    base AS (
      SELECT doc_id, sh,
             list_transform(sh,
               x -> CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)) AS bh
      FROM sh
    ),
    sig AS (SELECT doc_id, sh, {_MH_SIG_SQL} AS sig FROM base),
    bands AS (
      SELECT doc_id, b, sig[2*b + 1] AS v1, sig[2*b + 2] AS v2
      FROM sig CROSS JOIN (SELECT unnest(range({_LSH_BANDS})) AS b) t
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.b = b.b AND a.v1 = b.v1 AND a.v2 = b.v2
           AND a.doc_id < b.doc_id
    ),
    scored AS (
      SELECT c.doc_a, c.doc_b,
             CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
               / len(x.sh) AS containment_ab,
             CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
               / len(y.sh) AS containment_ba
      FROM cand c
      JOIN sh x ON x.doc_id = c.doc_a
      JOIN sh y ON y.doc_id = c.doc_b
    )
    SELECT doc_a, doc_b, containment_ab, containment_ba
    FROM scored
    WHERE containment_ab >= 0.5 OR containment_ba >= 0.5
    ORDER BY doc_a, doc_b
    """


@query("dedup_containment", oracle=_containment_oracle())
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup scoring: Jaccard CONTAINMENT |A∩B|/|A| in
    both directions over the MinHash+LSH candidate pairs. Containment
    catches what symmetric Jaccard misses — a short document embedded
    inside a longer one (quote, boilerplate, partial copy), the shape
    decontamination actually hunts for: benchmark items are near-fully
    CONTAINED in training docs whose overall Jaccard is small. Same
    bucketed candidate generation as the dedup family (never all-pairs);
    scoring adds two divisions per candidate.

    Signature frame checkpointed once (optimization r14, see
    dedup._minhash_sig_materialized): EXECUTES the signature pass at
    construction."""
    from .dedup import _minhash_cand_from_sig, _minhash_sig_materialized

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    sig = _minhash_sig_materialized(docs)
    cand = _minhash_cand_from_sig(sig)
    x = sig.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    y = sig.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    cab = (inter / F.size("sh_a")).alias("containment_ab")
    cba = (inter / F.size("sh_b")).alias("containment_ba")
    return (
        cand.join(x, "doc_a")
        .join(y, "doc_b")
        .select("doc_a", "doc_b", cab, cba)
        .filter(
            (F.col("containment_ab") >= 0.5)
            | (F.col("containment_ba") >= 0.5)
        )
        .orderBy("doc_a", "doc_b")
    )


# --- LSH band-parameter tuning curve ----------------------------------------

# (bands, rows-per-band) configurations sharing the K=8 signature budget.
_BAND_CONFIGS = [(8, 1), (4, 2), (2, 4), (1, 8)]


def _pow_chain_sql(x: str, n: int) -> str:
    """Left-associated explicit multiply chain — no pow(), whose
    cross-engine bit behavior is unspecified for non-integer results."""
    e = x
    for _ in range(n - 1):
        e = f"({e} * {x})"
    return e


def _band_curve_oracle() -> str:
    from .dedup import _JACCARD_T, _SH3_SQL

    jac = (
        "CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)"
        " / len(list_distinct(a.sh || b.sh))"
    )
    agg_cols = []
    for b, r in _BAND_CONFIGS:
        s_pow_r = _pow_chain_sql("s", r)
        p = f"(1.0 - {_pow_chain_sql(f'(1.0 - {s_pow_r})', b)})"
        agg_cols.append(
            f"CAST(CAST(SUM(CAST(CASE WHEN s >= {_JACCARD_T} THEN {p} "
            f"ELSE 0.0 END AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS et{b}"
        )
        agg_cols.append(
            f"CAST(CAST(SUM(CAST(CASE WHEN s < {_JACCARD_T} THEN {p} "
            f"ELSE 0.0 END AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS ef{b}"
        )
    rows = " UNION ALL ".join(
        f"SELECT CAST({b} AS BIGINT) AS n_bands, "
        f"CAST({r} AS BIGINT) AS rows_per_band, n_true, n_below, "
        f"et{b} AS exp_caught_true, ef{b} AS exp_caught_false, "
        f"et{b} / n_true AS exp_recall FROM agg"
        for b, r in _BAND_CONFIGS
    )
    return f"""
    WITH universe AS (
      {_EV_UNIVERSE_SQL}
    ),
    tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM universe),
    sh AS (SELECT doc_id, {_SH3_SQL} AS sh FROM tok),
    pairs AS (
      SELECT {jac} AS s
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh, b.sh)) > 0
    ),
    agg AS (
      SELECT CAST(SUM(CASE WHEN s >= {_JACCARD_T} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_true,
             CAST(SUM(CASE WHEN s < {_JACCARD_T} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_below,
             {', '.join(agg_cols)}
      FROM pairs
    )
    {rows}
    ORDER BY n_bands DESC
    """


@query("dedup_band_tuning_curve", oracle=_band_curve_oracle())
def dedup_band_tuning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH parameter tuning report: for each (bands, rows) split
    of the K=8 signature budget, the EXPECTED number of ≥0.5-Jaccard
    pairs caught (recall mass) and of <0.5 pairs caught (candidate
    false-positive load), from the S-curve P(catch)=1-(1-s^r)^b applied
    to the measured pair-Jaccard distribution of the capped eval
    universe. This is how the (B, R) knob of dedup_near_minhash_lsh is
    chosen at 100 TB — from a fixed-size measured sample, before
    committing a corpus-scale banding pass.

    Determinism: the S-curve is evaluated as explicit left-associated
    multiply chains (no pow()), so both engines produce bit-identical
    doubles; sums use the DECIMAL(38,10) convention. Scale: the pair
    stage is the same O(CAP²) absolute-capped universe as
    dedup_eval_recall — constant work at any corpus size."""
    from .dedup import _JACCARD_T, _shingles3, _toks

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    universe = docs.orderBy(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":ev"))),
        "doc_id",
    ).limit(EVAL_TRUTH_CAP)
    sh = universe.select("doc_id", _shingles3(_toks()).alias("sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b_ = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    s = inter.cast("double") / F.size(F.array_union("sh_a", "sh_b"))
    pairs = (
        a.crossJoin(b_)
        .filter((F.col("doc_a") < F.col("doc_b")) & (inter > 0))
        .select(s.alias("s"))
    )

    def pw(col, n: int):
        e = col
        for _ in range(n - 1):
            e = e * col
        return e

    aggs = [
        F.sum(F.when(F.col("s") >= _JACCARD_T, 1).otherwise(0))
        .cast("long")
        .alias("n_true"),
        F.sum(F.when(F.col("s") < _JACCARD_T, 1).otherwise(0))
        .cast("long")
        .alias("n_below"),
    ]
    for b, r in _BAND_CONFIGS:
        p = F.lit(1.0) - pw(F.lit(1.0) - pw(F.col("s"), r), b)
        aggs.append(
            F.sum(
                F.when(F.col("s") >= _JACCARD_T, p)
                .otherwise(F.lit(0.0))
                .cast("decimal(38,10)")
            )
            .cast("double")
            .alias(f"et{b}")
        )
        aggs.append(
            F.sum(
                F.when(F.col("s") < _JACCARD_T, p)
                .otherwise(F.lit(0.0))
                .cast("decimal(38,10)")
            )
            .cast("double")
            .alias(f"ef{b}")
        )
    agg = pairs.agg(*aggs)
    stack = ", ".join(
        f"CAST({b} AS BIGINT), CAST({r} AS BIGINT), et{b}, ef{b}"
        for b, r in _BAND_CONFIGS
    )
    return (
        agg.select(
            F.expr(
                f"stack({len(_BAND_CONFIGS)}, {stack}) AS "
                "(n_bands, rows_per_band, exp_caught_true, exp_caught_false)"
            ),
            "n_true",
            "n_below",
        )
        .select(
            "n_bands",
            "rows_per_band",
            "n_true",
            "n_below",
            "exp_caught_true",
            "exp_caught_false",
            (F.col("exp_caught_true") / F.col("n_true")).alias("exp_recall"),
        )
        .orderBy(F.desc("n_bands"))
    )
