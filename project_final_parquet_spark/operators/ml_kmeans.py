"""Iterative distributed k-means (Lloyd's algorithm) over embeddings —
the engine's iterative-algorithm pattern (not in the reference; SURVEY.md
§2.2 has no iterative/ML surface at all).

Determinism discipline (what makes an EXACT DuckDB oracle possible for an
iterative float algorithm):
- init: centroids = embeddings of vec_id 0..k-1 (fixed, no RNG);
- assignment: squared-L2 distance summed as floor-scaled integers →
  argmin is integer comparison, ties break on cluster id;
- update: per-dimension mean via floor-scaled integer sums (exact,
  order-independent) — the same convention as sim_centroids;
- fixed iteration count (the cross-engine-comparable form of a
  convergence loop).

Scale (100 TB): the iteration state is k×64 doubles and lives on the
DRIVER (the MLlib pattern): each round ships the centroids inside an
Arrow-vectorized assignment UDF (numpy argmin per batch — see
``_assign_udf`` for why built-in HOFs lose here), then ONE aggregation
collects k×dim rows of (count, scaled-integer sum) back to the driver —
no crossJoin, no per-vector window shuffle, no localCheckpoint blocks.
Per round the cluster shuffles k×dim longs per task (map-side partial
aggs) and the driver holds k×64 doubles; data rows never shuffle at
all. The returned assignment frame is a fully LAZY projection over the
source — the only eager work at construction is the (iters-1) tiny
stats collects. (The round-5 form — crossJoin + row_number window +
localCheckpoint per round — measured 6.1 s at sf0.1 isolated and
151.7 s under suite memory pressure, BENCH_r05; this form is one
map-side pass per round.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

_K = 4
_ITERS = 3
_DIM = 64
_CSCALE = 1_000_000_000  # centroid mean scaling (exact integer sums)
_DSCALE = 1_000_000_000_000  # distance scaling ((v-c)^2 ~ 1e-4)


# --- DuckDB oracle generation ----------------------------------------------


def _sql_dist(vec: str, cent: str) -> str:
    """Σ_d floor((v_d - c_d)² · S) as BIGINT — deterministic distance."""
    return f"""list_aggregate(list_transform(range({_DIM}),
      d -> CAST(floor((CAST({vec}[d+1] AS DOUBLE) - {cent}[d+1])
                      * (CAST({vec}[d+1] AS DOUBLE) - {cent}[d+1])
                      * {_DSCALE}.0) AS BIGINT)), 'sum')"""


def _kmeans_cte_prefix() -> tuple[str, str]:
    """The shared iterative CTE chain (cent0 → assign{N-1}) and the name
    of the final assignment CTE — reused by the purity eval oracle."""
    parts = [
        f"""
    WITH cent0 AS (
      SELECT vec_id AS cid,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c
      FROM embeddings WHERE vec_id < {_K}
    )"""
    ]
    prev = "cent0"
    for i in range(_ITERS):
        parts.append(
            f""",
    assign{i} AS (
      SELECT vec_id, embedding, cid FROM (
        SELECT e.vec_id, e.embedding, c0.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_sql_dist('e.embedding', 'c0.c')}, c0.cid
               ) AS rn
        FROM embeddings e CROSS JOIN {prev} c0
      ) ranked WHERE rn = 1
    ),
    cent{i + 1} AS (
      SELECT cid, list(cd ORDER BY d) AS c FROM (
        SELECT cid, d,
               (CAST(SUM(CAST(floor(CAST(embedding[d+1] AS DOUBLE)
                    * {_CSCALE}.0) AS BIGINT)) AS DOUBLE) / {_CSCALE}.0)
                 / COUNT(*) AS cd
        FROM assign{i} CROSS JOIN (SELECT unnest(range({_DIM})) AS d) dims
        GROUP BY cid, d
      ) t GROUP BY cid
    )"""
        )
        prev = f"cent{i + 1}"
    return "".join(parts), f"assign{_ITERS - 1}"


def _kmeans_oracle() -> str:
    prefix, last = _kmeans_cte_prefix()
    return (
        prefix
        + f"""
    SELECT a.cid AS cluster_id, COUNT(*) AS n_points,
           CAST(MIN(a.vec_id) AS BIGINT) AS min_vec_id
    FROM {last} a
    GROUP BY a.cid
    ORDER BY a.cid
    """
    )


# --- Spark implementation --------------------------------------------------


def _assign_udf(cents: list[tuple[int, list[float]]]):
    """argmin by (dist, cid) over driver-held centroids, as an
    Arrow-vectorized pandas UDF.

    Why a UDF here and not built-ins: the distance is a 64-term fold, so
    the builtin forms are (a) zip_with+aggregate HOFs — interpreted, no
    codegen, measured ~70 µs/row, and 64× worse when a downstream
    posexplode collapses the projection into the Generate — or (b) an
    unrolled 128-deep expression tree, measured 3× slower still (defeats
    codegen; see SCALE.md "HOF fold"). NumPy does the same IEEE ops
    SIMD-vectorized per Arrow batch, and ArrowEvalPython is a projection
    barrier, so the assignment evaluates exactly once per row.

    Bit-exactness vs the oracle: float32→float64 is exact; (v-c)·(v-c)
    ·S elementwise and floor are the identical IEEE-754 ops; the per-dim
    summands are int64 (exact, order-free); np.argmin takes the FIRST
    minimum, and centroid columns are sorted by cid — exactly the
    oracle's ROW_NUMBER ORDER BY dist, cid."""
    from pyspark.sql.functions import pandas_udf

    ids = np.array([int(cid) for cid, _ in cents], dtype=np.int64)
    cmat = np.array([c for _, c in cents], dtype=np.float64)  # (k, dim)
    dscale = float(_DSCALE)

    @pandas_udf("long")
    def assign(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype="int64")
        vmat = np.stack(emb.to_numpy()).astype(np.float64)  # (n, dim)
        dists = np.empty((vmat.shape[0], cmat.shape[0]), dtype=np.int64)
        for j in range(cmat.shape[0]):
            d = vmat - cmat[j]
            dists[:, j] = (
                np.floor(d * d * dscale).astype(np.int64).sum(axis=1)
            )
        return pd.Series(ids[np.argmin(dists, axis=1)])

    return assign


def _collect_init(emb: DataFrame) -> list[tuple[int, list[float]]]:
    """c0 = embeddings of vec_id 0..k-1, as driver-side doubles."""
    rows = (
        emb.filter(F.col("vec_id") < _K)
        .select(
            F.col("vec_id").alias("cid"),
            F.transform("embedding", lambda x: x.cast("double")).alias("c"),
        )
        .collect()
    )
    return sorted((int(r["cid"]), list(r["c"])) for r in rows)


def _stats_stage(cents: list[tuple[int, list[float]]]):
    """mapInPandas partial-stats stage (the treeAggregate shape): per
    Arrow batch, assign every vector (same numpy argmin as _assign_udf)
    and emit per-cluster partials — k×dim long rows of (cid, d,
    floor-scaled sum, count). Doing assignment AND the scaled sums in
    ONE Python stage avoids the UDF-above-Generate trap (Catalyst
    extracts a scalar pandas UDF ABOVE a posexplode in the same select,
    re-serializing 64× the rows through Arrow — measured 3.7 s vs
    0.9 s at sf1). Nested for by-value pickling."""
    import numpy as _np
    import pandas as _pd

    ids = _np.array([int(cid) for cid, _ in cents], dtype=_np.int64)
    cmat = _np.array([c for _, c in cents], dtype=_np.float64)
    dscale, cscale = float(_DSCALE), float(_CSCALE)

    def stage(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vmat = _np.stack(pdf["embedding"].to_numpy()).astype(_np.float64)
            dists = _np.empty((vmat.shape[0], cmat.shape[0]), dtype=_np.int64)
            for j in range(cmat.shape[0]):
                d = vmat - cmat[j]
                dists[:, j] = (
                    _np.floor(d * d * dscale).astype(_np.int64).sum(axis=1)
                )
            assign = _np.argmin(dists, axis=1)
            sv = _np.floor(vmat * cscale).astype(_np.int64)  # (n, dim)
            out = {"cid": [], "d": [], "sv": [], "n": []}
            for j in range(cmat.shape[0]):
                mask = assign == j
                n = int(mask.sum())
                if n == 0:
                    continue
                sums = sv[mask].sum(axis=0)  # exact int64 per dim
                out["cid"].extend([int(ids[j])] * sums.size)
                out["d"].extend(range(sums.size))
                out["sv"].extend(int(x) for x in sums)
                out["n"].extend([n] * sums.size)
            yield _pd.DataFrame(out)

    return stage


def _collect_stats(
    emb: DataFrame, cents: list[tuple[int, list[float]]]
) -> list[tuple[int, int, tuple[int, ...]]]:
    """One aggregation pass: per (cluster, dim), the floor-scaled integer
    sum and the cluster row count — k×dim tiny rows back to the driver.
    The mapInPandas stage emits per-batch partials, so the shuffle moves
    k×dim longs per batch regardless of row count."""
    partials = emb.select("embedding").mapInPandas(
        _stats_stage(cents), schema="cid long, d int, sv long, n long"
    )
    rows = (
        partials.groupBy("cid", "d")
        # DECIMAL(38,0): Spark's integral SUM overflows int64 silently;
        # with CSCALE=1e9 and |v|~0.1 the long headroom is ~1e11 rows
        # per (cid, dim) — under the 100 TB design point (ADVICE r6)
        .agg(
            F.sum(F.col("sv").cast("decimal(38,0)")).alias("sv"),
            F.sum("n").alias("n"),
        )
        .collect()
    )
    by_cid: dict[int, dict[int, tuple[int, int]]] = {}
    for r in rows:
        by_cid.setdefault(int(r["cid"]), {})[int(r["d"])] = (
            int(r["sv"]),
            int(r["n"]),
        )
    return sorted(
        (
            cid,
            dims[0][1],
            tuple(dims[d][0] for d in range(_DIM)),
        )
        for cid, dims in by_cid.items()
    )


def _means(
    stats: list[tuple[int, int, tuple[int, ...]]],
) -> list[tuple[int, list[float]]]:
    """Centroid means from integer stats, with the engines' exact cast
    order: sum → double FIRST (float(s) is round-to-nearest, the same as
    Spark's ``.cast("double")`` and DuckDB's ``CAST(... AS DOUBLE)``),
    then two IEEE double divisions."""
    return [
        (cid, [(float(s) / float(_CSCALE)) / float(n) for s in sums])
        for cid, n, sums in stats
    ]


def _lloyd(
    emb: DataFrame, iters: int, *, converge: bool = False
) -> tuple[DataFrame, int]:
    """Run Lloyd iterations; returns (assignment frame, rounds executed).

    ``converge=False``: exactly ``iters`` assignment rounds (the oracle
    form) — centroids are updated ``iters - 1`` times and the returned
    frame assigns under the last update, exactly the CTE chain.
    ``converge=True``: stop as soon as a round's cluster stats repeat
    the previous round's (then the next centroid update is a no-op —
    Lloyd's fixed point — and every later round is identical), bounded
    by ``iters``. The probe is a driver-side tuple compare of the stats
    the update pass already collected: free.

    The returned assignment frame is fully LAZY (a projection with the
    final centroids as literals); the construction-time work is the
    (rounds - 1) k-row stats collects. See the module docstring for the
    scale story."""
    cents = _collect_init(emb)
    rounds = 0
    prev_stats: list | None = None
    for i in range(iters):
        rounds += 1
        if i == iters - 1:
            break  # final round: assignment only, no update executes
        stats = _collect_stats(emb, cents)
        if converge and stats == prev_stats:
            # assignment under ``cents`` equals the previous round's;
            # centroids (and all later rounds) have stopped moving
            break
        prev_stats = stats
        cents = _means(stats)
    assigned = emb.select(
        emb["*"], _assign_udf(cents)(F.col("embedding")).alias("cid")
    )
    return assigned, rounds


def _cluster_sizes(assigned: DataFrame) -> DataFrame:
    return (
        assigned.groupBy(F.col("cid").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("vec_id").alias("min_vec_id"),
        )
        .orderBy("cluster_id")
    )


@query("ml_kmeans", oracle=_kmeans_oracle())
def ml_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means(k=4, 3 Lloyd iterations) cluster sizes over embeddings."""
    emb = load(spark, sf_dir, "embeddings")
    assigned, _ = _lloyd(emb, _ITERS)
    return _cluster_sizes(assigned)


def ml_kmeans_converged(
    spark: SparkSession, sf_dir: str, max_iters: int = 25
) -> tuple[DataFrame, int]:
    """Production k-means: Lloyd with assignment-stability early stop
    (bounded by ``max_iters``). Returns (cluster sizes, rounds run); a
    round whose assignment matches the previous one is the fixed point,
    so the result equals any longer fixed-iteration run from the same
    init."""
    emb = load(spark, sf_dir, "embeddings")
    assigned, rounds = _lloyd(emb, max_iters, converge=True)
    return _cluster_sizes(assigned), rounds


def _purity_oracle() -> str:
    prefix, last = _kmeans_cte_prefix()
    return (
        prefix
        + f""",
    lab AS (
      SELECT a.cid, e2.label, COUNT(*) AS c
      FROM {last} a JOIN embeddings e2 ON a.vec_id = e2.vec_id
      GROUP BY a.cid, e2.label
    ),
    best AS (
      SELECT cid, label, c,
             ROW_NUMBER() OVER (
               PARTITION BY cid ORDER BY c DESC, label) AS rn,
             SUM(c) OVER (PARTITION BY cid) AS n
      FROM lab
    )
    SELECT cid AS cluster_id,
           CAST(n AS BIGINT) AS n_points,
           CAST(label AS INT) AS majority_label,
           CAST(c AS BIGINT) AS majority_count,
           CAST((1000 * c) // n AS BIGINT) AS purity_x1000
    FROM best WHERE rn = 1
    ORDER BY cluster_id
    """
    )


@query("ml_cluster_purity", oracle=_purity_oracle())
def ml_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-quality evaluation: per k-means cluster, the majority
    ground-truth label and purity (majority share, ×1000 integer) — the
    standard external validation metric, making cluster quality a
    MEASURED number like dedup_eval_recall does for LSH recall. Runs
    the same 3 Lloyd iterations (exact iterative oracle), then one
    (cid, label) count and a cluster-sized window. Executes iterations
    at construction (registry contract note)."""
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings")
    assigned, _ = _lloyd(emb, _ITERS)
    # the lazy assignment projection carries every emb column, so the
    # label is already on the row — no join back to the source
    lab = (
        assigned.groupBy("cid", "label")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("cid")
    best = lab.select(
        "cid",
        "label",
        "c",
        F.row_number()
        .over(w.orderBy(F.desc("c"), "label"))
        .alias("rn"),
        F.sum("c").over(w).alias("n"),
    )
    return (
        best.filter(F.col("rn") == 1)
        .select(
            F.col("cid").alias("cluster_id"),
            F.col("n").alias("n_points"),
            F.col("label").cast("int").alias("majority_label"),
            F.col("c").alias("majority_count"),
            F.expr("1000 * c div n").alias("purity_x1000"),
        )
        .orderBy("cluster_id")
    )
