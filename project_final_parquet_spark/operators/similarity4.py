"""Product quantization (PQ) with asymmetric distance computation.

The scale path for billion-vector ANN (Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011): split the
64-dim vector into M=4 subvectors of 16 dims, quantize each subvector
to one of K=8 codewords, and rank candidates by ADC — the sum of
query-to-codeword distances, looked up instead of recomputed. A stored
code is M small ints (4 bytes here vs 256 bytes of float32), a 64×
compression of the scan footprint.

Determinism: the codebook is a seeded sample — the K=8 vectors with the
smallest md5(vec_id), totally ordered by (hash, vec_id) — rather than a
trained one, so the DuckDB oracle reproduces it exactly. Production
training is per-subspace k-means, which this repo already provides
(``ml_kmeans``, same broadcast-assign/shuffle-update shape); the sample
stands in for the trained codebook without changing the encode/ADC
dataflow.

Scale (100 TB of vectors):
- codebook: a global TakeOrdered(8) — tiny, then broadcast; no shuffle
  touches the big table.
- encode: map-side per row (M×K subvector distances, ~512 mults); at
  rest you'd persist only (vec_id, code) — the 64× smaller scan set.
- ADC query: map-side lookup + TakeOrderedAndProject top-k merge; no
  shuffle of vector data at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

_DIM = 64
_M = 4  # subspaces
_SUB = _DIM // _M  # dims per subspace
_K = 8  # codewords per subspace


def _sq_sub(a, b, t: int):
    """Squared L2 between 16-dim subvectors t of full vectors a, b."""
    sa = F.slice(a, t * _SUB + 1, _SUB)
    sb = F.slice(b, t * _SUB + 1, _SUB)
    return F.aggregate(
        F.zip_with(
            sa,
            sb,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _sq_sub_sql(a: str, b: str, t: int) -> str:
    off = t * _SUB
    d = f"(CAST({a}[{off}+j+1] AS DOUBLE) - CAST({b}[{off}+j+1] AS DOUBLE))"
    return (
        f"list_aggregate(list_transform(range({_SUB}), "
        f"j -> {d} * {d}), 'sum')"
    )


_PQ_ORACLE = f"""
WITH cbrows AS (
  SELECT md5(CAST(vec_id AS VARCHAR)) AS h, vec_id, embedding
  FROM embeddings ORDER BY h, vec_id LIMIT {_K}
),
cb AS (SELECT list(embedding ORDER BY h, vec_id) AS cbs FROM cbrows),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
enc AS (
  SELECT e.vec_id, e.label, e.embedding, cb.cbs, q.qv
  FROM embeddings e CROSS JOIN cb CROSS JOIN q
  WHERE e.vec_id <> 0
),
coded AS (
  SELECT vec_id, label, cbs, qv,
    {", ".join(
        f"list_transform(cbs, cw -> {_sq_sub_sql('embedding', 'cw', t)})"
        f" AS dt{t}"
        for t in range(_M)
    )}
  FROM enc
),
codes AS (
  SELECT vec_id, label, cbs, qv,
    {", ".join(
        f"CAST(list_position(dt{t}, list_aggregate(dt{t}, 'min')) - 1"
        f" AS INTEGER) AS c{t}"
        for t in range(_M)
    )}
  FROM coded
)
SELECT vec_id, label,
  concat_ws('-', {", ".join(f"c{t}" for t in range(_M))}) AS pq_code,
  {" + ".join(_sq_sub_sql("qv", f"cbs[c{t}+1]", t) for t in range(_M))}
    AS adc
FROM codes
ORDER BY adc, vec_id
LIMIT 10
"""


@query("sim_pq_adc", oracle=_PQ_ORACLE)
def sim_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encode (M=4 subspaces × K=8 codewords, seeded-sample
    codebook) + ADC top-10 against the vec_id=0 query. Encoding is
    argmin over per-subspace squared L2 (first-index tie-break via
    array_position of the min — both engines take the first hit); ADC
    sums the 4 query-to-assigned-codeword distances in a fixed textual
    order so the doubles match the oracle bit-for-bit."""
    emb = load(spark, sf_dir, "embeddings")

    cbrows = (
        emb.withColumn("h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("h", "vec_id")
        .limit(_K)
    )
    cb = cbrows.agg(
        F.array_sort(
            F.collect_list(F.struct("h", "vec_id", "embedding"))
        ).alias("s")
    ).select(F.transform("s", lambda r: r["embedding"]).alias("cbs"))
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )

    enc = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(cb))
        .crossJoin(F.broadcast(q))
    )

    def _code_col(t: int):
        # closure factory: a 2-arg lambda would receive the array INDEX
        # as its second argument (transform's (element, index) form)
        dists = F.transform(
            F.col("cbs"), lambda cw: _sq_sub(F.col("embedding"), cw, t)
        )
        return (
            (F.array_position(dists, F.array_min(dists)) - 1)
            .cast("int")
            .alias(f"c{t}")
        )

    codes = enc.select(
        "vec_id", "label", "cbs", "qv", *[_code_col(t) for t in range(_M)]
    )

    adc = None
    for t in range(_M):
        term = _sq_sub(
            F.col("qv"), F.element_at(F.col("cbs"), F.col(f"c{t}") + 1), t
        )
        adc = term if adc is None else adc + term

    return (
        codes.select(
            "vec_id",
            "label",
            F.concat_ws(
                "-", *[F.col(f"c{t}").cast("string") for t in range(_M)]
            ).alias("pq_code"),
            adc.alias("adc"),
        )
        .orderBy("adc", "vec_id")
        .limit(10)
    )


# --- trained-codebook PQ ----------------------------------------------------

_TSCALE = 1_000_000_000  # codeword-mean fixed-point quantum (ml_kmeans conv.)


def _trained_oracle() -> str:
    """One per-subspace k-means round on top of the seeded init, then
    encode + ADC with the TRAINED codebook (init codeword kept for any
    empty cell)."""
    parts = [f"""
WITH cbrows AS (
  SELECT md5(CAST(vec_id AS VARCHAR)) AS h, vec_id, embedding
  FROM embeddings ORDER BY h, vec_id LIMIT {_K}
),
cb AS (SELECT list(embedding ORDER BY h, vec_id) AS cbs FROM cbrows),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
enc AS (
  SELECT e.vec_id, e.label, e.embedding, cb.cbs, q.qv
  FROM embeddings e CROSS JOIN cb CROSS JOIN q
  WHERE e.vec_id <> 0
),
assign0 AS (
  SELECT vec_id, label, embedding, cbs, qv,
    {", ".join(
        f"CAST(list_position(list_transform(cbs, "
        f"cw -> {_sq_sub_sql('embedding', 'cw', t)}), "
        f"list_aggregate(list_transform(cbs, "
        f"cw -> {_sq_sub_sql('embedding', 'cw', t)}), 'min')) - 1 "
        f"AS INTEGER) AS a{t}"
        for t in range(_M)
    )}
  FROM enc
)"""]
    for t in range(_M):
        off = t * _SUB
        parts.append(f""",
mean{t} AS (
  SELECT a{t} AS code, d,
         (CAST(SUM(CAST(floor(CAST(embedding[{off} + d + 1] AS DOUBLE)
              * {_TSCALE}.0) AS BIGINT)) AS DOUBLE) / {_TSCALE}.0)
           / COUNT(*) AS cd
  FROM assign0 CROSS JOIN (SELECT unnest(range({_SUB})) AS d) dims
  GROUP BY a{t}, d
),
tr{t} AS (
  SELECT code, list(cd ORDER BY d) AS cw FROM mean{t} GROUP BY code
),
book{t} AS (
  SELECT list(COALESCE(tr{t}.cw,
           list_transform(range({_SUB}),
             j -> CAST(cb.cbs[k.k + 1][{off} + j + 1] AS DOUBLE)))
         ORDER BY k.k) AS tcb
  FROM (SELECT unnest(range({_K})) AS k) k
  LEFT JOIN tr{t} ON tr{t}.code = k.k
  CROSS JOIN cb
)""")
    subsq = []
    for t in range(_M):
        off = t * _SUB
        d = (
            f"(CAST(embedding[{off}+j+1] AS DOUBLE) - tcb{t}[j+1])"
        )
        subsq.append(
            f"list_transform(book{t}.tcb, tcb{t} -> "
            f"list_aggregate(list_transform(range({_SUB}), "
            f"j -> {d} * {d}), 'sum'))"
        )
    qsq = []
    for t in range(_M):
        off = t * _SUB
        d = f"(CAST(qv[{off}+j+1] AS DOUBLE) - tcb{t}_keep[c{t}+1][j+1])"
        qsq.append(
            f"list_aggregate(list_transform(range({_SUB}), "
            f"j -> {d} * {d}), 'sum')"
        )
    parts.append(f""",
coded AS (
  SELECT vec_id, label, qv,
    {", ".join(f"book{t}.tcb AS tcb{t}_keep" for t in range(_M))},
    {", ".join(
        f"CAST(list_position({subsq[t]}, "
        f"list_aggregate({subsq[t]}, 'min')) - 1 AS INTEGER) AS c{t}"
        for t in range(_M)
    )}
  FROM assign0 {" ".join(f"CROSS JOIN book{t}" for t in range(_M))}
)
SELECT vec_id, label,
  concat_ws('-', {", ".join(f"c{t}" for t in range(_M))}) AS pq_code,
  {" + ".join(qsq)} AS adc
FROM coded
ORDER BY adc, vec_id
LIMIT 10""")
    return "".join(parts)


def _collect_pq_init(emb: DataFrame) -> list[list[float]]:
    """Seeded init codebook, driver-side: the K=8 vectors with the
    smallest md5(vec_id), ordered by (hash, vec_id) — K×64 doubles.
    float32→float64 is exact, so these equal the oracle's
    CAST(... AS DOUBLE) of the same rows."""
    rows = (
        emb.withColumn("h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("h", "vec_id")
        .limit(_K)
        .select("h", "vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: (r["h"], r["vec_id"]))
    return [[float(x) for x in r["embedding"]] for r in rows]


def _make_seqfold(sub: int):
    """Sequential left-fold of (v_j − c_j)² over ``sub`` dims starting
    at ``off``, vectorized across rows. The loop order makes every
    per-row add happen in index order from a 0.0 seed — bitwise the
    engines' list_aggregate / F.aggregate fold, which numpy's pairwise
    ``.sum(axis=1)`` would NOT reproduce.

    FACTORY (r13 fix): the fold is built NESTED so the worker stages
    that call it pickle it BY VALUE — a module-level function would be
    pickled by reference to this package, which does not exist on the
    driver's Python workers (the round-4 vanilla-session lesson; found
    again here by the r13 gate-window vanilla drive)."""
    import numpy as _np

    def seqfold(vmat, off: int, cw):
        acc = _np.zeros(vmat.shape[0], dtype=_np.float64)
        for j in range(sub):
            d = vmat[:, off + j] - cw[j]
            acc = acc + d * d
        return acc

    return seqfold


def _pq_stats_stage(init_books: list[list[list[float]]]):
    """mapInPandas training stage (the ml_kmeans treeAggregate shape):
    per Arrow batch, assign every vector's M subvectors to their nearest
    INIT codeword (same sequential-fold distances + first-min argmin as
    the oracle's list_position-of-min) and emit per-(subspace, code,
    dim) partials — at most M×K×16 = 512 long rows per batch regardless
    of batch size. Nested for by-value pickling."""
    import numpy as _np
    import pandas as _pd

    books = [_np.array(b, dtype=_np.float64) for b in init_books]
    tscale = float(_TSCALE)
    seqfold = _make_seqfold(_SUB)  # nested => pickled by value

    def stage(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vmat = _np.stack(pdf["embedding"].to_numpy()).astype(
                _np.float64
            )
            out = {"t": [], "code": [], "d": [], "sv": [], "n": []}
            for t in range(_M):
                off = t * _SUB
                dists = _np.empty((vmat.shape[0], _K), dtype=_np.float64)
                for k in range(_K):
                    dists[:, k] = seqfold(vmat, off, books[t][k])
                assign = _np.argmin(dists, axis=1)  # first min == oracle
                sv = _np.floor(
                    vmat[:, off : off + _SUB] * tscale
                ).astype(_np.int64)
                for k in range(_K):
                    mask = assign == k
                    n = int(mask.sum())
                    if n == 0:
                        continue
                    sums = sv[mask].sum(axis=0)  # exact int64 per dim
                    out["t"].extend([t] * sums.size)
                    out["code"].extend([k] * sums.size)
                    out["d"].extend(range(sums.size))
                    out["sv"].extend(int(x) for x in sums)
                    out["n"].extend([n] * sums.size)
            yield _pd.DataFrame(out)

    return stage


def _train_books(
    emb_train: DataFrame, init: list[list[float]]
) -> list[list[list[float]]]:
    """One Lloyd update per subspace, driver-side: ONE mapInPandas pass
    emits (subspace, code, dim) integer partials, one tiny aggregation
    ships M×K×16 rows to the driver, and the trained codeword means use
    the engines' exact cast order ((double(sum) / S) / n). Empty cells
    keep their init codeword. The partial sums aggregate in
    DECIMAL(38,0) — Spark's integral SUM overflows int64 silently, and
    at 100 TB the per-(code,dim) scaled sums clear the int64 ceiling."""
    init_books = [
        [init[k][t * _SUB : (t + 1) * _SUB] for k in range(_K)]
        for t in range(_M)
    ]
    partials = emb_train.select("embedding").mapInPandas(
        _pq_stats_stage(init_books),
        schema="t int, code int, d int, sv long, n long",
    )
    rows = (
        partials.groupBy("t", "code", "d")
        .agg(
            F.sum(F.col("sv").cast("decimal(38,0)")).alias("sv"),
            F.sum("n").alias("n"),
        )
        .collect()
    )
    merged: dict[tuple[int, int], dict[int, tuple[int, int]]] = {}
    for r in rows:
        merged.setdefault((int(r["t"]), int(r["code"])), {})[int(r["d"])] = (
            int(r["sv"]),
            int(r["n"]),
        )
    books = []
    for t in range(_M):
        book = []
        for k in range(_K):
            cell = merged.get((t, k))
            if cell is None:
                book.append(list(init_books[t][k]))  # empty cell: init
            else:
                book.append(
                    [
                        (float(cell[d][0]) / float(_TSCALE))
                        / float(cell[d][1])
                        for d in range(_SUB)
                    ]
                )
        books.append(book)
    return books


def _pq_encode_stage(tbooks: list[list[list[float]]], qv: list[float]):
    """mapInPandas encode + ADC stage: argmin over the trained books per
    subspace (sequential-fold distances, first-min ties), then ADC via a
    driver-precomputed M×K lookup table — the actual PQ serving trick
    (Jégou §III.C): the query-to-codeword distances are computed once,
    scan rows only LOOK UP. The LUT entries use the same pure-Python
    sequential fold and the ADC adds in fixed t order, so the doubles
    match the oracle's textual sum bit-for-bit."""
    import numpy as _np
    import pandas as _pd

    books = [_np.array(b, dtype=_np.float64) for b in tbooks]
    seqfold = _make_seqfold(_SUB)  # nested => pickled by value
    luts = []
    for t in range(_M):
        off = t * _SUB
        lut = []
        for k in range(_K):
            acc = 0.0
            for j in range(_SUB):
                d = qv[off + j] - tbooks[t][k][j]
                acc = acc + d * d
            lut.append(acc)
        luts.append(_np.array(lut, dtype=_np.float64))

    def stage(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vmat = _np.stack(pdf["embedding"].to_numpy()).astype(
                _np.float64
            )
            codes = []
            for t in range(_M):
                off = t * _SUB
                dists = _np.empty((vmat.shape[0], _K), dtype=_np.float64)
                for k in range(_K):
                    dists[:, k] = seqfold(vmat, off, books[t][k])
                codes.append(_np.argmin(dists, axis=1))
            adc = luts[0][codes[0]]
            for t in range(1, _M):  # left-assoc, the oracle's text order
                adc = adc + luts[t][codes[t]]
            pq_code = [
                "-".join(str(int(codes[t][i])) for t in range(_M))
                for i in range(vmat.shape[0])
            ]
            yield _pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "label": pdf["label"].to_numpy(),
                    "pq_code": pq_code,
                    "adc": adc,
                }
            )

    return stage


@query("sim_pq_trained", oracle=_trained_oracle())
def sim_pq_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ with a TRAINED codebook: one per-subspace k-means update
    round (assign to the seeded init codewords, recompute each codeword
    as the per-dimension mean of its assigned subvectors — empty cells
    keep their init codeword), then encode + ADC top-10 exactly as
    sim_pq_adc. This is real Jégou-style PQ training, cross-engine
    exact via the scaled-integer mean convention (ml_kmeans'), compared
    bit-for-bit against a DuckDB replica of the whole train+encode
    chain.

    Scale (the ml_kmeans shape — round-7 rework of the round-4
    crossJoin/localCheckpoint training loop, which paid M subspace
    aggregation jobs and re-broadcast per book; measured 85.7 s under
    suite memory pressure vs ~8 s isolated): codebook state is M×K×16
    doubles on the DRIVER. Training is ONE mapInPandas pass emitting
    constant-size integer partials (≤512 rows/batch) + one tiny
    aggregation; encode+ADC is one lazy Arrow-vectorized pass with ADC
    as an M×K lookup table — the paper's actual serving layout. No
    crossJoin, no checkpoint blocks, no vector shuffle anywhere; the
    only construction-time work is two tiny collects (init rows, M×K×16
    stats)."""
    emb = load(spark, sf_dir, "embeddings")
    init = _collect_pq_init(emb)
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0)
        .select("embedding")
        .collect()[0]["embedding"]
    ]
    train = emb.filter(F.col("vec_id") != 0)
    tbooks = _train_books(train, init)
    res = train.select("vec_id", "label", "embedding").mapInPandas(
        _pq_encode_stage(tbooks, qv),
        schema="vec_id long, label int, pq_code string, adc double",
    )
    return res.orderBy("adc", "vec_id").limit(10)


# --- IVF-PQ: coarse probe + ADC ranking ------------------------------------

_IVF_SCALE = 1_000_000_000_000  # centroid-distance quantum (similarity.py)
_NPROBE = 2


_IVFPQ_ORACLE = f"""
WITH cent AS (
  SELECT label, j,
         (CAST(SUM(CAST(floor(CAST(embedding[j+1] AS DOUBLE)
               * 1000000000.0) AS BIGINT)) AS DOUBLE) / 1000000000.0)
           / COUNT(*) AS c
  FROM embeddings CROSS JOIN (SELECT unnest(range(64)) AS j) dims
  GROUP BY label, j
),
qd AS (
  SELECT j, CAST(embedding[j+1] AS DOUBLE) AS qv
  FROM embeddings CROSS JOIN (SELECT unnest(range(64)) AS j) dims
  WHERE vec_id = 0
),
dist AS (
  SELECT cent.label,
         SUM(CAST(floor((cent.c - qd.qv) * (cent.c - qd.qv)
             * {_IVF_SCALE}.0) AS BIGINT)) AS d2
  FROM cent JOIN qd ON cent.j = qd.j
  GROUP BY cent.label
),
best AS (SELECT label FROM dist ORDER BY d2, label LIMIT {_NPROBE}),
cbrows AS (
  SELECT md5(CAST(vec_id AS VARCHAR)) AS h, vec_id, embedding
  FROM embeddings ORDER BY h, vec_id LIMIT {_K}
),
cb AS (SELECT list(embedding ORDER BY h, vec_id) AS cbs FROM cbrows),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
enc AS (
  SELECT e.vec_id, e.label, e.embedding, cb.cbs, q.qv
  FROM embeddings e CROSS JOIN cb CROSS JOIN q
  WHERE e.vec_id <> 0 AND e.label IN (SELECT label FROM best)
),
coded AS (
  SELECT vec_id, label, cbs, qv,
    {", ".join(
        f"list_transform(cbs, cw -> {_sq_sub_sql('embedding', 'cw', t)})"
        f" AS dt{t}"
        for t in range(_M)
    )}
  FROM enc
),
codes AS (
  SELECT vec_id, label, cbs, qv,
    {", ".join(
        f"CAST(list_position(dt{t}, list_aggregate(dt{t}, 'min')) - 1"
        f" AS INTEGER) AS c{t}"
        for t in range(_M)
    )}
  FROM coded
)
SELECT vec_id, label,
  {" + ".join(_sq_sub_sql("qv", f"cbs[c{t}+1]", t) for t in range(_M))}
    AS adc
FROM codes
ORDER BY adc, vec_id
LIMIT 10
"""


@query("sim_ivf_pq", oracle=_IVFPQ_ORACLE)
def sim_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the production billion-vector ANN stack (Jégou et al.
    2011 §IV; FAISS's IndexIVFPQ): a coarse inverted-file probe cuts
    the candidate set to nprobe={_NPROBE} cells, then PQ ADC ranks the
    shortlist with table lookups instead of full-dimension math. The
    two stages compose exactly as their standalone queries
    (sim_ivf_multiprobe's scaled-integer centroid distances;
    sim_pq_adc's seeded codebook + fixed-order ADC sums), so the oracle
    is the composition of both proven CTE chains.

    Scale: centroids and codebook broadcast; the corpus is touched once
    map-side for cell membership (at rest the cells ARE the partition
    layout, so probing reads nprobe/k of the data), and ADC touches
    only the probed cells. No shuffle of vector data anywhere —
    the sum of both components' scale stories."""
    emb = load(spark, sf_dir, "embeddings")
    # coarse probe (sim_ivf_multiprobe conventions)
    dims = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("j", "val")
    ).withColumn("val", F.col("val").cast("double"))
    cent = dims.groupBy("label", "j").agg(
        (
            (F.sum(F.floor(F.col("val") * 1e9)).cast("double") / 1e9)
            / F.count(F.lit(1))
        ).alias("c")
    )
    qdims = dims.filter(F.col("vec_id") == 0).select(
        F.col("j").alias("qj"), F.col("val").alias("qv0")
    )
    dist = (
        cent.join(F.broadcast(qdims), cent.j == qdims.qj)
        .groupBy("label")
        .agg(
            F.sum(
                F.floor(
                    (F.col("c") - F.col("qv0"))
                    * (F.col("c") - F.col("qv0"))
                    * _IVF_SCALE
                )
            ).alias("d2")
        )
    )
    best = (
        dist.orderBy("d2", "label")
        .limit(_NPROBE)
        .select(F.col("label").alias("best_label"))
    )
    # PQ encode + ADC on the probed cells (sim_pq_adc conventions)
    cbrows = (
        emb.withColumn("h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("h", "vec_id")
        .limit(_K)
    )
    cb = cbrows.agg(
        F.array_sort(
            F.collect_list(F.struct("h", "vec_id", "embedding"))
        ).alias("s")
    ).select(F.transform("s", lambda r: r["embedding"]).alias("cbs"))
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    enc = (
        emb.filter(F.col("vec_id") != 0)
        .join(F.broadcast(best), emb.label == F.col("best_label"))
        .crossJoin(F.broadcast(cb))
        .crossJoin(F.broadcast(q))
    )

    def _code_col(t: int):
        dists = F.transform(
            F.col("cbs"), lambda cw: _sq_sub(F.col("embedding"), cw, t)
        )
        return (
            (F.array_position(dists, F.array_min(dists)) - 1)
            .cast("int")
            .alias(f"c{t}")
        )

    codes = enc.select(
        "vec_id", "label", "cbs", "qv", *[_code_col(t) for t in range(_M)]
    )
    adc = None
    for t in range(_M):
        term = _sq_sub(
            F.col("qv"), F.element_at(F.col("cbs"), F.col(f"c{t}") + 1), t
        )
        adc = term if adc is None else adc + term
    return (
        codes.select("vec_id", "label", adc.alias("adc"))
        .orderBy("adc", "vec_id")
        .limit(10)
    )
