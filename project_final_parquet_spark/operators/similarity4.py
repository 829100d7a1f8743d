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

    Scale: training adds one (code, dim) partial-agg shuffle per
    subspace — M×K×16 output rows total, independent of corpus size —
    and the trained codebook broadcasts back like the static one;
    encode/ADC stay map-side + TakeOrdered. More Lloyd rounds repeat
    the same constant-size shuffle."""
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

    def _sq_sub_vs16(full_col, sub_col, t: int):
        # like _sq_sub, but the codeword side is ALREADY a 16-dim
        # subvector (trained codebooks store subvectors, not full 64s)
        sa = F.slice(full_col, t * _SUB + 1, _SUB)
        return F.aggregate(
            F.zip_with(
                sa,
                sub_col,
                lambda x, y: (x.cast("double") - y)
                * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    def _argmin_init(t: int, name: str):
        # closure factory (transform's 2-arg lambda would get the index)
        dists = F.transform(
            F.col("cbs"), lambda cw: _sq_sub(F.col("embedding"), cw, t)
        )
        return (
            (F.array_position(dists, F.array_min(dists)) - 1)
            .cast("int")
            .alias(name)
        )

    def _argmin_trained(t: int, name: str):
        dists = F.transform(
            F.col(f"tcb{t}"),
            lambda cw: _sq_sub_vs16(F.col("embedding"), cw, t),
        )
        return (
            (F.array_position(dists, F.array_min(dists)) - 1)
            .cast("int")
            .alias(name)
        )

    assign0 = enc.select(
        "vec_id",
        "label",
        "embedding",
        "cbs",
        "qv",
        *[_argmin_init(t, f"a{t}") for t in range(_M)],
    ).localCheckpoint()  # training reads it M times; encode once more

    # per-subspace trained codebooks (each a 1-row [K][16] DOUBLE array)
    books = []
    for t in range(_M):
        off = t * _SUB
        sub = assign0.select(
            F.col(f"a{t}").alias("code"),
            F.posexplode(F.slice("embedding", off + 1, _SUB)).alias(
                "d", "val"
            ),
        )
        means = sub.groupBy("code", "d").agg(
            (
                (
                    F.sum(
                        F.floor(F.col("val").cast("double") * _TSCALE).cast(
                            "long"
                        )
                    ).cast("double")
                    / _TSCALE
                )
                / F.count(F.lit(1))
            ).alias("cd")
        )
        trained = means.groupBy("code").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "cd"))),
                lambda s: s["cd"],
            ).alias("cw")
        )
        init_sub = cb.select(
            F.posexplode("cbs").alias("k", "vec")
        ).select(
            "k",
            F.transform(
                F.slice("vec", off + 1, _SUB), lambda x: x.cast("double")
            ).alias("init_cw"),
        )
        full = init_sub.join(trained, init_sub["k"] == trained["code"], "left")
        book = full.select(
            "k", F.coalesce("cw", "init_cw").alias("cw")
        ).agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("k", "cw"))),
                lambda s: s["cw"],
            ).alias(f"tcb{t}")
        )
        books.append(book)

    scored = assign0.select("vec_id", "label", "embedding", "qv")
    for book in books:
        scored = scored.crossJoin(F.broadcast(book))

    codes = scored.select(
        "vec_id",
        "label",
        "qv",
        *[F.col(f"tcb{t}") for t in range(_M)],
        *[_argmin_trained(t, f"c{t}") for t in range(_M)],
    )

    adc = None
    for t in range(_M):
        term = _sq_sub_vs16(
            F.col("qv"),
            F.element_at(F.col(f"tcb{t}"), F.col(f"c{t}") + 1),
            t,
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
