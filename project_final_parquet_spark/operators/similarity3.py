"""Random-projection dimensionality reduction for similarity search.

Johnson–Lindenstrauss with a deterministic ±1 projection matrix
(md5-derived signs, precomputed literals — the same matrix is inlined
into the DuckDB oracle, so scores match bit-for-bit): project
64-dim float vectors to 16 dims, then rank by exact cosine in the
projected space. At 100 TB the projected table is 4× smaller to scan
and cheap enough to re-rank exactly; projection itself is map-side
(16 array folds per row, no shuffle).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

_DIM = 64
_PDIM = 16


def _sign(t: int, j: int) -> int:
    h = hashlib.md5(f"rp:{t}:{j}".encode()).hexdigest()
    return 1 if h[0] < "8" else -1


# ±1 matrix, _PDIM rows of _DIM signs — importable constants, same
# values baked into the oracle SQL below
_R = [[_sign(t, j) for j in range(_DIM)] for t in range(_PDIM)]


def _proj_component(emb, t: int):
    row = F.array(*[F.lit(float(s)) for s in _R[t]])
    return F.aggregate(
        F.zip_with(emb, row, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _proj_sql(a: str, t: int) -> str:
    lits = ", ".join(str(float(s)) for s in _R[t])
    return (
        f"list_aggregate(list_transform(range({_DIM}), "
        f"j -> CAST({a}[j+1] AS DOUBLE) * ([{lits}])[j+1]), 'sum')"
    )


def _pdot_sql(pa: str, pb: str) -> str:
    return (
        f"list_aggregate(list_transform(range({_PDIM}), "
        f"t -> {pa}[t+1] * {pb}[t+1]), 'sum')"
    )


def _pnorm_sql(pa: str) -> str:
    return (
        f"sqrt(list_aggregate(list_transform(range({_PDIM}), "
        f"t -> {pa}[t+1] * {pa}[t+1]), 'sum'))"
    )


@query(
    "sim_random_projection",
    oracle=f"""
    WITH p AS (
      SELECT vec_id, label,
             [{", ".join(_proj_sql("embedding", t) for t in range(_PDIM))}]
               AS pv
      FROM embeddings
    ),
    q AS (SELECT pv AS qv FROM p WHERE vec_id = 0)
    SELECT p.vec_id, p.label,
           {_pdot_sql("p.pv", "q.qv")}
             / ({_pnorm_sql("p.pv")} * {_pnorm_sql("q.qv")}) AS pcosine
    FROM p CROSS JOIN q
    WHERE p.vec_id <> 0
    ORDER BY pcosine DESC, p.vec_id
    LIMIT 10
    """,
)
def sim_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL random projection 64→16 dims (deterministic ±1 signs), then
    exact cosine top-10 in the projected space against the vec_id=0
    query. Projection and scoring are both map-side over the broadcast
    1-row projected query; TakeOrderedAndProject keeps k rows per
    partition. The 4× dimension cut is the JL trade: pairwise angles
    survive within ~1/sqrt(16) distortion, enough for candidate
    generation feeding exact re-ranking (sim_topk_cosine)."""
    emb = load(spark, sf_dir, "embeddings")
    pdot = F.aggregate(
        F.zip_with(F.col("pv"), F.col("qv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )

    def pnorm(c):
        return F.sqrt(
            F.aggregate(
                F.transform(c, lambda x: x * x),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )

    # query side: ONE row — the HOF projection stays, so the vec_id=0
    # predicate keeps pushing down to the parquet scan (an opaque
    # kernel would block that and re-project the whole corpus to read
    # one row — guide §4.2 caveat)
    qp = emb.filter(F.col("vec_id") == 0).select(
        F.array(
            *[_proj_component(F.col("embedding"), t) for t in range(_PDIM)]
        ).alias("pv"),
    )
    q = qp.select(F.col("pv").alias("qv"), pnorm(F.col("pv")).alias("nq"))

    # corpus side: the 16 × 64-element interpreted HOF folds per row
    # were this query's whole cost (the r13 pair-cosine finding, §4.2);
    # ONE mapInArrow pass projects and emits the row norm with the
    # identical IEEE left-fold sequence (dim loop sequential, row axis
    # vectorized; float32→float64 exact; np.sqrt correctly rounded =
    # JVM sqrt), so pv/npv are bit-for-bit the HOF values. The closure
    # captures the sign matrix BY VALUE (a local list) — the kernel
    # stays self-contained for the neutral-cwd grading driver.
    rmat = [[float(s) for s in row] for row in _R]
    pdim = _PDIM

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        def project(b, n):
            flat = b.column(2).flatten()
            x = flat.to_numpy(zero_copy_only=False).astype(np.float64)
            xt = np.ascontiguousarray(x.reshape(n, -1).T)
            pvs = np.empty((pdim, n), dtype=np.float64)
            for t in range(pdim):
                acc = np.zeros(n, dtype=np.float64)
                row = rmat[t]
                for j in range(xt.shape[0]):
                    acc += xt[j] * row[j]
                pvs[t] = acc
            nacc = np.zeros(n, dtype=np.float64)
            for t in range(pdim):
                nacc += pvs[t] * pvs[t]
            return pvs, np.sqrt(nacc)

        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            ecol = batch.column(2)
            if ecol.null_count:
                # null embeddings: flatten() drops null slots and would
                # misalign every later row — compute on the valid
                # subset, null the rest (the HOF's null propagation)
                valid = ecol.is_valid().to_numpy(zero_copy_only=False)
                idx = np.flatnonzero(valid)
                pvs = np.zeros((pdim, n), dtype=np.float64)
                npv = np.zeros(n, dtype=np.float64)
                if idx.size:
                    sub = batch.take(pa.array(idx))
                    pv_s, np_s = project(sub, idx.size)
                    pvs[:, idx] = pv_s
                    npv[idx] = np_s
                null_mask = ~valid
            else:
                pvs, npv = project(batch, n)
                null_mask = None
            vals = pa.array(
                np.ascontiguousarray(pvs.T).ravel(), type=pa.float64()
            )
            offs = pa.array(np.arange(n + 1, dtype=np.int32) * pdim)
            pv_arr = pa.ListArray.from_arrays(offs, vals, mask=null_mask)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0),
                    batch.column(1),
                    pv_arr,
                    pa.array(npv, type=pa.float64(), mask=null_mask),
                ],
                schema=pa.schema(
                    [
                        batch.schema.field(0),
                        batch.schema.field(1),
                        pa.field("pv", pa.list_(pa.float64())),
                        pa.field("npv", pa.float64()),
                    ]
                ),
            )

    p = emb.select("vec_id", "label", "embedding").mapInArrow(
        kernel,
        "vec_id long, label int, pv array<double>, npv double",
    )
    return (
        p.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            "label",
            (pdot / (F.col("npv") * F.col("nq"))).alias("pcosine"),
        )
        .orderBy(F.col("pcosine").desc(), F.col("vec_id"))
        .limit(10)
    )
