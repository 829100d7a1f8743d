"""Bit-equality of the vectorized pair-cosine kernel (vecmath.py)
against the Catalyst HOF left-fold it replaced (optimization r13).

The kernel's correctness claim is EXACT: for every pair, the NumPy
dimension-loop performs the identical IEEE-754 op sequence as
``aggregate(zip_with(...))``, so cosines are bit-for-bit equal — not
approximately equal. These tests assert that on adversarial float32
data (denormal-ish magnitudes, mixed signs, values whose sums cancel),
plus the empty-frame edge case.
"""

from __future__ import annotations

import math
import random
import struct

import pytest
from pyspark.sql import functions as F

from project_final_parquet_spark.operators.vecmath import (
    hof_dot,
    with_pair_cosine,
)

DIM = 64


def _f32(x: float) -> float:
    """Round-trip through float32 (what array<float> storage does)."""
    return struct.unpack("f", struct.pack("f", x))[0]


def _rand_vec(rng: random.Random) -> list[float]:
    out = []
    for _ in range(DIM):
        mag = rng.choice([1e-6, 1e-3, 1.0, 1e3, 1e6])
        out.append(_f32(rng.uniform(-mag, mag)))
    return out


@pytest.fixture(scope="module")
def pair_df(spark):
    rng = random.Random(1337)
    rows = []
    for i in range(300):
        ea, eb = _rand_vec(rng), _rand_vec(rng)
        rows.append((i, ea, eb))
    df = spark.createDataFrame(
        rows, "pair_id long, ea array<float>, eb array<float>"
    )

    def norm(c):
        return F.sqrt(hof_dot(c, c))

    return df.select(
        "pair_id", "ea", "eb", norm(F.col("ea")).alias("na"),
        norm(F.col("eb")).alias("nb"),
    )


def test_kernel_bit_identical_to_hof_fold(spark, pair_df):
    hof = {
        r["pair_id"]: r["cosine"]
        for r in pair_df.select(
            "pair_id",
            (
                hof_dot(F.col("ea"), F.col("eb"))
                / (F.col("na") * F.col("nb"))
            ).alias("cosine"),
        ).collect()
    }
    ker = {
        r["pair_id"]: r["cosine"]
        for r in with_pair_cosine(pair_df, keep=["pair_id"]).collect()
    }
    assert set(hof) == set(ker)
    for pid, v in hof.items():
        # bit-for-bit: compare the raw double bits, not a tolerance
        assert struct.pack("d", v) == struct.pack("d", ker[pid]), (
            f"pair {pid}: HOF {v!r} != kernel {ker[pid]!r}"
        )


def test_kernel_matches_python_left_fold(spark, pair_df):
    """Cross-check a third implementation (pure-Python left fold — the
    same convention the DuckDB oracles run) on a sample of pairs."""
    rows = pair_df.limit(20).collect()
    ker = {
        r["pair_id"]: r["cosine"]
        for r in with_pair_cosine(
            pair_df.limit(20), keep=["pair_id"]
        ).collect()
    }
    for r in rows:
        acc = 0.0
        for x, y in zip(r["ea"], r["eb"]):
            acc = acc + float(x) * float(y)
        na = math.sqrt(_self_fold(r["ea"]))
        nb = math.sqrt(_self_fold(r["eb"]))
        expect = acc / (na * nb)
        assert struct.pack("d", expect) == struct.pack(
            "d", ker[r["pair_id"]]
        )


def _self_fold(v) -> float:
    acc = 0.0
    for x in v:
        acc = acc + float(x) * float(x)
    return acc


def test_kernel_empty_frame(spark, pair_df):
    empty = pair_df.filter(F.col("pair_id") < 0)
    out = with_pair_cosine(empty, keep=["pair_id"])
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["pair_id", "cosine"]


def test_zero_norm_vector_yields_null_cosine(spark):
    """An all-zeros float32 vector makes na*nb == 0; Catalyst's Divide
    is NULL (non-ANSI) / DIVIDE_BY_ZERO (ANSI) there, never IEEE
    ±inf/NaN — and a NaN cosine would sort FIRST in every desc top-k
    (optimization r14, ADVICE r13 medium). The kernel must emit NULL
    for the degenerate row and stay bit-identical on its neighbors in
    the same Arrow batch."""
    rng = random.Random(7)
    good_a, good_b = _rand_vec(rng), _rand_vec(rng)
    zero = [0.0] * DIM
    df = spark.createDataFrame(
        [(0, good_a, good_b), (1, zero, good_b), (2, zero, zero),
         (3, good_b, good_a)],
        "pair_id long, ea array<float>, eb array<float>",
    )

    def norm(c):
        return F.sqrt(hof_dot(c, c))

    src = df.select(
        "pair_id", "ea", "eb", norm(F.col("ea")).alias("na"),
        norm(F.col("eb")).alias("nb"),
    )
    got = {
        r["pair_id"]: r["cosine"]
        for r in with_pair_cosine(src, keep=["pair_id"]).collect()
    }
    assert got[1] is None and got[2] is None
    for pid, va, vb in ((0, good_a, good_b), (3, good_b, good_a)):
        acc = 0.0
        for x, y in zip(va, vb):
            acc = acc + float(x) * float(y)
        expect = acc / (math.sqrt(_self_fold(va)) * math.sqrt(_self_fold(vb)))
        assert struct.pack("d", expect) == struct.pack("d", got[pid])


def test_null_embedding_yields_null_cosine(spark):
    """A NULL embedding list must null that row's cosine — NOT shift
    every subsequent row (Arrow flatten() silently drops null list
    slots, so an unguarded reshape would misalign or crash — ADVICE
    r13 low). Valid rows in the same batch stay bit-identical."""
    rng = random.Random(11)
    va, vb = _rand_vec(rng), _rand_vec(rng)
    df = spark.createDataFrame(
        [(0, va, vb), (1, None, vb), (2, va, None), (3, vb, va)],
        "pair_id long, ea array<float>, eb array<float>",
    )

    def norm(c):
        return F.sqrt(hof_dot(c, c))

    src = df.select(
        "pair_id", "ea", "eb", norm(F.col("ea")).alias("na"),
        norm(F.col("eb")).alias("nb"),
    )
    got = {
        r["pair_id"]: r["cosine"]
        for r in with_pair_cosine(src, keep=["pair_id"]).collect()
    }
    assert got[1] is None and got[2] is None
    for pid, xa, xb in ((0, va, vb), (3, vb, va)):
        acc = 0.0
        for x, y in zip(xa, xb):
            acc = acc + float(x) * float(y)
        expect = acc / (math.sqrt(_self_fold(xa)) * math.sqrt(_self_fold(xb)))
        assert struct.pack("d", expect) == struct.pack("d", got[pid])
