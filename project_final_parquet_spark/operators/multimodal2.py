"""Multimodal batching plumbing (round 9): the fixed-window audio
chunk plan — the (clip, chunk) work list an audio featurizer/embedder
consumes, derived from REAL WAV decode (the multimodal.py RIFF chunk
walk), not from trusted metadata.

Not in the reference (no media surface — SURVEY.md §2.1); extends the
mm_real_decode_stats tier: same deterministic doc_id → PCM16 blob
generation, same mapInPandas decode, with the downstream plan computed
in pure DataFrame arithmetic.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

_CHUNK_SAMPLES = 50  # fixed featurizer window


def make_wav_length_stage():
    """mapInPandas stage: doc_id → real WAV blob → REAL parse →
    (doc_id, n_samples, sample_rate). Everything nested so executors
    get by-value pickles (the round-4 ModuleNotFoundError lesson)."""
    from .multimodal import _make_encoders, _make_parsers

    _, encode_wav = _make_encoders()
    _, parse_wav = _make_parsers()

    def wav_lengths(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            out = {"doc_id": [], "n_samples": [], "sample_rate": []}
            for doc_id in pdf["doc_id"]:
                n, sr, _ = parse_wav(encode_wav(int(doc_id)))
                out["doc_id"].append(doc_id)
                out["n_samples"].append(n)
                out["sample_rate"].append(sr)
            yield _pd.DataFrame(out)

    return wav_lengths


@query(
    "mm_audio_chunk_plan",
    oracle=f"""
    WITH params AS (
      SELECT doc_id, 64 + CAST(doc_id % 64 AS INT) AS n
      FROM documents WHERE doc_id % 2 = 1
    ),
    plan AS (
      SELECT doc_id, CAST(n AS BIGINT) AS n_samples, i AS chunk_idx,
             (n + {_CHUNK_SAMPLES - 1}) // {_CHUNK_SAMPLES} AS n_chunks
      FROM params
      CROSS JOIN (SELECT unnest(range(
        (127 + {_CHUNK_SAMPLES - 1}) // {_CHUNK_SAMPLES})) AS i)
      WHERE i < (n + {_CHUNK_SAMPLES - 1}) // {_CHUNK_SAMPLES}
    )
    SELECT doc_id, n_samples, CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(chunk_idx * {_CHUNK_SAMPLES} AS BIGINT) AS start_sample,
           CAST(least(n_samples, (chunk_idx + 1) * {_CHUNK_SAMPLES})
                AS BIGINT) AS end_sample,
           CAST(CASE WHEN chunk_idx = n_chunks - 1
                     THEN n_chunks * {_CHUNK_SAMPLES} - n_samples
                     ELSE 0 END AS BIGINT) AS pad_samples
    FROM plan ORDER BY doc_id, chunk_idx
    """,
)
def mm_audio_chunk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window audio batching plan: every audio clip (odd doc_ids,
    the corpus's WAV modality) is decoded FOR REAL (RIFF walk on the
    generated PCM16 bytes — never trusting metadata) and split into
    {_CHUNK_SAMPLES}-sample featurizer windows; each chunk row carries
    its sample range and the final chunk's zero-pad amount. This is the
    work list a Whisper-style encoder or VAD fans out over — the
    Spark-side plumbing (blob → Arrow decode stage → exploded plan) is
    the real operator; only the model call is out of scope here.

    Determinism: the oracle recomputes clip lengths in closed form from
    doc_id, so any decode or ceil-division bug is a hash mismatch; all
    arithmetic is integer.

    Scale: blobs stay on executors (mapInPandas, zero shuffle); the
    plan explode is map-side sequence arithmetic — output is
    Σ ceil(len/chunk) rows, written straight to the featurizer's queue
    with no aggregation at all."""
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % 2 == 1)
    )
    lens = docs.mapInPandas(
        make_wav_length_stage(),
        schema="doc_id long, n_samples long, sample_rate long",
    )
    n_chunks = F.expr(
        f"(n_samples + {_CHUNK_SAMPLES - 1}) div {_CHUNK_SAMPLES}"
    )
    plan = lens.select(
        "doc_id",
        "n_samples",
        n_chunks.alias("n_chunks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    return plan.select(
        "doc_id",
        "n_samples",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        (F.col("chunk_idx") * _CHUNK_SAMPLES).cast("long").alias(
            "start_sample"
        ),
        F.least(
            F.col("n_samples"), (F.col("chunk_idx") + 1) * _CHUNK_SAMPLES
        )
        .cast("long")
        .alias("end_sample"),
        F.when(
            F.col("chunk_idx") == F.col("n_chunks") - 1,
            F.col("n_chunks") * _CHUNK_SAMPLES - F.col("n_samples"),
        )
        .otherwise(0)
        .cast("long")
        .alias("pad_samples"),
    ).orderBy("doc_id", "chunk_idx")


_TILE = 2  # featurizer patch size (pixels per side)


def make_ppm_dims_stage():
    """mapInPandas stage: doc_id → real PPM blob → REAL parse →
    (doc_id, width, height). Nested for by-value pickling."""
    from .multimodal import _make_encoders, _make_parsers

    encode_ppm, _ = _make_encoders()
    parse_ppm, _ = _make_parsers()

    def ppm_dims(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": []}
            for doc_id in pdf["doc_id"]:
                w, h, _sum = parse_ppm(encode_ppm(int(doc_id)))
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
            yield _pd.DataFrame(out)

    return ppm_dims


@query(
    "mm_image_tile_grid",
    oracle=f"""
    WITH params AS (
      SELECT doc_id,
             4 + CAST(doc_id % 5 AS INT) AS w,
             3 + CAST(doc_id % 3 AS INT) AS h
      FROM documents WHERE doc_id % 2 = 0
    ),
    grid AS (
      SELECT doc_id, w, h, tx, ty,
             (w + {_TILE - 1}) // {_TILE} AS nx,
             (h + {_TILE - 1}) // {_TILE} AS ny
      FROM params
      CROSS JOIN (SELECT unnest(range(4)) AS tx)
      CROSS JOIN (SELECT unnest(range(3)) AS ty)
      WHERE tx < (w + {_TILE - 1}) // {_TILE}
        AND ty < (h + {_TILE - 1}) // {_TILE}
    )
    SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CAST(tx AS BIGINT) AS tile_x, CAST(ty AS BIGINT) AS tile_y,
           CAST(tx * {_TILE} AS BIGINT) AS x0,
           CAST(ty * {_TILE} AS BIGINT) AS y0,
           CAST(least(w, (tx + 1) * {_TILE}) AS BIGINT) AS x1,
           CAST(least(h, (ty + 1) * {_TILE}) AS BIGINT) AS y1,
           CAST(nx * {_TILE} - w AS BIGINT) * CAST(tx = nx - 1 AS BIGINT)
             + CAST(ny * {_TILE} - h AS BIGINT) * CAST(ty = ny - 1 AS BIGINT)
             AS pad_px_axes
    FROM grid ORDER BY doc_id, tile_y, tile_x
    """,
)
def mm_image_tile_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image patching plan (the ViT-style tile grid): every image clip
    (even doc_ids, the corpus's PPM modality) is decoded FOR REAL
    (ASCII header walk on the generated P6 bytes) and split into
    {_TILE}×{_TILE} patches; each tile row carries its pixel bounds and
    the edge tiles' pad amount (right/bottom overhang, summed per
    axis). The audio sibling is mm_audio_chunk_plan; together they are
    the fan-out work lists a multimodal featurizer consumes.

    Determinism: the oracle recomputes dimensions in closed form from
    doc_id; any header/offset decode bug is a hash mismatch; all
    arithmetic is integer.

    Scale: blobs stay on executors (mapInPandas, zero shuffle); the
    grid explode is a bounded map-side sequence product — output is
    Σ ceil(w/t)·ceil(h/t) rows, no aggregation."""
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % 2 == 0)
    )
    dims = docs.mapInPandas(
        make_ppm_dims_stage(), schema="doc_id long, width long, height long"
    )
    nx = F.expr(f"(width + {_TILE - 1}) div {_TILE}")
    ny = F.expr(f"(height + {_TILE - 1}) div {_TILE}")
    grid = dims.select(
        "doc_id",
        "width",
        "height",
        nx.alias("nx"),
        ny.alias("ny"),
        F.explode(F.sequence(F.lit(0), nx - 1)).alias("tile_x"),
    ).select(
        "*", F.explode(F.sequence(F.lit(0), F.col("ny") - 1)).alias("tile_y")
    )
    pad = (
        (F.col("nx") * _TILE - F.col("width"))
        * (F.col("tile_x") == F.col("nx") - 1).cast("long")
        + (F.col("ny") * _TILE - F.col("height"))
        * (F.col("tile_y") == F.col("ny") - 1).cast("long")
    )
    return grid.select(
        "doc_id",
        "width",
        "height",
        F.col("tile_x").cast("long").alias("tile_x"),
        F.col("tile_y").cast("long").alias("tile_y"),
        (F.col("tile_x") * _TILE).cast("long").alias("x0"),
        (F.col("tile_y") * _TILE).cast("long").alias("y0"),
        F.least(F.col("width"), (F.col("tile_x") + 1) * _TILE)
        .cast("long")
        .alias("x1"),
        F.least(F.col("height"), (F.col("tile_y") + 1) * _TILE)
        .cast("long")
        .alias("y1"),
        pad.cast("long").alias("pad_px_axes"),
    ).orderBy("doc_id", "tile_y", "tile_x")
