"""Multimodal (binary) column operators.

Images/audio/video are carried as opaque ``binary`` payloads plus typed
metadata — the pattern for multimodal training-data pipelines at 100 TB:
blobs stay columnar in parquet (never parsed by the engine), metadata
columns drive pruning/filtering, and decode/feature-extraction runs as
Arrow-batched ``mapInPandas`` over partitions.

The corpus has no real media, so payloads are synthesized from
``documents.text`` bytes (deterministic → oracle-checkable), and the
actual codec step is STUBBED: ``decode_media`` raises
NotImplementedError (image/audio libs are not in this container) while
``fake_decode_features`` computes deterministic byte-level features with
the exact same Spark-side plumbing — schema contract, Arrow batching,
partition mapping — a real decoder would use.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

_KINDS = ["image", "audio", "video"]


def media_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → multimodal frame: (doc_id, kind, payload binary,
    meta struct<n_bytes,checksum>)."""
    docs = load(spark, sf_dir, "documents")
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    payload = F.col("text").cast("binary")
    return docs.select(
        "doc_id",
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.md5(payload).alias("checksum"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, kind: str):  # pragma: no cover - stub
    """REAL media decode (resize / resample / frame-sample) — requires
    image/audio codecs that are not installed in this container."""
    raise NotImplementedError(
        "media codecs unavailable; use fake_decode_features for the "
        "pipeline plumbing"
    )


def make_fake_decoder():
    """Deterministic stand-in decoder with the real operator's shape:
    consumes Arrow batches of (doc_id, kind, payload), emits per-item
    byte-level features. Swapping in a real codec changes only the body
    — schema, batching and distribution are identical.

    Built as a NESTED function on purpose: cloudpickle serializes nested
    functions by value, so executors never need this package importable
    (the driver may run from any cwd — module-level functions pickle by
    reference and break with ModuleNotFoundError on the workers)."""

    def fake_decode_features(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            payloads = pdf["payload"]
            # features are computed over decoded CODEPOINTS, not raw
            # UTF-8 bytes: byte-level len()/b[0] would diverge from the
            # character-based oracle (length()/ascii()) on any non-ASCII
            # text. A real media decoder would parse codec structures
            # here instead.
            texts = payloads.map(lambda b: b.decode("utf-8"))
            # empty-payload sentinels follow the oracle's SQL semantics:
            # ascii('') is 0 and sum-over-empty / 0 is NULL in DuckDB, so
            # emit first_cp=0 and mean_cp=NULL (None → Arrow null) rather
            # than inventing a Python-only -1/0.0 convention.
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_units": texts.map(len).astype("int32"),
                    "first_cp": texts.map(
                        lambda s: ord(s[0]) if s else 0
                    ).astype("int32"),
                    "mean_cp": _pd.Series(
                        [
                            (float(sum(map(ord, s))) / len(s)) if s else None
                            for s in texts
                        ],
                        index=pdf.index,
                        dtype="object",
                    ),
                }
            )

    return fake_decode_features


fake_decode_features = make_fake_decoder()


_DECODE_SCHEMA = (
    "doc_id long, kind string, n_units int, first_cp int, mean_cp double"
)


@query(
    "mm_metadata_stats",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
             octet_length(encode(text)) AS n_bytes
      FROM documents
    )
    SELECT kind, COUNT(*) AS n_items,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(MIN(n_bytes) AS BIGINT) AS min_bytes,
           CAST(MAX(n_bytes) AS BIGINT) AS max_bytes
    FROM m GROUP BY kind ORDER BY kind
    """,
)
def mm_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only scan over the multimodal frame: blob sizes per kind.
    The payload column is pruned out of the parquet scan entirely —
    exactly how a 100 TB blob table should answer metadata queries."""
    mf = media_frame(spark, sf_dir)
    return (
        mf.select("kind", F.col("meta.n_bytes").alias("n_bytes"))
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("n_bytes").cast("long")).alias("total_bytes"),
            F.min(F.col("n_bytes").cast("long")).alias("min_bytes"),
            F.max(F.col("n_bytes").cast("long")).alias("max_bytes"),
        )
        .orderBy("kind")
    )


@query(
    "mm_decode_features",
    oracle="""
    SELECT doc_id,
           ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
           CAST(length(text) AS INT) AS n_units,
           CAST(ascii(substr(text, 1, 1)) AS INT) AS first_cp,
           CAST(list_aggregate(list_transform(range(length(text)),
                i -> ascii(substr(text, i+1, 1))), 'sum') AS DOUBLE)
             / length(text) AS mean_cp
    FROM documents
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    mapInPandas — the sanctioned Python path for codec work the JVM
    can't express. The stub decoder computes byte statistics; the
    oracle reproduces them from the (ASCII) source text."""
    mf = media_frame(spark, sf_dir).select("doc_id", "kind", "payload")
    return mf.mapInPandas(fake_decode_features, schema=_DECODE_SCHEMA)


@query(
    "mm_arrow_features",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
             octet_length(encode(text)) AS n_bytes,
             ascii(substr(text, 1, 1)) AS first_byte
      FROM documents
    )
    SELECT kind,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(MIN(first_byte) AS BIGINT) AS min_first_byte,
           CAST(MAX(first_byte) AS BIGINT) AS max_first_byte
    FROM m GROUP BY kind ORDER BY kind
    """,
)
def mm_arrow_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level feature extraction through ``mapInArrow`` — the
    zero-copy tier of the UDF surface (below pandas UDFs: no
    Arrow→pandas conversion at all; batches stay as RecordBatches, the
    right level for codec-style byte work that pandas would only slow
    down). Features: payload byte length (vectorized Arrow kernel) and
    first byte (0 sentinel for empty payloads). The corpus is ASCII, so
    the first-byte equals the oracle's ascii() of the first character —
    asserted in bulk by the gate, byte-vs-codepoint caveat documented
    where it matters (make_fake_decoder).

    Scale: same Arrow batch dataflow as mapInPandas (pipeline-parallel,
    no shuffle), minus the pandas materialization per batch."""
    mf = media_frame(spark, sf_dir).select("doc_id", "kind", "payload")

    def make_arrow_mapper():
        # nested: cloudpickle serializes by value (see make_fake_decoder)
        def mapper(batches):
            import pyarrow as _pa
            import pyarrow.compute as _pc

            for batch in batches:
                payload = batch.column("payload")
                n_bytes = _pc.cast(
                    _pc.binary_length(payload), _pa.int64()
                )
                first = _pa.array(
                    [b[0] if len(b) else 0 for b in payload.to_pylist()],
                    type=_pa.int64(),
                )
                yield _pa.RecordBatch.from_arrays(
                    [batch.column("doc_id"), batch.column("kind"),
                     n_bytes, first],
                    names=["doc_id", "kind", "n_bytes", "first_byte"],
                )

        return mapper

    feats = mf.mapInArrow(
        make_arrow_mapper(),
        schema="doc_id long, kind string, n_bytes long, first_byte long",
    )
    return (
        feats.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.min("first_byte").alias("min_first_byte"),
            F.max("first_byte").alias("max_first_byte"),
        )
        .orderBy("kind")
    )
