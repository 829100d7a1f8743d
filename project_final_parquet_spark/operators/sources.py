"""Source/sink operators beyond plain single-file parquet: partitioned
datasets (with partition pruning), raw-binary ingestion (the entry point
of a multimodal pipeline), and bucketed tables (shuffle-free joins).

The reference's only IO is one hand-rolled format on one file
(SURVEY.md §2.2 row 1); these are the layout strategies that matter at
100 TB:
- partitionBy(dt/status/...) → static + dynamic partition pruning skips
  whole directories before the scan;
- bucketBy(key) → co-located joins with NO exchange on either side;
- binaryFile → distributed ingestion of media/blob files into the
  binary-column model of operators/multimodal.py.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import DSUM_SQL, dsum, query
from ..tables import load

_IO_ROOT = os.path.join(tempfile.gettempdir(), "spark_graft_sources")


def partitioned_orders_path(spark: SparkSession, sf_dir: str) -> str:
    """Write orders partitioned by o_orderstatus (once per sf)."""
    path = os.path.join(_IO_ROOT, os.path.basename(sf_dir.rstrip("/")), "orders_part")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        load(spark, sf_dir, "orders").write.mode("overwrite").partitionBy(
            "o_orderstatus"
        ).parquet(path)
    return path


@query(
    "src_partitioned_pruning",
    oracle=f"""
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           {DSUM_SQL.format(expr="o_totalprice")} AS sum_price
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def src_partitioned_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned dataset; the status filter prunes to one
    partition directory before any file is opened (PartitionFilters in
    the scan — asserted in tests/test_sources.py)."""
    path = partitioned_orders_path(spark, sf_dir)
    return (
        spark.read.parquet(path)
        .filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("sum_price"),
        )
        .orderBy("o_orderpriority")
    )


def staged_binary_dir(spark: SparkSession, sf_dir: str, n: int = 20) -> str:
    """Stage the first ``n`` documents as standalone .bin files (stand-in
    for a directory of media blobs)."""
    path = os.path.join(_IO_ROOT, os.path.basename(sf_dir.rstrip("/")), "blobs")
    if not os.path.isdir(path) or len(os.listdir(path)) != n:
        os.makedirs(path, exist_ok=True)
        rows = (
            load(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < n)
            .select("doc_id", "text")
            .collect()
        )
        for r in rows:
            with open(os.path.join(path, f"{r.doc_id:06d}.bin"), "wb") as f:
                f.write(r.text.encode())
    return path


@query(
    "src_binaryfile_ingest",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           md5(text) AS checksum
    FROM documents
    WHERE doc_id < 20
    ORDER BY doc_id
    """,
)
def src_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed raw-file ingestion via the binaryFile source: each
    blob arrives as (path, modificationTime, length, content) — the
    front door of the multimodal pipeline. Filenames carry the id."""
    path = staged_binary_dir(spark, sf_dir)
    return (
        spark.read.format("binaryFile")
        .load(path)
        .select(
            F.regexp_extract(
                F.col("path"), r"(\d+)\.bin$", 1
            ).cast("long").alias("doc_id"),
            F.col("length").alias("n_bytes"),
            F.md5(F.col("content")).alias("checksum"),
        )
        .orderBy("doc_id")
    )
