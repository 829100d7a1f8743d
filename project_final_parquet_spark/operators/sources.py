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


def status_dim_path(spark: SparkSession, sf_dir: str) -> str:
    """Stage a tiny status dimension (status, kind) as parquet — a
    non-constant-foldable relation for exercising DYNAMIC partition
    pruning against the partitioned orders fact (a literal local
    relation would fold into a static IN filter and never trigger the
    runtime-subquery path)."""
    path = os.path.join(
        _IO_ROOT, os.path.basename(sf_dir.rstrip("/")), "status_dim"
    )
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        (
            load(spark, sf_dir, "orders")
            .select(F.col("o_orderstatus").alias("status"))
            .distinct()
            .withColumn(
                "kind",
                F.when(F.col("status") == "F", "terminal").otherwise("open"),
            )
            .write.mode("overwrite")
            .parquet(path)
        )
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
    for a directory of media blobs).

    Executor-side export: each task writes its own partition's blobs
    directly (``foreachPartition``), never routing bytes through the
    driver — the same shape a 100 TB blob export takes, where tasks
    write to shared object storage. Local mode shares one filesystem,
    so the files land in place; a driver-written marker records
    completion (task-level writes are idempotent per doc_id)."""
    path = os.path.join(_IO_ROOT, os.path.basename(sf_dir.rstrip("/")), "blobs")
    marker = os.path.join(path, "_STAGED")
    if not os.path.exists(marker):
        os.makedirs(path, exist_ok=True)

        def write_blobs(rows):  # nested: pickled by value to executors
            for r in rows:
                tmp = os.path.join(path, f".{r.doc_id:06d}.tmp")
                with open(tmp, "wb") as f:
                    f.write(r.text.encode())
                os.replace(tmp, os.path.join(path, f"{r.doc_id:06d}.bin"))

        (
            load(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < n)
            .select("doc_id", "text")
            .foreachPartition(write_blobs)
        )
        with open(marker, "w") as f:
            f.write(str(n))
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


def corrupt_json_path(spark: SparkSession, sf_dir: str) -> str:
    """Stage a JSON-lines fixture with deterministic corruption: orders
    with o_orderkey < 400; every key divisible by 10 becomes a broken
    line. Spark-native staging: the lines are BUILT as a column
    (``to_json`` for good rows, a literal broken fragment for corrupt
    ones) and written with ``df.write.text`` — no driver-side loop, so
    the same code stages a 100 TB fixture (drop the ``coalesce``)."""
    path = os.path.join(
        _IO_ROOT, os.path.basename(sf_dir.rstrip("/")), "orders_corrupt_json"
    )
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        key = F.col("o_orderkey")
        (
            load(spark, sf_dir, "orders")
            .filter(key < 400)
            .select(
                F.when(key % 10 == 0, F.lit('{"o_orderkey": BROKEN'))
                .otherwise(
                    F.to_json(F.struct("o_orderkey", "o_totalprice"))
                )
                .alias("value")
            )
            .coalesce(1)
            .write.mode("overwrite")
            .text(path)
        )
    return path


@query(
    "src_json_corrupt_records",
    oracle=f"""
    WITH base AS (SELECT * FROM orders WHERE o_orderkey < 400)
    SELECT CAST(COUNT(CASE WHEN o_orderkey % 10 <> 0 THEN 1 END) AS BIGINT)
             AS n_good,
           CAST(COUNT(CASE WHEN o_orderkey % 10 = 0 THEN 1 END) AS BIGINT)
             AS n_corrupt,
           {DSUM_SQL.format(
               expr="CASE WHEN o_orderkey % 10 <> 0 THEN o_totalprice "
                    "ELSE 0.0 END")} AS sum_good_price
    FROM base
    """,
)
def src_json_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-input tolerance (the bad-records path every 100 TB
    ingest needs): read JSON lines in PERMISSIVE mode with a
    _corrupt_record column — broken lines surface as quarantined rows
    instead of failing the job, well-formed rows parse normally. The
    oracle recomputes the same stats from the clean table using the
    fixture's deterministic corruption rule (keys % 10 == 0 are
    broken)."""
    path = corrupt_json_path(spark, sf_dir)
    df = spark.read.schema(
        "o_orderkey long, o_totalprice double, _corrupt_record string"
    ).option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    ).json(path)
    good = F.col("_corrupt_record").isNull()
    return df.agg(
        F.count(F.when(good, F.lit(1))).alias("n_good"),
        F.count(F.when(~good, F.lit(1))).alias("n_corrupt"),
        dsum(F.when(good, F.col("o_totalprice")).otherwise(F.lit(0.0))).alias(
            "sum_good_price"
        ),
    )


def federated_paths(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    """Stage the same orders slice (o_orderkey < 1000) in three formats
    — parquet, CSV, JSON lines — via Spark-native writes (once per
    sf)."""
    base = os.path.join(
        _IO_ROOT, os.path.basename(sf_dir.rstrip("/")), "federated"
    )
    paths = {fmt: os.path.join(base, fmt) for fmt in ("parquet", "csv", "json")}
    slice_df = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 1000)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    for fmt, path in paths.items():
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            w = slice_df.coalesce(1).write.mode("overwrite")
            if fmt == "csv":
                w.option("header", "true").csv(path)
            elif fmt == "json":
                w.json(path)
            else:
                w.parquet(path)
    return paths


@query(
    "src_federated_union",
    oracle=f"""
    WITH slice AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey < 1000
    ),
    fmts AS (
      SELECT * FROM (VALUES ('csv'), ('json'), ('parquet')) t(fmt)
    )
    SELECT fmt, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           {DSUM_SQL.format(expr="o_totalprice")} AS sum_price
    FROM slice CROSS JOIN fmts
    GROUP BY fmt, o_orderstatus
    ORDER BY fmt, o_orderstatus
    """,
)
def src_federated_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Federated read: the SAME logical table served from parquet, CSV
    (schema re-applied on read), and JSON lines, unioned by name with a
    format lineage column and aggregated — the heterogeneous-lake
    pattern where one query spans curated parquet plus raw landing
    formats. Value equality across formats doubles as a round-trip
    fidelity check for each connector (the oracle is format-agnostic:
    the clean slice × 3 labels).

    Scale: each format is its own distributed scan (CSV/JSON splittable
    per-line, parquet per-rowgroup); unionByName concatenates plans
    without a shuffle; the single shuffle is the final partial-agg on
    (fmt, status)."""
    paths = federated_paths(spark, sf_dir)
    schema = "o_orderkey long, o_orderstatus string, o_totalprice double"
    parts = [
        spark.read.schema(schema).parquet(paths["parquet"]).withColumn(
            "fmt", F.lit("parquet")
        ),
        spark.read.schema(schema)
        .option("header", "true")
        .csv(paths["csv"])
        .withColumn("fmt", F.lit("csv")),
        spark.read.schema(schema).json(paths["json"]).withColumn(
            "fmt", F.lit("json")
        ),
    ]
    df = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return (
        df.groupBy("fmt", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("o_totalprice")).alias("sum_price"),
        )
        .orderBy("fmt", "o_orderstatus")
    )


def _bucketed_tables(spark: SparkSession, sf_dir: str, n_buckets: int = 8):
    """Register orders + customer as bucketed tables (bucketBy custkey,
    one sorted file per bucket), writing data under _IO_ROOT so nothing
    lands in the (unknown, possibly read-only) driver cwd warehouse.

    Bucket metadata lives in the session catalog; a fresh driver session
    re-registers over the existing files (mode=overwrite keeps the write
    idempotent). repartition(n, key) before bucketBy(n, key) uses the
    SAME murmur3 hash partitioning as the bucket spec, so each task owns
    exactly one bucket → one sorted file per bucket."""
    sfkey = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    base = os.path.join(_IO_ROOT, sfkey, "bucketed")
    names = {}
    for tbl, key, cols in (
        ("orders", "o_custkey", ["o_orderkey", "o_custkey", "o_totalprice"]),
        ("customer", "c_custkey", ["c_custkey", "c_mktsegment"]),
    ):
        name = f"bkt_{tbl}_{sfkey}"
        names[tbl] = name
        if not spark.catalog.tableExists(name):
            (
                load(spark, sf_dir, tbl)
                .select(*cols)
                .repartition(n_buckets, F.col(key))
                .write.mode("overwrite")
                .option("path", os.path.join(base, tbl))
                .bucketBy(n_buckets, key)
                .sortBy(key)
                .saveAsTable(name)
            )
    return names


@query(
    "src_bucketed_join",
    oracle=f"""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {DSUM_SQL.format(expr="o.o_totalprice")} AS sum_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def src_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join on bucketed tables: both sides bucketed 8 ways on
    custkey, so the join runs with NO Exchange on either side (asserted
    on the physical plan in tests/test_sources.py) — the scan itself
    satisfies the join's HashPartitioning requirement. The only shuffle
    in the whole query is the final partial-agg on mktsegment.

    At 100 TB this is THE layout lever for repeated fact⋈dim joins on a
    stable key: pay the partitioning once at write time, never again at
    read time — bucket count is chosen so one bucket ≈ one task's
    memory budget (e.g. 100 TB / 256 MB ≈ 400k buckets)."""
    names = _bucketed_tables(spark, sf_dir)
    o = spark.table(names["orders"])
    # merge hint: at sf0.01 the dim side is broadcast-sized, which would
    # sidestep the bucket layout this query exists to demonstrate
    c = spark.table(names["customer"]).hint("merge")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("sum_price"),
        )
        .orderBy("c_mktsegment")
    )
