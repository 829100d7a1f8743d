"""Registered queries over the snapshot-log table layer (lake/).

Not in the reference (its storage surface is single self-contained
encrypted files, ``src/parquet_writer.cpp``); this is the table-format
tier the CDC/streaming family (upsert_snapshot, cdc_merge_on_read,
snapshot_diff) assumes exists underneath: versioned commits, time
travel, incremental file scans, and manifest-stats pruning.

Each query stages a two-commit orders lake under the system temp dir
(idempotent per sf_dir: rebuilt only when absent or stale), then reads
through the LakeTable API. The aggregates are layout-independent, so
the DuckDB oracles are plain predicates over the source table — the
hash match proves the storage layer loses/duplicates nothing.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lake import LakeTable
from ..registry import DSUM_SQL, dsum, query
from ..tables import load

# Commit 1 = orders strictly before the cutoff; commit 2 appends the
# rest. Both are range-partitioned by o_orderdate so each file covers a
# disjoint date range (what makes stats pruning effective).
_CUTOFF = "1998-01-01"
_FILES_PER_COMMIT = 4
_PRUNE_LO = "1996-03-01"
_PRUNE_HI = "1996-06-01"
_STATS_COLS = ("o_orderdate",)


def _lake_root(sf_dir: str, name: str = "orders") -> str:
    return os.path.join(
        tempfile.gettempdir(),
        "spark_graft_lake",
        os.path.basename(sf_dir.rstrip("/")),
        name,
    )


def orders_lake(spark: SparkSession, sf_dir: str) -> LakeTable:
    """Stage (or reuse) the two-commit orders lake for ``sf_dir``."""
    table = LakeTable(_lake_root(sf_dir))
    if table.current_version == 2:
        return table
    if table.root.exists():  # stale/partial from an older layout
        shutil.rmtree(table.root)
    orders = load(spark, sf_dir, "orders")
    cutoff = F.lit(_CUTOFF).cast("timestamp_ntz")
    table.commit_append(
        orders.filter(F.col("o_orderdate") < cutoff),
        stats_cols=_STATS_COLS,
        num_files=_FILES_PER_COMMIT,
        range_by="o_orderdate",
    )
    table.commit_append(
        orders.filter(F.col("o_orderdate") >= cutoff),
        stats_cols=_STATS_COLS,
        num_files=_FILES_PER_COMMIT,
        range_by="o_orderdate",
    )
    return table


@query(
    "lake_time_travel_read",
    oracle=f"""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
           {DSUM_SQL.format(expr="o_totalprice")} AS total_price
    FROM orders WHERE o_orderdate < TIMESTAMP '{_CUTOFF}'
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def lake_time_travel_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel: read snapshot v1 AFTER v2 was committed — the
    manifest pins the exact file set, so the answer is the pre-append
    table regardless of what landed since (audit/repro reads at scale:
    training-data manifests cite a lake version, not a directory).

    Scale: version resolution and file listing are driver-side
    metadata; the data path is an ordinary parquet scan of the listed
    files with full pushdown."""
    table = orders_lake(spark, sf_dir)
    return (
        table.read(spark, version=1)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "lake_incremental_scan",
    oracle=f"""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders WHERE o_orderdate >= TIMESTAMP '{_CUTOFF}'
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def lake_incremental_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental scan: only the files ADDED by commit 2 — the
    CDC-consumer read pattern (process what's new, never rescan the
    settled table). At 100 TB this is the difference between a
    minutes-cadence downstream job and a full-table sweep.
    """
    table = orders_lake(spark, sf_dir)
    return (
        table.incremental(spark, since_version=1, to_version=2)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@query(
    "lake_stats_pruning",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           {DSUM_SQL.format(expr="o_totalprice")} AS total_price
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '{_PRUNE_LO}'
      AND o_orderdate < TIMESTAMP '{_PRUNE_HI}'
    """,
)
def lake_stats_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-stats pruning: the driver drops every file whose
    [min,max] date range cannot overlap the predicate BEFORE Spark
    lists it (tests assert files_read < files_total), then the
    row-level residual filter runs as usual — the same two-tier
    skipping parquet does with row groups, one level up. Because the
    commits are range-partitioned by date, a 3-month window touches
    ~1 of 8 files.
    """
    table = orders_lake(spark, sf_dir)
    df, _read, _total = table.read_pruned(
        spark, "o_orderdate", _PRUNE_LO, _PRUNE_HI
    )
    lo = F.lit(_PRUNE_LO).cast("timestamp_ntz")
    hi = F.lit(_PRUNE_HI).cast("timestamp_ntz")
    return df.filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("total_price"),
    )


@query(
    "src_lakefeed_datasource",
    oracle=f"""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def src_lakefeed_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end connector parity for the snapshot-log layer: the
    staged orders lake read back through ``spark.read.format(
    "lakefeed")`` — the Python Data Source that scans the CURRENT
    snapshot's live files, one partition per file — then aggregated in
    plain DataFrame code. Matching the aggregate computed from the
    parquet corpus directly proves commit → manifest → feed loses and
    duplicates nothing (both commits together are exactly the orders
    table). The streaming form of the same source (version offsets,
    compaction-invisible) is exercised in tests/test_lake_feed.py.

    Scale: partitions track live-file count; the schema is read from
    one footer; the manifest listing is driver-side metadata."""
    from ..lake.feed import make_lakefeed_datasource as _mk

    table = orders_lake(spark, sf_dir)
    spark.dataSource.register(_mk())
    df = spark.read.format("lakefeed").load(str(table.root))
    return (
        df.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("o_orderstatus")
    )


# --- MERGE INTO (latest-wins upsert) ----------------------------------------

# Updates: every 97th key in the LOW QUARTER of the key range (so the
# merge's stats pruning has untouched files to skip); inserts: every
# 101st key shifted far past the existing range (the pure-append path).
_INSERT_SHIFT = 100_000_000


def merge_lake(spark: SparkSession, sf_dir: str) -> "LakeTable":
    """Stage (or reuse) the merged orders lake: v1 = the full orders
    table range-partitioned by key, v2 = one ``merge_upsert`` commit
    applying the updates+inserts batch."""
    table = LakeTable(_lake_root(sf_dir, "orders_merge"))
    if table.current_version == 2:
        return table
    if table.root.exists():
        shutil.rmtree(table.root)
    orders = load(spark, sf_dir, "orders")
    table.commit_append(
        orders,
        stats_cols=("o_orderkey",),
        num_files=_FILES_PER_COMMIT,
        range_by="o_orderkey",
    )
    maxk = orders.agg(F.max("o_orderkey")).first()[0]
    updates = (
        orders.filter(
            (F.col("o_orderkey") % 97 == 0)
            & (F.col("o_orderkey") * 4 <= F.lit(maxk))
        )
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
    )
    inserts = orders.filter(F.col("o_orderkey") % 101 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(_INSERT_SHIFT)
    ).withColumn("o_orderstatus", F.lit("N"))
    table.merge_upsert(
        spark,
        updates.unionByName(inserts),
        "o_orderkey",
        stats_cols=("o_orderkey",),
        num_files=2,
        expected_parent=1,
    )
    return table


@query(
    "lake_merge_upsert",
    oracle=f"""
    WITH mk AS (SELECT MAX(o_orderkey) AS m FROM orders),
    merged AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        WHERE NOT (o_orderkey % 97 = 0
                   AND o_orderkey * 4 <= (SELECT m FROM mk))
        UNION ALL
        SELECT o_orderkey, 'U', o_totalprice * 2 FROM orders
        WHERE o_orderkey % 97 = 0
          AND o_orderkey * 4 <= (SELECT m FROM mk)
        UNION ALL
        SELECT o_orderkey + {_INSERT_SHIFT}, 'N', o_totalprice
        FROM orders WHERE o_orderkey % 101 = 0
    )
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
           {DSUM_SQL.format(expr="o_totalprice")} AS total_price,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def lake_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO the lake, latest-wins on o_orderkey: a CDC batch of
    updates (doubled price, status 'U', low-quarter keys only) plus
    inserts (fresh keys far past the range) applied as ONE copy-on-
    write commit, then the merged table read back and aggregated. The
    oracle recomputes the merge relationally from the source table, so
    the hash match proves the upsert lost nothing, duplicated nothing,
    and replaced exactly the matched keys.

    Scale: file touch is stats-pruned — the manifest's per-file
    [min,max] key ranges join against the source's DISTINCT keys
    (metadata ⋈ batch, broadcast), so only overlapping files are
    rewritten; the untouched-path preservation and prune bound are
    asserted in tests/test_lake.py. The reference has no table layer
    at all (single-file writer, src/parquet_writer.cpp:43) — this is
    the standard lakehouse upsert the CDC family composes with."""
    table = merge_lake(spark, sf_dir)
    return (
        table.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_price"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("o_orderstatus")
    )


# --- replaceWhere (atomic range overwrite) -----------------------------------


def replace_lake(spark: SparkSession, sf_dir: str) -> LakeTable:
    """Stage (or reuse) the backfilled orders lake: v1 = full orders
    range-partitioned by date, v2 = one ``replace_where`` commit that
    restates the [_PRUNE_LO, _PRUNE_HI) window (repriced x3, priority
    'R-BACKFILL')."""
    table = LakeTable(_lake_root(sf_dir, "orders_replace"))
    if table.current_version == 2:
        return table
    if table.root.exists():
        shutil.rmtree(table.root)
    orders = load(spark, sf_dir, "orders")
    table.commit_append(
        orders,
        stats_cols=_STATS_COLS,
        num_files=_FILES_PER_COMMIT,
        range_by="o_orderdate",
    )
    lo = F.lit(_PRUNE_LO).cast("timestamp_ntz")
    hi = F.lit(_PRUNE_HI).cast("timestamp_ntz")
    restated = (
        orders.filter(
            (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
        )
        .withColumn("o_totalprice", F.col("o_totalprice") * 3)
        .withColumn("o_orderpriority", F.lit("R-BACKFILL"))
    )
    table.replace_where(
        spark,
        "o_orderdate",
        _PRUNE_LO,
        _PRUNE_HI,
        restated,
        stats_cols=_STATS_COLS,
        expected_parent=1,
    )
    return table


@query(
    "lake_replace_where",
    oracle=f"""
    WITH merged AS (
        SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
        WHERE NOT (o_orderdate >= TIMESTAMP '{_PRUNE_LO}'
                   AND o_orderdate < TIMESTAMP '{_PRUNE_HI}')
        UNION ALL
        SELECT o_orderkey, 'R-BACKFILL', o_totalprice * 3 FROM orders
        WHERE o_orderdate >= TIMESTAMP '{_PRUNE_LO}'
          AND o_orderdate < TIMESTAMP '{_PRUNE_HI}'
    )
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
           {DSUM_SQL.format(expr="o_totalprice")} AS total_price,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM merged GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def lake_replace_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atomic range restatement (Delta replaceWhere): one commit drops
    a 3-month window and inserts its recomputed replacement (repriced,
    re-prioritized) — the backfill shape: readers see the old state or
    the new state, never a gap. The oracle recomputes the restatement
    relationally from the source table.

    Scale: the overwrite is stats-guided like delete_where — only
    files whose [min,max] date range overlaps the window are rewritten
    (out-of-range rows carried over), untouched files keep their paths
    (tests/test_lake.py asserts both the path preservation and the
    inside-range validation). At 100 TB restating one day touches that
    day's files, not the table."""
    table = replace_lake(spark, sf_dir)
    return (
        table.read(spark)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_price"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("o_orderpriority")
    )


# --- Z-order clustered commits ----------------------------------------------

_Z_FILES = 8


def zorder_lake(spark: SparkSession, sf_dir: str) -> LakeTable:
    """Stage (or reuse) the Z-order-clustered orders lake: one commit
    Morton-clustered on (o_custkey, o_orderkey) with stats on both."""
    table = LakeTable(_lake_root(sf_dir, "orders_zorder"))
    if table.current_version == 1:
        return table
    if table.root.exists():
        shutil.rmtree(table.root)
    table.commit_append(
        load(spark, sf_dir, "orders"),
        stats_cols=("o_custkey", "o_orderkey"),
        num_files=_Z_FILES,
        zorder_by=("o_custkey", "o_orderkey"),
    )
    return table


@query(
    "lake_zorder_pruned_read",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           {DSUM_SQL.format(expr="o_totalprice")} AS total_price,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders
    WHERE o_custkey * 8 <= (SELECT MAX(o_custkey) FROM orders)
    """,
)
def lake_zorder_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-stats pruning over a Z-ORDER-clustered commit: the lake
    is written clustered by the Morton interleave of (o_custkey,
    o_orderkey), so every file covers a narrow range on BOTH columns
    and a predicate on EITHER prunes files — here the lowest eighth of
    the customer range (tests assert files_read < files_total on each
    dimension separately). The oracle is the plain filter over the
    source table: the hash match proves clustering reorders, never
    loses.

    Scale: the Z write is one range shuffle + per-partition sort (same
    cost as 1-D range layout) and buys stats pruning on two filter
    columns at once — the Delta/Iceberg ZORDER BY trade, composed here
    with the snapshot log's driver-side pruning."""
    table = zorder_lake(spark, sf_dir)
    maxc = int(
        load(spark, sf_dir, "orders").agg(F.max("o_custkey")).first()[0]
    )
    df, _read, _total = table.read_pruned(spark, "o_custkey", 0, maxc // 8)
    return df.filter(F.col("o_custkey") * 8 <= F.lit(maxc)).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("total_price"),
        F.countDistinct("o_custkey").cast("long").alias("n_customers"),
    )


# --- row-level change feed (CDF) ---------------------------------------------


def cdf_lake(spark: SparkSession, sf_dir: str) -> LakeTable:
    """Stage (or reuse) the three-version CDF orders lake:
    v1 = base (keys not divisible by 10), range-partitioned by key;
    v2 = merge_upsert of a low-range CDC batch (updates: key%20==1 and
    key <= max/8, price doubled; inserts: the withheld %10==0 keys in
    the same low range);
    v3 = delete_where over the [max/3, max/2) key window."""
    table = LakeTable(_lake_root(sf_dir, "orders_cdf"))
    if table.current_version == 3:
        return table
    if table.root.exists():
        shutil.rmtree(table.root)
    orders = load(spark, sf_dir, "orders")
    maxk = int(orders.agg(F.max("o_orderkey")).first()[0])
    low, dlo, dhi = maxk // 8, maxk // 3, maxk // 2
    table.commit_append(
        orders.filter(F.col("o_orderkey") % 10 != 0),
        stats_cols=("o_orderkey",),
        num_files=8,
        range_by="o_orderkey",
    )
    updates = orders.filter(
        (F.col("o_orderkey") % 20 == 1) & (F.col("o_orderkey") <= low)
    ).withColumn("o_totalprice", F.col("o_totalprice") * 2)
    inserts = orders.filter(
        (F.col("o_orderkey") % 10 == 0) & (F.col("o_orderkey") <= low)
    )
    table.merge_upsert(
        spark,
        updates.unionByName(inserts),
        "o_orderkey",
        stats_cols=("o_orderkey",),
        num_files=2,
        expected_parent=1,
    )
    table.delete_where(
        spark,
        "o_orderkey",
        dlo,
        dhi,
        (F.col("o_orderkey") >= dlo) & (F.col("o_orderkey") < dhi),
        stats_cols=("o_orderkey",),
        expected_parent=2,
    )
    return table


@query(
    "lake_change_feed",
    oracle=f"""
    WITH p AS (
        SELECT MAX(o_orderkey) // 8 AS low,
               MAX(o_orderkey) // 3 AS dlo,
               MAX(o_orderkey) // 2 AS dhi
        FROM orders
    ),
    cls AS (
        SELECT o.o_orderkey, o.o_totalprice,
               CASE
                 WHEN o.o_orderkey % 10 <> 0
                      AND o.o_orderkey >= p.dlo AND o.o_orderkey < p.dhi
                   THEN 'delete'
                 WHEN o.o_orderkey % 10 = 0 AND o.o_orderkey <= p.low
                   THEN 'insert'
                 WHEN o.o_orderkey % 20 = 1 AND o.o_orderkey <= p.low
                   THEN 'update_post'
               END AS change_type
        FROM orders o CROSS JOIN p
    ),
    img AS (
        SELECT change_type, o_orderkey,
               CASE WHEN change_type = 'update_post'
                    THEN o_totalprice * 2 ELSE o_totalprice
               END AS price
        FROM cls WHERE change_type IS NOT NULL
    )
    SELECT change_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
           {DSUM_SQL.format(expr="price")} AS total_price
    FROM img GROUP BY change_type ORDER BY change_type
    """,
)
def lake_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level change feed (Delta CDF shape) across a merge AND a
    delete: v1->v3 net changes classified insert / update_post /
    delete, computed from the MANIFEST file-set diff — files present in
    both snapshots are untouched by copy-on-write construction and are
    never read (tests assert the scan set). Carried-over rows (the
    rewrite tax) cancel under a null-safe struct compare; the oracle
    reclassifies every order relationally, so the hash match proves the
    feed emits exactly the net row changes and nothing else.

    Scale: a daily CDF over key-clustered commits reads the day's
    touched files, not the table; the diff join shuffles only changed
    rows. The reference has no table layer (single-file writer,
    src/parquet_writer.cpp:43); this is the changelog tier a
    downstream incremental consumer (feature store, index refresh)
    reads instead of snapshot-diffing 100 TB."""
    table = cdf_lake(spark, sf_dir)
    cdf = table.change_feed(spark, "o_orderkey", since_version=1, to_version=3)
    return (
        cdf.select(
            F.col("_change_type").alias("change_type"),
            "o_orderkey",
            "o_totalprice",
        )
        .groupBy("change_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
            dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("change_type")
    )


@query(
    "lake_manifest_audit",
    oracle=f"""
    WITH c AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS all_rows,
             CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '{_CUTOFF}'
                      THEN 1 ELSE 0 END) AS BIGINT) AS v1_rows
      FROM orders
    )
    SELECT * FROM (
      SELECT CAST(1 AS BIGINT) AS version,
             CAST({_FILES_PER_COMMIT} AS BIGINT) AS n_files,
             v1_rows AS n_rows,
             CAST({_FILES_PER_COMMIT} AS BIGINT) AS files_added,
             v1_rows AS rows_added
      FROM c
      UNION ALL
      SELECT CAST(2 AS BIGINT), CAST({2 * _FILES_PER_COMMIT} AS BIGINT),
             all_rows, CAST({_FILES_PER_COMMIT} AS BIGINT),
             all_rows - v1_rows
      FROM c
    ) ORDER BY version
    """,
)
def lake_manifest_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-log audit, METADATA-ONLY: per lake version, the file
    count, total row count, and what the commit added — derived
    entirely from the manifest (zero data files opened; the only Spark
    job is over a driver-built |versions|-row frame). This is the
    table-health dashboard every lakehouse serves from its log
    (Delta's DESCRIBE HISTORY, Iceberg's snapshots table), and the
    oracle hash-matching the SOURCE table proves the manifest's row
    accounting is exact — the lake loses/duplicates nothing, verified
    without scanning it.

    Scale: manifests are O(files) JSON on the driver by design; at
    100 TB this query still reads only the log. The audit row counts
    come from per-file counts captured at commit time."""
    table = orders_lake(spark, sf_dir)
    rows = []
    for v in table.versions():
        man = table.manifest(v)
        rows.append(
            (
                v,
                len(man),
                sum(f.rows for f in man),
                sum(1 for f in man if f.added == v),
                sum(f.rows for f in man if f.added == v),
            )
        )
    return spark.createDataFrame(
        rows,
        "version long, n_files long, n_rows long, "
        "files_added long, rows_added long",
    ).orderBy("version")


# --- merge-on-read delete via equality-delete vectors ------------------------

# DV delete: a date-bounded retraction of every 7th order in the window
# (a "bad ingest batch" purge). Bounds declared for the stats pruner.
_DV_LO = "1996-03-01"
_DV_HI = "1997-03-01"
_DV_MOD = 7


def dv_lake(spark: SparkSession, sf_dir: str) -> LakeTable:
    """Stage (or reuse) the DV-delete orders lake: the two standard
    commits, then one equality-delete-vector commit (v3) that retracts
    every {_DV_MOD}th order inside [{_DV_LO}, {_DV_HI}) without
    rewriting a single data file."""
    table = LakeTable(_lake_root(sf_dir, name="orders_dv"))
    if table.current_version == 3:
        return table
    if table.root.exists():
        shutil.rmtree(table.root)
    orders = load(spark, sf_dir, "orders")
    cutoff = F.lit(_CUTOFF).cast("timestamp_ntz")
    for part in (
        orders.filter(F.col("o_orderdate") < cutoff),
        orders.filter(F.col("o_orderdate") >= cutoff),
    ):
        table.commit_append(
            part,
            stats_cols=_STATS_COLS,
            num_files=_FILES_PER_COMMIT,
            range_by="o_orderdate",
        )
    lo = F.lit(_DV_LO).cast("timestamp_ntz")
    hi = F.lit(_DV_HI).cast("timestamp_ntz")
    table.delete_where_dv(
        spark,
        col="o_orderdate",
        lo=_DV_LO,
        hi=_DV_HI,
        predicate=(
            (F.col("o_orderdate") >= lo)
            & (F.col("o_orderdate") < hi)
            & (F.col("o_orderkey") % _DV_MOD == 0)
        ),
        key_col="o_orderkey",
    )
    return table


@query(
    "lake_deletion_vectors",
    oracle=f"""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
           {DSUM_SQL.format(expr="o_totalprice")} AS total_price
    FROM orders
    WHERE NOT (o_orderdate >= TIMESTAMP '{_DV_LO}'
               AND o_orderdate < TIMESTAMP '{_DV_HI}'
               AND o_orderkey % {_DV_MOD} = 0)
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def lake_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read delete via equality-delete vectors (Iceberg v2's
    delete-file pattern, Delta's deletion vectors): a date-bounded
    purge commits as per-file key sidecars — ZERO data files rewritten
    — and the read applies them as a broadcast anti-join over only the
    DV-carrying files (manifest-stats pruning bounds which files those
    are). The oracle is the plain relational NOT-predicate over the
    source table, so the hash match proves the sidecar mechanism drops
    exactly the retracted rows and nothing else.

    Scale: the delete touches metadata + one pushdown scan per
    overlapping file (at 100 TB: the few files the date range maps to);
    the read pays the anti-join only on those files' rows — untouched
    files stream through with no join at all. Compaction (``compact``)
    later folds DVs back into clean files; ``delete_where`` is the
    copy-on-write sibling measured by lake_replace_where."""
    table = dv_lake(spark, sf_dir)
    return (
        table.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


def dvc_lake(spark: SparkSession, sf_dir: str) -> LakeTable:
    """Stage (or reuse) the DV-compaction lake: the dv_lake recipe
    (two commits + equality-delete-vector commit) followed by a
    ``compact_dv`` rewrite commit (v4) that folds the vectors back
    into clean files."""
    table = LakeTable(_lake_root(sf_dir, name="orders_dvc"))
    if table.current_version == 4:
        return table
    if table.root.exists():
        shutil.rmtree(table.root)
    orders = load(spark, sf_dir, "orders")
    cutoff = F.lit(_CUTOFF).cast("timestamp_ntz")
    for part in (
        orders.filter(F.col("o_orderdate") < cutoff),
        orders.filter(F.col("o_orderdate") >= cutoff),
    ):
        table.commit_append(
            part,
            stats_cols=_STATS_COLS,
            num_files=_FILES_PER_COMMIT,
            range_by="o_orderdate",
        )
    lo = F.lit(_DV_LO).cast("timestamp_ntz")
    hi = F.lit(_DV_HI).cast("timestamp_ntz")
    table.delete_where_dv(
        spark,
        col="o_orderdate",
        lo=_DV_LO,
        hi=_DV_HI,
        predicate=(
            (F.col("o_orderdate") >= lo)
            & (F.col("o_orderdate") < hi)
            & (F.col("o_orderkey") % _DV_MOD == 0)
        ),
        key_col="o_orderkey",
    )
    table.compact_dv(spark, stats_cols=_STATS_COLS)
    return table


@query(
    "lake_dv_compaction",
    oracle=f"""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
           {DSUM_SQL.format(expr="o_totalprice")} AS total_price
    FROM orders
    WHERE NOT (o_orderdate >= TIMESTAMP '{_DV_LO}'
               AND o_orderdate < TIMESTAMP '{_DV_HI}'
               AND o_orderkey % {_DV_MOD} = 0)
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def lake_dv_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DV lifecycle CLOSED: after ``compact_dv`` folds the
    equality-delete vectors into rewritten files (data_change=False —
    incremental consumers skip the rewrite), the read is a plain
    pruned parquet scan with NO anti-join, and it must hash-match the
    SAME oracle as lake_deletion_vectors — same relational view,
    merge-on-read converged back to copy-on-write storage. Together
    the two queries pin both halves of how a 100 TB table does
    low-latency deletes: sidecars at delete time, amortized rewrite at
    maintenance time.

    Scale: compaction rewrites ONLY the DV-carrying files (the few the
    date range mapped to); the final manifest carries zero DV
    pointers, so every later read is join-free (test-asserted)."""
    table = dvc_lake(spark, sf_dir)
    return (
        table.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


# --- bloom-filter point-lookup pruning ---------------------------------------

_BLOOM_KEY_MOD = 7
_BLOOM_KEY_REM = 3


def bloom_lake(spark: SparkSession, sf_dir: str) -> LakeTable:
    """Stage (or reuse) the bloom lake: the standard two date-ranged
    commits, then an ``add_blooms`` commit (v3) attaching per-file
    o_orderkey bloom sidecars. Files are date-partitioned, so every
    file's ORDERKEY RANGE spans the table — min/max stats cannot skip
    a single file for a key lookup; the blooms can."""
    table = LakeTable(_lake_root(sf_dir, name="orders_bloom"))
    if table.current_version == 3:
        return table
    if table.root.exists():
        shutil.rmtree(table.root)
    orders = load(spark, sf_dir, "orders")
    cutoff = F.lit(_CUTOFF).cast("timestamp_ntz")
    for part in (
        orders.filter(F.col("o_orderdate") < cutoff),
        orders.filter(F.col("o_orderdate") >= cutoff),
    ):
        table.commit_append(
            part,
            stats_cols=_STATS_COLS,
            num_files=_FILES_PER_COMMIT,
            range_by="o_orderdate",
        )
    table.add_blooms(spark, col="o_orderkey")
    return table


@query(
    "lake_bloom_point_lookup",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderkey = (
      SELECT MAX(o_orderkey) FROM orders
      WHERE o_orderkey % {_BLOOM_KEY_MOD} = {_BLOOM_KEY_REM}
    )
    """,
)
def lake_bloom_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup through manifest-level BLOOM pruning (the Parquet
    bloom-filter / Iceberg bloom story): the lake's files are
    date-partitioned, so a key lookup defeats min/max stats (every
    file's orderkey range overlaps every key) — the per-file bloom
    sidecars are what let the scan skip the files that cannot contain
    the key. The bloom is a superset guarantee; the row filter still
    applies, so the result equals the plain relational lookup (the
    oracle) regardless of false positives.

    Determinism: the looked-up key is a deterministic aggregate of the
    data (max orderkey ≡ {_BLOOM_KEY_REM} mod {_BLOOM_KEY_MOD}); bloom
    membership uses k fixed Knuth multiplicative hashes — no RNG, no
    seed, same bits everywhere. tests assert files_read < files_total
    (pruning actually happened).

    Scale: sidecar build is one pushdown scan per file aggregated to
    ≤m set-bit positions (metadata-scale however large the file); the
    lookup is driver-side bit probes + a scan of only the surviving
    files. At 100 TB keys the Knuth hash swaps for xxhash64 (the
    integer multiply overflows int64 past ~3.4e9 keys) — same shape."""
    table = bloom_lake(spark, sf_dir)
    key = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % _BLOOM_KEY_MOD == _BLOOM_KEY_REM)
        .agg(F.max("o_orderkey"))
        .first()[0]
    )
    df, _read, _total = table.read_bloom_pruned(
        spark, col="o_orderkey", value=int(key)
    )
    return df.filter(F.col("o_orderkey") == int(key)).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


# --- vacuum retention planning ------------------------------------------------


def vacuum_lake(spark: SparkSession, sf_dir: str) -> LakeTable:
    """Stage (or reuse) the vacuum-audit lake: v1 = full orders in
    _FILES_PER_COMMIT files, v2 = a FULL-range replace_where
    restatement (repriced x2) — every v1 file is superseded, so the
    retain-last-1 vacuum plan is exactly v1's files/rows."""
    table = LakeTable(_lake_root(sf_dir, "orders_vacuum"))
    if table.current_version == 2:
        return table
    if table.root.exists():
        shutil.rmtree(table.root)
    orders = load(spark, sf_dir, "orders")
    table.commit_append(
        orders,
        stats_cols=_STATS_COLS,
        num_files=_FILES_PER_COMMIT,
        range_by="o_orderdate",
    )
    restated = orders.withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    table.replace_where(
        spark,
        "o_orderdate",
        "1970-01-01",
        "2100-01-01",
        restated,
        stats_cols=_STATS_COLS,
        expected_parent=1,
    )
    return table


@query(
    "lake_vacuum_plan",
    oracle=f"""
    SELECT CAST(1 AS BIGINT) AS added_version,
           CAST({_FILES_PER_COMMIT} AS BIGINT) AS n_files_reclaimable,
           CAST(COUNT(*) AS BIGINT) AS n_rows_reclaimable
    FROM orders
    """,
)
def lake_vacuum_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vacuum retention plan, METADATA-ONLY: per commit version that
    added files no retained snapshot references, the reclaimable file
    and row counts (retain_last=1 over a lake whose v2 restated the
    FULL range, so v1's entire file set is the plan). The oracle
    hash-matches the SOURCE table's row count — proof the manifest's
    reclamation accounting is exact without opening a single data
    file. lake_manifest_audit is the live-side twin; tests pin that
    the plan equals what vacuum() then actually deletes.

    Scale: manifests are O(files) JSON on the driver; the plan is a
    set difference over them. The only Spark job is the driver-built
    |versions|-row frame."""
    table = vacuum_lake(spark, sf_dir)
    plan = table.vacuum_plan(retain_last=1)
    return spark.createDataFrame(
        plan,
        "added_version long, n_files_reclaimable long, "
        "n_rows_reclaimable long",
    ).orderBy("added_version")


# --- schema evolution ---------------------------------------------------------

# v1 writes orders WITHOUT o_orderpriority (the original producer
# schema); v2 appends the rest WITH it (a column added mid-stream).
_EVO_BASE_COLS = (
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate",
)


def evo_lake(spark: SparkSession, sf_dir: str) -> LakeTable:
    """Stage (or reuse) the schema-evolution orders lake: commit 1 is
    the pre-cutoff orders under the 5-column producer schema, commit 2
    appends the rest after the producer started emitting
    o_orderpriority."""
    table = LakeTable(_lake_root(sf_dir, name="orders_evo"))
    if table.current_version == 2:
        return table
    if table.root.exists():
        shutil.rmtree(table.root)
    orders = load(spark, sf_dir, "orders")
    cutoff = F.lit(_CUTOFF).cast("timestamp_ntz")
    table.commit_append(
        orders.filter(F.col("o_orderdate") < cutoff).select(*_EVO_BASE_COLS),
        stats_cols=_STATS_COLS,
        num_files=_FILES_PER_COMMIT,
        range_by="o_orderdate",
    )
    table.commit_append(
        orders.filter(F.col("o_orderdate") >= cutoff),
        stats_cols=_STATS_COLS,
        num_files=_FILES_PER_COMMIT,
        range_by="o_orderdate",
    )
    return table


@query(
    "lake_schema_evolution_audit",
    oracle=f"""
    WITH c AS (
      SELECT CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '{_CUTOFF}'
                      THEN 1 ELSE 0 END) AS BIGINT) AS v1_rows,
             CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '{_CUTOFF}'
                      THEN 1 ELSE 0 END) AS BIGINT) AS v2_rows
      FROM orders
    )
    SELECT * FROM (
      SELECT CAST(1 AS BIGINT) AS version,
             CAST({_FILES_PER_COMMIT} AS BIGINT) AS files_added,
             v1_rows AS rows_added,
             CAST({len(_EVO_BASE_COLS)} AS BIGINT) AS n_cols,
             v1_rows AS rows_missing_priority
      FROM c
      UNION ALL
      SELECT CAST(2 AS BIGINT), CAST({_FILES_PER_COMMIT} AS BIGINT),
             v2_rows, CAST({len(_EVO_BASE_COLS) + 1} AS BIGINT),
             CAST(0 AS BIGINT)
      FROM c
    ) ORDER BY version
    """,
)
def lake_schema_evolution_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Schema-evolution audit over a lake whose second commit ADDED a
    column (o_orderpriority): per version, the files/rows the commit
    added, the physical column count read from the commit's OWN parquet
    footers (pyarrow, metadata-only — the source of truth for what the
    producer actually wrote), and — through the merged-schema read path
    — how many of that commit's rows surface NULL for the evolved
    column. v1 rows must ALL be missing it, v2 rows none: the exact
    contract mergeSchema promises, here proven against the source table
    by the oracle hash rather than assumed.

    Scale: footer reads are O(files) metadata on the driver; the only
    data scan is the per-version filtered read (file-pruned by the
    manifest), counting NULLs map-side. This is the audit a platform
    team runs after every producer schema bump."""
    import pyarrow.parquet as pq

    table = evo_lake(spark, sf_dir)
    rows = []
    for v in table.versions():
        added = [e for e in table.manifest(v) if e.added == v]
        n_cols = pq.read_schema(added[0].path).names
        scan = spark.read.option("mergeSchema", "true").parquet(
            *[e.path for e in added]
        )
        if "o_orderpriority" in scan.columns:
            missing = scan.filter(F.col("o_orderpriority").isNull()).count()
        else:
            # every file of this commit predates the column: the merged
            # read surfaces it as absent, i.e. all rows miss it
            missing = scan.count()
        rows.append(
            (v, len(added), sum(e.rows for e in added), len(n_cols), missing)
        )
    return spark.createDataFrame(
        rows,
        "version long, files_added long, rows_added long, n_cols long, "
        "rows_missing_priority long",
    ).orderBy("version")


@query(
    "lake_clone_shallow",
    oracle=f"""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {DSUM_SQL.format(expr="o_totalprice")} AS sum_price,
           CAST({2 * _FILES_PER_COMMIT} AS BIGINT) AS n_files_shared,
           CAST(0 AS BIGINT) AS bytes_copied
    FROM orders
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def lake_clone_shallow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZERO-COPY shallow clone (Delta's SHALLOW CLONE): the clone's v1
    manifest references the source's data files by path — no bytes
    move. Reading the CLONE must hash-match the source table exactly
    (the oracle is the source aggregate), and the emitted metadata
    columns pin the zero-copy claim: every source file is shared,
    zero bytes copied. The clone is re-staged fresh each run (clone
    cost is O(files) manifest JSON — the point being demonstrated).

    Scale: cloning a 100 TB table is a driver-side manifest write; the
    read path is the ordinary manifest-driven scan. Source vacuum
    outliving clone retention is the documented hazard (docstring on
    ``LakeTable.clone_shallow``)."""
    table = orders_lake(spark, sf_dir)
    clone_root = _lake_root(sf_dir, name="orders_clone")
    if os.path.exists(clone_root):
        shutil.rmtree(clone_root)
    clone = table.clone_shallow(clone_root)
    src_files = {e.path for e in table.manifest()}
    # ADVICE r9: the oracle pins n_files_shared to the staging literal
    # 2*_FILES_PER_COMMIT; assert the staging invariant HERE so a
    # future change to orders_lake (file count, compaction) fails as a
    # targeted error at the source, not a confusing hash mismatch.
    if len(src_files) != 2 * _FILES_PER_COMMIT:
        raise AssertionError(
            "orders_lake staging drifted: expected "
            f"{2 * _FILES_PER_COMMIT} source files "
            f"(2*_FILES_PER_COMMIT), found {len(src_files)} — update "
            "the lake_clone_shallow oracle literal alongside"
        )
    clone_files = {e.path for e in clone.manifest()}
    n_shared = len(src_files & clone_files)
    bytes_copied = sum(
        e.bytes for e in clone.manifest() if e.path not in src_files
    )
    consts = spark.createDataFrame(
        [(n_shared, bytes_copied)],
        "n_files_shared long, bytes_copied long",
    )
    return (
        clone.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("sum_price"),
        )
        .crossJoin(F.broadcast(consts))
        .select(
            "o_orderstatus", "n_orders", "sum_price",
            "n_files_shared", "bytes_copied",
        )
        .orderBy("o_orderstatus")
    )
