"""Streaming + compaction semantics of the snapshot-log layer:
version-offset micro-batches, checkpoint resume, and rewrite commits
being invisible to incremental consumers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_final_parquet_spark.lake import LakeTable
from project_final_parquet_spark.lake.feed import make_lakefeed_datasource
from project_final_parquet_spark.tables import load


@pytest.fixture()
def orders(spark, sf_dir):
    return load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


def _run_feed(spark, table_root, sink, checkpoint):
    spark.dataSource.register(make_lakefeed_datasource())
    q = (
        spark.readStream.format("lakefeed")
        .option("path", str(table_root))
        .load()
        .writeStream.format("parquet")
        .option("path", str(sink))
        .option("checkpointLocation", str(checkpoint))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _sink_keys(spark, sink) -> list[int]:
    return [
        r.o_orderkey
        for r in spark.read.parquet(str(sink)).select("o_orderkey").collect()
    ]


def test_feed_streams_commits_and_resumes(spark, orders, tmp_path):
    table = LakeTable(tmp_path / "t")
    sink, ckpt = tmp_path / "sink", tmp_path / "ckpt"
    first = orders.filter(F.col("o_orderkey") % 3 == 0)
    table.commit_append(first)
    _run_feed(spark, table.root, sink, ckpt)
    keys = _sink_keys(spark, sink)
    assert sorted(keys) == sorted(
        r.o_orderkey for r in first.collect()
    )
    # a second commit lands; resuming from the checkpoint emits ONLY it
    second = orders.filter(F.col("o_orderkey") % 3 == 1)
    table.commit_append(second)
    _run_feed(spark, table.root, sink, ckpt)
    keys2 = _sink_keys(spark, sink)
    assert len(keys2) == len(keys) + second.count()
    assert len(set(keys2)) == len(keys2), "feed duplicated rows"


def test_compaction_is_invisible_to_the_feed(spark, orders, tmp_path):
    """Rewrite commits carry data_change=False: after the feed has
    consumed everything, compacting must produce ZERO new rows — the
    exactly-once contract CDC consumers rely on."""
    table = LakeTable(tmp_path / "t")
    sink, ckpt = tmp_path / "sink", tmp_path / "ckpt"
    for m in range(4):  # four small commits -> small-files problem
        table.commit_append(
            orders.filter(F.col("o_orderkey") % 4 == m), num_files=2
        )
    _run_feed(spark, table.root, sink, ckpt)
    n_before = len(_sink_keys(spark, sink))
    assert n_before == orders.count()

    files_before = len(table.manifest())
    v = table.compact(spark, target_bytes=1 << 30)  # everything one bin
    assert v == 5
    assert len(table.manifest()) < files_before
    # table content unchanged by the rewrite
    assert table.read(spark).count() == n_before
    # time travel to the pre-compaction snapshot still works
    assert table.read(spark, version=4).count() == n_before
    # incremental consumers see nothing new
    _run_feed(spark, table.root, sink, ckpt)
    assert len(_sink_keys(spark, sink)) == n_before
    with pytest.raises(ValueError):
        table.incremental(spark, since_version=4)


def test_compact_noop_publishes_no_version(spark, orders, tmp_path):
    table = LakeTable(tmp_path / "t")
    table.commit_append(orders.limit(50), num_files=1)
    assert table.compact(spark, target_bytes=1 << 30) == 1
    assert table.current_version == 1


def test_compact_preserves_stats_pruning(spark, orders, sf_dir, tmp_path):
    """Compacted files re-derive their min/max from the rewritten
    footers, so pruning keeps working after the rewrite."""
    full = load(spark, sf_dir, "orders")
    table = LakeTable(tmp_path / "t")
    table.commit_append(
        full,
        stats_cols=("o_orderdate",),
        num_files=8,
        range_by="o_orderdate",
    )
    # tiny target -> bins of ~2 files each, still range-disjoint-ish
    total_bytes = sum(e.bytes for e in table.manifest())
    table.compact(
        spark, target_bytes=total_bytes // 3, stats_cols=("o_orderdate",)
    )
    df, n_read, n_total = table.read_pruned(
        spark, "o_orderdate", "1996-03-01", "1996-06-01"
    )
    assert n_read < n_total
    lo = F.lit("1996-03-01").cast("timestamp_ntz")
    hi = F.lit("1996-06-01").cast("timestamp_ntz")
    pred = (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    assert (
        df.filter(pred).count()
        == full.filter(pred).count()
    )


def test_delete_where_rewrites_only_overlapping_files(spark, sf_dir, tmp_path):
    """Stats-guided copy-on-write: a date-bounded delete rewrites only
    the files whose [min,max] overlap the range; untouched files keep
    their exact paths."""
    full = load(spark, sf_dir, "orders")
    table = LakeTable(tmp_path / "t")
    table.commit_append(
        full, stats_cols=("o_orderdate",), num_files=8,
        range_by="o_orderdate",
    )
    before = {e.path for e in table.manifest()}
    lo, hi = "1996-01-01", "1997-01-01"
    lo_c = F.lit(lo).cast("timestamp_ntz")
    hi_c = F.lit(hi).cast("timestamp_ntz")
    pred = (F.col("o_orderdate") >= lo_c) & (F.col("o_orderdate") < hi_c)
    v = table.delete_where(
        spark, "o_orderdate", lo, hi, pred, stats_cols=("o_orderdate",)
    )
    assert v == 2
    after = {e.path for e in table.manifest()}
    untouched = before & after
    assert untouched, "delete rewrote every file despite range stats"
    assert after - before, "delete produced no rewritten files"
    # row-level result matches the logical delete exactly
    assert (
        table.read(spark).count()
        == full.filter(~pred).count()
    )
    assert table.read(spark).filter(pred).count() == 0
    # time travel still sees the pre-delete table
    assert table.read(spark, version=1).count() == full.count()


def test_vacuum_expires_history_and_orphans(spark, sf_dir, tmp_path):
    import os

    orders = load(spark, sf_dir, "orders").limit(200)
    table = LakeTable(tmp_path / "t")
    table.commit_append(orders, num_files=4)
    table.compact(spark, target_bytes=1 << 30)  # v2 rewrite
    old_files = {e.path for e in table.manifest(1)}
    live_files = {e.path for e in table.manifest(2)}
    deleted = table.vacuum(retain_last=1)
    # exactly the files only v1 referenced are gone
    assert set(deleted) == old_files - live_files
    assert all(not os.path.exists(p) for p in deleted)
    assert table.versions() == [2]
    assert table.read(spark).count() == 200
    with pytest.raises(FileNotFoundError):
        table.manifest(1)


def test_schema_evolution_add_column(spark, sf_dir, tmp_path):
    """Appends may widen the schema; merged reads surface NULL for
    rows written before the column existed, and the feed's inferred
    schema follows the NEWEST commit."""
    orders = load(spark, sf_dir, "orders")
    table = LakeTable(tmp_path / "t")
    table.commit_append(
        orders.limit(100).select("o_orderkey", "o_totalprice")
    )
    widened = (
        orders.orderBy(F.desc("o_orderkey"))
        .limit(50)
        .select(
            "o_orderkey",
            "o_totalprice",
            F.lit("batch2").alias("ingest_tag"),
        )
    )
    table.commit_append(widened)
    df = table.read(spark)
    assert set(df.columns) == {"o_orderkey", "o_totalprice", "ingest_tag"}
    assert df.count() == 150
    assert df.filter(F.col("ingest_tag").isNull()).count() == 100
    # the feed sees the widened schema and NULL-fills old files
    spark.dataSource.register(make_lakefeed_datasource())
    feed = (
        spark.read.format("lakefeed").load(str(table.root))
    )
    assert set(feed.columns) == {"o_orderkey", "o_totalprice", "ingest_tag"}
    assert feed.filter(F.col("ingest_tag") == "batch2").count() == 50
    assert feed.filter(F.col("ingest_tag").isNull()).count() == 100
