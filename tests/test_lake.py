"""Tests for the snapshot-log table layer (lake/table.py) and its
registered queries (operators/lake_queries.py)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from project_final_parquet_spark.lake import CommitConflict, LakeTable
from project_final_parquet_spark.operators.lake_queries import (
    _CUTOFF,
    _PRUNE_HI,
    _PRUNE_LO,
    orders_lake,
)
from project_final_parquet_spark.registry import all_queries
from project_final_parquet_spark.tables import load


@pytest.fixture()
def fresh_table(tmp_path):
    return LakeTable(tmp_path / "t")


def _orders(spark, sf_dir):
    return load(spark, sf_dir, "orders")


def test_commit_read_roundtrip(spark, sf_dir, fresh_table):
    orders = _orders(spark, sf_dir)
    v = fresh_table.commit_append(orders, stats_cols=("o_orderdate",))
    assert v == 1
    assert fresh_table.read(spark).count() == orders.count()


def test_time_travel_pins_the_old_snapshot(spark, sf_dir, fresh_table):
    orders = _orders(spark, sf_dir)
    first = orders.filter(F.col("o_orderkey") % 2 == 0)
    second = orders.filter(F.col("o_orderkey") % 2 == 1)
    fresh_table.commit_append(first)
    n1 = fresh_table.read(spark).count()
    fresh_table.commit_append(second)
    # v2 sees everything, v1 is frozen
    assert fresh_table.read(spark).count() == orders.count()
    assert fresh_table.read(spark, version=1).count() == n1
    # incremental = exactly the second commit's rows
    assert (
        fresh_table.incremental(spark, since_version=1).count()
        == orders.count() - n1
    )


def test_orphan_data_files_are_invisible(spark, sf_dir, fresh_table):
    """A crash between data write and log publish leaves orphan files;
    readers must not see them (the log, not the directory, is the
    table)."""
    orders = _orders(spark, sf_dir)
    fresh_table.commit_append(orders.limit(100))
    n = fresh_table.read(spark).count()
    # simulate a torn commit: data lands, log write never happens
    stray = fresh_table.data_dir / "v99"
    orders.limit(7).write.parquet(str(stray))
    assert fresh_table.read(spark).count() == n
    assert fresh_table.current_version == 1


def test_commit_conflict_second_writer_loses(spark, sf_dir, fresh_table):
    orders = _orders(spark, sf_dir)
    fresh_table.commit_append(orders.limit(10))
    base = fresh_table.current_version
    # a racing writer publishes v2 while we build on v1
    manifest = json.loads(
        (fresh_table.log_dir / "v1.json").read_text()
    )
    (fresh_table.log_dir / "v2.json").write_text(json.dumps(manifest))
    with pytest.raises(CommitConflict):
        fresh_table.commit_append(
            orders.limit(10), expected_parent=base
        )
    # without the pin the writer rebases onto the interloper's snapshot
    v = fresh_table.commit_append(orders.limit(10))
    assert v == 3


def test_stats_pruning_reads_a_strict_file_subset(spark, sf_dir):
    table = orders_lake(spark, sf_dir)
    df, n_read, n_total = table.read_pruned(
        spark, "o_orderdate", _PRUNE_LO, _PRUNE_HI
    )
    assert n_total == 8  # 2 commits x 4 range-partitioned files
    assert n_read < n_total, "stats pruning read every file"
    # superset guarantee: pruned scan + residual == full scan + filter
    lo = F.lit(_PRUNE_LO).cast("timestamp_ntz")
    hi = F.lit(_PRUNE_HI).cast("timestamp_ntz")
    pred = (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    assert (
        df.filter(pred).count()
        == table.read(spark).filter(pred).count()
    )


def test_merge_upsert_touches_only_overlapping_files(
    spark, sf_dir, fresh_table
):
    """A merge whose source keys cluster in one file's range rewrites
    that file ONLY — every other file keeps its exact path (the stats-
    pruned copy-on-write contract); time travel still sees the old
    values."""
    orders = _orders(spark, sf_dir)
    fresh_table.commit_append(
        orders,
        stats_cols=("o_orderkey",),
        num_files=4,
        range_by="o_orderkey",
    )
    before = {e.path: e for e in fresh_table.manifest()}
    # keys strictly inside the FIRST range file
    first = min(before.values(), key=lambda e: e.stats["o_orderkey"][0])
    lo, hi = first.stats["o_orderkey"]
    source = (
        orders.filter(
            (F.col("o_orderkey") >= lo)
            & (F.col("o_orderkey") <= hi)
            & (F.col("o_orderkey") % 7 == 0)
        )
        .withColumn("o_totalprice", F.lit(-1.0))
    )
    n_src = source.count()
    assert n_src > 0
    v = fresh_table.merge_upsert(
        spark, source, "o_orderkey", stats_cols=("o_orderkey",)
    )
    after = {e.path for e in fresh_table.manifest(v)}
    untouched = {p for p in before if p != first.path}
    assert untouched <= after, "merge rewrote files it did not touch"
    assert first.path not in after, "overlapping file was not rewritten"
    merged = fresh_table.read(spark, v)
    # pure update: same cardinality, the matched keys carry new values
    assert merged.count() == orders.count()
    assert merged.filter(F.col("o_totalprice") == -1.0).count() == n_src
    # keys stay unique after the merge
    assert merged.select("o_orderkey").distinct().count() == merged.count()
    # time travel: the pre-merge snapshot still has the old values
    old = fresh_table.read(spark, v - 1)
    assert old.filter(F.col("o_totalprice") == -1.0).count() == 0


def test_merge_upsert_all_new_keys_is_pure_append(
    spark, sf_dir, fresh_table
):
    orders = _orders(spark, sf_dir)
    fresh_table.commit_append(
        orders, stats_cols=("o_orderkey",), num_files=2,
        range_by="o_orderkey",
    )
    before_paths = {e.path for e in fresh_table.manifest()}
    inserts = orders.limit(50).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000)
    )
    v = fresh_table.merge_upsert(
        spark, inserts, "o_orderkey", stats_cols=("o_orderkey",)
    )
    after_paths = {e.path for e in fresh_table.manifest(v)}
    assert before_paths <= after_paths, "insert-only merge rewrote files"
    assert fresh_table.read(spark, v).count() == orders.count() + 50


def test_txn_commit_replay_is_a_noop(spark, sf_dir, fresh_table):
    """The Delta txn contract: a replayed (app_id, batch_id) commit
    publishes nothing — the basis of the exactly-once streaming sink."""
    orders = _orders(spark, sf_dir)
    batch = orders.limit(20)
    v1 = fresh_table.commit_append(batch, txn=("job", 0))
    assert v1 == 1 and fresh_table.last_txn("job") == 0
    v_replay = fresh_table.commit_append(batch, txn=("job", 0))
    assert v_replay == 1, "replayed batch published a new snapshot"
    assert fresh_table.read(spark).count() == 20
    # the next batch commits normally, and the watermark advances
    v2 = fresh_table.commit_append(batch, txn=("job", 1))
    assert v2 == 2 and fresh_table.last_txn("job") == 1
    assert fresh_table.read(spark).count() == 40
    # a different app's txns are independent
    assert fresh_table.last_txn("other") == -1
    v3 = fresh_table.commit_append(batch, txn=("other", 0))
    assert v3 == 3


def test_streaming_sink_is_exactly_once_across_restart(
    spark, sf_dir, fresh_table, tmp_path
):
    """foreachBatch sink end-to-end: a file stream drains into the
    lake with availableNow, new files land, a SECOND query resumes the
    same checkpoint — every source row lands in the lake exactly once,
    and a replayed micro-batch (same batch_id) is a no-op commit."""
    src = tmp_path / "src"
    ckpt = tmp_path / "ckpt"
    orders = _orders(spark, sf_dir)
    orders.limit(30).write.parquet(str(src / "a"))

    def run_once():
        stream = spark.readStream.schema(orders.schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(str(src / "*"))
        q = stream.writeStream.foreachBatch(
            fresh_table.streaming_sink("ingest")
        ).option("checkpointLocation", str(ckpt)).trigger(
            availableNow=True
        ).start()
        q.awaitTermination(120)

    run_once()
    assert fresh_table.read(spark).count() == 30
    # restart after more data lands
    orders.limit(45).write.parquet(str(src / "b"))  # 45 new rows
    run_once()
    got = fresh_table.read(spark)
    assert got.count() == 75, "restart dropped or duplicated a batch"
    # simulate the crash-replay of the LAST micro-batch: same batch_id
    last = fresh_table.last_txn("ingest")
    fresh_table.streaming_sink("ingest")(orders.limit(45), last)
    assert fresh_table.read(spark).count() == 75, (
        "replayed micro-batch double-wrote"
    )


def test_replace_where_is_stats_guided_and_validated(
    spark, sf_dir, fresh_table
):
    """replaceWhere: (a) rewrites only the files overlapping the
    range, (b) the restated window carries exactly the replacement
    rows, (c) out-of-range rows in the same touched files are carried
    over, (d) replacement rows outside the range raise."""
    orders = _orders(spark, sf_dir)
    fresh_table.commit_append(
        orders,
        stats_cols=("o_orderkey",),
        num_files=4,
        range_by="o_orderkey",
    )
    before = {e.path: e for e in fresh_table.manifest()}
    first = min(before.values(), key=lambda e: e.stats["o_orderkey"][0])
    lo, hi = first.stats["o_orderkey"]
    mid = (lo + hi) // 2  # half of the first file's range
    replacement = (
        orders.filter(
            (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < mid)
        ).withColumn("o_totalprice", F.lit(-7.0))
    )
    n_rep = replacement.count()
    v = fresh_table.replace_where(
        spark, "o_orderkey", lo, mid, replacement,
        stats_cols=("o_orderkey",),
    )
    after = {e.path for e in fresh_table.manifest(v)}
    untouched = {p for p in before if p != first.path}
    assert untouched <= after, "replace rewrote non-overlapping files"
    assert first.path not in after
    got = fresh_table.read(spark, v)
    assert got.count() == orders.count()
    assert got.filter(F.col("o_totalprice") == -7.0).count() == n_rep
    # carried-over rows from the touched file keep their values
    carried = got.filter(
        (F.col("o_orderkey") >= mid) & (F.col("o_orderkey") <= hi)
    )
    assert carried.filter(F.col("o_totalprice") == -7.0).count() == 0
    # rows outside the declared range are rejected
    with pytest.raises(ValueError):
        fresh_table.replace_where(
            spark, "o_orderkey", lo, mid,
            orders.limit(5).withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000)
            ),
        )


def test_zorder_commit_prunes_on_both_dimensions(spark, sf_dir):
    """A Z-order-clustered commit gives manifest-stats pruning on BOTH
    cluster columns: a narrow range predicate on either one reads a
    strict subset of files, and the pruned scan stays a superset of
    the true matches."""
    from project_final_parquet_spark.operators.lake_queries import (
        zorder_lake,
    )

    table = zorder_lake(spark, sf_dir)
    orders = _orders(spark, sf_dir)
    maxc, maxk = orders.agg(
        F.max("o_custkey"), F.max("o_orderkey")
    ).first()
    for col, hi in [("o_custkey", maxc // 8), ("o_orderkey", maxk // 8)]:
        df, n_read, n_total = table.read_pruned(spark, col, 0, hi)
        assert n_read < n_total, f"no pruning on {col}"
        # superset guarantee
        assert (
            df.filter(F.col(col) <= hi).count()
            == orders.filter(F.col(col) <= hi).count()
        )


def test_lake_queries_are_layout_independent(spark, sf_dir):
    """The registered lake aggregates must equal the same aggregates
    over the source table — the storage layer loses/duplicates
    nothing."""
    orders = _orders(spark, sf_dir)
    cutoff = F.lit(_CUTOFF).cast("timestamp_ntz")
    got = {
        r.o_orderstatus: r.n_orders
        for r in all_queries()["lake_time_travel_read"](spark, sf_dir).collect()
    }
    want = {
        r.o_orderstatus: r.cnt
        for r in orders.filter(F.col("o_orderdate") < cutoff)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == want


def test_change_feed_reads_only_changed_files(spark, sf_dir):
    """The CDF scan set is exactly the manifest file-set diff: files in
    both snapshots (untouched by copy-on-write construction) are never
    opened."""
    from project_final_parquet_spark.operators.lake_queries import cdf_lake

    table = cdf_lake(spark, sf_dir)
    old_paths = {e.path for e in table.manifest(1)}
    new_paths = {e.path for e in table.manifest(3)}
    diff = (old_paths - new_paths) | (new_paths - old_paths)
    untouched = old_paths & new_paths
    assert untouched, "staging should leave untouched files"
    cdf = table.change_feed(spark, "o_orderkey", since_version=1, to_version=3)
    read = {f.split("://", 1)[-1] for f in cdf.inputFiles()}
    assert read <= diff
    assert not (read & untouched)


def test_change_feed_classifies_against_snapshot_diff(spark, sf_dir):
    """Ground truth by brute force: full v1 vs v3 snapshot comparison
    must agree with the file-diff CDF on every key and class."""
    from project_final_parquet_spark.operators.lake_queries import cdf_lake

    table = cdf_lake(spark, sf_dir)
    v1 = {
        r["o_orderkey"]: r
        for r in table.read(spark, version=1).collect()
    }
    v3 = {
        r["o_orderkey"]: r
        for r in table.read(spark, version=3).collect()
    }
    expected = {}
    for k in v1.keys() - v3.keys():
        expected[k] = "delete"
    for k in v3.keys() - v1.keys():
        expected[k] = "insert"
    for k in v1.keys() & v3.keys():
        if v1[k] != v3[k]:
            expected[k] = "update_post"
    got = {
        r["o_orderkey"]: r["_change_type"]
        for r in table.change_feed(
            spark, "o_orderkey", since_version=1, to_version=3
        ).collect()
    }
    assert got == expected
    assert set(expected.values()) == {"delete", "insert", "update_post"}


def test_change_feed_compaction_only_range_is_empty(
    spark, sf_dir, fresh_table
):
    """A compaction commit rewrites rows without changing data; the CDF
    across it must cancel to zero rows (carried rows are identical on
    both sides of the file diff)."""
    orders = _orders(spark, sf_dir).limit(400)
    fresh_table.commit_append(orders, num_files=6)
    v2 = fresh_table.compact(spark, target_bytes=1 << 30)
    assert v2 == 2
    cdf = fresh_table.change_feed(
        spark, "o_orderkey", since_version=1, to_version=2
    )
    assert cdf.count() == 0
