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
