"""Source/sink tests: partition pruning visibility and bucketed
(shuffle-free) joins."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from project_final_parquet_spark.operators.sources import partitioned_orders_path
from project_final_parquet_spark.plans import physical_plan as _plan
from project_final_parquet_spark.tables import load


def test_partition_filter_prunes_directories(spark, sf_dir):
    path = partitioned_orders_path(spark, sf_dir)
    df = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    p = _plan(df)
    assert "PartitionFilters" in p
    assert "o_orderstatus" in p.split("PartitionFilters")[1].split("\n")[0]


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """bucketBy co-locates both sides: the join plan must contain zero
    Exchange operators — the 100 TB repeated-join strategy."""
    import shutil

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    # a fresh session has no metastore memory of old tables, but their
    # warehouse directories persist — remove them or saveAsTable throws
    # LOCATION_ALREADY_EXISTS
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("li_bucketed", "ord_bucketed"):
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
    load(spark, sf_dir, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").saveAsTable("li_bucketed")
    load(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    ).write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable("ord_bucketed")
    joined = spark.table("li_bucketed").join(
        spark.table("ord_bucketed").hint("merge"), "l_orderkey"
    )
    p = _plan(joined)
    assert "SortMergeJoin" in p
    assert "Exchange" not in p  # bucketing removed both shuffles
    # and the result is correct
    assert joined.count() == load(spark, sf_dir, "lineitem").count()
