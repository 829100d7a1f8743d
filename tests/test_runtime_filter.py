"""Runtime-filter prefilter: exactness (no false negatives) and plan
shape (broadcast semi-join, fact never shuffled before the reduction)."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_final_parquet_spark.operators.runtime_filter import (
    prefilter_fact_by_dim_keys,
)
from project_final_parquet_spark.plans import plan_facts
from project_final_parquet_spark.plans.audit import physical_plan
from project_final_parquet_spark.tables import load

SF = "/root/testdata/sf0.01"


def _frames(spark):
    li = load(spark, SF, "lineitem")
    # selective dim: auto parts only (~10% of part keys)
    dim = load(spark, SF, "part").filter(
        F.col("p_type").startswith("STANDARD")
    )
    return li, dim


def test_prefiltered_join_equals_plain_join(spark):
    li, dim = _frames(spark)
    plain = li.join(dim, li.l_partkey == dim.p_partkey).select(
        "l_orderkey", "l_linenumber", "p_partkey"
    )
    fact2 = prefilter_fact_by_dim_keys(li, dim, "l_partkey", "p_partkey")
    pre = fact2.join(dim, fact2.l_partkey == dim.p_partkey).select(
        "l_orderkey", "l_linenumber", "p_partkey"
    )
    key = ["l_orderkey", "l_linenumber", "p_partkey"]
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, pre.collect()))
    assert a == b and len(a) > 0


def test_prefilter_reduces_with_tiny_bucket_space(spark):
    """With buckets << |dim keys| the filter passes everything (still
    correct); with a generous space it actually drops rows — the d/m
    false-positive bound at work."""
    li, dim = _frames(spark)
    n_all = li.count()
    n_kept = prefilter_fact_by_dim_keys(
        li, dim.filter(F.col("p_partkey") % 100 == 0), "l_partkey", "p_partkey"
    ).count()
    assert n_kept < n_all


def test_prefilter_is_broadcast_semi_no_fact_shuffle(spark):
    li, dim = _frames(spark)
    fact2 = prefilter_fact_by_dim_keys(li, dim, "l_partkey", "p_partkey")
    p = physical_plan(fact2)
    assert "BroadcastHashJoin" in p and "LeftSemi" in p
    f = plan_facts(fact2)
    # the only exchange is the broadcast of the coarse set; the fact
    # side reaches the semi-join straight off its scan
    assert f.n_sortmerge_joins == 0 and f.n_shuffled_hash_joins == 0
    assert "Exchange hashpartitioning" not in p
