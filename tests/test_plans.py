"""Plan-shape assertions: the optimizations SCALE.md claims must be
visible in the physical plans (pushdown, pruning, broadcast, top-k)."""

from __future__ import annotations

import contextlib
import io

import pytest

from project_final_parquet_spark.registry import all_queries

BIG_SF = "/root/testdata/sf0.01"


def plan_of(spark, name: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        all_queries()[name](spark, BIG_SF).explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark):
    p = plan_of(spark, "q2_filter_project")
    assert "GreaterThanOrEqual(l_quantity,45.0)" in p
    assert "EqualTo(l_returnflag,R)" in p


def test_column_pruning_reaches_scan(spark):
    p = plan_of(spark, "q2_filter_project")
    # only the 4 projected + 2 filtered columns may be read
    assert "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," in p.replace(
        "\n", ""
    )
    assert "l_shipdate" not in p.split("ReadSchema")[1].split("\n")[0]


def test_q1_prunes_and_pushes(spark):
    p = plan_of(spark, "q1_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in p
    read = p.split("ReadSchema: ")[1].split("\n")[0]
    assert "l_orderkey" not in read  # unused column never read


def test_star_join_broadcasts_dims(spark):
    p = plan_of(spark, "q3_star_join_revenue")
    assert p.count("BroadcastHashJoin") >= 3  # customer, nation, region
    assert "CartesianProduct" not in p


def test_topk_plans_as_take_ordered(spark):
    p = plan_of(spark, "q4_top_revenue_orders")
    assert "TakeOrderedAndProject" in p


def test_range_join_is_equi_plus_filter(spark):
    p = plan_of(spark, "q22_range_join")
    assert "BroadcastHashJoin" in p
    assert "BroadcastNestedLoopJoin" not in p  # range pred must not demote the join


def test_partial_aggregation_before_shuffle(spark):
    p = plan_of(spark, "q1_pricing_summary")
    # partial + final HashAggregate pair around one exchange
    assert p.count("HashAggregate") >= 2
    assert p.count("Exchange") >= 1
