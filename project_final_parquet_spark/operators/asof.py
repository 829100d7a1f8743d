"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented as a composition of built-in ops (no UDFs), the classic
scalable formulation: tag both inputs, union them on (key, time), and
forward-fill the right side's payload with ``last(..., ignorenulls=True)``
over a (key)-partitioned window ordered by time. Left rows then carry the
most recent right row with ``r.time <= l.time``.

Scale notes (100 TB): one shuffle on the join key (the window exchange) —
same cost as a sort-merge join — with no row explosion: the union is
|L|+|R| rows, never |L|×|R| candidate pairs. Skewed keys are split by AQE.
An alternative per-group ``merge_asof`` pandas path would move every group
through Python; this stays entirely in Tungsten.

DuckDB's native ASOF JOIN provides the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_payload: list[str],
    tiebreak: str,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right[right_time] <= left[left_time]``, matching on ``on``.

    ``tiebreak`` is a unique right-side column ordering simultaneous
    right rows (latest wins). Left columns pass through unchanged.

    The payload forward-fill is ONE struct, not per-column: filling each
    payload column independently with last(ignorenulls) would resurrect
    a stale value wherever the matched row holds a NULL — tearing columns
    from different right rows (DuckDB ASOF and pandas merge_asof attach
    the matched row wholesale, NULLs included).

    NULL join keys never match: ``Window.partitionBy`` groups NULL keys
    into one partition (unlike SQL equality, where NULL = NULL is not
    true), so NULL-key right rows are dropped up front — NULL-key left
    rows still pass through, payload NULL, matching ASOF LEFT JOIN.
    """
    from pyspark.sql import types as T

    right = right.filter(F.col(on).isNotNull())

    l_cols = left.columns
    payload_struct_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in right_payload]
    )
    tagged_l = left.select(
        F.col(on).alias("__key"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("long").alias("__tie"),
        *[F.col(c) for c in l_cols],
        F.lit(None).cast(payload_struct_type).alias("__payload"),
    )
    tagged_r = right.select(
        F.col(on).alias("__key"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.col(tiebreak).cast("long").alias("__tie"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols],
        F.struct(*[F.col(c) for c in right_payload]).alias("__payload"),
    )
    # right rows sort before left rows at equal time (<= semantics); the
    # window is rows-unbounded-preceding so last() sees only earlier rows.
    w = (
        W.partitionBy("__key")
        .orderBy("__t", "__is_left", "__tie")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled_payload = F.last("__payload", ignorenulls=True).over(w)
    out_cols: list[Column] = [F.col(c) for c in l_cols] + [
        filled_payload.getField(c).alias(c) for c in right_payload
    ]
    return (
        tagged_l.unionByName(tagged_r)
        .select(*out_cols, F.col("__is_left"))
        .filter(F.col("__is_left") == 1)
        .drop("__is_left")
    )


@query(
    "q23_asof_join",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, e.event_id AS last_event_id,
           e.value AS last_event_value
    FROM orders o
    ASOF LEFT JOIN events e
      ON o.o_custkey = e.user_id AND e.ts <= o.o_orderdate
    """,
)
def q23_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per user at each order's date (point-in-time join)."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    events = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.col("event_id").alias("last_event_id"),
        F.col("value").alias("last_event_value"),
        "event_id",
    )
    joined = asof_join(
        orders.withColumnRenamed("o_custkey", "__on_key"),
        events.withColumnRenamed("user_id", "__on_key"),
        on="__on_key",
        left_time="o_orderdate",
        right_time="ts",
        right_payload=["last_event_id", "last_event_value"],
        tiebreak="event_id",
    )
    return joined.select(
        "o_orderkey",
        F.col("__on_key").alias("o_custkey"),
        "last_event_id",
        "last_event_value",
    )
