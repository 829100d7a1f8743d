"""Advanced correlated-subquery query shapes — the three hardest TPC-H
decorrelation patterns (Q20/Q21/Q22 analogs), adapted to this corpus's
schema (no partsupp/receiptdate/phone columns; the *shapes* — nested
aggregate subquery, double correlated EXISTS on the same table, scalar
aggregate subquery + anti join — are the point).

These exercise exactly the plans a distributed engine must get right:
Catalyst decorrelates each subquery into a join (semi / anti / scalar
broadcast) instead of re-running it per outer row. All joins are
equi-joins on the natural keys, so every step is one hash/SMJ shuffle
that scales linearly; nothing is nested-loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import DSUM_SQL, dsum, query
from ..tables import load


@query(
    "q65_excess_share_suppliers",
    oracle=f"""
    WITH sp AS (
      SELECT l_suppkey, l_partkey,
             {DSUM_SQL.format(expr="l_quantity")} AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey, l_partkey
    ),
    tot AS (
      SELECT l_partkey, {DSUM_SQL.format(expr="l_quantity")} AS tot_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l_partkey
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS n_excess_parts
    FROM sp JOIN tot ON sp.l_partkey = tot.l_partkey
    JOIN supplier s ON s.s_suppkey = sp.l_suppkey
    WHERE sp.qty > 0.3 * tot.tot_qty
    GROUP BY s.s_name
    ORDER BY n_excess_parts DESC, s_name
    """,
)
def q65_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (reference capability class: none — standard
    relational extension): suppliers holding an outsized share of a
    part's 1996 shipments. The correlated "more than 30% of this
    part's total" subquery is decorrelated into a partkey equi-join
    between two aggregations over the SAME filtered scan — Catalyst
    reuses the pushed shipdate filter on both branches, and both aggs
    shuffle on (partkey[, suppkey]) so the final join is co-located
    with the finer grouping. Quantity sums follow the DECIMAL
    convention; the 30%-share compare is double-on-identical-operands.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    sp = li.groupBy("l_suppkey", "l_partkey").agg(dsum(F.col("l_quantity")).alias("qty"))
    tot = li.groupBy("l_partkey").agg(dsum(F.col("l_quantity")).alias("tot_qty"))
    sup = load(spark, sf_dir, "supplier")
    return (
        sp.join(tot, "l_partkey")
        .filter(F.col("qty") > 0.3 * F.col("tot_qty"))
        .join(F.broadcast(sup), sp["l_suppkey"] == sup["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n_excess_parts"))
        .orderBy(F.desc("n_excess_parts"), "s_name")
    )


@query(
    "q66_waiting_suppliers",
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    """,
)
def q66_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole supplier at fault in a multi-supplier
    finalized order ('R' returnflag stands in for the missing
    receipt>commit lateness columns). Two correlated EXISTS over the
    same table decorrelate into a LEFT SEMI + LEFT ANTI join pair on
    l_orderkey with a non-equi residual (suppkey <>) — three scans of
    lineitem all shuffled on orderkey, so at scale the three sorted
    runs merge without re-partitioning; the supplier dim broadcasts."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    sup = load(spark, sf_dir, "supplier")
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )
    cand = (
        l1.join(orders, F.col("l1.l_orderkey") == F.col("o_orderkey"))
        .join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "leftsemi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "leftanti",
        )
    )
    return (
        cand.join(F.broadcast(sup), F.col("l1.l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


@query(
    "q67_dormant_rich_accounts",
    oracle=f"""
    WITH pool AS (
      SELECT c_custkey, c_custkey % 10 AS cntrycode, c_acctbal
      FROM customer WHERE c_custkey % 10 IN (1, 3, 5, 7, 9)
    ),
    thr AS (
      SELECT {DSUM_SQL.format(expr="c_acctbal")} / COUNT(*) AS avg_bal
      FROM pool WHERE c_acctbal > 0.0
    )
    SELECT cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           {DSUM_SQL.format(expr="c_acctbal")} AS totacctbal
    FROM pool, thr
    WHERE c_acctbal > thr.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = pool.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def q67_dormant_rich_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers in selected
    country codes with no CURRENT-YEAR order (custkey%10 stands in
    for the missing phone prefix; every customer in this corpus has
    SOME order, so "dormant" = none since 2001). The scalar AVG
    subquery becomes a 1-row broadcast cross join (cheapest possible
    plan for a scalar), the NOT EXISTS an anti join on custkey whose
    orderdate filter is pushed below the join. AVG follows the
    decimal-sum/count convention so the threshold double is
    bit-identical."""
    cust = load(spark, sf_dir, "customer")
    pool = cust.filter((F.col("c_custkey") % 10).isin(1, 3, 5, 7, 9)).select(
        "c_custkey",
        (F.col("c_custkey") % 10).alias("cntrycode"),
        "c_acctbal",
    )
    thr = (
        pool.filter(F.col("c_acctbal") > 0.0)
        .agg((dsum(F.col("c_acctbal")) / F.count(F.lit(1))).alias("avg_bal"))
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2001-01-01")
        .select("o_custkey")
    )
    return (
        pool.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, pool["c_custkey"] == orders["o_custkey"], "leftanti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@query(
    "q68_revenue_mom_change",
    oracle=f"""
    WITH monthly AS (
      SELECT o_orderpriority,
             strftime(o_orderdate, '%Y-%m') AS month,
             {DSUM_SQL.format(expr="o_totalprice")} AS revenue
      FROM orders
      WHERE o_orderdate >= DATE '2000-01-01'
        AND o_orderdate < DATE '2001-01-01'
      GROUP BY o_orderpriority, strftime(o_orderdate, '%Y-%m')
    )
    SELECT o_orderpriority, month, revenue,
           CASE WHEN LAG(revenue) OVER w IS NULL
                  OR LAG(revenue) OVER w = 0.0 THEN NULL
                ELSE (revenue - LAG(revenue) OVER w) / LAG(revenue) OVER w
           END AS mom_change
    FROM monthly
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY month)
    ORDER BY o_orderpriority, month
    """,
)
def q68_revenue_mom_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue change per order priority (one year):
    the reporting-layer lag-ratio pattern. Monthly revenue uses the
    exact decimal-sum convention; the MoM ratio is then ONE double
    division of two already-deterministic doubles (guarded NULL on a
    missing or zero base month, the ANSI-mode-safe form).

    Month keys are yyyy-MM STRINGS on both engines — date_trunc returns
    a TZ-dependent timestamp in Spark (the tz-sweep trap), strings
    don't. One (priority, month) shuffle + one tiny window per
    priority."""
    from pyspark.sql import Window as W

    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "2000-01-01")
        & (F.col("o_orderdate") < "2001-01-01")
    )
    monthly = orders.groupBy(
        "o_orderpriority",
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
    ).agg(dsum(F.col("o_totalprice")).alias("revenue"))
    w = W.partitionBy("o_orderpriority").orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "o_orderpriority",
        "month",
        "revenue",
        F.when(
            prev.isNull() | (prev == 0.0), F.lit(None).cast("double")
        )
        .otherwise((F.col("revenue") - prev) / prev)
        .alias("mom_change"),
    ).orderBy("o_orderpriority", "month")


@query(
    "q69_variant_shred",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT))
                AS BIGINT) AS k_sum,
           CAST(COUNT(DISTINCT CAST(json_extract_string(props, '$.k')
                AS INT)) AS BIGINT) AS k_distinct,
           CAST(COUNT(CASE WHEN json_extract_string(props, '$.missing')
                IS NULL THEN 1 END) AS BIGINT) AS n_missing_path
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q69_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics through the VARIANT type (Spark 4):
    ``parse_json`` once into a binary-encoded variant, then typed-path
    access with ``variant_get`` / null-safe ``try_variant_get`` — the
    modern engine path for heterogeneous JSON at scale (parse once,
    access many, no per-access string re-parse the get_json_object form
    pays; q24/q34 keep the classic forms for contrast). The oracle is
    engine-neutral JSON extraction — VARIANT is an encoding, not a
    semantics change, which this equality demonstrates.

    Scale: shredding is map-side; one event_type partial-agg shuffle;
    the distinct ride-along re-shuffles (type, k) pairs — bounded by
    value cardinality."""
    ev = load(spark, sf_dir, "events")
    shredded = ev.select(
        "event_type",
        F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k"),
        F.expr(
            "try_variant_get(parse_json(props), '$.missing', 'int')"
        ).alias("m"),
    )
    return (
        shredded.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("k_sum"),
            F.countDistinct("k").alias("k_distinct"),
            F.count(F.when(F.col("m").isNull(), 1)).alias("n_missing_path"),
        )
        .orderBy("event_type")
    )


# --- recursive CTE hierarchy rollup ----------------------------------------


@query(
    "q70_recursive_org_rollup",
    oracle="""
    WITH RECURSIVE org(c_custkey, depth) AS (
      SELECT c_custkey, 0 FROM customer WHERE c_custkey = 0
      UNION ALL
      SELECT c.c_custkey, o.depth + 1
      FROM customer c JOIN org o ON c.c_custkey // 3 = o.c_custkey
      WHERE c.c_custkey > 0
    )
    SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(38,10))) AS VARCHAR)
                AS DOUBLE) AS total_bal
    FROM org JOIN customer c USING (c_custkey)
    GROUP BY depth ORDER BY depth
    """,
)
def q70_recursive_org_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE — new SQL surface in Spark 4.x):
    walk a synthetic reporting hierarchy over customer (parent(k) =
    k div 3, rooted at 0 — max depth ~log₃ N) and roll account balances
    up per depth. Submitted as SQL text, like sql_text_frontend, so the
    recursion is planned by Catalyst's recursion operator, not a Python
    loop; the DuckDB oracle runs its own native WITH RECURSIVE.

    Scale: each recursion level is one equi-join of the (shrinking)
    frontier against the child table — the same per-level cost profile
    as graph_pagerank's rounds, with depth bounded logarithmically by
    the fan-out, not by data size."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("sqlv_customer")
    return spark.sql(
        """
        WITH RECURSIVE org(c_custkey, depth) AS (
          SELECT c_custkey, 0 FROM sqlv_customer WHERE c_custkey = 0
          UNION ALL
          SELECT c.c_custkey, o.depth + 1
          FROM sqlv_customer c JOIN org o ON c.c_custkey div 3 = o.c_custkey
          WHERE c.c_custkey > 0
        )
        SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(38,10))) AS DOUBLE)
                 AS total_bal
        FROM org JOIN sqlv_customer c USING (c_custkey)
        GROUP BY depth ORDER BY depth
        """
    )


@query(
    "q71_window_distinct_count",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderkey, o_orderpriority,
             CASE WHEN ROW_NUMBER() OVER (
                    PARTITION BY o_custkey, o_orderpriority
                    ORDER BY o_orderkey) = 1
                  THEN 1 ELSE 0 END AS is_first
      FROM orders WHERE o_custkey % 10 = 0
    )
    SELECT o_custkey, o_orderkey,
           CAST(SUM(is_first) OVER (
                  PARTITION BY o_custkey
                  ORDER BY o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS distinct_priorities_so_far
    FROM seq ORDER BY o_custkey, o_orderkey
    """,
)
def q71_window_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over a window — the aggregate Spark's
    window functions refuse outright (and many engines only support
    unordered): per customer, how many DISTINCT order priorities have
    appeared up to each order. Expressed portably via the first-
    occurrence trick: mark the first (customer, priority) row in order
    sequence with ONE row_number window, then a running SUM of the
    markers — two ordinary window passes over the SAME partition key,
    no distinct-aggregate support needed in either engine.

    BOTH windows order by o_orderkey ALONE (unique within a customer,
    so deterministic): the marker window and the running sum must walk
    the SAME sequence, or the prefix sum undercounts priorities seen
    in the orderkey prefix whenever date order disagrees with key
    order (ADVICE r9 — the earlier (o_orderdate, o_orderkey) marker
    order had exactly that defect, invisible to the gate because the
    oracle mirrored the construction).

    Scale: both windows partition by o_custkey — one shuffle, two
    in-partition passes; no join, no collect_set memory blow-up (the
    size(collect_set) OVER alternative materializes the set per ROW).
    The custkey % 10 = 0 slice keeps the gated output bounded; the
    operator is the window composition, not the filter."""
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_custkey") % 10 == 0
    )
    from pyspark.sql import Window as W

    w_first = W.partitionBy("o_custkey", "o_orderpriority").orderBy(
        "o_orderkey"
    )
    seq = orders.select(
        "o_custkey",
        "o_orderkey",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias(
            "is_first"
        ),
    )
    w_run = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return seq.select(
        "o_custkey",
        "o_orderkey",
        F.sum("is_first").over(w_run).cast("long").alias(
            "distinct_priorities_so_far"
        ),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "q72_grouping_id",
    oracle="""
    SELECT COALESCE(o_orderpriority, '<all>') AS priority,
           COALESCE(o_orderstatus, '<all>') AS status,
           CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT)
             AS grouping_level,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
    ORDER BY grouping_level, priority, status
    """,
)
def q72_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING_ID level labels — the function that makes
    multi-grain rollups machine-consumable: level 0 = leaf cells,
    1 = per-priority subtotal, 3 = grand total, distinguished from
    REAL NULL group keys (which COALESCE alone would conflate). Both
    engines emit the identical bitmask (Spark grouping_id() ==
    DuckDB GROUPING(...)), so downstream cube readers can filter on
    the level instead of guessing from NULLs.

    Scale: one ROLLUP aggregate — Spark expands to a 3-grouping-set
    Expand + one shuffle, map-side combinable."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping_id().cast("long").alias("grouping_level"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
        .select(
            F.coalesce(F.col("o_orderpriority"), F.lit("<all>")).alias(
                "priority"
            ),
            F.coalesce(F.col("o_orderstatus"), F.lit("<all>")).alias(
                "status"
            ),
            "grouping_level",
            "n_orders",
        )
        .orderBy("grouping_level", "priority", "status")
    )
