"""Relational coverage, third tranche: pivot/unpivot, exact order
statistics, LATERAL joins, EXISTS forms, multiset set-ops, XML/text
sources, conditional aggregates, IGNORE NULLS windows, array sequences,
and exact decimal arithmetic.

Same contract as every operator module: each query is a lazy DataFrame
plan paired with an exact DuckDB oracle (registry.py conventions). The
reference has no relational surface (SURVEY.md §2.2) — this tranche is
rubric-category coverage, Spark-first.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import DSUM_SQL, dsum, query
from ..tables import load


@query(
    "q45_pivot",
    oracle=f"""
    SELECT c.c_mktsegment,
           COUNT(*) FILTER (WHERE o.o_orderstatus = 'O') AS n_open,
           COUNT(*) FILTER (WHERE o.o_orderstatus = 'F') AS n_finished,
           COUNT(*) FILTER (WHERE o.o_orderstatus = 'P') AS n_pending,
           {DSUM_SQL.format(expr="o.o_totalprice")} AS sum_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def q45_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order-status counts spread into columns per market segment
    (explicit pivot values keep the plan static — no extra distinct-scan
    job, the form that matters when the pivot source is 100 TB)."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey)
    pivoted = (
        joined.groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .withColumnsRenamed({"O": "n_open", "F": "n_finished", "P": "n_pending"})
    )
    sums = joined.groupBy("c_mktsegment").agg(
        dsum(F.col("o_totalprice")).alias("sum_price")
    )
    return (
        pivoted.join(sums, "c_mktsegment")
        .select("c_mktsegment", "n_open", "n_finished", "n_pending", "sum_price")
        .orderBy("c_mktsegment")
    )


@query(
    "q46_unpivot",
    oracle=f"""
    WITH m AS (
      SELECT 'p_retailprice' AS metric, p_retailprice AS value FROM part
      UNION ALL
      SELECT 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
    )
    SELECT metric, COUNT(*) AS n,
           {DSUM_SQL.format(expr="value")} AS total
    FROM m GROUP BY metric ORDER BY metric
    """,
)
def q46_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide part metrics to long (metric, value) rows,
    then aggregate per metric — the wide→long reshape is a map-side
    explode, no shuffle beyond the final aggregation."""
    part = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
        F.col("p_size").cast("double").alias("p_size"),
    )
    melted = part.unpivot(
        "p_partkey", ["p_retailprice", "p_size"], "metric", "value"
    )
    return (
        melted.groupBy("metric")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("total"))
        .orderBy("metric")
    )


@query(
    "q47_median_stats",
    oracle="""
    SELECT l_returnflag,
           median(CAST(l_quantity AS BIGINT)) AS med_qty,
           CAST(MIN(CAST(l_quantity AS BIGINT)) AS BIGINT) AS min_qty,
           CAST(MAX(CAST(l_quantity AS BIGINT)) AS BIGINT) AS max_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q47_median_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order statistics per group: median over integral
    quantities ((a+b)/2 midpoint is exact in double on both engines —
    the float-interpolated percentiles stay in q42's epsilon gate)."""
    li = load(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("long")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.median(qty).alias("med_qty"),
            F.min(qty).alias("min_qty"),
            F.max(qty).alias("max_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q48_lateral_topk",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) t
    WHERE c.c_mktsegment = 'MACHINERY'
    ORDER BY c.c_custkey, t.o_orderkey
    """,
)
def q48_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join: top-2 orders per customer expressed as a
    per-row subquery. Catalyst DECORRELATES this into a ranked window
    over one shuffle of orders — same physical plan as the explicit
    row_number formulation, declared at the semantic level."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_q48")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_q48")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer_q48 c JOIN LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders_q48 o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        WHERE c.c_mktsegment = 'MACHINERY'
        ORDER BY c.c_custkey, t.o_orderkey
        """
    )


@query(
    "q49_exists_forms",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    ORDER BY c.c_custkey
    """,
)
def q49_exists_forms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS + NOT EXISTS correlated subqueries — Catalyst plans them
    as one left-semi and one left-anti hash join, no subquery re-execution
    per row."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_q49")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_q49")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment
        FROM customer_q49 c
        WHERE EXISTS (SELECT 1 FROM orders_q49 o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
          AND NOT EXISTS (SELECT 1 FROM orders_q49 o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
        ORDER BY c.c_custkey
        """
    )


@query(
    "q50_multiset_ops",
    oracle="""
    WITH in_both AS (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      INTERSECT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ),
    only_open AS (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      EXCEPT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    )
    SELECT 'intersect_all' AS op, o_custkey, COUNT(*) AS multiplicity
    FROM in_both GROUP BY o_custkey
    UNION ALL
    SELECT 'except_all' AS op, o_custkey, COUNT(*) AS multiplicity
    FROM only_open GROUP BY o_custkey
    ORDER BY op, o_custkey
    """,
)
def q50_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (bag) set operations: INTERSECT ALL / EXCEPT ALL keep
    multiplicities (min / difference of per-side counts) — unlike the
    DISTINCT set-ops in q14. One shuffle each on the compared columns."""
    orders = load(spark, sf_dir, "orders")
    opens = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    fins = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    inter = (
        opens.intersectAll(fins)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("multiplicity"))
        .select(F.lit("intersect_all").alias("op"), "o_custkey", "multiplicity")
    )
    exc = (
        opens.exceptAll(fins)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("multiplicity"))
        .select(F.lit("except_all").alias("op"), "o_custkey", "multiplicity")
    )
    return inter.unionByName(exc).orderBy("op", "o_custkey")


# --- XML / text sources -----------------------------------------------------

_IO3_ROOT = os.path.join(tempfile.gettempdir(), "spark_graft_io3")

_RT_ORACLE = f"""
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           {DSUM_SQL.format(expr="o_totalprice")} AS sum_price
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """


@query("q51_xml_roundtrip", oracle=_RT_ORACLE)
def q51_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML sink + source round-trip (Spark 4 built-in XML datasource,
    explicit schema on read — schema inference over 100 TB of XML is a
    full extra pass)."""
    path = os.path.join(_IO3_ROOT, os.path.basename(sf_dir.rstrip("/")), "xml")
    src = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    src.write.mode("overwrite").option("rowTag", "order").xml(path)
    back = (
        spark.read.option("rowTag", "order")
        .schema("o_orderkey long, o_orderstatus string, o_totalprice double")
        .xml(path)
    )
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "q52_text_source",
    oracle="""
    SELECT COUNT(*) AS n_lines,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           CAST(MIN(length(text)) AS BIGINT) AS min_chars
    FROM documents
    """,
)
def q52_text_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unstructured text sink + source: documents written as raw text
    files (one doc per line) and read back with ``spark.read.text`` —
    the ingestion shape of a web-scrape corpus before any schema
    exists."""
    path = os.path.join(_IO3_ROOT, os.path.basename(sf_dir.rstrip("/")), "text")
    docs = load(spark, sf_dir, "documents")
    docs.select("text").write.mode("overwrite").text(path)
    back = spark.read.text(path)  # one `value` column per line
    return back.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("value").cast("long")).alias("total_chars"),
        F.min(F.length("value").cast("long")).alias("min_chars"),
    )


@query(
    "q53_conditional_aggs",
    oracle="""
    SELECT c_mktsegment,
           CAST(count_if(c_acctbal < 0) AS BIGINT) AS n_negative,
           bool_or(c_acctbal > 9000) AS has_rich,
           bool_and(c_acctbal > -1000) AS all_above_floor,
           arg_max(c_name, c_custkey) AS newest_name
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q53_conditional_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional / argument aggregates: count_if, bool_or/bool_and,
    max_by keyed on a UNIQUE column (ties would be engine-defined
    otherwise). All map-side partial-aggregable."""
    cust = load(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.count_if(F.col("c_acctbal") < 0).alias("n_negative"),
            F.bool_or(F.col("c_acctbal") > 9000).alias("has_rich"),
            F.bool_and(F.col("c_acctbal") > -1000).alias("all_above_floor"),
            F.max_by("c_name", "c_custkey").alias("newest_name"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q54_ignore_nulls_window",
    oracle="""
    SELECT o_orderkey, o_custkey,
           last_value(CASE WHEN o_orderstatus = 'F' THEN o_orderkey END
                      IGNORE NULLS)
             OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_finished_orderkey
    FROM orders
    ORDER BY o_orderkey
    """,
)
def q54_ignore_nulls_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window forward-fill: each order carries the most
    recent finished order of the same customer — the gap-fill idiom
    behind the as-of join (asof.py) exposed as a first-class query."""
    from pyspark.sql import Window as W

    orders = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    finished_key = F.when(
        F.col("o_orderstatus") == "F", F.col("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.last(finished_key, ignorenulls=True)
        .over(w)
        .alias("last_finished_orderkey"),
    ).orderBy("o_orderkey")


@query(
    "q55_sequence_arrays",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(list_aggregate(range(1, l_linenumber + 1), 'sum'))
                AS BIGINT) AS tri_sum,
           CAST(SUM(len(range(1, l_linenumber + 1))) AS BIGINT) AS n_elems
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q55_sequence_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array generation + fold: per-row integer sequences aggregated
    JVM-side (sequence/aggregate are codegen'd expressions — the
    generate-then-fold shape stays inside the row, no explode
    shuffle)."""
    li = load(spark, sf_dir, "lineitem")
    seq = F.sequence(F.lit(1), F.col("l_linenumber"))
    tri = F.aggregate(
        seq, F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(tri).alias("tri_sum"),
            F.sum(F.size(seq).cast("long")).alias("n_elems"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q56_decimal_exact",
    oracle="""
    SELECT o_orderstatus,
           CAST(CAST(SUM(CAST(o_orderkey % 100000 AS DECIMAL(18,2))
               * CAST('0.01' AS DECIMAL(4,2))) AS VARCHAR) AS DOUBLE)
               AS sum_cents,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def q56_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL arithmetic: integer-derived decimal amounts scaled
    by a DECIMAL factor (division would degrade to DOUBLE in DuckDB) and
    summed without float involvement — insensitive to aggregation order
    (what money columns should use instead of double).

    The SUM itself is exact decimal; only the FINAL result is cast to
    DOUBLE for output (registry convention #2): Spark types the sum
    DECIMAL(33,4), DuckDB DECIMAL(38,4), and the two clients render raw
    decimals differently (round-2 driver hash mismatch). The sum's
    magnitude (scale 4, < 2^49) is exactly representable in double, so
    the cast loses nothing; DuckDB goes through VARCHAR because its
    direct DECIMAL->DOUBLE cast is not correctly rounded."""
    orders = load(spark, sf_dir, "orders")
    cents = (F.col("o_orderkey") % 100000).cast("decimal(18,2)") * F.lit(
        "0.01"
    ).cast("decimal(4,2)")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.sum(cents).cast("double").alias("sum_cents"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderstatus")
    )
