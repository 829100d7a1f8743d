"""Relational coverage, fourth tranche: interval/date arithmetic and
ordered string aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query(
    "q57_interval_arith",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           strftime(CAST(MIN(date_trunc('quarter',
                    o_orderdate + INTERVAL 3 MONTH)) AS DATE), '%Y-%m-%d')
             AS min_due_quarter,
           MAX(datediff('day', DATE '1995-01-01', o_orderdate))
             AS max_days_since
    FROM orders
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q57_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/date arithmetic: due-date shifted a quarter out
    (add_months + trunc) and day deltas vs an epoch date, aggregated
    per priority. All date math is JVM expressions evaluated map-side;
    the shuffle moves only the 5-row aggregate."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            # trunc() returns DATE (TZ-free); date_trunc() would return
            # an LTZ timestamp whose value shifts with the session TZ.
            # Emit as a yyyy-MM-dd string so both engines canon equal.
            F.date_format(
                F.min(F.trunc(F.add_months(F.col("o_orderdate"), 3), "quarter")),
                "yyyy-MM-dd",
            ).alias("min_due_quarter"),
            F.max(
                F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
            ).alias("max_days_since"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q58_string_agg",
    oracle="""
    SELECT r.r_name,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
           CAST(COUNT(*) AS BIGINT) AS n_nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name ORDER BY r.r_name
    """,
)
def q58_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG): nations per region as a
    sorted comma-joined string. Spark spells it
    array_join(array_sort(collect_list(...))) — the sort pins the
    intra-group order that collect_list alone leaves
    partition-dependent, which is exactly the nondeterminism SQL's
    WITHIN GROUP (ORDER BY) exists to remove."""
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    return (
        nation.join(
            F.broadcast(region),
            nation.n_regionkey == region.r_regionkey,
        )
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            ),
            F.count(F.lit(1)).cast("long").alias("n_nations"),
        )
        .orderBy("r_name")
    )


@query(
    "events_rollup_multigrain",
    oracle="""
    WITH b AS (
      SELECT (epoch_us(ts) // 60000000) * 60000000 AS m,
             (epoch_us(ts) // 3600000000) * 3600000000 AS h,
             (epoch_us(ts) // 86400000000) * 86400000000 AS d,
             value
      FROM events
    )
    SELECT CASE WHEN GROUPING(m) = 0 THEN 'minute'
                WHEN GROUPING(h) = 0 THEN 'hour'
                ELSE 'day' END AS grain,
           COALESCE(m, h, d) AS bucket_us,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) AS VARCHAR)
                AS DOUBLE) AS total_value
    FROM b GROUP BY GROUPING SETS ((m), (h), (d))
    ORDER BY grain, bucket_us
    """,
)
def events_rollup_multigrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: minute, hour, and
    day grains materialized in ONE pass via GROUPING SETS — the
    timeseries-db pattern (e.g. TimescaleDB continuous aggregates)
    expressed as a single Spark aggregation. Buckets are integer
    epoch-microsecond arithmetic (ts_us), never NTZ↔LTZ casts, so the
    result is timezone-independent; partial aggregation combines
    map-side before the one shuffle that carries all three grains."""
    ev = load(spark, sf_dir, "events")
    b = ev.select(
        (F.expr("ts_us div 60000000") * 60000000).alias("m"),
        (F.expr("ts_us div 3600000000") * 3600000000).alias("h"),
        (F.expr("ts_us div 86400000000") * 86400000000).alias("d"),
        "value",
    )
    return (
        b.groupingSets([["m"], ["h"], ["d"]], "m", "h", "d")
        .agg(
            # grouping() is only legal inside the grouping-sets agg
            F.grouping("m").alias("gm"),
            F.grouping("h").alias("gh"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,10)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.when(F.col("gm") == 0, "minute")
            .when(F.col("gh") == 0, "hour")
            .otherwise("day")
            .alias("grain"),
            F.coalesce("m", "h", "d").alias("bucket_us"),
            "n_events",
            "total_value",
        )
        .orderBy("grain", "bucket_us")
    )


@query(
    "q59_stat_moments",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS VARCHAR)
                  AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,10)))
                  AS VARCHAR) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10)))
                  AS VARCHAR) AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(l_extendedprice * l_extendedprice
                  AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS syy,
             CAST(CAST(SUM(CAST(l_quantity * l_extendedprice
                  AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_rows,
           sx / n AS mean_qty,
           sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_qty,
           (sxy - sx * sy / n)
             / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n))
             AS corr_qty_price
    FROM s ORDER BY l_returnflag
    """,
)
def q59_stat_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical moments — sample stddev and Pearson correlation —
    computed from DECIMAL(38,10)-exact power sums, then combined in
    double (every per-row product here is exact in IEEE double, and
    the closed-form combination is the same correctly-rounded op
    sequence on both engines). NOT Spark's stddev_samp/corr: their
    streaming-update formulas are aggregation-order-dependent, which
    breaks cross-engine hashing — the power-sum form is also the
    map-side-combinable one a distributed engine wants anyway."""
    li = load(spark, sf_dir, "lineitem")
    dec = lambda c: c.cast("decimal(38,10)")  # noqa: E731
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dec(F.col("l_quantity"))).cast("double").alias("sx"),
        F.sum(dec(F.col("l_quantity") * F.col("l_quantity")))
        .cast("double")
        .alias("sxx"),
        F.sum(dec(F.col("l_extendedprice"))).cast("double").alias("sy"),
        F.sum(dec(F.col("l_extendedprice") * F.col("l_extendedprice")))
        .cast("double")
        .alias("syy"),
        F.sum(dec(F.col("l_quantity") * F.col("l_extendedprice")))
        .cast("double")
        .alias("sxy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    # try_divide (r13 division audit): a 1-row group zeroes n−1 and a
    # constant column zeroes the correlation denominator — both legal;
    # the moments are undefined there => NULL, matching DuckDB's
    # native double division-by-zero NULL. n itself is a group count
    # (>= 1 structurally), so sx/n stays a plain division.
    var_x = F.try_divide(sxx - sx * sx / n, n - 1)
    return s.select(
        "l_returnflag",
        n.cast("long").alias("n_rows"),
        (sx / n).alias("mean_qty"),
        F.sqrt(var_x).alias("stddev_qty"),
        F.try_divide(
            sxy - sx * sy / n,
            F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n),
        ).alias("corr_qty_price"),
    ).orderBy("l_returnflag")


@query(
    "q60_try_funcs",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN o_totalprice / NULLIF(o_orderkey % 5, 0)
                         IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_divisible,
           CAST(COUNT(TRY_CAST(o_orderpriority AS INT)) AS BIGINT)
             AS n_numeric_priority,
           CAST(COUNT(string_split(o_orderpriority, '-')[3]) AS BIGINT)
             AS n_has_third_part
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def q60_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe error handling: Spark 4 runs ANSI mode by default, so
    division by zero / bad casts / out-of-bounds indexing THROW unless
    routed through the try_* family — try_divide, try_cast,
    try_element_at — which return NULL exactly like DuckDB's
    NULLIF-guarded division, TRY_CAST, and (natively NULL-padding) list
    indexing. Counting the NULLs proves each soft-failure path."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.when(
                    F.try_divide(
                        F.col("o_totalprice"), F.col("o_orderkey") % 5
                    ).isNotNull(),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_divisible"),
            F.count(F.expr("try_cast(o_orderpriority AS INT)"))
            .cast("long")
            .alias("n_numeric_priority"),
            F.count(
                F.try_element_at(F.split("o_orderpriority", "-"), F.lit(3))
            )
            .cast("long")
            .alias("n_has_third_part"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "q61_struct_explode",
    oracle="""
    SELECT o_orderpriority, u.scn AS scenario,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(u.px AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)
             AS sum_px
    FROM orders,
         UNNEST([struct_pack(scn := 'p90', px := o_totalprice * 0.9),
                 struct_pack(scn := 'p75', px := o_totalprice * 0.75)]) AS t(u)
    GROUP BY o_orderpriority, scenario
    ORDER BY o_orderpriority, scenario
    """,
)
def q61_struct_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-type construction and flattening: build an array of
    scenario structs per row (what-if discount pricing), explode it,
    access struct fields, aggregate per (priority, scenario). The
    explode doubles row count map-side BEFORE the partial agg shrinks
    it back — no shuffle ever carries the exploded rows, only the
    (priority × scenario) partials."""
    orders = load(spark, sf_dir, "orders")
    from ..registry import dsum

    scenarios = F.array(
        F.struct(
            F.lit("p90").alias("scn"),
            (F.col("o_totalprice") * 0.9).alias("px"),
        ),
        F.struct(
            F.lit("p75").alias("scn"),
            (F.col("o_totalprice") * 0.75).alias("px"),
        ),
    )
    return (
        orders.select("o_orderpriority", F.explode(scenarios).alias("u"))
        .select(
            "o_orderpriority",
            F.col("u.scn").alias("scenario"),
            F.col("u.px").alias("px"),
        )
        .groupBy("o_orderpriority", "scenario")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            dsum(F.col("px")).alias("sum_px"),
        )
        .orderBy("o_orderpriority", "scenario")
    )


@query(
    "udaf_grouped_pandas",
    oracle="""
    WITH d AS (
      SELECT lang, n_chars,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars * n_tok) AS BIGINT) AS wsum,
           CAST(SUM(n_tok) AS BIGINT) AS wtot,
           CAST((100 * SUM(n_chars * n_tok)) // SUM(n_tok) AS BIGINT)
             AS wmean_x100
    FROM d GROUP BY lang ORDER BY lang
    """,
)
def udaf_grouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom grouped aggregation through applyInPandas (the UDAF
    surface): token-weighted character stats per language, computed in
    Arrow-batched pandas with INTEGER arithmetic only — float
    accumulation in Python would be partition-order-dependent and break
    the cross-engine hash; int64 sums are exact and order-free. The
    group-by shuffle is the same as a native agg; what's lost vs
    built-ins is map-side partial aggregation (each group's rows must
    co-locate), which is exactly why the native power-sum forms
    elsewhere are preferred when expressible."""
    import pandas as pd  # noqa: F401

    docs = load(spark, sf_dir, "documents").select("lang", "n_chars", "text")

    def weighted_stats(pdf):
        import pandas as _pd

        n_tok = pdf["text"].str.split(" ").map(len).astype("int64")
        w = (pdf["n_chars"].astype("int64") * n_tok).sum()
        t = int(n_tok.sum())
        return _pd.DataFrame(
            {
                "lang": [pdf["lang"].iloc[0]],
                "n_docs": [len(pdf)],
                "wsum": [int(w)],
                "wtot": [t],
                "wmean_x100": [(100 * int(w)) // t],
            }
        )

    return (
        docs.groupBy("lang")
        .applyInPandas(
            weighted_stats,
            schema="lang string, n_docs long, wsum long, wtot long, "
            "wmean_x100 long",
        )
        .orderBy("lang")
    )


@query(
    "q62_nested_order_lines",
    oracle="""
    WITH nested AS (
      SELECT l_orderkey,
             list(struct_pack(ln := l_linenumber,
                              qty := l_quantity,
                              price := l_extendedprice)
                  ORDER BY l_linenumber) AS lines
      FROM lineitem WHERE l_orderkey < 100
      GROUP BY l_orderkey
    )
    SELECT l_orderkey AS o_orderkey,
           CAST(len(lines) AS INT) AS n_lines,
           list_aggregate(list_transform(lines, x -> x.qty), 'sum')
             AS sum_qty,
           list_aggregate(list_transform(lines, x -> x.price), 'max')
             AS max_price
    FROM nested
    ORDER BY o_orderkey
    """,
)
def q62_nested_order_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denormalized (document-style) modeling: collapse each order's
    line items into an array<struct> column ordered by line number,
    then compute per-order stats WITH HIGHER-ORDER FUNCTIONS over the
    nested column — no second shuffle, no re-join. The fold order is
    pinned by the array sort, so the double sum is deterministic and
    cross-engine (same property the similarity dot products rely on).
    At 100 TB nesting is the read-amplification play: one row per
    order, lines co-located, no orders⋈lineitem join at query time."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    nested = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("l_linenumber").alias("ln"),
                    F.col("l_quantity").alias("qty"),
                    F.col("l_extendedprice").alias("price"),
                )
            )
        ).alias("lines")
    )
    return (
        nested.select(
            F.col("l_orderkey").alias("o_orderkey"),
            F.size("lines").alias("n_lines"),
            F.aggregate(
                F.transform("lines", lambda x: x["qty"]),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("sum_qty"),
            F.array_max(F.transform("lines", lambda x: x["price"])).alias(
                "max_price"
            ),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q63_hll_sketch_union",
    oracle="""
    WITH tok AS (
      SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
    )
    SELECT lang,
           CAST(COUNT(DISTINCT token) AS BIGINT) AS exact_distinct,
           TRUE AS within_bounds
    FROM tok WHERE token <> ''
    GROUP BY lang ORDER BY lang
    """,
)
def q63_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch cardinality: build Apache DataSketches HLL
    sketches of the token set per (lang, source) PARTIAL group, then
    hll_union_agg the partial sketches up to lang and estimate. The
    two-level build/merge is the point — mergeability is what makes
    sketch cardinality work at 100 TB (partials combine map-side and
    across days/partitions without re-reading data; exact
    COUNT(DISTINCT) cannot). HLL registers are max-of-hashes, so the
    result is insensitive to row order and partitioning — the estimate
    is deterministic. Gate: estimate must sit within HLL's error bound
    of the exact count (the oracle pins within_bounds TRUE)."""
    docs = load(spark, sf_dir, "documents").select("lang", "source", "text")
    tok = docs.select(
        "lang",
        "source",
        F.explode(F.split(F.col("text"), " ")).alias("token"),
    ).filter(F.col("token") != "")
    partials = tok.groupBy("lang", "source").agg(
        F.hll_sketch_agg("token").alias("sk")
    )
    merged = partials.groupBy("lang").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = tok.groupBy("lang").agg(
        F.countDistinct("token").alias("exact_distinct")
    )
    return (
        exact.join(merged, "lang")
        .select(
            "lang",
            "exact_distinct",
            (
                F.abs(F.col("est") - F.col("exact_distinct"))
                <= F.lit(0.05) * F.col("exact_distinct") + F.lit(1.0)
            ).alias("within_bounds"),
        )
        .orderBy("lang")
    )


@query(
    "basket_part_pairs",
    oracle="""
    WITH lines AS (
      SELECT DISTINCT l_orderkey, l_partkey % 200 AS part_grp
      FROM lineitem
    ),
    pairs AS (
      SELECT a.part_grp AS part_a, b.part_grp AS part_b,
             CAST(COUNT(*) AS BIGINT) AS support
      FROM lines a JOIN lines b
        ON a.l_orderkey = b.l_orderkey AND a.part_grp < b.part_grp
      GROUP BY a.part_grp, b.part_grp
    ),
    singles AS (
      SELECT part_grp, CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM lines GROUP BY part_grp
    )
    SELECT p.part_a, p.part_b, p.support,
           CAST((1000 * p.support) // s.n_orders AS BIGINT)
             AS confidence_x1000
    FROM pairs p JOIN singles s ON p.part_a = s.part_grp
    ORDER BY p.support DESC, p.part_a, p.part_b
    LIMIT 15
    """,
)
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: support and confidence for pairs of
    part groups bought in the same order (parts bucketed to 200 groups
    so pairs repeat at gate scale). The pair join is WITHIN-ORDER only
    — an equi-self-join on the order key where each side is an order's
    distinct part list (≤7 lines in TPC-H-ish data), so the blowup is
    bounded per order, never corpus-quadratic; the same blocking
    argument as the dedup family. Confidence = support/orders(A) as an
    integer ratio (×1000, floor)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", (F.col("l_partkey") % 200).alias("part_grp")
    ).distinct()
    a = li.select(
        F.col("l_orderkey").alias("k"), F.col("part_grp").alias("part_a")
    )
    b = li.select(
        F.col("l_orderkey").alias("k"), F.col("part_grp").alias("part_b")
    )
    pairs = (
        a.join(b, "k")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    singles = li.groupBy(F.col("part_grp").alias("part_a")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    return (
        pairs.join(F.broadcast(singles), "part_a")
        .select(
            "part_a",
            "part_b",
            "support",
            F.expr("1000 * support div n_orders").alias("confidence_x1000"),
        )
        .orderBy(F.desc("support"), "part_a", "part_b")
        .limit(15)
    )


@query(
    "sql_text_frontend",
    oracle="""
    SELECT n.n_name,
           CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,10)))
                AS VARCHAR) AS DOUBLE) AS revenue
    FROM nation n
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY n.n_name
    HAVING COUNT(o.o_orderkey) > 0
    ORDER BY n.n_name
    """,
)
def sql_text_frontend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-text front end as a first-class surface: the query is
    SUBMITTED AS SQL over registered temp views (not built with the
    DataFrame API), proving a reference user can bring plain SQL and
    get the same Catalyst plan — same broadcast of the nation dim, same
    partial/final aggregation — as the fluent API produces. The decimal
    sum convention applies identically inside SQL text."""
    for t in ("nation", "customer", "orders"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"sqlv_{t}")
    return spark.sql(
        """
        SELECT n.n_name,
               COUNT(DISTINCT c.c_custkey) AS n_customers,
               COUNT(o.o_orderkey) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,10))) AS DOUBLE)
                 AS revenue
        FROM sqlv_nation n
        JOIN sqlv_customer c ON c.c_nationkey = n.n_nationkey
        LEFT JOIN sqlv_orders o ON o.o_custkey = c.c_custkey
        GROUP BY n.n_name
        HAVING COUNT(o.o_orderkey) > 0
        ORDER BY n.n_name
        """
    )


@query(
    "q64_groupwise_ols",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS VARCHAR)
                  AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,10)))
                  AS VARCHAR) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10)))
                  AS VARCHAR) AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(l_quantity * l_extendedprice
                  AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_rows,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
           (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
             AS intercept
    FROM s ORDER BY l_returnflag
    """,
)
def q64_groupwise_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise simple linear regression (extendedprice ~ quantity)
    in closed form from DECIMAL-exact power sums — the distributed OLS
    pattern: one map-side-combinable aggregation collects (n, Σx, Σx²,
    Σy, Σxy) per group, the normal-equation solve is a handful of
    double ops on identical operands (q59's moments machinery extended
    to model fitting). Per-group model fitting over 100 TB costs
    exactly one shuffle of five numbers per group."""
    li = load(spark, sf_dir, "lineitem")
    dec = lambda c: c.cast("decimal(38,10)")  # noqa: E731
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dec(F.col("l_quantity"))).cast("double").alias("sx"),
        F.sum(dec(F.col("l_quantity") * F.col("l_quantity")))
        .cast("double")
        .alias("sxx"),
        F.sum(dec(F.col("l_extendedprice"))).cast("double").alias("sy"),
        F.sum(dec(F.col("l_quantity") * F.col("l_extendedprice")))
        .cast("double")
        .alias("sxy"),
    )
    n, sx, sxx, sy, sxy = (F.col(c) for c in ("n", "sx", "sxx", "sy", "sxy"))
    # try_divide (r13 division audit): a group with CONSTANT x (every
    # line the same quantity — legal) zeroes n·sxx − sx² and ANSI
    # would abort; the slope is undefined there => NULL, matching
    # DuckDB's native double division-by-zero NULL.
    slope = F.try_divide(n * sxy - sx * sy, n * sxx - sx * sx)
    return s.select(
        "l_returnflag",
        n.cast("long").alias("n_rows"),
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
    ).orderBy("l_returnflag")
