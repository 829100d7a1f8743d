"""Column profiling — the data-quality sweep every ingestion pipeline
runs before training: per-column null counts, exact cardinalities, and
min/max, emitted as one narrow (column, stats) table.

Implementation is a fixed per-column aggregate list unioned together —
each branch is a single pass with map-side partial aggregation, and
Catalyst collapses the repeated scans of the same parquet into cached
file listings; at 100 TB you'd profile per-partition and roll up (the
aggregate forms here are all algebraic, so the rollup is free). Values
are canonicalized to strings with engine-stable formats: integers via
CAST, timestamps via an explicit format string — never raw
double→string (engine-dependent scientific notation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"

# (column, kind) — kind drives the min/max string canonicalization
_COLS = [
    ("o_orderkey", "int"),
    ("o_custkey", "int"),
    ("o_orderstatus", "str"),
    ("o_orderpriority", "str"),
    ("o_orderdate", "ts"),
]


def _branch_sql(col: str, kind: str) -> str:
    if kind == "ts":
        mn = f"strftime(MIN({col}), '{_TS_FMT_DUCK}')"
        mx = f"strftime(MAX({col}), '{_TS_FMT_DUCK}')"
    else:
        mn, mx = f"CAST(MIN({col}) AS VARCHAR)", f"CAST(MAX({col}) AS VARCHAR)"
    return f"""
      SELECT '{col}' AS column_name,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS n_nulls,
             CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
             {mn} AS min_value,
             {mx} AS max_value
      FROM orders
    """


@query(
    "profile_table",
    oracle=" UNION ALL ".join(
        _branch_sql(c, k) for c, k in _COLS
    )
    + " ORDER BY column_name",
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile 5 orders columns: row/null/distinct counts + stringified
    min/max. One aggregate per column, unioned; every branch is
    map-side-combinable."""
    orders = load(spark, sf_dir, "orders")

    def branch(col: str, kind: str) -> DataFrame:
        c = F.col(col)
        if kind == "ts":
            mn = F.date_format(F.min(c), _TS_FMT_SPARK)
            mx = F.date_format(F.max(c), _TS_FMT_SPARK)
        else:
            mn = F.min(c).cast("string")
            mx = F.max(c).cast("string")
        return orders.agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count(c)).alias("n_nulls"),
            F.countDistinct(c).alias("n_distinct"),
            mn.alias("min_value"),
            mx.alias("max_value"),
        ).select(
            F.lit(col).alias("column_name"),
            "n_rows",
            "n_nulls",
            "n_distinct",
            "min_value",
            "max_value",
        )

    out = branch(*_COLS[0])
    for spec in _COLS[1:]:
        out = out.union(branch(*spec))
    return out.orderBy("column_name")


@query(
    "dq_constraint_checks",
    oracle="""
    SELECT 'customer_pk_unique' AS check_name,
           CAST((SELECT COUNT(*) FROM
                 (SELECT c_custkey FROM customer
                  GROUP BY c_custkey HAVING COUNT(*) > 1)) AS BIGINT)
             AS n_violations
    UNION ALL
    SELECT 'lineitem_orderkey_fk',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT)
    UNION ALL
    SELECT 'orders_custkey_fk',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT)
    UNION ALL
    SELECT 'orders_date_not_null',
           CAST((SELECT COUNT(*) FROM orders WHERE o_orderdate IS NULL)
                AS BIGINT)
    UNION ALL
    SELECT 'lineitem_qty_positive',
           CAST((SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0)
                AS BIGINT)
    ORDER BY check_name
    """,
)
def dq_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (dbt-test / Deequ-style): primary-
    key uniqueness, two referential-integrity checks (left-anti joins —
    the distributed form of NOT EXISTS), a not-null check, and a value
    constraint, emitted as one (check, violations) table a pipeline can
    alert on. Each check is a single pass or one anti-join; at 100 TB
    the FK anti-joins broadcast the key side when it fits and the rest
    are map-side predicates with map-side-combined counts."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")

    def one(name: str, n_col) -> DataFrame:
        return n_col.select(
            F.lit(name).alias("check_name"),
            F.col("n").cast("long").alias("n_violations"),
        )

    pk_dupes = (
        customer.groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    li_orphans = lineitem.join(
        orders.select("o_orderkey"),
        lineitem["l_orderkey"] == orders["o_orderkey"],
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("n"))
    o_orphans = orders.join(
        customer.select("c_custkey"),
        orders["o_custkey"] == customer["c_custkey"],
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("n"))
    null_dates = orders.filter(F.col("o_orderdate").isNull()).agg(
        F.count(F.lit(1)).alias("n")
    )
    bad_qty = lineitem.filter(F.col("l_quantity") <= 0).agg(
        F.count(F.lit(1)).alias("n")
    )

    out = (
        one("customer_pk_unique", pk_dupes)
        .union(one("lineitem_orderkey_fk", li_orphans))
        .union(one("orders_custkey_fk", o_orphans))
        .union(one("orders_date_not_null", null_dates))
        .union(one("lineitem_qty_positive", bad_qty))
    )
    return out.orderBy("check_name")


_NSCALE = 1_000_000_000  # squared-norm fixed-point quantum


@query(
    "embeddings_norm_audit",
    oracle=f"""
    WITH q AS (
      SELECT label,
             list_aggregate(list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                               * {_NSCALE}.0) AS BIGINT)), 'sum') AS ssq
      FROM embeddings
    )
    SELECT CAST(label AS INT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(COUNT(CASE WHEN ssq < 1000000 THEN 1 END) AS BIGINT)
             AS n_degenerate,
           CAST(MIN(ssq) AS BIGINT) AS min_ssq,
           CAST(MAX(ssq) AS BIGINT) AS max_ssq,
           CAST(CAST(SUM(ssq) AS BIGINT) // COUNT(*) AS BIGINT) AS avg_ssq
    FROM q
    GROUP BY label
    ORDER BY label
    """,
)
def embeddings_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-quality audit over the embedding column: per ground-truth
    label, the distribution of squared L2 norms (fixed-point 1e-9
    quanta) and a degenerate-vector count (norm² < 1e-3 — zero or
    collapsed embeddings, the classic upstream-encoder failure that
    silently poisons ANN recall). The embedding-table complement of
    profile_table.

    Scale: per-row map-side quantized fold (same integer-distance
    convention as ml_kmeans/sim_ivf), then one label-keyed partial-agg
    shuffle of 5 small rows; min/max/avg on exact BIGINTs, avg as
    integer div — no float aggregation anywhere."""
    emb = load(spark, sf_dir, "embeddings")
    ssq = F.aggregate(
        F.transform(
            "embedding",
            lambda x: F.floor(
                x.cast("double") * x.cast("double") * _NSCALE
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda a, v: a + v,
    )
    q = emb.select("label", ssq.alias("ssq"))
    return (
        q.groupBy(F.col("label").cast("int").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.count(F.when(F.col("ssq") < 1_000_000, 1)).alias(
                "n_degenerate"
            ),
            F.min("ssq").alias("min_ssq"),
            F.max("ssq").alias("max_ssq"),
            F.expr("CAST(SUM(ssq) DIV COUNT(*) AS BIGINT)").alias("avg_ssq"),
        )
        .orderBy("label")
    )


# --- k-anonymity audit ------------------------------------------------------


@query(
    "dq_k_anonymity",
    oracle="""
    WITH cells AS (
      SELECT CAST(c_nationkey AS BIGINT) AS nation,
             c_mktsegment AS segment,
             CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM customer
      GROUP BY 1, 2, 3
    ),
    risk AS (
      SELECT CAST(COALESCE(SUM(CASE WHEN n_rows < 5 THEN n_rows END), 0)
                  AS BIGINT) AS at_risk_rows,
             CAST(SUM(n_rows) AS BIGINT) AS total_rows
      FROM cells
    )
    SELECT c.nation, c.segment, c.bal_bucket, c.n_rows,
           r.at_risk_rows, r.total_rows,
           CAST(r.at_risk_rows AS DOUBLE) / r.total_rows AS at_risk_frac
    FROM cells c CROSS JOIN risk r
    WHERE c.n_rows < 5
    ORDER BY c.nation, c.segment, c.bal_bucket
    """,
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (k=5) over the customer quasi-identifiers
    (nation, market segment, account-balance band): every combination
    matched by fewer than k individuals is a re-identification risk the
    release pipeline must generalize or suppress — the governance check
    that runs before any user-level table leaves the trust boundary.

    Output: each risky cell with its population, plus the global
    exposure (rows in risky cells / total rows) carried on every row so
    the one flat table answers both "which cells" and "how bad". The
    balance band is floor(acctbal/1000) — double division + floor,
    bit-identical both engines.

    Scale: one map-side-combined groupBy on the QI tuple (cell count is
    bounded by the QI domain, not row count); the global risk numbers
    aggregate the CELL table (already tiny) and broadcast back over it.
    Raising generalization (wider bands, region over nation) until the
    risky set empties is the standard remediation loop — each step is
    the same one-shuffle query on a coarser key."""
    cells = (
        load(spark, sf_dir, "customer")
        .groupBy(
            F.col("c_nationkey").cast("long").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias(
                "bal_bucket"
            ),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    risk = cells.agg(
        F.coalesce(
            F.sum(F.when(F.col("n_rows") < 5, F.col("n_rows"))), F.lit(0)
        )
        .cast("long")
        .alias("at_risk_rows"),
        F.sum("n_rows").cast("long").alias("total_rows"),
    )
    return (
        cells.filter(F.col("n_rows") < 5)
        .crossJoin(F.broadcast(risk))
        .select(
            "nation",
            "segment",
            "bal_bucket",
            "n_rows",
            "at_risk_rows",
            "total_rows",
            (
                F.col("at_risk_rows").cast("double") / F.col("total_rows")
            ).alias("at_risk_frac"),
        )
        .orderBy("nation", "segment", "bal_bucket")
    )
