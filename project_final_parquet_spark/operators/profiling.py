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
