"""Skew-handling operators: key salting.

At 100 TB, hot keys (one user = 1% of all events, one boilerplate doc in
every LSH bucket) stall the task holding them. AQE's skew-join split
handles sort-merge joins automatically; SALTING is the manual lever for
the cases AQE can't touch (broadcast-ineligible skewed build sides,
skewed aggregations with huge per-key state, window partitions).

The construction is semantics-preserving: fact rows get a deterministic
salt in [0, S); the dim side is replicated S× with every salt value; the
join key becomes (key, salt), spreading each hot key over S tasks. The
oracle runs the UNSALTED query — equality proves the rewrite changes
distribution only, never results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import DSUM_SQL, dsum, query
from ..tables import load

_SALTS = 8


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_source: str,
    n_salts: int = _SALTS,
) -> DataFrame:
    """Equi-join with the fact's hot keys spread across ``n_salts``
    partitions. ``salt_source`` is any well-distributed fact column
    (deterministic salt keeps results reproducible; at scale use
    pmod(hash(...), S) on a unique id). NULL salt_source rows fall into
    salt bucket 0 — the rewrite must stay semantics-preserving even when
    the salt column is NULL (pmod(NULL, S) is NULL and would silently
    drop the row from the equi-join otherwise)."""
    salted_fact = fact.withColumn(
        "__salt",
        F.coalesce(
            F.pmod(F.col(salt_source), F.lit(n_salts)).cast("int"), F.lit(0)
        ),
    )
    salted_dim = dim.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(s) for s in range(n_salts)])),
    )
    return salted_fact.join(
        salted_dim,
        (F.col(fact_key) == F.col(dim_key))
        & (salted_fact["__salt"] == salted_dim["__salt"]),
    ).drop("__salt")


@query(
    "skew_salted_join",
    oracle=f"""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_events,
           {DSUM_SQL.format(expr="e.value")} AS sum_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join of (skew-prone) events against customer, aggregated
    per segment. The oracle is the UNSALTED join — identical results
    prove salting is a pure distribution rewrite."""
    ev = load(spark, sf_dir, "events")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(
        ev, cust, fact_key="user_id", dim_key="c_custkey", salt_source="event_id"
    )
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("sum_value"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "skew_salted_distinct",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def skew_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted COUNT(DISTINCT): stage 1 dedups (type, salt,
    user) — the salt comes from event_id, NOT the distinct key, so a hot
    (type, user) pair genuinely spreads over _SALTS partitions — and
    stage 2 merges the per-salt sets with a second distinct before
    counting (a user can appear under several salts)."""
    ev = load(spark, sf_dir, "events").withColumn(
        "__salt", F.pmod(F.col("event_id"), F.lit(_SALTS)).cast("int")
    )
    stage1 = ev.select("event_type", "__salt", "user_id").distinct()
    stage2 = stage1.select("event_type", "user_id").distinct()
    return (
        stage2.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("event_type")
    )
