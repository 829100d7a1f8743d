"""Runtime join-input reduction: bloom-style semi-join prefilters.

The 100 TB problem: a shuffle join between a huge fact and a selective
dim shuffles the ENTIRE fact — including the (often vast) majority of
rows whose keys the dim side will never match. Engines solve this with
runtime filters (Spark's own InjectRuntimeFilter / bloom joins, dynamic
partition pruning for partition columns). This Spark build does not
expose ``bloom_filter_agg`` as a SQL function, so the same idea is
expressed relationally:

    coarse key set  = distinct(hash(dim.key) % m)       (tiny: ≤ m rows)
    fact'           = fact SEMI JOIN coarse ON hash(fact.key) % m
    result          = fact' JOIN dim ON key

The coarse set is a one-hash bloom filter with m bits, materialized as
a broadcastable relation instead of a bitmap. Properties:

- NO false negatives: every matching fact row hashes into a bucket the
  dim occupies, so the final join's result is EXACTLY the plain join's
  (tests assert frame equality).
- False positives are removed by the exact join; their only cost is
  riding the shuffle. With |dim keys| = d, the expected surviving
  fraction of non-matching fact rows is ≈ 1 - (1 - 1/m)^d ≤ d/m —
  m = 64·d gives ≲ 1.6%.
- The prefilter itself is map-side: the coarse set broadcasts (≤ m
  64-bit values), the semi-join is a BroadcastHashJoin, and the fact
  scan feeds it directly — the fact is never shuffled until AFTER the
  reduction.

When to use: dim is selective (filters drop most fact keys) but the
join key is NOT the fact's partition column (else dynamic partition
pruning already handles it — see tests/test_plans.py::
test_dynamic_partition_pruning), and the dim is too large to broadcast
whole. When the dim IS broadcastable, a plain broadcast join already
avoids shuffling the fact and needs no prefilter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEFAULT_BUCKETS = 4096


def _coarse_bucket(key: Column, buckets: int) -> Column:
    # pmod: xxhash64 is signed; both sides must bucket identically
    return F.pmod(F.xxhash64(key), F.lit(buckets))


def prefilter_fact_by_dim_keys(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    buckets: int = _DEFAULT_BUCKETS,
) -> DataFrame:
    """Reduce ``fact`` to rows whose ``fact_key`` MIGHT match a
    ``dim_key`` value, via a broadcast coarse-bucket semi-join.

    Returns ``fact`` filtered (same schema). Guaranteed superset of the
    rows a plain inner join on the key would keep — compose with the
    real join afterwards for an exact result.
    """
    coarse = (
        dim.select(_coarse_bucket(F.col(dim_key), buckets).alias("__rf_bucket"))
        .distinct()
    )
    return (
        fact.withColumn(
            "__rf_bucket", _coarse_bucket(F.col(fact_key), buckets)
        )
        .join(F.broadcast(coarse), "__rf_bucket", "left_semi")
        .drop("__rf_bucket")
    )
