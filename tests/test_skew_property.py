"""Property-based check: salted_join is a pure distribution rewrite —
its result multiset equals the plain equi-join's on arbitrary inputs,
including NULL join keys, NULL salt sources, duplicate keys on both
sides, and dim keys matching nothing."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import types as T

from project_final_parquet_spark.operators.skew import salted_join

_key = st.one_of(st.none(), st.integers(min_value=0, max_value=3))
_salt_src = st.one_of(st.none(), st.integers(min_value=-5, max_value=5))

_fact_rows = st.lists(
    st.tuples(_key, _salt_src, st.integers(min_value=0, max_value=99)),
    min_size=0,
    max_size=16,
)
_dim_rows = st.lists(
    st.tuples(_key, st.integers(min_value=0, max_value=99)),
    min_size=0,
    max_size=8,
)

_FACT_SCHEMA = T.StructType(
    [
        T.StructField("fk", T.LongType()),
        T.StructField("src", T.LongType()),
        T.StructField("fval", T.LongType()),
    ]
)
_DIM_SCHEMA = T.StructType(
    [
        T.StructField("dk", T.LongType()),
        T.StructField("dval", T.LongType()),
    ]
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(fact_rows=_fact_rows, dim_rows=_dim_rows)
def test_salted_join_equals_plain_join(spark, fact_rows, dim_rows):
    fact = spark.createDataFrame(fact_rows, _FACT_SCHEMA)
    dim = spark.createDataFrame(dim_rows, _DIM_SCHEMA)
    salted = salted_join(fact, dim, "fk", "dk", "src", n_salts=4)
    plain = fact.join(dim, fact["fk"] == dim["dk"])
    cols = ["fk", "src", "fval", "dk", "dval"]
    nulls_first = lambda r: tuple((v is not None, v) for v in r)  # noqa: E731
    got = sorted(map(tuple, salted.select(*cols).collect()), key=nulls_first)
    exp = sorted(map(tuple, plain.select(*cols).collect()), key=nulls_first)
    assert got == exp
