"""Property-based tests for the equality-delete-vector (DV) lifecycle.

The DV mechanism is a correctness-critical storage feature: a wrong
sidecar or a mis-applied anti-join silently loses or resurrects rows.
These tests drive `delete_where_dv` / `read` / `compact_dv` with
randomized key sets and predicates on a small synthetic table and
assert exact set equality against the relational spec at every stage
— the same "storage layer loses/duplicates nothing" contract the
oracle gate proves for the shipped corpus, here over a randomized
input space.

Hypothesis runs with deterministic examples only (derandomize) so CI
is reproducible; each example stages its own table under tmp_path.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from project_final_parquet_spark.lake import LakeTable

_N = 60  # rows per staged table: small enough for fast examples


def _stage(spark, root):
    table = LakeTable(root)
    df = spark.range(_N).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("grp"),
        (F.col("id") * 13 % 101).alias("v"),
    )
    # two commits so DVs land on a multi-file manifest
    table.commit_append(
        df.filter(F.col("k") < _N // 2),
        stats_cols=("k",),
        num_files=2,
        range_by="k",
    )
    table.commit_append(
        df.filter(F.col("k") >= _N // 2),
        stats_cols=("k",),
        num_files=2,
        range_by="k",
    )
    return table


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    mod=st.integers(min_value=2, max_value=9),
    rem=st.integers(min_value=0, max_value=8),
    lo=st.integers(min_value=0, max_value=_N - 1),
    span=st.integers(min_value=1, max_value=_N),
)
def test_dv_read_matches_relational_spec(spark, tmp_path, mod, rem, lo, span):
    """read() after delete_where_dv == NOT-predicate filter, exactly;
    compact_dv preserves the view and clears every DV pointer."""
    rem = rem % mod
    hi = min(lo + span, _N)
    root = tmp_path / f"dv_{mod}_{rem}_{lo}_{span}"
    table = _stage(spark, root)
    pred = (
        (F.col("k") >= lo) & (F.col("k") < hi) & (F.col("k") % mod == rem)
    )
    v = table.delete_where_dv(
        spark, col="k", lo=lo, hi=hi, predicate=pred, key_col="k"
    )
    expect = {
        (r.k, r.grp, r.v)
        for r in table.read(spark, version=2).filter(~pred).collect()
    }
    got = {(r.k, r.grp, r.v) for r in table.read(spark, version=v).collect()}
    assert got == expect
    # time travel to the pre-delete snapshot is unaffected
    assert table.read(spark, version=2).count() == _N
    # compaction converges to the same view with zero DV pointers
    v2 = table.compact_dv(spark, stats_cols=("k",))
    got2 = {
        (r.k, r.grp, r.v) for r in table.read(spark, version=v2).collect()
    }
    assert got2 == expect
    assert all(e.dv is None for e in table.manifest(v2))
    # no-overlap predicate: version unchanged (metadata no-op)
    assert (
        table.delete_where_dv(
            spark,
            col="k",
            lo=_N + 10,
            hi=_N + 20,
            predicate=F.col("k") > _N + 10,
            key_col="k",
        )
        == v2
    )
