"""Tests for the fifth LLM-pipeline tranche (operators/pipeline4.py):
incremental dedup, dictionary-encoding profiling, domain reweighting.

Correctness vs DuckDB is the oracle gate's job (all three are
registered with oracles); these tests assert the INVARIANTS and the
plan shapes the docstrings promise.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_final_parquet_spark.plans.audit import physical_plan, plan_facts
from project_final_parquet_spark.registry import all_queries
from project_final_parquet_spark.tables import load

BIG_SF = "/root/testdata/sf0.01"


# --- dedup_incremental -----------------------------------------------------


def test_incremental_counts_partition_the_batch(spark, sf_dir):
    """kept + dup_vs_history + dup_in_batch == n_new per source (every
    batch doc lands in exactly one disposition)."""
    rows = all_queries()["dedup_incremental"](spark, sf_dir).collect()
    assert rows, "batch split selected no docs"
    for r in rows:
        assert (
            r.n_kept + r.n_dup_vs_history + r.n_dup_in_batch == r.n_new
        ), r.asDict()


def test_incremental_batch_fraction_is_about_20pct(spark, sf_dir):
    """The Knuth-hash split takes ~20% of docs and is decorrelated from
    source (more than 4 of the 20 sources appear — the doc_id%5
    residue split degenerately selected exactly 4)."""
    df = all_queries()["dedup_incremental"](spark, sf_dir)
    rows = df.collect()
    n_docs = load(spark, sf_dir, "documents").count()
    n_batch = sum(r.n_new for r in rows)
    assert 0.1 * n_docs <= n_batch <= 0.3 * n_docs
    assert len(rows) > 4, "batch split correlates with source labels"


def test_incremental_no_cartesian_and_single_batch_shuffle(spark):
    """History probe joins on the fingerprint — never a nested-loop —
    and the within-batch window reuses the same fp shuffle."""
    df = all_queries()["dedup_incremental"](spark, BIG_SF)
    f = plan_facts(df)
    assert f.n_nested_loop_joins == 0
    p = physical_plan(df)
    assert "CartesianProduct" not in p


# --- profile_dict_encoding -------------------------------------------------


def test_dict_profile_sizes_consistent(spark, sf_dir):
    rows = {
        r.column_name: r
        for r in all_queries()["profile_dict_encoding"](spark, sf_dir).collect()
    }
    assert set(rows) == {"p_brand", "p_name", "p_type"}
    part_n = load(spark, sf_dir, "part").count()
    for name, r in rows.items():
        assert r.n_values == part_n
        assert 1 <= r.n_distinct <= r.n_values
        # index width covers the dictionary: 2^bits >= n_distinct
        assert 2**r.index_bits >= r.n_distinct
        assert r.index_bits == 1 or 2 ** (r.index_bits - 1) < r.n_distinct
        assert r.use_dict == (r.dict_bytes < r.plain_bytes)
    # low-cardinality brand column must be dict-encodable
    assert rows["p_brand"].use_dict


def test_dict_profile_shuffles_distinct_values_not_rows(spark):
    """Each column profile is a two-stage aggregate: the shuffle carries
    one row per distinct value (partial_count map-side), then a scalar
    rollup — no shuffle of the raw table."""
    p = physical_plan(all_queries()["profile_dict_encoding"](spark, BIG_SF))
    assert "partial_count" in p


# --- sample_domain_reweight ------------------------------------------------


def test_reweight_is_a_distribution(spark, sf_dir):
    rows = all_queries()["sample_domain_reweight"](spark, sf_dir).collect()
    assert len(rows) == 20  # one per source
    total = sum(r.weight for r in rows)
    assert total == pytest.approx(1.0, abs=1e-9)
    assert all(r.weight > 0 for r in rows)


def test_reweight_upweights_longer_domains(spark, sf_dir):
    """weight/share ratio must be monotone in the excess score: a domain
    whose docs are longer than the corpus mean gets more than its
    natural share."""
    rows = all_queries()["sample_domain_reweight"](spark, sf_dir).collect()
    n_total = sum(r.n_docs for r in rows)
    for r in rows:
        share = r.n_docs / n_total
        if r.excess > 1.0:
            assert r.weight > share * 0.999
        elif r.excess < 1.0:
            assert r.weight < share * 1.001


def test_reweight_broadcasts_the_scalars(spark):
    """The global row and the normalizer join in as broadcast singleton
    cross joins — no shuffle of the per-source frame against them."""
    f = plan_facts(all_queries()["sample_domain_reweight"](spark, BIG_SF))
    assert f.n_sortmerge_joins == 0
    assert f.n_shuffled_hash_joins == 0


# --- dq_distribution_drift -------------------------------------------------


def test_drift_shares_sum_to_one(spark, sf_dir):
    rows = all_queries()["dq_distribution_drift"](spark, sf_dir).collect()
    assert sum(r.n_hist for r in rows) + sum(r.n_batch for r in rows) == load(
        spark, sf_dir, "documents"
    ).count()
    assert sum(r.p_hist for r in rows) == pytest.approx(1.0, abs=1e-12)
    assert sum(r.p_batch for r in rows) == pytest.approx(1.0, abs=1e-12)
    for r in rows:
        if r.n_hist > 0:
            assert r.chi2_term is not None and r.chi2_term >= 0


def test_drift_split_matches_incremental_split(spark, sf_dir):
    """Both monitors must agree on what 'the batch' is — same hash,
    same threshold — or the drift check audits a different batch than
    the dedup ingests."""
    drift = all_queries()["dq_distribution_drift"](spark, sf_dir).collect()
    inc = all_queries()["dedup_incremental"](spark, sf_dir).collect()
    assert sum(r.n_batch for r in drift) == sum(r.n_new for r in inc)


# --- profile_join_fanout ---------------------------------------------------


def test_fanout_predicts_actual_join_rows(spark, sf_dir):
    """The histogram's total_rows must equal the REAL join output —
    the orders key is unique so predicted == actual exactly."""
    rows = all_queries()["profile_join_fanout"](spark, sf_dir).collect()
    total = rows[0].total_rows
    assert all(r.total_rows == total for r in rows)
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    actual = li.join(
        orders, li.l_orderkey == orders.o_orderkey, "inner"
    ).count()
    assert total == actual
    # classes partition the output
    assert sum(r.rows_out for r in rows) == total
    # cumulative-from-top is monotone decreasing in fanout order
    cums = [r.cum_rows_from_top for r in rows]
    assert cums == sorted(cums, reverse=True)


def test_fanout_window_runs_on_metadata_scale(spark):
    """The single-partition window input is the fanout-CLASS frame
    (|distinct fanout values| rows), never the key histogram itself:
    formatted plans print top-down, so the Window node must appear
    ABOVE both aggregates (i.e. consume their output), and the class
    frame is tiny even at sf0.1."""
    df = all_queries()["profile_join_fanout"](spark, BIG_SF)
    p = physical_plan(df)
    header = p.split("(1) ")[0]  # the top-down tree sketch
    assert "Window" in header and "HashAggregate" in header
    assert header.index("Window") < header.index("HashAggregate")
    assert df.count() < 100  # class frame is tiny even at sf0.1
