"""Hybrid retrieval (RRF) and MMR diversification: independent replays
and invariants beyond the oracle hash (tests/conftest sf0.001)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from project_final_parquet_spark.registry import all_queries

SF = "/root/testdata/sf0.001"


def test_rrf_scores_replay_from_ranks(spark):
    """rrf_score must equal 1/(60+rank) summed over the non-zero ranks —
    recomputed independently from the output's own rank columns."""
    rows = all_queries()["sim_hybrid_rrf"](spark, SF).collect()
    assert len(rows) == 15
    for r in rows:
        expect = 0.0
        if r.rank_lex > 0:
            expect += 1.0 / (60 + r.rank_lex)
        if r.rank_sem > 0:
            expect += 1.0 / (60 + r.rank_sem)
        assert r.rrf_score == expect  # exact: same IEEE ops
        assert 0 <= r.rank_lex <= 50 and 0 <= r.rank_sem <= 50
        assert r.rank_lex > 0 or r.rank_sem > 0


def test_rrf_dual_list_docs_beat_deep_single_list(spark):
    """A doc present in BOTH shortlists at moderate depth must outrank a
    doc that tops only one list: 2/(60+mid) > 1/61 for mid ≤ 58 — the
    fusion property that makes RRF work."""
    rows = all_queries()["sim_hybrid_rrf"](spark, SF).collect()
    both = [r for r in rows if r.rank_lex > 0 and r.rank_sem > 0]
    solo = [r for r in rows if r.rank_lex == 0 or r.rank_sem == 0]
    if both and solo:
        mid_both = [
            r for r in both if r.rank_lex <= 50 and r.rank_sem <= 50
        ]
        assert max(r.rrf_score for r in mid_both) > max(
            r.rrf_score for r in solo
        ) or min(r.rank_lex + r.rank_sem for r in both) > 100


def test_mmr_greedy_replayed_in_python(spark):
    """Replay the full greedy in driver Python from the raw embeddings
    (left-fold arithmetic, same association) and demand the exact same
    picks and scores."""
    emb = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def norm(a):
        acc = 0.0
        for x in a:
            acc = acc + x * x
        return math.sqrt(acc)

    qv = emb[0]
    nq = norm(qv)
    rel = {
        v: dot(e, qv) / (norm(e) * nq)
        for v, e in emb.items()
        if v != 0
    }
    sl = sorted(rel, key=lambda v: (-rel[v], v))[:24]
    sim = {
        (a, b): dot(emb[a], emb[b]) / (norm(emb[a]) * norm(emb[b]))
        for a in sl
        for b in sl
        if a != b
    }
    picked: list[tuple[int, int, float]] = []
    chosen: list[int] = []
    for step in range(1, 9):
        best = None
        for c in sl:
            if c in chosen:
                continue
            if not chosen:
                score = 0.75 * rel[c]
            else:
                score = 0.75 * rel[c] - 0.25 * max(
                    sim[(c, p)] for p in chosen
                )
            if best is None or score > best[1] or (
                score == best[1] and c < best[0]
            ):
                best = (c, score)
        chosen.append(best[0])
        picked.append((step, best[0], best[1]))

    got = [
        (r.pick_order, r.vec_id, r.mmr_score)
        for r in all_queries()["sim_mmr_diversify"](spark, SF).collect()
    ]
    assert got == picked


def test_mmr_first_pick_is_top_cosine_and_picks_distinct(spark):
    rows = all_queries()["sim_mmr_diversify"](spark, SF).collect()
    assert [r.pick_order for r in rows] == list(range(1, 9))
    assert len({r.vec_id for r in rows}) == 8


def test_pack_length_buckets_invariants(spark):
    """Batch accounting re-derived: n_batches = ceil(n_docs/8), padded ≥
    total, waste = padded - total, and bucket populations partition the
    corpus."""
    rows = all_queries()["pack_length_buckets"](spark, SF).collect()
    n_corpus = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_corpus
    for r in rows:
        assert r.n_batches == -(-r.n_docs // 8)
        assert r.padded_tokens >= r.total_tokens
        assert r.pad_waste == r.padded_tokens - r.total_tokens
        assert r.pad_frac == r.pad_waste / r.padded_tokens


def test_band_curve_monotone_in_bands(spark):
    """For a fixed K=8 signature, more bands (shorter rows) must weakly
    raise both the expected true catch AND the false-candidate load —
    the S-curve tradeoff the report exists to expose."""
    rows = sorted(
        all_queries()["dedup_band_tuning_curve"](spark, SF).collect(),
        key=lambda r: r.n_bands,
    )
    for lo, hi in zip(rows, rows[1:]):
        assert hi.exp_caught_true >= lo.exp_caught_true - 1e-12
        assert hi.exp_caught_false >= lo.exp_caught_false - 1e-12
        assert lo.n_true == hi.n_true and lo.n_below == hi.n_below
    for r in rows:
        assert 0.0 <= r.exp_recall <= 1.0 + 1e-12
        assert r.n_bands * r.rows_per_band == 8


def test_rrf_shortlists_are_takeordered(spark):
    """Both first-stage shortlists compile to TakeOrderedAndProject —
    the scalable top-k shape — not a global sort."""
    plan = (
        all_queries()["sim_hybrid_rrf"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("TakeOrderedAndProject") >= 2
