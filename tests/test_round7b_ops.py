"""Round-7 batch-2 operator tests (pipeline10.py): pure-Python
replays with exact equality — including the KM curve's ordered-fold
product, which must be BIT-identical to the replay because both sides
multiply the same doubles in the same order — plus plan pins for the
scale claims (pruned scans, single keyed shuffle for the chained
funnel windows).
"""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd

from project_final_parquet_spark.plans import physical_plan, plan_facts
from project_final_parquet_spark.registry import all_queries

BIG_SF = "/root/testdata/sf0.01"

_DAY_US = 86_400_000_000
_CHURN_WINDOW_DAYS = 90


def _events(sf):
    df = pd.read_parquet(f"{sf}/events.parquet")
    df["ts_us"] = (df["ts"] - pd.Timestamp(0)) // pd.Timedelta(
        microseconds=1
    )
    return df


def _order_day_us(sf):
    o = pd.read_parquet(f"{sf}/orders.parquet")
    o["day"] = (
        (o["o_orderdate"] - pd.Timestamp(0))
        // pd.Timedelta(microseconds=1)
    ) // _DAY_US
    return o


# --- events_survival_km -----------------------------------------------------


def test_survival_km_matches_replay_bitexact(spark, sf_dir):
    o = _order_day_us(sf_dir)
    per = o.groupby("o_custkey")["day"].agg(["min", "max"])
    end_day = per["max"].max()
    lt = pd.DataFrame(
        {
            "dur": (per["max"] - per["min"]) // 7,
            "churned": per["max"] < end_day - (_CHURN_WINDOW_DAYS - 1),
        }
    )
    g = (
        lt.groupby("dur")["churned"]
        .agg(d="sum", n="count")
        .sort_index()
    )
    g["c"] = g["n"] - g["d"]
    # descending cumulative at-risk, then ascending ordered-fold product
    at_risk = g["n"][::-1].cumsum()[::-1]
    surv, expect = 1.0, []
    for dur in g.index:
        d, c, ar = int(g.loc[dur, "d"]), int(g.loc[dur, "c"]), int(
            at_risk.loc[dur]
        )
        factor = 1.0 - float(d) / ar
        surv = surv * factor  # same left-fold order as both engines
        if d > 0:
            expect.append((dur, ar, d, c, factor, surv))
    rows = all_queries()["events_survival_km"](spark, sf_dir).collect()
    got = [
        (
            r.duration_weeks,
            r.n_at_risk,
            r.n_churned,
            r.n_censored,
            r.km_factor,
            r.survival,
        )
        for r in rows
    ]
    assert got == expect  # floats compare bit-exact: same fold order
    # survival is non-increasing and in (0, 1]
    s = [r.survival for r in rows]
    assert all(a >= b for a, b in zip(s, s[1:]))
    assert all(0.0 < x <= 1.0 for x in s)


def test_survival_km_scan_pruned(spark):
    df = all_queries()["events_survival_km"](spark, BIG_SF)
    facts = plan_facts(df)
    # orders scan must read only the two columns the lifetime needs
    assert any(
        "o_custkey" in s and "o_orderdate" in s and "o_totalprice" not in s
        for s in facts.read_schemas
    )


# --- events_cross_correlation -------------------------------------------------


def test_cross_correlation_matches_replay(spark, sf_dir):
    ev = _events(sf_dir)
    ev["day"] = ev["ts_us"] // _DAY_US
    mn, mx = int(ev["day"].min()), int(ev["day"].max())
    x = {d: 0 for d in range(mn, mx + 1)}
    y = dict(x)
    for d, t in ev[["day", "event_type"]].itertuples(index=False):
        if t == "view":
            x[d] += 1
        elif t == "purchase":
            y[d] += 1
    expect = []
    for lag in range(8):
        days = list(range(mn, mx + 1 - lag))
        n = len(days)
        xs = [x[d] for d in days]
        ys = [y[d + lag] for d in days]
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        syy = sum(b * b for b in ys)
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        r = (
            None
            if vx == 0 or vy == 0
            else float(n * sxy - sx * sy)
            / (math.sqrt(float(vx)) * math.sqrt(float(vy)))
        )
        expect.append((lag, n, r))
    rows = all_queries()["events_cross_correlation"](spark, sf_dir).collect()
    got = [(r.lag_days, r.n_days, r.xcorr) for r in rows]
    assert got == expect
    assert all(r.xcorr is None or -1.0 <= r.xcorr <= 1.0 for r in rows)


def test_cross_correlation_scan_pruned(spark):
    df = all_queries()["events_cross_correlation"](spark, BIG_SF)
    facts = plan_facts(df)
    # events scan: ts + event_type only — value/props never read
    assert any(
        "event_type" in s and "value" not in s and "props" not in s
        for s in facts.read_schemas
    )
    assert facts.n_nested_loop_joins <= 2  # lag grid broadcasts only


# --- events_funnel_time_to_convert ---------------------------------------------


def test_funnel_ttc_matches_replay(spark, sf_dir):
    ev = _events(sf_dir)
    delays = defaultdict(list)
    for _, g in ev.groupby("user_id"):
        tv = g.loc[g["event_type"] == "view", "ts_us"].min()
        tc = (
            g.loc[
                (g["event_type"] == "click") & (g["ts_us"] > tv), "ts_us"
            ].min()
            if pd.notna(tv)
            else float("nan")
        )
        tp = (
            g.loc[
                (g["event_type"] == "purchase") & (g["ts_us"] > tc),
                "ts_us",
            ].min()
            if pd.notna(tc)
            else float("nan")
        )
        if pd.notna(tc):
            delays["view_to_click"].append(int(tc - tv))
        if pd.notna(tp):
            delays["click_to_purchase"].append(int(tp - tc))
    expect = []
    for step in sorted(delays):
        ds = sorted(delays[step])
        n = len(ds)
        pct = {p: ds[(p * n + 99) // 100 - 1] for p in (25, 50, 75, 90)}
        mean = float(sum(ds)) / n
        expect.append(
            (step, n, pct[25], pct[50], pct[75], pct[90], mean)
        )
    rows = all_queries()["events_funnel_time_to_convert"](
        spark, sf_dir
    ).collect()
    got = [
        (r.step, r.n_users, r.p25_us, r.p50_us, r.p75_us, r.p90_us, r.mean_us)
        for r in rows
    ]
    assert got == expect
    for r in rows:
        assert r.p25_us <= r.p50_us <= r.p75_us <= r.p90_us


def test_funnel_ttc_single_user_shuffle(spark):
    """The three chained conditional-min windows must share ONE
    user_id hash exchange (the events_funnel contract)."""
    df = all_queries()["events_funnel_time_to_convert"](spark, BIG_SF)
    p = physical_plan(df)
    assert p.count("hashpartitioning(user_id") == 1


# --- text_heaps_law -------------------------------------------------------------


def test_heaps_law_matches_replay(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet").sort_values(
        "doc_id"
    )
    seen, first_idx, idx = set(), {}, 0
    for text in docs["text"]:
        for tok in text.split(" "):
            if tok == "":
                continue
            idx += 1
            if tok not in seen:
                seen.add(tok)
                first_idx[tok] = idx
    total = idx
    checkpoints = [
        1000, 2000, 4000, 8000, 16000, 32000, 64000, 128000,
        256000, 512000, 1024000,
    ]
    expect = [
        (n, sum(1 for fi in first_idx.values() if fi <= n))
        for n in checkpoints
        if n <= total
    ]
    rows = all_queries()["text_heaps_law"](spark, sf_dir).collect()
    got = [(r.n_tokens_seen, r.vocab_size) for r in rows]
    assert got == expect
    # vocabulary growth is monotone non-decreasing and sub-linear
    vs = [v for _, v in got]
    assert all(a <= b for a, b in zip(vs, vs[1:]))
    assert all(v <= n for n, v in got)


def test_heaps_law_scan_pruned(spark):
    df = all_queries()["text_heaps_law"](spark, BIG_SF)
    facts = plan_facts(df)
    assert any(
        "doc_id" in s and "text" in s and "lang" not in s
        for s in facts.read_schemas
    )


# --- graph_local_clustering -----------------------------------------------


def _copurchase_edges(sf):
    li = pd.read_parquet(f"{sf}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    pair_count = defaultdict(int)
    for _, g in li.groupby("l_orderkey"):
        ps = sorted(g["l_partkey"].unique())
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_count[(ps[i], ps[j])] += 1
    return {e for e, c in pair_count.items() if c >= 2}


def test_local_clustering_matches_replay(spark, sf_dir):
    edges = _copurchase_edges(sf_dir)
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    expect = []
    for v in adj:
        d = len(adj[v])
        if d < 2:
            continue
        nb = adj[v]
        t = sum(len(adj[w] & nb) for w in nb) // 2
        expect.append((v, d, t, float(2 * t) / (d * (d - 1))))
    expect.sort(key=lambda r: (-r[3], r[0]))
    expect = expect[:20]
    rows = all_queries()["graph_local_clustering"](spark, sf_dir).collect()
    got = [(r.node_id, r.degree, r.n_triangles, r.coeff) for r in rows]
    assert got == expect
    assert all(0.0 <= c <= 1.0 for _, _, _, c in got)


# --- text_burstiness ---------------------------------------------------------


def test_burstiness_matches_replay(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    n = len(docs)
    per_term = defaultdict(lambda: [0, 0, 0])  # total, n_docs_with, sum_sq
    for text in docs["text"]:
        from collections import Counter

        c = Counter(t for t in text.split(" ") if t != "")
        for tok, k in c.items():
            acc = per_term[tok]
            acc[0] += k
            acc[1] += 1
            acc[2] += k * k
    top = sorted(per_term.items(), key=lambda kv: (-kv[1][0], kv[0]))[:15]
    expect = [
        (
            tok,
            tot,
            ndw,
            float(tot) / n,
            float(n * ssq - tot * tot) / (n * tot),
        )
        for tok, (tot, ndw, ssq) in top
    ]
    rows = all_queries()["text_burstiness"](spark, sf_dir).collect()
    got = [
        (r.token, r.corpus_count, r.n_docs_with, r.mean_per_doc, r.fano)
        for r in rows
    ]
    assert got == expect
    # Fano of a zero-variance (uniform 1-per-doc everywhere) term is
    # (n*t - t^2)/(n*t) = 1 - t/n < 1; clumped terms exceed 1
    assert all(r.fano >= 0 for r in rows)


# --- mm_aspect_bucket ---------------------------------------------------------

_LADDER = [("3:4", 3, 4), ("1:1", 1, 1), ("4:3", 4, 3), ("16:9", 16, 9), ("2:1", 2, 1)]


def test_aspect_bucket_matches_closed_form(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    even = [int(d) for d in docs["doc_id"] if d % 2 == 0]
    agg = defaultdict(lambda: [0, 0, []])
    for d in even:
        w, h = 4 + d % 5, 3 + d % 3
        best = min(
            (abs(w * q - p * h) / q, i, name)
            for i, (name, p, q) in enumerate(_LADDER)
        )[2]
        acc = agg[best]
        acc[0] += 1
        acc[1] += w * h
        acc[2].append(w / h)
    rows = all_queries()["mm_aspect_bucket"](spark, sf_dir).collect()
    assert [r.bucket for r in rows] == sorted(agg)
    for r in rows:
        n, px, ratios = agg[r.bucket]
        assert (r.n_images, r.total_px) == (n, px)
        # DSUM quantizes each element to DECIMAL(38,10): per-element
        # error <= 5e-11, so the replay bound scales with n
        assert abs(r.mean_ratio - sum(ratios) / n) < 5e-11 * n
    assert sum(r.n_images for r in rows) == len(even)


def test_aspect_bucket_is_map_side(spark):
    """Static-ladder argmin must compile to zero pre-aggregate
    exchanges: only the 5-row aggregate + final order shuffle."""
    df = all_queries()["mm_aspect_bucket"](spark, BIG_SF)
    facts = plan_facts(df)
    assert facts.n_joins == 0
    assert facts.n_exchanges <= 2


# --- lake_deletion_vectors ------------------------------------------------


def test_deletion_vectors_rewrite_nothing(spark, sf_dir):
    import json
    import os

    from project_final_parquet_spark.operators.lake_queries import (
        _DV_HI,
        _DV_LO,
        _DV_MOD,
        dv_lake,
    )

    table = dv_lake(spark, sf_dir)
    v2, v3 = table.manifest(2), table.manifest(3)
    # MOR contract: the DV commit lists the SAME data files (no
    # rewrite, no new files) — only dv pointers differ
    assert [e.path for e in v3] == [e.path for e in v2]
    assert all(e.dv is None for e in v2)
    dv_files = [e for e in v3 if e.dv]
    assert dv_files, "the date range must overlap at least one file"
    # stats pruning: files fully outside [lo, hi) carry no DV
    for e in v3:
        lo_s, hi_s = _DV_LO, _DV_HI
        mn, mx = e.stats["o_orderdate"]
        if mn >= hi_s or mx < lo_s:
            assert e.dv is None
    # sidecars are sorted unique keys of the declared column
    for e in dv_files:
        doc = json.loads(open(e.dv).read())
        assert doc["key_col"] == "o_orderkey"
        assert doc["keys"] == sorted(set(doc["keys"]))
    # row accounting: v3 view = v2 view minus exactly the predicate rows
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    ts = orders["o_orderdate"]
    deleted = (
        (ts >= pd.Timestamp(_DV_LO))
        & (ts < pd.Timestamp(_DV_HI))
        & (orders["o_orderkey"] % _DV_MOD == 0)
    ).sum()
    n_v2 = table.read(spark, version=2).count()
    n_v3 = table.read(spark, version=3).count()
    assert n_v2 == len(orders)
    assert n_v3 == len(orders) - int(deleted)
    # time travel to v2 is unaffected by the later DV commit
    assert deleted > 0


def test_deletion_vector_cap_errors(spark, sf_dir, tmp_path):
    import pytest as _pytest

    from project_final_parquet_spark.lake import LakeTable
    from pyspark.sql import functions as F

    table = LakeTable(tmp_path / "dvcap")
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    table.commit_append(df, stats_cols=("k",), num_files=1, range_by="k")
    old_cap = LakeTable.DV_MAX_KEYS
    LakeTable.DV_MAX_KEYS = 10
    try:
        with _pytest.raises(ValueError, match="copy-on-write"):
            table.delete_where_dv(
                spark,
                col="k",
                lo=0,
                hi=1000,
                predicate=F.col("k") >= 0,
                key_col="k",
            )
    finally:
        LakeTable.DV_MAX_KEYS = old_cap


# --- sim_reciprocal_nn ---------------------------------------------------------


def test_reciprocal_nn_matches_replay(spark, sf_dir):
    import numpy as np

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    emb = emb[emb["vec_id"] < 300].sort_values("vec_id")
    ids = emb["vec_id"].to_numpy()
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    sims = m @ m.T / (
        np.linalg.norm(m, axis=1)[:, None] * np.linalg.norm(m, axis=1)[None, :]
    )
    np.fill_diagonal(sims, -2.0)
    nn = {}
    for i, vid in enumerate(ids):
        order = sorted(
            range(len(ids)), key=lambda j: (-sims[i, j], ids[j])
        )
        nn[vid] = ids[order[0]]
    expect_pairs = sorted(
        (a, b) for a, b in nn.items() if a < b and nn[b] == a
    )
    rows = all_queries()["sim_reciprocal_nn"](spark, sf_dir).collect()
    assert [(r.a, r.b) for r in rows] == expect_pairs
    # numpy's BLAS dot differs in summation order from the left fold —
    # cosine agreement is approximate here (the oracle hash is the
    # bit-exact check); reciprocity itself is exact
    for r in rows:
        i = int(np.where(ids == r.a)[0][0])
        j = int(np.where(ids == r.b)[0][0])
        assert abs(r.cosine - sims[i, j]) < 1e-9


# --- text_bigram_surprisal -------------------------------------------------------


def test_bigram_surprisal_matches_replay(spark, sf_dir):
    from collections import Counter

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    per_doc_bgs = {}
    c12, c1 = Counter(), Counter()
    for did, text in docs[["doc_id", "text"]].itertuples(index=False):
        t = text.split(" ")
        bgs = list(zip(t[:-1], t[1:]))
        per_doc_bgs[did] = bgs
        for bgr in bgs:
            c12[bgr] += 1
            c1[bgr[0]] += 1
    expect = []
    for did in sorted(per_doc_bgs):
        bgs = per_doc_bgs[did]
        if not bgs:
            continue
        ssum = sum(
            c1[w1].bit_length() - c12[(w1, w2)].bit_length()
            for w1, w2 in bgs
        )
        expect.append(
            (did, len(bgs), ssum, (100 * ssum) // len(bgs))
        )
    rows = all_queries()["text_bigram_surprisal"](spark, sf_dir).collect()
    got = [
        (r.doc_id, r.n_bigrams, r.surprisal_sum, r.avg_surprisal_x100)
        for r in rows
    ]
    assert got == expect
    assert all(r.surprisal_sum >= 0 for r in rows)


# --- embeddings_effective_rank ------------------------------------------------


def test_effective_rank_matches_replay(spark, sf_dir):
    import numpy as np

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    s1 = 1_000_000_000
    # exact integer Gram replay: G[i,j] = sum_n floor(v_ni*v_nj*S1)
    g = np.zeros((64, 64), dtype=object)
    prod = m[:, :, None] * m[:, None, :]
    fl = np.floor(prod * float(s1)).astype(np.int64)
    g = fl.sum(axis=0, dtype=np.int64)
    trg = int(np.trace(g))
    trg2 = int(sum(int(x) * int(x) for x in g.flatten()))
    er = (float(trg) * float(trg)) / float(trg2)
    rows = all_queries()["embeddings_effective_rank"](
        spark, sf_dir
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.dim, r.n_vectors, r.gram_trace) == (64, len(emb), trg)
    assert r.effective_rank == er
    assert r.isotropy_ratio == er / 64
    # spectrum sanity: 1 <= PR <= dim
    assert 1.0 <= r.effective_rank <= 64.0


# --- orders_cohort_ltv ----------------------------------------------------------


def test_cohort_ltv_invariants_and_replay(spark, sf_dir):
    from decimal import Decimal

    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o["m"] = o["o_orderdate"].dt.year * 12 + o["o_orderdate"].dt.month - 1
    first = o.groupby("o_custkey")["m"].min()
    o["cm"] = o["o_custkey"].map(first)
    o["off"] = o["m"] - o["cm"]
    sizes = first.value_counts()
    rows = all_queries()["orders_cohort_ltv"](spark, sf_dir).collect()
    # exact integer frame: one row per observed (cohort, offset)
    cells = o.groupby(["cm", "off"])
    assert len(rows) == len(cells)
    by_key = {(r.cohort_month, r.month_offset): r for r in rows}
    for (cm, off), grp in cells:
        r = by_key[(int(cm), int(off))]
        assert r.n_orders == len(grp)
        assert r.n_customers == int(sizes[cm])
        # DECIMAL(38,10)-quantized exact revenue
        exp_rev = float(
            sum(
                Decimal(repr(v)).quantize(Decimal("1.0000000000"))
                for v in grp["o_totalprice"]
            )
        )
        assert abs(r.revenue - exp_rev) < 1e-6
    # LTV curve is non-decreasing within each cohort
    from collections import defaultdict as dd

    curves = dd(list)
    for r in sorted(rows, key=lambda r: (r.cohort_month, r.month_offset)):
        curves[r.cohort_month].append(r.cum_ltv_per_user)
    for vs in curves.values():
        assert all(a <= b + 1e-9 for a, b in zip(vs, vs[1:]))


# --- events_new_vs_returning -----------------------------------------------


def test_new_vs_returning_matches_replay(spark, sf_dir):
    ev = _events(sf_dir)
    ev["day"] = ev["ts_us"] // _DAY_US
    ud = ev[["user_id", "day"]].drop_duplicates()
    first = ud.groupby("user_id")["day"].min()
    expect = []
    for day, grp in sorted(ud.groupby("day")):
        new = sum(1 for u in grp["user_id"] if first[u] == day)
        n = len(grp)
        expect.append((day, n, new, n - new, (1_000_000 * new) // n))
    rows = all_queries()["events_new_vs_returning"](spark, sf_dir).collect()
    got = [
        (r.day, r.n_active, r.n_new, r.n_returning, r.new_ppm)
        for r in rows
    ]
    assert got == expect
    # conservation: total new users across days == total users
    assert sum(r.n_new for r in rows) == ud["user_id"].nunique()
    # day 1 is all-new
    assert rows[0].n_returning == 0 and rows[0].new_ppm == 1_000_000


# --- events_interarrival_stats -------------------------------------------------


def test_interarrival_matches_replay(spark, sf_dir):
    ev = _events(sf_dir).sort_values(["user_id", "ts_us", "event_id"])
    gaps = []
    for _, g in ev.groupby("user_id"):
        ts = g["ts_us"].to_numpy()
        gaps.extend(int(b - a) for a, b in zip(ts, ts[1:]))
    gaps.sort()
    n = len(gaps)
    pick = lambda p: gaps[(p * n + 99) // 100 - 1]  # noqa: E731
    rows = all_queries()["events_interarrival_stats"](
        spark, sf_dir
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_gaps, r.p50_us, r.p90_us, r.p99_us, r.max_us) == (
        n,
        pick(50),
        pick(90),
        pick(99),
        gaps[-1],
    )
    assert r.mean_us == float(sum(gaps)) / n
    assert 0 < r.p50_us <= r.p90_us <= r.p99_us <= r.max_us


# --- ml_feature_chi2_screen ------------------------------------------------------


def test_chi2_screen_matches_replay(spark, sf_dir):
    import numpy as np

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    labels = emb["label"].to_numpy()
    uniq = sorted(set(labels))
    chi2 = {}
    npos = {}
    for d in range(64):
        s = (m[:, d] >= 0).astype(int)
        npos[d] = int(s.sum())
        n = len(s)
        total = 0.0
        for lab in uniq:
            for sv in (0, 1):
                o = int(((labels == lab) & (s == sv)).sum())
                rt = int((labels == lab).sum())
                ct = int((s == sv).sum())
                if ct == 0:
                    continue  # absent margin never enters the grid
                e = float(rt) * ct / n
                total += (o - e) * (o - e) / e
        chi2[d] = total
    expect = sorted(chi2, key=lambda d: (-chi2[d], d))[:10]
    rows = all_queries()["ml_feature_chi2_screen"](spark, sf_dir).collect()
    assert [r.dim for r in rows] == expect
    for r in rows:
        assert abs(r.chi2 - chi2[r.dim]) < 1e-7
        assert r.n_pos_sign == npos[r.dim]


# --- events_seasonal_residual_anomaly ----------------------------------------


def test_seasonal_residual_matches_replay(spark, sf_dir):
    import math as _math

    ev = _events(sf_dir)
    ev["week"] = ev["ts_us"] // (_DAY_US * 7)
    ev["dow"] = (ev["ts_us"] // _DAY_US + 3) % 7
    ev["hour"] = (ev["ts_us"] // 3_600_000_000) % 24
    cells = (
        ev.groupby(["week", "dow", "hour"]).size().rename("x").reset_index()
    )
    w0 = int(cells["week"].min())
    base = cells[cells["week"] < w0 + 3]
    stats = {}
    for (dow, hr), g in base.groupby(["dow", "hour"]):
        xs = [int(v) for v in g["x"]]
        stats[(dow, hr)] = (len(xs), sum(xs), sum(v * v for v in xs))
    expect = []
    for week, dow, hr, x in cells[
        cells["week"] >= w0 + 3
    ].itertuples(index=False):
        if (dow, hr) not in stats:
            continue
        nb, s, ss = stats[(dow, hr)]
        var_n2 = nb * ss - s * s
        dev_n = nb * int(x) - s
        if var_n2 > 0 and dev_n * dev_n > 4 * var_n2:
            expect.append(
                (
                    int(week),
                    int(dow),
                    int(hr),
                    int(x),
                    float(s) / nb,
                    float(dev_n) / _math.sqrt(float(var_n2)),
                )
            )
    expect.sort()
    rows = all_queries()["events_seasonal_residual_anomaly"](
        spark, sf_dir
    ).collect()
    got = [
        (r.week, r.dow, r.hour, r.n_events, r.baseline_mean, r.z)
        for r in rows
    ]
    assert got == expect
    # flag rule is |z| > 2 by construction
    assert all(abs(r.z) > 2.0 for r in rows)


# --- sample_hard_negatives ------------------------------------------------


def test_hard_negatives_matches_replay(spark, sf_dir):
    import numpy as np

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    pool = emb[emb["vec_id"] < 1000]
    anchors = emb[emb["vec_id"] < 200]
    pm = np.stack(pool["embedding"].to_numpy()).astype(np.float64)
    pids = pool["vec_id"].to_numpy()
    plabs = pool["label"].to_numpy()
    pn = np.linalg.norm(pm, axis=1)
    expect = []
    for _, a in anchors.iterrows():
        av = np.asarray(a["embedding"], dtype=np.float64)
        sims = pm @ av / (pn * np.linalg.norm(av))
        mask = plabs != a["label"]
        order = sorted(
            np.where(mask)[0], key=lambda j: (-sims[j], pids[j])
        )
        j = order[0]
        expect.append(
            (int(a["vec_id"]), int(a["label"]), int(pids[j]), int(plabs[j]))
        )
    rows = all_queries()["sample_hard_negatives"](spark, sf_dir).collect()
    got = [
        (r.anchor, r.anchor_label, r.negative, r.negative_label)
        for r in rows
    ]
    assert got == expect
    assert all(r.anchor_label != r.negative_label for r in rows)
    assert len(rows) == len(anchors)


# --- lake_dv_compaction ----------------------------------------------------


def test_dv_compaction_lifecycle(spark, sf_dir):
    from project_final_parquet_spark.operators.lake_queries import dvc_lake

    table = dvc_lake(spark, sf_dir)
    v3, v4 = table.manifest(3), table.manifest(4)
    # v3 carries DVs; v4 carries none — the lifecycle closed
    assert any(e.dv for e in v3)
    assert all(e.dv is None for e in v4)
    # only DV-carrying files were rewritten; clean files keep paths
    clean_v3 = {e.path for e in v3 if not e.dv}
    assert clean_v3 <= {e.path for e in v4}
    # rewritten files are rewrites, not new data (incremental skips)
    rewritten = [e for e in v4 if e.added == 4]
    assert rewritten and all(not e.data_change for e in rewritten)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        table.incremental(spark, since_version=3, to_version=4)
    # the compacted read equals the DV read row-for-row
    n_v3, n_v4 = (
        table.read(spark, version=3).count(),
        table.read(spark, version=4).count(),
    )
    assert n_v4 == n_v3
    # v3 manifest rows still count PRE-delete rows (DVs are sidecars);
    # the gap is exactly the deleted-key count
    n_deleted = sum(e.rows for e in v3) - n_v3
    assert n_deleted > 0
    # after compaction the manifest row accounting is physical again
    assert sum(e.rows for e in v4) == n_v4


# --- events_attribution_linear -----------------------------------------------


def test_attribution_linear_conserves_credit(spark, sf_dir):
    ev = _events(sf_dir)
    purchases = ev[ev["event_type"] == "purchase"]
    touches = ev[ev["event_type"] != "purchase"]
    win = 7 * _DAY_US
    credit = defaultdict(float)
    n_touches = defaultdict(int)
    n_pt = defaultdict(int)
    touched_purchases = 0
    by_user = dict(tuple(touches.groupby("user_id")))
    for _, p in purchases.iterrows():
        tu = by_user.get(p["user_id"])
        if tu is None:
            continue
        w = tu[
            (tu["ts_us"] < p["ts_us"]) & (tu["ts_us"] >= p["ts_us"] - win)
        ]
        if len(w) == 0:
            continue
        touched_purchases += 1
        counts = w["event_type"].value_counts()
        for ch, c in counts.items():
            credit[ch] += float(int(c)) / len(w)
            n_touches[ch] += int(c)
            n_pt[ch] += 1
    rows = all_queries()["events_attribution_linear"](
        spark, sf_dir
    ).collect()
    assert sorted(r.channel for r in rows) == sorted(credit)
    for r in rows:
        assert r.n_touches == n_touches[r.channel]
        assert r.n_purchases_touched == n_pt[r.channel]
        assert abs(r.credit - credit[r.channel]) < 1e-6
        assert r.n_purchases == len(purchases)
    # conservation: total credit == purchases with >=1 touch
    assert abs(sum(r.credit for r in rows) - touched_purchases) < 1e-6


# --- text_source_jaccard --------------------------------------------------


def test_source_jaccard_matches_replay(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    vocab = defaultdict(set)
    for src, text in docs[["source", "text"]].itertuples(index=False):
        vocab[src].update(t for t in text.split(" ") if t != "")
    pairs = []
    srcs = sorted(vocab)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            inter = len(vocab[a] & vocab[b])
            if inter == 0:
                continue
            uni = len(vocab[a]) + len(vocab[b]) - inter
            pairs.append(
                (a, b, len(vocab[a]), len(vocab[b]), inter, inter / uni)
            )
    pairs.sort(key=lambda r: (-r[5], r[0], r[1]))
    expect = pairs[:20]
    rows = all_queries()["text_source_jaccard"](spark, sf_dir).collect()
    got = [
        (r.src_a, r.src_b, r.n_a, r.n_b, r.n_common, r.jaccard)
        for r in rows
    ]
    assert got == expect
    assert all(0.0 < r.jaccard <= 1.0 for r in rows)


# --- mm_wav_loudness_gate --------------------------------------------------


def test_wav_loudness_matches_closed_form(spark, sf_dir):
    import math as _math

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    odd = sorted(int(d) for d in docs["doc_id"] if d % 2 == 1)
    expect = []
    for d in odd:
        n = 64 + d % 64
        ss = sum(
            (((d * 31 + i * 17) % 2003) - 1001) ** 2 for i in range(n)
        )
        expect.append(
            (d, n, ss, _math.sqrt(ss / n), ss > 580 * 580 * n)
        )
    rows = all_queries()["mm_wav_loudness_gate"](spark, sf_dir).collect()
    got = [
        (r.doc_id, r.n_samples, r.sum_sq, r.rms, r.kept) for r in rows
    ]
    assert got == expect
    # the gate must actually split the corpus (both outcomes occur)
    kept = [r.kept for r in rows]
    assert any(kept) and not all(kept)


# --- embeddings_class_separation ---------------------------------------------


def test_class_separation_invariants(spark, sf_dir):
    import numpy as np

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    labels = sorted(emb["label"].unique())
    rows = all_queries()["embeddings_class_separation"](
        spark, sf_dir
    ).collect()
    k = len(labels)
    assert len(rows) == k * (k - 1) // 2
    # approximate replay (numpy centroid; DSUM/floor differences are
    # below 1e-9 at this scale — the oracle hash is the exact check)
    cents = {}
    for lab in labels:
        m = np.stack(
            emb.loc[emb["label"] == lab, "embedding"].to_numpy()
        ).astype(np.float64)
        cents[lab] = m.mean(axis=0)
    for r in rows:
        ca, cb = cents[r.label_a], cents[r.label_b]
        cos = float(ca @ cb) / (
            np.linalg.norm(ca) * np.linalg.norm(cb)
        )
        assert abs(r.cos_sim - cos) < 1e-6
        assert abs(r.l2_dist - float(np.linalg.norm(ca - cb))) < 1e-6
        assert -1.0 <= r.cos_sim <= 1.0 and r.l2_dist >= 0


# --- events_holt_linear_forecast ---------------------------------------------


def test_holt_forecast_matches_replay_bitexact(spark, sf_dir):
    ev = _events(sf_dir)
    ev["day"] = ev["ts_us"] // _DAY_US
    series = sorted(
        (int(d), float(n)) for d, n in ev.groupby("day").size().items()
    )
    # literal-faithful replay: Spark parses 0.5/0.3 as exact decimals
    # promoted to the nearest doubles — same as Python's literals
    l, b = series[0][1], 0.0
    expect = [(series[0][0], series[0][1], l, b, l + b)]
    for d, x in series[1:]:
        ln = 0.5 * x + (1 - 0.5) * (l + b)
        bn = 0.3 * (0.5 * x + (1 - 0.5) * (l + b) - l) + (1 - 0.3) * b
        l, b = ln, bn
        expect.append((d, x, l, b, l + b))
    rows = all_queries()["events_holt_linear_forecast"](
        spark, sf_dir
    ).collect()
    got = [
        (r.day, r.n_events, r.level, r.trend, r.forecast_next)
        for r in rows
    ]
    assert got == expect  # bit-exact: same fold order, same literals
    # the smoother tracks the series: level stays within its range
    xs = [x for _, x in series]
    assert all(min(xs) * 0.5 <= r.level <= max(xs) * 1.5 for r in rows)


# --- pipeline_dedup_impact -----------------------------------------------------


def test_dedup_impact_matches_replay(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    surv = docs.groupby("text")["doc_id"].min()
    per = defaultdict(lambda: [0, 0, 0, 0])
    for did, src, text in docs[
        ["doc_id", "source", "text"]
    ].itertuples(index=False):
        ntok = sum(1 for t in text.split(" ") if t != "")
        kept = surv[text] == did
        acc = per[src]
        acc[0] += 1
        acc[1] += 1 if kept else 0
        acc[2] += ntok
        acc[3] += ntok if kept else 0
    expect = [
        (
            src,
            a[0],
            a[1],
            a[2],
            a[3],
            (1_000_000 * (a[0] - a[1])) // a[0],
        )
        for src, a in sorted(per.items())
    ]
    rows = all_queries()["pipeline_dedup_impact"](spark, sf_dir).collect()
    got = [
        (
            r.source,
            r.docs_before,
            r.docs_after,
            r.tokens_before,
            r.tokens_after,
            r.dup_doc_ppm,
        )
        for r in rows
    ]
    assert got == expect
    # global conservation vs dedup_exact: survivors across sources
    # equal the distinct-text count
    assert sum(r.docs_after for r in rows) == docs["text"].nunique()


# --- plan pins for the batch 7-9 scale claims --------------------------------


def test_topk_ops_use_take_ordered(spark):
    """Every bounded top-k in the new batch must compile to
    TakeOrderedAndProject — no global sort materialization."""
    for name in (
        "text_burstiness",
        "text_source_jaccard",
        "graph_local_clustering",
        "ml_feature_chi2_screen",
    ):
        df = all_queries()[name](spark, BIG_SF)
        assert plan_facts(df).has_take_ordered, name


def test_attribution_scan_pruned(spark):
    df = all_queries()["events_attribution_linear"](spark, BIG_SF)
    facts = plan_facts(df)
    # events scans read only id/type/ts — props and value never read
    assert facts.read_schemas and all(
        "props" not in s and "value" not in s for s in facts.read_schemas
    )


def test_effective_rank_scan_pruned(spark):
    df = all_queries()["embeddings_effective_rank"](spark, BIG_SF)
    facts = plan_facts(df)
    # the Gram branch needs vec_id+embedding only; label never read
    assert facts.read_schemas and all(
        "label" not in s for s in facts.read_schemas
    )


def test_loudness_gate_is_shuffle_free(spark):
    """Decode + gate is pipeline-parallel: no exchange before the
    trivially bounded final sort."""
    df = all_queries()["mm_wav_loudness_gate"](spark, BIG_SF)
    facts = plan_facts(df)
    assert facts.n_joins == 0
    assert facts.n_exchanges <= 1  # only the output ORDER BY


# --- lake_bloom_point_lookup -----------------------------------------------


def test_bloom_pruning_actually_skips_files(spark, sf_dir):
    from project_final_parquet_spark.operators.lake_queries import (
        bloom_lake,
    )

    table = bloom_lake(spark, sf_dir)
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    present = int(orders["o_orderkey"].iloc[17])
    df, n_read, n_total = table.read_bloom_pruned(
        spark, col="o_orderkey", value=present
    )
    # superset guarantee: the key's row survives pruning
    assert df.filter(f"o_orderkey = {present}").count() == 1
    # the date-partitioned layout defeats stats; bloom must skip files
    assert n_read < n_total
    # absent key: bloom proves absence in (almost) every file
    absent = int(orders["o_orderkey"].max()) + 987_654
    df2, n_read2, _ = table.read_bloom_pruned(
        spark, col="o_orderkey", value=absent
    )
    assert df2.filter(f"o_orderkey = {absent}").count() == 0
    assert n_read2 <= n_read


# --- events_covisitation_matrix ----------------------------------------------


def test_covisitation_matches_replay(spark):
    import json as _json

    ev = _events(BIG_SF)
    ev = ev[ev["event_type"] == "view"].sort_values(
        ["user_id", "ts_us", "event_id"]
    )
    gap = 30 * 60 * 1_000_000
    sess_items = defaultdict(set)
    for uid, g in ev.groupby("user_id"):
        sid, prev = 0, None
        for ts, props in g[["ts_us", "props"]].itertuples(index=False):
            if prev is None or ts - prev > gap:
                sid += 1
            prev = ts
            item = _json.loads(props).get("k")
            if item is not None:
                sess_items[(uid, sid)].add(str(item))
    pair_count = defaultdict(int)
    for items in sess_items.values():
        s = sorted(items)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                pair_count[(s[i], s[j])] += 1
    expect = sorted(
        ((a, b, n) for (a, b), n in pair_count.items()),
        key=lambda r: (-r[2], r[0], r[1]),
    )[:20]
    rows = all_queries()["events_covisitation_matrix"](
        spark, BIG_SF
    ).collect()
    got = [(r.item_a, r.item_b, r.n_sessions) for r in rows]
    assert got == expect
    assert all(r.item_a < r.item_b for r in rows)


# --- sample_time_split_leakage --------------------------------------------------


def test_time_split_leakage_matches_replay(spark, sf_dir):
    ev = _events(sf_dir)
    ev["day"] = ev["ts_us"] // _DAY_US
    days = sorted(ev["day"].unique())
    cutoff = days[(80 * len(days) + 99) // 100 - 1]
    ev["split"] = ev["day"].map(
        lambda d: "train" if d < cutoff else "test"
    )
    per = {
        s: (len(g), g["user_id"].nunique())
        for s, g in ev.groupby("split")
    }
    both = len(
        set(ev.loc[ev["split"] == "train", "user_id"])
        & set(ev.loc[ev["split"] == "test", "user_id"])
    )
    rows = all_queries()["sample_time_split_leakage"](
        spark, sf_dir
    ).collect()
    got = {
        r.split: (r.n_events, r.n_users, r.n_overlap, r.overlap_ppm)
        for r in rows
    }
    for s in ("train", "test"):
        n_ev, n_u = per[s]
        assert got[s] == (n_ev, n_u, both, (1_000_000 * both) // n_u)
    # every event lands in exactly one split
    assert sum(v[0] for v in got.values()) == len(ev)
