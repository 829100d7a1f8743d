"""Round-13 batch 3 (the classical-test tier): numpy/pandas replays of
every new operator at sf0.001 — independent re-derivations including
the ORDERED-FOLD sequential-sum convention (pipeline19 module note) —
plus degenerate-corpus NULL-contract tests (division-audit rule) and a
plan pin for the Brown–Forsythe two-phase median."""

from __future__ import annotations

import datetime as dt
import math
import re

import numpy as np
import pandas as pd

from pyspark.sql import types as T

from project_final_parquet_spark.operators.pipeline19 import (
    dq_grubbs_extreme_day,
    events_cochran_armitage_hour,
    events_friedman_dow,
    events_kruskal_wallis,
    events_levene_brown_forsythe,
    events_ljung_box,
    orders_durbin_watson,
    orders_hodges_lehmann,
)

SF = "/root/testdata/sf0.001"

_DAY_US = 86_400_000_000
_HOUR_US = 3_600_000_000


def _events_pdf():
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    pdf["ts_us"] = pdf["ts"].astype("datetime64[us]").astype("int64")
    return pdf


def _daily_rev():
    pdf = pd.read_parquet(f"{SF}/orders.parquet")
    day = (
        pdf["o_orderdate"].astype("datetime64[us]").astype("int64")
        // _DAY_US
    )
    return (
        pdf.assign(d=day).groupby("d")["o_totalprice"].sum().sort_index()
    )


def _seqsum(vals) -> float:
    """The ORDERED-FOLD result: a left-to-right Python accumulation
    (identical op order to both engines' folds)."""
    acc = 0.0
    for v in vals:
        acc += v
    return acc


# --- Kruskal–Wallis ----------------------------------------------------------


def test_kruskal_wallis_replay(spark):
    pdf = _events_pdf()
    ranks = pdf["value"].rank(method="average")
    n = len(pdf)
    groups = sorted(pdf["event_type"].unique())
    total = 0.0
    for g in groups:  # the fold order: group keys ascending
        rsum = float(ranks[pdf["event_type"] == g].sum())
        ng = int((pdf["event_type"] == g).sum())
        total += (2.0 * rsum) * (2.0 * rsum) / ng
    h = 3.0 * total / (n * (n + 1.0)) - 3.0 * (n + 1.0)
    counts = pdf["value"].value_counts().to_numpy()
    tie_c = 1.0 - sum(int(t) ** 3 - int(t) for t in counts) / (
        n**3 - n
    )
    r = events_kruskal_wallis(spark, SF).collect()[0]
    assert r["n"] == n and r["k_groups"] == len(groups)
    assert abs(r["h_stat"] - h) < 1e-7 * max(1.0, abs(h))
    assert abs(r["tie_c"] - tie_c) < 1e-12
    assert abs(r["h_adj"] - h / tie_c) < 1e-7 * max(1.0, abs(h / tie_c))


# --- Friedman ----------------------------------------------------------------


def test_friedman_replay(spark):
    pdf = _events_pdf()
    daily = (
        pdf.assign(d=pdf["ts_us"] // _DAY_US)
        .groupby("d")
        .size()
        .rename("c")
        .reset_index()
    )
    daily["w"] = daily["d"] // 7
    daily["dow"] = daily["d"] % 7
    complete = daily.groupby("w").size()
    weeks = complete[complete == 7].index
    blk = daily[daily["w"].isin(weeks)].copy()
    blk["r"] = blk.groupby("w")["c"].rank(method="average")
    b = len(weeks)
    k = 7
    rj = blk.groupby("dow")["r"].sum()
    a = float((blk["r"] ** 2).sum())
    c = b * k * (k + 1) ** 2 / 4.0
    num = float(((rj - b * (k + 1) / 2.0) ** 2).sum())
    r = events_friedman_dow(spark, SF).collect()[0]
    assert r["n_blocks"] == b
    if a == c:
        assert r["chi2_friedman"] is None
    else:
        chi2 = (k - 1) * num / (a - c)
        assert abs(r["chi2_friedman"] - chi2) < 1e-9 * max(1.0, chi2)
        assert abs(r["kendall_w"] - chi2 / (b * (k - 1))) < 1e-12


# --- Cochran–Armitage --------------------------------------------------------


def test_cochran_armitage_replay(spark):
    pdf = _events_pdf()
    h = (pdf["ts_us"] // _HOUR_US) % 24
    pos = (pdf["event_type"] == "error").astype(int)
    n = len(pdf)
    rr = int(pos.sum())
    sn = int(h.sum())
    sr = int((h * pos).sum())
    s2n = int((h * h).sum())
    pbar = rr / n
    num = sr - pbar * sn
    var = pbar * (1 - pbar) * (s2n - sn * sn / n)
    r = events_cochran_armitage_hour(spark, SF).collect()[0]
    assert r["n"] == n and r["n_pos"] == rr
    assert abs(r["pbar"] - pbar) < 1e-15
    if var > 0:
        assert abs(r["z_ca"] - num / math.sqrt(var)) < 1e-9
    else:
        assert r["z_ca"] is None


# --- Grubbs ------------------------------------------------------------------


def test_grubbs_replay(spark):
    daily = _daily_rev()  # sorted by d — the fold order
    y = daily.to_numpy(np.float64)
    n = len(y)
    m = _seqsum(y) / n
    s2 = _seqsum((yy - m) * (yy - m) for yy in y) / (n - 1)
    s = math.sqrt(s2)
    g = np.abs(y - m) / s
    best = int(np.argmax(g))
    # calendar tiebreak: earliest day among exact-equal g
    best = min(i for i in range(n) if g[i] == g[best])
    r = dq_grubbs_extreme_day(spark, SF).collect()[0]
    assert r["n_days"] == n
    assert r["mean_rev"] == m
    assert r["std_rev"] == s
    assert r["g_day"] == daily.index[best]
    assert r["g_value"] == y[best]
    assert r["g_stat"] == abs(y[best] - m) / s


# --- Brown–Forsythe ----------------------------------------------------------


def test_brown_forsythe_replay(spark):
    pdf = _events_pdf()
    n = len(pdf)
    groups = sorted(pdf["event_type"].unique())
    k = len(groups)
    total_term = 0.0
    s_int = 0
    q_int = 0
    for g in groups:  # fold order
        sub = pdf[pdf["event_type"] == g].sort_values(
            ["value", "event_id"]
        )
        vs = sub["value"].to_numpy()
        med = vs[(len(vs) + 1) // 2 - 1]  # lower median
        z = np.abs(sub["value"].to_numpy() - med)
        szi = int(np.floor(z * 1e6).sum())
        sz2i = int(np.floor(z * z * 1e6).sum())
        s_int += szi
        q_int += sz2i
        sz = szi / 1e6
        total_term += sz * sz / len(vs)
    s_tot = s_int / 1e6
    q_tot = q_int / 1e6
    ssb = total_term - s_tot * s_tot / n
    ssw = q_tot - total_term
    r = events_levene_brown_forsythe(spark, SF).collect()[0]
    assert r["n"] == n and r["k_groups"] == k
    assert abs(r["ssb"] - ssb) < 1e-6 * max(1.0, abs(ssb))
    assert abs(r["ssw"] - ssw) < 1e-6 * max(1.0, abs(ssw))
    f = ssb * (n - k) / (ssw * (k - 1))
    assert abs(r["f_bf"] - f) < 1e-6 * max(1.0, abs(f))


def test_brown_forsythe_no_per_type_row_sort(spark):
    """Phase 2's row_number must partition by (g, bin) — never the
    group alone (the full-type sort the two-phase selection avoids)."""
    plan = (
        events_levene_brown_forsythe(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for m in re.finditer(
        r"row_number\(\).*?windowspecdefinition\(([^)]*)\)", plan
    ):
        spec = m.group(1)
        assert "bin" in spec, f"naive per-type row sort in plan: {spec}"


# --- Hodges–Lehmann ----------------------------------------------------------


def test_hodges_lehmann_replay(spark):
    daily = _daily_rev()
    y = daily.to_numpy(np.float64)
    n = len(y)
    walsh = [
        (y[i] + y[j]) / 2.0 for i in range(n) for j in range(i, n)
    ]
    walsh.sort()
    np_ = n * (n + 1) // 2
    m1, m2 = (np_ + 1) // 2 - 1, (np_ + 2) // 2 - 1
    hl = (walsh[m1] + walsh[m2]) / 2.0
    r = orders_hodges_lehmann(spark, SF).collect()[0]
    assert r["n_days"] == n and r["n_pairs"] == np_
    assert abs(r["hl_location"] - hl) < 1e-9 * max(1.0, abs(hl))


# --- Ljung–Box ---------------------------------------------------------------


def test_ljung_box_replay(spark):
    pdf = _events_pdf()
    daily = (
        pdf.assign(d=pdf["ts_us"] // _DAY_US)
        .groupby("d")
        .size()
        .sort_index()
    )
    c = daily.to_numpy(np.float64)
    n = len(c)
    e = c - float(daily.sum()) / n
    s0 = _seqsum(ei * ei for ei in e)
    r = events_ljung_box(spark, SF).collect()[0]
    assert r["n_days"] == n
    q = 0.0
    for k in range(1, 8):
        sk = _seqsum(
            (e[t] * e[t - k] if t >= k else 0.0) for t in range(n)
        )
        rho = sk / s0
        assert abs(r[f"rho{k}"] - rho) < 1e-12
        q += rho * rho / (n - k)
    q *= n * (n + 2.0)
    assert abs(r["q_lb"] - q) < 1e-9 * max(1.0, q)


# --- Durbin–Watson -----------------------------------------------------------


def test_durbin_watson_replay(spark):
    daily = _daily_rev()
    d = daily.index.to_numpy(np.int64)
    y = daily.to_numpy(np.float64)
    n = len(y)
    sd = int(d.sum())
    sd2 = float(sum(int(x) * int(x) for x in d))
    sy = _seqsum(y)
    sdy = _seqsum(float(dd) * yy for dd, yy in zip(d, y))
    beta = (n * sdy - sd * sy) / (n * sd2 - float(sd) * sd)
    alpha = sy / n - beta * (sd / n)
    e = y - (alpha + beta * d)
    num = _seqsum(
        (e[t] - e[t - 1]) * (e[t] - e[t - 1]) for t in range(1, n)
    )
    den = _seqsum(ei * ei for ei in e)
    r = orders_durbin_watson(spark, SF).collect()[0]
    assert r["n_days"] == n
    assert r["slope_per_day"] == beta
    assert abs(r["dw_stat"] - num / den) < 1e-12


# --- degenerate corpora (division-audit rule) --------------------------------


_EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, _EV_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/events.parquet")


def test_degenerate_constant_values_null_not_abort(
    spark, tmp_path_factory
):
    """One distinct value across all rows: KW's tie correction C = 0
    (H/C undefined) and Brown–Forsythe's SSW = 0 — both statistics
    are NULL, neither aborts (the r12-judge crash class)."""
    p = str(tmp_path_factory.mktemp("p19deg1"))
    rows = [
        (
            i,
            dt.datetime(2024, 1, 1, 8) + dt.timedelta(hours=i),
            i % 3,
            ["click", "error", "view"][i % 3],
            7.0,
        )
        for i in range(12)
    ]
    _write_events(spark, p, rows)
    kw = events_kruskal_wallis(spark, p).collect()[0]
    assert kw["tie_c"] == 0.0 and kw["h_adj"] is None
    bf = events_levene_brown_forsythe(spark, p).collect()[0]
    assert bf["ssw"] == 0.0 and bf["f_bf"] is None
    lb = events_ljung_box(spark, p).collect()[0]
    assert lb["q_lb"] is None  # n = 1 day: every lag sum empty


def test_degenerate_single_class_and_group(spark, tmp_path_factory):
    """All events 'error' (Cochran–Armitage p̄ = 1 → zero variance;
    Brown–Forsythe k = 1 → k−1 = 0): NULL statistics, no aborts."""
    p = str(tmp_path_factory.mktemp("p19deg2"))
    rows = [
        (
            i,
            dt.datetime(2024, 1, 1, 3) + dt.timedelta(hours=5 * i),
            i,
            "error",
            float(i),
        )
        for i in range(10)
    ]
    _write_events(spark, p, rows)
    ca = events_cochran_armitage_hour(spark, p).collect()[0]
    assert ca["pbar"] == 1.0 and ca["z_ca"] is None
    bf = events_levene_brown_forsythe(spark, p).collect()[0]
    assert bf["k_groups"] == 1 and bf["f_bf"] is None


def test_degenerate_constant_blocks_friedman(spark, tmp_path_factory):
    """Two complete weeks of CONSTANT daily counts: every block is
    all-tied, 4A = 448b exactly, χ²_F and W are NULL (not an abort)."""
    p = str(tmp_path_factory.mktemp("p19deg3"))
    # 2024-01-04 is epoch day 19726 = 7·2818: week-aligned, so 14
    # consecutive days are exactly 2 complete (d div 7) blocks
    rows = [
        (
            i,
            dt.datetime(2024, 1, 4) + dt.timedelta(days=i),
            i,
            "view",
            1.0,
        )
        for i in range(14)
    ]
    _write_events(spark, p, rows)
    fr = events_friedman_dow(spark, p).collect()[0]
    assert fr["n_blocks"] == 2
    assert fr["chi2_friedman"] is None and fr["kendall_w"] is None


def test_degenerate_short_series_orders(spark, tmp_path_factory):
    """A single-day orders corpus: Grubbs (n−1 = 0), Durbin–Watson
    (slope denominator 0), and Hodges–Lehmann (one Walsh pair — the
    value itself) all answer without aborting."""
    p = str(tmp_path_factory.mktemp("p19deg4"))
    spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 50.0), (2, dt.datetime(2024, 1, 1), 70.0)],
        T.StructType(
            [
                T.StructField("o_orderkey", T.LongType()),
                T.StructField("o_orderdate", T.TimestampNTZType()),
                T.StructField("o_totalprice", T.DoubleType()),
            ]
        ),
    ).coalesce(1).write.mode("overwrite").parquet(f"{p}/orders.parquet")
    gr = dq_grubbs_extreme_day(spark, p).collect()[0]
    assert gr["n_days"] == 1 and gr["g_stat"] is None
    dw = orders_durbin_watson(spark, p).collect()[0]
    assert dw["slope_per_day"] is None and dw["dw_stat"] is None
    hl = orders_hodges_lehmann(spark, p).collect()[0]
    assert hl["n_pairs"] == 1 and hl["hl_location"] == 120.0
