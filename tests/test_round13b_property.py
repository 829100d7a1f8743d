"""Property-based checks for the round-13 classical-test tier
(pipeline19), in the round-12/13 mold: tie-heavy generated corpora,
degenerate cases NOT filtered out of the generators — a constant
column, a single group, a missing outcome class, zero complete weeks,
or a one-day calendar must yield NULL statistics, never an ANSI abort.

Every generated value is a multiple of 0.25, so decimal sums, double
products, the 1e-6 floor-scaling (Brown–Forsythe's z sums), and the
sequential ordered folds are all EXACT in both the engine and the
replay."""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import types as T

from project_final_parquet_spark.operators.pipeline19 import (
    dq_grubbs_extreme_day,
    events_cochran_armitage_hour,
    events_friedman_dow,
    events_kruskal_wallis,
    events_levene_brown_forsythe,
    orders_durbin_watson,
    orders_hodges_lehmann,
)

_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

_ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_orderdate", T.TimestampNTZType()),
        T.StructField("o_totalprice", T.DoubleType()),
    ]
)

_DAY_US = 86_400_000_000
_HOUR_US = 3_600_000_000
_EPOCH = dt.datetime(1970, 1, 1)

# quarter-multiples: exact everywhere (module note)
_val = st.sampled_from([0.5, 1.0, 1.25, 2.0, 7.25, 151.0])
_day = st.integers(min_value=0, max_value=20)
_hour = st.integers(min_value=0, max_value=23)
# 'error' included so the Cochran–Armitage outcome class can be
# present, absent (p̄ = 0), or exhaustive (p̄ = 1) — all legal
_type = st.sampled_from(["click", "error", "view"])

_event_rows = st.lists(
    st.tuples(_day, _hour, _type, _val), min_size=4, max_size=40
)
_order_rows = st.lists(st.tuples(_day, _val), min_size=1, max_size=40)


def _seqsum(vals) -> float:
    acc = 0.0
    for v in vals:
        acc += v
    return acc


def _write_events(spark, d, rows):
    base = dt.datetime(2024, 1, 4)  # epoch day 19726 = 7*2818
    data = [
        (i, base + dt.timedelta(days=day, hours=h), i % 5, t, float(v))
        for i, (day, h, t, v) in enumerate(rows)
    ]
    spark.createDataFrame(data, _EVENTS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{d}/events.parquet")
    return data


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_event_rows)
def test_classical_event_tests_agree_with_bruteforce(
    spark, rows, tmp_path_factory
):
    d = tmp_path_factory.mktemp("prop19e")
    data = _write_events(spark, d, rows)
    sf = str(d)
    vals = [v for *_, v in data]
    types = [t for _, _, _, t, _ in data]
    n = len(data)

    # --- Kruskal–Wallis ---------------------------------------------------
    svals = sorted(vals)
    midrank = {}
    for v in set(vals):
        lo = svals.index(v) + 1
        t_cnt = svals.count(v)
        midrank[v] = lo + (t_cnt - 1) / 2.0
    groups = sorted(set(types))
    total = 0.0
    for g in groups:  # fold order
        gv = [v for t, v in zip(types, vals) if t == g]
        r2 = sum(2 * midrank[v] for v in gv)  # integer-valued
        total += (r2 * r2) / len(gv)
    h = 3.0 * total / (float(n) * (n + 1)) - 3.0 * (n + 1)
    tie3 = sum(
        svals.count(v) ** 3 - svals.count(v) for v in set(vals)
    )
    r = events_kruskal_wallis(spark, sf).collect()[0]
    assert r["n"] == n and r["k_groups"] == len(groups)
    assert abs(r["h_stat"] - h) < 1e-9 * max(1.0, abs(h))
    if n > 1 and tie3 < n**3 - n:
        c = 1.0 - tie3 / (n**3 - n)
        assert abs(r["tie_c"] - c) < 1e-12
        assert abs(r["h_adj"] - h / c) < 1e-9 * max(1.0, abs(h / c))
    else:
        # all values tied (C = 0) or single row (N³−N = 0): NULL
        assert r["h_adj"] is None

    # --- Cochran–Armitage -------------------------------------------------
    hs = [
        ((ts - _EPOCH) // dt.timedelta(microseconds=1)) // _HOUR_US % 24
        for _, ts, _, _, _ in data
    ]
    pos = [1 if t == "error" else 0 for t in types]
    rr, sn = sum(pos), sum(hs)
    sr = sum(h_ * p for h_, p in zip(hs, pos))
    s2n = sum(h_ * h_ for h_ in hs)
    pbar = rr / n
    var = pbar * (1 - pbar) * (s2n - sn * sn / n)
    rc = events_cochran_armitage_hour(spark, sf).collect()[0]
    assert rc["n"] == n and rc["n_pos"] == rr
    if var > 0:
        z = (sr - pbar * sn) / math.sqrt(var)
        assert abs(rc["z_ca"] - z) < 1e-9
    else:
        # p̄ ∈ {0, 1} or a single occupied hour: NULL, not an abort
        assert rc["z_ca"] is None

    # --- Brown–Forsythe ---------------------------------------------------
    total_term = 0.0
    s_int = 0
    q_int = 0
    for g in groups:  # fold order
        sub = sorted(
            [
                (v, i)
                for i, (t, v) in enumerate(zip(types, vals))
                if t == g
            ]
        )
        gv = [v for v, _ in sub]
        med = gv[(len(gv) + 1) // 2 - 1]
        zs = [abs(v - med) for v in gv]
        szi = sum(math.floor(z * 1e6) for z in zs)
        sz2i = sum(math.floor(z * z * 1e6) for z in zs)
        s_int += szi
        q_int += sz2i
        total_term += (szi / 1e6) * (szi / 1e6) / len(gv)
    ssb = total_term - (s_int / 1e6) * (s_int / 1e6) / n
    ssw = q_int / 1e6 - total_term
    rb = events_levene_brown_forsythe(spark, sf).collect()[0]
    assert rb["n"] == n and rb["k_groups"] == len(groups)
    assert abs(rb["ssb"] - ssb) < 1e-9 * max(1.0, abs(ssb))
    assert abs(rb["ssw"] - ssw) < 1e-9 * max(1.0, abs(ssw))
    if len(groups) > 1 and ssw * (len(groups) - 1) != 0.0:
        f = ssb * (n - len(groups)) / (ssw * (len(groups) - 1))
        assert abs(rb["f_bf"] - f) < 1e-9 * max(1.0, abs(f))
    else:
        # k = 1 or within-group constancy (SSW = 0): NULL
        assert rb["f_bf"] is None

    # --- Friedman ---------------------------------------------------------
    daily: dict = {}
    for _, ts, _, _, _ in data:
        dd = ((ts - _EPOCH) // dt.timedelta(microseconds=1)) // _DAY_US
        daily[dd] = daily.get(dd, 0) + 1
    weeks: dict = {}
    for dd, c in daily.items():
        weeks.setdefault(dd // 7, {})[dd % 7] = c
    complete = {w: m for w, m in weeks.items() if len(m) == 7}
    rf = events_friedman_dow(spark, sf).collect()[0]
    assert rf["n_blocks"] == len(complete)
    if complete:
        b = len(complete)
        a4 = 0
        s2 = {j: 0 for j in range(7)}
        for m in complete.values():
            cs = sorted(m.values())
            for j, c in m.items():
                mr2 = 2 * (cs.index(c) + 1) + cs.count(c) - 1
                s2[j] += mr2
                a4 += mr2 * mr2
        dev4 = sum((s2[j] - 8 * b) ** 2 for j in range(7))
        if a4 != 448 * b:
            chi2 = 6.0 * dev4 / float(a4 - 448 * b)
            assert abs(rf["chi2_friedman"] - chi2) < 1e-9
            assert abs(rf["kendall_w"] - chi2 / (6.0 * b)) < 1e-12
        else:
            assert rf["chi2_friedman"] is None
    else:
        assert rf["chi2_friedman"] is None


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_order_rows)
def test_calendar_series_tests_agree_with_bruteforce(
    spark, rows, tmp_path_factory
):
    d = tmp_path_factory.mktemp("prop19o")
    base = dt.datetime(2024, 1, 4)
    data = [
        (i, base + dt.timedelta(days=day), float(v))
        for i, (day, v) in enumerate(rows)
    ]
    spark.createDataFrame(data, _ORDERS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{d}/orders.parquet")
    sf = str(d)
    daily: dict = {}
    for _, ts, v in data:
        dd = ((ts - _EPOCH) // dt.timedelta(microseconds=1)) // _DAY_US
        daily[dd] = daily.get(dd, 0.0) + v  # quarters: exact in double
    ds = sorted(daily)
    y = [daily[dd] for dd in ds]
    n = len(y)

    # --- Grubbs -----------------------------------------------------------
    rg = dq_grubbs_extreme_day(spark, sf).collect()[0]
    assert rg["n_days"] == n
    m = _seqsum(y) / n
    assert rg["mean_rev"] == m
    if n > 1:
        s2 = _seqsum((yy - m) * (yy - m) for yy in y) / (n - 1)
        s = math.sqrt(s2)
        assert rg["std_rev"] == s
        if s > 0:
            g = [abs(yy - m) / s for yy in y]
            best = max(range(n), key=lambda i: (g[i], -i))
            best = min(i for i in range(n) if g[i] == g[best])
            assert rg["g_day"] == ds[best]
            assert rg["g_stat"] == g[best]
        else:
            # constant series: NULL G, earliest day surfaces
            assert rg["g_stat"] is None and rg["g_day"] == ds[0]
    else:
        assert rg["g_stat"] is None

    # --- Durbin–Watson ----------------------------------------------------
    rd = orders_durbin_watson(spark, sf).collect()[0]
    assert rd["n_days"] == n
    sd = sum(ds)
    sd2 = float(sum(dd * dd for dd in ds))
    sy = _seqsum(y)
    sdy = _seqsum(float(dd) * yy for dd, yy in zip(ds, y))
    den = n * sd2 - float(sd) * sd
    if den != 0.0:
        beta = (n * sdy - sd * sy) / den
        alpha = sy / n - beta * (sd / n)
        assert rd["slope_per_day"] == beta
        e = [yy - (alpha + beta * dd) for dd, yy in zip(ds, y)]
        dw_den = _seqsum(ei * ei for ei in e)
        if dw_den != 0.0:
            num = _seqsum(
                (e[t] - e[t - 1]) * (e[t] - e[t - 1])
                for t in range(1, n)
            )
            assert abs(rd["dw_stat"] - num / dw_den) < 1e-12
        else:
            # perfect fit (e.g. n = 2): DW undefined
            assert rd["dw_stat"] is None
    else:
        # single-day calendar: no slope, no DW
        assert rd["slope_per_day"] is None and rd["dw_stat"] is None

    # --- Hodges–Lehmann ---------------------------------------------------
    rh = orders_hodges_lehmann(spark, sf).collect()[0]
    np_ = n * (n + 1) // 2
    assert rh["n_days"] == n and rh["n_pairs"] == np_
    walsh = sorted(
        (y[i] + y[j]) / 2.0 for i in range(n) for j in range(i, n)
    )
    hl = (walsh[(np_ + 1) // 2 - 1] + walsh[(np_ + 2) // 2 - 1]) / 2.0
    assert abs(rh["hl_location"] - hl) < 1e-12 * max(1.0, abs(hl))
