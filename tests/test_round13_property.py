"""Property-based checks for the OLDER rank/stats tiers (VERDICT r12
item 4: the round-12 crash was found by hypothesis, not the oracle —
the driver corpus is too benign, so the r4–r11 statistics siblings get
the same tie-heavy/degenerate treatment the round-12 tier got):

- winsorized stats (exact p5/p95 rank clip) vs a brute-force sort
- quantile normalization ((rank − 0.5)/n) vs brute ranks
- one-way ANOVA across dow groups vs brute SS identities
- CUPED theta/adjusted means vs brute moments
- exact two-sample KS (cross-multiplied ECDF gaps) vs brute ECDFs
- tie-aware Spearman vs brute average-rank Pearson

Degenerate cases are NOT filtered out of the generators (the r12
lesson): single-day corpora (k = 1 dow group, empty pre-period),
constant columns, absent sources — each must yield NULL statistics,
never an ANSI abort.

Every generated value is a multiple of 0.25, so decimal sums, double
sums, products, and the 1e-6 floor-scaling are all EXACT in both the
engine and the replay — assertions compare to tight tolerances without
re-implementing the engines' rounding.
"""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import types as T

from project_final_parquet_spark.operators.events_analytics import (
    events_quantile_normalize,
    events_winsorized_stats,
)
from project_final_parquet_spark.operators.pipeline6 import events_ab_cuped
from project_final_parquet_spark.operators.pipeline8 import events_anova_dow
from project_final_parquet_spark.operators.pipeline16 import (
    _KS_A,
    _KS_B,
    dq_ks_source_drift,
    orders_spearman_price_items,
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

# quarter-multiples: exact in IEEE, exact under DECIMAL(38,10), and
# v*v*1e6 is an integer, so FLOOR-scaling has no boundary ambiguity
_val = st.sampled_from([0.5, 1.0, 1.5, 2.0, 7.25, 151.0])
_day = st.integers(min_value=0, max_value=20)
_type = st.sampled_from(["click", "purchase", "view"])

_event_rows = st.lists(
    st.tuples(_day, st.integers(min_value=1, max_value=4), _type, _val),
    min_size=6,
    max_size=36,
)


def _write_events(spark, d, rows):
    base = dt.datetime(2024, 1, 1)
    data = [
        (i, base + dt.timedelta(days=day, hours=i % 12), int(u), t, float(v))
        for i, (day, u, t, v) in enumerate(rows)
    ]
    spark.createDataFrame(data, _EVENTS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{d}/events.parquet")
    return data


_EPOCH = dt.date(1970, 1, 1)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_event_rows)
def test_event_statistics_agree_with_bruteforce(
    spark, rows, tmp_path_factory
):
    d = tmp_path_factory.mktemp("prop13")
    data = _write_events(spark, d, rows)
    sf = str(d)

    # --- winsorized stats (r4) -------------------------------------------
    by_type: dict = {}
    for i, (_, ts, _, t, v) in enumerate(data):
        by_type.setdefault(t, []).append(v)
    rows_w = {
        r["event_type"]: r
        for r in events_winsorized_stats(spark, sf).collect()
    }
    assert set(rows_w) == set(by_type)
    for t, vs in by_type.items():
        svs = sorted(vs)
        n = len(svs)
        p5 = svs[(5 * n + 99) // 100 - 1]
        p95 = svs[(95 * n + 99) // 100 - 1]
        wv = [p5 if v < p5 else (p95 if v > p95 else v) for v in vs]
        clipped = sum(1 for v in vs if v < p5 or v > p95)
        r = rows_w[t]
        assert r["n"] == n and r["n_clipped"] == clipped
        assert abs(r["winsorized_sum"] - sum(wv)) < 1e-9

    # --- quantile normalize (r4) ------------------------------------------
    ranks: dict = {}
    for t in by_type:
        idx = sorted(
            [
                (v, i)
                for i, (_, _, _, tt, v) in enumerate(data)
                if tt == t
            ]
        )
        for rn, (_, i) in enumerate(idx, start=1):
            ranks[i] = (rn - 0.5) / len(idx)
    got = {
        r["event_id"]: r["qnorm"]
        for r in events_quantile_normalize(spark, sf).collect()
    }
    assert set(got) == set(ranks)
    for i, q in ranks.items():
        assert abs(got[i] - q) < 1e-12

    # --- one-way ANOVA over dow groups (r8) --------------------------------
    daily: dict = {}
    for _, ts, _, _, v in data:
        day = (ts.date() - _EPOCH).days
        daily[day] = daily.get(day, 0.0) + v
    groups: dict = {}
    for day, y in daily.items():
        groups.setdefault(day % 7, []).append(y)
    n = len(daily)
    k = len(groups)
    s = sum(daily.values())
    ss = sum(math.floor(y * y * 1e6) for y in daily.values()) / 1e6
    sb = (
        sum(
            math.floor((sum(g) / len(g)) * sum(g) * 1e6)
            for g in groups.values()
        )
        / 1e6
    )
    ssb = sb - s * (s / n)
    ssw = ss - sb
    ra = events_anova_dow(spark, sf).collect()[0]
    assert (ra["n_days"], ra["k_groups"]) == (n, k)
    assert abs(ra["ss_between"] - ssb) < 1e-6
    assert abs(ra["ss_within"] - ssw) < 1e-6
    if k > 1 and n > k and ssw > 0:
        f = (ssb / (k - 1)) / (ssw / (n - k))
        assert abs(ra["f_stat"] - f) < 1e-6 * max(1.0, abs(f))
    else:
        # single-dow corpus, saturated groups, or zero within-variance:
        # F undefined => NULL, never an ANSI abort
        assert ra["f_stat"] is None

    # --- CUPED (r6) ---------------------------------------------------------
    days = [(ts.date() - _EPOCH).days for _, ts, *_ in data]
    d0, d1 = min(days), max(days)
    mid = d0 + (d1 - d0 + 1) // 2
    per_user: dict = {}
    for _, ts, u, _, v in data:
        day = (ts.date() - _EPOCH).days
        x, y = per_user.setdefault(u, [0.0, 0.0])
        if day < mid:
            per_user[u][0] = x + v
        else:
            per_user[u][1] = y + v
    nu = len(per_user)
    sx = sum(x for x, _ in per_user.values())
    sy = sum(y for _, y in per_user.values())
    sxy = sum(x * y for x, y in per_user.values())
    sxx = sum(x * x for x, _ in per_user.values())
    den = nu * sxx - sx * sx
    rows_c = {r["variant"]: r for r in events_ab_cuped(spark, sf).collect()}
    arms: dict = {}
    for u, (x, y) in per_user.items():
        arms.setdefault("A" if u % 2 == 0 else "B", []).append((x, y))
    assert set(rows_c) == set(arms)
    for variant, xy in arms.items():
        r = rows_c[variant]
        assert r["n_users"] == len(xy)
        assert abs(r["mean_y"] - sum(y for _, y in xy) / len(xy)) < 1e-9
        if den > 0:
            theta = (nu * sxy - sx * sy) / den
            adj = (
                sum(y for _, y in xy) / len(xy)
                - theta
                * (sum(x for x, _ in xy) / len(xy) - sx / nu)
            )
            assert abs(r["theta"] - theta) < 1e-9 * max(1.0, abs(theta))
            assert abs(r["mean_y_cuped"] - adj) < 1e-6
        else:
            # zero-variance covariate (e.g. single-day corpus => empty
            # pre-period): theta undefined => NULL, never an abort
            assert r["theta"] is None and r["mean_y_cuped"] is None


_doc_rows = st.lists(
    st.tuples(
        st.sampled_from([_KS_A, _KS_B, "srcx"]),
        st.integers(min_value=0, max_value=6),  # tiny length domain => ties
    ),
    min_size=4,
    max_size=40,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_doc_rows, prices=st.lists(_val, min_size=3, max_size=12))
def test_ks_and_spearman_agree_with_bruteforce(
    spark, docs, prices, tmp_path_factory
):
    d = tmp_path_factory.mktemp("prop13")

    # --- exact two-sample KS (r11) -----------------------------------------
    spark.createDataFrame(
        [(s, n * 100) for s, n in docs],
        T.StructType(
            [
                T.StructField("source", T.StringType()),
                T.StructField("n_chars", T.LongType()),
            ]
        ),
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    a = sorted(n * 100 for s, n in docs if s == _KS_A)
    b = sorted(n * 100 for s, n in docs if s == _KS_B)
    out = dq_ks_source_drift(spark, str(d)).collect()
    if not a and not b:
        assert out == []  # empty pool: no gap row at all
    else:
        r = out[0]
        assert (r["n1"], r["n2"]) == (len(a), len(b))
        values = sorted(set(a) | set(b))
        best_num, best_v = -1, None
        for v in values:
            c1 = sum(1 for x in a if x <= v)
            c2 = sum(1 for x in b if x <= v)
            num = abs(c1 * len(b) - c2 * len(a))
            if num > best_num:
                best_num, best_v = num, v
        assert r["d_num"] == best_num and r["at_value"] == best_v
        if a and b:
            assert abs(r["ks_stat"] - best_num / (len(a) * len(b))) < 1e-12
        else:
            # absent source: D undefined => NULL, never an abort
            assert r["ks_stat"] is None

    # --- tie-aware Spearman (r11) ------------------------------------------
    orders = [(i + 1, p) for i, p in enumerate(prices)]
    # order i gets (i % 3) line items => tie-heavy counts incl. zeros
    li = [(ok, j) for ok, _ in orders for j in range(ok % 3)]
    spark.createDataFrame(
        orders,
        T.StructType(
            [
                T.StructField("o_orderkey", T.LongType()),
                T.StructField("o_totalprice", T.DoubleType()),
            ]
        ),
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        li or [(None, None)],
        T.StructType(
            [
                T.StructField("l_orderkey", T.LongType()),
                T.StructField("ignore", T.LongType()),
            ]
        ),
    ).where("l_orderkey IS NOT NULL").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{d}/lineitem.parquet")

    def r2(vals):
        out2 = []
        for v in vals:
            smaller = sum(1 for w in vals if w < v)
            ties = sum(1 for w in vals if w == v)
            out2.append(2 * smaller + ties + 1)
        return out2

    xs = [p for _, p in orders]
    ys = [ok % 3 for ok, _ in orders]
    rx, ry = r2(xs), r2(ys)
    n = len(orders)
    sx, sy = sum(rx), sum(ry)
    sxx = sum(v * v for v in rx)
    syy = sum(v * v for v in ry)
    sxy = sum(u * v for u, v in zip(rx, ry))
    num = float(n) * sxy - float(sx) * sy
    den = math.sqrt(float(n) * sxx - float(sx) * sx) * math.sqrt(
        float(n) * syy - float(sy) * sy
    )
    r = orders_spearman_price_items(spark, str(d)).collect()[0]
    assert r["n"] == n
    if den > 0:
        assert abs(r["spearman_rho"] - num / den) < 1e-9
    else:
        # constant price or constant item count: rho undefined => NULL
        assert r["spearman_rho"] is None
