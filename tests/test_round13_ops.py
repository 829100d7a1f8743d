"""Round-13 widening batch: numpy/pandas replays of every new operator
at sf0.001 (independent re-derivations, not plan reuse), plan pins for
the scale-sensitive ones, and a consistency check tying the new index
family to the round-12 Laspeyres."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from project_final_parquet_spark.operators.pipeline17 import (
    orders_laspeyres_price_index,
)
from project_final_parquet_spark.operators.pipeline18 import (
    _COV_TOP,
    embeddings_covariance_audit,
    events_bowley_skewness,
    events_poisson_dispersion,
    orders_mann_kendall_trend,
    orders_paasche_fisher_index,
    orders_runs_test_median,
    q77_group_by_all,
)

SF = "/root/testdata/sf0.001"

_DAY_US = 86_400_000_000
_PERIOD_US = 30 * _DAY_US


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


# --- Mann–Kendall -------------------------------------------------------------


def test_mann_kendall_replay(spark):
    daily = _daily_rev()
    y = daily.to_numpy(np.float64)
    n = len(y)
    s = 0
    for i in range(n):
        for j in range(i + 1, n):
            s += int(y[j] > y[i]) - int(y[j] < y[i])
    ties: dict = {}
    for v in y:
        ties[v] = ties.get(v, 0) + 1
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var_s = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
    r = orders_mann_kendall_trend(spark, SF).collect()[0]
    assert r["n_days"] == n
    assert r["s_stat"] == s
    assert abs(r["var_s"] - var_s) < 1e-6
    if s > 0:
        assert abs(r["z_mk"] - (s - 1) / math.sqrt(var_s)) < 1e-9
    elif s < 0:
        assert abs(r["z_mk"] - (s + 1) / math.sqrt(var_s)) < 1e-9
    else:
        assert r["z_mk"] == 0.0


# --- runs test ------------------------------------------------------------------


def test_runs_test_replay(spark):
    daily = _daily_rev()
    ys = daily.to_numpy(np.float64)
    n = len(ys)
    order = sorted(range(n), key=lambda i: (ys[i], daily.index[i]))
    med = ys[order[(n + 1) // 2 - 1]]
    signs = [1 if v > med else 0 for v in ys if v != med]
    m = len(signs)
    n1 = sum(signs)
    n2 = m - n1
    runs = sum(
        1
        for i, sgn in enumerate(signs)
        if i == 0 or signs[i - 1] != sgn
    )
    r = orders_runs_test_median(spark, SF).collect()[0]
    assert (r["n_classified"], r["n_above"], r["n_below"]) == (m, n1, n2)
    assert r["n_runs"] == runs
    exp = 2 * n1 * n2 / m + 1.0
    assert abs(r["expected_runs"] - exp) < 1e-9
    var = 2 * n1 * n2 * (2 * n1 * n2 - m) / (m * m * (m - 1))
    if var > 0:
        assert abs(r["z_runs"] - (runs - exp) / math.sqrt(var)) < 1e-9
    else:
        assert r["z_runs"] is None


# --- Bowley skewness -------------------------------------------------------------


def test_bowley_replay(spark):
    pdf = _events_pdf()
    rows = {
        r["event_type"]: r
        for r in events_bowley_skewness(spark, SF).collect()
    }
    for t, g in pdf.groupby("event_type"):
        vs = g.sort_values(["value", "event_id"])["value"].to_numpy()
        n = len(vs)
        q1 = vs[(n + 3) // 4 - 1]
        q2 = vs[(n + 1) // 2 - 1]
        q3 = vs[(3 * n + 3) // 4 - 1]
        r = rows[t]
        assert r["n"] == n
        assert (r["q1"], r["median"], r["q3"]) == (q1, q2, q3)
        if q3 != q1:
            assert abs(
                r["bowley_skew"] - (q1 + q3 - 2 * q2) / (q3 - q1)
            ) < 1e-12
            assert -1.0 <= r["bowley_skew"] <= 1.0
        else:
            assert r["bowley_skew"] is None


def test_bowley_no_per_type_row_sort(spark):
    """The only row_number window must partition by (event_type, bin)
    — phase 2 of the selection — never by event_type alone (that
    would be the oracle's naive full-type sort, the skew trap)."""
    plan = events_bowley_skewness(spark, SF)._jdf.queryExecution().executedPlan().toString()
    import re

    for m in re.finditer(r"row_number\(\).*?windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        assert "bin" in spec, f"naive per-type row sort in plan: {spec}"


# --- Poisson dispersion -----------------------------------------------------------


def test_poisson_dispersion_replay(spark):
    pdf = _events_pdf()
    pdf["day"] = pdf["ts_us"] // _DAY_US
    rows = {
        r["event_type"]: r
        for r in events_poisson_dispersion(spark, SF).collect()
    }
    for t, g in pdf.groupby("event_type"):
        x = g.groupby("day").size().to_numpy(np.int64)
        n = len(x)
        s, ss = int(x.sum()), int((x * x).sum())
        mean = s / n
        css = ss - s * s / n
        r = rows[t]
        assert r["n_days"] == n
        assert abs(r["mean_daily"] - mean) < 1e-12
        assert abs(r["chi2_stat"] - css / mean) < 1e-6
        if n > 1:
            disp = css / (n - 1) / mean
            assert abs(r["dispersion_index"] - disp) < 1e-9
        else:
            assert r["dispersion_index"] is None


# --- Paasche / Fisher --------------------------------------------------------------


def test_paasche_fisher_replay_and_laspeyres_consistency(spark):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    period = (
        li["l_shipdate"].astype("datetime64[us]").astype("int64")
        // _PERIOD_US
    )
    pp = (
        li.assign(period=period)
        .groupby(["l_partkey", "period"])
        .agg(
            ep=("l_extendedprice", "sum"), q=("l_quantity", "sum")
        )
        .reset_index()
    )
    pp["price"] = pp["ep"] / pp["q"]
    p0 = pp["period"].min()
    base = pp[pp["period"] == p0].set_index("l_partkey")

    def fsum(vals):
        return sum(math.floor(v * 1e6) for v in vals) / 1e6

    rows = {
        r["period"]: r
        for r in orders_paasche_fisher_index(spark, SF).collect()
    }
    las = {
        r["period"]: r["laspeyres_index"]
        for r in orders_laspeyres_price_index(spark, SF).collect()
    }
    for period_v, g in pp.groupby("period"):
        m = g[g["l_partkey"].isin(base.index)]
        if m.empty:
            continue
        q0 = base.loc[m["l_partkey"], "q"].to_numpy()
        pr0 = base.loc[m["l_partkey"], "price"].to_numpy()
        pr_t = m["price"].to_numpy()
        q_t = m["q"].to_numpy()
        lasp = fsum(pr_t * q0) / fsum(pr0 * q0)
        paas = fsum(pr_t * q_t) / fsum(pr0 * q_t)
        r = rows[int(period_v)]
        assert r["n_parts_matched"] == len(m)
        assert abs(r["laspeyres"] - lasp) < 1e-6
        assert abs(r["paasche"] - paas) < 1e-6
        assert abs(r["fisher"] - math.sqrt(r["laspeyres"] * r["paasche"])) < 1e-12
        # the recomputed Laspeyres must equal the round-12 query's
        assert r["laspeyres"] == las[int(period_v)]


# --- covariance audit ----------------------------------------------------------------


def test_covariance_audit_replay(spark):
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    v = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    n, dims = v.shape
    g = np.zeros((dims, dims), dtype=np.int64)
    for lo in range(0, n, 512):
        blk = v[lo : lo + 512]
        g += (
            np.floor(blk[:, :, None] * blk[:, None, :] * 1e6)
            .astype(np.int64)
            .sum(axis=0)
        )
    s = np.floor(v * 1e9).astype(np.int64).sum(axis=0)
    m = (s.astype(np.float64) / 1e9) / n
    cov = (g.astype(np.float64) / 1e6) / n - np.outer(m, m)
    var = np.diag(cov)
    cand = []
    for i in range(dims):
        for j in range(i + 1, dims):
            den = math.sqrt(var[i] * var[j])
            if den > 0:
                cand.append((i, j, cov[i, j], cov[i, j] / den))
    cand.sort(key=lambda t: (-abs(t[3]), t[0], t[1]))
    want = cand[:_COV_TOP]
    got = embeddings_covariance_audit(spark, SF).collect()
    assert len(got) == len(want)
    for w, r in zip(want, got):
        assert (r["dim_i"], r["dim_j"]) == (w[0], w[1])
        assert abs(r["cov_ij"] - w[2]) < 1e-12
        assert abs(r["corr_ij"] - w[3]) < 1e-12
        assert -1.0 <= r["corr_ij"] <= 1.0


def test_covariance_audit_plan_is_one_pass(spark):
    """The Gram partials materialize ONCE at construction (2144-row
    checkpoint — 9 downstream consumers would otherwise each replay
    the scan + mapInPandas, the HITS rescan trap): the FINAL plan must
    read the checkpointed RDD and carry NO parquet scan, NO
    mapInPandas, and no posexplode/vector self-join (the oracle's
    unnest^2 shape stays oracle-only)."""
    plan = embeddings_covariance_audit(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "embeddings.parquet" not in plan
    assert "MapInPandas" not in plan
    assert "Generate" not in plan  # no explode/posexplode
    assert "ExistingRDD" in plan or "LocalTableScan" in plan


# --- GROUP BY ALL ----------------------------------------------------------------------


def test_group_by_all_replay(spark):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    want = (
        li.groupby(["l_returnflag", "l_linestatus"])
        .agg(n=("l_orderkey", "size"), rev=("l_extendedprice", "sum"))
        .reset_index()
        .sort_values(["l_returnflag", "l_linestatus"])
    )
    got = q77_group_by_all(spark, SF).collect()
    assert len(got) == len(want)
    for r, (_, w) in zip(got, want.iterrows()):
        assert (r["l_returnflag"], r["l_linestatus"]) == (
            w["l_returnflag"],
            w["l_linestatus"],
        )
        assert r["n_rows"] == w["n"]
        assert abs(r["revenue"] - w["rev"]) < 1e-6


# --- degenerate inputs (division-audit discipline, new ops) ---------------------


def test_new_ops_degenerate_constant_series(spark, tmp_path_factory):
    """A constant daily-revenue series: MK gives S = 0 => z = 0.0 with
    var 0; the runs test classifies nothing (every day == median) and
    returns the all-NULL row — neither aborts."""
    import datetime as dt

    from pyspark.sql import types as T

    d = tmp_path_factory.mktemp("p18deg")
    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(days=i), 100.0)
        for i in range(6)
    ]
    spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("o_orderkey", T.LongType()),
                T.StructField("o_orderdate", T.TimestampNTZType()),
                T.StructField("o_totalprice", T.DoubleType()),
            ]
        ),
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    mk = orders_mann_kendall_trend(spark, str(d)).collect()[0]
    assert mk["s_stat"] == 0 and mk["var_s"] == 0.0 and mk["z_mk"] == 0.0
    rt = orders_runs_test_median(spark, str(d)).collect()[0]
    assert rt["n_classified"] == 0
    assert rt["z_runs"] is None


# --- FD violation profile ----------------------------------------------------------


def test_fd_violation_profile_replay(spark):
    from project_final_parquet_spark.operators.pipeline18 import (
        _FDS,
        dq_fd_violation_profile,
    )

    rows = {r["fd"]: r for r in dq_fd_violation_profile(spark, SF).collect()}
    assert len(rows) == len(_FDS)
    for table, lhs, rhs in _FDS:
        pdf = pd.read_parquet(f"{SF}/{table}.parquet")
        k = pdf.groupby(lhs)[rhs].nunique()
        r = rows[f"{table}.{lhs}->{rhs}"]
        assert r["n_keys"] == len(k)
        assert r["n_violating_keys"] == int((k > 1).sum())
        assert r["max_rhs_per_key"] == int(k.max())
    # the hard (key-determined) FDs must hold on clean data
    assert rows["nation.n_nationkey->n_regionkey"]["n_violating_keys"] == 0
    assert rows["orders.o_orderkey->o_custkey"]["n_violating_keys"] == 0
    # the soft source->lang FD is violated in this corpus by design
    assert rows["documents.source->lang"]["n_violating_keys"] > 0


# --- RAKE keyphrases ------------------------------------------------------------------


def test_rake_replay(spark):
    import re

    from project_final_parquet_spark.operators.pipeline18 import (
        _RAKE_MAX_WORDS,
        _RAKE_STOPS,
        _RAKE_TOP,
        text_rake_keyphrases,
    )

    docs = pd.read_parquet(f"{SF}/documents.parquet")["text"]
    pinst = []
    for t in docs:
        t3 = re.sub(rf"\b({_RAKE_STOPS})\b", ".", re.sub(r"[^a-z0-9 ]+", ".", t.lower()))
        for raw in t3.split("."):
            phrase = re.sub(" +", " ", raw).strip()
            if phrase and len(phrase.split(" ")) <= _RAKE_MAX_WORDS:
                pinst.append(phrase)
    freq: dict = {}
    deg: dict = {}
    for p in pinst:
        ws = p.split(" ")
        for w in ws:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(ws)
    score = {w: deg[w] / freq[w] for w in freq}
    n_occ: dict = {}
    for p in pinst:
        n_occ[p] = n_occ.get(p, 0) + 1
    cand = [
        (p, c, len(p.split(" ")), sum(score[w] for w in p.split(" ")))
        for p, c in n_occ.items()
    ]
    cand.sort(key=lambda t: (-t[3], t[0]))
    got = text_rake_keyphrases(spark, SF).collect()
    assert len(got) == min(_RAKE_TOP, len(cand))
    for w, r in zip(cand[:_RAKE_TOP], got):
        assert r["phrase"] == w[0]
        assert r["n_occ"] == w[1]
        assert r["n_words"] == w[2]
        assert abs(r["rake_score"] - w[3]) < 1e-9
