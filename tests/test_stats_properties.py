"""Property tests for the round-9b statistics family: every statistic is
recomputed by an INDEPENDENT single-process numpy reference straight off
the parquet files and compared to the distributed builder's output — a
third implementation besides Spark and the DuckDB oracle, so a shared
misreading of a formula in the paired SQL/DataFrame code cannot
self-confirm. Pure-python identity checks (the CUSUM prefix closed form,
the Poisson-hash determinism) run on adversarial random inputs the
shipped corpus never exercises.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from spark_jdbc_limit_spark.operators import get_query

# Same resolution as conftest's sf_dir fixture, so the numpy replays and
# the builders run against the SAME data the rest of the suite uses when
# SPARK_GRAFT_TEST_SF_DIR overrides the smoke SF (ADVICE r9).
SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/documents.parquet")


def _orders() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/orders.parquet")


def _avg_ranks(vals: np.ndarray) -> np.ndarray:
    """Tie-averaged (fractional) ranks, 1-based — the reference both the
    AUC and Spearman entries' doubled-integer form must reproduce."""
    order = np.argsort(vals, kind="mergesort")
    ranks = np.empty(len(vals), dtype=float)
    sv = vals[order]
    i = 0
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2 + 1
        i = j + 1
    return ranks


def test_auc_matches_numpy_rank_sum(spark):
    d = _docs()
    score = d["n_chars"].to_numpy()
    pos = (d["lang"] == "en").to_numpy()
    r = _avg_ranks(score)
    n_pos, n_neg = int(pos.sum()), int((~pos).sum())
    u = r[pos].sum() - n_pos * (n_pos + 1) / 2
    want_auc = u / (n_pos * n_neg)
    row = get_query("eval_auc_rank_sum").builder(spark, SF).collect()[0]
    assert row.n_pos == n_pos and row.n_neg == n_neg
    assert row.u_times_two == int(round(2 * u))
    assert abs(row.auc - want_auc) < 1.1e-6


def test_spearman_matches_numpy(spark):
    o = _orders()
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    rev = (
        (o["o_totalprice"].astype("float64").round(2) * 100)
        .round()
        .astype("int64")
        .groupby(o["o_custkey"])
        .sum()
    )
    bal = cust.set_index("c_custkey")["c_acctbal"]
    j = pd.DataFrame({"rev": rev}).join(bal.rename("bal"), how="inner")
    rx = _avg_ranks((j["bal"].round(2) * 100).round().astype("int64").to_numpy())
    ry = _avg_ranks(j["rev"].to_numpy())
    want = np.corrcoef(rx, ry)[0, 1]
    row = get_query("agg_spearman_rank_correlation").builder(spark, SF).collect()[0]
    assert row.n_customers == len(j)
    assert abs(row.spearman_rho - want) < 1.1e-6


def test_gini_matches_numpy(spark):
    o = _orders()
    cents = (
        (o["o_totalprice"].astype("float64"))
        .groupby(o["o_custkey"])
        .sum()
        .round(2)
        * 100
    ).round().astype("int64").to_numpy()
    x = np.sort(cents)
    n = len(x)
    i = np.arange(1, n + 1, dtype=np.int64)
    want = (2 * (i * x).sum() - (n + 1) * x.sum()) / (n * x.sum())
    k = n // 10
    want_share = x[n - k :].sum() / x.sum()
    row = get_query("customer_gini_revenue").builder(spark, SF).collect()[0]
    assert row.n_customers == n
    assert abs(row.gini - want) < 1.1e-6
    assert abs(row.top_decile_share - want_share) < 1.1e-6


def test_kappa_matches_numpy(spark):
    d = _docs()
    a = (d["n_chars"] >= 200).to_numpy()
    b = (d["text"].str.split(" ").str.len() >= 30).to_numpy()
    n = len(d)
    po = (a == b).mean()
    pe = (a.mean() * b.mean()) + ((1 - a.mean()) * (1 - b.mean()))
    want = (po - pe) / (1 - pe)
    row = get_query("eval_cohen_kappa_raters").builder(spark, SF).collect()[0]
    assert row.n_docs == n and row.n_agree == int((a == b).sum())
    assert abs(row.kappa - want) < 1.1e-6


def test_chi_square_matches_numpy(spark):
    o = _orders()
    tab = pd.crosstab(o["o_orderpriority"], o["o_orderstatus"]).to_numpy()
    exp = np.outer(tab.sum(1), tab.sum(0)) / tab.sum()
    want = ((tab - exp) ** 2 / exp).sum()
    rows = get_query("dq_chi_square_independence").builder(spark, SF).collect()
    assert all(abs(r.chi2_stat - want) < 1e-3 for r in rows)
    assert all(r.dof == (tab.shape[0] - 1) * (tab.shape[1] - 1) for r in rows)


def test_ols_matches_numpy_lstsq(spark):
    o = _orders()
    x1 = pd.to_datetime(o["o_orderdate"]).dt.month.to_numpy(dtype=float)
    x2 = (o["o_orderpriority"] == "1-URGENT").to_numpy(dtype=float)
    y = o["o_totalprice"].round(2).to_numpy(dtype=float)
    X = np.column_stack([np.ones_like(x1), x1, x2])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    r2 = 1 - (resid**2).sum() / ((y - y.mean()) ** 2).sum()
    row = get_query("orders_ols_normal_equations").builder(spark, SF).collect()[0]
    # Cramer's rule vs lstsq: same solution up to float conditioning;
    # magnitudes here are ~1e5, so 1e-3 absolute is a tight bound.
    assert abs(row.beta_intercept - beta[0]) < 1e-3
    assert abs(row.beta_month - beta[1]) < 1e-3
    assert abs(row.beta_urgent - beta[2]) < 1e-3
    assert abs(row.r_squared - r2) < 1e-6


def test_poisson_bootstrap_matches_numpy_replay(spark):
    from spark_jdbc_limit_spark.operators.stats import (
        BOOT_B,
        BOOT_M1,
        BOOT_M2,
        BOOT_MOD,
        BOOT_T,
    )

    o = _orders()
    keys = o["o_orderkey"].to_numpy(dtype=np.int64)
    cents = (o["o_totalprice"].round(2) * 100).round().astype("int64").to_numpy()
    means = []
    for b in range(BOOT_B):
        h1 = (keys * BOOT_B + b) % BOOT_MOD * BOOT_M1 % BOOT_MOD
        u = (np.bitwise_xor(h1, h1 // 32768) * BOOT_M2) % BOOT_MOD
        cnt = np.searchsorted(np.asarray(BOOT_T), u, side="right")
        means.append((cnt * cents).sum() / (100.0 * cnt.sum()))
    means = np.array(means)
    srt = np.sort(means)
    rows = get_query("agg_poisson_bootstrap_ci").builder(spark, SF).collect()
    got = {r.replicate: r for r in rows}
    for b in range(BOOT_B):
        assert abs(got[b].boot_mean - means[b]) < 1.1e-4
    assert abs(rows[0].ci_lo - srt[1]) < 1.1e-4
    assert abs(rows[0].ci_hi - srt[BOOT_B - 2]) < 1.1e-4
    # the pure-python determinism property: identical keys+replicate
    # always draw identical counts (no hidden global state anywhere)
    h1 = (keys * BOOT_B + 3) % BOOT_MOD * BOOT_M1 % BOOT_MOD
    u = (np.bitwise_xor(h1, h1 // 32768) * BOOT_M2) % BOOT_MOD
    assert (u >= 0).all() and (u < BOOT_MOD).all()


def test_cusum_closed_form_equals_recursion():
    """The identity the CUSUM entry's windowed formulation relies on:
    S_t = max(0, S_{t-1} + z_t) == P_t - min(0, min_{j<=t} P_j) for ANY
    real series — checked on adversarial random walks."""
    rng = np.random.default_rng(11)
    for trial in range(50):
        z = rng.normal(scale=rng.uniform(0.1, 5), size=rng.integers(1, 300))
        s, rec = 0.0, []
        for x in z:
            s = max(0.0, s + x)
            rec.append(s)
        p = np.cumsum(z)
        closed = p - np.minimum(np.minimum.accumulate(p), 0.0)
        assert np.allclose(rec, closed, atol=1e-12), f"trial {trial}"


def test_cusum_entry_matches_recursion_replay(spark):
    rows = get_query("drift_cusum_daily_revenue").builder(spark, SF).collect()
    rows = sorted(rows, key=lambda r: r.day)
    rev = np.array([r.revenue for r in rows])
    mu, sig = rev.mean(), rev.std()  # population sigma, as the entry defines
    for z, attr in ((rev - mu) / sig - 0.5, "cusum_up"), (
        -((rev - mu) / sig) - 0.5,
        "cusum_down",
    ):
        s, rec = 0.0, []
        for x in z:
            s = max(0.0, s + x)
            rec.append(s)
        got = np.array([getattr(r, attr) for r in rows])
        assert np.allclose(got, rec, atol=2e-4), attr


def test_acf_matches_numpy(spark):
    o = _orders()
    daily = (
        (o["o_totalprice"].round(2) * 100)
        .round()
        .astype("int64")
        .groupby(pd.to_datetime(o["o_orderdate"]).dt.normalize())
        .sum()
        .sort_index()
    )
    idx = (daily.index - pd.Timestamp("1970-01-01")).days.to_numpy()
    val = daily.to_numpy(dtype=float)
    series = dict(zip(idx, val))
    rows = get_query("agg_autocorrelation_seasonal_lags").builder(spark, SF).collect()
    for r in rows:
        xs, ys = [], []
        for d, v in series.items():
            if d + r.lag in series:
                xs.append(v)
                ys.append(series[d + r.lag])
        want = np.corrcoef(xs, ys)[0, 1]
        assert r.n_pairs == len(xs)
        assert abs(r.acf - want) < 1.1e-6, f"lag {r.lag}"


def test_quantile_normalization_is_rank_preserving_and_onto(spark):
    """Structural properties of the calibration: within a source the
    normalized value is non-decreasing in the original value, and every
    normalized value is an actually-occurring global value."""
    pdf = (
        get_query("pipeline_quantile_normalize_sources")
        .builder(spark, SF)
        .toPandas()
    )
    global_vals = set(_docs()["n_chars"].tolist())
    assert set(pdf["norm_chars"]).issubset(global_vals)
    for _, grp in pdf.groupby("source"):
        g = grp.sort_values("n_chars")
        assert (g["norm_chars"].diff().dropna() >= 0).all()


def test_kaplan_meier_matches_numpy_product_limit(spark):
    o = _orders()
    dt = pd.to_datetime(o["o_orderdate"]).dt.normalize()
    g = pd.DataFrame({"k": o["o_custkey"], "d": dt}).groupby("k")["d"]
    last, first = g.max(), g.min()
    horizon = dt.max()
    dur = (last - first).dt.days.to_numpy()
    churned = (last <= horizon - pd.Timedelta(days=90)).to_numpy()
    times = np.sort(np.unique(dur))
    surv, s = {}, 1.0
    for t in times:
        n_risk = int((dur >= t).sum())
        d = int(((dur == t) & churned).sum())
        s *= 1.0 - d / n_risk
        surv[t] = (n_risk, d, int(((dur == t) & ~churned).sum()), s)
    rows = get_query("customer_survival_kaplan_meier").builder(spark, SF).collect()
    assert len(rows) == len(times)
    for r in rows:
        n_risk, d, c, s = surv[r.duration_days]
        assert (r.n_at_risk, r.n_churned, r.n_censored) == (n_risk, d, c)
        assert abs(r.survival - s) < 1.1e-6, r.duration_days


def test_psi_matches_numpy(spark):
    d = _docs()
    ref = d[d["doc_id"] % 2 == 0]["n_chars"].to_numpy()
    cur = d[d["doc_id"] % 2 == 1]["n_chars"].to_numpy()
    mn, mx = int(ref.min()), int(ref.max())

    def bucket(v):
        v = np.clip(v, mn, mx)
        return np.minimum(9, (v - mn) * 10 // (mx - mn + 1))

    cr = np.bincount(bucket(ref), minlength=10)[:10]
    cc = np.bincount(bucket(cur), minlength=10)[:10]
    pr = (cr + 0.5) / (len(ref) + 5.0)
    pc = (cc + 0.5) / (len(cur) + 5.0)
    want = ((pc - pr) * np.log(pc / pr)).sum()
    rows = get_query("drift_psi_snapshot_halves").builder(spark, SF).collect()
    got = {r.bucket: r for r in rows}
    for b in range(10):
        assert (got[b].cnt_ref, got[b].cnt_cur) == (int(cr[b]), int(cc[b]))
    assert abs(rows[0].psi_total - want) < 1.1e-6


def test_ks_matches_numpy(spark):
    d = _docs()
    a = np.sort(d[d["doc_id"] % 2 == 0]["n_chars"].to_numpy())
    b = np.sort(d[d["doc_id"] % 2 == 1]["n_chars"].to_numpy())
    vals = np.unique(np.concatenate([a, b]))
    ecdf_a = np.searchsorted(a, vals, side="right") / len(a)
    ecdf_b = np.searchsorted(b, vals, side="right") / len(b)
    want = np.abs(ecdf_a - ecdf_b).max()
    row = get_query("drift_ks_two_sample").builder(spark, SF).collect()[0]
    assert (row.n_a, row.n_b) == (len(a), len(b))
    assert abs(row.d_stat - want) < 1.1e-6


def test_js_divergence_matches_numpy(spark):
    d = _docs()
    langs = sorted(d["lang"].unique())
    ce = d[d["doc_id"] % 2 == 0]["lang"].value_counts().reindex(langs).fillna(0)
    co = d[d["doc_id"] % 2 == 1]["lang"].value_counts().reindex(langs).fillna(0)
    L = len(langs)
    p = (ce.to_numpy() + 0.5) / (ce.sum() + 0.5 * L)
    q = (co.to_numpy() + 0.5) / (co.sum() + 0.5 * L)
    m = (p + q) / 2
    want = 0.5 * (p * np.log(p / m)).sum() + 0.5 * (q * np.log(q / m)).sum()
    rows = get_query("drift_js_divergence_lang").builder(spark, SF).collect()
    assert abs(rows[0].js_total - want) < 1.1e-8
    assert want <= np.log(2) + 1e-12  # the in-query bound, independently


def test_calibration_bins_match_numpy(spark):
    d = _docs()
    v = d["n_chars"].to_numpy()
    pos = (d["lang"] == "en").to_numpy()
    mn, mx = int(v.min()), int(v.max())
    b = np.minimum(9, (np.clip(v, mn, mx) - mn) * 10 // (mx - mn + 1))
    rows = get_query("eval_calibration_bins").builder(spark, SF).collect()
    base = pos.mean()
    for r in rows:
        sel = b == r.bin
        assert r.n == int(sel.sum()) and r.n_pos == int(pos[sel].sum())
        assert abs(r.pos_rate - pos[sel].mean()) < 1.1e-6
        assert abs(r.base_rate - base) < 1.1e-6


def test_effective_source_count_matches_numpy(spark):
    d = _docs()
    c = d["source"].value_counts().to_numpy(dtype=float)
    p = c / c.sum()
    h = -(p * np.log(p)).sum()
    row = get_query("mix_effective_source_count").builder(spark, SF).collect()[0]
    assert row.n_sources == len(c)
    assert abs(row.entropy_nats - h) < 1.1e-8
    assert abs(row.effective_sources - np.exp(h)) < 1.1e-6
    assert row.within_count_bound


def test_power_analysis_matches_numpy(spark):
    from spark_jdbc_limit_spark.operators.windowed_events import (
        AB_CONV_MIN_VALUE,
        POWER_MDE_REL,
        POWER_Z_ALPHA,
        POWER_Z_BETA,
    )

    ev = pd.read_parquet(f"{SF}/events.parquet")
    ctl = ev[ev["user_id"] % 2 == 0]
    conv = (
        ctl[ctl["event_type"] == "purchase"].groupby("user_id")["value"].max()
        > AB_CONV_MIN_VALUE
    )
    n = ctl["user_id"].nunique()
    c = int(conv.sum())
    p1 = c / n
    p2 = p1 * (1 + POWER_MDE_REL)
    pbar = (p1 + p2) / 2
    num = POWER_Z_ALPHA * np.sqrt(2 * pbar * (1 - pbar)) + POWER_Z_BETA * np.sqrt(
        p1 * (1 - p1) + p2 * (1 - p2)
    )
    want = int(np.ceil(num * num / (p2 - p1) ** 2))
    row = get_query("events_ab_power_analysis").builder(spark, SF).collect()[0]
    assert (row.n_control, row.c_control) == (n, c)
    assert row.n_required_per_arm == want
    assert row.currently_powered == (n >= want)


def test_empirical_bayes_shrinkage_matches_numpy(spark):
    d = _docs()
    g = d.groupby("source")["n_chars"]
    n = g.size().sort_index()
    c = g.apply(lambda s: int((s >= 200).sum())).sort_index()
    rate = c / n
    m, v = rate.mean(), rate.var(ddof=0)
    k = m * (1 - m) / v - 1
    shrunk = (c + m * k) / (n + k)
    rows = get_query("mix_empirical_bayes_shrinkage").builder(spark, SF).collect()
    for r in rows:
        assert (r.n, r.c) == (int(n[r.source]), int(c[r.source]))
        assert abs(r.shrunk_rate - shrunk[r.source]) < 1.1e-6
        assert abs(r.prior_strength - k) < 1.1e-4
        assert r.pulled_toward_prior
    # contraction is strict for any finite k > 0 unless raw == m exactly
    assert k > 0


def _customer() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/customer.parquet")


def _cents(series: pd.Series) -> np.ndarray:
    # the builders' decimal-cast cents: round the double to 2dp first
    return (series.astype("float64").round(2) * 100).round().astype("int64").to_numpy()


def test_welch_ttest_matches_scipy_formula(spark):
    c = _customer()
    a = _cents(c.loc[c["c_mktsegment"] == "BUILDING", "c_acctbal"]).astype(float)
    b = _cents(c.loc[c["c_mktsegment"] == "FURNITURE", "c_acctbal"]).astype(float)
    na, nb = len(a), len(b)
    ma, mb = a.mean(), b.mean()
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / na + vb / nb
    want_t = (ma - mb) / np.sqrt(se2)
    want_df = se2 * se2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    row = get_query("stats_welch_ttest_segments").builder(spark, SF).collect()[0]
    assert row.n_a == na and row.n_b == nb
    assert abs(row.mean_bal_a - ma / 100.0) < 1.1e-4
    assert abs(row.t_stat - want_t) < 1.1e-6
    assert abs(row.df_welch - want_df) < 1.1e-2
    assert row.significant == (abs(row.t_stat) > 1.96)


def test_anova_matches_numpy_formula(spark):
    c = _customer()
    groups = {
        seg: _cents(g["c_acctbal"]).astype(float)
        for seg, g in c.groupby("c_mktsegment")
    }
    nn = sum(len(g) for g in groups.values())
    k = len(groups)
    gm = sum(g.sum() for g in groups.values()) / nn
    ssb = sum(len(g) * (g.mean() - gm) ** 2 for g in groups.values())
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups.values())
    want_f = (ssb / (k - 1)) / (ssw / (nn - k))
    rows = get_query("stats_anova_oneway_segments").builder(spark, SF).collect()
    assert len(rows) == k
    for row in rows:
        assert row.n == len(groups[row.segment])
        assert abs(row.mean_bal - groups[row.segment].mean() / 100.0) < 1.1e-4
        assert abs(row.f_stat - want_f) < 1.1e-5
        assert row.reject_equal_means == (row.f_stat > 2.39)


def test_dsir_weights_match_numpy(spark):
    d = _docs()
    toks = d["text"].str.split(" ")
    from collections import Counter

    raw: Counter = Counter()
    tgt: Counter = Counter()
    for lang, ws in zip(d["lang"], toks):
        raw.update(ws)
        if lang == "en":
            tgt.update(ws)
    nr = sum(raw.values())
    nt = sum(tgt.values())
    v = len(raw)
    want = {}
    for doc_id, ws in zip(d["doc_id"], toks):
        lw = 0.0
        for w in ws:
            lw += np.log((tgt.get(w, 0) + 0.5) / (nt + 0.5 * v)) - np.log(
                (raw[w] + 0.5) / (nr + 0.5 * v)
            )
        want[int(doc_id)] = (lw, len(ws))
    top = sorted(want.items(), key=lambda kv: (-kv[1][0], kv[0]))[:25]
    rows = get_query("pipeline_dsir_importance_weights").builder(spark, SF).collect()
    assert sorted(r.doc_id for r in rows) == sorted(doc for doc, _ in top)
    for r in rows:
        lw, n_tok = want[r.doc_id]
        assert r.n_tokens == n_tok
        assert abs(r.log_weight - lw) < 1.1e-6


def test_inference_stats_clear_rounding_boundaries():
    """The Welch t and ANOVA F are float expression trees whose engine
    difference is bounded by fold-order ulps; the hash pin is sound only
    if neither statistic sits within float-error distance of a half-up
    rounding boundary at its emitted scale (the centroid-norm pin's
    discipline, applied to the round-10b inference entries)."""
    c = _customer()
    a = _cents(c.loc[c["c_mktsegment"] == "BUILDING", "c_acctbal"]).astype(float)
    b = _cents(c.loc[c["c_mktsegment"] == "FURNITURE", "c_acctbal"]).astype(float)
    na, nb = len(a), len(b)
    va, vb = a.var(ddof=1), b.var(ddof=1)
    t = (a.mean() - b.mean()) / np.sqrt(va / na + vb / nb)
    scaled_t = abs(t) * 1e6
    assert abs(scaled_t - np.floor(scaled_t) - 0.5) > 1e-6

    groups = [
        _cents(g["c_acctbal"]).astype(float) for _, g in c.groupby("c_mktsegment")
    ]
    nn = sum(len(g) for g in groups)
    k = len(groups)
    gm = sum(g.sum() for g in groups) / nn
    ssb = sum(len(g) * (g.mean() - gm) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f = (ssb / (k - 1)) / (ssw / (nn - k))
    scaled_f = f * 1e6
    assert abs(scaled_f - np.floor(scaled_f) - 0.5) > 1e-6
    # and the verdict thresholds themselves are not boundary cases
    assert abs(abs(round(t, 6)) - 1.96) > 1e-4
    assert abs(round(f, 6) - 2.39) > 1e-4


def test_wilson_ci_matches_numpy(spark):
    d = _docs()
    from spark_jdbc_limit_spark.operators.stats import EB_CHAR_GATE, WILSON_Z

    rows = get_query("mix_source_rate_wilson_ci").builder(spark, SF).collect()
    z2 = WILSON_Z * WILSON_Z
    pooled = (d["n_chars"] >= EB_CHAR_GATE).mean()
    for r in rows:
        grp = d[d["source"] == r.source]
        n = len(grp)
        c = int((grp["n_chars"] >= EB_CHAR_GATE).sum())
        assert (r.n, r.c) == (n, c)
        p = c / n
        center = (p + z2 / (2 * n)) / (1 + z2 / n)
        hw = (WILSON_Z / (1 + z2 / n)) * np.sqrt(p * (1 - p) / n + z2 / (4 * n * n))
        assert abs(r.rate - p) < 1.1e-6
        assert abs(r.ci_lo - (center - hw)) < 1.1e-6
        assert abs(r.ci_hi - (center + hw)) < 1.1e-6
        pr_r = np.floor(pooled * 1e6 + 0.5) / 1e6  # round_dbl's half-up
        assert r.differs_from_pooled == (r.ci_hi < pr_r or r.ci_lo > pr_r)
