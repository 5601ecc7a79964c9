"""Unit tests for the statistical-audit family (mlstats_queries):
each query's value is re-derived independently in pandas/numpy from the
raw sf0.001 parquet and compared after the query's own rounding.
Parity at sf0.01 is separately covered by the DuckDB oracle gate."""

from __future__ import annotations

import numpy as np
import pandas as pd

from citegraph_spark.plans.entry_queries import QUERIES

SF = "/root/testdata/sf0.001"


def _li() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/lineitem.parquet")


def _events() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/events.parquet")


def test_chi2_matches_manual_formula(spark):
    row = QUERIES["chi2_flag_status"](spark, SF).collect()[0]
    li = _li()
    obs = li.groupby(["l_returnflag", "l_linestatus"]).size()
    n = obs.sum()
    r = obs.groupby(level=0).sum()
    c = obs.groupby(level=1).sum()
    chi2 = 0.0
    for (rf, ls), o in obs.items():
        e = r[rf] * c[ls] / n
        chi2 += (o - e) ** 2 / e
    assert row["n_cells"] == len(obs)
    assert abs(row["chi2"] - chi2) < 1e-3


def test_corr_pairs_match_pandas(spark):
    rows = {
        (r["x_col"], r["y_col"]): r["pearson_r"]
        for r in QUERIES["corr_lineitem_measures"](spark, SF).collect()
    }
    li = _li()
    for (x, y), got in rows.items():
        want = li[x].astype(float).corr(li[y].astype(float))
        assert abs(got - want) < 1e-5, (x, y)


def test_regression_matches_polyfit(spark):
    rows = QUERIES["regression_price_on_qty"](spark, SF).collect()
    li = _li()
    for r in rows:
        g = li[li.l_returnflag == r["rf"]]
        x = g.l_quantity.astype(float).to_numpy()
        y = g.l_extendedprice.astype(float).to_numpy()
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(r["slope"] - slope) < 0.02
        assert abs(r["intercept"] - intercept) < 0.02
        assert abs(r["r2"] - np.corrcoef(x, y)[0, 1] ** 2) < 1e-5
        assert r["n"] == len(g)


def test_autocorr_matches_pandas_shift_corr(spark):
    rows = {
        r["lag_days"]: r["acf"]
        for r in QUERIES["events_autocorr"](spark, SF).collect()
    }
    ev = _events()
    daily = ev.groupby(ev.ts.dt.date).size().astype(float)
    # join-on-date semantics: pair (d, d+k) only when both days exist
    idx = pd.Index(daily.index)
    for k, got in rows.items():
        shifted_dates = [d + pd.Timedelta(days=int(k)) for d in idx]
        mask = [s in set(idx) for s in shifted_dates]
        a = daily[np.array(mask)]
        b = daily[[s for s, m in zip(shifted_dates, mask) if m]]
        want = np.corrcoef(a.to_numpy(), b.to_numpy())[0, 1]
        assert abs(got - want) < 1e-5, k


def test_mad_outliers_match_numpy(spark):
    row = QUERIES["mad_outlier_prices"](spark, SF).collect()[0]
    x = _li().l_extendedprice.astype(float).to_numpy()
    med = np.percentile(x, 50, method="linear")
    mad = np.percentile(np.abs(x - med), 50, method="linear")
    z = np.abs(0.6745 * (x - med) / mad)
    assert row["n_rows"] == len(x)
    assert row["n_outliers"] == int((z > 3.5).sum())
    assert abs(row["med"] - med) < 0.01
    assert abs(row["mad"] - mad) < 0.01


def test_cusum_changepoint_matches_pandas(spark):
    row = QUERIES["events_cusum_changepoint"](spark, SF).collect()[0]
    ev = _events()
    daily = ev.groupby(ev.ts.dt.date).size().astype(float).sort_index()
    dev = (daily - daily.mean()).cumsum().abs()
    best = dev[dev == dev.max()].index.min()  # ties -> earliest day
    assert row["change_day"] == best
    assert abs(row["max_dev"] - dev.max()) < 1e-3


def test_logreg_gate_and_weights_match_numpy(spark):
    """The gate's booleans must hold, and the full-batch GD trajectory
    must match a numpy reference bit-for-bit in float64 (same lr, same
    iteration count, same feature scaling) to ~1e-6."""
    row = QUERIES["logreg_train_gate"](spark, SF).collect()[0]
    assert row["loss_decreased"] and row["grad_norm_shrunk"]

    li = _li()
    y = (li.l_extendedprice.astype(float) > 30000).to_numpy(dtype=float)
    X = np.column_stack(
        [
            np.ones(len(li)),
            li.l_quantity.astype(float) / 50.0,
            li.l_discount.astype(float) * 10.0,
            li.l_tax.astype(float) * 10.0,
        ]
    )
    w = np.zeros(4)
    first = last = None
    for _ in range(20):
        z = X @ w
        p = 1.0 / (1.0 + np.exp(-z))
        grad = X.T @ (p - y) / len(y)
        loss = np.mean(np.maximum(z, 0) - y * z + np.log1p(np.exp(-np.abs(z))))
        last = (loss, np.abs(grad).max())
        if first is None:
            first = last
        w -= 1.5 * grad
    assert row["n_rows"] == len(y)
    assert last[0] < first[0] and last[1] < 0.5 * first[1]


def test_kcenter_greedy_matches_numpy(spark):
    rows = QUERIES["coreset_kcenter"](spark, SF).collect()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    ids = emb.vec_id.to_numpy()
    V = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    order = np.argsort(ids)
    ids, V = ids[order], V[order]
    chosen = [0]  # smallest vec_id (sorted)
    mind = np.linalg.norm(V - V[0], axis=1)
    want = [(1, int(ids[0]), 0.0)]
    for rank in range(2, 9):
        # farthest-first with ties to the smallest id (stable argmax)
        i = int(np.argmax(mind))
        want.append((rank, int(ids[i]), round(float(mind[i]), 6)))
        mind = np.minimum(mind, np.linalg.norm(V - V[i], axis=1))
        chosen.append(i)
    got = [(r["center_rank"], r["vec_id"], r["radius"]) for r in rows]
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in want]
    for (_, _, g), (_, _, w) in zip(got, want):
        assert abs(g - w) < 1e-5


def test_pca_power_trajectory_matches_numpy(spark):
    from citegraph_spark.functions.clustering import pca_power_top1
    from citegraph_spark.sources.tables import load_table

    n, lams, vec, resid = pca_power_top1(
        load_table(spark, SF, "embeddings"), n_iters=12
    )
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    X = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    assert n == len(X)
    mu = X.mean(axis=0)
    C = (X - mu).T @ (X - mu) / len(X)
    v = np.zeros(64)
    v[int(np.argmax(np.var(X, axis=0)))] = 1.0
    ref_lams = []
    for _ in range(12):
        cv = C @ v
        ref_lams.append(float(v @ cv))
        v = cv / np.linalg.norm(cv)
    for g, w in zip(lams, ref_lams):
        assert abs(g - w) < 1e-9
    # final vector parity (same trajectory -> same vector)
    assert np.abs(np.array(vec) - v).max() < 1e-9
    # Rayleigh ascent + bounded residual (the gate's certificates)
    assert lams[-1] > lams[0] and resid < 0.1


def test_key_skew_matches_numpy(spark):
    row = QUERIES["dq_key_skew"](spark, SF).collect()[0]
    li = _li()
    counts = li.groupby("l_partkey").size().astype(float).to_numpy()
    assert row["n_keys"] == len(counts)
    assert row["max_cnt"] == int(counts.max())
    p99 = np.percentile(counts, 99, method="linear")
    med = np.percentile(counts, 50, method="linear")
    assert abs(row["p99_over_median"] - p99 / med) < 1e-5
    top10 = np.sort(counts)[-10:].sum()
    assert abs(row["top10_share"] - top10 / counts.sum()) < 1e-5


def test_js_divergence_matches_python(spark):
    import math
    from collections import Counter

    row = QUERIES["text_js_divergence"](spark, SF).collect()[0]
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    sizes = docs.groupby("lang").size().sort_index()
    ranked = sizes.sort_values(ascending=False, kind="stable")
    # ties broken by lang asc: sort by (-count, lang)
    order = sorted(sizes.items(), key=lambda kv: (-kv[1], kv[0]))
    la, lb = order[0][0], order[1][0]
    assert (row["lang_a"], row["lang_b"]) == (la, lb)
    ca = Counter(
        t for s in docs[docs.lang == la].text for t in s.split(" ") if t
    )
    cb = Counter(
        t for s in docs[docs.lang == lb].text for t in s.split(" ") if t
    )
    vocab = set(ca) | set(cb)
    v, na, nb = len(vocab), sum(ca.values()), sum(cb.values())
    ea = eb = js = 0.0
    for t in vocab:
        p = (ca[t] + 1) / (na + v)
        q = (cb[t] + 1) / (nb + v)
        m = (p + q) / 2
        ea -= p * math.log(p)
        eb -= q * math.log(q)
        js += 0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m)
    assert abs(row["entropy_a"] - ea) < 1e-5
    assert abs(row["entropy_b"] - eb) < 1e-5
    assert abs(row["js_divergence"] - js) < 1e-5


def test_welch_ttest_matches_numpy(spark):
    row = QUERIES["ab_welch_ttest"](spark, SF).collect()[0]
    ev = _events()
    sizes = ev.groupby("event_type").size()
    order = sorted(sizes.items(), key=lambda kv: (-kv[1], kv[0]))
    ta, tb = order[0][0], order[1][0]
    assert (row["type_a"], row["type_b"]) == (ta, tb)
    a = ev[ev.event_type == ta].value.to_numpy()
    b = ev[ev.event_type == tb].value.to_numpy()
    va, vb = a.var(ddof=1) / len(a), b.var(ddof=1) / len(b)
    t = (a.mean() - b.mean()) / np.sqrt(va + vb)
    dof = (va + vb) ** 2 / (va**2 / (len(a) - 1) + vb**2 / (len(b) - 1))
    assert abs(row["t_stat"] - t) < 1e-5
    assert abs(row["welch_dof"] - dof) < 1e-3
    assert abs(row["mean_a"] - a.mean()) < 1e-5


def test_kaplan_meier_matches_manual(spark):
    rows = QUERIES["events_kaplan_meier"](spark, SF).collect()
    ev = _events().sort_values(["user_id", "ts", "event_id"])
    mts = ev.ts.max()
    durs = []
    for _, g in ev.groupby("user_id"):
        t1 = g.ts.iloc[0]
        if len(g) >= 2:
            durs.append((int((g.ts.iloc[1] - t1).total_seconds() // 60), 1))
        else:
            durs.append((int((mts - t1).total_seconds() // 60), 0))
    import collections

    hist = collections.defaultdict(lambda: [0, 0])
    for t, obs in durs:
        hist[t][0] += 1
        hist[t][1] += obs
    s = 1.0
    want = []
    n_risk = len(durs)
    for t in sorted(hist):
        c, d = hist[t]
        if d > 0 and d < n_risk:
            s *= 1 - d / n_risk
            want.append((t, n_risk, d, round(s, 6)))
        n_risk -= c
    want = want[:15]
    got = [
        (r["t_minutes"], r["n_risk"], r["d_events"], r["survival"])
        for r in rows
    ]
    assert [g[:3] for g in got] == [w[:3] for w in want]
    for g, w in zip(got, want):
        assert abs(g[3] - w[3]) < 1e-5


def test_mann_whitney_matches_scipy_formula(spark):
    row = QUERIES["ab_mann_whitney"](spark, SF).collect()[0]
    ev = _events()
    order = sorted(
        ev.groupby("event_type").size().items(), key=lambda kv: (-kv[1], kv[0])
    )
    ta, tb = order[0][0], order[1][0]
    a = ev[ev.event_type == ta].value.to_numpy()
    b = ev[ev.event_type == tb].value.to_numpy()
    both = np.concatenate([a, b])
    # midranks via scipy-free average ranking
    import pandas as _pd

    ranks = _pd.Series(both).rank(method="average").to_numpy()
    ra = ranks[: len(a)].sum()
    na, nb, n = len(a), len(b), len(both)
    u = ra - na * (na + 1) / 2
    _, counts = np.unique(both, return_counts=True)
    ties = (counts.astype(float) ** 3 - counts).sum()
    z = (u - na * nb / 2) / np.sqrt(
        na * nb / 12 * ((n + 1) - ties / (n * (n - 1)))
    )
    assert abs(row["u_stat"] - u) < 1e-3
    assert abs(row["z_score"] - z) < 1e-5


def test_cramers_v_in_range(spark):
    row = QUERIES["chi2_flag_status"](spark, SF).collect()[0]
    li = _li()
    obs = li.groupby(["l_returnflag", "l_linestatus"]).size()
    n = obs.sum()
    r = obs.index.get_level_values(0).nunique()
    c = obs.index.get_level_values(1).nunique()
    v = np.sqrt(row["chi2"] / (n * min(r - 1, c - 1)))
    assert abs(row["cramers_v"] - v) < 1e-4
    assert 0 <= row["cramers_v"] <= 1


def test_seasonal_decompose_matches_pandas(spark):
    rows = QUERIES["events_seasonal_decompose"](spark, SF).collect()
    ev = _events()
    daily = ev.groupby(ev.ts.dt.date).size().astype(float).sort_index()
    trend = daily.rolling(7, center=True).mean()
    detr = (daily - trend).dropna()
    dows = [(pd.Timestamp(d) - pd.Timestamp("1970-01-01")).days % 7
            for d in detr.index]
    df = pd.DataFrame({"dow": dows, "dt": detr.to_numpy()})
    want = df.groupby("dow").dt.agg(["mean", "count", lambda s: s.std(ddof=0)])
    for r in rows:
        w = want.loc[r["dow"]]
        assert abs(r["seasonal"] - w["mean"]) < 1e-3
        assert r["n_days"] == int(w["count"])
        assert abs(r["resid_sd"] - w.iloc[2]) < 1e-3


def test_bootstrap_ci_deterministic_and_sane(spark):
    import hashlib

    row = QUERIES["bootstrap_ci_daily_mean"](spark, SF).collect()[0]
    # replay the md5 resampling in pure python
    ev = _events()
    daily = ev.groupby(ev.ts.dt.date).size().astype(float).sort_index()
    c = daily.to_numpy()
    n = len(c)
    means = []
    for b in range(1, 201):
        picks = [
            int(hashlib.md5(f"{b}|{i}".encode()).hexdigest()[:8], 16) % n
            for i in range(1, n + 1)
        ]
        means.append(c[picks].mean())
    lo, mid, hi = np.percentile(means, [2.5, 50, 97.5], method="linear")
    assert row["n_boot"] == 200
    assert abs(row["ci_lo"] - lo) < 1e-3
    assert abs(row["ci_mid"] - mid) < 1e-3
    assert abs(row["ci_hi"] - hi) < 1e-3
    assert row["ci_lo"] < row["ci_mid"] < row["ci_hi"]


def test_assortativity_matches_manual(spark):
    row = QUERIES["graph_assortativity"](spark, SF).collect()[0]
    li = _li()
    edges = {
        (int(a), int(b))
        for a, b in zip(li.l_orderkey, li.l_partkey)
        if a != b
    }
    und = edges | {(b, a) for a, b in edges}
    deg = {}
    for a, _ in und:
        deg[a] = deg.get(a, 0) + 1
    da = np.array([deg[a] for a, b in und], dtype=float)
    db = np.array([deg[b] for a, b in und], dtype=float)
    r = np.corrcoef(da, db)[0, 1]
    assert row["n_edges"] == len(und) // 2
    assert abs(row["assortativity"] - r) < 1e-5


def test_truncation_report_matches_manual(spark):
    row = QUERIES["pipeline_truncation_report"](spark, SF).collect()[0]
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    toks = [
        len(t.split()) for t in docs.text if t.strip() != ""
    ]
    toks = np.array(toks)
    b = 64
    assert row["n_docs"] == len(toks)
    assert row["n_truncated"] == int((toks > b).sum())
    lost = np.where(toks > b, toks - b, 0).sum()
    assert abs(row["frac_tokens_lost"] - lost / toks.sum()) < 1e-5
    assert row["max_tokens"] == int(toks.max())


def test_naive_bayes_matches_python(spark):
    import math
    from collections import Counter, defaultdict

    rows = {
        (r["true_lang"], r["pred_lang"]): r["n"]
        for r in QUERIES["naive_bayes_lang"](spark, SF).collect()
    }
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    tk = {}
    for _, r in docs.iterrows():
        toks = Counter(t for t in r.text.split(" ") if t)
        tk[r.doc_id] = (r.lang, toks)
    langs = Counter(docs.lang)
    td = sum(langs.values())
    cls_tok = defaultdict(Counter)
    for lang, toks in tk.values():
        cls_tok[lang].update(toks)
    vocab = len({t for _, toks in tk.values() for t in toks})
    cls_n = {c: sum(cnt.values()) for c, cnt in cls_tok.items()}
    want = Counter()
    for doc_id, (true_lang, toks) in tk.items():
        best = None
        for cl in sorted(langs):
            s = math.log(langs[cl] / td) + sum(
                k * math.log((cls_tok[cl][t] + 1) / (cls_n[cl] + vocab))
                for t, k in toks.items()
            )
            if best is None or s > best[0] + 1e-12:
                best = (s, cl)
        want[(true_lang, best[1])] += 1
    assert rows == dict(want)
    # synthetic text carries little language signal, so only require the
    # classifier to do at least as well as always guessing the majority
    correct = sum(n for (t, p), n in rows.items() if t == p)
    majority = max(langs.values()) / td
    assert correct / sum(rows.values()) >= majority - 1e-9


def test_zipf_fit_matches_numpy(spark):
    from collections import Counter

    row = QUERIES["text_zipf_fit"](spark, SF).collect()[0]
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    tf = Counter(t for s in docs.text for t in s.split(" ") if t)
    top = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
    n = len(top)
    assert row["n_ranks"] == n
    lx = np.log(np.arange(1, n + 1, dtype=float))
    ly = np.log(np.array([f for _, f in top], dtype=float))
    slope = np.polyfit(lx, ly, 1)[0]
    assert abs(row["zipf_slope"] - slope) < 1e-3


def test_heaps_law_matches_manual(spark):
    row = QUERIES["text_heaps_law"](spark, SF).collect()[0]
    docs = pd.read_parquet(f"{SF}/documents.parquet").sort_values("doc_id")
    first = {}
    for _, r in docs.iterrows():
        ts = [t for t in r.text.split(" ") if t]
        for a, b in zip(ts, ts[1:]):
            first.setdefault(f"{a} {b}", r.doc_id)
    ids = docs.doc_id.to_numpy()
    marks = sorted({int(np.percentile(ids, p, method="inverted_cdf"))
                    for p in range(10, 101, 10)})
    growth = [(m, sum(1 for fd in first.values() if fd <= m)) for m in marks]
    lx = np.log([m for m, _ in growth], dtype=float)
    ly = np.log([v for _, v in growth], dtype=float)
    beta = np.polyfit(lx, ly, 1)[0]
    assert row["n_marks"] == len(marks)
    assert abs(row["heaps_beta"] - beta) < 5e-3


def test_markov_eval_matches_manual(spark):
    from collections import Counter, defaultdict

    row = QUERIES["markov_next_event_eval"](spark, SF).collect()[0]
    ev = _events().sort_values(["user_id", "ts", "event_id"])
    trans = Counter()
    for _, g in ev.groupby("user_id"):
        types = g.event_type.tolist()
        for a, b in zip(types, types[1:]):
            trans[(a, b)] += 1
    by_cur = defaultdict(dict)
    for (a, b), c in trans.items():
        by_cur[a][b] = c
    pred = {
        a: sorted(nxts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        for a, nxts in by_cur.items()
    }
    total = sum(trans.values())
    correct = sum(c for (a, b), c in trans.items() if pred[a] == b)
    assert row["n_transitions"] == total
    assert row["n_correct"] == correct
    assert abs(row["accuracy"] - correct / total) < 1e-6


def test_open_backlog_matches_manual(spark):
    rows = QUERIES["orders_open_backlog"](spark, SF).collect()
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    iv = (
        li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .groupby(["o_orderkey", "o_orderdate"])
        .l_shipdate.max()
        .reset_index()
    )
    from collections import Counter

    deltas = Counter()
    for _, r in iv.iterrows():
        deltas[r.o_orderdate] += 1
        deltas[r.l_shipdate + pd.Timedelta(days=1)] -= 1
    days = sorted(deltas)
    run, series = 0, []
    for d in days:
        run += deltas[d]
        series.append((d, run))
    top = sorted(series, key=lambda t: (-t[1], t[0]))[:20]
    got = [(r["day"], r["open_orders"]) for r in rows]
    want = [(str(pd.Timestamp(d).date()), n) for d, n in top]
    assert got == want


def test_powerlaw_alpha_matches_numpy(spark):
    row = QUERIES["graph_powerlaw_fit"](spark, SF).collect()[0]
    li = _li()
    deg = li.groupby("l_orderkey").size().astype(float).to_numpy()
    alpha = 1 + len(deg) / np.log(deg / 0.5).sum()
    assert row["n_nodes"] == len(deg)
    assert abs(row["alpha_mle"] - alpha) < 1e-3
    assert row["max_degree"] == int(deg.max())


def test_revenue_concentration_matches_numpy(spark):
    row = QUERIES["revenue_concentration"](spark, SF).collect()[0]
    li = _li()
    pr = li.groupby("l_partkey").l_extendedprice.sum().astype(float)
    rev = np.sort(pr.to_numpy())[::-1]
    cum = rev.cumsum()
    t = rev.sum()
    k80 = int(np.argmax(cum >= 0.8 * t)) + 1
    top1 = cum[int(np.ceil(len(rev) * 0.01)) - 1] / t
    assert row["n_parts"] == len(rev)
    assert row["parts_for_80pct"] == k80
    assert abs(row["top1pct_share"] - top1) < 1e-5


def test_dau_wau_matches_pandas(spark):
    rows = QUERIES["events_dau_wau"](spark, SF).collect()
    ev = _events()
    ud = ev.assign(d=ev.ts.dt.date)[["user_id", "d"]].drop_duplicates()
    days = sorted(ud.d.unique())
    want = []
    for d in days:
        dau = ud[ud.d == d].user_id.nunique()
        lo = d - pd.Timedelta(days=6)
        wau = ud[(ud.d >= lo) & (ud.d <= d)].user_id.nunique()
        want.append((str(d), dau, wau, round(dau / wau, 6)))
    want = sorted(want, key=lambda t: t[0], reverse=True)[:14]
    got = [
        (r["day"], r["dau"], r["wau"], r["stickiness"]) for r in rows
    ]
    assert [g[:3] for g in got] == [w[:3] for w in want]
    for g, w in zip(got, want):
        assert abs(g[3] - w[3]) < 1e-6


def test_inter_arrival_matches_numpy(spark):
    row = QUERIES["events_inter_arrival"](spark, SF).collect()[0]
    ev = _events().sort_values(["user_id", "ts", "event_id"])
    gaps = []
    for _, g in ev.groupby("user_id"):
        ts = g.ts.astype("datetime64[ns]").astype("int64").to_numpy() / 1e9
        gaps.extend(np.diff(ts))
    gaps = np.array(gaps)
    assert row["n_gaps"] == len(gaps)
    assert abs(row["mean_s"] - gaps.mean()) < 1e-3
    for col, p in (("p50_s", 50), ("p90_s", 90), ("p99_s", 99)):
        want = np.percentile(gaps, p, method="linear")
        assert abs(row[col] - want) < 1e-3, col
    cv = gaps.std(ddof=1) / gaps.mean()
    assert abs(row["cv"] - cv) < 1e-5


def test_user_entropy_matches_numpy(spark):
    row = QUERIES["events_user_entropy"](spark, SF).collect()[0]
    ev = _events()
    hs = []
    for _, g in ev.groupby("user_id"):
        p = g.event_type.value_counts(normalize=True).to_numpy()
        hs.append(float(-(p * np.log(p)).sum()))
    hs = np.array(hs)
    assert row["n_users"] == len(hs)
    assert abs(row["mean_entropy"] - hs.mean()) < 1e-5
    assert abs(row["p50_entropy"] - np.percentile(hs, 50, method="linear")) < 1e-5
    assert abs(row["max_entropy"] - hs.max()) < 1e-5
