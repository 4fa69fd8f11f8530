"""Round-6 wave 3: two-way ANOVA, Levene, McNemar, Friedman,
AdaBoost stumps — independent python recomputation on sf0.001."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from cs_pipeline_spark.operators.aggregate import (
    agg_friedman_test,
    agg_levene_test,
    agg_two_way_anova,
)
from cs_pipeline_spark.operators.mlmetrics import (
    ml_adaboost_stumps,
    ml_mcnemar_test,
)

SF = "/root/testdata/sf0.001"


def _events():
    return duckdb.sql(
        f"SELECT hour(ts), event_type, "
        f"CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) "
        f"FROM '{SF}/events.parquet'"
    ).fetchall()


def test_two_way_anova_matches_python(spark):
    rows = _events()
    cells = defaultdict(lambda: [0, 0])
    sxx = 0
    for h, et, x in rows:
        c = cells[(et, h // 6)]
        c[0] += 1
        c[1] += x
        sxx += x * x
    n = sum(c[0] for c in cells.values())
    s = sum(c[1] for c in cells.values())
    cm = s * s // n

    def margin(idx):
        m = defaultdict(lambda: [0, 0])
        for k, c in cells.items():
            m[k[idx]][0] += c[0]
            m[k[idx]][1] += c[1]
        return sum(v[1] * v[1] // v[0] for v in m.values()), len(m)

    va, ka = margin(0)
    vb, kb = margin(1)
    vc = sum(c[1] * c[1] // c[0] for c in cells.values())
    expect = {
        "factor_a": (ka - 1, va - cm),
        "factor_b": (kb - 1, vb - cm),
        "interaction": ((ka - 1) * (kb - 1), vc - va - vb + cm),
        "error": (n - len(cells), sxx - vc),
        "total": (n - 1, sxx - cm),
    }
    ss_tot, (df_e, ss_e) = sxx - cm, expect["error"]
    out = {r.component: r for r in agg_two_way_anova(spark, SF).collect()}
    assert set(out) == set(expect)
    for comp, (df, ss) in expect.items():
        r = out[comp]
        assert r.df == df
        assert r.ss_micro2 == float(ss)
        assert r.eta2_ppm == ss * 10**6 // ss_tot
        if df > 0 and ss_e > 0 and df_e > 0:
            f = (ss / df) / (ss_e / df_e)
            assert abs(r.f_stat - math.floor(f * 1e6 + 0.5) / 1e6) < 1e-12
    # sums of squares decompose: A + B + AB + E = total
    parts = sum(expect[c][1] for c in
                ("factor_a", "factor_b", "interaction", "error"))
    assert parts == ss_tot


def test_levene_matches_python(spark):
    rows = _events()
    grp = defaultdict(list)
    for _, et, x in rows:
        grp[et].append(x)
    z = {
        g: [abs(x - sum(v) // len(v)) for x in v] for g, v in grp.items()
    }
    k = len(z)
    n = sum(len(v) for v in z.values())
    vb = sum(sum(v) ** 2 // len(v) for v in z.values())
    s = sum(sum(v) for v in z.values())
    sxx = sum(x * x for v in z.values() for x in v)
    ssb = vb - s * s // n
    ssw = sxx - vb
    f = (ssb / (k - 1)) / (ssw / (n - k))
    out = {r.event_type: r for r in agg_levene_test(spark, SF).collect()}
    assert set(out) == set(z)
    for g, r in out.items():
        assert r.n == len(z[g])
        assert r.mean_absdev_micro == sum(z[g]) // len(z[g])
        assert (r.df1, r.df2) == (k - 1, n - k)
        assert abs(r.levene_w - math.floor(f * 1e6 + 0.5) / 1e6) < 1e-12


def test_mcnemar_matches_python(spark):
    rows = duckdb.sql(
        f"SELECT event_type = 'error', value >= 500.0, hour(ts) < 6 "
        f"FROM '{SF}/events.parquet'"
    ).fetchall()
    b = c = both = neither = 0
    for y, pa, pb in rows:
        ao, bo = pa == y, pb == y
        if ao and bo:
            both += 1
        elif ao:
            b += 1
        elif bo:
            c += 1
        else:
            neither += 1
    (r,) = ml_mcnemar_test(spark, SF).collect()
    assert (r.n_both, r.n_a_only, r.n_b_only, r.n_neither) == (
        both,
        b,
        c,
        neither,
    )
    chi2_q = math.floor((abs(b - c) - 1) ** 2 / (b + c) * 1e6 + 0.5)
    assert abs(r.mcnemar_chi2 - chi2_q / 1e6) < 1e-12
    assert r.differ == (chi2_q >= 3841459)


def test_friedman_matches_python(spark):
    rows = duckdb.sql(
        f"SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000, "
        f"event_type, CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) "
        f"FROM '{SF}/events.parquet'"
    ).fetchall()
    cells = defaultdict(lambda: [0, 0])
    types = set()
    for d, t, x in rows:
        types.add(t)
        cells[(d, t)][0] += 1
        cells[(d, t)][1] += x
    k = len(types)
    dm = defaultdict(dict)
    for (d, t), (cn, sv) in cells.items():
        dm[d][t] = sv // cn
    full = [d for d in dm if len(dm[d]) == k]
    r2 = Counter()
    for d in full:
        vals = dm[d]
        for t, x in vals.items():
            rank = 1 + sum(1 for v in vals.values() if v < x)
            ties = sum(1 for v in vals.values() if v == x)
            r2[t] += 2 * rank + ties - 1
    n = len(full)
    sr2 = sum(v * v for v in r2.values())
    q_q6 = 3 * sr2 * 10**6 // (4 * n * k * (k + 1)) - 3 * n * (
        k + 1
    ) * 10**6
    out = {r.event_type: r for r in agg_friedman_test(spark, SF).collect()}
    assert set(out) == types
    for t, r in out.items():
        assert r.rank_sum_x2_half == r2[t] // 2
        assert r.mean_rank_ppm == r2[t] * 10**6 // (2 * n)
        assert (r.n_blocks, r.k) == (n, k)
        assert abs(r.friedman_q - q_q6 / 1e6) < 1e-12
        assert r.reject_h0 == (q_q6 >= 9487729)


def test_adaboost_matches_python(spark):
    rows = duckdb.sql(
        f"SELECT CAST(event_type = 'error' AS INT), "
        f"CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT), hour(ts) "
        f"FROM '{SF}/events.parquet'"
    ).fetchall()
    n = len(rows)
    qvs = sorted(x for _, x, _ in rows)
    # stump 1: 9 exact decile thresholds, both polarities
    cands = []
    for kk in range(1, 10):
        t = qvs[(kk * (n - 1)) // 10]  # 1-based rank -> 0-based index
        ep = sum(1 for y, x, _ in rows if (x > t) != (y == 1))
        cands.append((ep, t, -1))
        cands.append((n - ep, t, 0))
    cands.sort(key=lambda c: (c[0], c[1], c[2]))
    e1, t1, negpol = cands[0]
    pol1 = 1 if negpol == -1 else 0

    def h1(x):
        return (x > t1) if pol1 == 1 else (x <= t1)

    # round 2: integer weights (n-e1) on mistakes, e1 on correct
    c2 = []
    for t2 in range(0, 23):
        w = sum(
            (n - e1) if ((y == 1) != h1(x)) else e1
            for y, x, h in rows
            if (h > t2) != (y == 1)
        )
        wtot = 2 * e1 * (n - e1)
        c2.append((w, t2, -1))
        c2.append((wtot - w, t2, 0))
    c2.sort(key=lambda c: (c[0], c[1], c[2]))
    w2, t2, negpol2 = c2[0]
    pol2 = 1 if negpol2 == -1 else 0
    wtot = 2 * e1 * (n - e1)
    a1q = math.floor(0.5 * math.log((n - e1) / e1) * 1e9 + 0.5)
    a2q = math.floor(0.5 * math.log((wtot - w2) / w2) * 1e9 + 0.5)

    def h2(h):
        return (h > t2) if pol2 == 1 else (h <= t2)

    ok = sum(
        1
        for y, x, h in rows
        if (
            a1q * (1 if h1(x) else -1) + a2q * (1 if h2(h) else -1) > 0
        )
        == (y == 1)
    )
    (r,) = ml_adaboost_stumps(spark, SF).collect()
    assert abs(r.threshold1 - t1 / 1e6) < 1e-12
    assert (r.pol1, r.err1_ppm) == (pol1, e1 * 10**6 // n)
    assert abs(r.alpha1 - a1q / 1e9) < 1e-12
    assert (r.hour_threshold2, r.pol2) == (t2, pol2)
    assert r.err2_ppm == w2 * 10**6 // wtot
    assert abs(r.alpha2 - a2q / 1e9) < 1e-12
    assert r.train_acc_ppm == ok * 10**6 // n
    # boosting actually reduced weighted error below chance both rounds
    assert e1 * 2 < n and w2 * 2 < wtot


def test_randomized_response_matches_python(spark):
    from cs_pipeline_spark.operators.privacy import (
        _PRIME,
        privacy_randomized_response,
    )

    rows = duckdb.sql(
        f"SELECT event_id, event_type, CAST(value >= 500.0 AS INT) "
        f"FROM '{SF}/events.parquet'"
    ).fetchall()
    agg = defaultdict(lambda: [0, 0, 0])
    for eid, et, sens in rows:
        coin = (((eid % _PRIME) * 1103515245 + 12345) % _PRIME) % 4
        rep = sens if coin < 3 else 1 - sens
        a = agg[et]
        a[0] += 1
        a[1] += sens
        a[2] += rep
    out = {
        r.event_type: r
        for r in privacy_randomized_response(spark, SF).collect()
    }
    assert set(out) == set(agg)
    for et, (n, tc, rc) in agg.items():
        r = out[et]
        assert (r.n, r.true_cnt, r.reported_cnt) == (n, tc, rc)
        assert r.est_x2 == 4 * rc - n
        # engines truncate toward zero on negatives (Spark div /
        # DuckDB //) — python // floors, so mirror the truncation
        num = (4 * rc - n) * 10**6
        est_ppm = (1 if num >= 0 else -1) * (abs(num) // (2 * n))
        true_ppm = tc * 10**6 // n
        assert (r.est_rate_ppm, r.true_rate_ppm) == (est_ppm, true_ppm)
        assert r.err_ppm == abs(est_ppm - true_ppm)
        # debiasing works: estimate within 20% of truth at sf0.001 n
        assert r.err_ppm < 200000


def test_cohens_kappa_matches_python(spark):
    from cs_pipeline_spark.operators.mlmetrics import ml_cohens_kappa

    rows = duckdb.sql(
        f"SELECT CAST(value >= 500.0 AS INT), CAST(hour(ts) < 6 AS INT) "
        f"FROM '{SF}/events.parquet'"
    ).fetchall()
    n = len(rows)
    n11 = sum(a * b for a, b in rows)
    n10 = sum(a * (1 - b) for a, b in rows)
    n01 = sum((1 - a) * b for a, b in rows)
    n00 = n - n11 - n10 - n01
    a1, b1 = n11 + n10, n11 + n01
    pe_n2 = a1 * b1 + (n - a1) * (n - b1)
    kappa = (n * (n11 + n00) - pe_n2) / (n * n - pe_n2)
    (r,) = ml_cohens_kappa(spark, SF).collect()
    assert (r.n, r.n11, r.n10, r.n01, r.n00) == (n, n11, n10, n01, n00)
    assert r.po_ppm == (n11 + n00) * 10**6 // n
    assert r.pe_ppm == pe_n2 * 10**6 // (n * n)
    assert abs(r.kappa - math.floor(kappa * 1e6 + 0.5) / 1e6) < 1e-12


def test_capture_recapture_matches_python(spark):
    from cs_pipeline_spark.operators.aggregate import agg_capture_recapture

    rows = duckdb.sql(
        f"SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 "
        f"FROM '{SF}/events.parquet'"
    ).fetchall()
    days = [d for _, d in rows]
    mid = (min(days) + max(days)) // 2
    c1, c2 = set(), set()
    for u, d in rows:
        (c1 if d <= mid else c2).add(u)
    n1, n2, m = len(c1), len(c2), len(c1 & c2)
    true = len(c1 | c2)
    (r,) = agg_capture_recapture(spark, SF).collect()
    assert (r.n_capture1, r.n_capture2, r.n_both, r.n_true) == (
        n1,
        n2,
        m,
        true,
    )
    assert r.lincoln_petersen == n1 * n2 // m
    assert r.chapman == (n1 + 1) * (n2 + 1) // (m + 1) - 1
    assert r.lp_err_ppm == abs(n1 * n2 // m - true) * 10**6 // true
    # estimator sanity: within 30% of truth on this overlap
    assert r.lp_err_ppm < 300000


def test_cochran_q_matches_python(spark):
    from cs_pipeline_spark.operators.aggregate import agg_cochran_q

    rows = duckdb.sql(
        f"SELECT DISTINCT user_id, "
        f"epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000, event_type "
        f"FROM '{SF}/events.parquet'"
    ).fetchall()
    g, li = Counter(), Counter()
    for u, d, t in rows:
        g[t] += 1
        li[(u, d)] += 1
    k = len(g)
    sg2 = sum(v * v for v in g.values())
    t_tot = sum(g.values())
    sl = sum(li.values())
    sl2 = sum(v * v for v in li.values())
    denom = k * sl - sl2
    # degenerate-corpus guard: if every block is constant-response
    # the statistic is undefined and the op must yield NULL, not crash
    # (user-day blocks are non-degenerate at both test SFs)
    q_q6 = (
        (k - 1) * (k * sg2 - t_tot * t_tot) * 10**6 // denom
        if denom > 0
        else None
    )
    out = {r.event_type: r for r in agg_cochran_q(spark, SF).collect()}
    assert set(out) == set(g)
    for t, r in out.items():
        assert r.n_users_hit == g[t]
        assert (r.n_users, r.k) == (len(li), k)
        if q_q6 is None:
            assert r.cochran_q is None
            assert r.reject_h0 is False
        else:
            assert abs(r.cochran_q - q_q6 / 1e6) < 1e-12
            assert r.reject_h0 == (q_q6 >= 9487729)


def test_dtw_matches_python_dp(spark):
    from cs_pipeline_spark.operators.timeseries import ts_dtw_distance

    rows = duckdb.sql(
        f"SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000, "
        f"event_type, CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) "
        f"FROM '{SF}/events.parquet'"
    ).fetchall()
    cells = defaultdict(lambda: [0, 0])
    types = set()
    for d, t, x in rows:
        types.add(t)
        cells[(d, t)][0] += 1
        cells[(d, t)][1] += x
    k = len(types)
    dm = defaultdict(dict)
    for (d, t), (cn, sv) in cells.items():
        dm[d][t] = sv // cn
    full = sorted(d for d in dm if len(dm[d]) == k)
    ser = {t: [dm[d][t] for d in full] for t in types}
    INF = 1 << 50
    W = 3

    def dtw(a, b):
        m = len(a)
        prev = [INF] * (m + 1)
        cur = [INF] * (m + 1)
        # plain textbook row-by-row banded DP as the independent
        # reference (the op computes anti-diagonally — same table)
        for i in range(1, m + 1):
            nxt = [INF] * (m + 1)
            for j in range(max(1, i - W), min(m, i + W) + 1):
                best = min(
                    cur[j],
                    nxt[j - 1] if j > 1 else INF,
                    cur[j - 1] if (i > 1 and j > 1) else
                    (0 if (i == 1 and j == 1) else INF),
                )
                # base cell (1,1) has no predecessor: cost only
                if i == 1 and j == 1:
                    nxt[j] = abs(a[0] - b[0])
                else:
                    nxt[j] = abs(a[i - 1] - b[j - 1]) + best
            cur, nxt = nxt, cur
        return cur[m]

    out = {
        (r.type_a, r.type_b): r
        for r in ts_dtw_distance(spark, SF).collect()
    }
    ts_sorted = sorted(types)
    expect_pairs = {
        (x, y) for i, x in enumerate(ts_sorted) for y in ts_sorted[i + 1 :]
    }
    assert set(out) == expect_pairs
    for (x, y), r in out.items():
        d = dtw(ser[x], ser[y])
        assert r.n_days == len(full)
        assert r.dtw_micro == d
        assert r.dtw_per_step_micro == d // (2 * len(full) - 1)
        # DTW can only improve on the rigid lock-step alignment
        lock = sum(abs(p - q) for p, q in zip(ser[x], ser[y]))
        assert d <= lock


def test_isotonic_matches_python_pav(spark):
    from cs_pipeline_spark.operators.mlmetrics import (
        ml_isotonic_calibration,
    )

    rows = duckdb.sql(
        f"SELECT CAST(event_type = 'purchase' AS INT), "
        f"CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT), event_id "
        f"FROM '{SF}/events.parquet' ORDER BY 2, 3"
    ).fetchall()
    nn = len(rows)
    bins = defaultdict(lambda: [0, 0])
    for rank0, (y, _, _) in enumerate(rows):
        b = rank0 * 10 // nn + 1
        bins[b][0] += 1
        bins[b][1] += y
    order = sorted(bins)
    n = [bins[b][0] for b in order]
    s = [bins[b][1] for b in order]
    # reference PAV: classic sequential pool-adjacent-violators
    blocks = [[n[i], s[i]] for i in range(len(order))]
    merged = []
    for blk in blocks:
        merged.append(blk)
        while (
            len(merged) > 1
            and merged[-2][1] * merged[-1][0]
            > merged[-1][1] * merged[-2][0]
        ):
            b2 = merged.pop()
            merged[-1][0] += b2[0]
            merged[-1][1] += b2[1]
    # expand each pooled block back to its original bins
    iso = []
    i = 0
    for bn, bs in merged:
        acc = 0
        while acc < bn:
            acc += n[i]
            iso.append(bs / bn)
            i += 1
    out = {r.bin: r for r in ml_isotonic_calibration(spark, SF).collect()}
    assert set(out) == set(order)
    prev = -1
    for idx, b in enumerate(order):
        r = out[b]
        assert r.n == n[idx]
        assert r.raw_rate_ppm == s[idx] * 10**6 // n[idx]
        expect = math.floor(iso[idx] * 1e6 + 0.5)
        # minimax identity == sequential PAV
        assert r.iso_rate_ppm == expect
        assert r.adjust_ppm == abs(expect - r.raw_rate_ppm)
        # monotone non-decreasing
        assert r.iso_rate_ppm >= prev
        prev = r.iso_rate_ppm
