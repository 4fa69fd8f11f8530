"""Round-7 new families: Mann-Kendall trend test, Kaplan-Meier
product-limit curve, batch perceptron — each replayed in plain python
from the raw parquet (independent of both engines)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import pytest

from cs_pipeline_spark.registry import all_specs


@pytest.fixture(scope="module")
def raw(sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us, "
        f"user_id, value, hour(CAST(ts AS TIMESTAMP)) AS hr "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    con.close()
    return rows


def test_mann_kendall_python_replay(spark, sf_dir, raw):
    """Engine-independent replay of the EXISTING ts_mann_kendall
    (added round 7: the op predates its replay coverage)."""
    got = {
        r.event_type: r
        for r in all_specs()["ts_mann_kendall"].fn(spark, sf_dir).collect()
    }
    series = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for et, us, _u, v, _h in raw:
        b = series[et][us // 3600000000]
        b[0] += math.floor(v * 1e6 + 0.5)
        b[1] += 1
    for et, hours in series.items():
        # mq = floor(quantized-sum / count + 0.5) — the op's rounding
        ys = [
            math.floor(s / c + 0.5)
            for _x, (s, c) in sorted(hours.items())
        ]
        n = len(ys)
        s_stat = sum(
            (ys[j] > ys[i]) - (ys[j] < ys[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        tt = sum(
            t * (t - 1) * (2 * t + 5) for t in Counter(ys).values()
        )
        var18 = n * (n - 1) * (2 * n + 5) - tt
        r = got[et]
        assert r.n_hours == n
        assert r.s_stat == s_stat, et
        assert r.var_s18 == var18, et
        if s_stat != 0 and var18 > 0:
            z = (s_stat - (1 if s_stat > 0 else -1)) / math.sqrt(
                var18 / 18.0
            )
            assert abs(r.z - z) <= 1e-6


def test_kaplan_meier_python_replay(spark, sf_dir, raw):
    """Engine-independent replay of the EXISTING win_kaplan_meier
    (added round 7: the op predates its replay coverage). The op's
    arithmetic: per-day factor ln(1 − d/n) floor-quantized at 1e-9,
    exact integer cumulative sum, exp quantized at 1e-6, survival
    pinned to 0 once the risk set dies out."""
    got = sorted(
        (r.tenure_days, r.n_churned, r.n_at_risk, r.survival)
        for r in all_specs()["win_kaplan_meier"]
        .fn(spark, sf_dir)
        .collect()
    )
    life = defaultdict(lambda: [float("inf"), 0])
    for _et, us, u, _v, _h in raw:
        life[u][0] = min(life[u][0], us)
        life[u][1] = max(life[u][1], us)
    d = Counter((hi - lo) // 86400000000 for lo, hi in life.values())
    days = sorted(d)
    at_risk = {}
    run = 0
    for t in reversed(days):
        run += d[t]
        at_risk[t] = run
    lsum, gone = 0, False
    exp = []
    for t in days:
        n = at_risk[t]
        if d[t] < n:
            lsum += math.floor(math.log(1.0 - d[t] / n) * 1e9 + 0.5)
        else:
            gone = True
        surv = (
            0.0
            if gone
            else math.floor(math.exp(lsum / 1e9) * 1e6 + 0.5) / 1e6
        )
        exp.append((t, d[t], n, surv))
    assert got == exp
    # survival is monotone non-increasing and the curve dies out
    surv = [r[3] for r in got]
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    assert surv[-1] == 0.0


def test_perceptron_python_replay(spark, sf_dir, raw):
    got = {
        r.round: r
        for r in all_specs()["ml_perceptron_batch"]
        .fn(spark, sf_dir)
        .collect()
    }
    feats = [
        (
            1 if et == "error" else -1,
            math.floor(v * 1000.0 + 0.5),
            hr,
        )
        for et, _us, _u, v, hr in raw
    ]
    n = len(feats)
    w1 = w2 = b = 0
    for rnd in range(1, 5):
        d1 = d2 = db = nmis = 0
        for y, x1, x2 in feats:
            if y * (w1 * x1 + w2 * x2 + b) <= 0:
                d1 += y * x1
                d2 += y * x2
                db += y
                nmis += 1
        w1, w2, b = w1 + d1, w2 + d2, b + db
        r = got[rnd]
        assert (r.w1, r.w2, r.b) == (w1, w2, b), rnd
        assert r.n_mis == nmis
        assert r.acc_ppm == (n - nmis) * 1000000 // n
    # training actually learns: later rounds misclassify less than
    # round 1's all-rows start
    assert got[4].n_mis < got[1].n_mis


def test_matrix_profile_numpy_replay(spark, sf_dir, raw):
    import numpy as np

    got = {
        (r.event_type, r.win_start): (r.mp_dist2, r.mp_index)
        for r in all_specs()["ts_matrix_profile"].fn(spark, sf_dir).collect()
    }
    m, excl = 24, 12
    series = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for et, us, _u, v, _h in raw:
        b = series[et][us // 3600000000]
        b[0] += math.floor(v * 1000.0 + 0.5)
        b[1] += 1
    n_checked = 0
    for et, hours in series.items():
        y = np.array(
            [s // c for _h, (s, c) in sorted(hours.items())],
            dtype=np.int64,
        )
        nw = len(y) - m + 1
        if nw < 1:
            continue
        W = np.lib.stride_tricks.sliding_window_view(y, m)
        ss = (W * W).sum(axis=1)
        D = ss[:, None] + ss[None, :] - 2 * (W @ W.T)
        idx = np.arange(nw)
        D[np.abs(idx[:, None] - idx[None, :]) < excl] = np.iinfo(
            np.int64
        ).max
        j = D.argmin(axis=1)  # first min -> smallest index tiebreak
        d2 = D[idx, j]
        for i in range(nw):
            assert got[(et, i + 1)] == (int(d2[i]), int(j[i]) + 1), (
                et,
                i,
            )
            n_checked += 1
    assert n_checked > 500  # the profile actually covered the corpus


def test_facility_select_numpy_replay(spark, sf_dir):
    import numpy as np

    got = [
        (r.step, r.selected_id, r.gain, r.coverage)
        for r in sorted(
            all_specs()["corpus_facility_select"]
            .fn(spark, sf_dir)
            .collect(),
            key=lambda r: r.step,
        )
    ]
    con = duckdb.connect()
    df = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).df()
    con.close()
    ids = df["vec_id"].to_numpy()
    E = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    EQ = np.floor(E * 1e6 + 0.5).astype(np.int64)
    qa = (EQ * EQ).sum(axis=1)
    pool = ids < 64
    dots = EQ @ EQ[pool].T
    cos = dots / np.sqrt(qa)[:, None] / np.sqrt(qa[pool])[None, :]
    S = np.maximum(0, np.floor(cos * 1e9 + 0.5).astype(np.int64))
    pool_ids = ids[pool]
    best = np.zeros(len(ids), dtype=np.int64)
    chosen = set()
    for step, sel_id, gain, cov in got:
        gains = np.maximum(best[:, None], S).sum(axis=0) - best.sum()
        order = sorted(
            range(len(pool_ids)),
            key=lambda c: (-gains[c], pool_ids[c]),
        )
        c_star = next(c for c in order if pool_ids[c] not in chosen)
        assert sel_id == pool_ids[c_star], step
        assert gain == gains[c_star], step
        chosen.add(pool_ids[c_star])
        best = np.maximum(best, S[:, c_star])
        assert cov == best.sum(), step
    # greedy gains are non-increasing (submodularity)
    gains_seq = [g for _s, _i, g, _c in got]
    assert all(a >= b for a, b in zip(gains_seq, gains_seq[1:]))


def test_dbscan_numpy_replay(spark, sf_dir):
    import numpy as np

    rows = all_specs()["emb_dbscan_cosine"].fn(spark, sf_dir).collect()
    got = {
        r.cluster_id: (r.n_core, r.n_border, r.n_total) for r in rows
    }
    con = duckdb.connect()
    df = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).df()
    con.close()
    ids = df["vec_id"].to_numpy()
    EQ = np.floor(
        np.stack(df["embedding"].to_numpy()).astype(np.float64) * 1e6
        + 0.5
    ).astype(np.int64)
    qa = (EQ * EQ).sum(axis=1)
    C = (EQ @ EQ.T) / np.sqrt(qa)[:, None] / np.sqrt(qa)[None, :]
    A = C >= 0.35
    np.fill_diagonal(A, False)
    deg = 1 + A.sum(axis=1)
    core = deg >= 3
    # union-find over core-core edges, canonical = min vec_id
    parent = {int(i): int(i) for i in ids[core]}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ci, cj = np.where(A & core[:, None] & core[None, :])
    for i, j in zip(ci, cj):
        a, b = find(int(ids[i])), find(int(ids[j]))
        if a != b:
            parent[max(a, b)] = min(a, b)
    lab = {v: find(v) for v in parent}
    exp = defaultdict(lambda: [0, 0])
    for v, c in lab.items():
        exp[c][0] += 1
    border = 0
    for k in range(len(ids)):
        if core[k]:
            continue
        nb = [lab[int(ids[j])] for j in np.where(A[k] & core)[0]]
        if nb:
            exp[min(nb)][1] += 1
            border += 1
    for c, (ncore, nbord) in exp.items():
        assert got[c] == (ncore, nbord, ncore + nbord), c
    noise = len(ids) - int(core.sum()) - border
    assert got[-1] == (0, 0, noise)
    assert noise > 0 and len(exp) > 1  # the census is non-degenerate


def test_hodges_lehmann_python_replay(spark, sf_dir, raw):
    got = {
        r.event_type: (r.n_pairs, r.hl_location)
        for r in all_specs()["agg_hodges_lehmann"]
        .fn(spark, sf_dir)
        .collect()
    }
    series = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for et, us, _u, v, _h in raw:
        b = series[et][us // 3600000000]
        b[0] += math.floor(v * 1e6 + 0.5)
        b[1] += 1
    for et, hours in series.items():
        ys = [s // c for _x, (s, c) in sorted(hours.items())]
        walsh = sorted(
            ys[i] + ys[j]
            for i in range(len(ys))
            for j in range(i, len(ys))
        )
        n = len(walsh)
        med2 = walsh[(n + 1) // 2 - 1]
        assert got[et] == (n, med2 / 2.0 / 1e6), et


def test_unigram_viterbi_python_replay(spark, sf_dir):
    got = {
        r.word: (r.wn, r.n_pieces, r.score_lnq)
        for r in all_specs()["text_unigram_viterbi"]
        .fn(spark, sf_dir)
        .collect()
    }
    con = duckdb.connect()
    toks = con.execute(
        "SELECT unnest(string_split(trim(regexp_replace(lower(text),"
        "'\\s+', ' ', 'g')), ' ')) AS w "
        f"FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    con.close()
    wc = Counter(w for (w,) in toks if 2 <= len(w) <= 16)
    # vocab: all chars + top-150 multi-char substrings by freq
    pf = Counter()
    for w, n in wc.items():
        seen = set()
        for j in range(len(w)):
            for l in range(1, 5):
                if j + l <= len(w):
                    seen.add(w[j : j + l])
        for p in seen:
            pf[p] += n
    lnq = {p: math.floor(math.log(f) * 1e9 + 0.5) for p, f in pf.items()}
    multi = sorted(
        (p for p in pf if len(p) >= 2), key=lambda p: (-lnq[p], p)
    )[:150]
    vocab = {p for p in pf if len(p) == 1} | set(multi)
    z = sum(pf[p] for p in vocab)
    lnz = math.floor(math.log(z) * 1e9 + 0.5)
    for w, n in wc.items():
        L = len(w)
        dp = [-(10**18)] * (L + 1)
        dp[0] = 63
        for i in range(1, L + 1):
            for j in range(max(0, i - 4), i):
                p = w[j:i]
                if p in vocab and dp[j] > -(10**17):
                    dp[i] = max(
                        dp[i], dp[j] + 64 * (lnq[p] - lnz) - 1
                    )
        t = dp[L] - 63
        pieces = 64 - (t % 64)  # python % floors -> already normalized
        score = (t + pieces) // 64
        assert got[w] == (n, pieces, score), w
    assert len(got) == len(wc)
    # at least one word segments into a multi-char piece
    assert any(p < len(w) for w, (_n, p, _s) in got.items())


def test_granger_python_replay(spark, sf_dir, raw):
    got = {
        r.direction: (r.n_obs, r.f_stat)
        for r in all_specs()["ts_granger_causality"]
        .fn(spark, sf_dir)
        .collect()
    }
    hours = defaultdict(lambda: [0, 0])
    for et, us, _u, _v, _h in raw:
        h = hours[us // 3600000000]
        if et == "click":
            h[0] += 1
        elif et == "error":
            h[1] += 1
    hrs = sorted(hours)
    rows = [
        (hours[h][0], hours[h][1], hours[h - 1][0], hours[h - 1][1])
        for h in hrs
        if h - 1 in hours
    ]

    def fstat(y_i, x_i):
        n = len(rows)
        y = [r[y_i] for r in rows]
        yl = [r[y_i + 2] for r in rows]
        xl = [r[x_i + 2] for r in rows]
        s = lambda a, b: sum(p * q for p, q in zip(a, b))  # noqa: E731
        cyy = n * s(y, y) - sum(y) ** 2
        cy1y1 = n * s(yl, yl) - sum(yl) ** 2
        cx1x1 = n * s(xl, xl) - sum(xl) ** 2
        cyy1 = n * s(y, yl) - sum(y) * sum(yl)
        cyx1 = n * s(y, xl) - sum(y) * sum(xl)
        cy1x1 = n * s(yl, xl) - sum(yl) * sum(xl)
        det2 = cy1y1 * cx1x1 - cy1x1 * cy1x1
        qr = cyy1 * cyy1
        qf = (
            cyy1 * cyy1 * cx1x1
            - 2 * cyy1 * cyx1 * cy1x1
            + cyx1 * cyx1 * cy1y1
        )
        rss_r = float(cyy) - float(qr) / float(cy1y1)
        rss_f = float(cyy) - float(qf) / float(det2)
        f = (n - 3.0) * (rss_r - rss_f) / rss_f
        return n, math.floor(f * 1e6 + 0.5) / 1e6

    assert got["x->y"] == fstat(1, 0)
    assert got["y->x"] == fstat(0, 1)
    # an F-test on independent synthetic streams should be small but
    # finite — sanity that the statistic is not NaN/degenerate
    assert all(f is not None and f > -1.0 for _n, f in got.values())


@pytest.fixture(scope="module")
def degenerate_emb_sf(tmp_path_factory, spark):
    """A zero-norm vector among normal ones + an empty events table."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    d = tmp_path_factory.mktemp("degsf")
    vecs = [np.zeros(64)]
    for i in range(1, 12):
        v = np.sin(np.arange(64) * 0.1 * i + i)
        vecs.append(v / np.linalg.norm(v))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(12), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * 12, pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(str(d), "embeddings.parquet"))
    spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    ).coalesce(1).write.parquet(os.path.join(str(d), "events.parquet"))
    return str(d)


def test_zero_norm_vector_is_guarded(spark, degenerate_emb_sf):
    """Zero-norm embeddings must not crash (ANSI NaN->long cast) nor
    emit pairs (DuckDB NaN total-order divergence class)."""
    specs = all_specs()
    # DBSCAN: vec 0 has no eps-neighbors -> noise, never a pair crash
    rows = {
        r.cluster_id: r.n_total
        for r in specs["emb_dbscan_cosine"]
        .fn.__wrapped__(spark, degenerate_emb_sf)
        .collect()
    }
    assert rows[-1] >= 1  # the zero vector lands in noise
    # SemDeDup: runs, zero vector never inside an eps-pair
    out = {
        r.stage: r.n_vecs
        for r in specs["dedup_semantic_e2e"]
        .fn.__wrapped__(spark, degenerate_emb_sf)
        .collect()
    }
    assert out["ingest"] == 12
    # facility selection: s(v, zero-candidate) = 0 -> still selects
    sel = (
        specs["corpus_facility_select"]
        .fn.__wrapped__(spark, degenerate_emb_sf)
        .collect()
    )
    assert len(sel) >= 1 and all(r.gain >= 0 for r in sel)


def test_perceptron_empty_corpus_yields_null_accuracy(
    spark, degenerate_emb_sf
):
    rows = (
        all_specs()["ml_perceptron_batch"]
        .fn.__wrapped__(spark, degenerate_emb_sf)
        .collect()
    )
    assert len(rows) == 4
    for r in rows:
        assert r.acc_ppm is None  # guarded division, no ANSI error
        # empty-aggregate SUMs are NULL on BOTH engines (consistent)
        assert r.n_mis is None and r.w1 is None


def test_anomaly_suite_equals_its_parts(spark, sf_dir):
    """The flagship must be structurally incapable of drifting from
    the five hash-checked detectors it composes."""
    specs = all_specs()
    suite = {
        r.detector: r.n_flagged
        for r in specs["anomaly_suite_e2e"].fn(spark, sf_dir).collect()
    }
    assert set(suite) == {
        "shewhart_we_rules",
        "ewma_chart",
        "cusum_drift",
        "mad_outliers",
        "volume_z6",
    }
    cc = specs["agg_control_chart"].fn(spark, sf_dir).collect()
    assert suite["shewhart_we_rules"] == sum(
        1 for r in cc if (r.rule1 or False) or (r.rule2 or False)
    )
    ew = specs["win_ewma_chart"].fn(spark, sf_dir).collect()
    assert suite["ewma_chart"] == sum(1 for r in ew if r.signal)
    cu = specs["win_cusum_changepoint"].fn(spark, sf_dir).collect()
    assert suite["cusum_drift"] == sum(1 for r in cu if r.drifted)
    mo = specs["agg_mad_outliers"].fn(spark, sf_dir).collect()
    assert suite["mad_outliers"] == sum(r.n_outliers for r in mo)
    va = specs["dq_volume_anomaly"].fn(spark, sf_dir).collect()
    assert suite["volume_z6"] == sum(1 for r in va if r.is_anomaly)
