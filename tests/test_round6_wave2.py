"""Round-6 wave 2: WOE/IV, item-item CF, IPF raking, RAKE keywords,
Durbin-Levinson PACF, EWMA chart — independent python recomputation
on sf0.001."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import duckdb

from cs_pipeline_spark.operators.aggregate import agg_ipf_raking
from cs_pipeline_spark.operators.analytics import rec_item_item
from cs_pipeline_spark.operators.text import _STOPWORDS, text_rake_keywords
from cs_pipeline_spark.operators.trainprep import features_woe_iv
from cs_pipeline_spark.operators.windows import (
    agg_acf_lags,
    ts_pacf_durbin,
    win_ewma_chart,
)

SF = "/root/testdata/sf0.001"


def _q(x: float, digits: int) -> float:
    s = float(10**digits)
    return math.floor(x * s + 0.5) / s


def test_woe_iv_matches_python(spark):
    rows = duckdb.sql(
        f"SELECT hour(ts) AS h, event_type FROM '{SF}/events.parquet'"
    ).fetchall()
    good = Counter()
    n = Counter()
    for h, et in rows:
        n[h] += 1
        good[h] += 1 if et == "purchase" else 0
    gt = sum(good.values())
    bt = sum(n.values()) - gt
    out = {r.bin_hour: r for r in features_woe_iv(spark, SF).collect()}
    assert set(out) == set(n)
    iv_terms = {}
    for h in n:
        g, b = good[h], n[h] - good[h]
        r = out[h]
        assert (r.n_good, r.n_bad) == (g, b)
        if g > 0 and b > 0:
            woe_q = math.floor(math.log((g * bt) / (b * gt)) * 1e9 + 0.5)
            assert abs(r.woe - woe_q / 1e9) < 1e-12
            term_q = math.floor(
                (g * bt - b * gt) / (gt * bt) * (woe_q / 1e9) * 1e9 + 0.5
            )
            iv_terms[h] = term_q
            assert abs(r.iv_term - term_q / 1e9) < 1e-12
        else:
            assert r.woe is None and r.iv_term == 0.0
            iv_terms[h] = 0
    iv = sum(iv_terms.values()) / 1e9
    for r in out.values():
        assert abs(r.iv_total - iv) < 1e-12


def test_item_item_top1_matches_python(spark):
    rows = duckdb.sql(
        f"SELECT DISTINCT l_orderkey, l_partkey FROM '{SF}/lineitem.parquet'"
    ).fetchall()
    baskets = defaultdict(set)
    for ok, pk in rows:
        baskets[ok].add(pk)
    cnt = Counter()
    co = Counter()
    for ps in baskets.values():
        sp = sorted(ps)
        for p in sp:
            cnt[p] += 1
        for i, a in enumerate(sp):
            for b in sp[i + 1 :]:
                co[(a, b)] += 1
    nbrs = defaultdict(list)
    for (a, b), c in co.items():
        if c >= 2:
            sa = c * c * 10**12 // (cnt[a] * cnt[b])
            nbrs[a].append((-sa, b, c, sa))
            sb = c * c * 10**12 // (cnt[b] * cnt[a])
            nbrs[b].append((-sb, a, c, sb))
    out = defaultdict(dict)
    for r in rec_item_item(spark, SF).collect():
        out[r.item][r.rnk] = r
    assert set(out) == set(nbrs)
    for item, cand in nbrs.items():
        cand.sort()
        for rnk, (_, b, c, sa) in enumerate(cand[:3], start=1):
            r = out[item][rnk]
            assert (r.neighbor, r.n_cooccur, r.cos2_p12) == (b, c, sa)
            assert abs(r.cosine - _q(math.sqrt(sa / 1e12), 9)) < 1e-12


def test_ipf_raking_matches_python_fixed_point(spark):
    pop = duckdb.sql(
        f"SELECT c_mktsegment, c_nationkey % 5, c_custkey "
        f"FROM '{SF}/customer.parquet'"
    ).fetchall()
    tr, tc = Counter(), Counter()
    cells = Counter()
    for seg, nb, ck in pop:
        tr[seg] += 1
        tc[nb] += 1
        if ck % 2 == 0:
            cells[(seg, nb)] += 1
    w = {k: 10**6 for k in cells}
    for key_idx, tgt in ((0, tr), (1, tc), (0, tr), (1, tc)):
        m = Counter()
        for k, n in cells.items():
            m[k[key_idx]] += n * w[k]
        w = {
            k: w[k] * tgt[k[key_idx]] * 10**6 // m[k[key_idx]]
            for k in cells
        }
    out = {(r.seg, r.nbucket): r for r in agg_ipf_raking(spark, SF).collect()}
    assert set(out) == set(cells)
    mr = Counter()
    for k, n in cells.items():
        mr[k[0]] += n * w[k]
    for k, r in out.items():
        assert r.n_sample == cells[k]
        assert r.w_ppm == w[k]
        assert r.target_seg == tr[k[0]]
        assert r.achieved_seg == mr[k[0]] // 10**6
        gap = abs(mr[k[0]] - tr[k[0]] * 10**6)
        assert r.seg_gap_ppm == gap * 10**6 // (tr[k[0]] * 10**6)
        # raking converged: after 2 cycles the row-margin residual
        # left by the final column step stays under 1% even on
        # sf0.001's 1-4-row cells (truncating-division fixed point)
        assert r.seg_gap_ppm < 10000


def test_rake_matches_python(spark):
    texts = duckdb.sql(
        f"SELECT text FROM '{SF}/documents.parquet'"
    ).fetchall()
    stop_re = re.compile(r"\b(" + "|".join(_STOPWORDS) + r")\b")
    phrases = []
    for (t,) in texts:
        norm = re.sub(r"\s+", " ", t.lower()).strip()
        for frag in stop_re.sub("|", norm).split("|"):
            p = re.sub(" +", " ", frag).strip()
            if p and len(p.split(" ")) <= 3:
                phrases.append(p)
    freq, deg = Counter(), Counter()
    for p in phrases:
        ws = p.split(" ")
        for wd in ws:
            freq[wd] += 1
            deg[wd] += len(ws)
    pc = Counter(phrases)
    scored = sorted(
        (
            -sum(deg[wd] * 10**6 // freq[wd] for wd in p.split(" ")),
            -c,
            p,
        )
        for p, c in pc.items()
    )[:15]
    out = text_rake_keywords(spark, SF).collect()
    assert len(out) == 15
    for r, (negs, negc, p) in zip(out, scored):
        assert (r.phrase, r.n_occur, r.score_p6) == (p, -negc, -negs)
        assert r.n_words == len(p.split(" "))


def test_pacf_durbin_levinson_identity(spark):
    acf = defaultdict(dict)
    for r in agg_acf_lags(spark, SF).collect():
        acf[r.event_type][r.lag_hours] = (r.acf, r.n_pairs)
    out = {r.event_type: r for r in ts_pacf_durbin(spark, SF).collect()}
    for et, r in out.items():
        r1, r2, r3 = (acf[et][k][0] for k in (1, 2, 3))
        n = max(acf[et][k][1] + k for k in (1, 2, 3))
        assert r.n_hours == n
        assert abs(r.pacf1 - _q(r1, 6)) < 1e-12
        p2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
        assert abs(r.pacf2 - _q(p2, 6)) < 1e-12
        a21 = r1 - p2 * r1
        p3 = (r3 - a21 * r2 - p2 * r1) / (1.0 - a21 * r1 - p2 * r2)
        assert abs(r.pacf3 - _q(p3, 6)) < 1e-12
        thr = math.floor(2.0 / math.sqrt(n) * 1e6 + 0.5)
        expect = 0
        for k, p in ((1, r.pacf1), (2, r.pacf2), (3, r.pacf3)):
            if abs(math.floor(p * 1e6 + 0.5)) > thr:
                expect = max(expect, k)
        assert r.ar_order == expect


def test_ewma_chart_matches_python(spark):
    rows = duckdb.sql(
        f"SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000, "
        f"CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) "
        f"FROM '{SF}/events.parquet'"
    ).fetchall()
    sums, cnts = Counter(), Counter()
    for day, qv in rows:
        sums[day] += qv
        cnts[day] += 1
    days = sorted(sums)
    x = {d: sums[d] // cnts[d] for d in days}
    n = len(days)
    sx = sum(x.values())
    sxx = sum(v * v for v in x.values())
    mu = sx // n
    s2n = n * sxx - sx * sx
    out = {r.day: r for r in win_ewma_chart(spark, SF).collect()}
    assert set(out) == set(days)
    dd = 0
    for t, d in enumerate(days, start=1):
        j = (t - 1) % 32 + 1
        if j == 1:
            dd = 0
        dd += (x[d] - mu) * (1 << (j - 1))
        r = out[d]
        assert (r.t, r.block) == (t, (t - 1) // 32)
        sdev = (dd * math.sqrt(3.0) * n) / (
            math.sqrt(s2n) * math.sqrt(float((1 << (2 * j)) - 1))
        )
        assert abs(r.ewma_dev - _q(sdev, 6)) < 1e-12
        assert r.signal == (abs(sdev) > 3.0)
        ev = _q((mu + dd / float(1 << j)) / 1e6, 6)
        assert abs(r.ewma_value - ev) < 1e-12
