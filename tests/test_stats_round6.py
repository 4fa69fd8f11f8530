"""Round-6 new families: geohash cells, Kruskal-Wallis, BH-FDR,
SPRT, Shewhart control chart — invariants + independent python
recomputation on sf0.001."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from cs_pipeline_spark.operators.aggregate import (
    agg_bh_fdr,
    agg_control_chart,
    agg_kruskal_wallis,
    agg_sprt_boundary,
)
from cs_pipeline_spark.operators.spatial import (
    _GH32,
    spatial_geohash_cells,
)

SF = "/root/testdata/sf0.001"


def _events() -> pd.DataFrame:
    return duckdb.sql(
        f"SELECT event_id, ts, user_id, event_type, value "
        f"FROM '{SF}/events.parquet'"
    ).df()


def _py_geohash5(lat_m: int, lon_m: int) -> str:
    """Reference geohash: interleave 13 lon + 12 lat bits, base32."""
    ilon = (lon_m * 8192) // 360000
    ilat = (lat_m * 4096) // 180000
    g = 0
    for i in range(13):
        g += ((ilon >> (12 - i)) & 1) << (24 - 2 * i)
    for i in range(12):
        g += ((ilat >> (11 - i)) & 1) << (23 - 2 * i)
    return "".join(_GH32[(g >> (20 - 5 * k)) & 31] for k in range(5))


def test_geohash_matches_reference_encode(spark):
    out = {
        (r.gh2): r for r in spatial_geohash_cells(spark, SF).collect()
    }
    ev = _events()
    cells = {}
    for _, row in ev.iterrows():
        lat_m = (int(row.user_id) * 7919) % 180000
        lon_m = (int(row.event_id) * 104729) % 360000
        gh5 = _py_geohash5(lat_m, lon_m)
        c = cells.setdefault(gh5[:2], [0, set()])
        c[0] += 1
        c[1].add(gh5)
    assert set(out) == set(cells)
    for gh2, (n, subs) in cells.items():
        assert out[gh2].n_points == n
        assert out[gh2].n_subcells == len(subs)
    assert all(ch in _GH32 for gh2 in out for ch in gh2)


def test_kruskal_wallis_matches_python(spark):
    row = agg_kruskal_wallis(spark, SF).collect()[0]
    ev = _events()
    q = (ev.value * 1e6 + 0.5).apply(math.floor).astype("int64")
    df = pd.DataFrame({"g": ev.event_type, "q": q})
    n = len(df)
    # midranks via sorted positions
    order = df.q.sort_values(kind="mergesort")
    ranks = pd.Series(range(1, n + 1), index=order.index, dtype="float64")
    mid = order.groupby(order).transform("size")
    ranks = ranks.groupby(order).transform("mean")
    h = 12.0 / (n * (n + 1)) * sum(
        (ranks[df.index[df.g == g]].sum() ** 2) / (df.g == g).sum()
        for g in df.g.unique()
    ) - 3.0 * (n + 1)
    tie = sum(
        t**3 - t for t in df.q.value_counts().tolist()
    )
    h_tie = h / (1 - tie / (n**3 - n))
    assert row.n_total == n
    assert row.k_groups == df.g.nunique()
    assert abs(row.h - h) < 1e-3
    assert abs(row.h_tie - h_tie) < 1e-3
    assert mid.min() >= 1  # sanity on the tie helper itself


def test_bh_fdr_step_up_property(spark):
    rows = sorted(agg_bh_fdr(spark, SF).collect(), key=lambda r: r.rnk)
    m = len(rows)
    assert [r.rnk for r in rows] == list(range(1, m + 1))
    # p non-decreasing in rank; thresholds exact
    for i, r in enumerate(rows):
        if i:
            assert r.p_ppb >= rows[i - 1].p_ppb
        assert r.thr_ppb == (r.rnk * 100000000) // m
    # step-up: rejected = rank <= k*, k* = max rank with p <= thr
    ks = max((r.rnk for r in rows if r.p_ppb <= r.thr_ppb), default=0)
    for r in rows:
        assert r.rejected == (r.rnk <= ks)


def test_sprt_matches_python(spark):
    out = {r.variant: r for r in agg_sprt_boundary(spark, SF).collect()}
    ev = _events().sort_values("event_id")
    for v in (0, 1):
        sub = ev[ev.user_id % 2 == v]
        x = (sub.event_type == "click").astype(int).tolist()
        cum, first, dec = 0, None, "continue"
        for i, xi in enumerate(x, 1):
            cum += 182321557 if xi else -22472856
            if first is None and abs(cum) >= 2944438979:
                first = i
                dec = "accept_h1" if cum > 0 else "accept_h0"
        r = out[v]
        assert r.n_events == len(x)
        assert r.n_conv == sum(x)
        assert r.llr_final_nano == cum
        assert r.first_cross_n == first
        assert r.decision == dec


def test_control_chart_rules(spark):
    rows = sorted(agg_control_chart(spark, SF).collect(), key=lambda r: r.day)
    ev = _events()
    q = (ev.value * 1e6 + 0.5).apply(math.floor).astype("int64")
    mu, sd = q.mean() / 1e6, q.std(ddof=0) / 1e6
    by_day = {}
    for ts, qi in zip(ev.ts, q):
        d = pd.Timestamp(ts).value // (86400 * 10**9)
        by_day.setdefault(d, []).append(qi)
    assert len(rows) == len(by_day)
    for r in rows:
        vals = by_day[r.day]
        assert r.n_d == len(vals)
        assert abs(r.mean_value - sum(vals) / len(vals) / 1e6) < 2e-6
        dev = (sum(vals) / len(vals) / 1e6 - mu) * math.sqrt(len(vals)) / sd
        assert abs(r.dev - dev) < 1e-3
        assert r.rule1 == (abs(dev) > 3.0)
    # rule2 needs >=2-of-3 beyond 2 sigma: implied by rule windows
    for i, r in enumerate(rows):
        if r.rule2:
            window = rows[max(0, i - 2) : i + 1]
            assert (
                sum(1 for w in window if w.dev > 2.0) >= 2
                or sum(1 for w in window if w.dev < -2.0) >= 2
            )
