"""Semantic checks for ts_ewma_dyadic / ts_fourier_power /
ts_forecast_eval / join_fuzzy_levenshtein against NumPy references."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from cs_pipeline_spark.registry import queries


@pytest.fixture(scope="module")
def events_pdf(sf_dir):
    df = pd.read_parquet(f"{sf_dir}/events.parquet")
    df["ts"] = pd.to_datetime(df["ts"])
    df["qv"] = np.floor(df["value"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    return df


def test_ewma_dyadic_matches_numpy(spark, sf_dir, events_pdf):
    rows = {
        r.event_type: r
        for r in queries()["ts_ewma_dyadic"](spark, sf_dir).collect()
    }
    for et, g in events_pdf.groupby("event_type"):
        g = g.sort_values(["ts", "event_id"], ascending=False).head(16)
        qv = g["qv"].to_numpy()
        w = np.array([1 << (15 - rn) if rn <= 15 else 1
                      for rn in range(1, len(qv) + 1)], dtype=np.int64)
        want = int((qv * w).sum()) / int(w.sum()) / 1e6
        want = np.floor(want * 1e9 + 0.5) / 1e9
        r = rows[et]
        assert r.n_used == len(qv)
        assert r.ewma == want
        assert r.last_value == qv[0] / 1e6


def test_fourier_power_daily_cycle(spark, sf_dir):
    rows = {
        r.period_h: r
        for r in queries()["ts_fourier_power"](spark, sf_dir).collect()
    }
    assert set(rows) == {24, 168}
    for r in rows.values():
        assert 0.0 <= r.amp_ratio <= 1.0
        assert r.n_hours > 0


def test_forecast_eval_matches_numpy(spark, sf_dir, events_pdf):
    rows = {
        r.event_type: r
        for r in queries()["ts_forecast_eval"](spark, sf_dir).collect()
    }
    df = events_pdf.copy()
    us = df["ts"].astype("datetime64[us]").astype("int64")
    df["h"] = us // 3600000000
    hourly = df.groupby(["event_type", "h"])["qv"].sum().reset_index()
    for et, g in hourly.groupby("event_type"):
        s = dict(zip(g["h"], g["qv"]))
        errs = [
            (h, s[h] - s[h - 24]) for h in s if h - 24 in s
        ]
        n = len(errs)
        if n == 0:
            # no lag-24 pair → the op's inner join emits no row
            assert et not in rows
            continue
        mae = sum(abs(e) for _, e in errs) // n
        r = rows[et]
        assert r.n_pairs == n
        assert r.mae_micro == mae
        mape_terms = [abs(e) * 1000000 // s[h - 24] for h, e in errs]
        assert r.mape_ppm == sum(mape_terms) // n


def test_fuzzy_levenshtein_recovers_origin(spark, sf_dir):
    rows = queries()["join_fuzzy_levenshtein"](spark, sf_dir).collect()
    by_probe = {}
    for r in rows:
        by_probe.setdefault(r.probe, []).append(r)
        assert r.dist <= 2
        assert r.probe[0] == r.matched[0]
    # every probe is word-minus-2nd-char, so its origin word is a
    # dist-1 match captured by the blocking predicate
    for probe, matches in by_probe.items():
        assert any(m.dist == 1 for m in matches)


def test_ohlc_bars_match_pandas(spark, sf_dir, events_pdf):
    rows = {
        (r.event_type, r.day): r
        for r in queries()["ts_ohlc_bars"](spark, sf_dir).collect()
    }
    df = events_pdf.copy()
    us = df["ts"].astype("datetime64[us]").astype("int64")
    df["day"] = us // 86400000000
    df["us"] = us
    for (et, day), g in df.groupby(["event_type", "day"]):
        g = g.sort_values(["us", "event_id"])
        r = rows[(et, day)]
        assert r.n_events == len(g)
        assert r.open == g["qv"].iloc[0] / 1e6
        assert r.close == g["qv"].iloc[-1] / 1e6
        assert r.high == g["qv"].max() / 1e6
        assert r.low == g["qv"].min() / 1e6


def test_watermark_sweep_monotone(spark, sf_dir):
    rows = sorted(
        queries()["stream_watermark_sweep"](spark, sf_dir).collect(),
        key=lambda r: r.delay_s,
    )
    assert [r.delay_s for r in rows] == [60, 300, 600]
    lates = [r.n_late for r in rows]
    # a longer watermark delay can only admit more events
    assert lates == sorted(lates, reverse=True)
    # the 0-10 min jitter makes SOME events late at a 1-min watermark
    assert rows[0].n_late > 0


def test_kaplan_meier_monotone_nonincreasing(spark, sf_dir):
    rows = sorted(
        queries()["win_kaplan_meier"](spark, sf_dir).collect(),
        key=lambda r: r.tenure_days,
    )
    surv = [r.survival for r in rows]
    assert all(0.0 <= s <= 1.0 for s in surv)
    assert surv == sorted(surv, reverse=True)
    # the final day exhausts the risk set → survival exactly 0
    assert rows[-1].n_churned == rows[-1].n_at_risk
    assert surv[-1] == 0.0
    # at-risk counts telescope: n_at_risk(t) = n_at_risk(t+1) + d(t+1)... reversed
    for a, b in zip(rows, rows[1:]):
        assert a.n_at_risk == b.n_at_risk + a.n_churned


def test_holt_linear_matches_reference_recursion(spark, sf_dir, events_pdf):
    rows = {
        r.event_type: r
        for r in queries()["ts_holt_linear"](spark, sf_dir).collect()
    }
    df = events_pdf.copy()
    us = df["ts"].astype("datetime64[us]").astype("int64")
    df["day"] = us // 86400000000
    daily = (
        df.groupby(["event_type", "day"])["qv"]
        .agg(["sum", "count"])
        .reset_index()
    )
    daily["x"] = daily["sum"] // daily["count"]
    for et, g in daily.groupby("event_type"):
        xs = g.sort_values("day")["x"].to_numpy()[-12:]
        if len(xs) < 12:
            assert et not in rows
            continue
        # plain float Holt recursion, alpha=beta=1/2 — the dyadic
        # integer lifting must reproduce it exactly (all values are
        # exact binary fractions)
        l, b = float(xs[0]), 0.0
        for x in xs[1:]:
            l_new = (x + l + b) / 2.0
            b = ((l_new - l) + b) / 2.0
            l = l_new
        r = rows[et]
        assert abs(r.level - np.floor(l / 1e6 * 1e6 + 0.5) / 1e6) < 1e-9
        f = (l + 3 * b) / 1e6
        assert abs(r.forecast_3d - np.floor(f * 1e6 + 0.5) / 1e6) < 1e-9


def test_gumbel_extremes_matches_numpy(spark, sf_dir, events_pdf):
    r = queries()["agg_gumbel_extremes"](spark, sf_dir).collect()[0]
    df = events_pdf.copy()
    us = df["ts"].astype("datetime64[us]").astype("int64")
    df["day"] = us // 86400000000
    mx = df.groupby("day")["qv"].max().to_numpy().astype(np.int64)
    n = len(mx)
    assert r.n_blocks == n
    mean = mx.sum() / n
    var = (n * (mx.astype(object) ** 2).sum() - int(mx.sum()) ** 2)
    beta = 0.7796968012336761 * np.sqrt(float(var)) / n
    mu = mean - 0.5772156649015329 * beta
    assert abs(r.block_mean - mean / 1e6) < 1e-5
    assert abs(r.gumbel_beta - beta / 1e6) < 1e-5
    assert abs(r.gumbel_mu - mu / 1e6) < 1e-5
    # return level exceeds the location parameter (positive scale)
    assert r.return_level_100 > r.gumbel_mu


def test_attribution_shares_sum(spark, sf_dir):
    rows = queries()["win_last_touch_attribution"](spark, sf_dir).collect()
    total = sum(r.n_purchases for r in rows)
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    assert total == int((ev["event_type"] == "purchase").sum())
    assert abs(sum(r.share_ppm for r in rows) - 1000000) <= len(rows)
    # purchases never credit themselves
    assert "purchase" not in {r.touch for r in rows}


def test_funnel_latency_positive(spark, sf_dir):
    r = queries()["win_funnel_latency"](spark, sf_dir).collect()[0]
    assert r.n_converted > 0
    assert 0 <= r.min_latency_s
    assert r.median_latency_s <= r.p90_latency_s


def test_hurst_exponent_plausible(spark, sf_dir):
    r = queries()["ts_hurst_exponent"](spark, sf_dir).collect()[0]
    # R/S grows with scale for any real series
    assert r.rs_8 < r.rs_16 < r.rs_32
    # H must land in the open unit interval for finite data
    assert 0.0 < r.hurst < 1.0
