"""Semantic checks for the ML-metrics wave against independent
NumPy/pandas references (the oracle gate proves cross-engine equality;
these prove the MATH is right)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from cs_pipeline_spark.registry import queries


@pytest.fixture(scope="module")
def events_pdf(sf_dir):
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def test_confusion_metrics_match_numpy(spark, sf_dir, events_pdf):
    row = queries()["ml_confusion_metrics"](spark, sf_dir).collect()[0]
    q = np.floor(events_pdf["value"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    y = (events_pdf["event_type"] == "purchase").to_numpy()
    m = np.sort(q)[(len(q) - 1) // 2]
    pred = q > m
    tp = int((y & pred).sum())
    fp = int((~y & pred).sum())
    fn = int((y & ~pred).sum())
    tn = int((~y & ~pred).sum())
    assert (row.tp, row.fp, row.fn, row.tn) == (tp, fp, fn, tn)
    assert row.precision_ppm == tp * 1000000 // (tp + fp)
    assert row.f1_ppm == 2 * tp * 1000000 // (2 * tp + fp + fn)


def test_calibration_bins_total_and_monotone_score(spark, sf_dir, events_pdf):
    rows = sorted(
        queries()["ml_calibration_bins"](spark, sf_dir).collect(),
        key=lambda r: r.bin,
    )
    assert [r.bin for r in rows] == list(range(1, 11))
    assert sum(r.n for r in rows) == len(events_pdf)
    scores = [r.mean_score_ppm for r in rows]
    assert scores == sorted(scores)
    for r in rows:
        assert 0 <= r.pos_rate_ppm <= 1000000


def test_linreg_matches_lstsq(spark, sf_dir, events_pdf):
    row = queries()["ml_linreg_normal"](spark, sf_dir).collect()[0]
    ts = pd.to_datetime(events_pdf["ts"])
    x1 = ts.dt.hour.to_numpy().astype(float)
    x2 = (ts.dt.weekday.to_numpy() + 1).astype(float)
    yq = np.floor(events_pdf["value"].to_numpy() * 1e6 + 0.5)
    y = yq / 1e6
    A = np.column_stack([np.ones_like(x1), x1, x2])
    beta, *_ = np.linalg.lstsq(A, y, rcond=None)
    assert row.n_rows == len(y)
    assert abs(row.b0 - beta[0]) < 1e-6
    assert abs(row.b1 - beta[1]) < 1e-6
    assert abs(row.b2 - beta[2]) < 1e-6


def test_decision_stump_beats_exhaustive_deciles(spark, sf_dir, events_pdf):
    row = queries()["ml_decision_stump"](spark, sf_dir).collect()[0]
    q = np.floor(events_pdf["value"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    y = (events_pdf["event_type"] == "error").to_numpy().astype(np.int64)
    n = len(q)
    order = np.sort(q)
    best = None
    for k in range(1, 10):
        t = order[(k * (n - 1)) // 10]
        left = q <= t
        nl, nr = int(left.sum()), int((~left).sum())
        pl, pr = int(y[left].sum()), int(y[~left].sum())
        gl = (nl * nl - pl * pl - (nl - pl) ** 2) * 1000000 // (nl * nl) if nl else 0
        gr = (nr * nr - pr * pr - (nr - pr) ** 2) * 1000000 // (nr * nr) if nr else 0
        wg = (nl * gl + nr * gr) // n
        cand = (wg, t)
        if best is None or cand < best:
            best = cand
    assert row.gini_ppm == best[0]
    assert abs(row.threshold - best[1] / 1e6) < 1e-9


def test_naive_bayes_confusion_is_consistent(spark, sf_dir):
    rows = queries()["ml_naive_bayes"](spark, sf_dir).collect()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    # every doc classified exactly once
    assert sum(r.n_docs for r in rows) == len(docs)
    # per-true-lang marginals match the corpus
    marg = {}
    for r in rows:
        marg[r.lang_true] = marg.get(r.lang_true, 0) + r.n_docs
    assert marg == docs["lang"].value_counts().to_dict()
    # resubstitution accuracy of a 5-class NB on synthetic text should
    # beat the majority-class baseline
    correct = sum(r.n_docs for r in rows if r.lang_true == r.lang_pred)
    majority = docs["lang"].value_counts().max()
    assert correct >= majority


def test_logreg_gd_matches_numpy_trajectory(spark, sf_dir, events_pdf):
    row = queries()["ml_logreg_gd"](spark, sf_dir).collect()[0]
    ts = pd.to_datetime(events_pdf["ts"])
    x1 = ts.dt.hour.to_numpy().astype(np.int64)
    y = (events_pdf["event_type"] == "purchase").to_numpy().astype(np.int64)
    n = len(y)
    w0 = w1 = 0
    for _ in range(4):
        z = (w0 + w1 * x1) / 1e6
        p = np.floor(1.0 / (1.0 + np.exp(-z)) * 1e9 + 0.5).astype(np.int64)
        err = p - y * 1000000000
        ga, gb = int(err.sum()), int((err * x1).sum())
        # truncation toward zero, matching div/`//`(HUGEINT)
        w0 = w0 - int(ga / (16000 * n))
        w1 = w1 - int(gb / (16000 * n))
    assert (row.w0_micro, row.w1_micro) == (w0, w1)
    pred = (w0 + w1 * x1) > 0
    acc = int((pred == (y == 1)).sum()) * 1000000 // n
    assert row.acc_ppm == acc


def test_spearman_matches_scipy_style_reference(spark, sf_dir):
    rows = {
        r.l_returnflag: r
        for r in queries()["agg_spearman_corr"](spark, sf_dir).collect()
    }
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    qx = np.floor(li["l_quantity"].to_numpy() * 1e6 + 0.5)
    qy = np.floor(li["l_extendedprice"].to_numpy() * 1e6 + 0.5)
    df = pd.DataFrame({"g": li["l_returnflag"], "qx": qx, "qy": qy})
    for g, grp in df.groupby("g"):
        rx = grp["qx"].rank(method="average").to_numpy()
        ry = grp["qy"].rank(method="average").to_numpy()
        want = np.corrcoef(rx, ry)[0, 1]
        got = rows[g].spearman_qty_price
        assert abs(got - want) < 1e-6


def test_cramers_v_in_unit_interval(spark, sf_dir):
    r = queries()["agg_cramers_v"](spark, sf_dir).collect()[0]
    assert 0.0 <= r.cramers_v <= 1.0
    assert r.chi2 >= 0.0
    assert r.dof_min >= 1


def test_ml_gate_e2e_funnel_consistency(spark, sf_dir):
    rows = {r.stage: r for r in queries()["ml_gate_e2e"](spark, sf_dir).collect()}
    assert set(rows) == {
        "featurized", "train", "stump_trained", "test_scored", "gate_f1"
    }
    assert rows["featurized"].n_rows == (
        rows["train"].n_rows + rows["test_scored"].n_rows
    )
    # ~80/20 hash split
    frac = rows["train"].n_rows / rows["featurized"].n_rows
    assert 0.7 < frac < 0.9
    assert 0 <= rows["test_scored"].metric <= 1000000
    assert 0 <= rows["gate_f1"].metric <= 1000000


def test_gmm_em_step_matches_numpy(spark, sf_dir, events_pdf):
    r = queries()["ml_gmm_em_step"](spark, sf_dir).collect()[0]
    x = np.sort(
        np.floor(events_pdf["value"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    )
    n = len(x)
    mu1 = x[int(np.ceil(0.25 * n)) - 1]
    mu2 = x[int(np.ceil(0.75 * n)) - 1]
    sig = max(mu2 - mu1, 1)
    xv = np.floor(events_pdf["value"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    z1 = (xv - mu1) / sig
    z2 = (xv - mu2) / sig
    f1 = np.floor(np.exp(-(z1 * z1) / 2.0) * 1e9 + 0.5).astype(np.int64)
    f2 = np.floor(np.exp(-(z2 * z2) / 2.0) * 1e9 + 0.5).astype(np.int64)
    tot = f1 + f2
    r1 = np.where(
        tot == 0, 500000000,
        np.floor(f1 / np.maximum(tot, 1) * 1e9 + 0.5)
    ).astype(np.int64)
    s1 = int(r1.sum())
    sx1 = int((r1.astype(object) * xv).sum())
    mu1_new = np.floor(sx1 / s1 / 1e6 * 1e6 + 0.5) / 1e6
    assert r.mu1_init == mu1 / 1e6
    assert r.mu2_init == mu2 / 1e6
    assert abs(r.mu1_new - mu1_new) < 1e-9
    # EM pulls the low mean below the high mean, weights in (0, 1)
    assert r.mu1_new < r.mu2_new
    assert 0.0 < r.w1_new < 1.0


def test_shap_global_shares(spark, sf_dir):
    rows = {r.feature: r for r in queries()["ml_shap_global"](spark, sf_dir).collect()}
    assert set(rows) == {"hour", "isodow"}
    assert abs(sum(r.importance_ppm for r in rows.values()) - 1000000) <= 2
    for r in rows.values():
        assert r.mean_abs_shap >= 0.0


def test_mutual_information_bounds(spark, sf_dir):
    r = queries()["agg_mutual_information"](spark, sf_dir).collect()[0]
    assert r.mi_nats >= -1e-6
    assert r.h_lang_nats > 0 and r.h_source_nats > 0
    # MI <= min(H_row, H_col); normalized in [0, 1]
    assert -1e-6 <= r.mi_normalized <= 1.0
    assert r.mi_nats <= min(r.h_lang_nats, r.h_source_nats) + 1e-6
