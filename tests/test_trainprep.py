"""Semantic checks for the training-prep wave (reservoir merge,
quantile sketch, LOO target encoding, PR curve)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from cs_pipeline_spark.registry import queries

_P = 1000000007
_MULT = 2654435761 % _P


@pytest.fixture(scope="module")
def events_pdf(sf_dir):
    df = pd.read_parquet(f"{sf_dir}/events.parquet")
    df["qv"] = np.floor(df["value"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    return df


def test_reservoir_matches_numpy_and_merges(spark, sf_dir, events_pdf):
    rows = sorted(
        queries()["sample_reservoir_merge"](spark, sf_dir).collect(),
        key=lambda r: r.rank,
    )
    assert all(r.merge_ok for r in rows)
    pri = (events_pdf["event_id"].to_numpy() % _P) * _MULT % _P
    order = np.lexsort((events_pdf["event_id"].to_numpy(), pri))
    want = events_pdf["event_id"].to_numpy()[order][: len(rows)]
    assert [r.event_id for r in rows] == list(want)


def test_quantile_sketch_contract(spark, sf_dir, events_pdf):
    r = queries()["agg_quantile_sketch_mergeable"](spark, sf_dir).collect()[0]
    assert r.p50_in_bucket and r.p99_in_bucket and r.split_invariant
    q = np.sort(events_pdf["qv"].to_numpy())
    n = len(q)
    assert r.n_rows == n
    assert r.exact_p50 == q[int(np.ceil(0.5 * n)) - 1] / 1e6
    assert r.exact_p99 == q[int(np.ceil(0.99 * n)) - 1] / 1e6
    # sketch bucket answers within its 2x relative-error contract
    assert 2 ** (r.p50_bucket - 1) <= q[int(np.ceil(0.5 * n)) - 1] < 2 ** r.p50_bucket


def test_target_encode_loo_excludes_self(spark, sf_dir, events_pdf):
    rows = {
        r.event_type: r
        for r in queries()["features_target_encode_loo"](spark, sf_dir).collect()
    }
    for et, g in events_pdf.groupby("event_type"):
        qv = g["qv"].to_numpy()
        s, n = int(qv.sum()), len(qv)
        te = (s - qv) // (n - 1)
        r = rows[et]
        assert r.n == n
        assert r.te_min_micro == te.min()
        assert r.te_max_micro == te.max()
        assert r.te_mean_micro == int(te.sum()) // n


def test_pr_curve_monotone_recall(spark, sf_dir):
    rows = sorted(
        queries()["ml_pr_curve"](spark, sf_dir).collect(), key=lambda r: r.k
    )
    assert len(rows) == 9
    # raising the threshold can only shrink the predicted-positive set
    npp = [r.n_pred_pos for r in rows]
    assert npp == sorted(npp, reverse=True)
    rec = [r.recall_ppm for r in rows]
    assert rec == sorted(rec, reverse=True)


def test_temperature_mix_boosts_low_resource(spark, sf_dir):
    rows = queries()["corpus_temperature_mix"](spark, sf_dir).collect()
    tot = sum(r.n_tokens for r in rows)
    for r in rows:
        raw = r.raw_share_ppm / 1e6
        temp = r.temp_share_ppm / 1e6
        # temperature sampling pulls shares toward uniform
        if raw < 1 / len(rows):
            assert temp >= raw
        else:
            assert temp <= raw
    assert abs(sum(r.temp_share_ppm for r in rows) - 1000000) < len(rows) + 1


def test_assortativity_in_range(spark, sf_dir):
    r = queries()["graph_degree_assortativity"](spark, sf_dir).collect()[0]
    assert r.n_endpoints > 0
    assert -1.0 <= r.assortativity <= 1.0


def test_silhouette_bounds_and_counts(spark, sf_dir):
    rows = queries()["emb_silhouette"](spark, sf_dir).collect()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    assert sum(r.n_vecs for r in rows) == len(emb)
    for r in rows:
        assert -1000000 <= r.silhouette_min_micro <= 1000000
        assert -1000000 <= r.silhouette_mean_micro <= 1000000
        assert 0 <= r.n_negative <= r.n_vecs


def test_matryoshka_full_dim_is_perfect(spark, sf_dir):
    rows = {
        r.prefix_dim: r
        for r in queries()["emb_matryoshka_eval"](spark, sf_dir).collect()
    }
    assert set(rows) == {8, 16, 64}
    # the 64-dim "prefix" IS the ground truth
    assert rows[64].recall_ppm == 1000000
    # longer prefixes cannot systematically hurt: 64 >= 16 and 64 >= 8
    assert rows[64].recall_ppm >= rows[16].recall_ppm
    assert rows[64].recall_ppm >= rows[8].recall_ppm


def test_filtered_topk_respects_filter(spark, sf_dir):
    rows = queries()["sim_filtered_topk"](spark, sf_dir).collect()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    en = set(docs.loc[docs["lang"] == "en", "doc_id"])
    for r in rows:
        assert r.cid in en
        assert 1 <= r.rank <= 5


def test_freshness_lag_head_is_zero(spark, sf_dir):
    rows = queries()["dq_freshness_lag"](spark, sf_dir).collect()
    assert min(r.lag_s for r in rows) == 0
    for r in rows:
        assert r.sla_breach == (r.lag_s > 3600)


def test_csv_quarantine_counts(spark, sf_dir):
    r = queries()["scan_csv_quarantine"](spark, sf_dir).collect()[0]
    assert r.n_corrupt == 2
    assert r.n_good > 0


def test_relational_division_covers_all(spark, sf_dir):
    rows = queries()["q_relational_division"](spark, sf_dir).collect()
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    n_div = orders["o_orderpriority"].nunique()
    want = (
        orders.groupby("o_custkey")["o_orderpriority"]
        .nunique()
        .pipe(lambda s: set(s[s == n_div].index))
    )
    assert {r.custkey for r in rows} == want


def test_mrr_bounds(spark, sf_dir):
    r = queries()["sim_mrr_eval"](spark, sf_dir).collect()[0]
    assert r.n_queries == 10
    assert 0.0 < r.mrr <= 1.0


def test_hubness_mass_conserved(spark, sf_dir):
    rows = queries()["emb_hubness_audit"](spark, sf_dir).collect()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    n_sample = int((emb["vec_id"] < 500).sum())
    assert sum(r.n_vectors for r in rows) == n_sample
    # total top-k slots == k per query
    assert sum(r.k_occurrence * r.n_vectors for r in rows) == 10 * n_sample


def test_user_lifecycle_identity(spark, sf_dir):
    rows = sorted(
        queries()["win_user_lifecycle"](spark, sf_dir).collect(),
        key=lambda r: r.week,
    )
    for r in rows:
        assert r.n_new + r.n_retained + r.n_resurrected == r.n_active
    # churn(w) = active(w-1) - retained(w)
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_churned == prev.n_active - cur.n_retained
    # first week: everyone is new
    assert rows[0].n_new == rows[0].n_active


def test_qq_deciles_monotone(spark, sf_dir):
    rows = sorted(
        queries()["agg_qq_deciles"](spark, sf_dir).collect(),
        key=lambda r: r.k,
    )
    assert [r.k for r in rows] == list(range(1, 10))
    qa = [r.q_click for r in rows]
    qb = [r.q_error for r in rows]
    assert qa == sorted(qa) and qb == sorted(qb)


def test_knn_confusion_covers_sample(spark, sf_dir):
    rows = queries()["ml_knn_classify"](spark, sf_dir).collect()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    n_sample = int((emb["vec_id"] < 500).sum())
    assert sum(r.n_vecs for r in rows) == n_sample


def test_point_in_polygon_against_float_raycaster(spark, sf_dir):
    rows = queries()["spatial_point_in_polygon"](spark, sf_dir).collect()
    poly = [(-74.0, 45.0), (-72.5, 45.2), (-72.4, 46.6),
            (-73.3, 45.9), (-73.9, 46.7)]

    def inside(px, py):
        # independent float formulation (x-intersection division)
        c = False
        n = len(poly)
        for i in range(n):
            x1, y1 = poly[i]
            x2, y2 = poly[(i + 1) % n]
            if (y1 > py) != (y2 > py):
                xint = x1 + (x2 - x1) * (py - y1) / (y2 - y1)
                if px < xint:
                    c = not c
        return c

    lats = sorted(45.0 + k * 0.25 for k in range(8))
    lons = [-74.0 + k * 0.25 for k in range(8)]
    want = {
        lat: sum(1 for lon in lons if inside(lon, lat)) for lat in lats
    }
    got = {round(r.latitude, 6): r.n_inside for r in rows}
    assert got == {round(k, 6): v for k, v in want.items()}
    assert sum(r.n_points for r in rows) == 64


def test_jl_projection_concentrates(spark, sf_dir):
    r = queries()["emb_random_projection"](spark, sf_dir).collect()[0]
    assert r.n_pairs > 0
    # JL with +-1 entries: ratio concentrates around 1
    assert 0.2 < r.median_ratio < 3.0
    assert r.min_ratio <= r.median_ratio <= r.max_ratio
    assert r.min_ratio >= 0.0


def test_skyline_is_pareto_front(spark, sf_dir):
    rows = queries()["agg_skyline_pareto"](spark, sf_dir).collect()
    part = pd.read_parquet(f"{sf_dir}/part.parquet")
    price_c = np.floor(part["p_retailprice"].to_numpy() * 100 + 0.5).astype(
        np.int64
    )
    size = part["p_size"].to_numpy().astype(np.int64)
    sky_keys = {r.p_partkey for r in rows}
    # brute-force dominance check: no returned point is dominated
    for r in rows:
        pc = int(round(r.price * 100))
        dominated = (
            ((price_c <= pc) & (size >= r.size))
            & ((price_c < pc) | (size > r.size))
        ).any()
        # equal-pair duplicates may exist; require no STRICT dominator
        strict = ((price_c <= pc) & (size > r.size)) | (
            (price_c < pc) & (size >= r.size)
        )
        assert not strict.any()
    assert len(sky_keys) == len(rows)
