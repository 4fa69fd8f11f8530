"""Invariants for the curation wave: mix weights, budget selection,
LTTB downsampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from cs_pipeline_spark.operators.corpus import (
    corpus_budget_select,
    corpus_mix_weights,
)
from cs_pipeline_spark.operators.windows import (
    _LTTB_BUCKET_US,
    ts_downsample_lttb,
)
from cs_pipeline_spark.tables import load


def test_mix_weights_invariants(spark, sf_dir):
    rows = corpus_mix_weights(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.sample_rate <= 1.0
        assert r.epochs_needed >= 1
        if r.n_tokens >= r.target_tokens:
            # downsampled domain: rate hits the target exactly (6 dp)
            assert abs(r.sample_rate * r.n_tokens - r.target_tokens) < (
                r.n_tokens / 5e5
            )
            assert r.epochs_needed == 1
        else:
            # oversampled domain: rate capped, repeats cover the gap
            assert r.sample_rate == 1.0
            assert r.epochs_needed * r.n_tokens >= r.target_tokens


def test_budget_select_greedy_prefix(spark, sf_dir):
    sel = corpus_budget_select(spark, sf_dir).collect()
    assert sel
    by_lang: dict[str, list] = {}
    for r in sel:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rows in by_lang.items():
        rows.sort(key=lambda r: r.rnk)
        # selection is a contiguous rank prefix
        assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
        # greedy stop: all but the boundary doc fit strictly under b;
        # reconstruct the budget from the full corpus
        total = (
            load(spark, sf_dir=sf_dir, name="documents")
            .filter(F.col("lang") == lang)
            .select(
                F.size(
                    F.split(
                        F.trim(
                            F.regexp_replace(F.lower("text"), r"\s+", " ")
                        ),
                        " ",
                    )
                ).alias("n")
            )
            .agg(F.sum("n"))
            .collect()[0][0]
        )
        b = total // 3
        cum = sum(r.n_tok for r in rows)
        assert cum - rows[-1].n_tok < b, lang
        assert cum >= b, f"{lang}: budget not exhausted"


def test_lttb_one_point_per_interior_bucket(spark, sf_dir):
    ev = load(spark, "events", sf_dir)
    raw = ev.select(
        "event_type",
        F.expr(f"unix_micros(ts) div {_LTTB_BUCKET_US}").alias("bkt"),
    ).distinct().collect()
    buckets = {}
    for r in raw:
        buckets.setdefault(r.event_type, set()).add(r.bkt)
    out = ts_downsample_lttb(spark, sf_dir).collect()
    seen = {}
    for r in out:
        key = (r.event_type, r.bkt)
        assert key not in seen, "duplicate bucket champion"
        seen[key] = r
        # champion's timestamp really falls inside its bucket
        assert r.ts_us // _LTTB_BUCKET_US == r.bkt
    for et, bks in buckets.items():
        interior = {
            b for b in bks if (b - 1) in bks and (b + 1) in bks
        }
        got = {b for (e, b) in seen if e == et}
        assert got == interior, et


def test_cusum_matches_sequential_recurrence(spark, sf_dir):
    """C_t − min prefix C  ==  S_t = max(0, S_{t−1} + d_t) — replay the
    classic sequential CUSUM in Python over the same hourly series and
    compare each series' peak."""
    from fractions import Fraction

    from cs_pipeline_spark.operators.windows import (
        _CUSUM_BUCKET_US,
        win_cusum_changepoint,
    )

    ev = load(spark, "events", sf_dir)
    rows = ev.select(
        "event_type",
        F.expr(f"unix_micros(ts) div {_CUSUM_BUCKET_US}").alias("bkt"),
        F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5))
        .cast("long")
        .alias("q"),
    ).collect()
    series: dict[str, dict[int, int]] = {}
    for r in rows:
        series.setdefault(r.event_type, {}).setdefault(r.bkt, 0)
        series[r.event_type][r.bkt] += r.q
    expected = {}
    for et, by_bkt in series.items():
        xs = [by_bkt[b] for b in sorted(by_bkt)]
        bks = sorted(by_bkt)
        n, s = len(xs), sum(xs)
        st, peak, peak_b = 0, None, None
        for b, x in zip(bks, xs):
            st = max(0, st + n * x - s)  # deviations scaled by n
            if peak is None or st > peak:
                peak, peak_b = st, b
        expected[et] = (peak_b, Fraction(peak, n * 10**6))
    got = {
        r.event_type: (r.peak_bkt, r.peak_cusum)
        for r in win_cusum_changepoint(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for et, (pb, pc) in expected.items():
        assert got[et][0] == pb, et
        assert abs(got[et][1] - float(pc)) < 5e-7, et


def test_mmr_diversifies_vs_pure_relevance(spark, sf_dir):
    """The MMR set must (a) start at the argmax-relevance doc and (b)
    not be more redundant than plain top-k by relevance."""
    import itertools

    import numpy as np

    from cs_pipeline_spark.operators.similarity import (
        _MMR_K,
        sim_mmr_rerank,
    )

    out = sorted(
        sim_mmr_rerank(spark, sf_dir).collect(), key=lambda r: r.sel_rank
    )
    assert len(out) == _MMR_K
    rels = [r.rel for r in out]
    assert rels[0] == max(rels), "rank 1 must be the most relevant"

    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load(spark, "embeddings", sf_dir).collect()
    }

    def cos(a, b):
        return float(
            emb[a] @ emb[b] / (np.linalg.norm(emb[a]) * np.linalg.norm(emb[b]))
        )

    def max_pair_sim(ids):
        return max(cos(a, b) for a, b in itertools.combinations(ids, 2))

    q = emb[0]
    rel_rank = sorted(
        (vid for vid in emb if vid != 0),
        key=lambda v: (
            -(q @ emb[v] / (np.linalg.norm(q) * np.linalg.norm(emb[v]))),
            v,
        ),
    )
    topk = rel_rank[:_MMR_K]
    mmr_ids = [r.vec_id for r in out]
    assert max_pair_sim(mmr_ids) <= max_pair_sim(topk) + 1e-9


def test_pca_power_invariants(spark, sf_dir):
    """(a) unit component; (b) the Rayleigh quotient beats the starting
    vector's (power iteration never decreases it); (c) the quotient
    can't exceed numpy's top eigenvalue of the same quantized
    covariance."""
    import numpy as np

    from cs_pipeline_spark.operators.similarity import (
        _COV_DIMS,
        emb_pca_power,
    )

    rows = sorted(emb_pca_power(spark, sf_dir).collect(), key=lambda r: r.dim)
    comp = np.array([r.component for r in rows])
    eigval = rows[0].eigval
    assert abs(np.linalg.norm(comp) - 1.0) < 1e-4

    emb = np.stack(
        [
            np.array(r.embedding, dtype=np.float64)
            for r in load(spark, "embeddings", sf_dir).collect()
        ]
    )[:, :_COV_DIMS]
    q = np.floor(emb * 1e6 + 0.5)
    C = np.cov(q.T, bias=True) / 1e12
    w = np.linalg.eigvalsh(C)
    v0 = np.ones(_COV_DIMS)
    ray0 = (v0 @ C @ v0) / (v0 @ v0)
    assert eigval >= ray0 - 1e-6, "Rayleigh quotient decreased"
    assert eigval <= w[-1] + 1e-6, "quotient above the top eigenvalue"


def test_nearest_2d_matches_bruteforce(spark, sf_dir):
    from cs_pipeline_spark.functions.era5_fixture import era5_events
    from cs_pipeline_spark.operators.spatial import join_nearest_2d

    grid = [
        (r.latitude, r.longitude)
        for r in era5_events(spark, sf_dir)
        .select("latitude", "longitude")
        .distinct()
        .collect()
    ]
    out = join_nearest_2d(spark, sf_dir).collect()
    assert len(out) == 25
    for r in out:
        qi = lambda x: int(x * 1e6 + 0.5) if x >= 0 else -int(-x * 1e6 + 0.5)
        best = min(
            grid,
            key=lambda g: (
                (qi(r.s_lat) - qi(g[0])) ** 2 + (qi(r.s_lon) - qi(g[1])) ** 2,
                g[0],
                g[1],
            ),
        )
        assert (r.nn_lat, r.nn_lon) == best, r.station_id


def test_ks_statistic_matches_python(spark, sf_dir):
    from fractions import Fraction

    from cs_pipeline_spark.operators.aggregate import agg_ks_test

    rows = (
        load(spark, "events", sf_dir)
        .filter(F.col("event_type").isin("click", "error"))
        .select("value", "event_id", "event_type")
        .collect()
    )
    pts = sorted((r.value, r.event_id, r.event_type) for r in rows)
    na = sum(1 for p in pts if p[2] == "click")
    nb = len(pts) - na
    ca = cb = 0
    best = Fraction(0)
    for v, _, t in pts:
        if t == "click":
            ca += 1
        else:
            cb += 1
        best = max(best, abs(Fraction(ca, na) - Fraction(cb, nb)))
    got = agg_ks_test(spark, sf_dir).collect()[0]
    assert got.n_a == na and got.n_b == nb
    assert abs(got.ks_d - float(best)) < 5e-7


def test_kmeans_inertia_monotone(spark, sf_dir):
    from cs_pipeline_spark.operators.similarity import emb_kmeans_lloyd

    rows = sorted(
        emb_kmeans_lloyd(spark, sf_dir).collect(), key=lambda r: r.round
    )
    inertias = [r.inertia_scaled for r in rows]
    assert len(inertias) == 4
    assert all(
        a >= b for a, b in zip(inertias, inertias[1:])
    ), f"Lloyd's inertia increased: {inertias}"
    assert inertias[-1] < inertias[0], "no improvement over init"


def test_polygon_contains_matches_shoelace_bruteforce(spark, sf_dir):
    """Cross-check ray casting against matplotlib-free pure-Python
    point-in-polygon, including the concave polygon's notch."""
    from cs_pipeline_spark.operators.spatial import (
        _POLYGONS,
        filter_polygon_contains,
    )

    def inside(px, py, verts):
        n, c = len(verts), False
        for i in range(n):
            x1, y1 = verts[i]
            x2, y2 = verts[(i + 1) % n]
            if (y1 > py) != (y2 > py):
                if y2 > y1:
                    hit = (px - x1) * (y2 - y1) < (x2 - x1) * (py - y1)
                else:
                    hit = (px - x1) * (y2 - y1) > (x2 - x1) * (py - y1)
                if hit:
                    c = not c
        return c

    got = {
        (r.station_id, r.polygon_id)
        for r in filter_polygon_contains(spark, sf_dir).collect()
    }
    want = set()
    for k in range(25):
        py = int((45.0 + (k * 7 % 80) / 40.0) * 1e6 + 0.5)
        px = round((-74.0 + (k * 11 % 80) / 40.0) * 1e6)
        for pid, verts in _POLYGONS.items():
            if inside(px, py, verts):
                want.add((k, pid))
    assert got == want
    # the concave polygon must exclude at least one station that its
    # bounding box would include (the notch) — proves real ray casting
    bx = [v[0] for v in _POLYGONS[1]]
    by = [v[1] for v in _POLYGONS[1]]
    notch = [
        k
        for k in range(25)
        if min(bx)
        <= round((-74.0 + (k * 11 % 80) / 40.0) * 1e6)
        <= max(bx)
        and min(by) <= int((45.0 + (k * 7 % 80) / 40.0) * 1e6 + 0.5) <= max(by)
        and (k, 1) not in want
    ]
    assert notch, "no station falls in the concave notch — weak fixture"
