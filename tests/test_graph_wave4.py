"""Invariants for wave-4 ops: PageRank, degree profile, IVF-PQ,
linear trend, k-anonymity."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from cs_pipeline_spark.operators.aggregate import agg_linear_trend
from cs_pipeline_spark.operators.filters import dq_k_anonymity
from cs_pipeline_spark.operators.graph import (
    _ITERS,
    graph_degree_stats,
    graph_pagerank,
)
from cs_pipeline_spark.operators.similarity import (
    TOP_K,
    sim_ivf_pq_topk,
)
from cs_pipeline_spark.tables import load


def _py_pagerank(n: int) -> dict[int, int]:
    """Direct Python replay of the integer recurrence."""
    edges = set()
    for d in range(n):
        edges.add((d, (d * 4 + 3) % n))
        edges.add((d, (d * 10 + 5) % n))
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {v: 1000000 for v in range(n)}
    for _ in range(_ITERS):
        contrib: dict[int, int] = {}
        for s, t in edges:
            contrib[t] = contrib.get(t, 0) + r[s] // outdeg[s]
        r = {
            v: 150000 + (850000 * contrib.get(v, 0)) // 1000000
            for v in range(n)
        }
    return r


def test_pagerank_matches_python_replay(spark, sf_dir):
    got = {
        r["doc_id"]: r["rank_scaled"]
        for r in graph_pagerank(spark, sf_dir).collect()
    }
    n = load(spark, "documents", sf_dir).count()
    want = _py_pagerank(n)
    assert got == want
    # orphans (no in-links) sit at exactly the damping floor
    in_deg: dict[int, int] = {}
    for d in range(n):
        for t in [(d * 4 + 3) % n, (d * 10 + 5) % n]:
            in_deg[t] = in_deg.get(t, 0) + 1
    orphans = [v for v in range(n) if v not in in_deg]
    assert orphans, "lossy maps should leave orphans"
    assert all(got[v] == 150000 for v in orphans)
    # hubs outrank orphans
    assert max(got.values()) > 10 * 150000


def test_degree_stats_partition_nodes(spark, sf_dir):
    rows = graph_degree_stats(spark, sf_dir).collect()
    n = load(spark, "documents", sf_dir).count()
    assert sum(r["n_nodes"] for r in rows) == n
    assert {r["in_deg"] for r in rows} >= {0}  # orphans present


def test_ivf_pq_neighbors_stay_in_cell(spark, sf_dir):
    rows = sim_ivf_pq_topk(spark, sf_dir).collect()
    labels = {
        r["vec_id"]: r["label"]
        for r in load(spark, "embeddings", sf_dir)
        .select("vec_id", "label")
        .collect()
    }
    per_q: dict[int, list] = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
        assert labels[r["neighbor_id"]] == labels[r["query_id"]]
        assert r["neighbor_id"] != r["query_id"]
    for q, grp in per_q.items():
        assert len(grp) <= TOP_K
        grp.sort(key=lambda r: r["rank"])
        sims = [r["cos_sim"] for r in grp]
        assert sims == sorted(sims, reverse=True)


def test_linear_trend_matches_lstsq(spark, sf_dir):
    rows = agg_linear_trend(spark, sf_dir).collect()
    ev = (
        load(spark, "events", sf_dir)
        .filter(F.col("event_type") != "click")
        .select("user_id", F.expr("unix_micros(ts) div 1000000").alias("x"), "value")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append((r["x"], r["value"]))
    for r in rows:
        pts = by_user[r["user_id"]]
        assert r["n_obs"] == len(pts)
        xs = np.array([p[0] for p in pts], dtype=float)
        ys = np.array([p[1] for p in pts], dtype=float)
        if np.ptp(xs) == 0:
            assert r["slope_per_sec"] is None
            continue
        slope = np.polyfit(xs - xs.min(), ys, 1)[0]
        assert abs(r["slope_per_sec"] - slope) < 1e-6 + abs(slope) * 1e-5


def test_k_anonymity_partitions_corpus(spark, sf_dir):
    rows = dq_k_anonymity(spark, sf_dir).collect()
    n = load(spark, "documents", sf_dir).count()
    assert sum(r["group_size"] for r in rows) == n
    for r in rows:
        assert r["violates_k"] == (r["group_size"] < 5)


def _py_und_edges(n: int) -> set[tuple[int, int]]:
    und = set()
    for d in range(n):
        for dst in ((d * 4 + 3) % n, (d * 10 + 5) % n):
            if dst != d:
                und.add((min(d, dst), max(d, dst)))
    return und


def test_triangles_match_bruteforce(spark, sf_dir):
    from cs_pipeline_spark.operators.graph import graph_triangles

    n = load(spark, "documents", sf_dir).count()
    und = _py_und_edges(n)
    nbrs: dict[int, set[int]] = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    tri = 0
    for a, b in und:
        tri += len(nbrs[a] & nbrs[b])
    tri //= 3  # each triangle counted once per edge
    row = graph_triangles(spark, sf_dir).collect()[0]
    assert row.n_triangles == tri
    assert 0.0 <= row.clustering_coeff <= 1.0


def test_common_neighbors_scores_valid(spark, sf_dir):
    from cs_pipeline_spark.operators.graph import graph_common_neighbors

    n = load(spark, "documents", sf_dir).count()
    und = _py_und_edges(n)
    rows = graph_common_neighbors(spark, sf_dir).collect()
    assert rows, "candidate set empty"
    for r in rows:
        assert r.n_common >= 2
        assert 0.0 < r.jaccard <= 1.0
        assert (r.x, r.y) not in und, "existing edge not removed"
