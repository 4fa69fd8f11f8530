"""SemDeDup flagship (dedup_semantic_e2e): exact ε-ball coverage and
keep-one-per-ball semantics on a replica-heavy corpus, through the
salt-split guard (patched cap → 30 salt groups over one cluster)."""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from cs_pipeline_spark.operators import dedup as D
from cs_pipeline_spark.operators import similarity as S

N_REP = 600


@pytest.fixture(scope="module")
def replica_sf(tmp_path_factory):
    ids, vecs, labels = [], [], []
    # k-means seeds (vec_id < 4): orthogonal basis directions
    for i in range(4):
        e = np.zeros(64)
        e[i] = 1.0
        ids.append(i), vecs.append(e), labels.append(0)
    vhot = np.sin(np.arange(64) * 0.11 + 2.0)
    vhot = vhot / np.linalg.norm(vhot)
    for i in range(N_REP):
        ids.append(100 + i), vecs.append(vhot.copy()), labels.append(1)
    for i in range(10):
        e = np.zeros(64)
        e[10 + i] = 1.0
        ids.append(900 + i), vecs.append(e), labels.append(2)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    out = tmp_path_factory.mktemp("sem")
    pq.write_table(tbl, os.path.join(str(out), "embeddings.parquet"))
    return str(out)


def test_replica_cluster_keeps_exactly_one(spark, replica_sf, monkeypatch):
    """600 identical vectors: every pair is an ε-pair, the keep rule
    retains exactly the min vec_id, and the salt split (cap patched to
    40 → 30 groups) covers all C(600,2) pairs exactly once."""
    monkeypatch.setattr(D, "_COS_BLOCK_CAP", 40)
    from cs_pipeline_spark.registry import all_specs

    out = {
        r.stage: r.n_vecs
        for r in all_specs()["dedup_semantic_e2e"]
        .fn.__wrapped__(spark, replica_sf)
        .collect()
    }
    n_total = 4 + N_REP + 10
    assert out["ingest"] == n_total
    # every replica pair found exactly once: C(600, 2); decoys are
    # orthogonal (cos ≤ max |vhot_i| < tau) so they contribute none
    assert out["eps_pairs"] == N_REP * (N_REP - 1) // 2
    # equal d2 -> ordering falls to vec_id: min id survives each pair
    assert out["dropped"] == N_REP - 1
    assert out["kept"] == n_total - (N_REP - 1)


def test_funnel_matches_unsalted(spark, replica_sf, monkeypatch):
    """The salt factor must be invisible in the output: patched-cap
    (30 groups) and default-cap (1 group) runs agree row for row."""
    from cs_pipeline_spark.registry import all_specs

    fn = all_specs()["dedup_semantic_e2e"].fn.__wrapped__
    base = {r.stage: r.n_vecs for r in fn(spark, replica_sf).collect()}
    monkeypatch.setattr(D, "_COS_BLOCK_CAP", 40)
    salted = {r.stage: r.n_vecs for r in fn(spark, replica_sf).collect()}
    assert base == salted
