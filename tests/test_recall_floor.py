"""Recall-floor audits for every guarded dedup/LSH path (VERDICT r6 #1).

Hash/rows checks and bounded-runtime guards cannot see RECALL: round 6
proved it when ``dedup_embedding_lsh``'s old exclusion guard returned
ZERO pairs on exactly its target workload (a fully-replicated corpus)
while every gate stayed green. These tests plant duplicate clusters
with KNOWN structure — exact replicas (hot-bucket scale), near-dups at
controlled Jaccard/cosine, unique decoys — and assert a minimum
pair/cluster recall through each guard path:

- minhash hot-band star         (_banded_candidates, dedup.py)
- minhash near-dup banding      (probabilistic, deterministic hashes)
- ngram-Jaccard blocked verify  (exact within block -> recall 1)
- containment blocked verify    (exact within block -> recall 1)
- simhash chunk buckets         (replica fingerprint identity +
                                 near-dup pigeonhole chunk sharing)
- embedding-LSH hot-bucket star (600 replicas > _LSH_BUCKET_CAP)
- embedding-cosine salt-split   (every unordered pair exactly once)
- hyperplane LSH top-k          (planted twin must be retrieved)

All hash constants are fixed/deterministic, so every assertion is
stable across runs — once green, a future guard change that silently
drops recall turns one of these red.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from cs_pipeline_spark.operators import dedup as D
from cs_pipeline_spark.operators import similarity as S
from cs_pipeline_spark.operators.dedup import connected_components

N_REP = 250  # exact-replica cluster size (> _MINHASH_BAND_CAP = 200)
N_PAIRS = 20  # planted near-dup pairs at controlled Jaccard
N_EMB_REP = 600  # embedding replica cluster (> _LSH_BUCKET_CAP = 500)


def _write_docs(path, rows):
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source"]
    )
    pdf["n_chars"] = pdf["text"].str.len()
    pdf.to_parquet(os.path.join(path, "documents.parquet"), index=False)
    return str(path)


def _write_embeddings(path, vec_ids, vecs, labels):
    tbl = pa.table(
        {
            "vec_id": pa.array(vec_ids, pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(path, "embeddings.parquet"))
    return str(path)


@pytest.fixture(scope="module")
def docs_sf(tmp_path_factory):
    """Planted document corpus with known duplicate structure."""
    rows = []
    # hot cluster: N_REP exact replicas -> every band bucket is hot
    rep_text = " ".join(f"rep{i}" for i in range(60))
    for i in range(N_REP):
        rows.append((i, rep_text, "en", "rep"))
    # near-dup pairs p: 60 unique tokens, variant swaps token 30
    # -> 3-gram Jaccard = (58-3)/(58+3) = 55/61 ~ 0.902
    for p in range(N_PAIRS):
        toks = [f"p{p}t{i}" for i in range(60)]
        base = " ".join(toks)
        toks[30] = f"p{p}x"
        var = " ".join(toks)
        rows.append((1000 + 2 * p, base, "en", "near"))
        rows.append((1000 + 2 * p + 1, var, "en", "near"))
    # containment plant: excerpt is a contiguous 25-token slice of host
    host_toks = [f"h{i}" for i in range(60)]
    rows.append((2000, " ".join(host_toks), "en", "cont"))
    rows.append((2001, " ".join(host_toks[20:45]), "en", "cont"))
    # unique decoys across a few sources
    for i in range(50):
        rows.append(
            (
                3000 + i,
                " ".join(f"d{i}u{j}" for j in range(40)),
                "en",
                f"dec{i % 7}",
            )
        )
    return _write_docs(tmp_path_factory.mktemp("docs"), rows)


def _unit(v):
    return v / np.linalg.norm(v)


@pytest.fixture(scope="module")
def emb_hot_sf(tmp_path_factory):
    """Embeddings with a >cap replica cluster, a near-identical
    cluster, a planted query twin, and orthogonal decoys."""
    rng = np.random.default_rng(7)
    ids, vecs, labels = [], [], []
    # queries 0..7 (sim_lsh_hyperplane uses vec_id < 8)
    qvec = _unit(np.sin(np.arange(64) * 0.37 + 1.0))
    ids.append(0), vecs.append(qvec), labels.append(0)
    for i in range(1, 8):
        e = np.zeros(64)
        e[i] = 1.0
        ids.append(i), vecs.append(e), labels.append(0)
    # planted twin of query 0 (identical -> same bucket, cos = 1)
    ids.append(50), vecs.append(qvec.copy()), labels.append(0)
    # hot cluster: N_EMB_REP exact replicas of one vector
    vhot = _unit(np.cos(np.arange(64) * 0.11 + 2.0))
    for i in range(N_EMB_REP):
        ids.append(100 + i), vecs.append(vhot.copy()), labels.append(1)
    # near-identical cluster: cos ~ 0.9999 pairwise. Noise must stay
    # far below the smallest |qdot(ubase, plane)| margin: an 8-bit
    # band flips whenever the noise projection crosses a plane, and
    # the band-AND makes bucket agreement the product over 8 planes —
    # 0.002 keeps every sign bit stable with overwhelming margin.
    ubase = _unit(np.sin(np.arange(64) * 0.53 + 3.0))
    for i in range(10):
        ids.append(800 + i)
        vecs.append(_unit(ubase + 0.002 * rng.standard_normal(64)))
        labels.append(2)
    # orthogonal decoys (distinct basis directions -> cos 0)
    for i in range(30):
        e = np.zeros(64)
        e[(i + 8) % 64] = 1.0
        ids.append(900 + i), vecs.append(e), labels.append(4)
    return _write_embeddings(
        tmp_path_factory.mktemp("emb_hot"), ids, vecs, labels
    )


@pytest.fixture(scope="module")
def emb_salt_sf(tmp_path_factory):
    """One label with 10 replicas + 70 random decoys — sized so a
    patched _COS_BLOCK_CAP forces multi-group salt-splitting."""
    rng = np.random.default_rng(11)
    ids, vecs, labels = [], [], []
    base = _unit(np.sin(np.arange(64) * 0.29 + 5.0))
    for i in range(10):
        ids.append(i), vecs.append(base.copy()), labels.append(3)
    for i in range(70):
        v = _unit(rng.choice([-1.0, 1.0], size=64))
        ids.append(100 + i), vecs.append(v), labels.append(3)
    return _write_embeddings(
        tmp_path_factory.mktemp("emb_salt"), ids, vecs, labels
    )


# ---------- MinHash-LSH ----------


def _minhash_pairs(spark, docs_sf):
    fn = __import__(
        "cs_pipeline_spark.registry", fromlist=["all_specs"]
    ).all_specs()["dedup_minhash_lsh"].fn.__wrapped__
    return fn(spark, docs_sf).collect()


def test_minhash_hot_star_cluster_recall(spark, docs_sf):
    """250 replicas force the star guard in EVERY band; connectivity
    (one CC component over all 250) must survive it."""
    rows = _minhash_pairs(spark, docs_sf)
    rep = [
        (r.doc_a, r.doc_b)
        for r in rows
        if r.doc_a < N_REP and r.doc_b < N_REP
    ]
    assert len(rep) >= N_REP - 1  # star floor: n-1 pairs minimum
    assert all(
        r.jaccard == 1.0
        for r in rows
        if r.doc_a < N_REP and r.doc_b < N_REP
    )
    edges = spark.createDataFrame(rep, "src long, dst long")
    comp = connected_components(edges).collect()
    assert len({r.label for r in comp}) == 1
    assert len(comp) == N_REP


def test_minhash_near_dup_pair_recall(spark, docs_sf):
    """Planted J~0.902 pairs: banding theory gives ~98.7% candidate
    probability per pair; deterministic hashes make the realized
    recall stable. Floor: 85%."""
    rows = _minhash_pairs(spark, docs_sf)
    got = {(r.doc_a, r.doc_b) for r in rows}
    planted = {
        (1000 + 2 * p, 1000 + 2 * p + 1) for p in range(N_PAIRS)
    }
    recall = len(planted & got) / len(planted)
    assert recall >= 0.85, f"minhash near-dup recall {recall}"


# ---------- exact blocked verifies (recall 1 within block) ----------


def test_ngram_jaccard_blocked_recall_is_total(spark, docs_sf):
    from cs_pipeline_spark.registry import all_specs

    fn = all_specs()["dedup_ngram_jaccard"].fn.__wrapped__
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in fn(spark, docs_sf).collect()
    }
    for p in range(N_PAIRS):
        k = (1000 + 2 * p, 1000 + 2 * p + 1)
        assert k in got, f"planted ngram pair {k} missed"
        assert abs(got[k] - 55.0 / 61.0) < 1e-12


def test_containment_excerpt_recall(spark, docs_sf):
    from cs_pipeline_spark.registry import all_specs

    fn = all_specs()["dedup_containment"].fn.__wrapped__
    rows = fn(spark, docs_sf).collect()
    hit = [
        r for r in rows if r.src_doc == 2001 and r.dst_doc == 2000
    ]
    assert len(hit) == 1
    assert hit[0].containment == 1.0  # every excerpt shingle in host


# ---------- SimHash ----------


def test_simhash_replica_identity_and_neardup_chunks(spark, docs_sf):
    from cs_pipeline_spark.registry import all_specs

    docs = spark.read.parquet(
        os.path.join(docs_sf, "documents.parquet")
    )
    fp = {
        r.doc_id: r.sh
        for r in docs.select(
            "doc_id", D._make_simhash_udf()(F_col("text")).alias("sh")
        ).collect()
    }
    # replicas: identical fingerprints
    assert len({fp[i] for i in range(N_REP)}) == 1
    # near-dups: hamming <= 3 -> pigeonhole guarantees a shared 16-bit
    # chunk (the bucket the builder blocks on)
    def chunks(v):
        return {(v >> (16 * c)) & 0xFFFF for c in range(4)}

    n_shared = 0
    for p in range(N_PAIRS):
        a, b = fp[1000 + 2 * p], fp[1000 + 2 * p + 1]
        ham = bin((a ^ b) & ((1 << 64) - 1)).count("1")
        if ham <= 3:
            assert chunks(a) & chunks(b)
        if chunks(a) & chunks(b):
            n_shared += 1
    # 1-token-of-60 perturbation keeps most bit votes stable; floor 85%
    assert n_shared / N_PAIRS >= 0.85
    # builder output: the replica bucket is visible at cluster size
    out = all_specs()["dedup_simhash"].fn.__wrapped__(
        spark, docs_sf
    ).collect()
    assert max(r.n_docs for r in out) >= N_REP


# ---------- embedding LSH (hot star) ----------


def test_embedding_lsh_hot_star_recall(spark, emb_hot_sf):
    """600 identical vectors (> _LSH_BUCKET_CAP) — the round-6 silent
    zero-pairs collapse workload. Star must keep one component."""
    from cs_pipeline_spark.registry import all_specs

    fn = all_specs()["dedup_embedding_lsh"].fn.__wrapped__
    rows = fn(spark, emb_hot_sf).collect()
    rep = [
        (r.vec_a, r.vec_b)
        for r in rows
        if 100 <= r.vec_a < 100 + N_EMB_REP
        and 100 <= r.vec_b < 100 + N_EMB_REP
    ]
    assert len(rep) >= N_EMB_REP - 1
    edges = spark.createDataFrame(rep, "src long, dst long")
    comp = connected_components(edges).collect()
    assert len({r.label for r in comp}) == 1
    assert len(comp) == N_EMB_REP
    # near-identical 10-cluster (cos ~ 0.999): pair recall floor 90%
    nd = {
        (r.vec_a, r.vec_b)
        for r in rows
        if 800 <= r.vec_a < 810 and 800 <= r.vec_b < 810
    }
    assert len(nd) / 45 >= 0.90, f"near-identical recall {len(nd)}/45"
    # planted query twin is recalled too (identical -> same buckets)
    assert any(r.vec_a == 0 and r.vec_b == 50 for r in rows)


# ---------- embedding cosine (salt split) ----------


def test_embedding_cosine_salt_split_total_recall(
    spark, emb_salt_sf, monkeypatch
):
    """Patch the block cap so the 80-row label splits into 4 salt
    groups; the split must cover every unordered pair exactly once —
    all 45 replica pairs returned, none duplicated."""
    from cs_pipeline_spark.registry import all_specs

    monkeypatch.setattr(D, "_COS_BLOCK_CAP", 40)
    fn = all_specs()["dedup_embedding_cosine"].fn.__wrapped__
    rows = fn(spark, emb_salt_sf).collect()
    rep = [
        (r.vec_a, r.vec_b)
        for r in rows
        if r.vec_a < 10 and r.vec_b < 10
    ]
    assert sorted(rep) == [
        (a, b) for a in range(10) for b in range(a + 1, 10)
    ]
    # exactly-once: no pair may arrive from two salt blocks
    assert len(rows) == len({(r.vec_a, r.vec_b) for r in rows})


# ---------- hyperplane LSH top-k ----------


def test_hyperplane_lsh_planted_twin_in_topk(spark, emb_hot_sf):
    from cs_pipeline_spark.registry import all_specs

    fn = all_specs()["sim_lsh_hyperplane"].fn.__wrapped__
    rows = fn(spark, emb_hot_sf).collect()
    q0 = [r for r in rows if r.query_id == 0]
    assert any(
        r.neighbor_id == 50 and r.cos_sim > 0.999 for r in q0
    ), "identical twin not retrieved from query 0's bucket"


from pyspark.sql.functions import col as F_col  # noqa: E402


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-q"]))


@pytest.fixture(scope="module")
def repeat_docs_sf(tmp_path_factory):
    """Corpus with a planted LONG repeat: a 30-token passage embedded
    verbatim inside two otherwise-unique documents (at different
    offsets), plus a short 5-token shared phrase (below the k=8
    anchor) and unique decoys."""
    passage = [f"rep{j}" for j in range(30)]
    short = [f"sh{j}" for j in range(5)]
    host_a = [f"a{j}" for j in range(10)] + passage + [f"a{j}" for j in range(10, 25)]
    host_b = [f"b{j}" for j in range(20)] + passage + [f"b{j}" for j in range(20, 28)]
    rows = [
        (1, " ".join(host_a), "en", "rep"),
        (2, " ".join(host_b), "en", "rep"),
        (3, " ".join([f"c{j}" for j in range(12)] + short + [f"c{j}" for j in range(12, 30)]), "en", "short"),
        (4, " ".join([f"e{j}" for j in range(9)] + short + [f"e{j}" for j in range(9, 31)]), "en", "short"),
    ]
    for i in range(20):
        rows.append((100 + i, " ".join(f"d{i}u{j}" for j in range(40)), "en", "dec"))
    return _write_docs(tmp_path_factory.mktemp("repeats"), rows)


def test_substring_repeat_full_span_recall(spark, repeat_docs_sf):
    """The arbitrary-length contract: the ENTIRE 30-token planted
    repeat (not just one anchor window) must be covered by one merged
    span in the non-first document, the first occurrence is kept, and
    sub-anchor (5-token) shared phrases are never cut."""
    from cs_pipeline_spark.operators.training import (
        _REP_K,
        dedup_substring_repeats,
    )

    rows = dedup_substring_repeats.__wrapped__(spark, repeat_docs_sf).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1 holds the corpus-first occurrence -> kept (no cut spans)
    assert 1 not in by_doc
    # doc 2's copy at 1-based token 21, length 30: windows 21..43 all
    # duplicated, merged into ONE span covering the whole passage
    assert len(by_doc.get(2, [])) == 1
    span = by_doc[2][0]
    start, ln = span["span_start"], span["span_len"]
    assert start == 21 and ln == 30  # exact maximal-span coverage
    assert span["n_windows"] == 30 - _REP_K + 1
    # the 5-token shared phrase is below the anchor width -> untouched
    assert 3 not in by_doc and 4 not in by_doc
    # decoys are unique -> no spans anywhere else
    assert set(by_doc) == {2}


@pytest.fixture(scope="module")
def cdc_docs_sf(tmp_path_factory):
    """Shift-resistance fixture: doc 2 is doc 1 with a NEW PREFIX
    prepended (the edit byte-offset chunking cannot survive); doc 3
    is unrelated."""
    import random

    rng = random.Random(424242)
    words = [f"w{rng.randrange(10000)}" for _ in range(400)]
    body = " ".join(words)
    rows = [
        (1, body, "en", "a"),
        (2, "entirely fresh leading sentence inserted up front. " + body,
         "en", "b"),
        (3, " ".join(f"z{rng.randrange(10000)}" for _ in range(400)),
         "en", "c"),
    ]
    return _write_docs(tmp_path_factory.mktemp("cdc"), rows)


def test_cdc_chunks_survive_prefix_shift(spark, cdc_docs_sf):
    """The CDC contract: after a prefix insertion, all chunks past the
    first boundary re-align — docs 1 and 2 must share MOST of their
    chunk mass, and the unrelated doc 3 must share none."""
    from cs_pipeline_spark.operators.dedup import dedup_cdc_chunks

    rows = {
        r.doc_id: r
        for r in dedup_cdc_chunks.__wrapped__(spark, cdc_docs_sf).collect()
    }
    assert set(rows) == {1, 2, 3}
    # shift-resistance floor: >= 60% of doc 1's chunks re-occur in
    # doc 2 despite the prefix edit (byte-offset chunking would give 0)
    assert rows[1].dup_chunks >= 0.6 * rows[1].n_chunks > 0
    assert rows[2].dup_chunks > 0
    assert rows[3].dup_chunks == 0
    # the duplicated mass is a real fraction of the ~2.4k-char body,
    # not a lone boundary chunk
    assert rows[1].dup_chars >= 1000
