"""Connected-components and top-k pre-reduce invariants."""

from __future__ import annotations

from cs_pipeline_spark.operators.dedup import connected_components
from cs_pipeline_spark.operators.similarity import (
    sim_topk_bruteforce,
    sim_topk_prereduce,
)

SF_DIR = "/root/testdata/sf0.001"


def test_cc_chain_collapses_to_one_cluster(spark):
    # chain 1-2-3-4-5 plus isolated pair 10-11: two components
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], ["src", "dst"]
    )
    labels = {
        r.node: r.label for r in connected_components(edges).collect()
    }
    assert {labels[n] for n in (1, 2, 3, 4, 5)} == {1}
    assert {labels[n] for n in (10, 11)} == {10}


def test_cc_star_and_triangle(spark):
    edges = spark.createDataFrame(
        [(7, 1), (7, 2), (7, 3), (20, 21), (21, 22), (20, 22)],
        ["src", "dst"],
    )
    labels = {
        r.node: r.label for r in connected_components(edges).collect()
    }
    assert {labels[n] for n in (1, 2, 3, 7)} == {1}
    assert {labels[n] for n in (20, 21, 22)} == {20}


def test_prereduce_equals_bruteforce(spark):
    """The per-partition heap pre-reduce is a pure physical rewrite —
    results must be identical to brute force."""
    a = sorted(map(tuple, sim_topk_bruteforce(spark, SF_DIR).collect()))
    b = sorted(map(tuple, sim_topk_prereduce(spark, SF_DIR).collect()))
    assert a == b and len(a) > 0


def test_minhash_lsh_catches_high_jaccard_pairs(spark):
    """LSH guarantee check: every pair with exact word-3-gram Jaccard
    >= 0.8 must appear in the verified MinHash-LSH output (4 bands x 4
    rows catches J>=0.6 w.h.p.; 0.8 is far above the S-curve knee).
    Deterministic: fixed hash functions, fixed corpus."""
    from pyspark.sql import functions as F

    from cs_pipeline_spark.operators.dedup import (
        _NORM,
        _tokens,
        dedup_minhash_lsh,
        exact_jaccard,
        shingles,
    )
    from cs_pipeline_spark.tables import load

    docs = load(spark, "documents", SF_DIR)
    grams = F.array_distinct(shingles(_tokens(F.expr(_NORM))))
    d = docs.select("doc_id", grams.alias("g"))
    a, b = d.alias("a"), d.alias("b")
    truth = {
        (r.doc_a, r.doc_b)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            exact_jaccard(F.col("a.g"), F.col("b.g")).alias("j"),
        )
        .filter(F.col("j") >= 0.8)
        .collect()
    }
    assert truth, "fixture should contain at least one high-overlap pair"
    found = {
        (r.doc_a, r.doc_b) for r in dedup_minhash_lsh(spark, SF_DIR).collect()
    }
    assert truth <= found


def test_train_split_deterministic_and_partitioned(spark):
    """Split assignment is a pure function of doc_id: stable across
    runs, every doc in exactly one split, proportions near 80/10/10."""
    from cs_pipeline_spark.operators.aggregate import sample_train_split

    a = sorted(map(tuple, sample_train_split(spark, SF_DIR).collect()))
    b = sorted(map(tuple, sample_train_split(spark, SF_DIR).collect()))
    assert a == b
    totals = {}
    for _lang, split, n, _mn in a:
        totals[split] = totals.get(split, 0) + n
    n_all = sum(totals.values())
    from cs_pipeline_spark.tables import load

    assert n_all == load(spark, "documents", SF_DIR).count()
    assert 0.6 < totals["train"] / n_all < 0.95
    assert totals.get("val", 0) > 0 and totals.get("test", 0) > 0


def test_embedding_cosine_salted_equals_unsalted(spark, monkeypatch):
    """Hot-label salting must not change the emitted pair set: force a
    tiny block cap so a 120-row label splits into many salt groups,
    and compare against the single-block brute-force reference."""
    import math

    import numpy as np

    from cs_pipeline_spark.operators import dedup as D

    monkeypatch.setattr(D, "_COS_BLOCK_CAP", 40)  # G = 20 → nsalt = 6

    rng = [
        [round(math.sin(1.0 + i * 64 + d), 6) for d in range(64)]
        for i in range(120)
    ]
    df = spark.createDataFrame(
        [(i, rng[i], 1 if i < 100 else 2) for i in range(120)],
        "vec_id long, embedding array<float>, label int",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(f"{td}/embeddings.parquet")
        got = {
            (r.vec_a, r.vec_b): r.cos_sim
            for r in D.dedup_embedding_cosine(spark, td).collect()
        }

    # brute-force reference with the identical quantized arithmetic
    E = np.array(
        [np.array(v, dtype=np.float32).astype(np.float64) for v in rng]
    )
    labels = [1 if i < 100 else 2 for i in range(120)]
    qn = (
        np.floor(E * E * 1e6 + 0.5).astype(np.int64).sum(axis=1)
    ).astype(np.float64) / 1e6
    norms = np.sqrt(qn)
    ref = {}
    for a in range(120):
        for b in range(a + 1, 120):
            if labels[a] != labels[b]:
                continue
            q = float(
                np.floor(E[a] * E[b] * 1e6 + 0.5).astype(np.int64).sum()
            ) / 1e6
            cos = q / (norms[a] * norms[b])
            if cos >= D._COS_THRESHOLD:
                ref[(a, b)] = cos
    assert set(got) == set(ref)
    for k, v in ref.items():
        assert got[k] == v  # bit-identical, not approximately equal
