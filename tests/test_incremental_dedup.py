"""Incremental LSH dedup (dedup_lsh_incremental): the persisted-index
increment must emit EXACTLY the batch-touching subset of the
full-corpus run — same pairs, same cosines — and the index must not
contain batch vectors (else the op silently re-hashes the corpus)."""

from __future__ import annotations

from cs_pipeline_spark.operators.dedup import (
    _INC_BATCH_MOD,
    _band_index_path,
)
from cs_pipeline_spark.registry import all_specs


def test_incremental_equals_full_restricted(spark, sf_dir):
    specs = all_specs()
    # registered dispatch (not __wrapped__): the index fixture must be
    # materialized by the ensure_fixtures sweep first
    inc = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in specs["dedup_lsh_incremental"].fn(spark, sf_dir).collect()
    }
    full = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in specs["dedup_embedding_lsh"].fn(spark, sf_dir).collect()
        if r.vec_a % _INC_BATCH_MOD == 0 or r.vec_b % _INC_BATCH_MOD == 0
    }
    assert inc == full
    assert inc, "fixture corpus produced no batch-touching pairs"
    # every emitted pair touches the batch — nothing old-old leaks in
    assert all(
        a % _INC_BATCH_MOD == 0 or b % _INC_BATCH_MOD == 0 for a, b in inc
    )


def test_index_holds_only_non_batch_vectors(spark, sf_dir):
    specs = all_specs()
    specs["dedup_lsh_incremental"].fn(spark, sf_dir)  # ensure fixture
    idx = spark.read.parquet(_band_index_path(sf_dir))
    assert idx.filter(f"vec_id % {_INC_BATCH_MOD} = 0").count() == 0
    assert set(idx.columns) == {"vec_id", "k0", "k1", "k2", "k3"}


# ---------- incremental IVF (round 8, the ANN twin) ----------


def test_ivf_incremental_equals_full_recompute(spark, sf_dir):
    """Fold-in ∪ persisted index must produce the same top-k as an
    index rebuilt from scratch over the full corpus."""
    from cs_pipeline_spark.operators.similarity import (
        K_CELLS,
        N_QUERIES,
        TOP_K,
        _assign_cells,
        _with_norm,
    )
    from cs_pipeline_spark.tables import load
    from pyspark.sql import functions as F

    specs = all_specs()
    inc = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in specs["sim_ivf_incremental"].fn(spark, sf_dir).collect()
    }
    # from-scratch rebuild: assign EVERY vector against the same
    # centroid rule, search the same single-probe cells
    emb = _with_norm(load(spark, "embeddings", sf_dir))
    cen = emb.filter(
        (F.col("vec_id") >= 1) & (F.col("vec_id") <= K_CELLS)
    ).select(
        F.col("vec_id").alias("cluster_id"),
        F.col("embedding").alias("cen"),
        F.col("nrm").alias("cnrm"),
    )
    cells = _assign_cells(emb, cen)
    probes = cells.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "cluster_id"
    )
    from cs_pipeline_spark.operators.dedup import qdot

    qe = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    full_rows = (
        cells.join(probes, "cluster_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(emb.select("vec_id", "embedding", "nrm"), "vec_id")
        .join(qe, "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                qdot(F.col("qe"), F.col("embedding"))
                / (F.sqrt("qn") * F.sqrt("nrm"))
            ).alias("cos_sim"),
        )
        .collect()
    )
    per_q: dict[int, list] = {}
    for r in full_rows:
        per_q.setdefault(r.query_id, []).append(r)
    full = {}
    for q, rows in per_q.items():
        rows.sort(key=lambda r: (-r.cos_sim, r.neighbor_id))
        for r in rows[:TOP_K]:
            full[(q, r.neighbor_id)] = r.cos_sim
    assert inc == full
    assert len({q for q, _ in inc}) == N_QUERIES


def test_ivf_index_holds_only_non_batch_vectors(spark, sf_dir):
    from cs_pipeline_spark.operators.similarity import (
        _IVF_BATCH_MOD,
        _ivf_index_paths,
    )

    specs = all_specs()
    specs["sim_ivf_incremental"].fn(spark, sf_dir)  # ensure fixture
    cpath, apath = _ivf_index_paths(sf_dir)
    assign = spark.read.parquet(apath)
    assert assign.filter(f"vec_id % {_IVF_BATCH_MOD} = 0").count() == 0
    assert set(assign.columns) == {"vec_id", "cluster_id"}
    cen = spark.read.parquet(cpath)
    assert cen.count() > 0
    assert set(cen.columns) == {"cluster_id", "cen", "cnrm"}


# ---------- Bloom pre-filter (round 9) ----------


def test_bloom_planted_duplicates_always_flagged(spark, tmp_path):
    """Recall floor: every true duplicate MUST be Bloom-positive
    (zero false negatives is the structural Bloom guarantee)."""
    from cs_pipeline_spark.operators.dedup import dedup_bloom_incremental

    rows = []
    for d in range(200):
        # docs 0,10,20,... are the batch; plant every batch doc's text
        # as an exact copy of standing doc d+1 when d % 20 == 0
        if d % 10 == 0 and d % 20 == 0:
            text = f"standing text number {d + 1}"
        else:
            text = f"standing text number {d}"
        rows.append((d, text))
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    sf = str(tmp_path)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{sf}/documents.parquet"
    )
    r = dedup_bloom_incremental.__wrapped__(spark, sf).collect()[0]
    assert r.n_batch == 20
    assert r.n_true_dups == 10  # the planted copies
    assert r.n_false_neg == 0  # Bloom can never miss a true dup
    assert r.n_flagged >= r.n_true_dups


def test_bloom_census_at_fixture_scale(spark, sf_dir):
    from cs_pipeline_spark.operators.dedup import dedup_bloom_incremental

    r = dedup_bloom_incremental(spark, sf_dir).collect()[0]
    assert r.n_false_neg == 0
    assert r.n_flagged == r.n_true_dups + r.n_false_pos


def test_bloom_fp_rate_falls_as_m_grows(spark, tmp_path):
    """The m knob is real: a cramped bitset (m=64) saturates and
    false-positives most non-dup batch docs; widening m drives the
    measured FP count down. k is real too: at fixed moderate m, two
    hashes beat one. False negatives stay 0 at every setting."""
    import pandas as pd

    from cs_pipeline_spark.operators.dedup import bloom_census

    rows = [(d, f"unique document text {d}") for d in range(400)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    sf = str(tmp_path)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{sf}/documents.parquet"
    )
    # no planted dups: every flag is a false positive
    by_m = {}
    for m in (64, 1024, 16384):
        r = bloom_census(spark, sf, m=m, k=2).collect()[0]
        assert r.n_false_neg == 0
        assert r.n_true_dups == 0
        by_m[m] = r.n_false_pos
    # 360 standing keys saturate 64 bits -> FP ~ everything; at
    # 16384 bits the FP count collapses
    assert by_m[64] > by_m[16384]
    assert by_m[64] >= 30  # saturated regime really flags en masse
    assert by_m[16384] <= by_m[1024] + 2  # wide >= mid, up to noise
    # k knob at cramped m: more hashes fill MORE bits when m is the
    # binding constraint; at generous m, k=2 prunes vs k=1
    r1 = bloom_census(spark, sf, m=16384, k=1).collect()[0]
    r2 = bloom_census(spark, sf, m=16384, k=2).collect()[0]
    assert r1.n_false_neg == 0 and r2.n_false_neg == 0
    assert r2.n_false_pos <= r1.n_false_pos
