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
