"""Hot-band guard for dedup_minhash_lsh (VERDICT r5 item 1).

The exact workload MinHash-LSH exists for — boilerplate/template-heavy
web text — produces near-identical signatures, so one band bucket can
hold thousands of docs. The candidate stage must stay bounded: small
buckets all-pairs (≤ _MINHASH_BAND_CAP² / 2), hot buckets star-pair to
the bucket min (n − 1 pairs), never n²/2 on a hot bucket.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cs_pipeline_spark.operators.dedup import (
    _MINHASH_BAND_CAP,
    _banded_candidates,
    dedup_minhash_lsh,
)


def _bands_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, band_key string")


def test_hot_band_star_not_quadratic(spark):
    """1.2k docs in ONE band bucket → n−1 star pairs, not ~719k."""
    n = 1200
    rows = [(i, "HOT") for i in range(n)]
    cand = _banded_candidates(_bands_df(spark, rows))
    got = cand.collect()
    assert len(got) == n - 1
    # star centre is the bucket min doc_id
    assert all(r.doc_a == 0 and r.doc_b > 0 for r in got)


def test_small_band_all_pairs(spark):
    """A bucket at the cap still does exact all-pairs."""
    n = 10
    rows = [(i, "S") for i in range(n)]
    cand = _banded_candidates(_bands_df(spark, rows))
    assert cand.count() == n * (n - 1) // 2


def test_mixed_buckets_bounded(spark):
    """Hot + small buckets together: total = star + all-pairs, deduped."""
    hot = [(i, "HOT") for i in range(_MINHASH_BAND_CAP + 50)]
    small = [(i, "S") for i in range(5)]  # doc_ids overlap the hot set
    cand = _banded_candidates(_bands_df(spark, hot + small))
    n_hot = len(hot)
    # star pairs (0, 1..n_hot-1) plus small all-pairs; (0, j) for j<5
    # already exist from the star → dedup keeps them once
    expected = (n_hot - 1) + (5 * 4 // 2 - 4)
    assert cand.count() == expected


def test_minhash_e2e_still_runs(spark, sf_dir):
    """End-to-end op on real sf0.001 docs: pairs verified ≥ threshold."""
    out = dedup_minhash_lsh(spark, sf_dir)
    rows = out.collect()
    assert all(r.jaccard >= 0.5 for r in rows)
    assert all(r.doc_a < r.doc_b for r in rows)


def test_embedding_lsh_hot_bucket_star(spark, sf_dir, tmp_path):
    """Replica-heavy embeddings: hot buckets must STAR-pair, not drop.

    The sf1 scale checkpoint caught the old exclusion guard returning
    ZERO pairs on a fully-replicated corpus (every bucket > cap). With
    the star path, n copies of one vector yield ≥ n−1 cos=1 pairs,
    bounded O(n) per hot bucket.
    """
    from cs_pipeline_spark.operators.dedup import (
        _LSH_BUCKET_CAP,
        dedup_embedding_lsh,
    )

    n = _LSH_BUCKET_CAP + 100
    base = [0.1 * (d % 7) - 0.2 for d in range(64)]
    rows = [(i, [float(v) for v in base]) for i in range(n)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = dedup_embedding_lsh(spark, str(tmp_path)).collect()
    # all replicas join one duplicate component via the star centre
    assert len(out) == n - 1
    assert all(r.vec_a == 0 and r.cos_sim >= 0.999999 for r in out)


def test_band_keys_numpy_matches_expression_path(spark, sf_dir):
    """The vectorized mapInPandas band keys (_band_keys, the hot path)
    must be BIT-IDENTICAL to the expression path (_band_bucket_col) —
    same quantized floor((e·p)·1e6 + 0.5) int64 sums, same sign test —
    on the real sf0.001 embeddings. This is the contract that lets the
    DuckDB oracle (_sql_band_bucket) stay untouched."""
    from cs_pipeline_spark.operators.dedup import (
        _LSH_BANDS,
        _band_bucket_col,
        _band_keys,
    )
    from cs_pipeline_spark.tables import load

    emb = load(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    expr = {
        r["vec_id"]: tuple(r[f"k{b}"] for b in range(_LSH_BANDS))
        for r in emb.select(
            "vec_id",
            *[
                _band_bucket_col(F.col("embedding"), b).alias(f"k{b}")
                for b in range(_LSH_BANDS)
            ],
        ).collect()
    }
    vec = {
        r["vec_id"]: tuple(r[f"k{b}"] for b in range(_LSH_BANDS))
        for r in _band_keys(emb).collect()
    }
    assert vec == expr and len(vec) > 0
