"""Invariant tests for the privacy/anonymity audit family."""

from __future__ import annotations

from cs_pipeline_spark.registry import queries
from cs_pipeline_spark.tables import load


def get_query(name):
    return queries()[name]


def test_k_anonymity_partitions_all_rows(spark, sf_dir):
    rows = get_query("privacy_k_anonymity")(spark, sf_dir).collect()
    total = load(spark, "customer", sf_dir).count()
    assert sum(r.num_rows for r in rows) == total
    for r in rows:
        assert r.num_rows == r.class_size * r.num_classes
        assert r.at_risk == (r.class_size < 5)


def test_l_diversity_bounds(spark, sf_dir):
    rows = get_query("privacy_l_diversity")(spark, sf_dir).collect()
    total = load(spark, "customer", sf_dir).count()
    assert sum(r.num_rows for r in rows) == total
    # sensitive attribute has 5 segments; l is a per-class distinct count
    assert all(1 <= r.diversity <= 5 for r in rows)
    assert all(r.at_risk == (r.diversity < 3) for r in rows)


def test_generalization_ladder_monotone(spark, sf_dir):
    rows = get_query("privacy_generalization_ladder")(spark, sf_dir).collect()
    assert [r.level for r in rows] == [0, 1, 2, 3]
    # widths 1000|5000|20000|dropped are nested coarsenings: a row
    # suppressed at a coarse level must be suppressed at every finer
    # one, so suppression shrinks and min-k grows monotonically
    for prev, cur in zip(rows, rows[1:]):
        assert cur.suppressed_rows <= prev.suppressed_rows
        assert cur.suppressed_ppm <= prev.suppressed_ppm
        assert cur.min_k >= prev.min_k
        assert cur.num_classes <= prev.num_classes


def test_dp_counts_noise_bounded_and_present(spark, sf_dir):
    rows = get_query("privacy_dp_counts")(spark, sf_dir).collect()
    assert rows
    # Laplace(b=10) via inverse CDF of u in (0,1): |noise| <= b*ln((p+2)/2)
    assert all(abs(r.noisy_count - r.n_exact) < 250.0 for r in rows)
    # the draw is deterministic but not degenerate
    assert any(abs(r.noisy_count - r.n_exact) > 1e-3 for r in rows)


def test_anonymize_release_matches_ladder(spark, sf_dir):
    rel = get_query("privacy_anonymize_release")(spark, sf_dir).collect()
    total = load(spark, "customer", sf_dir).count()
    # one released (or suppressed) row per customer, level in [0, 4]
    assert len(rel) == total
    assert len({r.c_custkey for r in rel}) == total
    assert all(0 <= r.level_used <= 4 for r in rel)
    for r in rel:
        if r.level_used >= 3:  # balance dim dropped or suppressed
            assert r.bal_bucket_released is None and r.bal_width is None
        else:
            assert r.bal_bucket_released is not None and r.bal_width
        assert (r.nation_released is None) == (r.level_used == 4)
    # nested levels: a row pushed past level L is exactly a row the
    # ladder counts as suppressed at L (coarser class < k implies
    # every finer class < k)
    ladder = get_query("privacy_generalization_ladder")(spark, sf_dir).collect()
    for lad in ladder:
        assert (
            sum(1 for r in rel if r.level_used > lad.level)
            == lad.suppressed_rows
        )


def test_t_closeness_partitions_all_rows(spark, sf_dir):
    rows = get_query("privacy_t_closeness")(spark, sf_dir).collect()
    total = load(spark, "customer", sf_dir).count()
    assert sum(r.num_rows for r in rows) == total
    # t is a total-variation distance: deciles live in [0, 10]
    assert all(0 <= r.t_decile <= 10 for r in rows)
    assert all(r.at_risk == (r.t_decile >= 3) for r in rows)
