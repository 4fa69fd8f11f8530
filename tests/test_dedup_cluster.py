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
