"""Crawl-compliance ops: robots.txt group parsing and license-header
detection."""

from __future__ import annotations

from cs_pipeline_spark.sources.robots import _N_ROBOTS, _robots_groups
from cs_pipeline_spark.sources.robots import scan_robots_rules


def test_robots_groups_match_formula(spark, sf_dir):
    rows = {
        (r.fname, r.agent): r
        for r in scan_robots_rules(spark, sf_dir).collect()
    }
    n_expected = sum(len(_robots_groups(i)) for i in range(_N_ROBOTS))
    assert len(rows) == n_expected
    for i in range(_N_ROBOTS):
        for gr in _robots_groups(i):
            r = rows[(f"host-{i:03d}.robots.txt", gr["agent"])]
            assert r.n_disallow == gr["n_disallow"]
            assert r.n_allow == gr["n_allow"]
            assert r.crawl_delay == gr["crawl_delay"]
            assert r.blocked_all == gr["blocked_all"]
            assert r.n_sitemaps == i % 2


def test_robots_inline_comment_stripped(spark, sf_dir):
    """Allow lines carry '# ok path' comments — the census must not
    count the comment as part of the value or drop the rule."""
    rows = [
        r for r in scan_robots_rules(spark, sf_dir).collect()
        if r.n_allow > 0
    ]
    assert rows  # fixtures do plant Allow lines


def test_license_priority_and_permissive_flags(spark, sf_dir):
    from cs_pipeline_spark.operators.text import text_license_detect

    rows = text_license_detect(spark, sf_dir).collect()
    assert rows
    by_mod = {}
    for r in rows:
        by_mod.setdefault(r.doc_id % 5, set()).add(
            (r.license, r.is_permissive, r.n_matches)
        )
    assert by_mod[0] == {("mit", 1, 1)}
    assert by_mod[1] == {("apache-2.0", 1, 1)}
    assert by_mod[2] == {("gpl-3.0", 0, 1)}
    assert by_mod[3] == {("cc-by-4.0", 1, 1)}
    assert by_mod[4] == {("none", 0, 0)}
