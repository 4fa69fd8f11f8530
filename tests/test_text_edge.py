"""Edge-case tests for repetition/PII text ops on degenerate docs
(empty, single-word, all-same-word) — sizes the synthetic corpus never
hits."""

from __future__ import annotations

import pandas as pd
import pytest

from cs_pipeline_spark.registry import queries


@pytest.fixture(scope="module")
def tiny_sf(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("tinysf")
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["", "word", "a a a a", "x y x y x y"],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [0, 4, 7, 11],
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.parquet(
        str(d / "documents.parquet")
    )
    return str(d)


def test_repetition_degenerate_docs(spark, tiny_sf):
    rows = {
        r["doc_id"]: r.asDict()
        for r in queries()["text_repetition_score"](spark, tiny_sf).collect()
    }
    # empty doc: split('') yields one empty token; no bigrams either way
    assert rows[1]["dup_bigram_frac"] == 0.0
    assert rows[1]["n_immediate_repeats"] == 0
    assert rows[2]["n_words"] == 1
    assert rows[2]["dup_bigram_frac"] == 0.0
    # 'a a a a': bigrams ['a a']*3 → dup frac 2/3; 3 immediate repeats
    assert rows[3]["n_immediate_repeats"] == 3
    assert abs(rows[3]["dup_bigram_frac"] - 2.0 / 3.0) < 1e-12
    # 'x y x y x y': 5 bigrams, 2 distinct → 3/5; no immediate repeats
    assert rows[4]["n_immediate_repeats"] == 0
    assert abs(rows[4]["dup_bigram_frac"] - 3.0 / 5.0) < 1e-12


def test_bigram_pmi_short_docs(spark, tiny_sf):
    """Docs with <2 tokens must not crash the bigram generator
    (sequence(1, 0) would yield [1, 0] and element_at(t, 0) throws)."""
    rows = queries()["text_bigram_pmi"](spark, tiny_sf).collect()
    # only docs 3 and 4 produce bigrams; empty/single-word docs skipped
    bigrams = {r["bigram"] for r in rows}
    assert "a a" in bigrams
    for r in rows:
        assert r["n_bigram"] >= 1


def test_pii_scrub_counts_and_redaction(spark, tiny_sf):
    rows = {
        r["doc_id"]: r.asDict()
        for r in queries()["text_pii_scrub"](spark, tiny_sf).collect()
    }
    for r in rows.values():
        assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (1, 1, 1)
        assert "<EMAIL>" in r["scrubbed"]
        assert "<IP>" in r["scrubbed"]
        assert "<PHONE>" in r["scrubbed"]
        assert "@" not in r["scrubbed"]
