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
    # a degenerate embeddings table too: corpus_* ops may read it
    # (corpus_facility_select), and 5 vectors < the 64-candidate pool
    # and < the k=8 budget exercises the pool-exhausted greedy path
    epdf = pd.DataFrame(
        {
            "vec_id": [0, 1, 2, 3, 4],
            "embedding": [
                [float((i + j) % 3 + 1) for j in range(64)]
                for i in range(5)
            ],
            "label": [0, 0, 1, 1, 2],
        }
    )
    spark.createDataFrame(epdf).selectExpr(
        "vec_id",
        "cast(embedding as array<float>) as embedding",
        "cast(label as int) as label",
    ).coalesce(1).write.parquet(str(d / "embeddings.parquet"))
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


def test_every_text_op_survives_degenerate_docs(spark, tiny_sf):
    """Crash-freedom sweep: EVERY registered text_*/corpus_* op must
    run on a corpus of degenerate docs (empty, 1-token, all-same-token)
    — the <2-token guard class that bit text_bigram_pmi in round 3."""
    from cs_pipeline_spark.registry import all_specs

    ran = 0
    for name, spec in sorted(all_specs().items()):
        if not name.startswith(("text_", "corpus_")):
            continue
        spec.fn(spark, tiny_sf).collect()  # must not raise
        ran += 1
    assert ran >= 30


def test_hypothesis_short_docs_core_ops(spark, tmp_path_factory):
    """Property: core per-doc text ops never crash and keep their
    invariants on randomly composed 0-3-token docs."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from cs_pipeline_spark.registry import queries

    token = st.sampled_from(["a", "bb", "word", "x9", "ümlaut", "."])
    doc = st.lists(token, min_size=0, max_size=3).map(" ".join)

    counter = [0]

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(texts=st.lists(doc, min_size=1, max_size=4))
    def run(texts):
        counter[0] += 1
        d = tmp_path_factory.mktemp(f"hyp{counter[0]}")
        pdf = pd.DataFrame(
            {
                "doc_id": range(1, len(texts) + 1),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["s"] * len(texts),
                "n_chars": [len(t) for t in texts],
            }
        )
        spark.createDataFrame(pdf).coalesce(1).write.parquet(
            str(d / "documents.parquet")
        )
        sf = str(d)
        q = queries()
        stats = {r["doc_id"]: r for r in q["text_stats"](spark, sf).collect()}
        for i, t in enumerate(texts, start=1):
            assert stats[i]["n_tokens"] >= 0
        q["text_ngram_novelty"](spark, sf).collect()
        q["text_zipf_fit"](spark, sf).collect()
        q["text_token_count"](spark, sf).collect()
        q["text_char_entropy"](spark, sf).collect()

    run()
