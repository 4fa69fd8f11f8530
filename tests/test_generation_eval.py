"""ROUGE-N / BLEU generation-eval ops: hand-computed metrics on a
planted (candidate, reference) pair, clipping semantics, brevity
penalty branches, and NULL-vs-zero distinctions."""

from __future__ import annotations

import math
import os

import pandas as pd

from cs_pipeline_spark.operators.text import text_bleu_eval, text_rouge_n


def _write_pairs(path, pairs):
    rows = []
    for k, (cand, ref) in enumerate(pairs):
        rows.append((2 * k, cand, "en", "s"))
        rows.append((2 * k + 1, ref, "en", "s"))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len()
    pdf.to_parquet(os.path.join(path, "documents.parquet"), index=False)
    return str(path)


def test_rouge_clipping_and_f1(spark, tmp_path):
    """cand='the the the cat', ref='the cat sat': clipped unigram
    overlap = min(3,1)['the'] + min(1,1)['cat'] = 2 (a plain
    intersection-of-types count would also say 2, but an UNCLIPPED
    match count would say 4)."""
    sf = _write_pairs(tmp_path, [("the the the cat", "the cat sat")])
    rows = {r.ngram: r for r in text_rouge_n.__wrapped__(spark, sf).collect()}
    u = rows[1]
    assert (u.overlap, u.cand_ngrams, u.ref_ngrams) == (2, 4, 3)
    assert u.rouge_p == 2 / 4 and u.rouge_r == 2 / 3
    assert u.rouge_f1 == 2 * 2 / (4 + 3)
    b = rows[2]
    # bigrams: cand {the the ×2, the cat}, ref {the cat, cat sat} → 1
    assert (b.overlap, b.cand_ngrams, b.ref_ngrams) == (1, 3, 2)


def test_bleu_brevity_and_geometric_mean(spark, tmp_path):
    """cand='a b c' (len 3) vs ref='a b c d e' (len 5): p1 = 3/3,
    p2 = 2/2, BP = exp(1 - 5/3) quantized."""
    sf = _write_pairs(tmp_path, [("a b c", "a b c d e")])
    r = text_bleu_eval.__wrapped__(spark, sf).collect()[0]
    assert (r.cand_len, r.ref_len) == (3, 5)
    assert r.p1 == 1.0 and r.p2 == 1.0
    want_bp = math.floor(math.exp(1 - 5 / 3) * 1e6 + 0.5) / 1e6
    assert r.bp_q == want_bp
    assert r.bleu_q == math.floor(want_bp * 1.0 * 1e6 + 0.5) / 1e6


def test_bleu_no_penalty_when_candidate_longer(spark, tmp_path):
    sf = _write_pairs(tmp_path, [("x y z w", "x y")])
    r = text_bleu_eval.__wrapped__(spark, sf).collect()[0]
    assert r.bp_q == 1.0
    assert r.p1 == 2 / 4 and r.p2 == 1 / 3


def test_bleu_null_vs_zero(spark, tmp_path):
    """One-token candidate → no bigrams → p2/bleu NULL; disjoint
    texts → p1 = p2 = 0 → bleu 0. The two states stay distinct."""
    sf = _write_pairs(
        tmp_path, [("solo", "a reference"), ("p q r", "x y z")]
    )
    rows = {r.pair_id: r for r in text_bleu_eval.__wrapped__(spark, sf).collect()}
    assert rows[0].p2 is None and rows[0].bleu_q is None
    assert rows[2].p1 == 0.0 and rows[2].p2 == 0.0 and rows[2].bleu_q == 0.0


def test_chrf_perfect_and_disjoint_pairs(spark, tmp_path_factory):
    """chrF2 must be 1.0 when candidate == reference and 0.0 when the
    pair shares no characters; P and R must be exact count ratios."""
    import os

    import pandas as pd

    from cs_pipeline_spark.operators.text import text_chrf

    rows = [
        (0, "identical text here", "en", "a"),   # cand of pair 0
        (1, "identical text here", "en", "a"),   # ref of pair 0
        (2, "aaaa bbbb", "en", "a"),             # cand of pair 2
        (3, "zzzz yyyy", "en", "a"),             # ref of pair 2
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len()
    d = tmp_path_factory.mktemp("chrf")
    pdf.to_parquet(os.path.join(d, "documents.parquet"), index=False)
    out = {
        (r.pair_id, r.ngram): r
        for r in text_chrf.__wrapped__(spark, str(d)).collect()
    }
    for n in (1, 2, 3):
        assert out[(0, n)].chr_p == 1.0 and out[(0, n)].chr_r == 1.0
        assert abs(out[(0, n)].chrf2_q - 1.0) < 2e-6
        assert out[(2, n)].overlap in (0, 1)  # n=1 may share nothing
    # fully disjoint at n >= 2
    assert out[(2, 2)].overlap == 0 and out[(2, 2)].chrf2_q == 0.0
    assert out[(2, 3)].chrf2_q == 0.0
