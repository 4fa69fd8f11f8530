"""DSIR importance weights (corpus_dsir_weights): target-aligned
documents must score positive, off-target negative, and the weight
must be the exact integer dot product of bucket counts with the
quantized bucket table."""

from __future__ import annotations

import math
import os

import pandas as pd

from cs_pipeline_spark.operators.corpus import (
    _DSIR_B,
    corpus_dsir_weights,
)


def _write_docs(path, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len()
    pdf.to_parquet(os.path.join(path, "documents.parquet"), index=False)
    return str(path)


def test_dsir_separates_target_from_offtarget(spark, tmp_path):
    """en docs use one vocabulary, de docs a disjoint one: every en
    doc's hashed buckets are target-heavy (positive log ratio), every
    de doc's target-absent (negative)."""
    rows = []
    for i in range(20):
        rows.append((i, "alpha beta gamma delta", "en", "s"))
    for i in range(20, 40):
        rows.append((i, "omega psi chi phi", "de", "s"))
    sf = _write_docs(tmp_path, rows)
    got = {r.doc_id: r for r in corpus_dsir_weights.__wrapped__(spark, sf).collect()}
    assert len(got) == 40
    assert all(got[i].logw_nano > 0 and got[i].keep == 1 for i in range(20))
    assert all(got[i].logw_nano < 0 and got[i].keep == 0 for i in range(20, 40))


def test_dsir_weight_is_exact_integer_combination(spark, tmp_path):
    """Hand-recompute one doc's weight from the definition (md5
    bucketing + Laplace-smoothed quantized log ratios)."""
    import hashlib

    rows = [
        (0, "aa bb aa", "en", "s"),
        (1, "bb cc", "de", "s"),
    ]
    sf = _write_docs(tmp_path, rows)
    got = {r.doc_id: r for r in corpus_dsir_weights.__wrapped__(spark, sf).collect()}

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % _DSIR_B

    toks = {0: ["aa", "bb", "aa"], 1: ["bb", "cc"]}
    tr = 5
    tt = 3  # en tokens
    cr: dict[int, int] = {}
    ct: dict[int, int] = {}
    for d, ts in toks.items():
        for t in ts:
            b = bucket(t)
            cr[b] = cr.get(b, 0) + 1
            if d == 0:
                ct[b] = ct.get(b, 0) + 1
    for d, ts in toks.items():
        w = 0
        for t in ts:
            b = bucket(t)
            arg = ((ct.get(b, 0) + 1.0) * (tr + _DSIR_B)) / (
                (cr[b] + 1.0) * (tt + _DSIR_B)
            )
            w += math.floor(math.log(arg) * 1e9 + 0.5)
        assert got[d].logw_nano == w, d
        assert got[d].n_tokens == len(ts)
