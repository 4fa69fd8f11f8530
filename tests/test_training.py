"""Invariants for the training-data assembly operators
(operators/training.py) and the linear-interpolation gap-fill."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from cs_pipeline_spark.operators.training import (
    _BUDGET,
    _CHUNK,
    _STRIDE,
    canonical_url,
    doc_chunk_split,
    pack_sequences,
    text_lm_score,
)
from cs_pipeline_spark.operators.windows import win_interp_linear
from cs_pipeline_spark.tables import load


def _norm(text: str) -> str:
    return re.sub(r"\s+", " ", text.lower()).strip()


def test_chunk_split_matches_python_model(spark, sf_dir):
    """Every doc's chunk set must equal the direct Python computation:
    stride-spaced windows, last chunk = first window reaching the end,
    ≥1 chunk per doc."""
    chunks = doc_chunk_split(spark, sf_dir).collect()
    docs = {
        r["doc_id"]: _norm(r["text"])
        for r in load(spark, "documents", sf_dir).collect()
    }
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, t in docs.items():
        n = len(t)
        want = max(-(-(n - _CHUNK) // _STRIDE) + 1, 1)
        got = sorted(by_doc[doc_id], key=lambda r: r["chunk_idx"])
        assert len(got) == want, (doc_id, n)
        for k, r in enumerate(got):
            piece = t[k * _STRIDE : k * _STRIDE + _CHUNK]
            assert r["chunk_off"] == k * _STRIDE + 1
            assert r["chunk_chars"] == len(piece)
            assert r["chunk_md5"] == hashlib.md5(piece.encode()).hexdigest()
        # coverage: windows reach the end of the doc
        last = got[-1]
        assert last["chunk_off"] - 1 + last["chunk_chars"] >= n


def test_pack_sequences_conservation_and_bounds(spark, sf_dir):
    """Packing must conserve tokens, keep bins contiguous from 0, and
    never exceed budget + the largest single doc (contiguous fill can
    overflow only by the doc that crosses the boundary)."""
    bins = pack_sequences(spark, sf_dir).collect()
    toks = (
        load(spark, "documents", sf_dir)
        .select(
            "source",
            F.size(F.split(F.expr("trim(regexp_replace(lower(text), '\\\\s+', ' '))"), " ")).alias("n"),
        )
        .groupBy("source")
        .agg(F.sum("n").alias("total"), F.max("n").alias("mx"))
        .collect()
    )
    per_source = {r["source"]: (r["total"], r["mx"]) for r in toks}
    by_source: dict[str, list] = {}
    for r in bins:
        by_source.setdefault(r["source"], []).append(r)
    assert set(by_source) == set(per_source)
    for src, grp in by_source.items():
        total, mx = per_source[src]
        ids = sorted(r["bin_id"] for r in grp)
        assert ids == list(range(ids[0], ids[0] + len(grp)))  # contiguous
        assert ids[0] == 0
        assert sum(r["total_tokens"] for r in grp) == total  # conservation
        for r in grp:
            assert r["total_tokens"] <= _BUDGET + mx
        # every bin except the last must fill past its start boundary:
        # bins are non-empty by construction of (cumsum-1) div budget
        assert all(r["n_docs"] >= 1 for r in grp)


def test_lm_score_mean_freq_brackets(spark, sf_dir):
    """mean_freq must lie within [1, corpus_tokens] and equal
    sum_freq / n_tokens exactly."""
    rows = text_lm_score(spark, sf_dir).collect()
    assert rows
    corpus_tokens = sum(r["n_tokens"] for r in rows)
    for r in rows:
        assert 1.0 <= r["mean_freq"] <= corpus_tokens
        assert r["mean_freq"] == r["sum_freq"] / r["n_tokens"]


def test_canonical_url_cases(spark):
    cases = [
        ("https://A.Example.com/Path/page?q=1#frag", "https://a.example.com/Path/page"),
        ("https://x.com/a/index.html", "https://x.com/a"),
        ("https://x.com/a/", "https://x.com/a"),
        ("http://X.com", "http://x.com"),
        ("https://x.com/CaseSensitivePath", "https://x.com/CaseSensitivePath"),
        ("https://x.com/p?utm_source=feed", "https://x.com/p"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [r[0] for r in df.select(canonical_url(F.col("url"))).collect()]
    assert got == [want for _, want in cases]


def test_interp_linear_matches_python(spark, sf_dir):
    """Interpolated values must equal the bracketing-neighbor formula
    computed directly in Python (same IEEE ops)."""
    rows = win_interp_linear(spark, sf_dir).collect()
    ev = load(spark, "events", sf_dir).select(
        "event_id", "user_id", F.unix_micros("ts").alias("us"), "event_type", "value"
    ).collect()
    meta = {r["event_id"]: r for r in ev}
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r)
    expect: dict[int, float | None] = {}
    for user, grp in by_user.items():
        grp.sort(key=lambda r: (r["us"], r["event_id"]))
        vals = [
            None if r["event_type"] == "click" else r["value"] for r in grp
        ]
        for i, r in enumerate(grp):
            if vals[i] is not None:
                expect[r["event_id"]] = vals[i]
                continue
            prev = next_ = None
            for j in range(i - 1, -1, -1):
                if vals[j] is not None:
                    prev = j
                    break
            for j in range(i + 1, len(grp)):
                if vals[j] is not None:
                    next_ = j
                    break
            if prev is None and next_ is None:
                expect[r["event_id"]] = None
            elif prev is None:
                expect[r["event_id"]] = vals[next_]
            elif next_ is None:
                expect[r["event_id"]] = vals[prev]
            else:
                t = (r["us"] - grp[prev]["us"]) / (
                    grp[next_]["us"] - grp[prev]["us"]
                )
                expect[r["event_id"]] = vals[prev] + (
                    vals[next_] - vals[prev]
                ) * t
    for r in rows:
        want = expect[r["event_id"]]
        assert r["interp_value"] == want, (r["event_id"], r["interp_value"], want)
        if meta[r["event_id"]]["event_type"] == "click":
            assert r["raw_value"] is None


def test_canonical_url_idempotent(spark):
    """canon(canon(u)) == canon(u) over the synthetic URL space —
    canonicalization must be a projection."""
    from cs_pipeline_spark.operators.training import _URL_SPARK

    from cs_pipeline_spark.tables import load

    docs = load(spark, "documents", "/root/testdata/sf0.001")
    urls = docs.select(F.expr(_URL_SPARK).alias("url"))
    once = urls.select(canonical_url(F.col("url")).alias("c1"))
    twice = once.select(
        "c1", canonical_url(F.col("c1")).alias("c2")
    )
    assert twice.filter(F.col("c1") != F.col("c2")).count() == 0


def test_pack_sequences_bins_are_contiguous_doc_ranges(spark, sf_dir):
    """Within a source, the doc→bin assignment must be monotone in
    doc_id (contiguous fill can never send a later doc to an earlier
    bin)."""
    from pyspark.sql import Window

    from cs_pipeline_spark.operators.training import _BUDGET  # noqa: F401
    from cs_pipeline_spark.tables import load

    docs = load(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.expr(_norm_expr()), " ")).alias("n"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    assigned = toks.select(
        "source",
        "doc_id",
        F.floor((F.sum("n").over(w) - 1) / _BUDGET).alias("bin_id"),
    )
    wlag = Window.partitionBy("source").orderBy("doc_id")
    bad = assigned.select(
        (F.col("bin_id") < F.lag("bin_id").over(wlag)).alias("regress")
    ).filter(F.col("regress"))
    assert bad.count() == 0


def _norm_expr() -> str:
    return "trim(regexp_replace(lower(text), '\\\\s+', ' '))"
