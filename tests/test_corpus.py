"""Corpus-op semantics + the short-document shingle guard."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from cs_pipeline_spark.operators.corpus import (
    text_keywords_rare,
    text_ngram_topk,
)
from cs_pipeline_spark.operators.dedup import _tokens, shingles


def test_shingles_short_doc_is_empty_not_error(spark):
    # ANSI mode throws on element_at OOB — docs shorter than n must
    # yield an EMPTY shingle list (matching DuckDB's empty range),
    # never a descending sequence(1,0) index probe
    df = spark.createDataFrame(
        [Row(text="one"), Row(text="one two"), Row(text="a b c d")]
    )
    out = df.select(
        F.size(shingles(_tokens(F.col("text")), 3)).alias("n3"),
        F.size(shingles(_tokens(F.col("text")), 2)).alias("n2"),
    ).collect()
    assert [(r["n3"], r["n2"]) for r in out] == [(0, 0), (0, 1), (2, 3)]


def test_ngram_topk_total_order(spark, sf_dir):
    rows = text_ngram_topk(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    # (n desc, ngram asc) is a strict total order over the result
    keys = [(-r["n"], r["ngram"]) for r in rows]
    assert keys == sorted(keys)
    assert len(set(r["ngram"] for r in rows)) == len(rows)


def test_keywords_rare_ranking_invariants(spark, sf_dir):
    rows = text_keywords_rare(spark, sf_dir).collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, grp in per_doc.items():
        assert len(grp) <= 3
        by_rn = sorted(grp, key=lambda r: r["rn"])
        keys = [(r["df"], -r["tf"], r["term"]) for r in by_rn]
        assert keys == sorted(keys)  # rank agrees with (df, -tf, term)


def test_keywords_df_counts_docs_not_occurrences(spark):
    # 'dup' appears twice in one doc but df must count the DOC once
    df = spark.createDataFrame(
        [Row(doc_id=1, text="dup dup rare"), Row(doc_id=2, text="dup other")]
    )
    from cs_pipeline_spark.operators.corpus import _KEYWORDS_PER_DOC  # noqa: F401

    tf = (
        df.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .count()
    )
    dfc = {r["term"]: r["n"] for r in tf.groupBy("term").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert dfc["dup"] == 2  # two docs contain it
    assert dfc["rare"] == 1
