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


def test_contamination_excludes_bench_and_finds_planted(spark):
    # plant: doc 97*2=194 is in the bench set; doc 7 shares a 4-gram
    # with it; doc 8 does not
    from cs_pipeline_spark.operators.corpus import _BENCH_MOD  # noqa
    from cs_pipeline_spark.operators.dedup import _NORM, _tokens, shingles

    rows = [
        Row(doc_id=0, text="alpha beta gamma delta epsilon"),  # bench
        Row(doc_id=7, text="x alpha beta gamma delta y"),  # contaminated
        Row(doc_id=8, text="totally different words here now"),
    ]
    df = spark.createDataFrame(rows)
    grams = F.array_distinct(shingles(_tokens(F.expr(_NORM)), 4))
    with_g = df.select("doc_id", F.explode(grams).alias("g"))
    bench = with_g.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bench_id"), "g"
    )
    corp = with_g.filter(F.col("doc_id") % 97 != 0)
    hits = (
        corp.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_shared"))
        .collect()
    )
    assert {r["doc_id"]: r["n_shared"] for r in hits} == {7: 1}


def test_gap_detect_threshold(spark, sf_dir):
    from cs_pipeline_spark.operators.windows import win_gap_detect

    rows = win_gap_detect(spark, sf_dir).collect()
    assert all(r["gap_us"] > 30 * 60 * 1000000 for r in rows)
    # consecutive pair ids are distinct
    assert all(r["prev_event_id"] != r["event_id"] for r in rows)


def test_curation_funnel_invariants(spark, sf_dir):
    from cs_pipeline_spark.operators.pipeline_curate import curate_corpus_e2e

    n = {r["stage"]: r["n_docs"] for r in curate_corpus_e2e(spark, sf_dir).collect()}
    assert set(n) == {
        "ingest", "holdout_eval", "quality", "exact_dedup",
        "near_dedup", "decontam", "train", "val", "test",
    }
    # corpus partition: eval holdout + curated input = everything
    assert n["holdout_eval"] + (n["ingest"] - n["holdout_eval"]) == n["ingest"]
    # the funnel only ever narrows
    assert (
        n["ingest"] - n["holdout_eval"]
        >= n["quality"]
        >= n["exact_dedup"]
        >= n["near_dedup"]
        >= n["decontam"]
    )
    # split partitions the survivors exactly
    assert n["train"] + n["val"] + n["test"] == n["decontam"]
    assert n["decontam"] > 0


def test_oov_ratio_bounds_and_vocab_coverage(spark, sf_dir):
    from cs_pipeline_spark.operators.corpus import text_oov_ratio

    rows = text_oov_ratio(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert abs(r["oov_ratio"] - r["n_oov"] / r["n_tokens"]) < 1e-12
    # OOV exists exactly when the corpus has more distinct terms than
    # the vocabulary cap (the tiny test fixture may have fewer)
    from cs_pipeline_spark.operators.corpus import _VOCAB_K
    from cs_pipeline_spark.operators.dedup import _NORM, _tokens
    from cs_pipeline_spark.tables import load

    n_terms = (
        load(spark, "documents", sf_dir)
        .select(F.explode(_tokens(F.expr(_NORM))).alias("t"))
        .distinct()
        .count()
    )
    total = sum(r["n_tokens"] for r in rows)
    oov = sum(r["n_oov"] for r in rows)
    assert (oov > 0) == (n_terms > _VOCAB_K)
    assert oov < total


def test_curriculum_schedule_monotone(spark, sf_dir):
    from cs_pipeline_spark.operators.corpus import corpus_curriculum_schedule
    from cs_pipeline_spark.tables import load

    rows = {
        r.epoch: r for r in corpus_curriculum_schedule(spark, sf_dir).collect()
    }
    assert set(rows) == {1, 2, 3, 4, 5}
    n_docs_total = load(spark, "documents", sf_dir).count()
    prev_docs, prev_tok = 0, 0
    for e in range(1, 6):
        r = rows[e]
        assert r.max_decile == min(2 * e, 10)
        # the curriculum only ever ADMITS more data
        assert r.n_docs >= prev_docs and r.n_tokens >= prev_tok
        prev_docs, prev_tok = r.n_docs, r.n_tokens
        assert 0 <= r.token_share_ppm <= 1000000
    # final epoch sees the whole corpus
    assert rows[5].n_docs == n_docs_total
    assert rows[5].token_share_ppm == 1000000
