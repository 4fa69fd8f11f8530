"""Flagship #8 (crawl_ingest_e2e): funnel coherence — every stage's
numbers must reconcile with its component op run standalone."""

from __future__ import annotations


def test_funnel_reconciles_with_components(spark, sf_dir):
    from cs_pipeline_spark.operators.dedup import dedup_exact
    from cs_pipeline_spark.operators.pipeline_crawl import crawl_ingest_e2e
    from cs_pipeline_spark.sources.warc import _N_WARCS, _warc_meta

    rows = {
        (r.stage, r.metric): r.value
        for r in crawl_ingest_e2e(spark, sf_dir).collect()
    }
    assert len(rows) == 9
    # ingest numbers equal the fixture formula totals
    want = [_warc_meta(i) for i in range(_N_WARCS)]
    assert rows[("ingest", "records")] == sum(m["n_records"] for m in want)
    assert rows[("ingest", "http_200")] == sum(m["n_200"] for m in want)
    assert rows[("ingest", "html_bytes")] == sum(
        m["html_bytes"] for m in want
    )
    # dedup stage equals dedup_exact run standalone
    ded = dedup_exact(spark, sf_dir).collect()
    assert rows[("dedup", "unique_docs")] == len(ded)
    assert rows[("dedup", "dup_copies")] == sum(
        r.n_copies - 1 for r in ded
    )
    # extraction retains strictly less than the full markup
    assert 0 < rows[("extract", "text_chars")]
    assert rows[("extract", "markup_stripped")] > 0
    assert 0 < rows[("quality", "pass")] <= rows[("extract", "docs")]
