"""Flagship #8: the crawl-ingest funnel end to end.

The pipeline every web-scale training corpus starts with:
WARC shards → record/status census → HTML main-content extraction →
quality screen → exact dedup. Each stage here is an individually
hash-checked registered op; the flagship composes them BY REFERENCE
(the anomaly_suite_e2e / mm_curate_e2e contract: the oracle embeds
the registered SQL of its parts, the Spark side calls the registered
builders) into one (stage, metric, value) funnel report —
structurally incapable of disagreeing with its parts.

Scale: the WARC census is per-shard map work; extraction and quality
are per-row map stages over the document scan; dedup_exact is one
hash-groupBy. The flagship adds only 1-row aggregates and a union —
the funnel shape is identical at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cs_pipeline_spark.registry import register


def _crawl_oracle() -> str:
    # force providers to register (import order != registration order)
    import cs_pipeline_spark.operators.dedup  # noqa: F401
    import cs_pipeline_spark.operators.text  # noqa: F401
    import cs_pipeline_spark.sources.warc  # noqa: F401
    from cs_pipeline_spark.registry import _REGISTRY

    o = {
        k: _REGISTRY[k].oracle
        for k in (
            "scan_warc_records",
            "text_html_extract",
            "text_quality_filter",
            "dedup_exact",
        )
    }
    return f"""
    SELECT 'ingest' AS stage, 'records' AS metric,
           CAST(SUM(n_records) AS BIGINT) AS value
    FROM ({o['scan_warc_records']})
    UNION ALL
    SELECT 'ingest', 'http_200', CAST(SUM(n_200) AS BIGINT)
    FROM ({o['scan_warc_records']})
    UNION ALL
    SELECT 'ingest', 'html_bytes', CAST(SUM(html_bytes) AS BIGINT)
    FROM ({o['scan_warc_records']})
    UNION ALL
    SELECT 'extract', 'docs', CAST(COUNT(*) AS BIGINT)
    FROM ({o['text_html_extract']})
    UNION ALL
    SELECT 'extract', 'text_chars', CAST(SUM(text_chars) AS BIGINT)
    FROM ({o['text_html_extract']})
    UNION ALL
    SELECT 'extract', 'markup_stripped',
           CAST(SUM(html_chars - text_chars) AS BIGINT)
    FROM ({o['text_html_extract']})
    UNION ALL
    SELECT 'quality', 'pass',
           CAST(SUM(CASE WHEN quality_pass THEN 1 ELSE 0 END) AS BIGINT)
    FROM ({o['text_quality_filter']})
    UNION ALL
    SELECT 'dedup', 'unique_docs', CAST(COUNT(*) AS BIGINT)
    FROM ({o['dedup_exact']})
    UNION ALL
    SELECT 'dedup', 'dup_copies', CAST(SUM(n_copies - 1) AS BIGINT)
    FROM ({o['dedup_exact']})
    """


@register(
    "crawl_ingest_e2e",
    _crawl_oracle(),
    doc="flagship #8: the crawl-ingest funnel — WARC record/status "
    "census, HTML extraction mass, quality-screen pass count, exact- "
    "dedup survivors and removed copies composed into one (stage, "
    "metric, value) report; both sides reuse the four hash-checked "
    "stage definitions by reference",
)
def crawl_ingest_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One page answering 'what came off the crawl and what survives
    each gate': ingest (records, 200s, HTML bytes), extract (docs,
    text vs stripped markup chars), quality (Gopher-rule passes),
    dedup (unique docs, copies removed). Composition by reference —
    see module docstring.

    Scale: four map-shaped stages + one hash-groupBy; the flagship
    itself adds 1-row aggregates and a 9-row union.
    """
    from cs_pipeline_spark.operators.dedup import dedup_exact
    from cs_pipeline_spark.operators.text import (
        text_html_extract,
        text_quality_filter,
    )
    from cs_pipeline_spark.sources.warc import scan_warc_records

    warc = scan_warc_records(spark, sf_dir)
    ext = text_html_extract(spark, sf_dir)
    qual = text_quality_filter(spark, sf_dir)
    ded = dedup_exact(spark, sf_dir)

    def row(stage: str, metric: str, agg: DataFrame) -> DataFrame:
        return agg.select(
            F.lit(stage).alias("stage"),
            F.lit(metric).alias("metric"),
            F.col("value").cast("long").alias("value"),
        )

    parts = [
        row("ingest", "records",
            warc.agg(F.sum("n_records").alias("value"))),
        row("ingest", "http_200", warc.agg(F.sum("n_200").alias("value"))),
        row("ingest", "html_bytes",
            warc.agg(F.sum("html_bytes").alias("value"))),
        row("extract", "docs", ext.agg(F.count(F.lit(1)).alias("value"))),
        row("extract", "text_chars",
            ext.agg(F.sum("text_chars").alias("value"))),
        row("extract", "markup_stripped",
            ext.agg(
                F.sum(F.col("html_chars") - F.col("text_chars")).alias(
                    "value"
                )
            )),
        row("quality", "pass",
            qual.agg(
                F.sum(F.col("quality_pass").cast("long")).alias("value")
            )),
        row("dedup", "unique_docs",
            ded.agg(F.count(F.lit(1)).alias("value"))),
        row("dedup", "dup_copies",
            ded.agg(F.sum(F.col("n_copies") - 1).alias("value"))),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
