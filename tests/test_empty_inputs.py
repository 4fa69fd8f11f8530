"""Degenerate-input robustness: operators must return empty/neutral
results (not throw) on empty frames — the behavior a production run
hits on an empty ingest day or a fully-filtered partition."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from cs_pipeline_spark.operators.dedup import connected_components
from cs_pipeline_spark.operators.training import canonical_url
from cs_pipeline_spark.streaming import windows as W


def _empty_events(spark):
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("event_type", StringType()),
            StructField("value", LongType()),
        ]
    )
    return spark.createDataFrame([], schema)


def test_streaming_windows_on_empty(spark):
    ev = _empty_events(spark).withColumn(
        "value", F.col("value").cast("double")
    )
    assert W.tumbling_counts(ev).count() == 0
    assert W.session_stats(ev).count() == 0
    assert W.trending_topk(ev).count() == 0
    assert W.dedup_earliest(ev).count() == 0


def test_connected_components_on_empty_edges(spark):
    edges = spark.createDataFrame(
        [], StructType([StructField("src", LongType()), StructField("dst", LongType())])
    )
    assert connected_components(edges).count() == 0


def test_canonical_url_on_null_and_empty(spark):
    df = spark.createDataFrame([(None,), ("",)], ["url"])
    rows = df.select(canonical_url(F.col("url")).alias("c")).collect()
    assert rows[0]["c"] is None
    assert rows[1]["c"] == ""


def test_quantized_aggregates_on_empty_group(spark):
    from cs_pipeline_spark.operators.helpers import davg, dstd_pop, dsum

    df = spark.createDataFrame(
        [], StructType([StructField("k", LongType()), StructField("v", LongType())])
    ).withColumn("v", F.col("v").cast("double"))
    out = df.groupBy("k").agg(
        dsum("v").alias("s"), davg("v").alias("a"), dstd_pop("v").alias("sd")
    )
    assert out.count() == 0  # no groups, no rows, no exception
    # all-null single group: skipna semantics → null aggregates
    df2 = spark.createDataFrame([(1, None), (1, None)], "k long, v double")
    row = (
        df2.groupBy("k")
        .agg(dsum("v").alias("s"), davg("v").alias("a"), dstd_pop("v").alias("sd"))
        .collect()[0]
    )
    assert row["s"] is None and row["a"] is None and row["sd"] is None


def test_active_users_on_empty(spark):
    ev = _empty_events(spark)
    assert W.active_users(ev).count() == 0


def test_cli_process_rejects_unknown_agg(tmp_path):
    from cs_pipeline_spark.cli import main
    import pytest

    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        "start: 2024-01-01T00:00:00\n"
        "end: 2024-01-31T23:00:00\n"
        "preds: [TA]\n"
        "aggregation-type: WEEKLY\n"
    )
    with pytest.raises(SystemExit) as e:
        main(["process", "--config", str(cfg)])
    assert e.value.code == 2
