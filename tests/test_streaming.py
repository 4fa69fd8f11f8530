"""Streaming replay tests: the REAL Structured-Streaming engine must
agree with the batch twins the driver verifies against DuckDB.

Replays the events table through a file-source stream in micro-batches
(2 files ⇒ at least 2 triggers ⇒ state crosses a batch boundary, which
is what distinguishes a real streaming run from a one-shot batch)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cs_pipeline_spark.streaming import jobs
from cs_pipeline_spark.tables import load

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_stream_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_stream"))
    events = load(spark, "events", SF_DIR)
    # two files ⇒ two micro-batches with maxFilesPerTrigger=1
    events.repartition(2).write.mode("overwrite").parquet(out)
    return out


def _run_stream(spark, stream_df, name, mode="complete"):
    q = (
        jobs.to_memory_sink(stream_df, name, output_mode=mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def _canon(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_tumbling_stream_matches_batch(spark, events_stream_dir):
    stream = jobs.read_events_stream(spark, events_stream_dir)
    got = _run_stream(spark, jobs.tumbling_job(stream), "t_tumbling")
    want = jobs.W.tumbling_counts(load(spark, "events", SF_DIR))
    cols = ["win_start", "win_end", "event_type", "n_events", "sum_value"]
    assert _canon(got, cols) == _canon(want, cols)


def test_session_stream_matches_batch(spark, events_stream_dir):
    stream = jobs.read_events_stream(spark, events_stream_dir)
    got = _run_stream(spark, jobs.session_job(stream), "t_session")
    want = jobs.W.session_stats(load(spark, "events", SF_DIR))
    cols = ["user_id", "session_start", "session_end", "n_events", "sum_value"]
    assert _canon(got, cols) == _canon(want, cols)


def test_watermark_dedup_stream(spark, events_stream_dir):
    stream = jobs.read_events_stream(spark, events_stream_dir)
    q = (
        jobs.to_memory_sink(jobs.dedup_job(stream), "t_dedup", "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("t_dedup")
    n_batch = load(spark, "events", SF_DIR).select("event_id").distinct().count()
    assert got.count() == n_batch
    assert got.select("event_id").distinct().count() == n_batch


def test_stream_is_incremental(spark, events_stream_dir):
    """maxFilesPerTrigger=1 over 2 files must produce ≥2 micro-batches."""
    stream = jobs.read_events_stream(spark, events_stream_dir)
    q = (
        jobs.to_memory_sink(jobs.tumbling_job(stream), "t_incr")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(q.recentProgress) >= 2


def test_stateful_threshold_alerts_matches_batch(spark, tmp_path):
    """applyInPandasWithState replay: per-user state (running quantized
    sum) must survive micro-batch boundaries and reproduce the batch
    twin exactly. Files are written as time-ordered halves with
    increasing mtimes so the file source replays in event order (as a
    log source would deliver)."""
    import os
    import time as _time

    from cs_pipeline_spark.streaming import stateful
    from cs_pipeline_spark.streaming.batch_twins import (
        stream_threshold_alerts,
    )

    src = str(tmp_path / "ordered_events")
    os.makedirs(src)
    ev = load(spark, "events", SF_DIR).orderBy("ts", "event_id")
    rows = ev.count()
    first = ev.limit(rows // 2)
    second = ev.subtract(first)
    first.coalesce(1).write.mode("overwrite").parquet(src + "/b0")
    second.coalesce(1).write.mode("overwrite").parquet(src + "/b1")
    # file source orders by modification time: force b0 < b1
    now = _time.time()
    for i, d in enumerate(("b0", "b1")):
        for f in os.listdir(os.path.join(src, d)):
            os.utime(os.path.join(src, d, f), (now + i * 10, now + i * 10))

    stream = (
        spark.readStream.schema(jobs.EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", True)
        .parquet(src)
    )
    q = (
        stateful.threshold_alerts_stateful(stream)
        .writeStream.format("memory")
        .queryName("t_alerts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("t_alerts")
    want = stream_threshold_alerts(spark, SF_DIR)
    cols = ["user_id", "event_id", "ts", "cum_value", "level"]
    assert len(q.recentProgress) >= 2  # state crossed a batch boundary
    assert _canon(got, cols) == _canon(want, cols)


def test_stream_static_join_matches_batch(spark, events_stream_dir):
    stream = jobs.read_events_stream(spark, events_stream_dir)
    customers = load(spark, "customer", SF_DIR)
    got = _run_stream(
        spark, jobs.enrich_job(stream, customers), "t_enrich", mode="append"
    )
    want = jobs.W.enrich_with_customers(
        load(spark, "events", SF_DIR), customers
    )
    cols = ["event_id", "user_id", "event_type", "mktsegment", "value"]
    assert _canon(got, cols) == _canon(want, cols)
