"""Streaming window transformations (SURVEY §2.9 — extension surface).

The reference is batch-only (its asyncio/thread use is download
concurrency, not stream processing — ``main.py:143``,
``downloader.py:95-105``); this module adds the Structured-Streaming
surface the ``events`` table calls for. Each transformation is a plain
``DataFrame -> DataFrame`` function, so the SAME code runs in three
places:

1. a real ``readStream`` pipeline (see ``streaming/jobs.py``),
2. the driver-checkable batch twins (``streaming/batch_twins.py``),
3. tests replaying the parquet through a file-source stream.

Spark guarantees window/session_window/dropDuplicates semantics agree
between the batch and streaming engines (same expressions, same plans
modulo state management), which is exactly what makes the batch twin a
valid oracle for the streaming query.

Aggregates use the quantized-decimal helpers (``operators/helpers``)
so sums are bit-identical across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cs_pipeline_spark.operators.helpers import davg, dsum

TUMBLE_WIDTH = "10 minutes"
SLIDE_WIDTH = "10 minutes"
SLIDE_STEP = "5 minutes"
SESSION_GAP = "5 minutes"
WATERMARK = "30 minutes"


def tumbling_counts(events: DataFrame) -> DataFrame:
    """Tumbling 10-minute windows × event_type: count + exact sum."""
    return (
        events.groupBy(
            F.window("ts", TUMBLE_WIDTH).alias("win"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(events: DataFrame) -> DataFrame:
    """Sliding 10-minute windows every 5 minutes: each event lands in
    width/slide = 2 windows (Spark emits one row per window)."""
    return (
        events.groupBy(F.window("ts", SLIDE_WIDTH, SLIDE_STEP).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            davg("value").alias("avg_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "n_events",
            "avg_value",
        )
    )


def session_stats(events: DataFrame) -> DataFrame:
    """Per-user session windows (5-minute inactivity gap): a session
    ends when the next event is ≥ gap after the previous one; the
    emitted end is last_ts + gap (Spark session_window semantics)."""
    return (
        events.groupBy(
            F.session_window("ts", SESSION_GAP).alias("sess"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def dedup_earliest(events: DataFrame) -> DataFrame:
    """Streaming-dedup shape: first event per (user_id, event_type).
    In a stream this is ``withWatermark + dropDuplicates``; as an
    aggregation (min) it is expressible in both engines and restart-
    safe (min is idempotent under replay)."""
    return events.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("first_ts"),
        F.min("event_id").alias("min_event_id"),
        F.count(F.lit(1)).alias("n_dups"),
    )


def with_watermark(events: DataFrame, delay: str = WATERMARK) -> DataFrame:
    """Late-data bound for streaming runs; no-op semantics in batch."""
    return events.withWatermark("ts", delay)


def enrich_with_customers(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Stream-static join: each event picks up its customer's market
    segment. The static side is broadcast to every task, so the stream
    side never shuffles and no state store is needed — the canonical
    dimension-enrichment shape for streams (works identically in batch,
    which is what the driver verifies)."""
    dim = F.broadcast(
        customers.select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("mktsegment"),
        )
    )
    return events.join(dim, "user_id").select(
        "event_id", "user_id", "event_type", "mktsegment", "value"
    )


INTERVAL_LOOKBACK = "6 hours"


def error_click_attribution(errors: DataFrame, clicks: DataFrame) -> DataFrame:
    """Stream-stream interval join: each error event pairs with the
    same user's click events from the preceding 6 hours.

    The join condition is an equi-key (user_id) plus an event-time
    band — exactly the constraint shape Structured Streaming needs to
    bound state: with watermarks on both inputs, Spark derives how
    long click state must be retained (lookback + watermark) and
    evicts beyond it. The same expression runs in batch, which is what
    the driver's oracle checks.
    """
    e = errors.select(
        F.col("user_id"),
        F.col("event_id").alias("err_id"),
        F.col("ts").alias("err_ts"),
    )
    c = clicks.select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    return e.join(
        c,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("click_ts") >= F.col("err_ts") - F.expr(f"INTERVAL {INTERVAL_LOOKBACK}"))
        & (F.col("click_ts") <= F.col("err_ts")),
        "inner",
    ).select("user_id", "err_id", "err_ts", "click_id", "click_ts")


TREND_K = 3


def trending_topk(events: DataFrame) -> DataFrame:
    """Top-k trending event types per tumbling window: windowed counts,
    then rank ≤ k by (count desc, type asc — a total order).

    In a live pipeline this runs as tumbling-window counts with a
    watermark (incremental state) + a ``foreachBatch`` rank over each
    emitted window — the rank is per-FINALIZED-window, so applying it
    batch-side to completed windows is semantics-identical; the batch
    twin verifies exactly that composition.
    """
    from pyspark.sql import Window as W

    counts = (
        events.groupBy(F.window("ts", TUMBLE_WIDTH).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n_events",
        )
    )
    rk = W.partitionBy("win_start").orderBy(
        F.col("n_events").desc(), F.col("event_type").asc()
    )
    return (
        counts.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= TREND_K)
        .select("win_start", "rk", "event_type", "n_events")
    )


def error_click_attribution_outer(
    errors: DataFrame, clicks: DataFrame
) -> DataFrame:
    """Left-outer variant of ``error_click_attribution``: errors with
    NO same-user click in the 6 h lookback still emit, with null click
    columns.

    Streaming semantics: a stream-stream LEFT OUTER join requires
    watermarks on both sides plus the time-band condition — Spark
    emits the null-padded row only once the watermark passes the band
    (the point at which no future click can match). The batch twin is
    the identical expression evaluated over the complete log.
    """
    e = errors.select(
        F.col("user_id"),
        F.col("event_id").alias("err_id"),
        F.col("ts").alias("err_ts"),
    )
    c = clicks.select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    return e.join(
        c,
        (F.col("user_id") == F.col("c_user_id"))
        & (
            F.col("click_ts")
            >= F.col("err_ts") - F.expr(f"INTERVAL {INTERVAL_LOOKBACK}")
        )
        & (F.col("click_ts") <= F.col("err_ts")),
        "left_outer",
    ).select("user_id", "err_id", "err_ts", "click_id", "click_ts")


import datetime as _dt

WATERMARK_DELTA = _dt.timedelta(minutes=30)  # WATERMARK as a timedelta


ACTIVE_WIDTH = "60 minutes"


def active_users(events: DataFrame) -> DataFrame:
    """Hourly distinct active users: windowed dedup then count.

    COUNT(DISTINCT) is not allowed in streaming aggregations; the
    streaming-native form is ``dropDuplicates`` on (window, user) —
    watermark-bounded state — followed by a plain count, a chain of
    two stateful operators Spark supports for windowed aggregations.
    The batch run of the same code collapses to a distinct + count,
    which is what the DuckDB twin checks.
    """
    per_win = events.select(
        F.window("ts", ACTIVE_WIDTH).alias("win"), "user_id"
    ).dropDuplicates(["win", "user_id"])
    return (
        per_win.groupBy("win")
        .agg(F.count(F.lit(1)).alias("active_users"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "active_users",
        )
    )
