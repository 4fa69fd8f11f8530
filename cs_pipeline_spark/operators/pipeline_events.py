"""Flagship #4: the product-analytics session pipeline, end to end.

``events_analytics_e2e`` chains the event-stream operator family the
way a product-analytics warehouse job would: raw events → 5-minute-gap
sessionization (``win_sessionize`` semantics) → per-session rollup →
daily business metrics. One (day) row out per active day with session
counts, reach, engagement depth, conversion, and monetized value —
the table a dashboard reads.

Determinism: session boundaries are integer µs comparisons; session
ids are window counts; value sums ride the quantized-integer path
(``helpers.dsum``); the conversion rate and events-per-session are
single divisions of exact integers.

Scale (100 TB): ONE shuffle of the fact stream (on user_id, for the
sessionization window) — the session rollup groups on (user_id,
session_id), a strict refinement of the window partitioning, so
Catalyst reuses the exchange; the daily rollup then aggregates
session rows (≪ events). The same chain runs incrementally as the
streaming jobs in ``streaming/`` (session_window + watermark); this
batch form is the backfill/repair path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cs_pipeline_spark.operators.helpers import dround
from cs_pipeline_spark.registry import register
from cs_pipeline_spark.tables import EVENTS_TS_SQL, load

_GAP_US = 5 * 60 * 1000000


@register(
    "events_analytics_e2e",
    f"""
    WITH e AS (
      SELECT user_id, event_id, event_type,
             epoch_us({EVENTS_TS_SQL}) AS us,
             CAST(FLOOR(value * 1000000.0 + 0.5) AS HUGEINT) AS vq
      FROM events
    ),
    s AS (
      SELECT *,
             CASE WHEN us - LAG(us) OVER w > {_GAP_US}
                  OR LAG(us) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    sid AS (
      SELECT *,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM s
    ),
    sess AS (
      SELECT user_id, session_id,
             MIN(us) AS start_us,
             CAST(COUNT(*) AS HUGEINT) AS n_events,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted,
             SUM(vq) AS value_q
      FROM sid GROUP BY user_id, session_id
    )
    SELECT CAST(start_us // 86400000000 AS BIGINT) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           FLOOR(CAST(CAST(SUM(n_events) AS VARCHAR) AS DOUBLE)
                 / COUNT(*) * 1000000.0 + 0.5) / 1000000.0
             AS events_per_session,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           FLOOR(CAST(SUM(converted) AS DOUBLE) / COUNT(*)
                 * 1000000.0 + 0.5) / 1000000.0 AS conversion_rate,
           CAST(CAST(SUM(value_q) AS VARCHAR) AS DOUBLE) / 1000000.0
             AS total_value
    FROM sess GROUP BY day
    """,
    doc="flagship #4: product-analytics pipeline — 5-min-gap "
    "sessionization → per-session rollup → daily metrics (sessions, "
    "reach, depth, conversion, monetized value) in ONE fact shuffle; "
    "the batch/backfill twin of the streaming session jobs",
)
def events_analytics_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    e = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5))
        .cast("decimal(38,0)")
        .alias("vq"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    s = e.withColumn(
        "is_new",
        F.when(
            (F.col("us") - F.lag("us").over(w) > _GAP_US)
            | F.lag("us").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    sid = s.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    sess = sid.groupBy("user_id", "session_id").agg(
        F.min("us").alias("start_us"),
        F.count(F.lit(1)).cast("decimal(20,0)").alias("n_events"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
        F.sum("vq").alias("value_q"),
    )
    return (
        sess.groupBy(
            F.expr("start_us div 86400000000").cast("long").alias("day")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.sum("n_events").cast("long").alias("n_events"),
            dround(
                F.sum("n_events").cast("string").cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("events_per_session"),
            F.sum("converted").cast("long").alias("n_converted"),
            dround(
                F.sum("converted").cast("double") / F.count(F.lit(1)), 6
            ).alias("conversion_rate"),
            (
                F.sum("value_q").cast("string").cast("double") / F.lit(1e6)
            ).alias("total_value"),
        )
    )


@register(
    "f_json_extract",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(k) AS BIGINT) AS n_with_k,
           CAST(SUM(k) AS BIGINT) AS k_total,
           CAST(MIN(k) AS BIGINT) AS k_min,
           CAST(MAX(k) AS BIGINT) AS k_max
    FROM (SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          FROM events) t
    GROUP BY event_type
    """,
    doc="semi-structured JSON surface: typed path extraction from the "
    "events props payload (get_json_object) rolled up per event type — "
    "integer-exact, no Python in the row path",
)
def f_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction over a string payload column — the
    semi-structured ingestion surface (log/event pipelines carry a
    JSON ``props`` bag next to the typed columns).

    ``get_json_object`` is a native JVM expression (Jackson parse per
    row, inside WholeStageCodegen); the extracted value is cast to
    BIGINT so every aggregate below is exact integer arithmetic —
    nothing to quantize. Missing/unparseable paths become NULL, which
    COUNT/SUM/MIN/MAX skip identically in both engines.

    Scale: parse cost is per-row CPU in the scan stage (no shuffle
    added); the rollup is one map-side-combined hash aggregate on a
    low-cardinality key. At 100 TB the win is projecting the payload
    to typed columns ONCE at ingest (this op's projection) rather than
    re-parsing JSON in every downstream query; for repeated multi-key
    extraction use from_json with an explicit schema (one parse, all
    keys) instead of N get_json_object calls.
    """
    ev = load(spark, "events", sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("k_total"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )
