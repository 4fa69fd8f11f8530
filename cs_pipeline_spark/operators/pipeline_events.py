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

from cs_pipeline_spark.operators.helpers import dround, one_part, with_prefix_agg
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
                 TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
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


_PATH_LEN = 3
_PATH_TOP = 10


@register(
    "win_top_paths",
    f"""
    WITH e AS (
      SELECT user_id, event_id, event_type,
             epoch_us({EVENTS_TS_SQL}) AS us
      FROM events
    ), s AS (
      SELECT *, CASE WHEN us - LAG(us) OVER w > {_GAP_US}
                     OR LAG(us) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ), sid AS (
      SELECT *, SUM(is_new) OVER (PARTITION BY user_id
                ORDER BY us, event_id ROWS UNBOUNDED PRECEDING)
                AS session_id
      FROM s
    ), rk AS (
      SELECT user_id, session_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, session_id
               ORDER BY us, event_id) AS step
      FROM sid
    ), paths AS (
      SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY step) AS path
      FROM rk WHERE step <= {_PATH_LEN}
      GROUP BY user_id, session_id
    ), pc AS (
      SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
      FROM paths GROUP BY path
    )
    SELECT path, n_sessions,
           CAST(n_sessions * 1000000 // SUM(n_sessions) OVER ()
                AS BIGINT) AS share_ppm
    FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path) AS rn
      FROM pc) t
    WHERE rn <= {_PATH_TOP}
    """,
    doc=f"user-journey path mining: top-{_PATH_TOP} opening "
    f"{_PATH_LEN}-step event-type paths across 5-min-gap sessions "
    "with integer-ppm share — the sankey/flow-report input",
)
def win_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence mining over sessions: the most common opening
    event-type paths (first N steps of each session, joined with
    '>'), ranked globally — the table behind user-flow sankeys and
    funnel-design decisions.

    Determinism: the step order is the total order (us, event_id) —
    duplicate timestamps cannot reorder a path; the path string is
    built by an ORDER-BY-qualified aggregation on both engines
    (Spark: sort the collected (step, type) structs, then join);
    share is an integer ppm floor-ratio over the top-set total.

    Scale: ONE shuffle of the fact stream on user_id (the
    sessionization window); the per-session path build groups on
    (user, session) — a refinement of the window partitioning, so
    the exchange is reused; path counts are map-side combined
    (|distinct paths| ≤ |types|^N groups) and the final top-N window
    runs on that tiny table.
    """
    ev = load(spark, "events", sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    sid = ev.withColumn(
        "is_new",
        F.when(
            (F.col("us") - F.lag("us").over(w) > _GAP_US)
            | F.lag("us").over(w).isNull(),
            1,
        ).otherwise(0),
    ).withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    rk = sid.withColumn(
        "step",
        F.row_number().over(
            Window.partitionBy("user_id", "session_id").orderBy(
                "us", "event_id"
            )
        ),
    ).filter(F.col("step") <= _PATH_LEN)
    paths = rk.groupBy("user_id", "session_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("step", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
        ).alias("path")
    )
    pc = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions"))
    # top-N paths via orderBy+limit → TakeOrderedAndProject (no
    # single-partition rank window over the path vocabulary)
    top = pc.orderBy(F.desc("n_sessions"), F.asc("path")).limit(_PATH_TOP)
    return top.select(
        "path",
        F.col("n_sessions").cast("long").alias("n_sessions"),
        F.expr("n_sessions * 1000000").alias("_num"),
        F.sum("n_sessions")
        .over(Window.partitionBy(one_part("n_sessions")))
        .alias("_den"),
    ).select(
        "path",
        "n_sessions",
        F.expr("_num div _den").cast("long").alias("share_ppm"),
    )


@register(
    "agg_bounce_rate",
    f"""
    WITH e AS (
      SELECT user_id, event_id, epoch_us({EVENTS_TS_SQL}) AS us
      FROM events
    ), s AS (
      SELECT *, CASE WHEN us - LAG(us) OVER w > {_GAP_US}
                     OR LAG(us) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ), sid AS (
      SELECT *, SUM(is_new) OVER (PARTITION BY user_id
                ORDER BY us, event_id ROWS UNBOUNDED PRECEDING)
                AS session_id
      FROM s
    ), sess AS (
      SELECT user_id, session_id, MIN(us) AS start_us,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM sid GROUP BY user_id, session_id
    )
    SELECT CAST(start_us // 86400000000 AS BIGINT) AS day_idx,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(COUNT(CASE WHEN n_events = 1 THEN 1 END) AS BIGINT)
             AS n_bounces,
           CAST(COUNT(CASE WHEN n_events = 1 THEN 1 END) * 1000000
                // COUNT(*) AS BIGINT) AS bounce_ppm
    FROM sess GROUP BY 1
    """,
    doc="daily bounce rate: single-event sessions over total sessions "
    "per day (5-min-gap sessionization), integer-ppm — the "
    "engagement-quality headline metric",
)
def agg_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate — the share of sessions that end after one event —
    per day of session start. Single-event sessions signal landing
    friction (or bot traffic); the daily spine is what the dashboard
    trend reads.

    Same sessionization as ``events_analytics_e2e`` (5-minute gap on
    integer µs, (us, event_id) total order), session rollup refines
    the window partitioning (exchange reused), day bucketing is
    integer floor-division of the session-start µs, rate is an
    integer ppm floor-ratio.

    Scale: one fact shuffle (user_id window), then everything runs on
    session rows (≪ events) and the daily spine.
    """
    ev = load(spark, "events", sf_dir).select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    sid = ev.withColumn(
        "is_new",
        F.when(
            (F.col("us") - F.lag("us").over(w) > _GAP_US)
            | F.lag("us").over(w).isNull(),
            1,
        ).otherwise(0),
    ).withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    sess = sid.groupBy("user_id", "session_id").agg(
        F.min("us").alias("start_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
    bounces = F.count(F.when(F.col("n_events") == 1, 1))
    return sess.groupBy(
        F.expr("start_us div 86400000000").cast("long").alias("day_idx")
    ).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        bounces.cast("long").alias("n_bounces"),
        F.expr(
            "count(case when n_events = 1 then 1 end) * 1000000"
            " div count(1)"
        )
        .cast("long")
        .alias("bounce_ppm"),
    )


@register(
    "agg_peak_concurrency",
    f"""
    WITH e AS (
      SELECT user_id, event_id, epoch_us({EVENTS_TS_SQL}) AS us
      FROM events
    ), s AS (
      SELECT *, CASE WHEN us - LAG(us) OVER w > {_GAP_US}
                     OR LAG(us) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ), sid AS (
      SELECT *, SUM(is_new) OVER (PARTITION BY user_id
                ORDER BY us, event_id ROWS UNBOUNDED PRECEDING)
                AS session_id
      FROM s
    ), sess AS (
      SELECT user_id, session_id, MIN(us) AS a, MAX(us) AS b
      FROM sid GROUP BY user_id, session_id
    ), pts AS (
      SELECT a AS us, 1 AS delta, user_id, session_id FROM sess
      UNION ALL
      SELECT b, -1, user_id, session_id FROM sess
    ), sweep AS (
      SELECT us, delta,
             SUM(delta) OVER (ORDER BY us, delta, user_id, session_id
                              ROWS UNBOUNDED PRECEDING) AS conc
      FROM pts
    )
    SELECT CAST(us // 86400000000 AS BIGINT) AS day_idx,
           CAST(MAX(conc) AS BIGINT) AS peak_concurrency,
           CAST(COUNT(CASE WHEN delta = 1 THEN 1 END) AS BIGINT)
             AS n_sessions_started
    FROM sweep GROUP BY 1
    """,
    doc="peak concurrent sessions per day via sweep-line (+1/-1 "
    "deltas, running sum over a deterministic total order) — the "
    "capacity-planning metric no groupBy can produce",
)
def agg_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum simultaneous sessions — the number capacity planning
    sizes against. GroupBy can count sessions PER bucket but not
    OVERLAP; the sweep-line turns intervals into +1/−1 boundary
    events whose running sum IS the concurrency at each instant, and
    the daily max reads off that.

    Determinism: the sweep order is the total order (us, delta,
    user, session) — at equal timestamps session ENDS (−1) sort
    before starts (+1), so touching intervals do not double-count
    (a policy choice, stated; flip the delta sort for the inclusive
    convention). All arithmetic is integer.

    Scale: session building is the shared one-fact-shuffle
    sessionization; the sweep is a running sum over 2·|sessions|
    boundary rows — a GLOBAL order, so at 100 TB partition the sweep
    by day (sessions clipped at day boundaries carry their overlap
    in as an opening balance — the standard distributed sweep), or
    repartitionByRange and prefix-sum the per-partition totals.
    """
    ev = load(spark, "events", sf_dir).select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    sid = ev.withColumn(
        "is_new",
        F.when(
            (F.col("us") - F.lag("us").over(w) > _GAP_US)
            | F.lag("us").over(w).isNull(),
            1,
        ).otherwise(0),
    ).withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    sess = sid.groupBy("user_id", "session_id").agg(
        F.min("us").alias("a"), F.max("us").alias("b")
    )
    pts = sess.select(
        F.col("a").alias("us"), F.lit(1).alias("delta"),
        "user_id", "session_id",
    ).unionByName(
        sess.select(
            F.col("b").alias("us"), F.lit(-1).alias("delta"),
            "user_id", "session_id",
        )
    )
    sweep = with_prefix_agg(
        pts, "us", ("delta", "user_id", "session_id"), "delta", "sum",
        out="conc",
    )
    return sweep.groupBy(
        F.expr("us div 86400000000").cast("long").alias("day_idx")
    ).agg(
        F.max("conc").cast("long").alias("peak_concurrency"),
        F.count(F.when(F.col("delta") == 1, 1))
        .cast("long")
        .alias("n_sessions_started"),
    )


@register(
    "f_variant_extract",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(k) AS BIGINT) AS n_with_k,
           CAST(SUM(k) AS BIGINT) AS k_total,
           CAST(COUNT(DISTINCT tag) AS BIGINT) AS n_tags
    FROM (SELECT event_type,
                 TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
                 json_extract_string(props, '$.tag') AS tag
          FROM events) t
    GROUP BY event_type
    """,
    doc="Spark 4 VARIANT ingestion: props parsed ONCE into a variant "
    "column, typed paths read with variant_get/try_variant_get — the "
    "shredded semi-structured surface beside f_json_extract's "
    "per-path string parsing",
)
def f_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VARIANT data type (Spark 4): ``parse_json`` decodes the
    payload once into a binary-encoded variant; every subsequent
    ``variant_get`` is a cheap path read on the decoded tree — the
    open-table-format 'shredded JSON' model, versus
    ``f_json_extract``'s re-parse-per-path. ``try_variant_get`` maps
    missing/mistyped paths to NULL (the oracle's TRY_CAST twin), so
    both engines agree on every malformed-payload row.

    Scale: parse-once beats parse-per-path linearly in path count;
    variant columns store the decoded form in parquet (shredding),
    so at 100 TB repeated analytics never re-tokenize JSON text. The
    rollup is one map-side-combined aggregate.
    """
    ev = load(spark, "events", sf_dir)
    v = ev.select(
        "event_type", F.parse_json("props").alias("vp")
    ).select(
        "event_type",
        F.expr("try_variant_get(vp, '$.k', 'long')").alias("k"),
        F.expr("try_variant_get(vp, '$.tag', 'string')").alias("tag"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count("k").cast("long").alias("n_with_k"),
        F.sum("k").cast("long").alias("k_total"),
        F.countDistinct("tag").cast("long").alias("n_tags"),
    )


# ---------- flagship: the anomaly-detection suite, end to end ----------


def _anomaly_suite_oracle() -> str:
    """Compose the five detectors' REGISTERED oracles: each becomes a
    subquery whose flag column is counted — the funnel is exactly the
    sum of what the individually-hash-checked ops emit."""
    # force the providers to register first: _load_all_modules imports
    # this module BEFORE windows/filters in its tuple order
    import cs_pipeline_spark.operators.aggregate  # noqa: F401
    import cs_pipeline_spark.operators.filters  # noqa: F401
    import cs_pipeline_spark.operators.windows  # noqa: F401
    from cs_pipeline_spark.registry import _REGISTRY

    o = {k: _REGISTRY[k].oracle for k in (
        "agg_control_chart",
        "win_ewma_chart",
        "win_cusum_changepoint",
        "agg_mad_outliers",
        "dq_volume_anomaly",
    )}
    return f"""
    SELECT 'shewhart_we_rules' AS detector,
           CAST(COUNT(*) AS BIGINT) AS n_flagged
    FROM ({o['agg_control_chart']})
    WHERE COALESCE(rule1, FALSE) OR COALESCE(rule2, FALSE)
    UNION ALL
    SELECT 'ewma_chart', CAST(COUNT(*) AS BIGINT)
    FROM ({o['win_ewma_chart']}) WHERE COALESCE(signal, FALSE)
    UNION ALL
    SELECT 'cusum_drift', CAST(COUNT(*) AS BIGINT)
    FROM ({o['win_cusum_changepoint']}) WHERE COALESCE(drifted, FALSE)
    UNION ALL
    SELECT 'mad_outliers', CAST(COALESCE(SUM(n_outliers), 0) AS BIGINT)
    FROM ({o['agg_mad_outliers']})
    UNION ALL
    SELECT 'volume_z6', CAST(COUNT(*) AS BIGINT)
    FROM ({o['dq_volume_anomaly']}) WHERE COALESCE(is_anomaly, FALSE)
    """


@register(
    "anomaly_suite_e2e",
    _anomaly_suite_oracle(),
    doc="flagship #6: the monitoring stack end to end — Shewhart "
    "Western-Electric rules, EWMA chart, CUSUM drift, MAD outliers, "
    "and volume z-score composed into one (detector, n_flagged) "
    "report; both sides literally reuse the five hash-checked "
    "detector definitions, so the suite can never drift from its "
    "parts",
)
def anomaly_suite_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One query answering 'what is alerting right now, by detector?'
    — the page a production data-quality/monitoring stack renders.
    Each detector covers a failure mode the others miss: Shewhart
    rule 1 catches single 3σ points, rule 2 and EWMA catch small
    sustained shifts, CUSUM localizes WHERE a drift started, MAD
    flags per-event outliers robustly, the volume z-score watches
    row-count health rather than values.

    Composition is by reference, not copy: the Spark side calls the
    five REGISTERED builders (memoized — a dashboard refresh reuses
    their cached plans) and the oracle embeds the five registered
    oracle strings as subqueries, so this flagship is structurally
    incapable of disagreeing with its hash-checked parts.

    Scale: each detector is its own bounded-spine plan (see the five
    docstrings); the flagship adds only five 1-row aggregates and a
    union — nothing new shuffles.
    """
    from cs_pipeline_spark.operators.aggregate import (
        agg_control_chart,
        agg_mad_outliers,
    )
    from cs_pipeline_spark.operators.filters import dq_volume_anomaly
    from cs_pipeline_spark.operators.windows import (
        win_cusum_changepoint,
        win_ewma_chart,
    )

    def cnt(df: DataFrame, name: str, flag) -> DataFrame:
        return (
            df.filter(flag)
            .agg(F.count(F.lit(1)).cast("long").alias("n_flagged"))
            .select(F.lit(name).alias("detector"), "n_flagged")
        )

    shew = cnt(
        agg_control_chart(spark, sf_dir),
        "shewhart_we_rules",
        F.coalesce("rule1", F.lit(False))
        | F.coalesce("rule2", F.lit(False)),
    )
    ewma = cnt(
        win_ewma_chart(spark, sf_dir),
        "ewma_chart",
        F.coalesce("signal", F.lit(False)),
    )
    cusum = cnt(
        win_cusum_changepoint(spark, sf_dir),
        "cusum_drift",
        F.coalesce("drifted", F.lit(False)),
    )
    mad = (
        agg_mad_outliers(spark, sf_dir)
        .agg(
            F.coalesce(F.sum("n_outliers"), F.lit(0))
            .cast("long")
            .alias("n_flagged")
        )
        .select(F.lit("mad_outliers").alias("detector"), "n_flagged")
    )
    vol = cnt(
        dq_volume_anomaly(spark, sf_dir),
        "volume_z6",
        F.coalesce("is_anomaly", F.lit(False)),
    )
    out = shew
    for d in (ewma, cusum, mad, vol):
        out = out.unionByName(d)
    return out
