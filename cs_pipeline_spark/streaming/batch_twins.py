"""Driver-checkable batch twins of the streaming windows (SURVEY §2.9).

Each op runs the shared transformation from ``streaming/windows.py``
on the batch ``events`` table and carries a DuckDB oracle. Window
boundary semantics mirrored in SQL:

- tumbling/sliding starts are epoch-aligned — ``time_bucket`` in
  DuckDB matches Spark's ``window()`` alignment.
- an event belongs to width/slide sliding windows (here 2); the twin
  enumerates them with a positional double-``unnest``.
- sessions: new session when the gap to the previous event is ≥ the
  inactivity gap (Spark merges while next < previous end), end =
  last_ts + gap.

``events.ts`` is TIMESTAMP(NANOS) in parquet; Spark reads nanos-as-
long and truncates to µs (``tables.EVENTS_TS_SQL``), the oracle casts
the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W_sql
from pyspark.sql import functions as F

from cs_pipeline_spark.operators.helpers import sql_davg, sql_dsum, with_prefix_agg
from cs_pipeline_spark.registry import register
from cs_pipeline_spark.streaming import windows as W
from cs_pipeline_spark.tables import EVENTS_TS_SQL, load

_TS = EVENTS_TS_SQL


@register(
    "stream_tumbling_window",
    "SELECT time_bucket(INTERVAL '10 minutes', "
    f"{_TS}) AS win_start, "
    f"time_bucket(INTERVAL '10 minutes', {_TS}) + INTERVAL '10 minutes' AS win_end, "
    f"event_type, COUNT(*) AS n_events, {sql_dsum('value')} AS sum_value "
    "FROM events GROUP BY 1, 2, 3",
    doc="tumbling 10-min window counts/sums (batch twin of streaming agg)",
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.tumbling_counts(load(spark, "events", sf_dir))


@register(
    "stream_sliding_window",
    "WITH e AS (SELECT "
    f"unnest([time_bucket(INTERVAL '5 minutes', {_TS}), "
    f"time_bucket(INTERVAL '5 minutes', {_TS}) - INTERVAL '5 minutes']) AS win_start, "
    "value FROM events) "
    "SELECT win_start, win_start + INTERVAL '10 minutes' AS win_end, "
    f"COUNT(*) AS n_events, {sql_davg('value')} AS avg_value "
    "FROM e GROUP BY 1, 2",
    doc="sliding 10-min/5-min window stats (batch twin of streaming agg)",
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.sliding_counts(load(spark, "events", sf_dir))


@register(
    "stream_session_window",
    "WITH o AS (SELECT user_id, value, "
    f"{_TS} AS ts, "
    f"CASE WHEN {_TS} >= lag({_TS}) OVER w + INTERVAL '5 minutes' "
    "OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess "
    "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
    "s AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts "
    "ROWS UNBOUNDED PRECEDING) AS sess_id FROM o) "
    "SELECT user_id, MIN(ts) AS session_start, "
    "MAX(ts) + INTERVAL '5 minutes' AS session_end, "
    f"COUNT(*) AS n_events, {sql_dsum('value')} AS sum_value "
    "FROM s GROUP BY user_id, sess_id",
    doc="per-user 5-min-gap session windows (batch twin of session_window)",
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.session_stats(load(spark, "events", sf_dir))


@register(
    "stream_threshold_alerts",
    "WITH e AS (SELECT user_id, event_id, "
    f"{_TS} AS ts, "
    "CAST(FLOOR(COALESCE(value, 0) * 1000000.0 + 0.5) AS BIGINT) AS qv "
    "FROM events), "
    "c AS (SELECT user_id, event_id, ts, qv, "
    "SUM(qv) OVER (PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM e) "
    "SELECT user_id, event_id, ts, "
    "CAST(cum AS DOUBLE) / 1000000.0 AS cum_value, "
    "CAST(FLOOR(CAST(cum AS DOUBLE) / 100000000.0) AS BIGINT) AS level "
    "FROM c WHERE FLOOR(CAST(cum AS DOUBLE) / 100000000.0) > "
    "FLOOR(CAST(cum - qv AS DOUBLE) / 100000000.0)",
    doc="custom stateful op batch twin: per-user running-total threshold "
    "crossings (stream side: applyInPandasWithState, streaming/stateful.py)",
)
def stream_threshold_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of ``streaming/stateful.threshold_alerts_stateful``:
    quantized-integer cumulative sum per user in (ts, event_id) order,
    alert row on each crossing of a multiple of 100. Integer
    accumulation makes stream/batch/oracle agree exactly (window-sum
    implementations differ in float addition order; integer sums
    don't care)."""
    from pyspark.sql import Window

    ev = load(spark, "events", sf_dir)
    qv = F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 1e6 + 0.5).cast(
        "long"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    step = 100.0 * 1e6
    c = ev.select(
        "user_id", "event_id", "ts", qv.alias("qv")
    ).withColumn("cum", F.sum("qv").over(w))
    lvl = F.floor(F.col("cum").cast("double") / F.lit(step))
    prev_lvl = F.floor((F.col("cum") - F.col("qv")).cast("double") / F.lit(step))
    return c.filter(lvl > prev_lvl).select(
        "user_id",
        "event_id",
        "ts",
        (F.col("cum").cast("double") / 1e6).alias("cum_value"),
        lvl.cast("long").alias("level"),
    )


@register(
    "stream_dedup_earliest",
    "SELECT user_id, event_type, "
    f"MIN({_TS}) AS first_ts, "
    "MIN(event_id) AS min_event_id, COUNT(*) AS n_dups "
    "FROM events GROUP BY user_id, event_type",
    doc="streaming-dedup shape: earliest event per (user, type)",
)
def stream_dedup_earliest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.dedup_earliest(load(spark, "events", sf_dir))


@register(
    "stream_static_join",
    "SELECT e.event_id, e.user_id, e.event_type, "
    "c.c_mktsegment AS mktsegment, e.value "
    "FROM events e JOIN customer c ON c.c_custkey = e.user_id",
    doc="stream-static dimension enrichment: broadcast join, no stream "
    "shuffle, no state store (batch twin of the streaming job)",
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.enrich_with_customers(
        load(spark, "events", sf_dir), load(spark, "customer", sf_dir)
    )


@register(
    "stream_late_data_drop",
    "WITH c AS (SELECT MAX("
    f"{_TS}) - INTERVAL '30 minutes' AS cutoff FROM events) "
    f"SELECT time_bucket(INTERVAL '10 minutes', {_TS}) AS win_start, "
    f"time_bucket(INTERVAL '10 minutes', {_TS}) + INTERVAL '10 minutes' AS win_end, "
    "event_type, COUNT(*) AS n_events "
    f"FROM events, c WHERE {_TS} >= c.cutoff "
    "GROUP BY 1, 2, 3",
    doc="watermark late-data semantics, batch twin: events older than max-event-time − 30min are dropped before the windowed count (withWatermark end-state)",
)
def stream_late_data_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-state twin of ``withWatermark('ts', '30 minutes')`` (the
    real streaming jobs in streaming/jobs.py bound their state the
    same way): an event is late — and dropped — once the watermark
    (max event time seen, minus the delay) has passed it. The batch
    rendering uses the FINAL watermark, i.e. the global max.

    Plan: the scalar max is one tiny aggregate broadcast back over
    the scan (BroadcastNestedLoopJoin on a 1-row side — constant
    cost); the windowed count is then one map-side-combined shuffle.
    No per-row state survives, exactly like the streaming state store
    after watermark eviction.
    """
    ev = load(spark, "events", sf_dir)
    cutoff = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 30 MINUTES")).alias("cutoff")
    )
    return (
        ev.join(F.broadcast(cutoff))
        .filter(F.col("ts") >= F.col("cutoff"))
        .groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type",
            "n_events",
        )
    )


@register(
    "stream_record_highs",
    "WITH e AS (SELECT event_id, user_id, value, "
    f"{_TS} AS ts, "
    "MAX(value) OVER (PARTITION BY user_id ORDER BY "
    f"{_TS}, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max "
    "FROM events) "
    "SELECT user_id, event_id, ts, value FROM e "
    "WHERE value IS NOT NULL AND (prev_max IS NULL OR value > prev_max)",
    doc="custom stateful op #2 batch twin: per-user personal-record (high-watermark) events — running-max state, pure value compare (stream side: applyInPandasWithState, streaming/stateful.py)",
)
def stream_record_highs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of ``record_highs_stateful``: a row is a record iff
    it strictly exceeds the max of all EARLIER rows of its key (frame
    ends at 1 PRECEDING — the current row never masks itself)."""
    from pyspark.sql import Window

    ev = load(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max("value").over(w)
    return (
        ev.withColumn("prev_max", prev_max)
        .filter(
            F.col("value").isNotNull()
            & (F.col("prev_max").isNull() | (F.col("value") > F.col("prev_max")))
        )
        .select("user_id", "event_id", "ts", "value")
    )


@register(
    "stream_interval_join",
    f"""
    SELECT e.user_id, e.event_id AS err_id, {_TS.replace('ts', 'e.ts')} AS err_ts,
           c.event_id AS click_id, {_TS.replace('ts', 'c.ts')} AS click_ts
    FROM events e JOIN events c
      ON c.user_id = e.user_id
     AND {_TS.replace('ts', 'c.ts')} >= {_TS.replace('ts', 'e.ts')} - INTERVAL '6 hours'
     AND {_TS.replace('ts', 'c.ts')} <= {_TS.replace('ts', 'e.ts')}
    WHERE e.event_type = 'error' AND c.event_type = 'click'
    """,
    doc="stream-stream interval join (error ← same-user clicks in the "
    "last 6 h), batch twin of the watermark-bounded streaming join",
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    return W.error_click_attribution(
        ev.filter(F.col("event_type") == "error"),
        ev.filter(F.col("event_type") == "click"),
    )


@register(
    "stream_topk_trending",
    "WITH c AS (SELECT "
    f"time_bucket(INTERVAL '10 minutes', {_TS}) AS win_start, "
    "event_type, CAST(COUNT(*) AS BIGINT) AS n_events "
    "FROM events GROUP BY 1, 2) "
    "SELECT win_start, CAST(rk AS INTEGER) AS rk, event_type, n_events "
    "FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY win_start "
    "ORDER BY n_events DESC, event_type) AS rk FROM c) WHERE rk <= "
    f"{W.TREND_K}",
    doc=f"top-{W.TREND_K} trending event types per tumbling 10-min "
    "window (windowed counts + per-window rank) — the dashboard/"
    "alerting leaderboard, batch twin of counts+foreachBatch-rank",
)
def stream_topk_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the windowed count is incremental streaming state (one
    row per window×type); the rank runs over FINALIZED windows only —
    per window the domain is |event_type| (tiny), so the window sort
    is trivial and the leaderboard emission is bounded per trigger."""
    return W.trending_topk(load(spark, "events", sf_dir))


@register(
    "stream_cdc_apply",
    "WITH ops AS (SELECT user_id, event_id, value, "
    f"{_TS} AS ts, "
    "CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op "
    "FROM events), last_op AS ("
    "SELECT user_id, op, value, ts, event_id, "
    "ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, "
    "event_id DESC) AS rn, "
    "CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_ops "
    "FROM ops) "
    "SELECT user_id, value AS final_value, ts AS last_ts, n_ops "
    "FROM last_op WHERE rn = 1 AND op <> 'D'",
    doc="CDC last-op-wins apply: replay an upsert/delete op log into "
    "final table state (Debezium-compaction semantics; 'error' = "
    "tombstone) — one per-key window pass",
)
def stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a change-data-capture log to obtain current state: per
    key, the LAST operation in event-time order wins; a trailing
    tombstone ('error' here) deletes the key entirely. This is the
    compaction a lakehouse MERGE loop (see ``merge_upsert_snapshot``)
    performs incrementally, expressed as one replay — the
    backfill/repair path of the same pipeline.

    Scale: one shuffle on the key; ``row_number`` streams the frame
    (no whole-partition buffering). In production the log is
    partition-pruned to the replay range first, and keys carry a
    coarse bucket so one hot entity cannot skew the sort — the
    ``join_skew_salted`` trick composes directly.
    """
    ev = load(spark, "events", sf_dir)
    ops = ev.select(
        "user_id",
        "event_id",
        "value",
        "ts",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    w = W_sql.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    wn = W_sql.partitionBy("user_id")
    last = ops.select(
        "user_id",
        "op",
        "value",
        "ts",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).cast("long").alias("n_ops"),
    )
    return last.filter((F.col("rn") == 1) & (F.col("op") != "D")).select(
        "user_id",
        F.col("value").alias("final_value"),
        F.col("ts").alias("last_ts"),
        "n_ops",
    )


@register(
    "stream_user_profile",
    "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, "
    "CAST(CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) "
    "AS VARCHAR) AS DOUBLE) / 1000000.0 AS sum_value, "
    "CAST(MAX(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) "
    "/ 1000000.0 AS max_value "
    "FROM events GROUP BY user_id",
    doc="batch twin of the transformWithState per-user running profile "
    "(count / exact quantized sum / max) — Spark 4 typed-state API, "
    "streaming/stateful_v2.py",
)
def stream_user_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-STATE twin of ``stateful_v2.user_profile_stateful``: after
    the full log replays, the last Update-mode row per user equals
    this aggregation (the replay test asserts exactly that). Integer
    quantized accumulation on all three sides — bit-identical."""
    ev = load(spark, "events", sf_dir)
    qv = F.floor(F.col("value") * 1e6 + 0.5).cast("long")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.sum(qv).cast("string").cast("double") / 1e6).alias("sum_value"),
        (F.max(qv).cast("double") / 1e6).alias("max_value"),
    )


@register(
    "stream_interval_join_left",
    f"""
    SELECT e.user_id, e.event_id AS err_id, {_TS.replace('ts', 'e.ts')} AS err_ts,
           c.event_id AS click_id, {_TS.replace('ts', 'c.ts')} AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = e.user_id
     AND {_TS.replace('ts', 'c.ts')} >= {_TS.replace('ts', 'e.ts')} - INTERVAL '6 hours'
     AND {_TS.replace('ts', 'c.ts')} <= {_TS.replace('ts', 'e.ts')}
    """,
    doc="stream-stream LEFT OUTER interval join: errors with no click "
    "in the 6 h lookback emit null-padded once the watermark closes "
    "the band — batch twin of the outer watermark join",
)
def stream_interval_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    return W.error_click_attribution_outer(
        ev.filter(F.col("event_type") == "error"),
        ev.filter(F.col("event_type") == "click"),
    )


@register(
    "stream_active_users",
    "WITH d AS (SELECT DISTINCT time_bucket(INTERVAL '60 minutes', "
    f"{_TS}) AS win_start, user_id FROM events) "
    "SELECT win_start, win_start + INTERVAL '60 minutes' AS win_end, "
    "COUNT(*) AS active_users FROM d GROUP BY 1",
    doc="hourly distinct active users (batch twin of the streaming "
    "windowed-dedup + count chain; COUNT DISTINCT is not streamable, "
    "dropDuplicates state is)",
)
def stream_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.active_users(load(spark, "events", sf_dir))


_RL_LIMIT = 5  # allowed events per user per 10-minute window


@register(
    "stream_rate_limit",
    f"""
    WITH e AS (
      SELECT user_id, event_id,
             time_bucket(INTERVAL '10 minutes', {_TS}) AS win_start,
             epoch_us({_TS}) AS us
      FROM events
    ), rk AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, win_start
               ORDER BY us, event_id) AS rn
      FROM e
    )
    SELECT CAST(win_start AS TIMESTAMP) AS win_start, user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(CASE WHEN rn <= {_RL_LIMIT} THEN 1 END) AS BIGINT)
             AS n_allowed,
           CAST(COUNT(CASE WHEN rn > {_RL_LIMIT} THEN 1 END) AS BIGINT)
             AS n_dropped,
           COALESCE(MAX(rn) > {_RL_LIMIT}, FALSE) AS was_throttled
    FROM rk GROUP BY 1, 2
    """,
    doc=f"per-user rate limiting ({_RL_LIMIT} events / 10-min window): "
    "allowed vs dropped counts per (window, user) — the quota-"
    "enforcement batch twin (streaming form = per-key counter state)",
)
def stream_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quota enforcement: admit the first N events per user per
    tumbling window (arrival order = (event time, event_id) — the
    deterministic total order), drop the rest, report both counts —
    the API-gateway / abuse-throttle policy. The streaming form is
    per-(user, window) counter state (``applyInPandasWithState``
    family: a counter that admits until N and counts drops,
    watermark-expired at window close); this batch twin IS its
    backfill/audit query and hash-pins the admission semantics both
    implementations must share.

    Determinism: window starts are epoch-aligned 10-minute buckets
    (Spark ``window()`` == DuckDB ``time_bucket``); admission rank is
    a row_number over the total order; flags coalesce null-safe.

    Scale: one shuffle on (user, window) — the same partitioning the
    streaming state store uses; per-key windows are bounded by the
    rate itself (a throttled key's rank pass stays cheap because the
    window only ever holds that window's arrivals).
    """
    ev = load(spark, "events", sf_dir)
    win = F.window("ts", "10 minutes")
    rk = ev.select(
        "user_id",
        "event_id",
        win.start.alias("win_start"),
        F.unix_micros("ts").alias("us"),
    ).withColumn(
        "rn",
        F.row_number().over(
            W_sql.partitionBy("user_id", "win_start").orderBy(
                "us", "event_id"
            )
        ),
    )
    return rk.groupBy("win_start", "user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col("rn") <= _RL_LIMIT, 1))
        .cast("long")
        .alias("n_allowed"),
        F.count(F.when(F.col("rn") > _RL_LIMIT, 1))
        .cast("long")
        .alias("n_dropped"),
        F.coalesce(F.max("rn") > _RL_LIMIT, F.lit(False)).alias(
            "was_throttled"
        ),
    )


_WM_P = 1000000007
_WM_MULT = 2654435761 % _WM_P
# deterministic transport jitter: 0..599 s per event
_WM_JIT = f"(((event_id % {_WM_P}) * {_WM_MULT}) % {_WM_P}) % 600"
_WM_DELAYS = (60, 300, 600)


@register(
    "stream_watermark_sweep",
    f"""
    WITH e AS (
      SELECT event_id,
             epoch_us({EVENTS_TS_SQL}) AS us,
             epoch_us({EVENTS_TS_SQL}) + ({_WM_JIT}) * 1000000 AS arr_us
      FROM events
    ),
    m AS (
      SELECT us,
             MAX(us) OVER (ORDER BY arr_us, event_id
                           ROWS UNBOUNDED PRECEDING) AS mx
      FROM e
    ),
    d AS (SELECT unnest([{", ".join(str(d) for d in _WM_DELAYS)}]) AS delay_s)
    SELECT CAST(d.delay_s AS BIGINT) AS delay_s,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN us < mx - d.delay_s * 1000000
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           CAST(SUM(CASE WHEN us < mx - d.delay_s * 1000000
                    THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
             AS late_ppm
    FROM m CROSS JOIN d GROUP BY d.delay_s
    """,
    doc="watermark-delay sweep: under deterministic 0-10 min transport "
    "jitter, what fraction of events arrives behind each candidate "
    "watermark (1/5/10 min) — the table that chooses "
    "withWatermark()'s delay before deploying the streaming job",
)
def stream_watermark_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The watermark-tuning study every Structured Streaming job needs
    before choosing ``withWatermark(delay)``: replay events in a
    deterministic ARRIVAL order (event time + a multiplicative-hash
    transport jitter of 0-10 min), track the running max event time —
    exactly the watermark clock — and count, for each candidate
    delay, the events whose event time lags that clock by more than
    the delay (those are dropped by the real streaming job; see
    ``stream_late_data_drop`` for the end-state semantics of one
    fixed delay). Output: the late-fraction per candidate — pick the
    smallest delay whose drop rate is acceptable.

    Determinism: the jitter is the repo's multiplicative hash; the
    running max is over a total arrival order; all counts integer.

    Scale: at 100 TB the running max runs per shard/key (arrival
    order is only ever defined per partition in a real bus — Kafka
    ordering is per-partition too); the global order here mirrors the
    single-stream semantics. One window pass + one 3-key aggregate.
    """
    ev = load(spark, "events", sf_dir)
    e = ev.select(
        "event_id",
        F.unix_micros("ts").alias("us"),
        (
            F.unix_micros("ts") + F.expr(_WM_JIT) * F.lit(1000000)
        ).alias("arr_us"),
    )
    # running max over arrival order: two-phase bucketed prefix max —
    # no single-partition window over the event stream
    m = with_prefix_agg(
        e, "arr_us", ("event_id",), "us", "max", out="mx"
    ).select("us", "mx")
    delays = spark.range(0, len(_WM_DELAYS)).select(
        F.element_at(
            F.array(*[F.lit(d) for d in _WM_DELAYS]),
            (F.col("id") + 1).cast("int"),
        ).alias("delay_s")
    )
    late = F.sum(
        F.when(
            F.col("us") < F.col("mx") - F.col("delay_s") * F.lit(1000000), 1
        ).otherwise(0)
    )
    return (
        m.crossJoin(F.broadcast(delays))
        .groupBy("delay_s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            late.cast("long").alias("n_late"),
            F.expr(
                "sum(CASE WHEN us < mx - delay_s * 1000000 THEN 1 ELSE 0 END)"
                " * 1000000 div count(1)"
            )
            .cast("long")
            .alias("late_ppm"),
        )
        .select(
            F.col("delay_s").cast("long").alias("delay_s"),
            "n_events",
            "n_late",
            "late_ppm",
        )
    )
