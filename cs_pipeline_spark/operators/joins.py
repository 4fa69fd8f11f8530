"""Join layer (SURVEY §2.4): nearest-coordinate snap, enrichment
pipelines, gap-fill, as-of, outer alignment.

The reference never calls a relational join by name — every join is a
coordinate-aligned xarray ``sel``/assignment. Re-expressed Spark-first:

- ``join_nearest_coord``: snap values to the nearest reference
  coordinate (reference ``dataset.py:224-235`` ``_nearest_point`` /
  ``_match_to_closest``). Coordinate sets are tiny relative to data
  (≤ ~10⁶ distinct grid coords vs 10⁹+ rows), so the snap *mapping* is
  built on distincts and **broadcast** — the fact table is never
  shuffled for the snap. Determinism: ties broken by smaller reference
  coord via ``row_number`` ordering (exactly mirrored in the oracle).
- ``join_enrich_co2`` (reference ``dataset.py:36-64``): monthly-mean →
  month semi-join → per-axis nearest snap → broadcast equi-join.
- ``join_enrich_wtd`` (reference ``dataset.py:66-114``): reversed
  projection (WTD snapped onto the ERA5 grid) + deterministic dedup of
  snapped keys (reference ``drop_duplicates``, dataset.py:99 — made
  order-independent with ``min_by`` on the unique source key).
- ``join_gapfill_station`` (reference ``core.py:273-295``): the
  reference assigns ERA5 values into the station frame *positionally*
  (``dfr.loc[:, (pred,'ERA5')] = values``); we do the intended
  semantics as an explicit timestamp equi-join.
- ``join_asof``: generic event-time nearest join (per-key latest
  marker ≤ t), the scalable generalization of the reference's 1-D
  nearest lookups; windowed per user_id (shuffle on user_id only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cs_pipeline_spark.functions.era5_fixture import ERA5_CTE, era5_events
from cs_pipeline_spark.operators.helpers import davg, dsum, sql_davg, sql_dsum
from cs_pipeline_spark.registry import register
from cs_pipeline_spark.tables import EVENTS_TS_SQL, load


# ---------- API ----------


def nearest_coord_mapping(
    values: DataFrame, refs: DataFrame, value_col: str, ref_col: str
) -> DataFrame:
    """Mapping (value_col → nearest ref_col), deterministic on ties.

    Both inputs should be distinct 1-D coordinate sets (config-scale).
    Cross-join of distincts + row_number over (|diff|, ref) — the
    result is a tiny frame meant to be broadcast into the fact join.
    """
    v = values.select(value_col).distinct()
    r = refs.select(ref_col).distinct()
    w = Window.partitionBy(value_col).orderBy(
        F.abs(F.col(value_col) - F.col(ref_col)), F.col(ref_col)
    )
    return (
        v.crossJoin(F.broadcast(r))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def join_nearest_coord(
    df: DataFrame,
    refs: DataFrame,
    value_col: str,
    ref_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Attach the nearest reference coordinate to every row of ``df``.

    The mapping (distinct values × distinct refs) is broadcast; ``df``
    itself is not shuffled — at 100 TB the fact table streams through
    a broadcast hash join.
    """
    mapping = nearest_coord_mapping(df, refs, value_col, ref_col)
    out = out_col or f"{value_col}_nearest"
    mapping = mapping.withColumnRenamed(ref_col, out)
    return df.join(F.broadcast(mapping), value_col, "left")


def _sql_nearest_cte(
    name: str, values_sql: str, refs_sql: str, value_col: str, ref_col: str, out: str
) -> str:
    """Oracle twin of nearest_coord_mapping (identical ordering)."""
    return (
        f"{name} AS (SELECT {value_col}, {out} FROM ("
        f"SELECT v.{value_col}, r.{ref_col} AS {out}, "
        f"ROW_NUMBER() OVER (PARTITION BY v.{value_col} "
        f"ORDER BY ABS(v.{value_col} - r.{ref_col}), r.{ref_col}) AS rn "
        f"FROM ({values_sql}) v CROSS JOIN ({refs_sql}) r) WHERE rn = 1)"
    )


# ---------- fixtures: CO₂ / WTD lookalikes derived from events ----------

# Monthly CO₂ cube on a coarser, offset grid (reference dataset.py:40,
# 138-146; FIXTURES.md §F2). Months spread over 3 values so the month
# semi-join actually cuts rows.
_CO2_DERIVE = (
    "SELECT event_id, "
    "make_timestamp(2024, CAST(1 + event_id % 3 AS INT), 1, 0, 0, 0) AS month, "
    "44.9 + CAST(user_id % 4 AS DOUBLE) * 0.5 AS clat, "
    "-74.1 + CAST(event_id % 4 AS DOUBLE) * 0.5 AS clon, "
    "(400.0 + value / 100.0) AS xco2 FROM events"
)
_CO2_CTE = f"co2 AS ({_CO2_DERIVE})"

# Fine-grid monthly WTD raster (reference dataset.py:148-169; F3).
_WTD_DERIVE = (
    "SELECT event_id, "
    "make_timestamp(2024, CAST(1 + user_id % 2 AS INT), 1, 0, 0, 0) AS month, "
    "44.87 + CAST(event_id % 16 AS DOUBLE) * 0.125 AS y, "
    "-74.03 + CAST(user_id % 16 AS DOUBLE) * 0.125 AS x, "
    "(value / 40.0) AS wtd FROM events"
)
_WTD_CTE = f"wtd_raster AS ({_WTD_DERIVE})"


def _co2_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    return ev.selectExpr(
        "event_id",
        "make_timestamp(2024, CAST(1 + event_id % 3 AS INT), 1, 0, 0, 0) AS month",
        "44.9 + CAST(user_id % 4 AS DOUBLE) * 0.5 AS clat",
        "-74.1 + CAST(event_id % 4 AS DOUBLE) * 0.5 AS clon",
        "(400.0 + value / 100.0) AS xco2",
    )


def _wtd_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    return ev.selectExpr(
        "event_id",
        "make_timestamp(2024, CAST(1 + user_id % 2 AS INT), 1, 0, 0, 0) AS month",
        "44.87 + CAST(event_id % 16 AS DOUBLE) * 0.125 AS y",
        "-74.03 + CAST(user_id % 16 AS DOUBLE) * 0.125 AS x",
        "(value / 40.0) AS wtd",
    )


# ---------- queries ----------


@register(
    "join_nearest_grid",
    f"WITH {ERA5_CTE}, {_CO2_CTE}, "
    + _sql_nearest_cte(
        "snap",
        "SELECT DISTINCT latitude FROM era5",
        "SELECT DISTINCT clat FROM co2",
        "latitude",
        "clat",
        "latitude_nearest",
    )
    + " SELECT latitude, latitude_nearest FROM snap",
    doc="generic 1-D nearest-coordinate snap (dataset.py:224-235)",
)
def join_nearest_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    era5 = era5_events(spark, sf_dir)
    co2 = _co2_frame(spark, sf_dir)
    return nearest_coord_mapping(era5, co2, "latitude", "clat").withColumnRenamed(
        "clat", "latitude_nearest"
    )


@register(
    "join_enrich_co2",
    f"WITH {ERA5_CTE}, {_CO2_CTE}, "
    "era5m AS (SELECT event_id, latitude, longitude, "
    "date_trunc('month', valid_time) AS month FROM era5), "
    "co2m AS (SELECT month, clat, clon, "
    + sql_davg("xco2")
    + " AS xco2 FROM co2 GROUP BY month, clat, clon), "
    "co2s AS (SELECT * FROM co2m WHERE month IN (SELECT DISTINCT month FROM era5m)), "
    + _sql_nearest_cte(
        "slat",
        "SELECT DISTINCT latitude FROM era5m",
        "SELECT DISTINCT clat FROM co2",
        "latitude",
        "clat",
        "snap_lat",
    )
    + ", "
    + _sql_nearest_cte(
        "slon",
        "SELECT DISTINCT longitude FROM era5m",
        "SELECT DISTINCT clon FROM co2",
        "longitude",
        "clon",
        "snap_lon",
    )
    + " SELECT e.event_id, e.latitude, e.longitude, c.xco2 "
    "FROM era5m e "
    "JOIN slat ON e.latitude = slat.latitude "
    "JOIN slon ON e.longitude = slon.longitude "
    "LEFT JOIN co2s c ON c.month = e.month "
    "AND c.clat = slat.snap_lat AND c.clon = slon.snap_lon",
    doc="CO₂ enrichment: monthly mean → month semi-join → snap → equi-join (dataset.py:36-64)",
)
def join_enrich_co2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CO₂ enrichment pipeline.

    Scale: the CO₂ cube is small next to hourly ERA5 (monthly ×
    coarse grid) → monthly-mean agg shuffles only CO₂; snap mappings
    and the aggregated cube are broadcast, so the big side is joined
    without a shuffle.
    """
    era5 = era5_events(spark, sf_dir).select(
        "event_id",
        "latitude",
        "longitude",
        F.date_trunc("month", "valid_time").alias("month"),
    )
    co2 = _co2_frame(spark, sf_dir)
    co2m = co2.groupBy("month", "clat", "clon").agg(davg("xco2").alias("xco2"))
    months = era5.select("month").distinct()
    co2s = co2m.join(F.broadcast(months), "month", "left_semi")
    slat = nearest_coord_mapping(era5, co2, "latitude", "clat").withColumnRenamed(
        "clat", "snap_lat"
    )
    slon = nearest_coord_mapping(era5, co2, "longitude", "clon").withColumnRenamed(
        "clon", "snap_lon"
    )
    return (
        era5.alias("e")
        .join(F.broadcast(slat), "latitude")
        .join(F.broadcast(slon), "longitude")
        .join(
            F.broadcast(co2s).alias("c"),
            (F.col("snap_lat") == F.col("c.clat"))
            & (F.col("snap_lon") == F.col("c.clon"))
            & (F.col("e.month") == F.col("c.month")),
            "left",
        )
        .select("event_id", "latitude", "longitude", "xco2")
    )


@register(
    "join_enrich_wtd",
    f"WITH {ERA5_CTE}, {_WTD_CTE}, "
    "era5m AS (SELECT event_id, latitude, longitude, "
    "date_trunc('month', valid_time) AS month FROM era5), "
    + _sql_nearest_cte(
        "sy",
        "SELECT DISTINCT y FROM wtd_raster",
        "SELECT DISTINCT latitude FROM era5m",
        "y",
        "latitude",
        "snap_lat",
    )
    + ", "
    + _sql_nearest_cte(
        "sx",
        "SELECT DISTINCT x FROM wtd_raster",
        "SELECT DISTINCT longitude FROM era5m",
        "x",
        "longitude",
        "snap_lon",
    )
    + ", wtd_snapped AS (SELECT w.month, sy.snap_lat, sx.snap_lon, "
    "arg_min(w.wtd, w.event_id) AS wtd "
    "FROM wtd_raster w JOIN sy ON w.y = sy.y JOIN sx ON w.x = sx.x "
    "GROUP BY w.month, sy.snap_lat, sx.snap_lon) "
    "SELECT e.event_id, e.latitude, e.longitude, w.wtd "
    "FROM era5m e LEFT JOIN wtd_snapped w ON w.month = e.month "
    "AND w.snap_lat = e.latitude AND w.snap_lon = e.longitude",
    doc="WTD enrichment: snap onto ERA5 grid + dedup + equi-join (dataset.py:66-114)",
)
def join_enrich_wtd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WTD enrichment — reversed snap direction + deterministic dedup.

    The reference dedups snapped keys with order-dependent
    ``drop_duplicates`` (dataset.py:99); we keep the row with the
    smallest source key (``min_by``) — order-independent, same intent.
    """
    era5 = era5_events(spark, sf_dir).select(
        "event_id",
        "latitude",
        "longitude",
        F.date_trunc("month", "valid_time").alias("month"),
    )
    wtd = _wtd_frame(spark, sf_dir)
    sy = nearest_coord_mapping(wtd, era5, "y", "latitude").withColumnRenamed(
        "latitude", "snap_lat"
    )
    sx = nearest_coord_mapping(wtd, era5, "x", "longitude").withColumnRenamed(
        "longitude", "snap_lon"
    )
    snapped = (
        wtd.join(F.broadcast(sy), "y")
        .join(F.broadcast(sx), "x")
        .groupBy("month", "snap_lat", "snap_lon")
        .agg(F.min_by("wtd", "event_id").alias("wtd"))
    )
    return (
        era5.alias("e")
        .join(
            F.broadcast(snapped).alias("w"),
            (F.col("w.month") == F.col("e.month"))
            & (F.col("w.snap_lat") == F.col("e.latitude"))
            & (F.col("w.snap_lon") == F.col("e.longitude")),
            "left",
        )
        .select("e.event_id", "e.latitude", "e.longitude", "w.wtd")
    )


_GAPFILL_PREDS = ["TA", "PA", "WS", "RH"]


@register(
    "join_gapfill_station",
    f"WITH {ERA5_CTE}, "
    "station AS (SELECT "
    f"{EVENTS_TS_SQL} AS timestamp, "
    "value / 10.0 AS TA_AMF, 101.0 + value / 1000.0 AS PA_AMF, "
    "value / 50.0 AS WS_AMF, 50.0 + value % 50.0 AS RH_AMF "
    "FROM events WHERE user_id % 2 = 0), "
    "era5p AS (SELECT valid_time, "
    "(t2m - 273.15) AS TA_ERA5, (sp / 1000.0) AS PA_ERA5, "
    "SQRT(u10 * u10 + v10 * v10) AS WS_ERA5, "
    "ROUND((100.0 * EXP((17.625 * (d2m - 273.15)) / (243.04 + (d2m - 273.15)) "
    "- (17.625 * (t2m - 273.15)) / (243.04 + (t2m - 273.15)))), 6) AS RH_ERA5 "
    "FROM era5) "
    "SELECT s.timestamp, s.TA_AMF, e.TA_ERA5, s.PA_AMF, e.PA_ERA5, "
    "s.WS_AMF, e.WS_ERA5, s.RH_AMF, e.RH_ERA5 "
    "FROM station s LEFT JOIN era5p e ON e.valid_time = s.timestamp",
    doc="gap-fill: station ←timestamp-join→ ERA5 predictors, {p}_AMF/{p}_ERA5 (core.py:273-295)",
)
def join_gapfill_station(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    station = ev.filter(F.col("user_id") % 2 == 0).select(
        F.col("ts").alias("timestamp"),
        (F.col("value") / 10.0).alias("TA_AMF"),
        (F.lit(101.0) + F.col("value") / 1000.0).alias("PA_AMF"),
        (F.col("value") / 50.0).alias("WS_AMF"),
        (F.lit(50.0) + F.col("value") % 50.0).alias("RH_AMF"),
    )
    from cs_pipeline_spark.functions.physics import predictor_col

    era5p = era5_events(spark, sf_dir).select(
        "valid_time",
        predictor_col("TA").alias("TA_ERA5"),
        predictor_col("PA").alias("PA_ERA5"),
        predictor_col("WS").alias("WS_ERA5"),
        F.round(predictor_col("RH"), 6).alias("RH_ERA5"),
    )
    return station.join(
        era5p, era5p.valid_time == station.timestamp, "left"
    ).select(
        "timestamp",
        "TA_AMF", "TA_ERA5",
        "PA_AMF", "PA_ERA5",
        "WS_AMF", "WS_ERA5",
        "RH_AMF", "RH_ERA5",
    )


@register(
    "join_asof",
    f"SELECT e.event_id, m.value AS last_error_value "
    f"FROM (SELECT event_id, user_id, {EVENTS_TS_SQL} AS ts FROM events) e "
    f"ASOF LEFT JOIN (SELECT user_id, {EVENTS_TS_SQL} AS ts, value FROM events "
    "WHERE event_type = 'error') m "
    "ON e.user_id = m.user_id AND e.ts >= m.ts",
    doc="per-key as-of join: latest marker ≤ t (generic nearest-in-time)",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via a per-key ordered window (scalable: one shuffle
    on user_id, no range explosion). Oracle uses DuckDB ASOF JOIN."""
    ev = load(spark, "events", sf_dir)
    marker = F.when(F.col("event_type") == "error", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.withColumn(
        "last_error_value", F.last(marker, ignorenulls=True).over(w)
    ).select("event_id", "last_error_value")


@register(
    "join_align_files",
    "SELECT COALESCE(o.month, l.month) AS month, o.n_orders, l.sum_qty FROM "
    "(SELECT date_trunc('month', o_orderdate) AS month, COUNT(*) AS n_orders "
    "FROM orders GROUP BY 1) o "
    "FULL JOIN "
    "(SELECT date_trunc('month', l_shipdate) AS month, "
    + sql_dsum("l_quantity")
    + " AS sum_qty FROM lineitem GROUP BY 1) l ON o.month = l.month",
    doc="outer coordinate alignment of two sources (dataset.py:33, combine_by_coords)",
)
def join_align_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        load(spark, "orders", sf_dir)
        .groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    l = (
        load(spark, "lineitem", sf_dir)
        .groupBy(F.date_trunc("month", "l_shipdate").alias("month"))
        .agg(dsum("l_quantity").alias("sum_qty"))
    )
    return (
        o.alias("o")
        .join(l.alias("l"), F.col("o.month") == F.col("l.month"), "full")
        .select(
            F.coalesce(F.col("o.month"), F.col("l.month")).alias("month"),
            "n_orders",
            "sum_qty",
        )
    )


@register(
    "join_interval_buckets",
    f"""
    SELECT o.o_orderkey, COUNT(*) AS n_items,
           {sql_dsum('l.l_quantity')} AS sum_qty
    FROM orders o JOIN lineitem l
      ON l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <  o.o_orderdate + INTERVAL 7 DAY
    WHERE o.o_orderpriority = '1-URGENT'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-03-01'
    GROUP BY o.o_orderkey
    """,
    doc="interval-overlap (range) join via day-bucket explode + equi-join + residual filter — the scale path that avoids the O(N·M) theta-join",
)
def join_interval_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join, bucketed. A naive theta-join (`ts BETWEEN start
    AND end`) has no equi-key, so Spark plans BroadcastNestedLoopJoin
    — O(N·M) and a non-starter at 100 TB. The standard rewrite:

    1. explode each interval into the DAY buckets it covers
       (bounded: a 7-day interval → 8 bucket rows);
    2. equi-join fact rows on their own day bucket — a plain
       shuffle/broadcast hash join;
    3. residual-filter the exact containment inside the join.

    Each fact row has exactly ONE bucket, so a (interval, row) pair
    can match at most once — no post-join dedup needed. Bucket
    granularity trades replication (intervals × buckets) against join
    selectivity; pick it ≈ median interval length. AQE handles the
    residual skew if many intervals cover one hot day.
    """
    o = load(spark, "orders", sf_dir).filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-03-01").cast("timestamp"))
    )
    iv = o.select(
        "o_orderkey",
        F.col("o_orderdate").alias("iv_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("iv_end"),
    ).withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.date_trunc("day", F.col("iv_start")),
                F.date_trunc("day", F.col("iv_end")),
                F.expr("INTERVAL 1 DAY"),
            )
        ),
    )
    li = load(spark, "lineitem", sf_dir).withColumn(
        "bucket", F.date_trunc("day", F.col("l_shipdate"))
    )
    return (
        li.join(iv, "bucket")
        .filter(
            (F.col("l_shipdate") >= F.col("iv_start"))
            & (F.col("l_shipdate") < F.col("iv_end"))
        )
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_quantity").alias("sum_qty"),
        )
    )


@register(
    "join_asof_nearest",
    "WITH e AS (SELECT event_id, user_id, "
    f"{EVENTS_TS_SQL} AS ts, "
    "CASE WHEN event_type = 'error' THEN value END AS mv, "
    f"CASE WHEN event_type = 'error' THEN epoch_us({EVENTS_TS_SQL}) END AS mts "
    "FROM events), "
    "w AS (SELECT event_id, epoch_us(ts) AS t_us, "
    "last_value(mv IGNORE NULLS) OVER wb AS back_val, "
    "last_value(mts IGNORE NULLS) OVER wb AS back_ts, "
    "first_value(mv IGNORE NULLS) OVER wf AS fwd_val, "
    "first_value(mts IGNORE NULLS) OVER wf AS fwd_ts "
    "FROM e WINDOW "
    "wb AS (PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), "
    "wf AS (PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) "
    "SELECT event_id, "
    "CASE WHEN back_ts IS NULL THEN fwd_val "
    "WHEN fwd_ts IS NULL THEN back_val "
    "WHEN (t_us - back_ts) <= (fwd_ts - t_us) THEN back_val "
    "ELSE fwd_val END AS nearest_error_value, "
    "CASE WHEN back_ts IS NULL THEN fwd_ts - t_us "
    "WHEN fwd_ts IS NULL THEN t_us - back_ts "
    "WHEN (t_us - back_ts) <= (fwd_ts - t_us) THEN t_us - back_ts "
    "ELSE fwd_ts - t_us END AS nearest_dt_us "
    "FROM w",
    doc="nearest-in-time join (|Δt| argmin, tie → earlier): backward + forward as-of passes merged — the time-axis analogue of the reference's _nearest_point (dataset.py:224-235)",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-marker join in either time direction. Two ordered
    window passes per key (backward carry + forward carry) and an
    integer-µs argmin — no range join, no explosion; exactly two
    passes over one user_id shuffle. Ties at equal |Δt| take the
    earlier marker (deterministic in both engines via the shared
    (ts, event_id) window order)."""
    ev = load(spark, "events", sf_dir)
    mv = F.when(F.col("event_type") == "error", F.col("value"))
    mts = F.when(
        F.col("event_type") == "error", F.unix_micros("ts")
    )
    order = [F.col("ts"), F.col("event_id")]
    wb = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    d = ev.select(
        "event_id",
        F.unix_micros("ts").alias("t_us"),
        F.last(mv, ignorenulls=True).over(wb).alias("back_val"),
        F.last(mts, ignorenulls=True).over(wb).alias("back_ts"),
        F.first(mv, ignorenulls=True).over(wf).alias("fwd_val"),
        F.first(mts, ignorenulls=True).over(wf).alias("fwd_ts"),
    )
    back_d = F.col("t_us") - F.col("back_ts")
    fwd_d = F.col("fwd_ts") - F.col("t_us")
    pick_back = F.col("fwd_ts").isNull() | (
        F.col("back_ts").isNotNull() & (back_d <= fwd_d)
    )
    return d.select(
        "event_id",
        F.when(pick_back, F.col("back_val"))
        .otherwise(F.col("fwd_val"))
        .alias("nearest_error_value"),
        F.when(pick_back, back_d).otherwise(fwd_d).alias("nearest_dt_us"),
    )


@register(
    "merge_upsert_snapshot",
    """
    WITH upd AS (
      SELECT o_orderkey, o_totalprice + 1000.0 AS new_price
      FROM orders WHERE o_orderkey % 100 = 0
      UNION ALL
      SELECT -k AS o_orderkey, 111.0 * k AS new_price
      FROM (SELECT unnest(generate_series(1, 5)) AS k)
    )
    SELECT COALESCE(u.o_orderkey, b.o_orderkey) AS o_orderkey,
           COALESCE(u.new_price, b.o_totalprice) AS price,
           CASE WHEN b.o_orderkey IS NULL THEN 'insert'
                WHEN u.o_orderkey IS NULL THEN 'keep'
                ELSE 'update' END AS op
    FROM orders b FULL JOIN upd u ON u.o_orderkey = b.o_orderkey
    """,
    doc="MERGE/upsert semantics without a lakehouse format: full-outer join base ⟗ updates → coalesce columns + insert/update/keep disposition — the snapshot-rewrite pattern",
)
def merge_upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO for plain parquet: the new snapshot is a full-outer
    join of the base table with the update set, coalescing updated
    columns and tagging each row's disposition. At 100 TB: Spark
    cannot broadcast-hash a FULL outer join, so for an update set ≪
    base decompose it — base LEFT-broadcast-JOIN updates (update/keep
    rows, no base shuffle) UNION updates ANTI-broadcast-JOIN base
    (insert rows); same result, zero base-side shuffles. The single
    full-outer form here is the general fact-to-fact shape (sort-merge
    on the key). A snapshot rewrite touches only partitions containing
    updated keys when the base is partitioned by a key prefix (dynamic
    partition overwrite). Deterministic: the update set is a pure
    function of the base."""
    o = load(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
    upd_existing = o.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey", (F.col("o_totalprice") + 1000.0).alias("new_price")
    )
    upd_new = spark.range(1, 6).select(
        (-F.col("id")).alias("o_orderkey"),
        (111.0 * F.col("id")).alias("new_price"),
    )
    upd = upd_existing.unionByName(upd_new)
    b, u = o.alias("b"), upd.alias("u")
    merged = b.join(
        u, F.col("b.o_orderkey") == F.col("u.o_orderkey"), "full_outer"
    )
    return merged.select(
        F.coalesce(F.col("u.o_orderkey"), F.col("b.o_orderkey")).alias(
            "o_orderkey"
        ),
        F.coalesce(F.col("u.new_price"), F.col("b.o_totalprice")).alias(
            "price"
        ),
        F.when(F.col("b.o_orderkey").isNull(), "insert")
        .when(F.col("u.o_orderkey").isNull(), "keep")
        .otherwise("update")
        .alias("op"),
    )


@register(
    "merge_upsert_broadcast",
    """
    WITH upd AS (
      SELECT o_orderkey, o_totalprice + 1000.0 AS new_price
      FROM orders WHERE o_orderkey % 100 = 0
      UNION ALL
      SELECT -k AS o_orderkey, 111.0 * k AS new_price
      FROM (SELECT unnest(generate_series(1, 5)) AS k)
    )
    SELECT COALESCE(u.o_orderkey, b.o_orderkey) AS o_orderkey,
           COALESCE(u.new_price, b.o_totalprice) AS price,
           CASE WHEN b.o_orderkey IS NULL THEN 'insert'
                WHEN u.o_orderkey IS NULL THEN 'keep'
                ELSE 'update' END AS op
    FROM orders b FULL JOIN upd u ON u.o_orderkey = b.o_orderkey
    """,
    doc="the broadcastable MERGE decomposition: base LEFT-broadcast-JOIN updates ∪ updates ANTI-broadcast-JOIN base — identical result to merge_upsert_snapshot with ZERO base-side shuffles (plan-asserted)",
)
def merge_upsert_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path for update-set ≪ base (the common case): Spark
    cannot broadcast a FULL outer join, but the same relation is
    base⟕updates (broadcast right) unioned with updates▷base
    (broadcast left-anti keeps the stream side = updates, base as
    build is wrong way — so anti is updates.join(base_keys,
    'left_anti') with base KEYS broadcast... keys-only projection
    keeps even a big base broadcastable when its distinct-key column
    is small; here both sides are tiny). Oracle: identical to the
    full-outer form."""
    o = load(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
    upd = (
        o.filter(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey", (F.col("o_totalprice") + 1000.0).alias("new_price")
        )
        .unionByName(
            spark.range(1, 6).select(
                (-F.col("id")).alias("o_orderkey"),
                (111.0 * F.col("id")).alias("new_price"),
            )
        )
    )
    # update/keep rows: base streams, updates broadcast
    upserted = (
        o.alias("b")
        .join(
            F.broadcast(upd.alias("u")),
            F.col("b.o_orderkey") == F.col("u.o_orderkey"),
            "left",
        )
        .select(
            F.col("b.o_orderkey").alias("o_orderkey"),
            F.coalesce(F.col("u.new_price"), F.col("b.o_totalprice")).alias(
                "price"
            ),
            F.when(F.col("u.o_orderkey").isNull(), "keep")
            .otherwise("update")
            .alias("op"),
        )
    )
    # insert rows: updates not present in the base (base keys broadcast)
    inserts = (
        upd.join(
            F.broadcast(o.select("o_orderkey")),
            "o_orderkey",
            "left_anti",
        )
        .select(
            "o_orderkey",
            F.col("new_price").alias("price"),
            F.lit("insert").alias("op"),
        )
    )
    return upserted.unionByName(inserts)


@register(
    "join_asof_tolerance",
    f"SELECT e.event_id, "
    "CASE WHEN m.ts >= e.ts - INTERVAL 1 HOUR THEN m.value END "
    "AS last_error_value_1h "
    f"FROM (SELECT event_id, user_id, {EVENTS_TS_SQL} AS ts FROM events) e "
    f"ASOF LEFT JOIN (SELECT user_id, {EVENTS_TS_SQL} AS ts, value FROM events "
    "WHERE event_type = 'error') m "
    "ON e.user_id = m.user_id AND e.ts >= m.ts",
    doc="as-of join with tolerance: latest marker <= t only if within "
    "1 h (stale matches nulled) -- pandas merge_asof(tolerance=...) "
    "semantics",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of with a max-staleness bound. Same single-shuffle ordered
    window as ``join_asof`` -- carrying the matched marker TIMESTAMP
    alongside its value costs one more window column, and the
    tolerance is a post-hoc null-out, not a join-condition change, so
    the plan shape (one exchange on user_id, no range explosion) is
    identical at any scale."""
    ev = load(spark, "events", sf_dir)
    is_m = F.col("event_type") == "error"
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_val = F.last(F.when(is_m, F.col("value")), ignorenulls=True).over(w)
    last_mts = F.last(F.when(is_m, F.col("ts")), ignorenulls=True).over(w)
    return ev.select(
        "event_id",
        F.when(
            last_mts >= F.col("ts") - F.expr("INTERVAL 1 HOUR"), last_val
        ).alias("last_error_value_1h"),
    )


# ---------- interval×interval overlap join (bucketed band join) ----------

_OVL_BUCKET_US = 10 * 60 * 1000000  # 10-minute buckets
_INCIDENT_US = 10 * 60 * 1000000  # error event → 10-minute incident window
_SESS_GAP_US = 5 * 60 * 1000000


@register(
    "join_interval_overlap",
    f"""
    WITH e AS (
      SELECT event_id, user_id, epoch_us({EVENTS_TS_SQL}) AS us
      FROM events
    ), marked AS (
      SELECT user_id, us, event_id,
             CASE WHEN us >= LAG(us) OVER w + {_SESS_GAP_US}
                  OR LAG(us) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ), sess AS (
      SELECT user_id,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
               ROWS UNBOUNDED PRECEDING) AS sess_id,
             us
      FROM marked
    ), sessions AS (
      SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
             MIN(us) AS s_start, MAX(us) + {_SESS_GAP_US} AS s_end
      FROM sess GROUP BY user_id, sess_id
    ), incidents AS (
      SELECT event_id AS incident_id, user_id,
             us AS i_start, us + {_INCIDENT_US} AS i_end
      FROM e JOIN (SELECT event_id AS eid FROM events
                   WHERE event_type = 'error') x ON x.eid = e.event_id
    )
    SELECT s.user_id, s.sess_id, i.incident_id,
           CAST(least(s.s_end, i.i_end)
                - greatest(s.s_start, i.i_start) AS BIGINT) AS overlap_us
    FROM sessions s JOIN incidents i
      ON i.user_id = s.user_id
     AND s.s_start < i.i_end AND i.i_start < s.s_end
    """,
    doc="interval×interval overlap join (user sessions × error-incident "
    "windows) via bucket-explode equi-join + residual predicate + "
    "pair dedup — the two-sided band-join scale pattern",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which user sessions overlap an error-incident window of the
    same user? Both sides are INTERVALS (session = 5-min-gap grouping,
    incident = 10 min after each error event), so neither side has
    'the' single bucket a point has — both explode to the 10-minute
    buckets they cover, equi-join on (user_id, bucket), then the exact
    overlap predicate filters and pair-dedup collapses multi-bucket
    matches.

    Scale: bucket explosion is bounded (interval_len/bucket + 1 rows
    per interval); the join is a plain hash equi-join on
    (user, bucket) — never the O(N·M) theta-join Spark would
    otherwise BNLJ. Overlap length is integer µs — exact.
    """
    ev = load(spark, "events", sf_dir).select(
        "event_id", "user_id", F.unix_micros("ts").alias("us"),
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    new_sess = F.when(
        F.col("us") >= F.lag("us").over(w) + _SESS_GAP_US, 1
    ).otherwise(F.when(F.lag("us").over(w).isNull(), 1).otherwise(0))
    sess = ev.select(
        "user_id", "us", "event_id", new_sess.alias("new_sess")
    ).select(
        "user_id",
        "us",
        F.sum("new_sess").over(wrun).alias("sess_id"),
    )
    sessions = sess.groupBy("user_id", "sess_id").agg(
        F.min("us").alias("s_start"),
        (F.max("us") + _SESS_GAP_US).alias("s_end"),
    )
    incidents = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        "user_id",
        F.col("us").alias("i_start"),
        (F.col("us") + _INCIDENT_US).alias("i_end"),
    )

    def buckets(lo: str, hi: str):
        # buckets covered by [lo, hi): bounded explode
        return F.sequence(
            F.expr(f"{lo} div {_OVL_BUCKET_US}"),
            F.expr(f"({hi} - 1) div {_OVL_BUCKET_US}"),
        )

    s_b = sessions.select(
        "*", F.explode(buckets("s_start", "s_end")).alias("bkt")
    )
    i_b = incidents.select(
        "*", F.explode(buckets("i_start", "i_end")).alias("bkt")
    )
    pairs = (
        s_b.join(i_b, ["user_id", "bkt"])
        .filter(
            (F.col("s_start") < F.col("i_end"))
            & (F.col("i_start") < F.col("s_end"))
        )
        .select("user_id", "sess_id", "incident_id", "s_start", "s_end",
                "i_start", "i_end")
        .distinct()
    )
    return pairs.select(
        "user_id",
        "sess_id",
        "incident_id",
        (
            F.least("s_end", "i_end") - F.greatest("s_start", "i_start")
        ).alias("overlap_us"),
    )


# ---------- cogrouped two-stream as-of (applyInPandas.cogroup) ----------


@register(
    "join_cogroup_lag",
    f"""
    WITH e AS (
      SELECT event_id, user_id, event_type,
             epoch_us({EVENTS_TS_SQL}) AS us
      FROM events
    ), c AS (SELECT user_id, us FROM e WHERE event_type = 'click'),
    p AS (SELECT event_id, user_id, us FROM e
          WHERE event_type = 'purchase'),
    lag AS (
      SELECT p.user_id, p.event_id, p.us - MAX(c.us) AS lag_us
      FROM p JOIN c ON c.user_id = p.user_id AND c.us <= p.us
      GROUP BY p.user_id, p.event_id, p.us
    ), pc AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_purchases
      FROM p GROUP BY user_id
    )
    SELECT l.user_id, pc.n_purchases,
           CAST(COUNT(*) AS BIGINT) AS n_with_click,
           CAST(MIN(l.lag_us) AS BIGINT) AS min_lag_us,
           CAST(MAX(l.lag_us) AS BIGINT) AS max_lag_us,
           CAST(SUM(l.lag_us) AS BIGINT) AS sum_lag_us
    FROM lag l JOIN pc ON pc.user_id = l.user_id
    GROUP BY l.user_id, pc.n_purchases
    """,
    doc="cogrouped two-stream as-of: per user, click→purchase lag "
    "stats computed in one applyInPandas cogroup pass — the Python "
    "escape hatch for per-key two-stream algorithms",
)
def join_cogroup_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``groupBy().cogroup().applyInPandas`` demonstration: both
    streams (clicks, purchases) are shuffled ONCE on user_id, and the
    per-user pair of Arrow batches lands in a single Python function —
    the API for per-key algorithms that need BOTH sides in memory at
    once (custom as-of variants, per-key DTW, order-book replays)
    when no join/window composition expresses them.

    Semantics here (deliberately join-expressible so the oracle can
    check the plumbing): for each purchase, the lag to the user's most
    recent prior-or-equal click; per user, count/min/max/sum of those
    integer-µs lags. The searchsorted binary-search inside the UDF is
    the classic merge-asof kernel. Everything stays integer µs —
    nothing to quantize.

    Scale: one co-partitioned shuffle per side, then embarrassingly
    parallel per-user Python with Arrow batch transfer; per-user state
    is bounded by that user's events (hot users → the same skew
    mitigations as any user_id shuffle). Native ``join_asof`` remains
    the fast path when built-ins suffice — this op registers the
    escape hatch, not a replacement.
    """
    import pandas as pd

    from pyspark.sql.types import (
        LongType,
        StructField as SF,
        StructType as ST,
    )

    ev = load(spark, "events", sf_dir).select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "us")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "us"
    )
    schema = ST(
        [
            SF("user_id", LongType()),
            SF("n_purchases", LongType()),
            SF("n_with_click", LongType()),
            SF("min_lag_us", LongType()),
            SF("max_lag_us", LongType()),
            SF("sum_lag_us", LongType()),
        ]
    )

    def lag_stats(key, c_pdf: pd.DataFrame, p_pdf: pd.DataFrame):
        import numpy as np

        if len(p_pdf) == 0 or len(c_pdf) == 0:
            return pd.DataFrame(columns=[f.name for f in schema.fields])
        cs = np.sort(c_pdf["us"].to_numpy())
        lags = []
        for t in p_pdf["us"].to_numpy():
            i = int(np.searchsorted(cs, t, side="right")) - 1
            if i >= 0:
                lags.append(int(t) - int(cs[i]))
        if not lags:
            return pd.DataFrame(columns=[f.name for f in schema.fields])
        return pd.DataFrame(
            [
                [
                    int(key[0]),
                    len(p_pdf),
                    len(lags),
                    min(lags),
                    max(lags),
                    sum(lags),
                ]
            ],
            columns=[f.name for f in schema.fields],
        )

    return (
        clicks.groupBy("user_id")
        .cogroup(purch.groupBy("user_id"))
        .applyInPandas(lag_stats, schema)
    )


# ---------- hierarchy flattening (iterative ancestor ascent) ----------

_HIER_ROUNDS = 8  # covers 10^8 keys with the div-10 parent function


def _hier_oracle() -> str:
    """Unrolled ascent: each level references its predecessor once
    (linear lineage — no materialization needed)."""
    parts = [
        "WITH nodes AS (SELECT c_custkey AS id FROM customer), ",
        "edges AS (SELECT n.id AS child, p.id AS parent FROM nodes n "
        "JOIN nodes p ON p.id = n.id // 10 AND n.id >= 10), ",
        "a0 AS (SELECT id AS node, id AS anc, 0 AS depth FROM nodes)",
    ]
    for t in range(_HIER_ROUNDS):
        parts.append(
            f", a{t + 1} AS ("
            f"SELECT a.node, COALESCE(e.parent, a.anc) AS anc, "
            f"a.depth + CASE WHEN e.parent IS NULL THEN 0 ELSE 1 END "
            f"AS depth "
            f"FROM a{t} a LEFT JOIN edges e ON e.child = a.anc)"
        )
    parts.append(
        f" SELECT node AS c_custkey, CAST(anc AS BIGINT) AS root_id, "
        f"CAST(depth AS BIGINT) AS depth FROM a{_HIER_ROUNDS}"
    )
    return "".join(parts)


@register(
    "join_hierarchy_flatten",
    _hier_oracle(),
    doc="hierarchy flattening: resolve every customer to its root "
    "ancestor + depth in the synthetic div-10 org tree by "
    f"{_HIER_ROUNDS} iterative left-join ascent rounds",
)
def join_hierarchy_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Org-chart/category-tree flattening: given parent edges, resolve
    each node's ROOT ancestor and depth — the denormalization every
    BI rollup over a hierarchy needs (region rollups, category trees,
    management chains). The tree is synthesized from the customer key
    (parent = id div 10 when that id exists as a customer; nodes whose
    parent is absent are roots) — same deterministic-synthesis
    convention as the graph module's link graph.

    Iterative ascent: each round left-joins the current ancestor
    against the edge table; nodes already at a root pass through
    unchanged (COALESCE), so the fixed round count only needs to
    cover the max depth (8 rounds = 10^8 keys here). Each level
    references its predecessor ONCE — linear lineage, no
    checkpointing (contrast ``graph_k_core``).

    Scale: per round, one equi-join on the ancestor key against the
    (much smaller) internal-node edge table — broadcast when the
    upper levels fit, hash-join co-partitioned otherwise. The
    pointer-doubling variant (anc(anc)) halves rounds to log₂(depth)
    at the cost of self-joining the full working set — worth it only
    for deep trees.
    """
    nodes = load(spark, "customer", sf_dir).select(
        F.col("c_custkey").alias("id")
    )
    p = nodes.select(F.col("id").alias("parent"))
    edges = (
        nodes.filter(F.col("id") >= 10)
        .select(F.col("id").alias("child"), F.expr("id div 10").alias("parent"))
        .join(p, "parent")
    )
    a = nodes.select(
        F.col("id").alias("node"),
        F.col("id").alias("anc"),
        F.lit(0).alias("depth"),
    )
    e = F.broadcast(edges.select(F.col("child"), F.col("parent")))
    for _ in range(_HIER_ROUNDS):
        a = (
            a.join(e, a.anc == e.child, "left")
            .select(
                "node",
                F.coalesce("parent", "anc").alias("anc"),
                (
                    F.col("depth")
                    + F.when(F.col("parent").isNull(), 0).otherwise(1)
                ).alias("depth"),
            )
        )
    return a.select(
        F.col("node").alias("c_custkey"),
        F.col("anc").cast("long").alias("root_id"),
        F.col("depth").cast("long").alias("depth"),
    )


# ---------- point-in-time dimension lookup (SCD2 consumer) ----------


@register(
    "join_pit_dimension",
    f"""
    WITH e AS (
      SELECT user_id, event_id, event_type,
             epoch_us({EVENTS_TS_SQL}) AS us
      FROM events
    ), p AS (
      SELECT user_id, us,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY us,
               event_id) AS k
      FROM e WHERE event_type = 'purchase'
    ), chg AS (
      -- tier changes when the cumulative purchase count crosses 3/10
      SELECT user_id, us AS valid_from,
             CASE WHEN k >= 10 THEN 'gold'
                  WHEN k >= 3 THEN 'silver' ELSE 'bronze' END AS tier
      FROM p WHERE k IN (1, 3, 10)
    ), dim AS (
      SELECT user_id, tier, valid_from,
             COALESCE(LEAD(valid_from) OVER (PARTITION BY user_id
               ORDER BY valid_from), 9223372036854775807) AS valid_to
      FROM chg
    ), hit AS (
      SELECT e.user_id, e.event_id, d.tier
      FROM e JOIN dim d ON d.user_id = e.user_id
                       AND e.us >= d.valid_from AND e.us < d.valid_to
      WHERE e.event_type = 'click'
    )
    SELECT tier, CAST(COUNT(*) AS BIGINT) AS n_clicks,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM hit GROUP BY tier
    """,
    doc="point-in-time dimension lookup: clicks joined to the user's "
    "tier version valid AT the event time (SCD2 intervals from the "
    "purchase history) — the training-set-correctness join",
)
def join_pit_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PIT (as-of-version) join — dimensional modeling's
    correctness core: each fact must see the dimension row that was
    valid WHEN THE FACT HAPPENED, not today's. Joining today's tier
    onto historical clicks is the leakage bug every feature-store
    paper warns about; this op is the leak-free form, with the
    dimension's SCD2 intervals built inline from the purchase history
    (tier upgrades at the 3rd and 10th purchase — the
    ``win_scd2_intervals`` change-log shape).

    Clicks before a user's first purchase match no interval and drop
    out (no tier existed yet) — inner-join semantics, stated.

    Scale: the interval join is an equi-join on user_id with a range
    predicate — co-partitioned on the key both sides already shuffle
    on, and per-user version counts are tiny (≤3 here; bounded by
    change frequency generally), so the per-key range filter is
    cheap. For high-version dimensions, bucket valid_from
    (``join_interval_buckets`` pattern).
    """
    ev = load(spark, "events", sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
    )
    wp = Window.partitionBy("user_id").orderBy("us", "event_id")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("k", F.row_number().over(wp))
        .filter(F.col("k").isin(1, 3, 10))
        .select(
            "user_id",
            F.col("us").alias("valid_from"),
            F.when(F.col("k") >= 10, "gold")
            .when(F.col("k") >= 3, "silver")
            .otherwise("bronze")
            .alias("tier"),
        )
    )
    wd = Window.partitionBy("user_id").orderBy("valid_from")
    dim = p.withColumn(
        "valid_to",
        F.coalesce(
            F.lead("valid_from").over(wd),
            F.lit(9223372036854775807),
        ),
    )
    clicks = ev.filter(F.col("event_type") == "click")
    hit = clicks.join(
        dim,
        (clicks.user_id == dim.user_id)
        & (clicks.us >= dim.valid_from)
        & (clicks.us < dim.valid_to),
    ).select(clicks.user_id.alias("uid"), "event_id", "tier")
    return hit.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.countDistinct("uid").cast("long").alias("n_users"),
    )


@register(
    "join_fuzzy_levenshtein",
    """
    WITH vocab AS (
      SELECT DISTINCT w FROM (
        SELECT unnest(string_split(p_name, ' ')) AS w FROM part) t
      WHERE length(w) >= 3
    ),
    probes AS (
      SELECT DISTINCT substr(w, 1, 1) || substr(w, 3) AS probe
      FROM vocab WHERE length(w) >= 4
    ),
    cand AS (
      SELECT p.probe, v.w AS matched,
             CAST(levenshtein(p.probe, v.w) AS BIGINT) AS dist
      FROM probes p JOIN vocab v
        ON substr(v.w, 1, 1) = substr(p.probe, 1, 1)
       AND abs(length(v.w) - length(p.probe)) <= 2
    )
    SELECT probe, matched, dist FROM cand WHERE dist <= 2
    """,
    doc="blocked fuzzy string join: misspelled probe terms matched to "
    "the part-name vocabulary by edit distance ≤ 2 within "
    "(first-char, length-band) blocks — the typo-tolerant dictionary "
    "lookup, never an all-pairs cross",
)
def join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy dictionary matching: probe strings (here each vocabulary
    word with its 2nd character deleted — a deterministic typo
    generator) joined to the vocabulary under ``levenshtein ≤ 2``,
    with candidate pairs restricted by a blocking predicate
    (same first character, length within ±2). Edit distance is an
    exact integer in both engines, so the result hash-matches with no
    quantization at all.

    This is the entity-resolution / query-spell-correction primitive:
    the match is exact-verify (true edit distance) over blocked
    candidates — the same candidate-then-verify shape as
    ``dedup_minhash_lsh``.

    Scale: the vocabulary and probe sets are DISTINCT token tables
    (≪ facts); blocking bounds each probe's candidate set by the
    (first-char, length) bucket size — at 100 TB swap the blocking
    key for q-gram LSH buckets and keep the levenshtein verify stage.
    The fact table contributes only a distinct-token aggregate; it is
    never carried through the join.
    """
    part = load(spark, "part", sf_dir)
    vocab = (
        part.select(F.explode(F.split("p_name", " ")).alias("w"))
        .filter(F.length("w") >= 3)
        .distinct()
    )
    probes = (
        vocab.filter(F.length("w") >= 4)
        .select(
            F.concat(
                F.substring("w", 1, 1), F.expr("substr(w, 3)")
            ).alias("probe")
        )
        .distinct()
    )
    cand = probes.join(
        F.broadcast(vocab),
        (F.substring(F.col("w"), 1, 1) == F.substring(F.col("probe"), 1, 1))
        & (
            F.abs(F.length("w") - F.length("probe")) <= 2
        ),
    ).select(
        "probe",
        F.col("w").alias("matched"),
        F.levenshtein("probe", "w").cast("long").alias("dist"),
    )
    return cand.filter(F.col("dist") <= 2)
