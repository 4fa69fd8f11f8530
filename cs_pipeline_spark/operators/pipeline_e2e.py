"""End-to-end area-process pipeline (reference ``run_area_process``,
core.py:170-257) as ONE lazy DataFrame chain:

    scan → (rename) → CO₂ enrichment join → WTD enrichment join →
    bbox clip + region tag → predictor projection → AGG_SCHEMA daily
    resample

This is the reference's flagship workload expressed Spark-first. The
physical shape at 100 TB: the hourly fact table streams through
broadcast hash joins (CO₂ cube, WTD snap table, and region table are
all broadcast — built from distinct coordinate sets and monthly
aggregates of the *small* sides), then one shuffle for the
(region, lat, lon, day) aggregation. Catalyst prunes the scan to the
columns the chosen predictors need; the reference's manual per-region
spill/reload (write_chunks/concat_chunks) disappears entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cs_pipeline_spark.functions.era5_fixture import DERIVATIONS, era5_events
from cs_pipeline_spark.functions.physics import (
    TRANSCENDENTAL,
    predictor_col,
    predictor_sql,
)
from cs_pipeline_spark.operators.helpers import davg, sql_davg
from cs_pipeline_spark.operators.joins import (
    _co2_frame,
    _CO2_CTE,
    _sql_nearest_cte,
    _wtd_frame,
    _WTD_CTE,
    nearest_coord_mapping,
)
from cs_pipeline_spark.operators.spatial import (
    _REGIONS_SQL,
    clip_bbox,
    regions_frame,
)
from cs_pipeline_spark.plans.agg_compiler import (
    active_predictors,
    compile_agg_schema,
    compile_agg_schema_sql,
)
from cs_pipeline_spark.registry import pin, register

# Representative predictor set spanning every formula family, incl.
# the two that consume the enrichment joins (CO2 ← xco2, WTD ← wtd).
_PRED_POOL = ["TA", "RH", "WS", "VPD", "NETRAD", "SWC_1", "CO2", "WTD", "P"]


def process_area(
    spark: SparkSession,
    sf_dir: str,
    granularity: str = "daily",
    trunc: str = "day",
) -> DataFrame:
    """The full chain; see module docstring."""
    preds = active_predictors(granularity, _PRED_POOL)
    era5 = (
        era5_events(spark, sf_dir)
        .drop("xco2", "wtd")  # enrichment must supply these
        .withColumn("month", F.date_trunc("month", "valid_time"))
    )

    # Distinct fact-side coordinate sets, computed ONCE and reused by
    # both enrichment snaps — without this the CO₂ and WTD snap
    # mappings each re-scan the fact table for the same distincts
    # (2 extra full-table aggregations at 100 TB).
    lat_d = pin(era5.select("latitude").distinct())
    lon_d = pin(era5.select("longitude").distinct())

    # --- CO₂ enrichment (dataset.py:36-64) ---
    co2 = _co2_frame(spark, sf_dir)
    co2m = co2.groupBy("month", "clat", "clon").agg(davg("xco2").alias("xco2"))
    months = era5.select("month").distinct()
    co2s = co2m.join(F.broadcast(months), "month", "left_semi")
    slat = nearest_coord_mapping(lat_d, co2, "latitude", "clat").withColumnRenamed(
        "clat", "snap_lat"
    )
    slon = nearest_coord_mapping(lon_d, co2, "longitude", "clon").withColumnRenamed(
        "clon", "snap_lon"
    )
    e1 = (
        era5.join(F.broadcast(slat), "latitude")
        .join(F.broadcast(slon), "longitude")
        .alias("e")
        .join(
            F.broadcast(co2s).alias("c"),
            (F.col("e.snap_lat") == F.col("c.clat"))
            & (F.col("e.snap_lon") == F.col("c.clon"))
            & (F.col("e.month") == F.col("c.month")),
            "left",
        )
        .select("e.*", "c.xco2")
        .drop("snap_lat", "snap_lon")
    )

    # --- WTD enrichment (dataset.py:66-114; snap direction reversed) ---
    wtd = _wtd_frame(spark, sf_dir)
    sy = nearest_coord_mapping(wtd, lat_d, "y", "latitude").withColumnRenamed(
        "latitude", "wsnap_lat"
    )
    sx = nearest_coord_mapping(wtd, lon_d, "x", "longitude").withColumnRenamed(
        "longitude", "wsnap_lon"
    )
    wtd_snapped = (
        wtd.join(F.broadcast(sy), "y")
        .join(F.broadcast(sx), "x")
        .groupBy("month", "wsnap_lat", "wsnap_lon")
        .agg(F.min_by("wtd", "event_id").alias("wtd"))
    )
    e2 = (
        e1.alias("e")
        .join(
            F.broadcast(wtd_snapped).alias("w"),
            (F.col("w.month") == F.col("e.month"))
            & (F.col("w.wsnap_lat") == F.col("e.latitude"))
            & (F.col("w.wsnap_lon") == F.col("e.longitude")),
            "left",
        )
        .select("e.*", "w.wtd")
    )

    # --- bbox clip + region tag (dataset.py:171-222) ---
    clipped = clip_bbox(e2, regions_frame(spark))

    # --- predictor projection (processor.py:18-46) ---
    cols = [
        F.col("region_id"),
        F.col("latitude"),
        F.col("longitude"),
        F.col("valid_time"),
        F.col("event_id"),
    ]
    for p in preds:
        c = predictor_col(p)
        if p in TRANSCENDENTAL:
            c = F.round(c, 6)
        cols.append(c.alias(p))
    out = clipped.select(*cols)

    # --- AGG_SCHEMA resample (core.py:217-248) ---
    return out.groupBy(
        "region_id",
        "latitude",
        "longitude",
        F.date_trunc(trunc, "valid_time").alias("bucket"),
    ).agg(*compile_agg_schema(granularity, preds, order_col="event_id"))


def _oracle(granularity: str = "daily", trunc: str = "day") -> str:
    preds = active_predictors(granularity, _PRED_POOL)
    era5b = (
        "era5b AS (SELECT event_id, "
        + ", ".join(
            f"{sql} AS {name}"
            for name, sql in DERIVATIONS
            if name not in ("xco2", "wtd")
        ).replace("ts AS valid_time", "CAST(ts AS TIMESTAMP) AS valid_time")
        + ", date_trunc('month', CAST(ts AS TIMESTAMP)) AS month FROM events)"
    )
    pred_exprs = ", ".join(
        (
            f"ROUND({predictor_sql(p)}, 6)"
            if p in TRANSCENDENTAL
            else predictor_sql(p)
        )
        + f" AS {p}"
        for p in preds
    )
    aggs = ", ".join(
        compile_agg_schema_sql(granularity, preds, order_col="event_id")
    )
    return (
        f"WITH {era5b}, {_CO2_CTE}, {_WTD_CTE}, {_REGIONS_SQL}, "
        "co2m AS (SELECT month, clat, clon, "
        + sql_davg("xco2")
        + " AS xco2 FROM co2 GROUP BY month, clat, clon), "
        "co2s AS (SELECT * FROM co2m WHERE month IN "
        "(SELECT DISTINCT month FROM era5b)), "
        + _sql_nearest_cte(
            "slat",
            "SELECT DISTINCT latitude FROM era5b",
            "SELECT DISTINCT clat FROM co2",
            "latitude",
            "clat",
            "snap_lat",
        )
        + ", "
        + _sql_nearest_cte(
            "slon",
            "SELECT DISTINCT longitude FROM era5b",
            "SELECT DISTINCT clon FROM co2",
            "longitude",
            "clon",
            "snap_lon",
        )
        + ", e1 AS (SELECT e.*, c.xco2 FROM era5b e "
        "JOIN slat ON e.latitude = slat.latitude "
        "JOIN slon ON e.longitude = slon.longitude "
        "LEFT JOIN co2s c ON c.month = e.month "
        "AND c.clat = slat.snap_lat AND c.clon = slon.snap_lon), "
        + _sql_nearest_cte(
            "sy",
            "SELECT DISTINCT y FROM wtd_raster",
            "SELECT DISTINCT latitude FROM era5b",
            "y",
            "latitude",
            "wsnap_lat",
        )
        + ", "
        + _sql_nearest_cte(
            "sx",
            "SELECT DISTINCT x FROM wtd_raster",
            "SELECT DISTINCT longitude FROM era5b",
            "x",
            "longitude",
            "wsnap_lon",
        )
        + ", wtd_snapped AS (SELECT w.month, sy.wsnap_lat, sx.wsnap_lon, "
        "arg_min(w.wtd, w.event_id) AS wtd "
        "FROM wtd_raster w JOIN sy ON w.y = sy.y JOIN sx ON w.x = sx.x "
        "GROUP BY w.month, sy.wsnap_lat, sx.wsnap_lon), "
        "e2 AS (SELECT e.*, w.wtd FROM e1 e "
        "LEFT JOIN wtd_snapped w ON w.month = e.month "
        "AND w.wsnap_lat = e.latitude AND w.wsnap_lon = e.longitude), "
        "clipped AS (SELECT e.*, r.region_id FROM e2 e "
        "JOIN regions r ON e.latitude BETWEEN r.south AND r.north "
        "AND e.longitude BETWEEN r.west AND r.east), "
        f"p AS (SELECT region_id, latitude, longitude, valid_time, event_id, "
        f"{pred_exprs} FROM clipped) "
        "SELECT region_id, latitude, longitude, "
        f"date_trunc('{trunc}', valid_time) AS bucket, {aggs} "
        "FROM p GROUP BY region_id, latitude, longitude, bucket"
    )


register(
    "process_area_e2e",
    _oracle(),
    doc="flagship: full area-process chain — scan → CO₂/WTD enrichment → "
    "clip → predictors → daily AGG_SCHEMA resample (core.py:170-257)",
)(process_area)


def process_area_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return process_area(spark, sf_dir, granularity="monthly", trunc="month")


register(
    "process_area_monthly_e2e",
    _oracle("monthly", "month"),
    doc="flagship (monthly): same chain with MONTHLY AGG_SCHEMA resample "
    "(PPFD DROPped at this granularity — core.py:246)",
)(process_area_monthly)
