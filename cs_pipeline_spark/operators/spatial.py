"""Spatial operators: bbox clip, corner-snap clip, region tagging
(SURVEY §2.2 ``filter_bbox_clip``, reference ``dataset.py:171-222``).

Regions are config-scale (3…1000s of bboxes) → they live in a
broadcast frame; the grid-side filter is a broadcast range join, so
the fact table is clipped without any shuffle. At 100 TB with many
regions, a non-equi broadcast join stays the right shape (regions are
tiny); for millions of regions you'd bucket both sides to a coarse
grid first (documented in SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cs_pipeline_spark.functions.era5_fixture import (
    ERA5_CTE,
    era5_events,
    era5_sql,
)
from cs_pipeline_spark.operators.helpers import davg, sql_davg, literal_df
from cs_pipeline_spark.registry import register
from cs_pipeline_spark.tables import load

# Three regions over the fixture's 8×8 grid (FIXTURES.md §F5): one
# aligned, one between grid points, one degenerate (smaller than one
# cell — the corner-snap must still pick 2 distinct coords).
_REGIONS: list[tuple[str, float, float, float, float]] = [
    # (region_id, north, west, south, east)
    ("r0", 46.0, -74.0, 45.0, -73.0),
    ("r1", 46.6, -73.4, 45.9, -72.4),
    ("r2", 45.6, -73.6, 45.55, -73.55),
]

_REGIONS_SQL = (
    "regions(region_id, north, west, south, east) AS (VALUES "
    + ", ".join(f"('{r}', {n}, {w}, {s}, {e})" for r, n, w, s, e in _REGIONS)
    + ")"
)


def regions_frame(spark: SparkSession) -> DataFrame:
    return literal_df(
        spark,
        _REGIONS,
        "region_id string, north double, west double, "
        "south double, east double",
    )


def clip_bbox(df: DataFrame, regions: DataFrame) -> DataFrame:
    """General bbox clip: broadcast range join + region_id tag.

    A cell inside two overlapping regions is emitted once per region
    (the reference processes regions independently and concatenates).
    """
    cond = (
        F.col("latitude").between(F.col("south"), F.col("north"))
        & F.col("longitude").between(F.col("west"), F.col("east"))
    )
    return df.join(F.broadcast(regions), cond, "inner").drop(
        "north", "west", "south", "east"
    )


@register(
    "filter_bbox_clip",
    f"WITH {ERA5_CTE}, {_REGIONS_SQL} "
    "SELECT e.event_id, r.region_id, e.latitude, e.longitude, e.t2m "
    "FROM era5 e JOIN regions r ON e.latitude BETWEEN r.south AND r.north "
    "AND e.longitude BETWEEN r.west AND r.east",
    doc="bbox clip + region_id tag via broadcast range join (dataset.py:171-222)",
)
def filter_bbox_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = era5_events(spark, sf_dir).select(
        "event_id", "latitude", "longitude", "t2m"
    )
    return clip_bbox(df, regions_frame(spark)).select(
        "event_id", "region_id", "latitude", "longitude", "t2m"
    )


# --- corner-snap mode (exact reference parity, dataset.py:179-187) ---
#
# xarray's `sel(method='nearest')` on the two bbox corners snaps each
# edge to the nearest grid coordinate INDEPENDENTLY PER AXIS, and
# `_nearest_point` (dataset.py:224-230) EXCLUDES the already-chosen
# point when snapping the second edge — so a degenerate bbox still
# selects 2 distinct coordinates per axis. The clip then keeps grid
# points between the two snapped values (inclusive).


def _snap_two_sql(axis: str, hi: str, lo: str) -> str:
    """CTEs: per region, snap hi/lo edges to 2 distinct grid coords
    (second pick excludes the first — dataset.py:224-230)."""
    grid = f"(SELECT DISTINCT {axis} FROM era5)"
    return (
        f"first_{axis} AS ("
        f"SELECT r.region_id, arg_min(g.{axis}, ABS(g.{axis} - r.{hi})) AS c1 "
        f"FROM regions r CROSS JOIN {grid} g GROUP BY r.region_id, r.{hi}), "
        f"second_{axis} AS ("
        f"SELECT r.region_id, arg_min(g.{axis}, ABS(g.{axis} - r.{lo})) AS c2 "
        f"FROM regions r JOIN first_{axis} f ON f.region_id = r.region_id "
        f"CROSS JOIN {grid} g WHERE g.{axis} <> f.c1 GROUP BY r.region_id, r.{lo}), "
        f"snap_{axis} AS ("
        f"SELECT f.region_id, f.c1 AS {axis}_hi, s.c2 AS {axis}_lo "
        f"FROM first_{axis} f JOIN second_{axis} s ON s.region_id = f.region_id)"
    )


def corner_snap_regions(
    grid: DataFrame, regions: DataFrame, axis: str, hi: str, lo: str
) -> DataFrame:
    """Per region: snapped (hi, lo) coords on one axis, second pick
    excluding the first (reference ``_nearest_point`` exclusion)."""
    coords = grid.select(axis).distinct()
    pairs = regions.crossJoin(F.broadcast(coords))
    first = pairs.groupBy("region_id", hi, lo).agg(
        F.min_by(axis, F.abs(F.col(axis) - F.col(hi))).alias("c1")
    )
    second = (
        pairs.join(first.select("region_id", "c1"), "region_id")
        .filter(F.col(axis) != F.col("c1"))
        .groupBy("region_id")
        .agg(F.min_by(axis, F.abs(F.col(axis) - F.col(lo))).alias("c2"))
    )
    return (
        first.select("region_id", "c1")
        .join(second, "region_id")
        .select(
            "region_id",
            F.col("c1").alias(f"{axis}_hi"),
            F.col("c2").alias(f"{axis}_lo"),
        )
    )


@register(
    "filter_bbox_corner_snap",
    f"WITH {ERA5_CTE}, {_REGIONS_SQL}, "
    + _snap_two_sql("latitude", "north", "south")
    + ", "
    + _snap_two_sql("longitude", "east", "west")
    + " SELECT e.event_id, s.region_id, e.latitude, e.longitude "
    "FROM era5 e "
    "JOIN snap_latitude s ON e.latitude "
    "BETWEEN LEAST(s.latitude_hi, s.latitude_lo) AND GREATEST(s.latitude_hi, s.latitude_lo) "
    "JOIN snap_longitude t ON t.region_id = s.region_id AND e.longitude "
    "BETWEEN LEAST(t.longitude_hi, t.longitude_lo) AND GREATEST(t.longitude_hi, t.longitude_lo)",
    doc="corner-snap bbox clip with second-pick exclusion (dataset.py:179-187,224-230)",
)
def filter_bbox_corner_snap(spark: SparkSession, sf_dir: str) -> DataFrame:
    grid = era5_events(spark, sf_dir).select(
        "event_id", "latitude", "longitude"
    )
    regions = regions_frame(spark)
    slat = corner_snap_regions(grid, regions, "latitude", "north", "south").alias("a")
    slon = corner_snap_regions(grid, regions, "longitude", "east", "west").alias("b")
    return (
        grid.join(
            F.broadcast(slat),
            F.col("latitude").between(
                F.least("a.latitude_hi", "a.latitude_lo"),
                F.greatest("a.latitude_hi", "a.latitude_lo"),
            ),
            "inner",
        )
        .join(
            F.broadcast(slon),
            (F.col("b.region_id") == F.col("a.region_id"))
            & F.col("longitude").between(
                F.least("b.longitude_hi", "b.longitude_lo"),
                F.greatest("b.longitude_hi", "b.longitude_lo"),
            ),
            "inner",
        )
        .select(
            "event_id",
            F.col("a.region_id").alias("region_id"),
            "latitude",
            "longitude",
        )
    )


_EARTH_R_KM = 6371.0088
_REF_LAT, _REF_LON = 45.5, -73.6  # fixed reference point (Montreal-ish)


@register(
    "f_haversine",
    f"WITH {ERA5_CTE}, pts AS (SELECT DISTINCT latitude, longitude FROM era5) "
    "SELECT latitude, longitude, ROUND("
    f"2.0 * {_EARTH_R_KM} * ASIN(SQRT("
    f"POW(SIN(RADIANS(latitude - ({_REF_LAT})) / 2.0), 2) "
    f"+ COS(RADIANS(latitude)) * COS(RADIANS({_REF_LAT})) "
    f"* POW(SIN(RADIANS(longitude - ({_REF_LON})) / 2.0), 2)"
    ")), 6) AS dist_km FROM pts",
    doc="haversine great-circle distance to a reference point per grid cell (the geodesic metric behind nearest-station lookups; transcendental output rounded to 6 dp like the physics ops)",
)
def f_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle distance as a pure Column expression (sin/cos/
    asin — JVM codegen, no UDF). The proper metric when 1-D
    per-axis nearest snapping (join_nearest_grid) isn't enough —
    e.g. picking the closest STATION to a grid cell. At 100 TB:
    compute against a broadcast station list and min_by the
    distance; the expression fuses into the scan stage."""
    grid = (
        era5_events(spark, sf_dir)
        .select("latitude", "longitude")
        .distinct()
    )
    dphi = F.radians(F.col("latitude") - F.lit(_REF_LAT)) / 2
    dlmb = F.radians(F.col("longitude") - F.lit(_REF_LON)) / 2
    h = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(F.radians("latitude"))
        * F.cos(F.radians(F.lit(_REF_LAT)))
        * F.sin(dlmb)
        * F.sin(dlmb)
    )
    dist = F.lit(2.0 * _EARTH_R_KM) * F.asin(F.sqrt(h))
    return grid.select(
        "latitude", "longitude", F.round(dist, 6).alias("dist_km")
    )


# ---------- Z-order (Morton) clustering key ----------

_ZBITS = 3  # 8x8 grid -> 3 bits per axis


def _z_expr(li: str, xi: str) -> str:
    """Bit-interleave SQL text (identical in Spark SQL and DuckDB):
    z = lat_b0 | lon_b0<<1 | lat_b1<<2 | lon_b1<<3 | ..."""
    terms = []
    for k in range(_ZBITS):
        terms.append(f"((({li} >> {k}) & 1) << {2 * k})")
        terms.append(f"((({xi} >> {k}) & 1) << {2 * k + 1})")
    return "(" + " | ".join(terms) + ")"


_LAT_IDX = "CAST(FLOOR((latitude - 45.0) / 0.25 + 0.5) AS BIGINT)"
_LON_IDX = "CAST(FLOOR((longitude + 74.0) / 0.25 + 0.5) AS BIGINT)"


@register(
    "f_zorder_cells",
    f"WITH {ERA5_CTE}, cells AS "
    "(SELECT DISTINCT latitude, longitude FROM era5) "
    f"SELECT latitude, longitude, "
    f"{_z_expr(_LAT_IDX, _LON_IDX)} AS zorder FROM cells",
    doc="Z-order (Morton) clustering key per grid cell: bit-interleaved "
    "lat/lon indices — the multi-dimensional sort key for data skipping",
)
def f_zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton curve key for 2-D clustering, as pure integer bit
    arithmetic (exact, engine-identical — the same expression text
    runs in Spark SQL and DuckDB).

    Scale: a 1-D sort by zorder co-locates 2-D-nearby cells in the
    same files, so min/max footer stats prune BOTH dimensions of a
    bbox query — `repartitionByRange(zorder).sortWithinPartitions`
    before the write is the lakehouse OPTIMIZE ZORDER BY in plain
    DataFrame code (pair with the zone-map sink `sink_sorted_stats`).
    """
    cells = (
        era5_events(spark, sf_dir)
        .select("latitude", "longitude")
        .distinct()
    )
    return cells.select(
        "latitude",
        "longitude",
        F.expr(_z_expr(_LAT_IDX, _LON_IDX)).alias("zorder"),
    )


# ---------- 3×3 stencil smoothing (raster convolution shape) ----------

_OFFS = [(dy, dx) for dy in (-0.25, 0.0, 0.25) for dx in (-0.25, 0.0, 0.25)]


@register(
    "agg_grid_smooth",
    era5_sql(
        ", cell AS (SELECT latitude, longitude, "
        + sql_davg("t2m")
        + " AS m FROM era5 GROUP BY latitude, longitude), "
        "offs AS (SELECT dy.v AS dy, dx.v AS dx "
        "FROM (VALUES (-0.25), (0.0), (0.25)) dy(v), "
        "(VALUES (-0.25), (0.0), (0.25)) dx(v)), "
        "scatter AS (SELECT latitude + dy AS lat2, longitude + dx AS lon2, "
        "CAST(FLOOR(m * 1000000.0 + 0.5) AS BIGINT) AS qm "
        "FROM cell CROSS JOIN offs), "
        "sm AS (SELECT lat2, lon2, CAST(COUNT(*) AS BIGINT) AS n_nbr, "
        "CAST(CAST(SUM(qm) AS VARCHAR) AS DOUBLE) "
        "/ (1000000.0 * COUNT(*)) AS t2m_smooth "
        "FROM scatter GROUP BY lat2, lon2) "
        "SELECT sm.lat2 AS latitude, sm.lon2 AS longitude, n_nbr, t2m_smooth "
        "FROM sm JOIN cell ON cell.latitude = sm.lat2 "
        "AND cell.longitude = sm.lon2"
    ),
    doc="3×3 grid-stencil smoothing of per-cell means (scatter-form "
    "convolution: explode 9 offsets → one map-side-combined groupBy) — "
    "the raster filter the reference's coarsen generalizes to",
)
def agg_grid_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood-mean smoothing over the 0.25° grid, in SCATTER
    form: each cell mean is exploded to the 9 positions it influences
    and a single groupBy(target) re-collects them — one shuffle with
    map-side combine, the scalable shape of any fixed-kernel raster
    convolution (Spark has no 2D window frame). Edge cells average
    over their true (< 9) contributor count; positions outside the
    grid are dropped by the join back to real cells.

    Determinism: cell means come off the exact quantized-sum path,
    are re-quantized to integers before the neighbor sum (integer
    addition — order-free), and the final mean is one correctly-
    rounded division. Grid coordinates are exact binary multiples of
    0.25, so lat+dy key matches are exact — no float-key hazards.
    """
    era5 = era5_events(spark, sf_dir)
    cell = era5.groupBy("latitude", "longitude").agg(
        davg("t2m").alias("m")
    )
    offs = F.array(
        *[
            F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
            for dy, dx in _OFFS
        ]
    )
    scatter = cell.select(
        "latitude", "longitude", "m", F.explode(offs).alias("o")
    ).select(
        (F.col("latitude") + F.col("o.dy")).alias("lat2"),
        (F.col("longitude") + F.col("o.dx")).alias("lon2"),
        F.floor(F.col("m") * F.lit(1e6) + F.lit(0.5))
        .cast("long")
        .alias("qm"),
    )
    sm = scatter.groupBy("lat2", "lon2").agg(
        F.count(F.lit(1)).cast("long").alias("n_nbr"),
        (
            F.sum("qm").cast("string").cast("double")
            / (F.lit(1e6) * F.count(F.lit(1)))
        ).alias("t2m_smooth"),
    )
    return sm.join(
        cell,
        (cell.latitude == sm.lat2) & (cell.longitude == sm.lon2),
    ).select(
        F.col("lat2").alias("latitude"),
        F.col("lon2").alias("longitude"),
        "n_nbr",
        "t2m_smooth",
    )


# ---------- 2-D nearest neighbor via cell buckets ----------

_CELL = 0.25  # bucket size == grid spacing ⇒ 3×3 neighborhood suffices

# 25 deterministic "stations" inside the fixture bbox (synthesized
# from nation keys, same convention as the PII/link-graph synthesis)
_STATIONS_SQL = (
    "stations AS (SELECT n_nationkey AS station_id, "
    "45.0 + CAST((n_nationkey * 7) % 80 AS DOUBLE) / 40.0 AS s_lat, "
    "-74.0 + CAST((n_nationkey * 11) % 80 AS DOUBLE) / 40.0 AS s_lon "
    "FROM nation)"
)


@register(
    "join_nearest_2d",
    f"""
    WITH {ERA5_CTE},
    {_STATIONS_SQL},
    grid AS (
      SELECT DISTINCT latitude, longitude,
             CAST(FLOOR(latitude / {_CELL}) AS BIGINT) AS cy,
             CAST(FLOOR(longitude / {_CELL}) AS BIGINT) AS cx
      FROM era5
    ),
    sc AS (
      SELECT s.*,
             CAST(FLOOR(s_lat / {_CELL}) AS BIGINT) + dy.g AS cy,
             CAST(FLOOR(s_lon / {_CELL}) AS BIGINT) + dx.g AS cx
      FROM stations s, range(-1, 2) dy(g), range(-1, 2) dx(g)
    ),
    cand AS (
      SELECT sc.station_id, sc.s_lat, sc.s_lon, g.latitude, g.longitude,
             (CAST(FLOOR(sc.s_lat * 1000000.0 + 0.5) AS BIGINT)
              - CAST(FLOOR(g.latitude * 1000000.0 + 0.5) AS BIGINT)) AS dlat,
             (CAST(FLOOR(sc.s_lon * 1000000.0 + 0.5) AS BIGINT)
              - CAST(FLOOR(g.longitude * 1000000.0 + 0.5) AS BIGINT)) AS dlon
      FROM sc JOIN grid g ON g.cy = sc.cy AND g.cx = sc.cx
    ),
    ranked AS (
      SELECT station_id, s_lat, s_lon, latitude, longitude,
             ROW_NUMBER() OVER (
               PARTITION BY station_id
               ORDER BY dlat * dlat + dlon * dlon, latitude, longitude
             ) AS rn
      FROM cand
    )
    SELECT station_id, s_lat, s_lon,
           latitude AS nn_lat, longitude AS nn_lon
    FROM ranked WHERE rn = 1
    """,
    doc="2-D nearest-grid-point join via cell buckets: each station "
    "probes only its 3×3 neighbor cells (cell = grid spacing ⇒ the "
    "true NN is guaranteed in the neighborhood), exact integer "
    "squared distances, deterministic ties — the spatial-index join, "
    "never a station×grid cross product",
)
def join_nearest_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D nearest neighbor without a cross join: bucket both sides to
    a δ-cell grid (δ = the grid's own spacing, so a station's true
    nearest point always lies in its 3×3 cell neighborhood — the
    guarantee that makes the equi-join on cell ids EXACT, not
    approximate), explode each station to its 9 probe cells, equi-join
    on the cell id, argmin exact integer squared distance with
    (lat, lon) tie-break.

    Scale: candidates per station = O(points per 3×3 cells) — at
    100 TB the cell id becomes the shuffle/bucketing key on both
    sides; the 1-D snap (``join_nearest_grid``) composes per-axis for
    separable grids, this operator handles the general point cloud.
    """
    era5 = era5_events(spark, sf_dir)
    grid = (
        era5.select("latitude", "longitude")
        .distinct()
        .select(
            "latitude",
            "longitude",
            F.floor(F.col("latitude") / _CELL).alias("cy"),
            F.floor(F.col("longitude") / _CELL).alias("cx"),
        )
    )
    from cs_pipeline_spark.tables import load

    stations = load(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("station_id"),
        (45.0 + ((F.col("n_nationkey") * 7) % 80).cast("double") / 40.0).alias(
            "s_lat"
        ),
        (
            -74.0 + ((F.col("n_nationkey") * 11) % 80).cast("double") / 40.0
        ).alias("s_lon"),
    )
    offsets = F.expr(
        "explode(flatten(transform(sequence(-1, 1), dy -> "
        "transform(sequence(-1, 1), dx -> struct(dy, dx)))))"
    )
    sc = stations.select("*", offsets.alias("o")).select(
        "station_id",
        "s_lat",
        "s_lon",
        (F.floor(F.col("s_lat") / _CELL) + F.col("o.dy")).alias("cy"),
        (F.floor(F.col("s_lon") / _CELL) + F.col("o.dx")).alias("cx"),
    )
    qi = lambda c: F.floor(F.col(c) * F.lit(1e6) + F.lit(0.5)).cast(  # noqa: E731
        "long"
    )
    cand = sc.join(grid, ["cy", "cx"]).select(
        "station_id",
        "s_lat",
        "s_lon",
        "latitude",
        "longitude",
        (qi("s_lat") - qi("latitude")).alias("dlat"),
        (qi("s_lon") - qi("longitude")).alias("dlon"),
    )
    w = Window.partitionBy("station_id").orderBy(
        F.col("dlat") * F.col("dlat") + F.col("dlon") * F.col("dlon"),
        "latitude",
        "longitude",
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "station_id",
            "s_lat",
            "s_lon",
            F.col("latitude").alias("nn_lat"),
            F.col("longitude").alias("nn_lon"),
        )
    )


# ---------- point-in-polygon (exact ray casting) ----------

# polygons over the fixture bbox as integer µdeg (x=lon, y=lat);
# P1 is deliberately CONCAVE (an L) — the case bbox tests get wrong
_POLYGONS: dict[int, list[tuple[int, int]]] = {
    0: [  # triangle
        (-73900000, 45100000),
        (-73800000, 46500000),
        (-72600000, 45800000),
    ],
    1: [  # concave L
        (-73200000, 45200000),
        (-73200000, 46400000),
        (-72500000, 46400000),
        (-72500000, 45900000),
        (-72900000, 45900000),
        (-72900000, 45200000),
    ],
    2: [  # pentagon
        (-74000000, 46000000),
        (-73900000, 46700000),
        (-73300000, 46600000),
        (-73250000, 46200000),
        (-73700000, 45950000),
    ],
}


def _polygon_edges() -> list[tuple[int, int, int, int, int]]:
    rows = []
    for pid, verts in _POLYGONS.items():
        for i, (x1, y1) in enumerate(verts):
            x2, y2 = verts[(i + 1) % len(verts)]
            rows.append((pid, x1, y1, x2, y2))
    return rows

_EDGES_SQL = (
    "edges(polygon_id, x1, y1, x2, y2) AS (VALUES "
    + ", ".join(str(r) for r in _polygon_edges())
    + ")"
)

# exact integer crossing test (half-open vertex rule): the ray is
# horizontal +x; the float form px < x1 + dx·(py−y1)/dy is
# cross-multiplied so no division exists — sign of dy flips the
# comparison
_CROSS_SQL = """
  ((y1 > py) <> (y2 > py))
  AND (CASE WHEN y2 > y1
            THEN (px - x1) * (y2 - y1) < (x2 - x1) * (py - y1)
            ELSE (px - x1) * (y2 - y1) > (x2 - x1) * (py - y1) END)
"""


@register(
    "filter_polygon_contains",
    f"""
    WITH {_EDGES_SQL},
    stations AS (SELECT n_nationkey AS station_id,
      CAST(FLOOR((45.0 + CAST((n_nationkey * 7) % 80 AS DOUBLE) / 40.0)
           * 1000000.0 + 0.5) AS BIGINT) AS py,
      CAST(FLOOR((-74.0 + CAST((n_nationkey * 11) % 80 AS DOUBLE) / 40.0)
           * 1000000.0 + 0.5) AS BIGINT) AS px
      FROM nation),
    crossings AS (
      SELECT s.station_id, e.polygon_id,
             SUM(CASE WHEN {_CROSS_SQL} THEN 1 ELSE 0 END) AS n_cross
      FROM stations s CROSS JOIN edges e
      GROUP BY s.station_id, e.polygon_id
    )
    SELECT station_id, polygon_id
    FROM crossings WHERE n_cross % 2 = 1
    """,
    doc="exact point-in-polygon via integer ray casting (cross-"
    "multiplied crossing test, no division): stations tagged against "
    "convex AND concave polygons — the non-rectangular region filter "
    "bbox clipping can't express",
)
def filter_polygon_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crossing-number point-in-polygon with every comparison exact:
    coordinates are integer µdeg and the edge-crossing inequality is
    cross-multiplied, so products stay < 2⁶³ and the inside/outside
    verdict is bit-identical everywhere — including for the concave
    polygon, where a bounding-box test gives false positives in the
    notch.

    Scale: edges are config-scale → broadcast; the fact side streams
    through the crossing evaluation and a map-side-combined parity
    count per (point, polygon). For polygon sets in the millions,
    pre-filter candidates by polygon bbox grid cells
    (``join_nearest_2d``'s bucket scheme) before the edge test.
    """
    from cs_pipeline_spark.tables import load as _load

    stations = _load(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("station_id"),
        F.floor(
            (45.0 + ((F.col("n_nationkey") * 7) % 80).cast("double") / 40.0)
            * F.lit(1e6)
            + F.lit(0.5)
        ).cast("long").alias("py"),
        F.floor(
            (
                -74.0
                + ((F.col("n_nationkey") * 11) % 80).cast("double") / 40.0
            )
            * F.lit(1e6)
            + F.lit(0.5)
        ).cast("long").alias("px"),
    )
    edges = literal_df(
        spark,
        _polygon_edges(),
        "polygon_id int, x1 long, y1 long, x2 long, y2 long",
    )
    cross = F.expr(_CROSS_SQL.replace("<>", "!="))
    crossings = (
        stations.join(F.broadcast(edges))
        .groupBy("station_id", "polygon_id")
        .agg(
            F.sum(F.when(cross, 1).otherwise(0)).alias("n_cross")
        )
    )
    return crossings.filter(F.col("n_cross") % 2 == 1).select(
        "station_id", "polygon_id"
    )


@register(
    "agg_zonal_stats",
    f"""
    WITH {ERA5_CTE},
    {_EDGES_SQL},
    cells AS (SELECT DISTINCT latitude, longitude,
                CAST(FLOOR(latitude * 1000000.0 + 0.5) AS BIGINT) AS py,
                CAST(FLOOR(longitude * 1000000.0 + 0.5) AS BIGINT) AS px
              FROM era5),
    crossings AS (
      SELECT c.latitude, c.longitude, e.polygon_id,
             SUM(CASE WHEN {_CROSS_SQL} THEN 1 ELSE 0 END) AS n_cross
      FROM cells c CROSS JOIN edges e
      GROUP BY 1, 2, 3
    ),
    inside AS (SELECT latitude, longitude, polygon_id
               FROM crossings WHERE n_cross % 2 = 1)
    SELECT i.polygon_id,
           COUNT(DISTINCT (i.latitude, i.longitude)) AS n_cells,
           COUNT(*) AS n_obs,
           {sql_davg('e.t2m')} AS t2m_mean,
           MIN(e.t2m) AS t2m_min,
           MAX(e.t2m) AS t2m_max
    FROM inside i JOIN era5 e
      ON e.latitude = i.latitude AND e.longitude = i.longitude
    GROUP BY i.polygon_id
    """,
    doc="zonal statistics: per-polygon cell count + mean/min/max of a "
    "grid variable via exact integer point-in-polygon tagging — the "
    "canonical vector-zone x raster-value aggregation",
)
def agg_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonal statistics — aggregate a gridded variable over irregular
    polygon zones (watersheds, admin regions): the standard geospatial
    reduction the reference's rectangular-bbox clip cannot express.
    Zone membership reuses the exact integer ray-casting verdict
    (``filter_polygon_contains``), so the cell→zone assignment — and
    therefore every downstream statistic — is bit-identical across
    engines; means go through ``davg``.

    Scale: membership is decided on the DISTINCT cell set (bounded by
    grid resolution, ~1M cells for global 0.25°), never per
    observation; the tagged cell→zone map broadcasts back into the
    fact join and the final rollup is one map-side-combined aggregate
    per zone. Polygon sets beyond broadcast size pre-filter by bbox
    grid cell as in ``filter_polygon_contains``.
    """
    era5 = era5_events(spark, sf_dir)
    cells = (
        era5.select("latitude", "longitude")
        .distinct()
        .select(
            "latitude",
            "longitude",
            F.floor(F.col("latitude") * 1e6 + 0.5).cast("long").alias("py"),
            F.floor(F.col("longitude") * 1e6 + 0.5).cast("long").alias("px"),
        )
    )
    edges = literal_df(
        spark,
        _polygon_edges(),
        "polygon_id int, x1 long, y1 long, x2 long, y2 long",
    )
    cross = F.expr(_CROSS_SQL.replace("<>", "!="))
    inside = (
        cells.join(F.broadcast(edges))
        .groupBy("latitude", "longitude", "polygon_id")
        .agg(F.sum(F.when(cross, 1).otherwise(0)).alias("n_cross"))
        .filter(F.col("n_cross") % 2 == 1)
        .select("latitude", "longitude", "polygon_id")
    )
    return (
        era5.join(F.broadcast(inside), ["latitude", "longitude"])
        .groupBy("polygon_id")
        .agg(
            F.countDistinct("latitude", "longitude").alias("n_cells"),
            F.count(F.lit(1)).alias("n_obs"),
            davg("t2m").alias("t2m_mean"),
            F.min("t2m").alias("t2m_min"),
            F.max("t2m").alias("t2m_max"),
        )
    )


# ---------- bilinear regrid (4-corner interpolation) ----------

_CELL_UD = 250000  # 0.25° in µdeg — the ERA5 grid pitch


@register(
    "f_regrid_bilinear",
    f"""
    WITH {ERA5_CTE},
    ras AS (SELECT latitude, longitude,
              CAST(FLOOR(latitude * 1000000.0 + 0.5) AS BIGINT) AS yud,
              CAST(FLOOR(longitude * 1000000.0 + 0.5) AS BIGINT) AS xud,
              {sql_davg('t2m')} AS v
            FROM era5 GROUP BY 1, 2),
    pts AS (SELECT n_nationkey AS station_id,
              CAST(FLOOR((45.1 + CAST((n_nationkey * 13) % 60 AS DOUBLE) / 40.0)
                   * 1000000.0 + 0.5) AS BIGINT) AS py,
              CAST(FLOOR((-73.9 + CAST((n_nationkey * 17) % 60 AS DOUBLE) / 40.0)
                   * 1000000.0 + 0.5) AS BIGINT) AS px
            FROM nation),
    anch AS (SELECT station_id, py, px,
               py - ((py % {_CELL_UD} + {_CELL_UD}) % {_CELL_UD}) AS y0,
               px - ((px % {_CELL_UD} + {_CELL_UD}) % {_CELL_UD}) AS x0
             FROM pts),
    j AS (SELECT a.station_id,
            CAST(a.py - a.y0 AS DOUBLE) / {_CELL_UD} AS fy,
            CAST(a.px - a.x0 AS DOUBLE) / {_CELL_UD} AS fx,
            r00.v AS v00, r10.v AS v10, r01.v AS v01, r11.v AS v11
          FROM anch a
          JOIN ras r00 ON r00.yud = a.y0 AND r00.xud = a.x0
          JOIN ras r10 ON r10.yud = a.y0 AND r10.xud = a.x0 + {_CELL_UD}
          JOIN ras r01 ON r01.yud = a.y0 + {_CELL_UD} AND r01.xud = a.x0
          JOIN ras r11 ON r11.yud = a.y0 + {_CELL_UD}
                       AND r11.xud = a.x0 + {_CELL_UD})
    SELECT station_id,
           FLOOR(((1 - fy) * ((1 - fx) * v00 + fx * v10)
                  + fy * ((1 - fx) * v01 + fx * v11))
                 * 1000000.0 + 0.5) / 1000000.0 AS t2m_bilinear
    FROM j
    """,
    doc="bilinear regrid: station values interpolated from the 4 "
    "surrounding 0.25° cells — integer-exact cell anchoring (µdeg "
    "floor-div), deterministic weights, the accuracy step up from "
    "nearest-neighbor snapping",
)
def f_regrid_bilinear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilinear interpolation to off-grid points — the reference snaps
    to the NEAREST cell (dataset.py:224), which steps discontinuously
    at cell boundaries; bilinear is the standard accuracy upgrade for
    continuous fields (temperature, pressure). Determinism: the
    anchor cell comes from integer floor-division of µdeg coordinates
    (never float rounding at cell edges), fractional weights are one
    exact division each, and the 2D lerp is the same fixed op sequence
    in both engines, floor-quantized to 6 dp. Stations needing a cell
    outside the raster drop out (inner joins) — the honest boundary
    behavior; pad the raster for clamp semantics.

    Scale: the raster side is per-cell aggregates (bounded by grid
    size, broadcastable at 0.25° globally); each station row joins 4
    raster keys — 4 broadcast hash joins, the point set streams.
    """
    era5 = era5_events(spark, sf_dir)
    ras = (
        era5.groupBy("latitude", "longitude")
        .agg(davg("t2m").alias("v"))
        .select(
            F.floor(F.col("latitude") * 1e6 + 0.5).cast("long").alias("yud"),
            F.floor(F.col("longitude") * 1e6 + 0.5).cast("long").alias("xud"),
            "v",
        )
    )
    from cs_pipeline_spark.tables import load as _load

    pts = _load(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("station_id"),
        F.floor(
            (45.1 + ((F.col("n_nationkey") * 13) % 60).cast("double") / 40.0)
            * F.lit(1e6) + F.lit(0.5)
        ).cast("long").alias("py"),
        F.floor(
            (-73.9 + ((F.col("n_nationkey") * 17) % 60).cast("double") / 40.0)
            * F.lit(1e6) + F.lit(0.5)
        ).cast("long").alias("px"),
    )
    # floor-multiple via modulo normalization: `div`//`//` truncate
    # toward zero, which anchors NEGATIVE coordinates to the wrong
    # (non-enclosing) cell and produces extrapolation weights — the
    # ((x % m) + m) % m form is the true floor remainder in both
    # engines' C-style % semantics, pure integer, no float rounding
    def _floor_mult(col: str):
        m = F.lit(_CELL_UD).cast("long")
        return F.col(col) - ((F.col(col) % m + m) % m)

    anch = pts.select(
        "station_id",
        "py",
        "px",
        _floor_mult("py").alias("y0"),
        _floor_mult("px").alias("x0"),
    )
    fy = (F.col("py") - F.col("y0")).cast("double") / F.lit(float(_CELL_UD))
    fx = (F.col("px") - F.col("x0")).cast("double") / F.lit(float(_CELL_UD))

    def corner(alias_, dy, dx):
        r = ras.alias(alias_)
        return (
            (F.col(f"{alias_}.yud") == F.col("y0") + F.lit(dy))
            & (F.col(f"{alias_}.xud") == F.col("x0") + F.lit(dx)),
            r,
        )

    c00, r00 = corner("r00", 0, 0)
    c10, r10 = corner("r10", 0, _CELL_UD)
    c01, r01 = corner("r01", _CELL_UD, 0)
    c11, r11 = corner("r11", _CELL_UD, _CELL_UD)
    j = (
        anch.join(F.broadcast(r00), c00)
        .join(F.broadcast(r10), c10)
        .join(F.broadcast(r01), c01)
        .join(F.broadcast(r11), c11)
        .select(
            "station_id",
            fy.alias("fy"),
            fx.alias("fx"),
            F.col("r00.v").alias("v00"),
            F.col("r10.v").alias("v10"),
            F.col("r01.v").alias("v01"),
            F.col("r11.v").alias("v11"),
        )
    )
    lerp = (1 - F.col("fy")) * (
        (1 - F.col("fx")) * F.col("v00") + F.col("fx") * F.col("v10")
    ) + F.col("fy") * (
        (1 - F.col("fx")) * F.col("v01") + F.col("fx") * F.col("v11")
    )
    return j.select(
        "station_id",
        (F.floor(lerp * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias(
            "t2m_bilinear"
        ),
    )


# ---------- point-in-polygon (ray casting, integer-exact) ----------

# survey polygon over the fixture grid domain (lon, lat) — CONCAVE on
# purpose (vertex 4 dents inward): bbox tests cannot replicate it.
# Vertices are exact 0.05-multiples → exact micro-integers.
_PIP_POLY = [
    (-74.0, 45.0),
    (-72.5, 45.2),
    (-72.4, 46.6),
    (-73.3, 45.9),
    (-73.9, 46.7),
]
_PIP_Q = [(int(round(x * 1e6)), int(round(y * 1e6))) for x, y in _PIP_POLY]


def _pip_terms(px: str, py: str) -> str:
    """Unrolled ray-cast crossing terms (integer arithmetic only)."""
    terms = []
    n = len(_PIP_Q)
    for i in range(n):
        x1, y1 = _PIP_Q[i]
        x2, y2 = _PIP_Q[(i + 1) % n]
        dy = y2 - y1
        dx = x2 - x1
        lhs = f"(({px}) - ({x1})) * ({dy})"
        rhs = f"({dx}) * (({py}) - ({y1}))"
        cmp_ = f"{lhs} < {rhs}" if dy > 0 else f"{lhs} > {rhs}"
        terms.append(
            f"CASE WHEN (({y1} > ({py})) <> ({y2} > ({py}))) "
            f"AND ({cmp_}) THEN 1 ELSE 0 END"
        )
    return " + ".join(terms)


@register(
    "spatial_point_in_polygon",
    f"WITH {ERA5_CTE}, "
    "pts AS (SELECT DISTINCT "
    "CAST(FLOOR(longitude * 1000000.0 + 0.5) AS BIGINT) AS px, "
    "CAST(FLOOR(latitude * 1000000.0 + 0.5) AS BIGINT) AS py "
    "FROM era5), "
    f"flags AS (SELECT px, py, ({_pip_terms('px', 'py')}) % 2 AS inside "
    "FROM pts) "
    "SELECT CAST(py AS DOUBLE) / 1000000.0 AS latitude, "
    "CAST(COUNT(*) AS BIGINT) AS n_points, "
    "CAST(SUM(inside) AS BIGINT) AS n_inside "
    "FROM flags GROUP BY py",
    doc="point-in-polygon via ray casting over a CONCAVE survey "
    "polygon: unrolled integer cross-product crossing tests on the "
    "quantized grid — the GIS primitive bbox clips cannot express",
)
def spatial_point_in_polygon(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The general polygon containment test (the reference's geometry
    layer classifies Polygon/MultiPolygon — this op EVALUATES them):
    classic even-odd ray casting, with every edge-crossing test
    rewritten as an integer cross-product comparison
    ((px−x1)·Δy ≶ Δx·(py−y1), direction-flipped for downward edges) —
    no division, no floats, so containment is bit-exact on both
    engines including points near edges. The test polygon is concave:
    a bounding-box implementation would misclassify the dent.

    Scale: the predicate is O(vertices) integer ops per point, fused
    with the scan; for big polygon sets, pre-filter by bbox (the
    existing clip) then run exact ray casts only on candidates — the
    standard two-phase GIS filter-refine. Points are the DISTINCT
    grid coords (≪ facts).
    """
    df = era5_events(spark, sf_dir)
    pts = (
        df.select(
            F.floor(F.col("longitude") * F.lit(1e6) + F.lit(0.5))
            .cast("long")
            .alias("px"),
            F.floor(F.col("latitude") * F.lit(1e6) + F.lit(0.5))
            .cast("long")
            .alias("py"),
        )
        .distinct()
    )
    flags = pts.select(
        "px", "py", F.expr(f"({_pip_terms('px', 'py')}) % 2").alias("inside")
    )
    return flags.groupBy("py").agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.sum("inside").cast("long").alias("n_inside"),
    ).select(
        (F.col("py").cast("double") / F.lit(1e6)).alias("latitude"),
        "n_points",
        "n_inside",
    )


# ---------- geohash cells (hierarchical spatial bucketing) ----------

_GH32 = "0123456789bcdefghjkmnpqrstuvwxyz"

# Deterministic synthetic station coordinates derived from events
# (pure integer arithmetic — identical in both engines): milli-degree
# offsets from the south-west corner of the lat/lon domain.
_LAT_M = "((user_id * 7919) % 180000)"
_LON_M = "((event_id * 104729) % 360000)"


def _gh_bits_expr(div: str, lat_m: str, lon_m: str) -> str:
    """25-bit geohash integer (precision 5): 13 lon bits interleaved
    with 12 lat bits, MSB-first, lon leading — the standard geohash
    bit layout, expressed with only {+,*,%,integer division} so the
    SAME generated text (modulo the div operator spelling) runs on
    Spark (``div``) and DuckDB (``//``)."""
    ilon = f"(({lon_m} * 8192) {div} 360000)"
    ilat = f"(({lat_m} * 4096) {div} 180000)"
    terms = []
    for i in range(13):  # lon bits at even geohash positions
        terms.append(
            f"((({ilon} {div} {1 << (12 - i)}) % 2) * {1 << (24 - 2 * i)})"
        )
    for i in range(12):  # lat bits at odd geohash positions
        terms.append(
            f"((({ilat} {div} {1 << (11 - i)}) % 2) * {1 << (23 - 2 * i)})"
        )
    return "(" + " + ".join(terms) + ")"


def _gh5_expr(div: str, g: str) -> str:
    """5-char base32 geohash string from the 25-bit integer ``g``."""
    chars = [
        f"SUBSTR('{_GH32}', "
        f"CAST((({g} {div} {1 << (20 - 5 * k)}) % 32) AS INT) + 1, 1)"
        for k in range(5)
    ]
    return "CONCAT(" + ", ".join(chars) + ")"


@register(
    "spatial_geohash_cells",
    f"""
    WITH pts AS (
      SELECT {_LAT_M} AS lat_m, {_LON_M} AS lon_m, value FROM events
    ), bits AS (
      SELECT {_gh_bits_expr('//', 'lat_m', 'lon_m')} AS g, value FROM pts
    ), cells AS (
      SELECT {_gh5_expr('//', 'g')} AS gh5, value FROM bits
    )
    SELECT SUBSTR(gh5, 1, 2) AS gh2,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(COUNT(DISTINCT gh5) AS BIGINT) AS n_subcells,
           {sql_davg('value')} AS avg_value
    FROM cells GROUP BY SUBSTR(gh5, 1, 2)
    """,
    doc="geohash-5 encode (bit-interleave + base32, pure integer "
    "arithmetic) rolled up to geohash-2 cells: points, distinct "
    "subcells, mean value — the hierarchical spatial bucketing key "
    "behind prefix-range spatial joins",
)
def spatial_geohash_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash encoding as a first-class engine expression: interleave
    13 longitude + 12 latitude bits (MSB-first, lon leading) into a
    25-bit cell id, then base32 to the standard 5-char geohash. The
    encode is ~50 integer mul/div/mod ops generated as ONE whole-stage
    codegen expression — no UDF — and the identical generated text
    (``div`` vs ``//`` spelling aside) is the DuckDB oracle, so cell
    assignment is bit-exact across engines.

    Why geohash and not raw (lat, lon) buckets: the base32 string's
    PREFIX property (shared prefix ⟺ shared ancestor cell) turns
    spatial proximity into string-prefix equality, which is sortable,
    range-partitionable, and join-able with plain relational
    machinery — the same reason production geo pipelines key on
    geohash/S2/H3 before any distance math. The op reports the
    geohash-2 rollup (count, distinct geohash-5 subcells, mean value)
    — the occupancy histogram that sizes a prefix-bucketed spatial
    join.

    Scale: one map-side-combined hash aggregate on a 1024-value key;
    the encode is fused with the scan (no shuffle before the agg).
    Skewed cells (urban hotspots) are a groupBy — AQE handles them;
    nothing here is a join. Station coords are synthesized from event
    ids (pure integer arithmetic) because no fixture table carries
    raw lat/lon at station granularity.
    """
    ev = load(spark, "events", sf_dir).select("event_id", "user_id", "value")
    pts = ev.select(
        F.expr(_LAT_M).alias("lat_m"),
        F.expr(_LON_M).alias("lon_m"),
        "value",
    )
    bits = pts.select(
        F.expr(_gh_bits_expr("div", "lat_m", "lon_m")).alias("g"), "value"
    )
    cells = bits.select(F.expr(_gh5_expr("div", "g")).alias("gh5"), "value")
    return cells.groupBy(
        F.expr("SUBSTR(gh5, 1, 2)").alias("gh2")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.countDistinct("gh5").cast("long").alias("n_subcells"),
        davg("value").alias("avg_value"),
    )
