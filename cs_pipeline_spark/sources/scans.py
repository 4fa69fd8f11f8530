"""Source scans (SURVEY §2.1): tolerant CSV, multi-file merge, GeoJSON,
manifest catalog.

The reference ingests NetCDF/CSV/GeoJSON/JSON-manifest files
(`dataset.py:25-34`, `processor.py:50`, `main.py:405-441`,
`core.py:303-307`). Spark-first equivalents: declarative readers whose
tolerance/alignment behavior Catalyst pushes into the scan. Because
the driver's corpus is parquet-only, each op materializes its input
file ONCE into a scratch dir (derived deterministically from the
parquet tables, sorted before write), then exercises the real reader;
oracles express the expected survivors from the original views, so the
round-trip (format encode → tolerant decode) is what gets verified.

Scale notes: `spark.read.csv/json/parquet` over a directory of files
parallelizes by file/split natively; `DROPMALFORMED` and
`unionByName(allowMissingColumns=True)` are scan-level semantics, no
shuffle. The scratch round-trips are test scaffolding — in production
these readers point at the lake.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from cs_pipeline_spark.registry import register
from cs_pipeline_spark.tables import load

_SCRATCH = "/root/repo/.tmp/sources"


def _scratch(sf_dir: str, name: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(_SCRATCH, tag, name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return path


# ---------- tolerant CSV scan ----------
# Reference: pd.read_csv(..., on_bad_lines="skip")  (processor.py:50)

_CSV_SCHEMA = StructType(
    [
        StructField("o_orderkey", LongType()),
        StructField("o_custkey", LongType()),
        StructField("o_orderstatus", StringType()),
        StructField("o_totalprice", DoubleType()),
    ]
)


@register(
    "scan_csv_tolerant",
    "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice "
    "FROM orders WHERE o_orderkey < 500",
    doc="CSV scan skipping malformed lines (DROPMALFORMED)",
)
def scan_csv_tolerant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Writes a CSV containing malformed rows (wrong arity, bad types),
    reads it back with mode=DROPMALFORMED: only clean rows survive —
    the oracle states exactly that set."""
    path = _scratch(sf_dir, "orders_tolerant.csv")
    if not os.path.exists(path):
        rows = (
            load(spark, "orders", sf_dir)
            .filter(F.col("o_orderkey") < 500)
            .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
            .orderBy("o_orderkey")
            .collect()
        )
        with open(path, "w") as f:
            f.write("o_orderkey,o_custkey,o_orderstatus,o_totalprice\n")
            for i, r in enumerate(rows):
                f.write(f"{r[0]},{r[1]},{r[2]},{r[3]!r}\n")
                if i == 3:  # interleave malformed garbage the scan must skip
                    f.write("this,line,has,way,too,many,columns,entirely\n")
                    f.write("not_a_number,xx,O,oops\n")
    return (
        spark.read.schema(_CSV_SCHEMA)
        .option("header", True)
        .option("mode", "DROPMALFORMED")
        .csv(path)
    )


# ---------- multi-file merge scan ----------
# Reference: merge_unzipped opens every .nc under N dirs, drops
# bookkeeping vars, outer-aligns coordinates (dataset.py:25-34).


@register(
    "scan_multifile_merge",
    "SELECT n_nationkey, n_name, n_regionkey, NULL AS comment_extra "
    "FROM nation WHERE n_regionkey < 2 "
    "UNION ALL "
    "SELECT n_nationkey, n_name, NULL, 'part2' FROM nation WHERE n_regionkey >= 2",
    doc="multi-file scan with ragged schemas: unionByName + drop bookkeeping",
)
def scan_multifile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two parquet 'files' with overlapping-but-different columns (one
    carries a bookkeeping col to drop, one an extra) — read separately,
    aligned by name with missing columns as null, bookkeeping dropped.
    This is the Spark shape of xarray's open-all + outer-align."""
    nation = load(spark, "nation", sf_dir)
    p1 = _scratch(sf_dir, "merge_part1.parquet")
    p2 = _scratch(sf_dir, "merge_part2.parquet")
    if not os.path.exists(p1):
        nation.filter(F.col("n_regionkey") < 2).withColumn(
            "expver", F.lit(1)  # bookkeeping var, mirrors ERA5's expver
        ).write.mode("overwrite").parquet(p1)
        nation.filter(F.col("n_regionkey") >= 2).drop("n_regionkey").withColumn(
            "comment_extra", F.lit("part2")
        ).write.mode("overwrite").parquet(p2)
    d1 = spark.read.parquet(p1).drop("expver")  # drop_cols at the scan
    d2 = spark.read.parquet(p2)
    return d1.unionByName(d2, allowMissingColumns=True)


# ---------- GeoJSON scan ----------
# Reference: _parse_geojsons (main.py:405-441) — features from a dir of
# GeoJSON files, region id from an id property else a counter.


@register(
    "scan_geojson",
    "SELECT 'r' || CAST(r_regionkey AS VARCHAR) AS region_id, "
    "'Polygon' AS geom_type, CAST(r_regionkey AS DOUBLE) AS west, "
    "CAST(r_regionkey + 1 AS DOUBLE) AS east FROM region",
    doc="GeoJSON FeatureCollection scan: multiLine JSON + explode(features)",
)
def scan_geojson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Writes a FeatureCollection derived from `region`, then the real
    reader: multiLine spark.read.json → explode(features) → property
    extraction. Nested coordinate arrays stay ArrayType — no UDF."""
    path = _scratch(sf_dir, "regions.geojson")
    if not os.path.exists(path):
        regions = sorted(
            (r[0], r[1])
            for r in load(spark, "region", sf_dir)
            .select("r_regionkey", "r_name")
            .collect()
        )
        fc = {
            "type": "FeatureCollection",
            "features": [
                {
                    "type": "Feature",
                    "properties": {"id": f"r{k}", "name": n},
                    "geometry": {
                        "type": "Polygon",
                        "coordinates": [
                            [
                                [float(k), 0.0],
                                [float(k + 1), 0.0],
                                [float(k + 1), 1.0],
                                [float(k), 1.0],
                                [float(k), 0.0],
                            ]
                        ],
                    },
                }
                for k, n in regions
            ],
        }
        with open(path, "w") as f:
            json.dump(fc, f)
    feats = (
        spark.read.option("multiLine", True)
        .json(path)
        .select(F.explode("features").alias("f"))
    )
    ring = F.col("f.geometry.coordinates").getItem(0)
    lons = F.transform(ring, lambda p: p.getItem(0))
    return feats.select(
        F.coalesce(F.col("f.properties.id"), F.lit("r?")).alias("region_id"),
        F.col("f.geometry.type").alias("geom_type"),
        F.array_min(lons).alias("west"),
        F.array_max(lons).alias("east"),
    )


# ---------- manifest catalog scan ----------
# Reference: load_features_from_manifest (core.py:303-307) — JSON
# catalog driving the process stage.

_MANIFEST_ROWS = [
    {
        "region_id": "r0_40.0to45.0_-80.0to-75.0",
        "start": "2020-01-01",
        "end": "2020-12-31",
        "geom_type": "BoundingBox",
        "predictors": ["TA", "RH", "WS"],
        "gapfilling": False,
    },
    {
        "region_id": "point_45.5_-73.6",
        "start": "2021-01-01",
        "end": "2021-06-30",
        "geom_type": "Point",
        "predictors": ["TA", "VPD"],
        "gapfilling": True,
    },
]


@register(
    "scan_manifest",
    "SELECT * FROM (VALUES "
    "('r0_40.0to45.0_-80.0to-75.0', '2020-01-01', '2020-12-31', 'BoundingBox', 3, false), "
    "('point_45.5_-73.6', '2021-01-01', '2021-06-30', 'Point', 2, true)"
    ") AS t(region_id, start_date, end_date, geom_type, n_predictors, gapfilling)",
    doc="JSON-lines manifest catalog scan (region features → plan rows)",
)
def scan_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _scratch(sf_dir, "manifest.jsonl")
    if not os.path.exists(path):
        with open(path, "w") as f:
            for row in _MANIFEST_ROWS:
                f.write(json.dumps(row) + "\n")
    m = spark.read.json(path)
    return m.select(
        "region_id",
        F.col("start").alias("start_date"),  # ISO strings; DateType vs
        F.col("end").alias("end_date"),  # date32 canonicalize differently

        "geom_type",
        F.size("predictors").alias("n_predictors"),
        "gapfilling",
    )
