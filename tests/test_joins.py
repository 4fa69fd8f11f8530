from __future__ import annotations

from pyspark.sql import Row

from cs_pipeline_spark.operators.joins import (
    join_nearest_coord,
    nearest_coord_mapping,
)


def test_nearest_mapping_basic(spark):
    vals = spark.createDataFrame([Row(v=0.1), Row(v=0.9), Row(v=2.4)])
    refs = spark.createDataFrame([Row(r=0.0), Row(r=1.0), Row(r=2.0)])
    m = {
        r["v"]: r["r"]
        for r in nearest_coord_mapping(vals, refs, "v", "r").collect()
    }
    assert m == {0.1: 0.0, 0.9: 1.0, 2.4: 2.0}


def test_nearest_mapping_tie_breaks_low(spark):
    vals = spark.createDataFrame([Row(v=0.5)])
    refs = spark.createDataFrame([Row(r=0.0), Row(r=1.0)])
    m = nearest_coord_mapping(vals, refs, "v", "r").collect()
    assert m[0]["r"] == 0.0  # exact midpoint → smaller ref wins


def test_join_nearest_coord_broadcasts(spark):
    vals = spark.createDataFrame([Row(v=0.1, payload=1), Row(v=1.8, payload=2)])
    refs = spark.createDataFrame([Row(r=0.0), Row(r=2.0)])
    out = join_nearest_coord(vals, refs, "v", "r", "snapped")
    rows = {r["payload"]: r["snapped"] for r in out.collect()}
    assert rows == {1: 0.0, 2: 2.0}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # fact side not shuffled
