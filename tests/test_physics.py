"""Closed-form physics invariants (FIXTURES.md golden expectations)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cs_pipeline_spark.functions.physics import derive_predictors, predictor_col


@pytest.fixture(scope="module")
def grid(spark):
    rows = [
        # t2m == d2m → RH = 100
        Row(u10=0.0, v10=1.0, t2m=288.15, d2m=288.15, sp=101325.0, tp=0.001,
            avg_sdswrf=500.0, avg_sdswrfcs=550.0, avg_sdlwrf=300.0,
            avg_snlwrf=-60.0, avg_slhtf=-80.0, avg_ishf=-40.0,
            stl1=283.15, stl2=282.15, stl3=281.15,
            swvl1=0.25, swvl2=0.30, swvl3=0.35, fal=0.2, zust=0.3,
            xco2=420.0, wtd=4.0),
        Row(u10=3.0, v10=0.0, t2m=293.15, d2m=283.15, sp=100000.0, tp=0.0,
            avg_sdswrf=0.0, avg_sdswrfcs=0.0, avg_sdlwrf=320.0,
            avg_snlwrf=-50.0, avg_slhtf=-10.0, avg_ishf=-5.0,
            stl1=284.15, stl2=283.15, stl3=282.15,
            swvl1=0.10, swvl2=0.15, swvl3=0.20, fal=0.5, zust=0.1,
            xco2=400.0, wtd=2.0),
    ]
    return spark.createDataFrame(rows)


def test_rh_saturated_is_100(grid):
    out = derive_predictors(grid, ["RH"]).collect()
    assert abs(out[0]["RH"] - 100.0) < 1e-9  # t2m == d2m
    assert 0.0 < out[1]["RH"] < 100.0


def test_wind_quadrants(grid):
    out = derive_predictors(grid, ["WS", "WD"]).collect()
    # u=0, v=1 → from north reference: WD = 0, WS = 1
    assert abs(out[0]["WD"] - 0.0) < 1e-9
    assert abs(out[0]["WS"] - 1.0) < 1e-12
    # u=3, v=0 → WD = 90, WS = 3
    assert abs(out[1]["WD"] - 90.0) < 1e-9
    assert abs(out[1]["WS"] - 3.0) < 1e-12


def test_unit_conversions(grid):
    out = derive_predictors(grid, ["TA", "PA", "SWC_1", "TS_1"]).collect()
    assert abs(out[0]["TA"] - 15.0) < 1e-9
    assert abs(out[0]["PA"] - 101.325) < 1e-12
    assert abs(out[0]["SWC_1"] - 25.0) < 1e-12
    assert abs(out[0]["TS_1"] - 10.0) < 1e-9


def test_radiation_budget(grid):
    out = derive_predictors(
        grid, ["SW_OUT", "LW_OUT", "NETRAD", "G", "PPFD_IN", "PPFD_OUT"]
    ).collect()
    r = out[0]
    assert abs(r["SW_OUT"] - 500.0 * 0.2) < 1e-9
    assert abs(r["LW_OUT"] - (-60.0 - 300.0)) < 1e-9
    netrad = 500.0 + 300.0 - 100.0 - (-360.0)
    assert abs(r["NETRAD"] - netrad) < 1e-9
    assert abs(r["G"] - (netrad - (-40.0) - (-80.0))) < 1e-9
    assert abs(r["PPFD_IN"] - (1.741 * 500.0 + 1.45)) < 1e-9
    assert abs(r["PPFD_OUT"] - (1.741 * 500.0 * 0.2 + 1.45)) < 1e-9


def test_wet_co2_below_dry(grid):
    out = derive_predictors(grid, ["CO2"]).collect()
    for r in out:
        assert 0 < r["CO2"] < 420.0  # wet fraction < dry fraction


def test_vpd_zero_at_saturation(grid):
    out = derive_predictors(grid, ["VPD"]).collect()
    assert abs(out[0]["VPD"]) < 1e-9  # RH=100 → VPD=0
    assert out[1]["VPD"] > 0


def test_no_python_udfs_in_plan(grid):
    """The whole predictor surface must stay JVM-side (no BatchEvalPython)."""
    plan = derive_predictors(grid)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_haversine_known_values(spark, sf_dir):
    # reference point to itself = 0; ~111.19 km per degree of latitude
    from cs_pipeline_spark.operators.spatial import (
        _REF_LAT,
        _REF_LON,
        f_haversine,
    )
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    rows = f_haversine(spark, sf_dir).collect()
    assert rows
    import math

    for r in rows:
        # recompute in python
        phi1, phi2 = math.radians(r["latitude"]), math.radians(_REF_LAT)
        dphi = math.radians(r["latitude"] - _REF_LAT)
        dlmb = math.radians(r["longitude"] - _REF_LON)
        h = (
            math.sin(dphi / 2) ** 2
            + math.cos(phi1) * math.cos(phi2) * math.sin(dlmb / 2) ** 2
        )
        want = 2 * 6371.0088 * math.asin(math.sqrt(h))
        assert abs(r["dist_km"] - want) < 1e-5
        assert r["dist_km"] >= 0
