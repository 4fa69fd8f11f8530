"""Request-builder parity with api_request.py payload shapes."""

from __future__ import annotations

import pytest

from cs_pipeline_spark.sources import ingest


def test_point_expands_to_degenerate_bbox():
    assert ingest.expand_area([45.5, -73.6]) == [45.5, -73.6, 45.5, -73.6]
    assert ingest.expand_area([50.0, -80.0, 40.0, -70.0]) == [
        50.0,
        -80.0,
        40.0,
        -70.0,
    ]
    assert ingest.expand_area([1.0, 2.0, 3.0]) is None


def test_hourly_request_payload():
    ds, p = ingest.build_era5_request(
        "2024",
        ["01"],
        ["20", "21"],
        ["07:00", "08:00"],
        ["2m_temperature"],
        [45.5, -73.6],
    )
    assert ds == ingest.HOURLY_DATASET
    assert p["product_type"] == ["reanalysis"]
    assert p["day"] == ["20", "21"]
    assert p["area"] == [45.5, -73.6, 45.5, -73.6]
    assert p["data_format"] == "netcdf" and p["download_format"] == "zip"


def test_monthly_request_omits_day():
    ds, p = ingest.build_era5_request(
        "2024",
        [f"{m:02d}" for m in range(1, 13)],
        [],
        [f"{h:02d}:00" for h in range(24)],
        ["2m_temperature"],
        [50.0, -80.0, 40.0, -70.0],
        monthly=True,
    )
    assert ds == ingest.MONTHLY_DATASET
    assert p["product_type"] == ["monthly_averaged_reanalysis_by_hour_of_day"]
    assert "day" not in p


def test_filename_scheme():
    assert (
        ingest.request_filename("2024", "01", "20", ["07:00", "08:00"])
        == "ERA5_2024-01-20T07:00to08:00.zip"
    )
    assert (
        ingest.request_filename("2024", "01", "20", ["07:00"])
        == "ERA5_2024-01-20T07:00.zip"
    )


def test_fetch_is_out_of_engine():
    with pytest.raises(NotImplementedError):
        ingest.fetch_stub("x", {}, "/tmp/x.zip")
