"""Ingestion-side request builders (SURVEY §2.1 `source_cds_api` /
`source_co2`; reference `api_request.py:47-177`).

The reference submits these payloads to the Copernicus CDS HTTP API and
unzips NetCDF responses. The network/unzip half is out-of-engine (and
out of this container); what the engine owns is the *request
construction* semantics — dataset ids, payload shape, the point→bbox
area expansion, and the download filename scheme — kept here as pure
functions so they are unit-testable and reusable by any fetcher.

A production deployment would pair these with a fetcher that writes
parquet into the lake; `fetch_stub` marks that boundary explicitly.
"""

from __future__ import annotations

from typing import Any

HOURLY_DATASET = "reanalysis-era5-single-levels"
MONTHLY_DATASET = "reanalysis-era5-single-levels-monthly-means"
CO2_DATASET = "satellite-carbon-dioxide"


def expand_area(coords: list[float]) -> list[float] | None:
    """Point `[lat, lon]` → degenerate bbox; 4-list passes through
    (`api_request.py:56-60`, `:90-94` — ERA5 order [N, W, S, E])."""
    if len(coords) == 2:
        return [coords[0], coords[1], coords[0], coords[1]]
    if len(coords) == 4:
        return list(coords)
    return None


def build_era5_request(
    year: str,
    months: list[str],
    days: list[str],
    times: list[str],
    variables: list[str],
    coords: list[float],
    monthly: bool = False,
) -> tuple[str, dict[str, Any]]:
    """(dataset, payload) for one request group (`api_request.py:86-106`
    hourly; `:61-72` monthly — monthly omits `day`, uses the
    monthly-averaged-by-hour product)."""
    payload: dict[str, Any] = {
        "product_type": [
            "monthly_averaged_reanalysis_by_hour_of_day" if monthly else "reanalysis"
        ],
        "variable": list(variables),
        "year": [year],
        "month": list(months),
        "time": list(times),
        "area": expand_area(coords),
        "data_format": "netcdf",
        "download_format": "zip",
    }
    if not monthly:
        payload["day"] = list(days)
    return (MONTHLY_DATASET if monthly else HOURLY_DATASET), payload


def build_co2_request() -> tuple[str, dict[str, Any]]:
    """Fixed satellite-CO₂ payload (`api_request.py:161-169`)."""
    return CO2_DATASET, {
        "processing_level": ["level_3"],
        "variable": "xco2",
        "sensor_and_algorithm": "merged_obs4mips",
        "version": ["4_5"],
    }


def request_filename(
    year: str, month: str, day: str, times: list[str]
) -> str:
    """Download filename scheme (`api_request.py:120-159`): hour runs
    collapse to `T{first}to{last}`, single hours to `T{hour}`."""
    if len(times) > 1:
        return f"ERA5_{year}-{month}-{day}T{times[0]}to{times[-1]}.zip"
    return f"ERA5_{year}-{month}-{day}T{times[0]}.zip"


def fetch_stub(dataset: str, payload: dict[str, Any], target: str) -> None:
    """Network boundary: a real deployment performs the CDS retrieve +
    download here. Deliberately unimplemented in-engine."""
    raise NotImplementedError(
        "network fetch is out-of-engine; wire a CDS client here"
    )
