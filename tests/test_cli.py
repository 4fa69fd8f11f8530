"""CLI parity surface: reference-format YAML configs drive process +
download (request-manifest) commands."""

from __future__ import annotations

import json

import pytest

from cs_pipeline_spark.cli import main


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_process_monthly_writes_partitioned_parquet(spark, sf_dir, tmp_path):
    cfg = _write(
        tmp_path,
        "cfg.yaml",
        """
start: 2024-01-01T00:00:00
end: 2024-02-29T23:00:00
preds: [TA, RH, WS]
aggregation-type: MONTHLY
""",
    )
    out = str(tmp_path / "out")
    rc = main(
        ["process", "--config", cfg, "--sf-dir", sf_dir, "--out", out]
    )
    assert rc == 0
    df = spark.read.parquet(out)
    assert df.count() > 0
    assert "region_id" in df.columns  # partition column round-trips
    assert "TA_mean" in df.columns


def test_process_rejects_misaligned_monthly(sf_dir, tmp_path):
    cfg = _write(
        tmp_path,
        "bad.yaml",
        """
start: 2024-01-03T05:00:00
end: 2024-02-29T23:00:00
preds: [TA]
aggregation-type: MONTHLY
""",
    )
    with pytest.raises(SystemExit) as e:
        main(["process", "--config", cfg, "--sf-dir", sf_dir])
    assert e.value.code == 2


def test_download_manifest_structure(tmp_path):
    cfg = _write(
        tmp_path,
        "dl.yaml",
        """
start: 2022-11-20T07:00:00
end: 2023-01-05T14:00:00
preds: [TA, RH, CO2, WTD]
aggregation-type: null
bbox: [55, -120, 40, -60]
""",
    )
    out = str(tmp_path / "mf")
    rc = main(["download", "--config", cfg, "--out", out])
    assert rc == 0
    manifest = json.loads((tmp_path / "mf" / "requests.json").read_text())
    groups = [e["group"] for e in manifest]
    # December 2022 is the only fully-covered month → one full-month
    # request; partial Nov/Jan days are per-day requests
    assert groups.count("full") == 1
    assert any(g.startswith("2022-11-") for g in groups)
    assert any(g.startswith("2023-01-") for g in groups)
    # special predictors ride their own datasets, never the ERA5 payload
    assert "co2" in groups and "wtd" in groups
    era5 = [e for e in manifest if e["group"] not in ("co2", "wtd")]
    for e in era5:
        assert "xco2" not in e["payload"]["variable"]
        assert "wtd" not in e["payload"]["variable"]
        assert e["payload"]["area"] == [55, -120, 40, -60]
    # full-month request carries all 24 hours and every December day
    full = next(e for e in manifest if e["group"] == "full")
    assert len(full["payload"]["time"]) == 24
    assert len(full["payload"]["day"]) == 31


def test_download_partial_day_hours_start_correctly(tmp_path):
    cfg = _write(
        tmp_path,
        "dl2.yaml",
        """
start: 2022-11-20T07:00:00
end: 2022-11-22T14:00:00
preds: [TA]
aggregation-type: null
""",
    )
    out = str(tmp_path / "mf2")
    assert main(["download", "--config", cfg, "--out", out]) == 0
    manifest = json.loads((tmp_path / "mf2" / "requests.json").read_text())
    by_day = {e["group"]: e for e in manifest}
    # start day runs 07:00..23:00, end day 00:00..14:00
    assert by_day["2022-11-20"]["payload"]["time"][0] == "07:00"
    assert by_day["2022-11-20"]["payload"]["time"][-1] == "23:00"
    assert by_day["2022-11-22"]["payload"]["time"][0] == "00:00"
    assert by_day["2022-11-22"]["payload"]["time"][-1] == "14:00"
    assert by_day["2022-11-21"]["payload"]["time"] == [
        f"{h:02d}:00" for h in range(24)
    ]
    assert "T07to23" in by_day["2022-11-20"]["target"].replace(":00", "")
