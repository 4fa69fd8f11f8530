"""Command-line surface mirroring the reference's CLI.

The reference ships ``carbonpipeline {download,process} --config x.yaml``
(/root/reference/pipeline/carbonpipeline/argparser.py,
main.py ``CommandExecutor``): a YAML config with ``start``/``end``/
``preds``/``aggregation-type`` keys drives either (a) CDS request
planning + download or (b) the area-process pipeline. A user switching
engines keeps the same config file and runs::

    python -m cs_pipeline_spark.cli process  --config cfg.yaml \
        --sf-dir /root/testdata/sf0.01 --out /tmp/out
    python -m cs_pipeline_spark.cli download --config cfg.yaml \
        --out /tmp/manifest

Semantics parity:

- config keys and formats are the reference's
  (``download_config.yaml``): ISO start/end, AmeriFlux predictor
  list, ``aggregation-type: DAILY|MONTHLY|null``; JSON configs are
  also accepted.
- request validation mirrors main.py:362-403 (date-range/aggregation
  alignment) and main.py:240-249 (CO₂ year-bounds drop) via
  ``plans.validate`` — violations exit 2 with the rule names.
- ``process`` runs the engine's area pipeline
  (``operators.pipeline_e2e.process_area``) at the requested
  granularity and writes partitioned parquet (or CSV). Because
  validation enforces bucket-aligned boundaries, the start/end filter
  applies on the aggregation bucket — identical to pre-filtering rows.
- ``download`` performs everything UP TO the network: plans maximal
  full-month/day request groups (``plans.request_groups`` — the
  processor.py:116-186 planner), renders one CDS payload per group
  (``sources.ingest.build_era5_request``), and writes a JSON manifest.
  The HTTP fetch itself is the engine's documented network boundary
  (``sources.ingest.fetch_stub``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from datetime import datetime
from pathlib import Path

from cs_pipeline_spark.functions.constants import VARIABLES_FOR_PREDICTOR
from cs_pipeline_spark.plans.validate import (
    co2_bounds_filter,
    validate_date_range,
)

_DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def load_config(pathstr: str) -> dict:
    """Reference ``load_yaml_config`` parity; JSON also accepted."""
    path = Path(pathstr)
    text = path.read_text()
    if path.suffix in (".yaml", ".yml"):
        import yaml

        return yaml.safe_load(text)
    if path.suffix == ".json":
        return json.loads(text)
    raise ValueError(
        f"Only .yaml/.yml/.json config files are supported. Not {path.suffix}."
    )


def pretty_print_inputs(title: str, **fields) -> None:
    print(f"\n------------------- {title.upper()} -------------------")
    for k, v in fields.items():
        print(f"- {k:<15}: {v}")
    print("----------------------------------------------------------\n")


def _parse_ts(s: str) -> datetime:
    return datetime.fromisoformat(str(s))


def _validated(cfg: dict) -> tuple[datetime, datetime, list[str], str | None]:
    start = _parse_ts(cfg["start"])
    end = _parse_ts(cfg["end"])
    agg = cfg.get("aggregation-type") or None
    preds = list(cfg.get("preds") or [])
    violations = validate_date_range(start, end, agg)
    if violations:
        print(f"invalid request: {', '.join(violations)}", file=sys.stderr)
        raise SystemExit(2)
    preds, co2_dropped = co2_bounds_filter(start, end, preds)
    if co2_dropped:
        print(
            "warning: CO2 predictor dropped — requested years outside "
            "the CO2 dataset coverage [2002, 2023]",
            file=sys.stderr,
        )
    return start, end, preds, agg


def cmd_process(args: argparse.Namespace) -> int:
    cfg = load_config(args.config)
    start, end, preds, agg = _validated(cfg)
    sf_dir = args.sf_dir or cfg.get("sf-dir") or _DEFAULT_SF_DIR
    out = args.out or cfg.get("output-filename") or "out_process"
    pretty_print_inputs(
        "process inputs",
        start=start,
        end=end,
        preds=preds,
        aggregation=agg or "NONE",
        sf_dir=sf_dir,
        out=out,
    )

    from pyspark.sql import functions as F

    from cs_pipeline_spark.session import get_spark

    spark = get_spark("cs_pipeline_cli")
    spark.sparkContext.setLogLevel("ERROR")

    if agg == "DAILY":
        from cs_pipeline_spark.operators.pipeline_e2e import process_area

        df = process_area(spark, sf_dir, granularity="daily", trunc="day")
        bucket = "bucket"
    elif agg == "MONTHLY":
        from cs_pipeline_spark.operators.pipeline_e2e import process_area

        df = process_area(spark, sf_dir, granularity="monthly", trunc="month")
        bucket = "bucket"
    else:
        # no aggregation: hourly predictor table (reference writes the
        # hourly dataset when aggregation-type is null)
        from cs_pipeline_spark.operators.predictors import predictors_frame

        known = [p for p in preds if p in VARIABLES_FOR_PREDICTOR]
        df = predictors_frame(spark, sf_dir, known or ["TA", "RH"])
        bucket = "valid_time"
    # validation guarantees bucket-aligned boundaries, so a bucket-level
    # range filter is exactly the row-level time filter
    df = df.filter(
        (F.col(bucket) >= F.lit(start)) & (F.col(bucket) <= F.lit(end))
    )

    fmt = args.format
    writer = df.write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", "true").csv(out)
    else:
        if "region_id" in df.columns:
            writer = writer.partitionBy("region_id")
        writer.parquet(out)
    n = (
        spark.read.option("header", "true").csv(out).count()
        if fmt == "csv"
        else spark.read.parquet(out).count()
    )
    print(f"wrote {n} rows to {out} ({fmt})")
    return 0


def cmd_download(args: argparse.Namespace) -> int:
    cfg = load_config(args.config)
    start, end, preds, agg = _validated(cfg)
    out = args.out or "out_manifest"
    variables = sorted(
        {
            v
            for p in preds
            if p in VARIABLES_FOR_PREDICTOR
            for v in VARIABLES_FOR_PREDICTOR[p]
        }
        # xco2/wtd are not ERA5 variables — they ride their own datasets
        # below (reference main.py:266-269 removes them the same way)
        - {"xco2", "wtd"}
    )
    coords = cfg.get("bbox") or [90, -180, -90, 180]
    pretty_print_inputs(
        "download inputs",
        start=start,
        end=end,
        preds=preds,
        n_variables=len(variables),
        aggregation=agg or "NONE",
        out=out,
    )

    from cs_pipeline_spark.plans.request_groups import request_groups
    from cs_pipeline_spark.session import get_spark
    from cs_pipeline_spark.sources.ingest import (
        build_co2_request,
        build_era5_request,
        request_filename,
    )

    spark = get_spark("cs_pipeline_cli")
    spark.sparkContext.setLogLevel("ERROR")
    groups = request_groups(
        spark, start.isoformat(sep=" "), end.isoformat(sep=" ")
    ).collect()  # metadata scale: bounded by calendar size, never data

    monthly = agg == "MONTHLY"
    manifest = []
    for g in groups:
        if g.granularity == "month":
            months = [f"{g.m:02d}"]
            days = [f"{d:02d}" for d in range(1, int(g.n_days) + 1)]
            times = [f"{h:02d}:00" for h in range(24)]
            day_label = "full"
        else:
            y, m, d = g.day.split("-")
            months, days = [m], [d]
            # the group row carries only n_hours; the RUN's actual
            # hours depend on which boundary clips this day — a
            # partial start day runs h0..23 (or h0..end-hour on a
            # single-day range), a partial end day 00..h1. Listing
            # range(n_hours) from 00:00 would request the WRONG hours
            # for any day not starting at midnight.
            day_date = datetime.fromisoformat(g.day).date()
            h0 = start.hour if day_date == start.date() else 0
            h1 = end.hour if day_date == end.date() else 23
            assert h1 - h0 + 1 == int(g.n_hours), (g.day, h0, h1, g.n_hours)
            times = [f"{h:02d}:00" for h in range(h0, h1 + 1)]
            day_label = g.day
        dataset, payload = build_era5_request(
            str(g.y), months, days, times, variables, coords, monthly=monthly
        )
        target = request_filename(
            str(g.y), months[0], days[0] if days else "01", times
        )
        manifest.append(
            {"dataset": dataset, "payload": payload, "target": target,
             "group": day_label}
        )
    if "CO2" in preds:
        dataset, payload = build_co2_request()
        manifest.append(
            {"dataset": dataset, "payload": payload, "target": "co2.zip",
             "group": "co2"}
        )
    if "WTD" in preds:
        # WTD rasters come from a scraped .tif index filtered to the
        # requested month span (reference downloader.py:45-90; the
        # month-selection logic is the engine's ``source_wtd_scrape``)
        manifest.append(
            {
                "dataset": "water-table-depth-rasters",
                "payload": {
                    "start_month": start.strftime("%Y-%m"),
                    "end_month": end.strftime("%Y-%m"),
                    "exclude": ["-bot-"],
                },
                "target": "wtd/",
                "group": "wtd",
            }
        )
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, "requests.json")
    with open(path, "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"wrote {len(manifest)} request payloads to {path} (no network: "
          "fetch is the documented engine boundary)")
    return 0


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="cs_pipeline_spark",
        description="PySpark engine CLI — config-compatible with the "
        "reference carbonpipeline commands.",
    )
    sub = parser.add_subparsers(dest="command", required=True)
    p = sub.add_parser("download", help="Plan CDS requests → JSON manifest")
    p.add_argument("--config", required=True)
    p.add_argument("--out", default=None)
    q = sub.add_parser("process", help="Run the area pipeline → parquet/CSV")
    q.add_argument("--config", required=True)
    q.add_argument("--sf-dir", default=None)
    q.add_argument("--out", default=None)
    q.add_argument("--format", choices=("parquet", "csv"), default="parquet")
    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.command == "download":
        return cmd_download(args)
    return cmd_process(args)


if __name__ == "__main__":
    raise SystemExit(main())
