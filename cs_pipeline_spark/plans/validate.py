"""Request validation: date-range/aggregation alignment + CO₂ bounds.

The reference validates every extraction request before planning
(/root/reference/pipeline/carbonpipeline/main.py:362-403): DAILY
requests must span midnight→23:00, MONTHLY requests must start on the
first day of a month at 00:00:00 and end on the last day at 23:00:00,
end must be after start, and unknown aggregation types are rejected.
Separately (main.py:240-249) the CO₂ predictor is dropped when the
requested years fall outside the CO₂ dataset's [2002, 2023] coverage.

Two surfaces here:

- **Pure functions** (``validate_date_range``, ``co2_bounds_filter``)
  — the user-facing config check, mirroring the reference's raise
  messages as returned violation lists (a library API shouldn't raise
  per-rule; callers decide).
- **``plan_validate`` query** — the same rules as engine expressions
  over a deterministic request set derived from ``events``, rendering
  one row per (request, violated rule). This is the distributed shape:
  at 100 TB a catalog of requests/partitions is itself a table, and
  validation is a scan-level projection + filter, not a driver loop.

Alignment checks are expressed as date_trunc/last_day equalities (not
hour()/minute() extraction) so Spark and DuckDB agree bit-for-bit on
sub-second timestamps.
"""

from __future__ import annotations

import calendar
from datetime import datetime

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cs_pipeline_spark.registry import register
from cs_pipeline_spark.tables import EVENTS_TS_SQL, load

CO2_START_YEAR = 2002
CO2_END_YEAR = 2023

VALID_AGG_TYPES = ("DAILY", "MONTHLY", None, "", "NONE")


def validate_date_range(
    start: datetime, end: datetime, aggregation_type: str | None
) -> list[str]:
    """Pure mirror of the reference's ``_validate_date_range``
    (main.py:362-403). Returns violation strings; empty list = valid."""
    out: list[str] = []
    if end <= start:
        out.append("end_not_after_start")
    if aggregation_type == "DAILY":
        if not (start.hour == start.minute == start.second == 0):
            out.append("daily_start_not_midnight")
        if not (end.hour == 23 and end.minute == end.second == 0):
            out.append("daily_end_not_2300")
    elif aggregation_type == "MONTHLY":
        if not (
            start.day == 1
            and start.hour == start.minute == start.second == 0
        ):
            out.append("monthly_start_not_month_start")
        last = calendar.monthrange(end.year, end.month)[1]
        if not (
            end.day == last
            and end.hour == 23
            and end.minute == end.second == 0
        ):
            out.append("monthly_end_not_month_end")
    elif aggregation_type in (None, "", "NONE"):
        pass
    else:
        out.append("unknown_aggregation_type")
    return out


def co2_bounds_filter(
    start: datetime, end: datetime, preds: list[str]
) -> tuple[list[str], bool]:
    """Pure mirror of the CO₂ year-bounds drop (main.py:240-249):
    returns (possibly-filtered predictor list, whether CO₂ was
    dropped)."""
    preds = list(preds)
    dropped = False
    if "CO2" in preds and (
        start.year < CO2_START_YEAR or end.year > CO2_END_YEAR
    ):
        preds.remove("CO2")
        dropped = True
    return preds, dropped


# ---------- engine-side rendering ----------

_N_REQ = 16


def _rules(
    start: Column, end: Column, agg: Column, wants_co2: Column
) -> list[tuple[str, Column]]:
    """(rule name, fires?) — alignment via trunc equality, exact in
    both engines."""
    day_aligned = F.date_trunc("day", start) == start
    end_2300 = (
        F.date_trunc("day", end) + F.expr("INTERVAL 23 HOURS") == end
    )
    month_aligned = F.date_trunc("month", start) == start
    month_end_2300 = (
        F.last_day(end).cast("timestamp") + F.expr("INTERVAL 23 HOURS")
        == end
    )
    return [
        ("end_not_after_start", end <= start),
        ("daily_start_not_midnight", (agg == "DAILY") & ~day_aligned),
        ("daily_end_not_2300", (agg == "DAILY") & ~end_2300),
        (
            "monthly_start_not_month_start",
            (agg == "MONTHLY") & ~month_aligned,
        ),
        ("monthly_end_not_month_end", (agg == "MONTHLY") & ~month_end_2300),
        (
            "unknown_aggregation_type",
            ~agg.isin("DAILY", "MONTHLY", "NONE"),
        ),
        (
            "co2_out_of_bounds_dropped",
            wants_co2
            & (
                (F.year(start) < CO2_START_YEAR)
                | (F.year(end) > CO2_END_YEAR)
            ),
        ),
    ]


_SQL_RULES = [
    ("end_not_after_start", "end_ts <= start_ts"),
    (
        "daily_start_not_midnight",
        "agg_type = 'DAILY' AND NOT (date_trunc('day', start_ts) = start_ts)",
    ),
    (
        "daily_end_not_2300",
        "agg_type = 'DAILY' AND NOT "
        "(date_trunc('day', end_ts) + INTERVAL 23 HOUR = end_ts)",
    ),
    (
        "monthly_start_not_month_start",
        "agg_type = 'MONTHLY' AND NOT "
        "(date_trunc('month', start_ts) = start_ts)",
    ),
    (
        "monthly_end_not_month_end",
        "agg_type = 'MONTHLY' AND NOT "
        "(CAST(last_day(end_ts) AS TIMESTAMP) + INTERVAL 23 HOUR = end_ts)",
    ),
    (
        "unknown_aggregation_type",
        "agg_type NOT IN ('DAILY', 'MONTHLY', 'NONE')",
    ),
    (
        "co2_out_of_bounds_dropped",
        f"wants_co2 AND (year(start_ts) < {CO2_START_YEAR} "
        f"OR year(end_ts) > {CO2_END_YEAR})",
    ),
]

_SQL_REQ = (
    f"base AS (SELECT user_id % {_N_REQ} AS req_id, "
    f"MIN({EVENTS_TS_SQL}) AS s0, MAX({EVENTS_TS_SQL}) AS e0 "
    "FROM events GROUP BY 1), "
    "req AS (SELECT req_id, "
    "CASE WHEN req_id % 4 = 0 THEN date_trunc('day', s0) ELSE s0 END "
    "AS start_ts, "
    "CASE WHEN req_id % 4 = 0 THEN date_trunc('day', e0) + INTERVAL 23 HOUR "
    "ELSE e0 END AS end_ts, "
    "CASE WHEN req_id % 3 = 0 THEN 'DAILY' "
    "WHEN req_id % 3 = 1 THEN 'MONTHLY' "
    "WHEN req_id % 6 = 2 THEN 'NONE' ELSE 'WEEKLY' END AS agg_type, "
    "(req_id % 2 = 0) AS wants_co2 FROM base)"
)


@register(
    "plan_validate",
    "WITH " + _SQL_REQ + " "
    + " UNION ALL ".join(
        f"SELECT req_id, agg_type, '{name}' AS rule FROM req WHERE {cond}"
        for name, cond in _SQL_RULES
    ),
    doc="request validation: date-range/aggregation alignment + CO₂ "
    "year-bounds, rendered as (request, violated-rule) rows "
    "(main.py:362-403, main.py:240-249)",
)
def plan_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic request set (one per ``user_id % 16``: start/end
    from the group's event span, some snapped to valid DAILY bounds,
    aggregation type cycling DAILY/MONTHLY/NONE/unknown) → one output
    row per violated rule. Single aggregation shuffle; rule rendering
    is a projection + filter union on a 16-row frame."""
    ev = load(spark, "events", sf_dir)
    base = ev.groupBy((F.col("user_id") % _N_REQ).alias("req_id")).agg(
        F.min("ts").alias("s0"), F.max("ts").alias("e0")
    )
    snap = F.col("req_id") % 4 == 0
    req = base.select(
        "req_id",
        F.when(snap, F.date_trunc("day", F.col("s0")))
        .otherwise(F.col("s0"))
        .alias("start_ts"),
        F.when(
            snap,
            F.date_trunc("day", F.col("e0")) + F.expr("INTERVAL 23 HOURS"),
        )
        .otherwise(F.col("e0"))
        .alias("end_ts"),
        F.when(F.col("req_id") % 3 == 0, "DAILY")
        .when(F.col("req_id") % 3 == 1, "MONTHLY")
        .when(F.col("req_id") % 6 == 2, "NONE")
        .otherwise("WEEKLY")
        .alias("agg_type"),
        (F.col("req_id") % 2 == 0).alias("wants_co2"),
    ).localCheckpoint()
    out = None
    for name, cond in _rules(
        F.col("start_ts"),
        F.col("end_ts"),
        F.col("agg_type"),
        F.col("wants_co2"),
    ):
        part = req.filter(cond).select(
            "req_id", "agg_type", F.lit(name).alias("rule")
        )
        out = part if out is None else out.unionAll(part)
    return out
