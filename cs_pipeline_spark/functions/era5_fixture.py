"""Deterministic ERA5-shaped frame derived from the ``events`` table.

The driver's correctness gate runs only on its own parquet tables, so
climate-specific operators are exercised on an ERA5-lookalike derived
*deterministically* from ``events``: every derived column is a pure
IEEE arithmetic expression (+,-,*,/,% — all exactly reproducible in
DuckDB), defined once as SQL text and used by BOTH the Spark builder
(``F.expr``) and the oracle CTE. The grid is 8×8 cells on the 0.25°
ERA5 spacing; ``valid_time`` is the event timestamp.

This mirrors FIXTURES.md §F1 in shape: shortname variable columns
(u10…zust) plus enrichment inputs (xco2, wtd), with d2m ≤ t2m so
RH ≤ 100.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cs_pipeline_spark.tables import load

# (column, SQL expression over events columns) — order preserved.
DERIVATIONS: list[tuple[str, str]] = [
    ("valid_time", "ts"),
    ("latitude", "45.0 + CAST(user_id % 8 AS DOUBLE) * 0.25"),
    ("longitude", "-74.0 + CAST(event_id % 8 AS DOUBLE) * 0.25"),
    ("u10", "(value / 20.0 - 5.0)"),
    ("v10", "(value % 7.0 - 3.0)"),
    ("t2m", "(273.15 + value / 10.0)"),
    ("d2m", "(273.15 + value / 10.0 - 2.0 - value % 5.0)"),
    ("sp", "(101325.0 + (value - 100.0) * 10.0)"),
    ("tp", "(value / 100000.0)"),
    ("avg_sdswrf", "(value * 2.0)"),
    ("avg_sdswrfcs", "(value * 2.2)"),
    ("avg_sdlwrf", "(300.0 + value / 2.0)"),
    ("avg_snlwrf", "(0.0 - 50.0 - value / 4.0)"),
    ("avg_slhtf", "(0.0 - value / 2.0)"),
    ("avg_ishf", "(0.0 - value / 3.0)"),
    ("stl1", "(283.0 + value / 50.0)"),
    ("stl2", "(282.0 + value / 60.0)"),
    ("stl3", "(281.0 + value / 70.0)"),
    ("swvl1", "(0.05 + (value % 40.0) / 100.0)"),
    ("swvl2", "(0.06 + (value % 35.0) / 100.0)"),
    ("swvl3", "(0.07 + (value % 30.0) / 100.0)"),
    ("fal", "(0.1 + (value % 60.0) / 100.0)"),
    ("zust", "(value / 500.0)"),
    ("xco2", "(400.0 + value / 100.0)"),
    ("wtd", "(value / 40.0)"),
]


def era5_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived ERA5-shaped frame (one row per event)."""
    ev = load(spark, "events", sf_dir)
    return ev.select(
        F.col("event_id"),
        *[F.expr(sql).alias(name) for name, sql in DERIVATIONS],
    )


# In the oracle, events.ts is TIMESTAMP_NS — truncate to µs to match
# the Spark loader (tables.EVENTS_TS_SQL).
ERA5_CTE = (
    "era5 AS (SELECT event_id, "
    + ", ".join(
        f"{sql} AS {name}" for name, sql in DERIVATIONS
    ).replace("ts AS valid_time", "CAST(ts AS TIMESTAMP) AS valid_time")
    + " FROM events)"
)


def era5_sql(body: str) -> str:
    """Wrap an oracle query body with the era5 CTE."""
    return f"WITH {ERA5_CTE} {body}"
