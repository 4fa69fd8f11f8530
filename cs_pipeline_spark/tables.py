"""Loaders for the driver's synthetic parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings. One parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}/``.

At 100 TB each of these would be a partitioned parquet dataset
(e.g. ``lineitem/`` partitioned by ship month); ``load`` takes a
directory so the same call works on a single file or a whole dataset —
Spark's parquet source handles partition discovery + pruning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# events.parquet has shipped as either TIMESTAMP(NANOS) (read as long
# via the legacy conf, truncated to µs) or plain timestamp[us] (read as
# TIMESTAMP_NTZ under inferTimestampNTZ). ``load`` normalizes both to
# session-UTC TimestampType, so downstream code sees one type. DuckDB
# oracles mirror with CAST(ts AS TIMESTAMP) — a no-op on µs files and a
# truncating cast on ns files, matching the Spark side exactly.
EVENTS_TS_SQL = "CAST(ts AS TIMESTAMP)"


def nan_to_null(df: DataFrame) -> DataFrame:
    """NaN→null on every top-level float/double column.

    The reference's xarray pipeline treats NaN as *missing* and every
    reduction skips it (/root/reference/pipeline/carbonpipeline/
    dataset.py:144, skipna throughout). Spark aggregates do NOT skip
    NaN, so NaN-capable sources (ERA5 fixtures, scratch parquet with
    real holes) normalize at ingest with this; after it, null is the
    single missing-value representation.

    Deliberately NOT applied blanket in ``load``: wrapping every double
    column in ``nanvl`` makes filters on those columns non-pushable
    (the parquet scan sees ``nanvl(col)``, not ``col`` — PushedFilters
    goes empty), which at the 100 TB design point turns row-group
    pruning into full scans. The driver tables are NaN-free by
    construction, and the deterministic aggregate helpers
    (``operators/helpers._nn``) skip NaN at the expression level on
    both engines, so skipna parity holds without the scan-side cost.
    """
    from pyspark.sql.types import DoubleType, FloatType

    cols, changed = [], False
    for f in df.schema.fields:
        if isinstance(f.dataType, (DoubleType, FloatType)):
            cols.append(
                F.nanvl(F.col(f.name), F.lit(None).cast(f.dataType)).alias(
                    f.name
                )
            )
            changed = True
        else:
            cols.append(F.col(f.name))
    return df.select(*cols) if changed else df


def load(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Load one table from an sf directory (file or partitioned dir).

    Raw columns pass through untouched so scan-column filters stay
    pushable (see ``nan_to_null`` for why NaN normalization is NOT
    done here); only ``events.ts`` is type-normalized.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql.types import LongType, TimestampNTZType

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # legacy nanos file: truncate ns → µs
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            # µs file read as NTZ: reinterpret in the session tz (UTC —
            # session.py pins it), value-preserving
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load(spark, t, sf_dir) for t in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view for spark.sql use."""
    for t in TABLE_NAMES:
        load(spark, t, sf_dir).createOrReplaceTempView(t)
