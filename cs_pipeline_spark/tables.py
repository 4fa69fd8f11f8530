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


# events.parquet stores TIMESTAMP(NANOS), which Spark's parquet reader
# rejects. We read nanos as long (runtime conf) and truncate to
# microsecond TimestampType. DuckDB oracles must mirror with
# CAST(ts AS TIMESTAMP) — DuckDB's ns→µs cast also truncates.
EVENTS_TS_SQL = "CAST(ts AS TIMESTAMP)"


def load(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Load one table from an sf directory (file or partitioned dir)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
        )
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load(spark, t, sf_dir) for t in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view for spark.sql use."""
    for t in TABLE_NAMES:
        load(spark, t, sf_dir).createOrReplaceTempView(t)
