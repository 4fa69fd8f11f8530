"""Sinks (SURVEY §2.1): partitioned parquet, float32-downcast parquet,
CSV round-trip.

Reference sinks: compressed NetCDF with float64→float32 encoding
(`core.py:325-369`), one-file-per-region chunk spill
(`dataset.py:270-295`), CSV for the gap-fill table
(`dataset.py:314-318`). Spark-first: `write.partitionBy(...).parquet`
replaces the manual per-region spill (shuffle/spill is the engine's
job), zstd/snappy replaces zlib, and the float32 cast is an explicit
column cast at the sink.

Each op WRITES to a scratch dir, RE-READS, and returns the re-read
frame — so the oracle verifies the full encode→decode round-trip, not
just the plan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from cs_pipeline_spark.operators.helpers import dsum, sql_dsum
from cs_pipeline_spark.registry import register
from cs_pipeline_spark.sources.scans import _scratch
from cs_pipeline_spark.tables import load


@register(
    "sink_partitioned_parquet",
    "SELECT o_orderstatus, COUNT(*) AS n_orders, "
    f"{sql_dsum('o_totalprice')} AS sum_price "
    "FROM orders GROUP BY o_orderstatus",
    doc="hive-partitioned parquet sink (partitionBy) + re-read aggregation",
)
def sink_partitioned_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`partitionBy(status)` is the Spark shape of the reference's
    one-file-per-region spill: the engine routes rows to partition
    dirs during the write (no driver loop), and the re-read prunes by
    partition value for free."""
    path = _scratch(sf_dir, "orders_by_status.parquet")
    if not os.path.exists(path):
        load(spark, "orders", sf_dir).write.mode("overwrite").partitionBy(
            "o_orderstatus"
        ).parquet(path)
    back = spark.read.parquet(path)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("sum_price"),
    )


@register(
    "sink_float32_cast",
    "SELECT o_orderkey, CAST(CAST(o_totalprice AS REAL) AS DOUBLE) AS price_f32 "
    "FROM orders WHERE o_orderkey < 2000",
    doc="float64→float32 downcast at the sink (reference NetCDF encoding)",
)
def sink_float32_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference downcasts science values to float32 on write
    (`core.py:351-357`); IEEE double→float rounding is identical in
    both engines, so the round-trip is hash-checkable."""
    path = _scratch(sf_dir, "orders_f32.parquet")
    if not os.path.exists(path):
        load(spark, "orders", sf_dir).filter(F.col("o_orderkey") < 2000).select(
            "o_orderkey", F.col("o_totalprice").cast("float").alias("price_f32")
        ).write.mode("overwrite").option("compression", "zstd").parquet(path)
    return spark.read.parquet(path).select(
        "o_orderkey", F.col("price_f32").cast("double").alias("price_f32")
    )


_CSV_BACK_SCHEMA = StructType(
    [
        StructField("r_regionkey", IntegerType()),
        StructField("r_name", StringType()),
    ]
)


@register(
    "sink_csv_roundtrip",
    "SELECT r_regionkey, r_name FROM region",
    doc="header CSV sink + tolerant re-read (gap-fill output shape)",
)
def sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _scratch(sf_dir, "region_out.csv")
    if not os.path.exists(path):
        load(spark, "region", sf_dir).select(
            "r_regionkey", "r_name"
        ).coalesce(1).write.mode("overwrite").option("header", True).csv(path)
    return spark.read.schema(_CSV_BACK_SCHEMA).option("header", True).csv(path)


@register(
    "sink_sorted_stats",
    "SELECT COUNT(*) AS n_jan, MIN(ts) AS min_ts, MAX(ts) AS max_ts "
    "FROM (SELECT CAST(ts AS TIMESTAMP) AS ts FROM events) "
    "WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-11'",
    doc="zone-map sink: sortWithinPartitions(ts) before the parquet write so row-group min/max stats are tight → a time-range re-read skips most row groups (data-skipping layout, no extra shuffle)",
)
def sink_sorted_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout-for-skipping sink. ``sortWithinPartitions("ts")`` costs
    a LOCAL per-task sort (no exchange — verified in the plan) and
    yields parquet row groups with tight, disjoint ts min/max ranges;
    any later time-range scan then prunes row groups via statistics
    instead of reading them. At 100 TB this is the difference between
    scanning a day and scanning a year for `WHERE ts BETWEEN ...`.
    The registered result is the round-trip: write sorted → re-read
    with a range predicate (pushed to the reader) → aggregate."""
    ev = load(spark, "events", sf_dir)
    path = _scratch(sf_dir, "events_sorted.parquet")
    (
        ev.select("event_id", "ts", "user_id", "value")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path).filter(
        (F.col("ts") >= F.lit("2024-01-10").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-11").cast("timestamp"))
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_jan"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )


_COMPACT_TARGET = 2


@register(
    "sink_compact_small_files",
    f"""
    SELECT COUNT(*) AS n_rows, COUNT(DISTINCT event_id) AS n_ids,
           {_COMPACT_TARGET} AS n_files
    FROM events
    """,
    doc=f"small-file compaction: 32-part scatter → coalesce({_COMPACT_TARGET}) rewrite; the oracle pins the contract (row fidelity + exact output file count)",
)
def sink_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-maintenance op. Streaming sinks and per-region writers
    leave thousands of KB-sized files; scan throughput then dies on
    file-open overhead and tiny row groups. Compaction = read →
    ``coalesce(target)`` → rewrite: coalesce MERGES partitions
    without a shuffle (unlike repartition), so the rewrite is
    scan+write only. The result re-reads the compacted table and
    proves fidelity (row count, distinct ids) plus the exact file
    count — the n_files column is the contract the oracle pins, like
    the approx-aggregate verdicts. At 100 TB: compact per partition
    directory, target ≈ 512 MB-1 GB per file."""
    ev = load(spark, "events", sf_dir)
    scattered = _scratch(sf_dir, "events_scattered.parquet")
    compacted = _scratch(sf_dir, "events_compacted.parquet")
    ev.repartition(32).write.mode("overwrite").parquet(scattered)
    (
        spark.read.parquet(scattered)
        .coalesce(_COMPACT_TARGET)
        .write.mode("overwrite")
        .parquet(compacted)
    )
    back = spark.read.parquet(compacted).select(
        "event_id", F.input_file_name().alias("fname")
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("event_id").alias("n_ids"),
        F.countDistinct("fname").cast("int").alias("n_files"),
    )


@register(
    "sink_orc_roundtrip",
    "SELECT o_orderstatus, COUNT(*) AS n, "
    "MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key "
    "FROM orders GROUP BY o_orderstatus",
    doc="ORC sink/scan roundtrip: second columnar format (write orc → re-read → aggregate matches the parquet-derived oracle) — format interchange without value drift",
)
def sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format portability: the same frame through ORC must carry
    identical values (both formats are lossless for these types).
    ORC brings its own zone-map-style stats and predicate pushdown —
    the layout guidance in SCALE.md applies unchanged."""
    o = load(spark, "orders", sf_dir)
    path = _scratch(sf_dir, "orders_orc")
    o.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


@register(
    "scan_partition_pruned",
    "SELECT user_id, COUNT(*) AS n_events, "
    f"{sql_dsum('value')} AS sum_value "
    "FROM events WHERE event_type = 'click' GROUP BY user_id",
    doc="partition-pruned read-back: hive-partitioned scratch dataset "
    "scanned with a partition-value filter (PartitionFilters, zero "
    "data files from other partitions)",
)
def scan_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The read side of the partitioned sink: filtering on the
    partition column prunes at PLANNING time (directory listing), so
    non-matching partitions contribute zero scanned files — the
    mechanism that makes 100 TB hive layouts queryable. The plan shows
    the predicate under PartitionFilters (not PushedFilters: it never
    reaches row groups at all); ``tools/audit_plans.py`` asserts it.
    """
    path = _scratch(sf_dir, "events_by_type.parquet")
    if not os.path.exists(path):
        load(spark, "events", sf_dir).write.mode("overwrite").partitionBy(
            "event_type"
        ).parquet(path)
    back = spark.read.parquet(path).filter(F.col("event_type") == "click")
    return back.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("sum_value"),
    )


# ---------- dynamic partition overwrite ----------


@register(
    "sink_dynamic_overwrite",
    """
    WITH base AS (
      SELECT event_type, user_id, value FROM events
    ),
    final AS (
      SELECT event_type, user_id,
             CASE WHEN event_type = 'click' THEN value * 2.0
                  ELSE value END AS value
      FROM base
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           (CAST(CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5)
             AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) / 1000000.0)
             AS sum_value
    FROM final GROUP BY event_type
    """,
    doc="dynamic partition overwrite: rewrite ONLY the partitions the "
    "incoming batch touches (partitionOverwriteMode=dynamic) — the "
    "idempotent daily-restatement write; untouched partitions are "
    "byte-identical survivors, verified by re-reading the whole sink",
)
def sink_dynamic_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The restatement pattern: a corrected 'click' batch arrives;
    with ``partitionOverwriteMode=dynamic``, ``mode("overwrite")``
    replaces ONLY the event_type=click partition — a static overwrite
    would truncate the whole table, a blind append would double-count.
    The query re-reads the sink afterwards, so the oracle checks the
    semantic contract end-to-end (click values doubled, every other
    partition untouched).

    Scale: the rewrite I/O is proportional to the restated partitions,
    not the table; this is the idempotence mechanism for re-runnable
    daily jobs on plain parquet (table formats make it transactional,
    the layout contract is the same).
    """
    from cs_pipeline_spark.sources.scans import _scratch
    from cs_pipeline_spark.tables import load as _load

    path = _scratch(sf_dir, "dyn_overwrite.parquet")
    ev = _load(spark, "events", sf_dir).select(
        "event_type", "user_id", "value"
    )
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # full base write (all partitions)
        ev.write.mode("overwrite").partitionBy("event_type").parquet(path)
        # restatement batch: ONLY the click partition, values doubled
        restated = ev.filter(F.col("event_type") == "click").withColumn(
            "value", F.col("value") * 2.0
        )
        restated.write.mode("overwrite").partitionBy("event_type").parquet(
            path
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)
    q = F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5)).cast(
        "decimal(38,0)"
    )
    return (
        spark.read.parquet(path)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            (
                F.sum(q).cast("string").cast("double") / F.lit(1e6)
            ).alias("sum_value"),
        )
    )


@register(
    "sink_bloom_filter_parquet",
    """
    SELECT user_id, COUNT(*) AS n_events,
           CAST(1 AS BIGINT) AS bloom_written
    FROM events WHERE user_id IN (7, 77, 777) GROUP BY user_id
    """,
    doc="parquet bloom-filter sink: write with column bloom filters on "
    "user_id, re-read with a point-lookup IN predicate — the "
    "stats-can't-help skipping path (high-cardinality equality on an "
    "unsorted column)",
)
def sink_bloom_filter_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-group skipping for point lookups on UNSORTED high-cardinality
    keys: min/max statistics are useless when every row group spans
    the full key range, but a per-row-group bloom filter answers
    'key definitely absent' and the reader skips the group. This is
    the parquet feature ``sortWithinPartitions`` (``sink_sorted_stats``)
    cannot replace for multi-key layouts — you can only sort by one
    ordering. Write option: ``parquet.bloom.filter.enabled#user_id``.

    100 TB: bloom filters cost ~1-2% file size and turn needle-in-
    haystack id lookups (abuse investigations, GDPR deletes) from
    full scans into a handful of row groups.
    """
    ev = load(spark, "events", sf_dir)
    path = _scratch(sf_dir, "events_bloom.parquet")
    (
        ev.select("event_id", "ts", "user_id", "value")
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#user_id", "true")
        .option("parquet.bloom.filter.expected.ndv#user_id", "2000")
        .parquet(path)
    )
    back = spark.read.parquet(path).filter(
        F.col("user_id").isin(7, 77, 777)
    )
    return back.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.lit(1).cast("long").alias("bloom_written"),
    )


_JSONL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("n_chars", LongType()),
        StructField("source", StringType()),
    ]
)


@register(
    "sink_jsonl_roundtrip",
    """
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars_total
    FROM (SELECT doc_id, lang, source, n_chars FROM documents
          WHERE doc_id < 2000) t
    GROUP BY lang
    """,
    doc="JSON-lines sink + schema'd re-read + rollup: the interchange "
    "format corpus pipelines exchange (one JSON object per line, "
    "splittable, schema-on-read)",
)
def sink_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL round-trip: write a bounded document slice as JSON lines,
    re-read it WITH AN EXPLICIT SCHEMA, and aggregate — proving the
    sink/scan pair preserves types and values. JSONL is the lingua
    franca of corpus exchange (crawl dumps, instruction datasets);
    this op is the format's registration in the sink/scan family
    (parquet, CSV, ORC, GeoJSON, binaryFile, zip already covered).

    The explicit read schema matters twice: (a) schema inference
    would scan the data once just to guess types (2× I/O at 100 TB);
    (b) inference maps integers to LONG today but is version-fragile —
    a pinned StructType is the production contract. Text columns
    round-trip through JSON string escaping identically in both
    engines (the aggregate here keys on `lang` and sums a numeric, so
    the check is escape-independent; `scan_csv_tolerant` covers
    malformed-line semantics for text formats).

    Scale: JSONL is line-splittable, so the re-read parallelizes like
    CSV; compression should be per-file zstd (splittable-friendly
    frames) not gzip (one stream = one task). The write is bounded
    (doc_id < 2000) and idempotent via overwrite.
    """
    path = _scratch(sf_dir, "documents_slice.jsonl")
    if not os.path.exists(path):
        load(spark, "documents", sf_dir).filter(
            F.col("doc_id") < 2000
        ).select("doc_id", "lang", "source", "n_chars").write.mode(
            "overwrite"
        ).json(path)
    back = spark.read.schema(_JSONL_SCHEMA).json(path)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars_total"),
    )
