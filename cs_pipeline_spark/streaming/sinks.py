"""Exactly-once streaming sinks via ``foreachBatch``.

Structured Streaming's file sinks are append-only; transactional
"merge this micro-batch exactly once" semantics belong in
``foreachBatch``, where the batch is a normal DataFrame and the sink
write can be made IDEMPOTENT on the (checkpointed) ``batch_id``. On
failure/recovery Spark replays the last uncommitted batch with the
SAME batch_id — an idempotent writer turns at-least-once replay into
exactly-once output. This is the standard production pattern for
parquet/JDBC/Delta sinks.

Implementation here: dynamic partition overwrite keyed by
``_batch_id`` — replaying batch N rewrites exactly partition N and
nothing else (same mechanism as ``sink_dynamic_overwrite``). At 100 TB
the same code ships per-batch partitions to object storage; the
overwrite is a directory swap, never a table rewrite.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def idempotent_parquet_writer(
    out_dir: str,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` callback: write the micro-batch into the
    ``_batch_id=<id>`` partition with dynamic partition overwrite.
    Calling it twice with the same ``batch_id`` (the failure-replay
    case) leaves the sink byte-identical — exactly-once output from
    at-least-once delivery."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("_batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_dir)
        )

    return write_batch


def start_idempotent_stream(stream_df: DataFrame, out_dir: str, checkpoint: str):
    """Wire a streaming DataFrame into the idempotent parquet sink
    (checkpointed, availableNow-compatible)."""
    return (
        stream_df.writeStream.foreachBatch(idempotent_parquet_writer(out_dir))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
