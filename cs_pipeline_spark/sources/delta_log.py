"""Lakehouse transaction-log replay — Delta-style commit JSON.

Every lakehouse table format (Delta, Iceberg, Hudi) is "parquet files
+ an ordered commit log of add/remove actions", and the primitive
every reader implements is LOG REPLAY: fold the actions up to a
version and you have that version's live file set — which is also
exactly how time travel works. This module implements the replay as
a DataFrame program over the raw commit JSON (no lakehouse library):
one row per (version, action), latest-action-wins per path with
remove beating add on version ties, and a per-version snapshot
census — the file count / byte / record mass a reader AS OF each
version would plan against.

Fixture: a ``_delta_log``-shaped directory of ``%020d.json`` commit
files; commit 0 carries protocol/metaData lines (skipped by the
replay, as real readers skip them for file listing), every commit
adds 3 files, and commits ≥ 2 remove one file two commits back (the
compaction/rewrite pattern). All sizes/record counts are stated by
formula, so the DuckDB oracle recomputes the full time-travel table.

Scale: the log is metadata (KBs per commit); replay is one
path-keyed aggregate after a bounded version fan-out. Production
Delta adds parquet checkpoints every 10 commits so replay reads
O(10) JSON files — the same fold from a later starting state;
noted in the docstring as the long-log path.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cs_pipeline_spark.registry import register
from cs_pipeline_spark.sources.scans import _fixture, _scratch

_N_COMMITS = 6
_ADDS_PER_COMMIT = 3


def _add_info(c: int, k: int) -> tuple[str, int, int]:
    return (
        f"part-{c}-{k}.parquet",
        1000 + 100 * c + 10 * k,
        50 + 10 * c + k,
    )


def _remove_path(c: int) -> str:
    return f"part-{c - 2}-{c % 3}.parquet"


@_fixture
def _fx_delta_log(spark: SparkSession, sf_dir: str) -> None:
    import os

    out_dir = _scratch(sf_dir, "real_delta_log")
    os.makedirs(out_dir, exist_ok=True)
    for c in range(_N_COMMITS):
        p = f"{out_dir}/{c:020d}.json"
        if os.path.exists(p):
            continue
        lines = []
        if c == 0:
            lines.append(json.dumps({
                "protocol": {"minReaderVersion": 1, "minWriterVersion": 2}
            }))
            lines.append(json.dumps({
                "metaData": {"id": "tbl", "format": {"provider": "parquet"}}
            }))
        for k in range(_ADDS_PER_COMMIT):
            path, sz, recs = _add_info(c, k)
            lines.append(json.dumps({
                "add": {"path": path, "size": sz, "numRecords": recs,
                        "dataChange": True}
            }))
        if c >= 2:
            lines.append(json.dumps({
                "remove": {"path": _remove_path(c), "dataChange": True}
            }))
        tmp = p + ".tmp"
        with open(tmp, "w") as fh:
            fh.write("\n".join(lines) + "\n")
        import os as _os

        _os.replace(tmp, p)


_DELTA_ORACLE = f"""
    WITH commits AS (SELECT unnest(range(0, {_N_COMMITS})) AS c),
    adds AS (SELECT c, k.k,
                    printf('part-%d-%d.parquet', CAST(c AS INT),
                           CAST(k.k AS INT)) AS path,
                    1000 + 100 * c + 10 * k.k AS sz,
                    50 + 10 * c + k.k AS recs
             FROM commits,
                  (SELECT unnest(range(0, {_ADDS_PER_COMMIT})) AS k) k),
    rems AS (SELECT c AS rc,
                    printf('part-%d-%d.parquet', CAST(c - 2 AS INT),
                           CAST(c % 3 AS INT)) AS path
             FROM commits WHERE c >= 2),
    v AS (SELECT unnest(range(0, {_N_COMMITS})) AS v),
    live AS (SELECT v.v, a.path, a.sz, a.recs
             FROM v JOIN adds a ON a.c <= v.v
             WHERE NOT EXISTS (SELECT 1 FROM rems r
                               WHERE r.path = a.path AND r.rc <= v.v))
    SELECT CAST(v AS BIGINT) AS version,
           CAST(COUNT(*) AS BIGINT) AS n_live_files,
           CAST(SUM(sz) AS BIGINT) AS live_bytes,
           CAST(SUM(recs) AS BIGINT) AS live_records
    FROM live GROUP BY v
"""


@register(
    "scan_delta_log",
    _DELTA_ORACLE,
    doc="lakehouse transaction-log replay (Delta-style %020d.json "
    "commits): add/remove actions folded latest-action-wins per path "
    "(remove beats add on version ties) into the live file set AS OF "
    "every version — the time-travel snapshot census, one row per "
    "version, hash-checked against the fixture formula",
)
def scan_delta_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The primitive under every lakehouse reader: fold the commit
    log to a version, get that version's file list. Protocol/metaData
    lines are skipped exactly as real file-listing replay skips them;
    the compaction pattern (commit c rewrites a file from commit c−2)
    makes the snapshots genuinely differ per version, so an
    off-by-one in the fold (≤ v vs < v, or add beating remove on a
    tie) changes the hash.

    Scale: commit JSON is metadata — KBs per commit regardless of
    data size. The replay is a bounded version fan-out (versions ×
    actions, both log-sized) then a (version, path) latest-action
    aggregate. Long logs use the checkpoint pattern: start the fold
    from the last parquet checkpoint instead of version 0 — same
    aggregate, O(10) JSON files read.
    """
    log_dir = _scratch(sf_dir, "real_delta_log")
    raw = (
        spark.read.option("pathGlobFilter", "*.json")
        .text(log_dir)
        .select(
            F.regexp_extract(
                F.input_file_name(), r"(\d{20})\.json$", 1
            )
            .cast("long")
            .alias("version"),
            "value",
        )
    )
    acts = raw.select(
        "version",
        F.get_json_object("value", "$.add.path").alias("add_path"),
        F.get_json_object("value", "$.add.size")
        .cast("long")
        .alias("sz"),
        F.get_json_object("value", "$.add.numRecords")
        .cast("long")
        .alias("recs"),
        F.get_json_object("value", "$.remove.path").alias("rm_path"),
    ).filter(
        F.col("add_path").isNotNull() | F.col("rm_path").isNotNull()
    )
    actions = acts.select(
        "version",
        F.coalesce("add_path", "rm_path").alias("path"),
        F.col("rm_path").isNotNull().cast("int").alias("is_remove"),
        "sz",
        "recs",
    )
    # bounded fan-out WITHOUT a nested-loop join: an action at
    # version x is visible in snapshots x..N-1 — explode the range
    fan = actions.select(
        "path",
        "version",
        "is_remove",
        "sz",
        "recs",
        F.explode(
            F.sequence(F.col("version"), F.lit(_N_COMMITS - 1))
        ).alias("v"),
    )
    latest = (
        fan.groupBy("v", "path")
        .agg(
            F.max(
                F.struct("version", "is_remove", "sz", "recs")
            ).alias("a")
        )
        .filter(F.col("a.is_remove") == 0)
    )
    return (
        latest.groupBy("v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_live_files"),
            F.sum("a.sz").cast("long").alias("live_bytes"),
            F.sum("a.recs").cast("long").alias("live_records"),
        )
        .select(
            F.col("v").cast("long").alias("version"),
            "n_live_files",
            "live_bytes",
            "live_records",
        )
    )
