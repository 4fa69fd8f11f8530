"""Flagship #9 (ingest_incremental_e2e) + sim_ivf_retrain: funnel
consistency and retrain conservation laws at sf0.001."""

from __future__ import annotations


def test_ingest_funnel_consistency(spark, sf_dir):
    from cs_pipeline_spark.operators.pipeline_ingest import (
        ingest_incremental_e2e,
    )

    rows = {
        (r.stage, r.metric): r.value
        for r in ingest_incremental_e2e(spark, sf_dir).collect()
    }
    assert len(rows) == 8
    # admitted + dup_vectors == batch vectors (the keep/drop split)
    assert (
        rows[("dedup", "admitted")] + rows[("dedup", "dup_vectors")]
        == rows[("batch", "vectors")]
    )
    assert rows[("dedup", "dup_vectors")] <= rows[("dedup", "dup_pairs")] * 2
    assert rows[("search", "batch_neighbors")] <= rows[("search", "results")]
    assert all(v >= 0 for v in rows.values())


def test_retrain_conserves_membership(spark, sf_dir):
    from cs_pipeline_spark.operators.similarity import sim_ivf_retrain
    from cs_pipeline_spark.tables import load

    df = sim_ivf_retrain(spark, sf_dir).collect()
    n_corpus = load(spark, "embeddings", sf_dir).count()
    # both assignment passes cover the full corpus exactly once
    assert sum(r.n_before for r in df) == n_corpus
    assert sum(r.n_after for r in df) == n_corpus
    assert all(r.shift_scaled is not None and r.shift_scaled >= 0
               for r in df if r.n_before > 0)


def test_lake_audit_consistency(spark, sf_dir):
    from cs_pipeline_spark.operators.pipeline_ingest import lake_audit_e2e
    from cs_pipeline_spark.sources.delta_log import _N_COMMITS

    from cs_pipeline_spark.sources.iceberg import _N_SNAPSHOTS

    rows = {
        (r.layer, r.metric): r.value
        for r in lake_audit_e2e(spark, sf_dir).collect()
    }
    assert len(rows) == 25  # eight layers as of round 10 wave 2
    assert rows[("log", "versions")] == _N_COMMITS
    assert rows[("parquet", "non_snappy_chunks")] == 0
    assert rows[("avro", "deflate_files")] == 2  # odd fixtures
    assert rows[("log", "net_file_growth")] > 0
    assert rows[("iceberg", "snapshots")] == _N_SNAPSHOTS
    assert rows[("iceberg", "live_files_head")] > 0
    assert rows[("parquet", "page_mismatch_files")] == 0
    assert rows[("parquet", "rows_page_verified")] == rows[
        ("parquet", "rows")
    ]
    assert rows[("hudi", "instants")] == 6
    assert rows[("dv", "files_with_dv")] == 3
    assert rows[("dv", "deleted_rows")] == 300 + 5000 + 300
    assert rows[("iceberg", "pos_deletes_applied")] == 6
    assert rows[("iceberg", "mor_live_rows")] > 0
    assert rows[("orc", "stripe_mismatch_files")] == 0
    assert rows[("orc", "rows")] > 0


def test_wire_formats_consistency(spark, sf_dir):
    from cs_pipeline_spark.operators.pipeline_ingest import (
        wire_formats_e2e,
    )
    from cs_pipeline_spark.sources.arrow_ipc import _N_ARROW
    from cs_pipeline_spark.sources.deflate import (
        _N_ZFILES,
        _n_streams as _zlib_streams,
    )
    from cs_pipeline_spark.sources.msgpack import _N_MSGPACK, _n_records
    from cs_pipeline_spark.sources.xz_container import (
        _N_XZ,
        _n_streams as _xz_streams,
    )

    rows = {
        (r.format, r.metric): r.value
        for r in wire_formats_e2e(spark, sf_dir).collect()
    }
    assert len(rows) == 28
    assert rows[("arrow", "files")] == _N_ARROW
    assert rows[("arrow", "rows")] == sum(
        200 + 61 * i for i in range(_N_ARROW)
    )
    assert rows[("arrow", "nulls")] > 0
    assert rows[("msgpack", "files")] == _N_MSGPACK
    assert rows[("msgpack", "records")] == sum(
        _n_records(i) for i in range(_N_MSGPACK)
    )
    assert rows[("zlib", "streams")] == sum(
        _zlib_streams(i) for i in range(_N_ZFILES)
    )
    assert rows[("xz", "blocks")] == sum(
        _xz_streams(i) for i in range(_N_XZ)
    )
    # every xz stream's check field verified (one per block here)
    assert rows[("xz", "checks_verified")] == rows[("xz", "blocks")]
    assert rows[("sqlite", "tables")] == 2 * 4
    assert rows[("sqlite", "rows")] == sum(
        500 + 170 * i for i in range(4)
    )
    assert rows[("gzip", "members")] == sum(
        (i % 3) + 1 for i in range(4)
    )
    assert rows[("arrow_stream", "rows")] == sum(
        150 + 83 * i for i in range(3)
    )
    assert rows[("torrent", "pieces_verified")] == rows[
        ("torrent", "pieces")
    ]
    assert rows[("zip", "crc_verified")] == rows[("zip", "members")]
    assert rows[("cbor", "indefinite_items")] > 0
