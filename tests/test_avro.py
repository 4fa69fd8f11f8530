"""Avro OCF decode (sources/avro_ocf.py): block framing, sync
validation, codecs, typed decode."""

from __future__ import annotations

import pytest

from cs_pipeline_spark.sources.avro_ocf import (
    _N_AVRO,
    _avro_meta,
    _row_vals,
    decode_avro_ocf,
    encode_avro_ocf,
)


def test_roundtrip_all_fixtures():
    for i in range(_N_AVRO):
        m = decode_avro_ocf(encode_avro_ocf(i))
        am = _avro_meta(i)
        n = am["n_rows"]
        assert m["n_blocks"] == am["n_blocks"]
        assert m["n_rows"] == n
        assert m["id_sum"] == sum(_row_vals(i, r)[0] for r in range(n))
        assert m["qx_sum"] == sum(
            int(_row_vals(i, r)[2] * 8) for r in range(n)
        )
        assert m["deflate"] == (1 if am["deflate"] else 0)


def test_sync_marker_mismatch_detected():
    payload = bytearray(encode_avro_ocf(0))
    # flip a byte in the LAST 16 bytes (the final block's sync)
    payload[-3] ^= 0xFF
    with pytest.raises(ValueError, match="sync"):
        decode_avro_ocf(bytes(payload))


def test_block_trailing_bytes_detected():
    # corrupt a block's declared row count: fewer rows decoded than
    # bytes present → trailing-bytes check trips (or varint desync)
    payload = bytearray(encode_avro_ocf(0))
    with pytest.raises(ValueError):
        decode_avro_ocf(bytes(payload[: len(payload) - 20]))


def test_unsupported_codec_rejected():
    payload = encode_avro_ocf(1).replace(b"deflate", b"snappy\x00", 1)
    with pytest.raises(ValueError):
        decode_avro_ocf(payload)


def test_registered_op(spark, sf_dir):
    from cs_pipeline_spark.sources.avro_ocf import scan_avro_blocks

    rows = {r.fname: r for r in scan_avro_blocks(spark, sf_dir).collect()}
    assert len(rows) == _N_AVRO
    for i in range(_N_AVRO):
        assert rows[f"part-{i:03d}.avro"].n_rows == _avro_meta(i)["n_rows"]


def test_sink_roundtrip(spark, sf_dir):
    from cs_pipeline_spark.sources.avro_ocf import sink_avro_roundtrip
    from cs_pipeline_spark.tables import load

    rows = {r.shard: r for r in sink_avro_roundtrip(spark, sf_dir).collect()}
    n_docs = load(spark, "documents", sf_dir).count()
    assert sum(r.n_rows for r in rows.values()) == n_docs
    for shard, r in rows.items():
        assert r.deflate == shard % 2
        assert r.n_blocks == (r.n_rows + 63) // 64
