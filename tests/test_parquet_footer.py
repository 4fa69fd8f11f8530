"""Byte-level parquet footer decode (sources/parquet_footer.py):
thrift compact walk vs pyarrow's writer, cross-checks, error paths."""

from __future__ import annotations

import pytest

from cs_pipeline_spark.sources.parquet_footer import (
    _N_PQ,
    _TC,
    _pq_meta,
    decode_parquet_footer,
    encode_parquet_tbl,
)


def test_roundtrip_all_fixtures_vs_formula():
    for i in range(_N_PQ):
        m = _pq_meta(i)
        rows = decode_parquet_footer(encode_parquet_tbl(i))
        assert len(rows) == m["n_rgs"]
        assert sum(r["num_rows"] for r in rows) == m["n_rows"]
        for r in rows:
            exp = min(
                m["rg_size"], m["n_rows"] - r["row_group"] * m["rg_size"]
            )
            assert r["num_rows"] == exp
            assert r["n_chunks"] == m["n_cols"]
            assert r["values_total"] == exp * m["n_cols"]
            assert r["n_snappy_chunks"] == m["n_cols"]


def test_footer_matches_pyarrow_metadata():
    """Cross-check against pyarrow's own reader — two independent
    decoders of the same bytes must agree."""
    import io

    import pyarrow.parquet as pq

    payload = encode_parquet_tbl(2)
    meta = pq.ParquetFile(io.BytesIO(payload)).metadata
    rows = decode_parquet_footer(payload)
    assert len(rows) == meta.num_row_groups
    for r in rows:
        rg = meta.row_group(r["row_group"])
        assert r["num_rows"] == rg.num_rows
        assert r["n_chunks"] == rg.num_columns


def test_varint_zigzag():
    r = _TC(bytes([0xAC, 0x02]))  # varint 300
    assert r.varint() == 300
    r = _TC(bytes([0x03]))  # zigzag(3) = -2
    assert r.zigzag() == -2
    r = _TC(bytes([0x04]))  # zigzag(4) = 2
    assert r.zigzag() == 2
    with pytest.raises(ValueError, match="varint"):
        _TC(b"\x80" * 11).varint()


def test_bad_magic_and_length():
    with pytest.raises(ValueError, match="magic"):
        decode_parquet_footer(b"NOPE" + b"\x00" * 20 + b"NOPE")
    payload = bytearray(encode_parquet_tbl(0))
    payload[-8:-4] = (10**6).to_bytes(4, "little")  # length > file
    with pytest.raises(ValueError, match="footer length"):
        decode_parquet_footer(bytes(payload))


def test_rowgroup_sum_crosscheck_enforced():
    payload = bytearray(encode_parquet_tbl(0))
    # corrupt one byte mid-footer until the sum check (or a structural
    # check) trips — never a non-ValueError escape
    flen = int.from_bytes(payload[-8:-4], "little")
    start = len(payload) - 8 - flen
    tripped = 0
    for k in range(0, flen, 7):
        mut = bytearray(payload)
        mut[start + k] ^= 0x55
        try:
            decode_parquet_footer(bytes(mut))
        except ValueError:
            tripped += 1
    assert tripped > 0


def test_spark_op(spark, sf_dir):
    from cs_pipeline_spark.sources.parquet_footer import (
        scan_parquet_footer,
    )

    rows = scan_parquet_footer(spark, sf_dir).collect()
    assert len(rows) == sum(_pq_meta(i)["n_rgs"] for i in range(_N_PQ))
