"""xz container walk (sources/xz_container.py): spec walk, CRC64-XZ
vector, per-block check verification, tamper detection."""

from __future__ import annotations

import lzma
import struct

import pytest

from cs_pipeline_spark.sources.xz_container import (
    _N_XZ,
    _byte_at,
    _n_streams,
    _stream_len,
    crc64_xz,
    decode_xz_container,
    encode_xz_multistream,
)


def test_crc64_xz_vectors():
    assert crc64_xz(b"123456789") == 0x995DC9BBDF1939FA
    assert crc64_xz(b"") == 0
    # incremental == one-shot is NOT how this api composes (init/
    # xorout fold in per call) — pin the one-shot contract instead
    assert crc64_xz(b"xz container") == crc64_xz(b"xz container")


def test_roundtrip_all_fixtures():
    for i in range(_N_XZ):
        m = decode_xz_container(encode_xz_multistream(i))
        assert m["n_streams"] == _n_streams(i)
        assert m["n_blocks"] == _n_streams(i)
        assert m["out_len"] == sum(
            _stream_len(i, s) for s in range(_n_streams(i))
        )
        assert m["byte_sum"] == sum(
            _byte_at(i, s, r)
            for s in range(_n_streams(i))
            for r in range(_stream_len(i, s))
        )
        assert m["n_crc32"] + m["n_crc64"] + m["n_sha256"] == \
            m["n_streams"]


def test_all_check_types_covered():
    tot = {"n_crc32": 0, "n_crc64": 0, "n_sha256": 0}
    for i in range(_N_XZ):
        m = decode_xz_container(encode_xz_multistream(i))
        for k in tot:
            tot[k] += m[k]
    assert all(v > 0 for v in tot.values()), tot


def test_stream_padding_honored():
    payload = encode_xz_multistream(0) + b"\x00" * 8
    m = decode_xz_container(payload)
    assert m["n_streams"] == 1


def test_payload_tamper_fails_block_check():
    """Flip one compressed-payload byte: either lzma refuses the
    stream or the per-block check field mismatches — never a clean
    pass."""
    payload = bytearray(encode_xz_multistream(2))  # sha256 stream
    payload[40] ^= 0x01  # inside the block's compressed data
    with pytest.raises(ValueError):
        decode_xz_container(bytes(payload))


def test_check_field_tamper_detected():
    # CRC64 stream: the 8-byte check sits right before the index
    payload = bytearray(lzma.compress(
        b"q" * 500, format=lzma.FORMAT_XZ, check=lzma.CHECK_CRC64))
    idx = bytes(payload).rfind(b"\x00\x01")  # index indicator region
    assert idx > 0
    payload[idx - 3] ^= 0xFF  # a check-field byte
    with pytest.raises(ValueError):
        decode_xz_container(bytes(payload))


def test_footer_flags_disagreement_detected():
    payload = bytearray(encode_xz_multistream(0))  # CRC32 stream
    # footer stream flags are the 2 bytes before the trailing "YZ"
    assert payload[-2:] == bytearray(b"YZ")
    payload[-3] = 0x04  # claim CRC64 in the footer only
    # footer CRC32 now mismatches (it covers the flags) → ValueError
    with pytest.raises(ValueError):
        decode_xz_container(bytes(payload))


def test_truncation_rejected():
    payload = encode_xz_multistream(1)
    for cut in (5, 30, len(payload) // 2, len(payload) - 1):
        with pytest.raises(ValueError):
            decode_xz_container(payload[:cut])


def test_index_size_crosscheck():
    """The index's uncompressed sizes must equal the decoded output
    length — corrupt the backward-size pointer and the walk dies."""
    payload = bytearray(encode_xz_multistream(0))
    off = len(payload) - 8  # backward size field
    old = struct.unpack_from("<I", payload, off)[0]
    struct.pack_into("<I", payload, off, old + 1)
    with pytest.raises(ValueError):
        decode_xz_container(bytes(payload))


def test_registered_op(spark, sf_dir):
    from cs_pipeline_spark.sources.xz_container import scan_xz_container

    rows = {r.fname: r for r in
            scan_xz_container(spark, sf_dir).collect()}
    assert len(rows) == _N_XZ
    for i in range(_N_XZ):
        assert rows[f"part-{i:03d}.xz"].n_streams == _n_streams(i)
