"""RFC 1952 gzip member decode (sources/gzip_members.py): header
fields, FHCRC/CRC32/ISIZE verification, stdlib interop."""

from __future__ import annotations

import gzip as _gzip
import struct
import zlib

import pytest

from cs_pipeline_spark.sources.gzip_members import (
    _N_GZ,
    _byte_at,
    _member_len,
    _n_members,
    decode_gzip_members,
    encode_gzip_members,
)


def test_roundtrip_all_fixtures():
    for i in range(_N_GZ):
        m = decode_gzip_members(encode_gzip_members(i))
        assert m["n_members"] == _n_members(i)
        assert m["out_len"] == sum(
            _member_len(i, s) for s in range(_n_members(i))
        )
        assert m["byte_sum"] == sum(
            _byte_at(i, s, r)
            for s in range(_n_members(i))
            for r in range(_member_len(i, s))
        )


def test_stdlib_decompresses_our_members():
    """Our hand-built headers must be valid to the reference reader."""
    for i in range(_N_GZ):
        payload = encode_gzip_members(i)
        out = _gzip.decompress(payload)  # handles multi-member
        assert len(out) == sum(
            _member_len(i, s) for s in range(_n_members(i))
        )


def test_we_decode_stdlib_members():
    """And stdlib-written members must parse in our walk."""
    data = b"interop" * 500
    payload = _gzip.compress(data, 7, mtime=1_700_000_000)
    m = decode_gzip_members(payload)
    assert m["n_members"] == 1
    assert m["out_len"] == len(data)
    assert m["mtime_sum"] == 1_700_000_000


def test_fhcrc_tamper_detected():
    payload = bytearray(encode_gzip_members(1))  # member s=0 has FHCRC
    idx = bytes(payload).find(b"orig-1-0.dat\x00")
    assert idx > 0
    payload[idx] ^= 0x01  # corrupt a header byte covered by FHCRC
    with pytest.raises(ValueError, match="FHCRC"):
        decode_gzip_members(bytes(payload))


def test_trailer_crc_tamper_detected():
    payload = bytearray(encode_gzip_members(0))
    payload[-5] ^= 0xFF  # inside the CRC32 trailer
    with pytest.raises(ValueError, match="CRC32|ISIZE"):
        decode_gzip_members(bytes(payload))


def test_isize_tamper_detected():
    payload = bytearray(encode_gzip_members(0))
    old = struct.unpack_from("<I", payload, len(payload) - 4)[0]
    struct.pack_into("<I", payload, len(payload) - 4, old + 1)
    with pytest.raises(ValueError, match="ISIZE"):
        decode_gzip_members(bytes(payload))


def test_fextra_chain_validated():
    # hand-build a member whose FEXTRA subfield chain overruns xlen
    hdr = bytearray(b"\x1f\x8b\x08\x04")
    hdr += struct.pack("<I", 0) + b"\x00\x03"
    bad_extra = b"XD" + struct.pack("<H", 9) + b"ab"  # claims 9, has 2
    hdr += struct.pack("<H", len(bad_extra)) + bad_extra
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    body = co.compress(b"x") + co.flush()
    payload = bytes(hdr) + body + struct.pack(
        "<II", zlib.crc32(b"x"), 1
    )
    with pytest.raises(ValueError, match="FEXTRA"):
        decode_gzip_members(payload)


def test_truncation_rejected():
    payload = encode_gzip_members(2)
    for cut in (1, 9, len(payload) // 2, len(payload) - 3):
        with pytest.raises(ValueError):
            decode_gzip_members(payload[:cut])


def test_registered_op(spark, sf_dir):
    from cs_pipeline_spark.sources.gzip_members import scan_gzip_headers

    rows = {r.fname: r for r in
            scan_gzip_headers(spark, sf_dir).collect()}
    assert len(rows) == _N_GZ
    for i in range(_N_GZ):
        assert rows[f"part-{i:03d}.gzm"].n_members == _n_members(i)
