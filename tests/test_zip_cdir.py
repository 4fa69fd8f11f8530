"""ZIP structural audit (sources/zip_cdir.py): EOCD/central/local
cross-checks, CRC verification over the repo's inflate."""

from __future__ import annotations

import struct

import pytest

from cs_pipeline_spark.sources.zip_cdir import (
    _N_ZIP,
    _member_bytes,
    _member_len,
    _n_zip_members,
    decode_zip_cdir,
    encode_zip_archive,
)


def test_roundtrip_all_fixtures():
    for i in range(_N_ZIP):
        m = decode_zip_cdir(encode_zip_archive(i))
        n = _n_zip_members(i)
        assert m["n_members"] == n
        assert m["crc_ok"] == n
        assert m["n_stored"] + m["n_deflated"] == n
        assert m["n_stored"] > 0 and m["n_deflated"] > 0
        assert m["out_len"] == sum(
            _member_len(i, s) for s in range(n)
        )
        assert m["byte_sum"] == sum(
            sum(_member_bytes(i, s)) for s in range(n)
        )


def test_eocd_with_comment_honored():
    """EOCD is variable-length; a trailing archive comment must not
    break the backward scan."""
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("a.txt", b"hello zip")
        zf.comment = b"archive-level comment"
    m = decode_zip_cdir(buf.getvalue())
    assert m["n_members"] == 1
    assert m["crc_ok"] == 1


def test_name_confusion_detected():
    """Central/local name disagreement (the zip-confusion class)
    must raise, not silently trust one side."""
    payload = bytearray(encode_zip_archive(0))
    # the LOCAL name is the first occurrence; the central copy comes
    # later — flip one byte of the local copy only
    name = b"data/member-0-0.txt"
    local_at = bytes(payload).find(name)
    central_at = bytes(payload).find(name, local_at + 1)
    assert 0 < local_at < central_at
    payload[local_at] ^= 0x01
    with pytest.raises(ValueError, match="disagreement"):
        decode_zip_cdir(bytes(payload))


def test_payload_tamper_fails_crc():
    payload = bytearray(encode_zip_archive(0))
    # corrupt a STORED member's data: find its local header and flip
    # a payload byte; CRC then mismatches (counted via crc_ok)
    m0 = decode_zip_cdir(bytes(payload))
    # flip one byte inside the first member's data region (after the
    # first local header's name)
    name = b"data/member-0-0.txt"
    data_at = bytes(payload).find(name) + len(name)
    payload[data_at + 10] ^= 0xFF
    try:
        m1 = decode_zip_cdir(bytes(payload))
        assert m1["crc_ok"] < m0["crc_ok"]
    except ValueError:
        pass  # deflated member may desync instead — also acceptable


def test_truncation_rejected():
    payload = encode_zip_archive(1)
    for cut in (4, 30, len(payload) // 2, len(payload) - 3):
        with pytest.raises(ValueError):
            decode_zip_cdir(payload[:cut])


def test_eocd_count_tamper_detected():
    payload = bytearray(encode_zip_archive(0))
    eocd = bytes(payload).rfind(b"PK\x05\x06")
    n = struct.unpack_from("<H", payload, eocd + 10)[0]
    struct.pack_into("<H", payload, eocd + 10, n + 1)
    struct.pack_into("<H", payload, eocd + 8, n + 1)
    with pytest.raises(ValueError):
        decode_zip_cdir(bytes(payload))


def test_registered_op(spark, sf_dir):
    from cs_pipeline_spark.sources.zip_cdir import scan_zip_central_dir

    rows = {r.fname: r for r in
            scan_zip_central_dir(spark, sf_dir).collect()}
    assert len(rows) == _N_ZIP
    for i in range(_N_ZIP):
        got = rows[f"part-{i:03d}.zip"]
        assert got.n_members == _n_zip_members(i)
        assert got.crc_ok == got.n_members
