"""CBOR decode (sources/cbor.py): head grammar, indefinite-length
items, tags, float widths."""

from __future__ import annotations

import struct

import pytest

from cs_pipeline_spark.sources.cbor import (
    _CR,
    _N_CBOR,
    _decode_item,
    _enc_int,
    _enc_text,
    _head,
    _n_records,
    decode_cbor_stream,
    encode_cbor_stream,
)


def _one(b: bytes):
    r = _CR(b)
    v = _decode_item(r)
    assert r.p == len(b), "decoder did not consume the whole item"
    return v


def test_uint_head_boundaries():
    # inline / 1-byte / 2-byte / 4-byte / 8-byte heads
    for v, wire_len in [(0, 1), (23, 1), (24, 2), (255, 2), (256, 3),
                        (65535, 3), (65536, 5), (2**32 - 1, 5),
                        (2**32, 9)]:
        b = _enc_int(v)
        assert len(b) == wire_len, (v, b.hex())
        assert _one(b) == v


def test_negint_encoding():
    # CBOR negint encodes -1 - n
    assert _enc_int(-1) == b"\x20"
    assert _enc_int(-25) == b"\x38\x18"
    for v in (-1, -24, -25, -256, -257, -2**32 - 5):
        assert _one(_enc_int(v)) == v


def test_float_widths():
    assert _one(b"\xf9" + struct.pack(">e", 1.5)) == 1.5
    assert _one(b"\xfa" + struct.pack(">f", 2.25)) == 2.25
    assert _one(b"\xfb" + struct.pack(">d", 3.125)) == 3.125


def test_indefinite_text_reassembly():
    b = _enc_text("hello world", indefinite=True)
    assert b[0] == 0x7F and b[-1] == 0xFF
    assert _one(b) == "hello world"


def test_indefinite_array():
    b = bytes([4 << 5 | 31]) + _enc_int(1) + _enc_int(2) + b"\xff"
    assert _one(b) == [1, 2]


def test_tag_passthrough():
    b = _head(6, 1) + _enc_int(1_700_000_000)
    assert _one(b) == ("__tag__", 1, 1_700_000_000)


def test_simple_values():
    assert _one(b"\xf4") is False
    assert _one(b"\xf5") is True
    assert _one(b"\xf6") is None


def test_unexpected_break_rejected():
    with pytest.raises(ValueError, match="break"):
        _one(b"\xff")


def test_reserved_ai_rejected():
    for ai in (28, 29, 30):
        with pytest.raises(ValueError):
            _one(bytes([0 << 5 | ai]) + b"\x00" * 8)


def test_stream_roundtrip_census():
    for i in range(_N_CBOR):
        m = decode_cbor_stream(encode_cbor_stream(i))
        n = _n_records(i)
        assert m["n_records"] == n
        assert m["id_sum"] == sum(r * 211 + i for r in range(n))
        # one indefinite text per r%6==0 plus one indefinite array
        # per r%5==0
        assert m["n_indef"] == sum(
            (1 if r % 6 == 0 else 0) + (1 if r % 5 == 0 else 0)
            for r in range(n)
        )


def test_truncation_rejected():
    payload = encode_cbor_stream(0)
    for cut in (1, len(payload) // 2, len(payload) - 1):
        with pytest.raises(ValueError):
            decode_cbor_stream(payload[:cut])


def test_registered_op(spark, sf_dir):
    from cs_pipeline_spark.sources.cbor import scan_cbor_records

    rows = {r.fname: r for r in
            scan_cbor_records(spark, sf_dir).collect()}
    assert len(rows) == _N_CBOR
    for i in range(_N_CBOR):
        assert rows[f"part-{i:03d}.cbor"].n_records == _n_records(i)
