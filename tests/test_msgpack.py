"""MessagePack decode (sources/msgpack.py): header-family coverage,
minimal-canonical encoding, framing self-checks."""

from __future__ import annotations

import struct

import pytest

from cs_pipeline_spark.sources.msgpack import (
    _MR,
    _N_MSGPACK,
    _decode_obj,
    _enc_obj,
    _n_records,
    _rec_vals,
    decode_msgpack_stream,
    encode_msgpack_stream,
)


def _roundtrip(o):
    b = _enc_obj(o)
    r = _MR(b)
    got = _decode_obj(r)
    assert r.p == len(b), "decoder did not consume the whole encoding"
    return got


def test_scalar_families_roundtrip():
    cases = [
        0, 1, 127,                      # positive fixint
        128, 255,                       # uint8
        256, 65535,                     # uint16
        65536, 2**32 - 1,               # uint32
        2**32, 2**63 - 1,               # uint64
        -1, -32,                        # negative fixint
        -33, -128,                      # int8
        -129, -32768,                   # int16
        -32769, -2**31,                 # int32
        -2**31 - 1, -2**63,             # int64
        None, True, False,
        "", "a" * 31,                   # fixstr
        "b" * 32, "c" * 255,            # str8
        "d" * 256,                      # str16
        0.0, -1.5, 3.14159,             # float64
        b"", b"\x00\xff" * 100,         # bin8/bin16
    ]
    for c in cases:
        assert _roundtrip(c) == c, repr(c)


def test_container_families_roundtrip():
    assert _roundtrip([]) == []
    assert _roundtrip(list(range(15))) == list(range(15))
    big = list(range(100))              # array16
    assert _roundtrip(big) == big
    assert _roundtrip({"a": 1, "b": [2, {"c": None}]}) == \
        {"a": 1, "b": [2, {"c": None}]}
    bigmap = {f"k{j}": j for j in range(40)}  # map16
    assert _roundtrip(bigmap) == bigmap


def test_header_boundaries_in_fixture():
    """Record ids must actually cross fixint→uint8→uint16 and negs
    cross fixint→int8 — the boundary coverage the doc claims."""
    ids = [_rec_vals(0, r)[0] for r in range(_n_records(0))]
    assert any(v < 128 for v in ids)
    assert any(128 <= v <= 255 for v in ids)
    assert any(v > 255 for v in ids)
    negs = [_rec_vals(0, r)[1] for r in range(_n_records(0))]
    assert any(-32 <= v <= -1 for v in negs)
    assert any(v < -32 for v in negs)


def test_stream_roundtrip_census():
    for i in range(_N_MSGPACK):
        m = decode_msgpack_stream(encode_msgpack_stream(i))
        n = _n_records(i)
        assert m["n_records"] == n
        assert m["id_sum"] == sum(r * 181 + i for r in range(n))
        assert m["n_nil"] == sum(1 for r in range(n) if r % 7 == 0)


def test_reserved_header_rejected():
    with pytest.raises(ValueError, match="0xc1"):
        _decode_obj(_MR(b"\xc1"))


def test_ext_types_rejected():
    for h in (0xC7, 0xD4, 0xD8):
        with pytest.raises(ValueError, match="ext"):
            _decode_obj(_MR(bytes([h]) + b"\x00" * 20))


def test_truncation_rejected():
    payload = encode_msgpack_stream(0)
    for cut in (1, len(payload) // 2, len(payload) - 1):
        with pytest.raises(ValueError):
            decode_msgpack_stream(payload[:cut])


def test_non_finite_float_rejected():
    rec = _enc_obj({"id": 1, "x": 0.0})
    # patch the float64 payload to +inf
    inf = struct.pack(">d", float("inf"))
    patched = rec.replace(struct.pack(">d", 0.0), inf)
    with pytest.raises(ValueError, match="non-finite"):
        decode_msgpack_stream(patched)


def test_top_level_must_be_map():
    with pytest.raises(ValueError, match="top-level"):
        decode_msgpack_stream(_enc_obj([1, 2, 3]))


def test_registered_op(spark, sf_dir):
    from cs_pipeline_spark.sources.msgpack import scan_msgpack_records

    rows = {r.fname: r for r in
            scan_msgpack_records(spark, sf_dir).collect()}
    assert len(rows) == _N_MSGPACK
    for i in range(_N_MSGPACK):
        assert rows[f"part-{i:03d}.msgpack"].n_records == _n_records(i)
