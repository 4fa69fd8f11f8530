"""WebP container parser (sources/webp.py): all three variants'
dimension encodings, alpha/animation flags, pad bytes, malformed
ValueErrors, and the registered op."""

from __future__ import annotations

import struct

import pytest

from cs_pipeline_spark.sources.webp import (
    _N_WEBPS,
    _webp_meta,
    decode_webp_meta,
    encode_webp,
    mm_decode_webp_meta,
)


@pytest.mark.parametrize("i", range(_N_WEBPS))
def test_roundtrip_every_fixture(i):
    assert decode_webp_meta(encode_webp(i)) == _webp_meta(i)


def test_all_three_variants_covered():
    fmts = {decode_webp_meta(encode_webp(i))["format"] for i in range(3)}
    assert fmts == {"lossy", "lossless", "extended"}


def test_vp8l_bit_packing_is_lsb_first():
    """width-1 occupies the LOW 14 bits — a parser shifting MSB-first
    would swap width/height on any non-square image."""
    m = decode_webp_meta(encode_webp(1))  # lossless, 25x17
    assert (m["width"], m["height"]) == (25, 17)


def test_bad_start_code_rejected():
    payload = bytearray(encode_webp(0))  # lossy
    at = bytes(payload).index(b"\x9d\x01\x2a")
    payload[at] = 0x00
    with pytest.raises(ValueError, match="start code"):
        decode_webp_meta(bytes(payload))


def test_truncated_chunk_rejected():
    payload = bytearray(encode_webp(2))
    at = bytes(payload).index(b"VP8X")
    struct.pack_into("<I", payload, at + 4, 1 << 24)
    with pytest.raises(ValueError, match="truncated"):
        decode_webp_meta(bytes(payload))


def test_not_webp_rejected():
    with pytest.raises(ValueError, match="WEBP"):
        decode_webp_meta(b"RIFF" + struct.pack("<I", 4) + b"WAVE")


def test_registered_op(spark, sf_dir):
    rows = {r.fname: r for r in mm_decode_webp_meta(spark, sf_dir).collect()}
    assert len(rows) == _N_WEBPS
    for i in range(_N_WEBPS):
        m = _webp_meta(i)
        r = rows[f"pic-{i:03d}.webp"]
        for k, v in m.items():
            assert getattr(r, k) == v, (i, k)
