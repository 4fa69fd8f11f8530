"""JPEG header parser (sources/jpeg.py): marker walk, EXIF byte
orders, entropy stuffing/RST handling, malformed-input errors, and
the registered hash-checked op."""

from __future__ import annotations

import struct

import pytest

from cs_pipeline_spark.sources.jpeg import (
    _N_IMGS,
    _img_meta,
    decode_jpeg_meta,
    encode_jpeg,
    mm_decode_jpeg_meta,
)


@pytest.mark.parametrize("i", range(_N_IMGS))
def test_roundtrip_every_fixture(i):
    assert decode_jpeg_meta(encode_jpeg(i)) == _img_meta(i)


def test_both_exif_byte_orders_covered():
    # odd i → little-endian TIFF, even i → big-endian; both must
    # appear in the fixture sweep or the parser branch is untested
    assert b"II" in encode_jpeg(1) and b"MM" in encode_jpeg(0)
    assert decode_jpeg_meta(encode_jpeg(1))["orientation"] == 4
    assert decode_jpeg_meta(encode_jpeg(0))["orientation"] == 1


def test_entropy_len_is_unstuffed():
    """Raw entropy bytes exceed entropy_len whenever plain data holds
    0xFF (always, by fixture construction) — a naive byte count would
    differ."""
    for i in range(_N_IMGS):
        payload = encode_jpeg(i)
        m = decode_jpeg_meta(payload)
        # locate SOS, count raw bytes to EOI
        sos = payload.index(b"\xff\xda")
        seglen = struct.unpack(">H", payload[sos + 2 : sos + 4])[0]
        raw = payload[sos + 2 + seglen : -2]
        assert len(raw) > m["entropy_len"]  # stuffing and/or RST bytes
        assert (
            len(raw)
            == m["entropy_len"]
            + raw.count(b"\xff\x00")
            + 2 * m["n_rst"]
        )


def test_missing_soi_rejected():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_meta(b"\x00\x00garbage")


def test_marker_misalignment_rejected():
    payload = bytearray(encode_jpeg(1))
    payload[2] = 0x00  # APP0 marker prefix destroyed
    with pytest.raises(ValueError, match="misalignment"):
        decode_jpeg_meta(bytes(payload))


def test_bad_exif_rejected():
    payload = bytearray(encode_jpeg(2))
    k = payload.index(b"Exif\x00\x00") + 6
    payload[k : k + 2] = b"XX"  # clobber the TIFF byte-order mark
    with pytest.raises(ValueError, match="byte-order"):
        decode_jpeg_meta(bytes(payload))


def test_registered_op_matches_formula(spark, sf_dir):
    rows = {r.fname: r for r in mm_decode_jpeg_meta(spark, sf_dir).collect()}
    assert len(rows) == _N_IMGS
    for i in range(_N_IMGS):
        m = _img_meta(i)
        r = rows[f"img-{i:03d}.jpg"]
        for k, v in m.items():
            assert getattr(r, k) == v, (i, k)
