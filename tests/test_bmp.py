"""BMP pixel decoder (sources/bmp.py): bottom-up + stride traps,
registered op."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from cs_pipeline_spark.sources.bmp import (
    _N_BMPS,
    _bmp_pixels,
    decode_bmp_meta,
    encode_bmp,
    mm_decode_bmp,
)


@pytest.mark.parametrize("i", range(_N_BMPS))
def test_roundtrip(i):
    v = _bmp_pixels(i).astype(np.int64)
    got = decode_bmp_meta(encode_bmp(i))
    pos = np.arange(v.size).reshape(v.shape) + 1
    assert got["val_sum"] == int(v.sum())
    assert got["checksum"] == int((v * pos).sum())


def test_topdown_misread_would_differ():
    """Reading bottom-up rows as top-down must change the checksum
    on every multi-row fixture — the property the checksum pins."""
    for i in range(_N_BMPS):
        v = _bmp_pixels(i).astype(np.int64)
        pos = np.arange(v.size).reshape(v.shape) + 1
        assert int((v * pos).sum()) != int((v[::-1] * pos).sum())


def test_negative_height_topdown_variant():
    payload = bytearray(encode_bmp(0))
    # flip to top-down: negate height, store rows already top-down
    w, h = struct.unpack("<ii", payload[18:26])
    payload[18:26] = struct.pack("<ii", w, -h)
    got = decode_bmp_meta(bytes(payload))
    v = _bmp_pixels(0).astype(np.int64)[::-1]  # rows now misordered
    pos = np.arange(v.size).reshape(v.shape) + 1
    assert got["checksum"] == int((v * pos).sum())


def test_unsupported_bpp_rejected():
    payload = bytearray(encode_bmp(1))
    payload[28:30] = struct.pack("<H", 24)
    with pytest.raises(ValueError, match="24-bit"):
        decode_bmp_meta(bytes(payload))


def test_registered_op(spark, sf_dir):
    rows = {r.fname: r for r in mm_decode_bmp(spark, sf_dir).collect()}
    assert len(rows) == _N_BMPS
    for i in range(_N_BMPS):
        v = _bmp_pixels(i).astype(np.int64)
        r = rows[f"img-{i:03d}.bmp"]
        assert r.n_pixels == v.size and r.val_sum == int(v.sum())
