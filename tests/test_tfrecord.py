"""TFRecord walker (sources/tfrecord.py): Castagnoli+mask vectors,
full-coverage corruption detection, registered op."""

from __future__ import annotations

import struct

import pytest

from cs_pipeline_spark.sources.tfrecord import (
    _N_TFRS,
    _crc32c,
    _masked,
    _tfr_meta,
    decode_tfrecord_meta,
    encode_tfrecord,
    scan_tfrecord_meta,
)


def test_crc32c_known_vector():
    # the canonical Castagnoli check value
    assert _crc32c(b"123456789") == 0xE3069283


def test_mask_is_not_identity_and_invertible_range():
    crc = _crc32c(b"abc")
    m = _masked(crc)
    assert m != crc and 0 <= m < 1 << 32


@pytest.mark.parametrize("i", range(_N_TFRS))
def test_roundtrip(i):
    got = decode_tfrecord_meta(encode_tfrecord(i))
    want = _tfr_meta(i)
    for k in ("n_records", "payload_bytes", "min_record", "max_record"):
        assert got[k] == want[k], (i, k)


def test_every_payload_bit_is_covered():
    """Flipping ONE bit anywhere in any payload must be detected —
    the integrity property tar cannot give (header-only checksum)."""
    payload = bytearray(encode_tfrecord(1))
    # flip a bit in the middle of the 3rd record's payload
    at = len(payload) // 2
    payload[at] ^= 0x10
    with pytest.raises(ValueError, match="CRC"):
        decode_tfrecord_meta(bytes(payload))


def test_length_crc_validated_before_seek():
    payload = bytearray(encode_tfrecord(0))
    payload[0] ^= 0x01  # corrupt the first length frame
    with pytest.raises(ValueError, match="length CRC|truncated"):
        decode_tfrecord_meta(bytes(payload))


def test_registered_op(spark, sf_dir):
    rows = {r.fname: r for r in scan_tfrecord_meta(spark, sf_dir).collect()}
    assert len(rows) == _N_TFRS
    for i in range(_N_TFRS):
        m = _tfr_meta(i)
        r = rows[f"train-{i:03d}.tfrecord"]
        for k in ("n_records", "payload_bytes", "min_record",
                  "max_record"):
            assert getattr(r, k) == m[k], (i, k)
