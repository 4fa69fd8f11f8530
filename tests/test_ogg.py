"""Ogg/Opus page walker (sources/ogg.py): roundtrip vs fixture
formula, the forward-CRC and lacing-continuation traps, malformed
ValueErrors, and the registered hash-checked op."""

from __future__ import annotations

import struct
import zlib

import pytest

from cs_pipeline_spark.sources.ogg import (
    _N_OGGS,
    _ogg_crc,
    _ogg_meta,
    decode_ogg_meta,
    encode_ogg,
    mm_decode_ogg_meta,
)


@pytest.mark.parametrize("i", range(_N_OGGS))
def test_ogg_roundtrip_every_fixture(i):
    m = _ogg_meta(i)
    got = decode_ogg_meta(encode_ogg(i))
    for k in ("n_pages", "n_audio_packets", "channels", "pre_skip",
              "input_rate", "audio_bytes", "duration_ms"):
        assert got[k] == m[k], (i, k, got[k], m[k])


def test_ogg_crc_is_not_zlib_crc32():
    """The forward-polynomial CRC must differ from zlib's reflected
    crc32 on real data — using the wrong one is the classic bug."""
    data = b"OggS\x00\x02" + bytes(range(40))
    assert _ogg_crc(data) != zlib.crc32(data)


def test_ogg_crc_mismatch_rejected():
    payload = bytearray(encode_ogg(1))
    # flip one payload byte of the first audio page: its CRC breaks
    payload[-3] ^= 0x55
    with pytest.raises(ValueError, match="CRC"):
        decode_ogg_meta(bytes(payload))


def test_ogg_bad_capture_rejected():
    with pytest.raises(ValueError, match="capture"):
        decode_ogg_meta(b"RIFF" + bytes(40))


def test_ogg_missing_eos_rejected():
    payload = encode_ogg(0)
    # cut the final (EOS) page off: find its last OggS header
    at = payload.rfind(b"OggS")
    with pytest.raises(ValueError, match="EOS|truncated"):
        decode_ogg_meta(payload[:at])


def test_ogg_lacing_continuation_present():
    """Fixture packets cross 255 bytes, so lacing tables must contain
    255 continuation values — pinning that the census counts packet
    TERMINATIONS, not lacing slots."""
    payload = encode_ogg(0)
    at = payload.rfind(b"OggS")
    n_seg = payload[at + 26]
    lacing = payload[at + 27 : at + 27 + n_seg]
    assert 255 in lacing
    assert n_seg > sum(1 for v in lacing if v < 255)


def test_ogg_registered_op(spark, sf_dir):
    rows = {r.fname: r for r in mm_decode_ogg_meta(spark, sf_dir).collect()}
    assert len(rows) == _N_OGGS
    for i in range(_N_OGGS):
        m = _ogg_meta(i)
        r = rows[f"voice-{i:03d}.opus"]
        for k in ("n_pages", "n_audio_packets", "channels", "pre_skip",
                  "input_rate", "duration_ms"):
            assert getattr(r, k) == m[k], (i, k)
