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


# ---------- ADVICE r7 #3: malformed input → ValueError, fill bytes ----------


def test_truncated_entropy_lone_ff_raises_valueerror():
    """Payload ending in a lone 0xFF mid-entropy used to read
    payload[pos+1] out of range (IndexError); must be ValueError."""
    payload = encode_jpeg(2)
    sos = payload.index(b"\xff\xda")
    seglen = struct.unpack(">H", payload[sos + 2 : sos + 4])[0]
    cut = payload[: sos + 2 + seglen + 5] + b"\xff"
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg_meta(cut)


def test_truncated_segment_raises_valueerror():
    """A segment length running past the payload end used to slice
    short and struct.error on the SOF unpack; must be ValueError."""
    payload = encode_jpeg(1)
    sof = payload.index(b"\xff\xc2")
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg_meta(payload[: sof + 4])


def test_truncated_length_field_raises_valueerror():
    payload = encode_jpeg(0)
    app0 = payload.index(b"\xff\xe0")
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg_meta(payload[: app0 + 3])


def test_fill_bytes_between_markers_are_skipped():
    """ITU T.81 §B.1.1.2: any number of 0xFF fill bytes may pad the
    gap before a marker; they used to be misparsed as a 0xFF-marker
    segment. Parse must be identical with fills injected."""
    payload = encode_jpeg(3)
    want = decode_jpeg_meta(payload)
    sof = payload.index(b"\xff\xc2")  # image 3 is progressive
    padded = payload[:sof] + b"\xff\xff\xff" + payload[sof:]
    assert decode_jpeg_meta(padded) == want


def test_truncated_exif_raises_valueerror():
    payload = bytearray(encode_jpeg(1))
    app1 = payload.index(b"\xff\xe1")
    # shrink the declared APP1 length so the TIFF IFD is cut off
    # mid-entry while the segment itself stays in bounds
    exif_start = app1 + 4
    keep = 6 + 9  # 'Exif\0\0' + header(8) + 1 byte of entry count
    struct.pack_into(">H", payload, app1 + 2, keep + 2)
    rest = payload[exif_start + keep :]
    cut = bytes(payload[: exif_start + keep]) + rest
    with pytest.raises(ValueError, match="truncated|EXIF"):
        decode_jpeg_meta(cut)


# ---------- baseline DC luma decode (round 8) ----------

from cs_pipeline_spark.sources.jpeg import (  # noqa: E402
    _N_DC_IMGS,
    _dc_block_value,
    _dc_img_meta,
    decode_jpeg_dc,
    encode_jpeg_dc,
    mm_decode_jpeg_dc,
)


@pytest.mark.parametrize("i", range(_N_DC_IMGS))
def test_dc_roundtrip_every_fixture(i):
    m = _dc_img_meta(i)
    vals = [
        _dc_block_value(i, bx, by)
        for by in range(m["nby"])
        for bx in range(m["nbx"])
    ]
    got = decode_jpeg_dc(encode_jpeg_dc(i))
    assert got["width"] == m["nbx"] * 8 and got["height"] == m["nby"] * 8
    assert got["n_blocks"] == len(vals)
    assert got["mean_sum"] == sum(vals)
    assert got["checksum"] == sum(v * (k + 1) for k, v in enumerate(vals))


def test_dc_blank_flag_discriminates():
    flags = [decode_jpeg_dc(encode_jpeg_dc(i))["is_blank"] for i in range(_N_DC_IMGS)]
    assert flags[4] == 1 and sum(flags) == 1


def test_dc_decode_is_really_huffman():
    """Flipping one entropy byte changes decoded means or errors —
    proves the stats come from the bitstream, not the headers."""
    payload = bytearray(encode_jpeg_dc(1))
    sos = bytes(payload).index(b"\xff\xda")
    k = sos + 2 + struct.unpack(">H", payload[sos + 2 : sos + 4])[0] + 1
    want = decode_jpeg_dc(bytes(payload))
    payload[k] ^= 0x55
    try:
        got = decode_jpeg_dc(bytes(payload))
        assert got != want
    except ValueError:
        pass  # desynced bitstream is also a correct outcome


def test_dc_truncated_entropy_raises_valueerror():
    payload = encode_jpeg_dc(2)
    sos = payload.index(b"\xff\xda")
    with pytest.raises(ValueError, match="truncated|corrupt"):
        decode_jpeg_dc(payload[: sos + 8])


def test_dc_progressive_rejected():
    payload = bytearray(encode_jpeg_dc(0))
    sof = bytes(payload).index(b"\xff\xc0")
    payload[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline-only"):
        decode_jpeg_dc(bytes(payload))


def test_dc_registered_op(spark, sf_dir):
    rows = {r["fname"]: r for r in mm_decode_jpeg_dc(spark, sf_dir).collect()}
    assert len(rows) == _N_DC_IMGS
    assert rows["dc-004.jpg"]["is_blank"] == 1


# ---------- EXIF GPS sub-IFD (round 8) ----------

from cs_pipeline_spark.sources.jpeg import (  # noqa: E402
    _N_GPS_IMGS,
    _gps_meta,
    decode_jpeg_gps,
    encode_jpeg_gps,
    mm_exif_gps,
)


@pytest.mark.parametrize("i", range(_N_GPS_IMGS))
def test_gps_roundtrip(i):
    assert decode_jpeg_gps(encode_jpeg_gps(i)) == _gps_meta(i)


def test_gps_absent_is_clean_not_error():
    got = decode_jpeg_gps(encode_jpeg_gps(1))  # odd i → no GPS IFD
    assert got["has_gps"] == 0
    assert got["lat_udeg"] is None and got["lon_udeg"] is None
    assert got["orientation"] == _gps_meta(1)["orientation"]


def test_gps_sign_refs():
    g0 = decode_jpeg_gps(encode_jpeg_gps(0))  # i%4==0 → S, i%3==0 → W
    assert g0["lat_udeg"] <= 0 and g0["lon_udeg"] <= 0
    g2 = decode_jpeg_gps(encode_jpeg_gps(2))  # N, E
    assert g2["lat_udeg"] >= 0 and g2["lon_udeg"] >= 0


def test_gps_zero_denominator_rejected():
    payload = bytearray(encode_jpeg_gps(2))
    # lat rationals: last 48 bytes before EOI-side body are the two
    # 24-byte value blocks; find them via the APP1 structure
    app1 = bytes(payload).index(b"\xff\xe1")
    seglen = struct.unpack(">H", payload[app1 + 2 : app1 + 4])[0]
    vals_at = app1 + 4 + seglen - 2 - 48  # start of lat block
    struct.pack_into(">I", payload, vals_at + 4, 0)  # deg denominator 0
    with pytest.raises(ValueError, match="denominator"):
        decode_jpeg_gps(bytes(payload))


def test_gps_truncated_subifd_rejected():
    payload = encode_jpeg_gps(4)
    app1 = payload.index(b"\xff\xe1")
    gps_ifd_somewhere = app1 + 60
    with pytest.raises(ValueError, match="truncated|overruns"):
        decode_jpeg_gps(payload[:gps_ifd_somewhere])


def test_gps_registered_op(spark, sf_dir):
    rows = {r.fname: r for r in mm_exif_gps(spark, sf_dir).collect()}
    assert len(rows) == _N_GPS_IMGS
    for i in range(_N_GPS_IMGS):
        m = _gps_meta(i)
        r = rows[f"gps-{i:03d}.jpg"]
        assert r.has_gps == m["has_gps"]
        assert r.lat_udeg == m["lat_udeg"] and r.lon_udeg == m["lon_udeg"]
