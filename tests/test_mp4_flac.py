"""MP4 box-tree and FLAC block-chain parsers (sources/mp4.py,
sources/flac.py): roundtrip vs the fixture formulas, the box-size /
endianness branch traps, malformed-input ValueErrors, and the
registered hash-checked ops."""

from __future__ import annotations

import struct

import pytest

from cs_pipeline_spark.sources.flac import (
    _N_FLACS,
    _flac_meta,
    decode_flac_meta,
    encode_flac,
    mm_decode_flac_meta,
)
from cs_pipeline_spark.sources.mp4 import (
    _FRAME_K,
    _N_MP4S,
    _mp4_meta,
    decode_mp4_meta,
    encode_mp4,
    mm_decode_mp4_meta,
    mm_frame_sample_decoded,
)

# ---------- MP4 ----------


@pytest.mark.parametrize("i", range(_N_MP4S))
def test_mp4_roundtrip_every_fixture(i):
    m = _mp4_meta(i)
    got = decode_mp4_meta(encode_mp4(i))
    for k, v in m.items():
        if k == "duration_ts":
            continue
        assert got[k] == v, (i, k, got[k], v)
    assert got["n_tracks"] == 1 + m["n_audio"] + m["n_text"]


def test_mp4_largesize_and_size0_mdat_counted():
    # i=2 writes mdat through the 64-bit largesize branch
    assert decode_mp4_meta(encode_mp4(2))["mdat_bytes"] == \
        _mp4_meta(2)["mdat_bytes"]
    # i=5 writes a size==0 mdat extending to EOF as the last box
    payload = encode_mp4(5)
    at = payload.index(b"mdat") - 4
    assert struct.unpack(">I", payload[at : at + 4])[0] == 0
    assert decode_mp4_meta(payload)["mdat_bytes"] == \
        _mp4_meta(5)["mdat_bytes"]


def test_mp4_not_ftyp_first_rejected():
    with pytest.raises(ValueError, match="ftyp"):
        decode_mp4_meta(struct.pack(">I", 16) + b"mdat" + bytes(20))


def test_mp4_box_overrun_rejected():
    payload = bytearray(encode_mp4(0))
    # inflate the moov box size so it claims bytes past EOF
    at = bytes(payload).index(b"moov") - 4
    payload[at : at + 4] = struct.pack(">I", len(payload) * 2)
    with pytest.raises(ValueError, match="overruns"):
        decode_mp4_meta(bytes(payload))


def test_mp4_truncated_largesize_rejected():
    payload = encode_mp4(2)
    at = payload.index(b"mdat") - 4  # size==1 header starts here
    with pytest.raises(ValueError, match="truncated|largesize"):
        decode_mp4_meta(payload[: at + 10])


def test_mp4_zero_timescale_rejected():
    payload = bytearray(encode_mp4(0))
    at = bytes(payload).index(b"mvhd")
    # v0 mvhd: timescale at body offset 12 → bytes at+4(ver/flags)+12
    payload[at + 4 + 12 : at + 4 + 16] = b"\x00\x00\x00\x00"
    with pytest.raises(ValueError, match="timescale"):
        decode_mp4_meta(bytes(payload))


def test_mp4_registered_op(spark, sf_dir):
    rows = {r.fname: r for r in mm_decode_mp4_meta(spark, sf_dir).collect()}
    assert len(rows) == _N_MP4S
    for i in range(_N_MP4S):
        m = _mp4_meta(i)
        r = rows[f"clip-{i:03d}.mp4"]
        for k in ("major_brand", "timescale", "duration_ms", "width",
                  "height", "video_codec", "sample_count", "mdat_bytes"):
            assert getattr(r, k) == m[k], (i, k)


def test_frame_sample_decoded_strata(spark, sf_dir):
    rows = mm_frame_sample_decoded(spark, sf_dir).collect()
    assert len(rows) == _N_MP4S * _FRAME_K
    by_file = {}
    for r in rows:
        by_file.setdefault(r.fname, []).append(r)
    for i in range(_N_MP4S):
        m = _mp4_meta(i)
        rs = sorted(by_file[f"clip-{i:03d}.mp4"], key=lambda r: r.frame_j)
        for j, r in enumerate(rs):
            assert r.frame_idx == m["sample_count"] * (2 * j + 1) // (
                2 * _FRAME_K
            )
            assert r.pts_ms == m["duration_ms"] * (2 * j + 1) // (
                2 * _FRAME_K
            )
        # monotone + within duration: the ranged-read invariants
        assert all(a.pts_ms < b.pts_ms for a, b in zip(rs, rs[1:]))
        assert rs[-1].pts_ms < m["duration_ms"]


# ---------- FLAC ----------


@pytest.mark.parametrize("i", range(_N_FLACS))
def test_flac_roundtrip_every_fixture(i):
    m = _flac_meta(i)
    got = decode_flac_meta(encode_flac(i))
    for k, v in m.items():
        assert got[k] == v, (i, k, got[k], v)


def test_flac_bad_magic_rejected():
    with pytest.raises(ValueError, match="magic"):
        decode_flac_meta(b"OggS" + bytes(40))


def test_flac_streaminfo_must_be_first():
    payload = bytearray(encode_flac(1))
    payload[4] = (payload[4] & 0x80) | 0x01  # retype block 0 → PADDING
    with pytest.raises(ValueError, match="STREAMINFO"):
        decode_flac_meta(bytes(payload))


def test_flac_block_overrun_rejected():
    payload = bytearray(encode_flac(0))
    payload[5:8] = (1 << 23).to_bytes(3, "big")  # inflate block length
    with pytest.raises(ValueError, match="overruns"):
        decode_flac_meta(bytes(payload))


def test_flac_vorbis_comment_overrun_rejected():
    """A comment length that claims bytes past its block must raise,
    not read into the next block."""
    payload = bytearray(encode_flac(1))  # n_comments = 1
    at = bytes(payload).index(b"TAG0=") - 4
    payload[at : at + 4] = struct.pack("<I", 1 << 20)
    with pytest.raises(ValueError, match="comment"):
        decode_flac_meta(bytes(payload))


def test_flac_registered_op(spark, sf_dir):
    rows = {r.fname: r for r in mm_decode_flac_meta(spark, sf_dir).collect()}
    assert len(rows) == _N_FLACS
    for i in range(_N_FLACS):
        m = _flac_meta(i)
        r = rows[f"clip-{i:03d}.flac"]
        for k, v in m.items():
            assert getattr(r, k) == v, (i, k)


def test_gop_census_matches_formula(spark, sf_dir):
    from cs_pipeline_spark.sources.mp4 import (
        _N_GOPS,
        _gop_meta,
        _gop_size,
        mm_video_keyframes,
    )

    rows = mm_video_keyframes(spark, sf_dir).collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(r.fname, {})[r.gop_idx] = r
    assert len(by_file) == _N_GOPS
    for i in range(_N_GOPS):
        m = _gop_meta(i)
        keys, n = m["keyframes"], m["n"]
        gops = by_file[f"gclip-{i:03d}.mp4"]
        assert len(gops) == len(keys)
        kset = set(keys)
        for gi, k in enumerate(keys, start=1):
            nxt = keys[gi] if gi < len(keys) else n + 1
            g = gops[gi]
            assert g.keyframe_sample == k
            assert g.gop_len == nxt - k
            assert g.gop_bytes == sum(
                _gop_size(i, s, s in kset) for s in range(k, nxt)
            )
        # an off-cadence scene cut produces a short GOP (when the cut
        # lands exactly on the cadence — i=0 — all GOPs stay regular)
        lens = [gops[gi].gop_len for gi in gops]
        if (m["cut"] - 1) % m["g"] != 0:
            assert min(lens) < m["g"]


def test_stss_and_stsz_tables_bounds_checked():
    import struct

    from cs_pipeline_spark.sources.mp4 import decode_mp4_meta, encode_mp4_gop

    payload = bytearray(encode_mp4_gop(1))
    at = bytes(payload).index(b"stss")
    # inflate the sync count so the table overruns the box
    payload[at + 8 : at + 12] = struct.pack(">I", 1 << 20)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="stss"):
        decode_mp4_meta(bytes(payload))


# ---------- MJPEG keyframe pixels (round 9) ----------


def test_mjpeg_keyframe_pixels_roundtrip():
    from cs_pipeline_spark.sources.mp4 import (
        _MJ_NBX,
        _MJ_NBY,
        _mjpeg_block,
        _mjpeg_n_samples,
        _N_MJPEGS,
        decode_mp4_keyframe_pixels,
        encode_mp4_mjpeg,
    )

    for i in range(_N_MJPEGS):
        rows = decode_mp4_keyframe_pixels(encode_mp4_mjpeg(i))
        n = _mjpeg_n_samples(i)
        assert [r["sample_idx"] for r in rows] == [
            s + 1 for s in range(n) if s % 2 == 0
        ]
        for r in rows:
            s = r["sample_idx"] - 1
            vs = [
                _mjpeg_block(i, s, bx, by)
                for by in range(_MJ_NBY)
                for bx in range(_MJ_NBX)
            ]
            assert r["mean_sum"] == sum(vs)
            assert r["is_blank"] == (1 if s == 2 else 0)
            assert (r["width"], r["height"]) == (_MJ_NBX * 8, _MJ_NBY * 8)


def test_mjpeg_only_sync_samples_decoded():
    from cs_pipeline_spark.sources.mp4 import (
        decode_mp4_keyframe_pixels,
        encode_mp4_mjpeg,
    )

    # video 1 has 5 samples; non-sync (even 1-based) must not appear
    rows = decode_mp4_keyframe_pixels(encode_mp4_mjpeg(1))
    assert {r["sample_idx"] for r in rows} == {1, 3, 5}


def test_mjpeg_missing_stss_rejected():
    from cs_pipeline_spark.sources.mp4 import (
        decode_mp4_keyframe_pixels,
        encode_mp4_mjpeg,
    )

    payload = bytearray(encode_mp4_mjpeg(0))
    at = bytes(payload).find(b"stss")
    payload[at : at + 4] = b"stsX"
    with pytest.raises(ValueError, match="stss|stsz|stco"):
        decode_mp4_keyframe_pixels(bytes(payload))


def test_mjpeg_corrupt_jpeg_sample_rejected():
    from cs_pipeline_spark.sources.mp4 import (
        decode_mp4_keyframe_pixels,
        encode_mp4_mjpeg,
    )

    payload = bytearray(encode_mp4_mjpeg(2))
    # corrupt the first JPEG's SOI inside mdat
    at = bytes(payload).find(b"\xff\xd8", 8)
    payload[at + 1] = 0x00
    with pytest.raises(ValueError):
        decode_mp4_keyframe_pixels(bytes(payload))
