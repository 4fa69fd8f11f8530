"""TAR (ustar) shard reader and MP3 frame walker (sources/tar.py,
sources/mp3.py): roundtrip vs fixture formulas, stdlib tarfile
cross-validation, the synchsafe/checksum branch traps, and the
registered hash-checked ops."""

from __future__ import annotations

import io
import struct
import tarfile

import pytest

from cs_pipeline_spark.sources.mp3 import (
    _N_MP3S,
    _mp3_meta,
    decode_mp3_meta,
    encode_mp3,
    mm_decode_mp3_meta,
)
from cs_pipeline_spark.sources.tar import (
    _N_TARS,
    _tar_members,
    decode_tar_members,
    encode_tar,
    scan_tar_members,
)

# ---------- TAR ----------


@pytest.mark.parametrize("i", range(_N_TARS))
def test_tar_matches_stdlib_tarfile(i):
    """Byte offsets and sizes must agree with python's own tar reader
    — an independent implementation, not our formula."""
    data = encode_tar(i)
    got = decode_tar_members(data)
    assert [(m["name"], m["size"]) for m in got] == _tar_members(i)
    with tarfile.open(fileobj=io.BytesIO(data)) as tf:
        std = [(m.name, m.size, m.offset) for m in tf.getmembers()]
    assert [
        (m["name"], m["size"], m["offset_blocks"] * 512) for m in got
    ] == std


def test_tar_checksum_mismatch_rejected():
    payload = bytearray(encode_tar(1))
    payload[0] ^= 0x01  # flip a name byte -> checksum no longer matches
    with pytest.raises(ValueError, match="checksum"):
        decode_tar_members(bytes(payload))


def test_tar_bad_magic_rejected():
    payload = bytearray(encode_tar(0))
    payload[257:262] = b"wrong"
    with pytest.raises(ValueError, match="magic"):
        decode_tar_members(bytes(payload))


def test_tar_missing_terminator_rejected():
    payload = encode_tar(2)
    with pytest.raises(ValueError, match="terminator"):
        decode_tar_members(payload[:-1024])


def test_tar_registered_op(spark, sf_dir):
    rows = scan_tar_members(spark, sf_dir).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) == _N_TARS
    for i in range(_N_TARS):
        ms = sorted(
            by_shard[f"shard-{i:03d}.tar"], key=lambda r: r.offset_blocks
        )
        assert [(m.name, m.size) for m in ms] == _tar_members(i)
        # offsets chain exactly: next member starts after header + data
        for a, b in zip(ms, ms[1:]):
            assert b.offset_blocks == a.offset_blocks + 1 + a.data_blocks


# ---------- MP3 ----------


@pytest.mark.parametrize("i", range(_N_MP3S))
def test_mp3_roundtrip_every_fixture(i):
    m = _mp3_meta(i)
    got = decode_mp3_meta(encode_mp3(i))
    for k in ("id3_bytes", "n_frames", "sample_rate", "audio_bytes",
              "bitrate_sum_kbps", "is_vbr", "duration_ms"):
        assert got[k] == m[k], (i, k, got[k], m[k])


def test_mp3_non_synchsafe_id3_rejected():
    payload = bytearray(encode_mp3(0))  # even -> has ID3v2
    payload[6] = 0x80  # high bit set: not synchsafe
    with pytest.raises(ValueError, match="synchsafe"):
        decode_mp3_meta(bytes(payload))


def test_mp3_lost_sync_rejected():
    payload = bytearray(encode_mp3(1))  # odd -> no ID3, frame at 0
    payload[0] = 0x00
    with pytest.raises(ValueError, match="sync"):
        decode_mp3_meta(bytes(payload))


def test_mp3_free_bitrate_rejected():
    payload = bytearray(encode_mp3(1))
    payload[2] &= 0x0F  # bitrate index -> 0 (free)
    with pytest.raises(ValueError, match="bitrate"):
        decode_mp3_meta(bytes(payload))


def test_mp3_truncated_final_frame_rejected():
    payload = encode_mp3(3)
    with pytest.raises(ValueError, match="truncated|sync"):
        decode_mp3_meta(payload[:-10])


def test_mp3_cbr_vs_vbr_flag():
    assert decode_mp3_meta(encode_mp3(3))["is_vbr"] == 0  # i%4==3: CBR
    assert decode_mp3_meta(encode_mp3(1))["is_vbr"] == 1


def test_mp3_registered_op(spark, sf_dir):
    rows = {r.fname: r for r in mm_decode_mp3_meta(spark, sf_dir).collect()}
    assert len(rows) == _N_MP3S
    for i in range(_N_MP3S):
        m = _mp3_meta(i)
        r = rows[f"track-{i:03d}.mp3"]
        for k in ("id3_bytes", "n_frames", "sample_rate", "duration_ms",
                  "is_vbr"):
            assert getattr(r, k) == m[k], (i, k)


def test_wds_samples_assembly(spark, sf_dir):
    from cs_pipeline_spark.sources.tar import _member_size, mm_wds_samples

    rows = mm_wds_samples(spark, sf_dir).collect()
    by = {(r.shard, r.sample_key): r for r in rows}
    assert len(by) == sum(3 + i for i in range(_N_TARS))
    for i in range(_N_TARS):
        for s in range(3 + i):
            r = by[(f"shard-{i:03d}.tar", f"sample-{s:03d}")]
            assert r.n_members == 3
            assert r.exts == "bin,cls,txt"
            assert r.sample_bytes == sum(
                _member_size(i, s, e) for e in ("txt", "cls", "bin")
            )


def test_wds_sink_roundtrip_interop(spark, sf_dir):
    """The written shards must parse with BOTH our walker (via the
    registered census) and stdlib tarfile, and member bodies must be
    the exact normalized document text."""
    import glob
    import io
    import tarfile

    from cs_pipeline_spark.sources.scans import _scratch
    from cs_pipeline_spark.sources.tar import sink_wds_shards

    rows = {r.shard: r for r in sink_wds_shards(spark, sf_dir).collect()}
    assert rows
    paths = sorted(glob.glob(_scratch(sf_dir, "wds_out") + "/*.tar"))
    assert len(paths) == len(rows)
    with open(paths[0], "rb") as fh:
        data = fh.read()
    with tarfile.open(fileobj=io.BytesIO(data)) as tf:
        members = tf.getmembers()
        assert len(members) == rows[0].n_members
        assert sum(m.size for m in members) == rows[0].payload_bytes
        first = tf.extractfile(members[0]).read()
        assert len(first) == members[0].size
