"""WAV decoder (sources/wav.py): RIFF chunk walk, PCM sample stats,
pad-byte alignment, malformed-input errors, and the registered ops."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from cs_pipeline_spark.sources.wav import (
    _CHUNK_AMS,
    _N_WAVS,
    _samples,
    _wav_meta,
    decode_wav,
    encode_wav,
    mm_audio_chunk_decoded,
    mm_decode_wav,
)


@pytest.mark.parametrize("i", range(_N_WAVS))
def test_roundtrip_every_fixture(i):
    m = _wav_meta(i)
    v = _samples(i)
    got = decode_wav(encode_wav(i))
    assert got["sample_rate"] == m["sample_rate"]
    assert got["channels"] == m["channels"]
    assert got["bits"] == m["bits"]
    assert got["n_frames"] == m["n_frames"]
    assert got["duration_ms"] == m["n_frames"] * 1000 // m["sample_rate"]
    assert got["n_samples"] == v.size
    assert got["amp_sum"] == int(v.sum())
    assert got["amp_min"] == int(v.min())
    assert got["amp_max"] == int(v.max())
    assert got["checksum"] == int((v * (np.arange(v.size) + 1)).sum())


def test_odd_list_chunk_forces_pad_byte():
    """Clip 0 carries the 13-byte LIST chunk: its on-disk chunk body is
    padded to 14; a parser advancing by raw size desyncs and fails."""
    payload = encode_wav(0)
    at = payload.index(b"LIST")
    size = struct.unpack("<I", payload[at + 4 : at + 8])[0]
    assert size % 2 == 1  # odd body...
    assert payload[at + 8 + size] == 0  # ...followed by the pad byte
    assert decode_wav(payload)["n_frames"] == _wav_meta(0)["n_frames"]


def test_both_sample_widths_covered():
    assert decode_wav(encode_wav(0))["bits"] == 8
    assert decode_wav(encode_wav(1))["bits"] == 16


def test_not_riff_rejected():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS" + bytes(40))


def test_truncated_riff_size_rejected():
    payload = encode_wav(1)
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(payload[: len(payload) // 2])


def test_truncated_chunk_rejected():
    payload = bytearray(encode_wav(2))
    at = bytes(payload).index(b"data")
    # inflate the data chunk's declared size past the payload end but
    # shrink the RIFF size to keep the outer check satisfied
    struct.pack_into("<I", payload, at + 4, 1 << 30)
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(bytes(payload))


def test_non_pcm_rejected():
    payload = bytearray(encode_wav(1))
    at = bytes(payload).index(b"fmt ")
    struct.pack_into("<H", payload, at + 8, 3)  # IEEE float format tag
    with pytest.raises(ValueError, match="non-PCM"):
        decode_wav(bytes(payload))


def test_data_before_fmt_rejected():
    with pytest.raises(ValueError, match="before fmt"):
        decode_wav(
            b"RIFF"
            + struct.pack("<I", 12)
            + b"WAVE"
            + b"data"
            + struct.pack("<I", 0)
        )


def test_registered_decode_matches_formula(spark, sf_dir):
    rows = {
        r["fname"]: r for r in mm_decode_wav(spark, sf_dir).collect()
    }
    assert len(rows) == _N_WAVS
    for i in range(_N_WAVS):
        r = rows[f"clip-{i:03d}.wav"]
        v = _samples(i)
        assert r["amp_sum"] == int(v.sum())
        assert r["checksum"] == int((v * (np.arange(v.size) + 1)).sum())


def test_chunk_plan_covers_decoded_durations(spark, sf_dir):
    chunks = mm_audio_chunk_decoded(spark, sf_dir).collect()
    by_file: dict[str, list] = {}
    for r in chunks:
        by_file.setdefault(r["fname"], []).append(r)
    assert len(by_file) == _N_WAVS
    for i in range(_N_WAVS):
        m = _wav_meta(i)
        dur = m["n_frames"] * 1000 // m["sample_rate"]
        cs = sorted(by_file[f"clip-{i:03d}.wav"], key=lambda r: r["chunk_idx"])
        assert len(cs) == (dur + _CHUNK_AMS - 1) // _CHUNK_AMS
        assert sum(r["chunk_len_ms"] for r in cs) == dur
        assert all(r["chunk_len_ms"] > 0 for r in cs)


# ---------- framed energy features (round 8) ----------

from cs_pipeline_spark.sources.wav import (  # noqa: E402
    _N_EWAVS,
    _esamples,
    _ewav_meta,
    decode_wav_frames,
    encode_wav_energy,
    mm_audio_energy,
)


@pytest.mark.parametrize("i", range(_N_EWAVS))
def test_energy_roundtrip(i):
    m = _ewav_meta(i)
    v = _esamples(i).reshape(m["n_frames"], m["channels"])
    rows = decode_wav_frames(encode_wav_energy(i))
    win = m["win"]
    assert len(rows) == (m["n_frames"] + win - 1) // win
    for r in rows:
        f = r["frame_idx"]
        block = v[f * win : (f + 1) * win]
        assert r["energy"] == int((block * block).sum())
        assert r["peak"] == int(np.abs(block).max())
        assert r["is_silence"] == (1 if np.abs(block).max() == 0 else 0)
        # crossings recomputed independently: consecutive frames of the
        # same channel, both inside window f
        prod = block[:-1] * block[1:]
        assert r["zcr"] == int((prod < 0).sum())


def test_energy_silence_plant_every_fifth_frame():
    rows = decode_wav_frames(encode_wav_energy(2))
    flags = [r["is_silence"] for r in rows]
    assert all(f == 1 for i, f in enumerate(flags) if i % 5 == 4)
    assert all(f == 0 for i, f in enumerate(flags) if i % 5 != 4)
    assert any(r["zcr"] > 0 for r in rows)  # the formula does cross zero


def test_energy_registered_op(spark, sf_dir):
    rows = mm_audio_energy(spark, sf_dir).collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(r["fname"], []).append(r)
    assert len(by_file) == _N_EWAVS
    for i in range(_N_EWAVS):
        m = _ewav_meta(i)
        got = by_file[f"eclip-{i:03d}.wav"]
        assert len(got) == (m["n_frames"] + m["win"] - 1) // m["win"]
        assert sum(r["n_samples"] for r in got) == m["n_frames"] * m["channels"]


def test_silence_trim_matches_independent_islands(spark, sf_dir):
    """mm_audio_silence_trim's run census must equal a pure-python
    islands computation over the fixture silence pattern."""
    import numpy as np

    from cs_pipeline_spark.sources.wav import (
        _N_SWAVS,
        _swav_meta,
        _swav_silent,
        mm_audio_silence_trim,
    )

    rows = {
        r.fname: r for r in mm_audio_silence_trim(spark, sf_dir).collect()
    }
    assert len(rows) == _N_SWAVS
    for i in range(_N_SWAVS):
        m = _swav_meta(i)
        f = np.arange(m["n_windows"])
        silent = _swav_silent(i, f, m)
        runs = []
        k = 0
        while k < len(silent):
            if silent[k]:
                j = k
                while j < len(silent) and silent[j]:
                    j += 1
                runs.append((k, j - k))
                k = j
            else:
                k += 1
        r = rows[f"sclip-{i:03d}.wav"]
        assert r.n_windows == m["n_windows"]
        assert r.silent_windows == int(silent.sum())
        assert r.n_runs == len(runs)
        assert r.longest_run == max(ln for _, ln in runs)
        lead = next((ln for st, ln in runs if st == 0), 0)
        trail = next(
            (ln for st, ln in runs if st + ln == m["n_windows"]), 0
        )
        assert r.leading_silence == lead
        assert r.trailing_silence == trail
        assert r.kept_windows == m["n_windows"] - lead - trail


def test_silence_trim_run_structure_varies():
    """The fixtures must exercise leading runs, trailing runs, and
    multi-window interior runs — otherwise the islands logic is
    untested against its own edge cases."""
    import numpy as np

    from cs_pipeline_spark.sources.wav import (
        _N_SWAVS,
        _swav_meta,
        _swav_silent,
    )

    any_lead = any_trail = any_long = False
    for i in range(_N_SWAVS):
        m = _swav_meta(i)
        f = np.arange(m["n_windows"])
        s = _swav_silent(i, f, m)
        if s[0]:
            any_lead = True
        if s[-1]:
            any_trail = True
        run = best = 0
        for x in s:
            run = run + 1 if x else 0
            best = max(best, run)
        if best >= 3:
            any_long = True
    assert any_lead and any_trail and any_long


# ---------- spectral features (round 9) ----------


def test_spectral_frames_count_and_band_separation():
    import math

    import numpy as np

    from cs_pipeline_spark.sources.wav import (
        _SPEC_BANDS,
        _SPEC_FRAME,
        _spec_tables,
        wav_spectral_rows,
    )

    for i in range(3):
        rows = wav_spectral_rows(encode_wav(i))
        assert len(rows) == _wav_meta(i)["n_frames"] // _SPEC_FRAME
        for r in rows:
            assert r["centroid"] is None or (
                _SPEC_BANDS[0] <= r["centroid"] <= _SPEC_BANDS[-1]
            )
    # a pure k=16 tone must put (almost) all power in the 16 band:
    # build a synthetic 256-frame mono 16-bit WAV of cos(2π·16·j/256)
    qc, qs = _spec_tables()
    j = np.arange(256)
    tone = np.floor(
        100 * np.cos(math.pi * 16 * j / 128.0) + 0.5
    ).astype("<i2")
    import struct as st

    fmt = st.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + st.pack("<I", len(fmt)) + fmt
        + b"data" + st.pack("<I", 512) + tone.tobytes()
    )
    payload = b"RIFF" + st.pack("<I", len(body)) + body
    (row,) = wav_spectral_rows(payload)
    assert row["e_b16"] > 100 * max(row["e_b4"], row["e_b64"])
    assert abs(row["centroid"] - 16.0) < 0.1


def test_spectral_tail_frames_dropped():
    from cs_pipeline_spark.sources.wav import wav_spectral_rows

    rows = wav_spectral_rows(encode_wav(0))  # 2000 frames → 7 full
    assert [r["frame"] for r in rows] == list(range(2000 // 256))
