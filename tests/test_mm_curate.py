"""mm_curate_e2e flagship: the four round-8-final rows (video +
FLAC + trim) must reconcile with their component ops standalone."""

from __future__ import annotations


def test_new_modality_rows_reconcile(spark, sf_dir):
    from cs_pipeline_spark.operators.multimodal import mm_curate_e2e
    from cs_pipeline_spark.sources.flac import _N_FLACS, _flac_meta
    from cs_pipeline_spark.sources.mp4 import (
        _N_MP4S,
        _mp4_meta,
        mm_video_keyframes,
    )
    from cs_pipeline_spark.sources.wav import mm_audio_silence_trim

    rows = {
        (r.modality, r.metric): r.value
        for r in mm_curate_e2e(spark, sf_dir).collect()
    }
    assert len(rows) == 26  # +6 provenance/HEVC rows (round 10)
    assert rows[("video", "hevc_clips")] == 6
    assert rows[("video", "hevc_10bit")] == 3  # Main10 on odd i
    assert rows[("provenance", "ai_generated")] == 4  # even prov pngs
    assert rows[("provenance", "tagged_tracks")] == 6
    assert rows[("provenance", "distinct_artists")] == 3
    assert rows[("video", "n_clips")] == _N_MP4S
    assert rows[("video", "total_ms")] == sum(
        _mp4_meta(i)["duration_ms"] for i in range(_N_MP4S)
    )
    gop = mm_video_keyframes(spark, sf_dir).collect()
    assert rows[("video", "keyframes")] == len(gop)
    assert rows[("video", "gop_bytes")] == sum(r.gop_bytes for r in gop)
    assert rows[("audio", "flac_clips")] == _N_FLACS
    assert rows[("audio", "flac_ms")] == sum(
        _flac_meta(i)["duration_ms"] for i in range(_N_FLACS)
    )
    trim = mm_audio_silence_trim(spark, sf_dir).collect()
    assert rows[("audio", "trimmed_windows")] == sum(
        r.leading_silence + r.trailing_silence for r in trim
    )
    assert rows[("audio", "kept_windows")] == sum(
        r.kept_windows for r in trim
    )
