"""SubRip cue parser (sources/srt.py) — pure-JVM text path: roundtrip
vs the fixture formula, reading-speed math, malformed-cue handling."""

from __future__ import annotations

from cs_pipeline_spark.sources.srt import (
    _N_SRTS,
    _srt_cues,
    encode_srt,
    scan_srt_cues,
)


def test_cues_match_formula(spark, sf_dir):
    rows = scan_srt_cues(spark, sf_dir).collect()
    by = {}
    for r in rows:
        by.setdefault(r.fname, {})[r.cue_idx] = r
    assert len(by) == _N_SRTS
    for f in range(_N_SRTS):
        cues = _srt_cues(f)
        got = by[f"cap-{f:03d}.srt"]
        assert len(got) == len(cues)
        for cue in cues:
            r = got[cue["idx"]]
            assert r.start_ms == cue["start_ms"]
            assert r.end_ms == cue["end_ms"]
            assert r.dur_ms == cue["end_ms"] - cue["start_ms"]
            assert r.n_lines == len(cue["lines"])
            n_chars = sum(len(x) for x in cue["lines"])
            assert r.n_chars == n_chars
            assert r.valid_times == 1
            assert r.cps_ppm == n_chars * 1000000 * 1000 // r.dur_ms


def test_malformed_time_line_keeps_row_with_null_times(
    spark, tmp_path
):
    """Text formats degrade row-by-row: a bad time line must yield a
    valid_times=0 row, not fail the file (module-docstring contract)."""
    import os

    d = tmp_path / "srt" / "real_srts"
    os.makedirs(d)
    good = encode_srt(0)
    bad = "1\nnot a time line\nhello world\n\n" + good
    (d / "cap-bad.srt").write_text(bad)
    # builder reads the scratch dir directly — point sf_dir at tmp
    from cs_pipeline_spark.sources.scans import _scratch

    real = _scratch(str(tmp_path / "srt"), "real_srts")
    os.makedirs(real, exist_ok=True)
    import shutil

    shutil.copy(d / "cap-bad.srt", real)
    rows = scan_srt_cues.__wrapped__(spark, str(tmp_path / "srt")).collect()
    flagged = [r for r in rows if r.valid_times == 0]
    assert len(flagged) == 1
    r = flagged[0]
    assert r.start_ms is None and r.end_ms is None and r.cps_ppm is None
    assert r.n_lines == 1 and r.n_chars == len("hello world")
    # the rest of the file still parsed
    assert sum(r.valid_times for r in rows) == len(_srt_cues(0))


def test_caption_align_asof_semantics(spark, sf_dir):
    """Every cue must anchor to the LATEST keyframe at or before its
    start — verified against an independent python as-of over the
    two fixture formulas."""
    from cs_pipeline_spark.sources.mp4 import _gop_meta
    from cs_pipeline_spark.sources.srt import (
        _ALIGN_N,
        _GOP_MOVIE_MS,
        mm_caption_align,
    )

    rows = {
        (r.pair_id, r.cue_idx): r
        for r in mm_caption_align(spark, sf_dir).collect()
    }
    total = 0
    for pid in range(_ALIGN_N):
        m = _gop_meta(pid)
        kfs = [
            (gi + 1, (k - 1) * _GOP_MOVIE_MS // m["n"])
            for gi, k in enumerate(m["keyframes"])
        ]
        for cue in _srt_cues(pid):
            total += 1
            r = rows[(pid, cue["idx"])]
            best = max(
                (kf for kf in kfs if kf[1] <= cue["start_ms"]),
                key=lambda kf: (kf[1], kf[0]),
            )
            assert (r.gop_idx, r.kf_pts_ms) == best, (pid, cue["idx"])
            assert r.seek_gap_ms == cue["start_ms"] - best[1]
    assert len(rows) == total
