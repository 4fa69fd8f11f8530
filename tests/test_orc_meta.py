"""ORC postscript/footer triage (sources/orc_meta.py)."""

from __future__ import annotations

from cs_pipeline_spark.sources.orc_meta import (
    decode_orc_postscript,
    encode_orc_meta,
    scan_orc_postscript,
)


def test_handcrafted_orc_roundtrip():
    for i in range(5):
        d = decode_orc_postscript(encode_orc_meta(i))
        n = 2 + i % 3
        assert d["n_stripes"] == n
        assert d["n_rows"] == d["stripe_rows"] == sum(
            100 + 10 * i + k for k in range(n)
        )
        assert d["rows_match"] == 1
        assert d["compression_kind"] == 0


def test_real_spark_orc_census(spark, sf_dir):
    rows = scan_orc_postscript(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.rows_match == 1
        assert r.n_stripes == 1
        assert r.compression_kind == 2  # snappy
        assert r.n_rows == r.stripe_rows > 0


def test_inconsistent_stripe_sum_flagged():
    """A footer declaring more rows than its stripes carry must flag
    rows_match=0 (stale-footer detection), not raise."""
    payload = bytearray(encode_orc_meta(1))
    # the footer's numberOfRows varint is the last field before the
    # postscript; rebuild with a wrong total instead of bit-surgery
    from cs_pipeline_spark.sources.orc_meta import (
        _CK_NONE,
        _pb_tag,
        _pb_uv,
    )

    stripes = b""
    off = 3
    rows = [50, 60]
    for rc in rows:
        s = (
            _pb_tag(1, 0) + _pb_uv(off)
            + _pb_tag(2, 0) + _pb_uv(10)
            + _pb_tag(3, 0) + _pb_uv(20)
            + _pb_tag(4, 0) + _pb_uv(5)
            + _pb_tag(5, 0) + _pb_uv(rc)
        )
        stripes += _pb_tag(3, 2) + _pb_uv(len(s)) + s
        off += 35
    footer = (
        _pb_tag(1, 0) + _pb_uv(3)
        + _pb_tag(2, 0) + _pb_uv(off)
        + stripes
        + _pb_tag(6, 0) + _pb_uv(sum(rows) + 7)  # stale total
    )
    ps = (
        _pb_tag(1, 0) + _pb_uv(len(footer))
        + _pb_tag(2, 0) + _pb_uv(_CK_NONE)
        + _pb_tag(8000, 2) + _pb_uv(3) + b"ORC"
    )
    payload = b"ORC" + bytes(off - 3) + footer + ps + bytes([len(ps)])
    d = decode_orc_postscript(payload)
    assert d["rows_match"] == 0
    assert d["stripe_rows"] == 110 and d["n_rows"] == 117


# ---------- AVC SPS (sources/mp4.py round-10 section) ----------


def test_sps_emulation_prevention_roundtrip():
    from cs_pipeline_spark.sources.mp4 import (
        _ebsp_to_rbsp,
        _rbsp_to_ebsp,
    )

    cases = [
        b"\x00\x00\x00\x00\x01",
        b"\x00\x00\x01\x02\x03",
        b"\xff\x00\x00\x02",
        b"\x00\x00",
        b"",
        bytes(range(256)),
    ]
    for rbsp in cases:
        ebsp = _rbsp_to_ebsp(rbsp)
        # escaped stream never contains 00 00 0x (x <= 3) at offsets
        for k in range(len(ebsp) - 2):
            if ebsp[k] == 0 and ebsp[k + 1] == 0:
                assert ebsp[k + 2] > 3 or ebsp[k + 2] == 3
        assert _ebsp_to_rbsp(ebsp) == rbsp


def test_sps_both_profile_branches(spark, sf_dir):
    from cs_pipeline_spark.sources.mp4 import mm_video_sps_meta

    rows = mm_video_sps_meta(spark, sf_dir).collect()
    profiles = {r.profile_idc for r in rows}
    assert profiles == {66, 100}  # baseline AND high layouts parsed
    for r in rows:
        assert r.width % 2 == 0 and r.height % 4 == 0
        assert r.n_sps == 1 and r.length_size == 4
