"""Data-page decode (sources/parquet_pages.py): snappy, hybrid runs,
footer cross-check, corruption detection."""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cs_pipeline_spark.sources.parquet_footer import encode_parquet_tbl
from cs_pipeline_spark.sources.parquet_pages import (
    decode_parquet_column_pages,
    rle_bp_decode,
    snappy_decompress,
)


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=2000))
def test_snappy_roundtrip_vs_pyarrow(data):
    import pyarrow as pa

    comp = pa.compress(data, codec="snappy", asbytes=True)
    assert snappy_decompress(comp) == data


def test_decoded_sum_matches_formula():
    for i in range(4):
        m = decode_parquet_column_pages(encode_parquet_tbl(i))
        n = 1000 + 137 * i
        assert m["rows_decoded"] == m["rows_footer"] == n
        assert m["a_sum"] == 7 * (n * (n - 1) // 2) + i * n
        assert m["n_dict_pages"] == m["n_rgs"]


def test_page_corruption_detected():
    """Flipping bytes inside the page region (everything before the
    footer) must raise ValueError — never return a silently wrong
    census. The footer region starts at -8-footer_len."""
    base = bytearray(encode_parquet_tbl(2))
    flen = int.from_bytes(base[-8:-4], "little")
    page_region_end = len(base) - 8 - flen
    rng = random.Random(777)
    detected = 0
    for _ in range(60):
        mut = bytearray(base)
        pos = rng.randrange(4, page_region_end)
        mut[pos] ^= 0xFF
        try:
            m = decode_parquet_column_pages(bytes(mut))
        except ValueError:
            detected += 1
            continue
        # a flip in ANOTHER column's pages legitimately decodes; the
        # audited column's region must either raise or stay exact
        n = 1274
        if m["rows_decoded"] == n and m["rows_footer"] == n:
            continue
        detected += 1
    assert detected >= 10  # the audited column's region is ~1/3


def test_rle_bitpacked_padding_is_sliced():
    # 10 values bit-packed at width 3 → 2 groups (16 slots), 6 pad
    vals = [5, 2, 7, 1, 0, 3, 6, 4, 2, 1]
    bits = 0
    for k, v in enumerate(vals + [0] * 6):
        bits |= v << (k * 3)
    buf = bytes([2 << 1 | 1]) + bits.to_bytes(6, "little")
    out, p = rle_bp_decode(buf, 0, 3, 10)
    assert out == vals and p == len(buf)


def test_rle_run_overshoot_raises():
    # an RLE run claiming 100 values against count=5 must refuse
    buf = bytes([200 << 1 & 0xFF]) + b"\x01"
    with pytest.raises(ValueError):
        rle_bp_decode(bytes([100 << 1]) + b"\x01", 0, 1, 5)


def test_col_stats_match_formula():
    from cs_pipeline_spark.sources.parquet_pages import (
        decode_parquet_col_stats,
    )

    for i in range(4):
        n, rgs = 1000 + 137 * i, 256 + 32 * i
        rows = decode_parquet_col_stats(encode_parquet_tbl(i))
        assert len(rows) == (n + rgs - 1) // rgs
        for r in rows:
            g = r["row_group"]
            assert r["stat_min"] == g * rgs * 7 + i
            assert r["stat_max"] == (min(n, (g + 1) * rgs) - 1) * 7 + i
            assert r["null_count"] == 0
            assert r["prunable_ge_thresh"] == (
                1 if r["stat_max"] < 5000 else 0
            )


def test_string_pages_byte_mass():
    from cs_pipeline_spark.sources.parquet_pages import (
        decode_parquet_string_pages,
    )

    for i in range(4):
        n = 1000 + 137 * i
        m = decode_parquet_string_pages(encode_parquet_tbl(i))
        assert m["rows_decoded"] == m["rows_footer"] == n
        assert m["c_chars"] == sum(len(f"r{k % 50}") for k in range(n))
