"""Hand-rolled DEFLATE/zlib inflate (sources/deflate.py): bit-exact
output vs stdlib zlib, block-type coverage, adler32 + framing
tamper detection."""

from __future__ import annotations

import zlib

import pytest

from cs_pipeline_spark.sources.deflate import (
    _MODES,
    _N_ZFILES,
    _byte_at,
    _n_streams,
    _stream_len,
    decode_zlib_multistream,
    encode_zlib_multistream,
    inflate,
    inflate_zlib_stream,
)


def test_output_bit_exact_vs_stdlib():
    for i in range(_N_ZFILES):
        payload = encode_zlib_multistream(i)
        pos = 0
        s = 0
        while pos < len(payload):
            out, census, pos = inflate_zlib_stream(payload, pos)
            n = _stream_len(i, s)
            assert out == bytes(_byte_at(i, s, r) for r in range(n))
            s += 1
        assert s == _n_streams(i)
        assert pos == len(payload)


def test_all_three_block_types_covered():
    tot = {"n_stored": 0, "n_fixed": 0, "n_dynamic": 0}
    for i in range(_N_ZFILES):
        m = decode_zlib_multistream(encode_zlib_multistream(i))
        for k in tot:
            tot[k] += m[k]
    assert tot["n_stored"] > 0, "no stored blocks in the fixture"
    assert tot["n_fixed"] > 0, "no fixed-Huffman blocks in the fixture"
    assert tot["n_dynamic"] > 0, "no dynamic-Huffman blocks"


def test_inflate_matches_stdlib_on_random_payloads():
    import random

    rng = random.Random(1234)
    for trial in range(20):
        n = rng.randrange(1, 5000)
        # mix of runs and noise so matches occur
        data = bytes(
            rng.randrange(256) if rng.random() < 0.3 else (trial % 251)
            for _ in range(n)
        )
        for level in (1, 6, 9):
            stream = zlib.compress(data, level)
            out, _, end = inflate_zlib_stream(stream, 0)
            assert out == data
            assert end == len(stream)


def test_adler32_tamper_detected():
    payload = bytearray(encode_zlib_multistream(3))
    payload[-1] ^= 0xFF  # last adler byte
    with pytest.raises(ValueError, match="adler32"):
        decode_zlib_multistream(bytes(payload))


def test_stored_len_tamper_detected():
    data = b"\x00" * 100
    stream = zlib.compress(data, 0)  # stored blocks
    mutated = bytearray(stream)
    # stored LEN lives right after the 2-byte zlib header + 1 header
    # byte of the deflate block
    mutated[3] ^= 0x01
    with pytest.raises(ValueError):
        inflate_zlib_stream(bytes(mutated), 0)


def test_trailing_garbage_rejected():
    payload = encode_zlib_multistream(0) + b"\x01"
    with pytest.raises(ValueError):
        decode_zlib_multistream(payload)


def test_output_cap_enforced():
    # 1 MB of zeros compresses tiny but expands past a small cap
    stream = zlib.compress(b"\x00" * (1 << 20), 9)
    with pytest.raises(ValueError, match="output too large"):
        inflate(stream, 2, max_out=1 << 10)


def test_mode_cycle_is_exhaustive():
    # every (level, strategy) mode is hit by some (i, s) in the fixture
    seen = {(i + s) % len(_MODES)
            for i in range(_N_ZFILES) for s in range(_n_streams(i))}
    assert seen == set(range(len(_MODES)))


def test_registered_op(spark, sf_dir):
    from cs_pipeline_spark.sources.deflate import scan_deflate_streams

    rows = {r.fname: r for r in
            scan_deflate_streams(spark, sf_dir).collect()}
    assert len(rows) == _N_ZFILES
    for i in range(_N_ZFILES):
        got = rows[f"part-{i:03d}.zz"]
        assert got.n_streams == _n_streams(i)
        assert got.out_len == sum(
            _stream_len(i, s) for s in range(_n_streams(i))
        )
