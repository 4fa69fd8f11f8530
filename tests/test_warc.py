"""WARC record walker (sources/warc.py): roundtrip vs fixture
formula, the walk-by-Content-Length trap, malformed ValueErrors, and
the registered hash-checked op."""

from __future__ import annotations

import pytest

from cs_pipeline_spark.sources.warc import (
    _N_WARCS,
    _warc_meta,
    decode_warc_records,
    encode_warc,
    scan_warc_records,
)


@pytest.mark.parametrize("i", range(_N_WARCS))
def test_warc_roundtrip_every_fixture(i):
    m = _warc_meta(i)
    got = decode_warc_records(encode_warc(i))
    for k, v in m.items():
        assert got[k] == v, (i, k, got[k], v)


def test_warc_payload_contains_separator_but_walk_survives():
    """Every HTTP payload embeds CRLF CRLF — a scan-for-separator
    parser would split mid-payload; the Content-Length walk must not."""
    payload = encode_warc(0)
    first_hdr_end = payload.find(b"\r\n\r\n")
    body = payload[first_hdr_end + 4 :]
    assert b"\r\n\r\n" in body[:400]  # separators inside payload region
    assert decode_warc_records(payload)["n_records"] == \
        _warc_meta(0)["n_records"]


def test_warc_wrong_content_length_rejected():
    payload = bytearray(encode_warc(1))
    at = bytes(payload).find(b"Content-Length: ")
    d = at + len(b"Content-Length: ")
    payload[d] = ord("9")  # inflate the first record's length
    with pytest.raises(ValueError, match="separator|overruns"):
        decode_warc_records(bytes(payload))


def test_warc_bad_version_rejected():
    with pytest.raises(ValueError, match="version"):
        decode_warc_records(b"HTTP/1.1 200 OK\r\n\r\nnope\r\n\r\n")


def test_warc_registered_op(spark, sf_dir):
    rows = {r.fname: r for r in scan_warc_records(spark, sf_dir).collect()}
    assert len(rows) == _N_WARCS
    for i in range(_N_WARCS):
        m = _warc_meta(i)
        r = rows[f"crawl-{i:03d}.warc"]
        for k, v in m.items():
            assert getattr(r, k) == v, (i, k)
