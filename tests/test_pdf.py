"""PDF structure walker (sources/pdf.py): roundtrip vs fixture
formula, the 20-byte-entry and offset-resolution traps, malformed
ValueErrors, and the registered hash-checked op."""

from __future__ import annotations

import re

import pytest

from cs_pipeline_spark.sources.pdf import (
    _N_PDFS,
    _pdf_meta,
    decode_pdf_meta,
    encode_pdf,
    mm_decode_pdf_meta,
)


@pytest.mark.parametrize("i", range(_N_PDFS))
def test_pdf_roundtrip_every_fixture(i):
    m = _pdf_meta(i)
    got = decode_pdf_meta(encode_pdf(i))
    for k, v in m.items():
        assert got[k] == v, (i, k, got[k], v)


def test_pdf_bad_header_rejected():
    with pytest.raises(ValueError, match="header"):
        decode_pdf_meta(b"%PNG-1.4\n" + bytes(60))


def test_pdf_startxref_outside_file_rejected():
    payload = bytearray(encode_pdf(0))
    at = bytes(payload).rfind(b"startxref")
    end = bytes(payload).find(b"\n", at + 10)
    digits = end - (at + 10)
    payload[at + 10 : end] = b"9" * digits  # huge offset, same length
    with pytest.raises(ValueError, match="outside|misses"):
        decode_pdf_meta(bytes(payload))


def test_pdf_stale_xref_offset_fails_loudly():
    """A root offset landing on the wrong bytes must raise, never
    fall back to scanning."""
    payload = bytearray(encode_pdf(1))
    at = bytes(payload).find(b"xref")
    # entry for object 1 is the second 20-byte line after the header
    m = re.match(rb"xref\s+\d+\s+\d+\s", bytes(payload)[at : at + 40])
    grid = at + m.end() + 20  # skip the object-0 free entry
    payload[grid : grid + 10] = b"0000000003"  # points mid-header
    with pytest.raises(ValueError, match="misses"):
        decode_pdf_meta(bytes(payload))


def test_pdf_19_byte_entry_rejected():
    payload = encode_pdf(2)
    at = payload.find(b"xref")
    m = re.match(rb"xref\s+\d+\s+\d+\s", payload[at : at + 40])
    grid = at + m.end()
    # delete one byte inside the first entry: the grid desyncs
    mutated = payload[: grid + 5] + payload[grid + 6 :]
    with pytest.raises(ValueError, match="entry|trailer|truncated"):
        decode_pdf_meta(mutated)


def test_pdf_free_list_census():
    assert decode_pdf_meta(encode_pdf(0))["n_free"] == 2  # even: extra
    assert decode_pdf_meta(encode_pdf(1))["n_free"] == 1  # obj 0 only


def test_pdf_registered_op(spark, sf_dir):
    rows = {r.fname: r for r in mm_decode_pdf_meta(spark, sf_dir).collect()}
    assert len(rows) == _N_PDFS
    for i in range(_N_PDFS):
        m = _pdf_meta(i)
        r = rows[f"doc-{i:03d}.pdf"]
        for k, v in m.items():
            assert getattr(r, k) == v, (i, k)
