"""SQLite file decode (sources/sqlite_db.py): b-tree walk, record
serial types, rowid aliasing, structural pins."""

from __future__ import annotations

import struct

import pytest

from cs_pipeline_spark.sources.sqlite_db import (
    _N_SQLITE,
    _PAGE_SIZE,
    _SQLiteFile,
    _doc_vals,
    _n_rows,
    _record,
    _varint,
    decode_sqlite_db,
    encode_sqlite_db,
)


def test_varint_vectors():
    # 1-byte, 2-byte, and the 9-byte (8-bit tail) forms
    assert _varint(b"\x00", 0) == (0, 1)
    assert _varint(b"\x7f", 0) == (127, 1)
    assert _varint(b"\x81\x00", 0) == (128, 2)
    nine = b"\xff" * 8 + b"\xff"
    v, p = _varint(nine, 0)
    assert p == 9 and v == (1 << 64) - 1


def test_roundtrip_all_fixtures():
    for i in range(_N_SQLITE):
        m = decode_sqlite_db(encode_sqlite_db(i))
        n = _n_rows(i)
        assert m["page_size"] == _PAGE_SIZE
        assert m["n_tables"] == 2
        assert m["n_rows"] == n
        assert m["id_sum"] == sum(_doc_vals(i, r)[0] for r in range(n))
        assert m["qx_sum"] == sum(
            int(_doc_vals(i, r)[2] * 8) for r in range(n)
        )
        assert m["big_sum"] == sum(
            _doc_vals(i, r)[5] for r in range(n)
        )
        assert m["n_flag_null"] == sum(
            1 for r in range(n) if r % 5 == 3
        )


def test_btree_has_interior_levels():
    """The page-size pragma must force a real recursive walk: the
    docs root page must be an INTERIOR (0x05) page."""
    data = encode_sqlite_db(0)
    db = _SQLiteFile(data)
    root = None
    for _rowid, payload in db.walk_table(1):
        vals = _record(payload)
        if vals[0] == "table" and vals[1] == "docs":
            root = vals[3]
    assert root is not None
    pg = db._page(root)
    assert pg[0] == 0x05, "docs b-tree has no interior level"


def test_big_column_crosses_int_width_boundary():
    """Rows must hit BOTH the 6-byte and 8-byte serial int types."""
    data = encode_sqlite_db(0)
    db = _SQLiteFile(data)
    tables = {}
    for _rowid, payload in db.walk_table(1):
        vals = _record(payload)
        if vals[0] == "table":
            tables[vals[1]] = vals[3]
    widths = set()
    for _rowid, payload in db.walk_table(tables["docs"]):
        hlen, p = _varint(payload, 0)
        stypes = []
        while p < hlen:
            st, p = _varint(payload, p)
            stypes.append(st)
        widths.add(stypes[5])  # big column's serial type
    assert {5, 6} <= widths, widths  # 6-byte AND 8-byte ints


def test_bad_magic_rejected():
    data = bytearray(encode_sqlite_db(0))
    data[0] ^= 0xFF
    with pytest.raises(ValueError, match="magic"):
        decode_sqlite_db(bytes(data))


def test_truncation_rejected():
    data = encode_sqlite_db(0)
    for cut in (50, 150, len(data) // 2):
        with pytest.raises(ValueError):
            decode_sqlite_db(data[:cut])


def test_page_cycle_bounded():
    """An interior page pointing at itself must die on the depth cap,
    not recurse forever."""
    data = bytearray(encode_sqlite_db(0))
    db = _SQLiteFile(bytes(data))
    # find the docs interior root and patch its right-most pointer to
    # itself
    tables = {}
    for _rowid, payload in db.walk_table(1):
        vals = _record(payload)
        if vals[0] == "table":
            tables[vals[1]] = vals[3]
    root = tables["docs"]
    off = (root - 1) * db.page_size
    assert data[off] == 0x05
    struct.pack_into(">I", data, off + 8, root)
    with pytest.raises(ValueError):
        decode_sqlite_db(bytes(data))


def test_registered_op(spark, sf_dir):
    from cs_pipeline_spark.sources.sqlite_db import scan_sqlite_db

    rows = {r.fname: r for r in scan_sqlite_db(spark, sf_dir).collect()}
    assert len(rows) == _N_SQLITE
    for i in range(_N_SQLITE):
        got = rows[f"part-{i:03d}.db"]
        assert got.n_rows == _n_rows(i)
        assert got.n_tables == 2
