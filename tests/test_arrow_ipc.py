"""Arrow IPC file decode (sources/arrow_ipc.py): hand-walked
flatbuffers footer/message layer, framing validation, null-count
cross-check, value census against the fixture formula."""

from __future__ import annotations

import struct

import pytest

from cs_pipeline_spark.sources.arrow_ipc import (
    _N_ARROW,
    _row_vals,
    decode_arrow_file,
    encode_arrow_ipc,
)


def _expected(i: int) -> dict:
    n = 200 + 61 * i
    rows = [_row_vals(i, r) for r in range(n)]
    return {
        "n_batches": (n + 56) // 57,
        "n_rows": n,
        "n_cols": 4,
        "n_nulls": sum(sum(v is None for v in row) for row in rows),
        "id_sum": sum(r[0] for r in rows if r[0] is not None),
        "qx_sum": sum(int(r[1] * 8) for r in rows if r[1] is not None),
        "s_chars": sum(len(r[2]) for r in rows if r[2] is not None),
        "b_true": sum(1 for r in rows if r[3] is True),
    }


def test_roundtrip_all_fixtures():
    for i in range(_N_ARROW):
        assert decode_arrow_file(encode_arrow_ipc(i)) == _expected(i)


def test_bad_magic_rejected():
    payload = bytearray(encode_arrow_ipc(0))
    payload[0] ^= 0xFF
    with pytest.raises(ValueError, match="magic"):
        decode_arrow_file(bytes(payload))


def test_null_count_cross_check_trips():
    """Flipping one validity bit must trip the recount-vs-declared
    check (the framing contract that makes the census trustworthy)."""
    payload = bytearray(encode_arrow_ipc(0))
    # first batch body starts right after the schema message; rather
    # than compute offsets, flip bits until the decoder objects with
    # the null-count message (skipping flips that break elsewhere)
    seen = False
    for pos in range(300, 900):
        mutated = bytearray(payload)
        mutated[pos] ^= 0x01
        try:
            decode_arrow_file(bytes(mutated))
        except ValueError as e:
            if "null_count" in str(e):
                seen = True
                break
    assert seen, "no byte flip tripped the validity/null_count check"


def test_truncation_rejected():
    payload = encode_arrow_ipc(1)
    for cut in (10, len(payload) // 2, len(payload) - 7):
        with pytest.raises(ValueError):
            decode_arrow_file(payload[:cut])


def test_huge_declared_batch_length_rejected():
    """A flipped RecordBatch.length must fail fast, not allocate an
    nrows-sized mask (the empty-validity all-valid path)."""
    payload = bytearray(encode_arrow_ipc(0))
    # find a plausible i64 equal to 57 (first batch length) in the
    # first message region and blow it up
    idx = bytes(payload).find(struct.pack("<q", 57))
    assert idx > 0
    payload[idx : idx + 8] = struct.pack("<q", 1 << 40)
    with pytest.raises(ValueError):
        decode_arrow_file(bytes(payload))


def test_registered_op(spark, sf_dir):
    from cs_pipeline_spark.sources.arrow_ipc import scan_arrow_ipc

    rows = {r.fname: r for r in scan_arrow_ipc(spark, sf_dir).collect()}
    assert len(rows) == _N_ARROW
    for i in range(_N_ARROW):
        exp = _expected(i)
        got = rows[f"part-{i:03d}.arrow"]
        assert got.n_rows == exp["n_rows"]
        assert got.n_nulls == exp["n_nulls"]
        assert got.id_sum == exp["id_sum"]


# ---------- STREAM format ----------


def test_stream_roundtrip():
    from cs_pipeline_spark.sources.arrow_ipc import (
        _N_ARROW_STREAM,
        _STREAM_BATCH,
        _stream_rows,
        _stream_vals,
        decode_arrow_stream,
        encode_arrow_stream,
    )

    for i in range(_N_ARROW_STREAM):
        m = decode_arrow_stream(encode_arrow_stream(i))
        n = _stream_rows(i)
        rows = [_stream_vals(i, r) for r in range(n)]
        assert m["n_batches"] == (n + _STREAM_BATCH - 1) // _STREAM_BATCH
        assert m["n_rows"] == n
        assert m["id_sum"] == sum(r[0] for r in rows if r[0] is not None)
        assert m["b_true"] == sum(1 for r in rows if r[3] is True)


def test_stream_missing_eos_rejected():
    from cs_pipeline_spark.sources.arrow_ipc import (
        decode_arrow_stream,
        encode_arrow_stream,
    )

    payload = encode_arrow_stream(0)
    with pytest.raises(ValueError, match="end-of-stream"):
        decode_arrow_stream(payload[:-8])  # drop the EOS marker


def test_stream_schema_must_come_first():
    from cs_pipeline_spark.sources.arrow_ipc import (
        decode_arrow_stream,
        encode_arrow_stream,
    )

    payload = encode_arrow_stream(0)
    # skip the schema message: find the second continuation marker
    second = payload.find(b"\xff\xff\xff\xff", 4)
    assert second > 0
    with pytest.raises(ValueError, match="Schema"):
        decode_arrow_stream(payload[second:])


def test_stream_registered_op(spark, sf_dir):
    from cs_pipeline_spark.sources.arrow_ipc import (
        _N_ARROW_STREAM,
        _stream_rows,
        scan_arrow_stream,
    )

    rows = {r.fname: r for r in
            scan_arrow_stream(spark, sf_dir).collect()}
    assert len(rows) == _N_ARROW_STREAM
    for i in range(_N_ARROW_STREAM):
        assert rows[f"part-{i:03d}.arrows"].n_rows == _stream_rows(i)
