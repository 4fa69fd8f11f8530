"""NPY decoder (sources/npy.py): np.load interop, the fortran-order
and v1/v2 header traps, registered op."""

from __future__ import annotations

import io
import struct

import numpy as np
import pytest

from cs_pipeline_spark.sources.npy import (
    _N_NPYS,
    _npy_meta,
    _npy_values,
    decode_npy_meta,
    encode_npy,
    scan_npy_header,
)


@pytest.mark.parametrize("i", range(_N_NPYS))
def test_numpy_load_interop(i):
    """numpy's own reader must reconstruct the same array — an
    independent implementation, not our formula."""
    arr = np.load(io.BytesIO(encode_npy(i)))
    assert (arr == _npy_values(i)).all()
    assert (arr.flags["F_CONTIGUOUS"] and not arr.flags["C_CONTIGUOUS"]) \
        == bool(_npy_meta(i)["fortran"]) or arr.shape[0] <= 1


def test_fortran_misread_would_change_checksum():
    """The position checksum MUST differ between C and F reads of the
    same buffer — that is the property that catches order bugs."""
    i = 1  # fortran fixture
    v = _npy_values(i)
    pos = np.arange(v.size).reshape(v.shape) + 1
    good = int((v * pos).sum())
    # misread: interpret the F-order buffer as C-order
    wrong = np.frombuffer(
        v.astype(_npy_meta(i)["dtype"]).tobytes(order="F"),
        dtype=_npy_meta(i)["dtype"],
    ).reshape(v.shape).astype(np.int64)
    bad = int((wrong * pos).sum())
    assert good != bad
    assert decode_npy_meta(encode_npy(i))["checksum"] == good


def test_size_mismatch_rejected():
    payload = encode_npy(0)
    with pytest.raises(ValueError, match="size"):
        decode_npy_meta(payload[:-3])


def test_eval_is_literal_only():
    """A header containing a call expression must be rejected, not
    executed."""
    payload = bytearray(encode_npy(2))
    at = payload.index(b"{'descr'")
    evil = b"__import__('os')"
    payload[at : at + len(evil)] = evil
    with pytest.raises(ValueError):
        decode_npy_meta(bytes(payload))


def test_registered_op(spark, sf_dir):
    rows = {r.fname: r for r in scan_npy_header(spark, sf_dir).collect()}
    assert len(rows) == _N_NPYS
    for i in range(_N_NPYS):
        v = _npy_values(i)
        r = rows[f"feat-{i:03d}.npy"]
        assert r.n_elems == v.size and r.val_sum == int(v.sum())
        pos = np.arange(v.size).reshape(v.shape) + 1
        assert r.checksum == int((v * pos).sum())
