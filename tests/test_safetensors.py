"""safetensors header walker (sources/safetensors.py): roundtrip,
the offset-discipline invariant, malformed ValueErrors, registered op."""

from __future__ import annotations

import json
import struct

import pytest

from cs_pipeline_spark.sources.safetensors import (
    _N_STS,
    _st_tensors,
    decode_safetensors_meta,
    encode_safetensors,
    scan_safetensors_meta,
)


@pytest.mark.parametrize("i", range(_N_STS))
def test_roundtrip(i):
    got = decode_safetensors_meta(encode_safetensors(i))
    want = _st_tensors(i)
    assert [(g["name"], g["dtype"], g["params"]) for g in got] == [
        (w["name"], w["dtype"], w["params"]) for w in want
    ]


def _mutate_header(i, fn):
    payload = encode_safetensors(i)
    hlen = struct.unpack("<Q", payload[:8])[0]
    header = json.loads(payload[8 : 8 + hlen])
    fn(header)
    hjson = json.dumps(header, sort_keys=True).encode()
    return struct.pack("<Q", len(hjson)) + hjson + payload[8 + hlen :]


def test_overlapping_offsets_rejected():
    def overlap(h):
        h["layer1.weight"]["data_offsets"][0] -= 1
        h["layer1.weight"]["data_offsets"][1] -= 1

    with pytest.raises(ValueError, match="contiguous|disagree"):
        decode_safetensors_meta(_mutate_header(0, overlap))


def test_shape_dtype_span_mismatch_rejected():
    def lie(h):
        h["layer0.weight"]["shape"][0] += 1  # span no longer matches

    with pytest.raises(ValueError, match="disagree"):
        decode_safetensors_meta(_mutate_header(1, lie))


def test_blob_gap_rejected():
    """Removing a tensor from the header leaves unowned blob bytes."""
    def drop(h):
        del h["layer2.weight"]

    with pytest.raises(ValueError, match="mismatch|contiguous"):
        decode_safetensors_meta(_mutate_header(2, drop))


def test_header_not_json_rejected():
    payload = bytearray(encode_safetensors(0))
    payload[9] = 0x00
    with pytest.raises(ValueError, match="JSON"):
        decode_safetensors_meta(bytes(payload))


def test_registered_op(spark, sf_dir):
    rows = scan_safetensors_meta(spark, sf_dir).collect()
    by = {}
    for r in rows:
        by.setdefault(r.fname, []).append(r)
    assert len(by) == _N_STS
    for i in range(_N_STS):
        want = _st_tensors(i)
        got = sorted(by[f"ckpt-{i:03d}.safetensors"],
                     key=lambda r: r.offset)
        assert len(got) == len(want)
        off = 0
        for g, w in zip(got, want):
            assert (g.name, g.dtype, g.params, g.bytes) == (
                w["name"], w["dtype"], w["params"], w["bytes"]
            )
            assert g.offset == off
            off += w["bytes"]
