"""Torrent metainfo decode (sources/torrent.py): bencode grammar,
canonical-form enforcement, piece verification."""

from __future__ import annotations

import pytest

from cs_pipeline_spark.sources.torrent import (
    _N_TORRENT,
    _PIECE_LEN,
    _payload_bytes,
    _payload_len,
    bdecode,
    bencode,
    decode_torrent,
    encode_torrent,
)


def test_bencode_roundtrip():
    cases = [0, -7, 123456, b"", b"spam", [1, b"a", [2]],
             {"a": 1, "b": [b"x"], "z": {"k": b"v"}}]
    for c in cases:
        v, end = bdecode(bencode(c))
        enc = bencode(c)
        assert end == len(enc)
        # dicts come back with byte keys
        if isinstance(c, dict):
            assert v == {k.encode(): _b(val) for k, val in c.items()}
        else:
            assert v == _b(c)


def _b(o):
    if isinstance(o, str):
        return o.encode()
    if isinstance(o, list):
        return [_b(e) for e in o]
    if isinstance(o, dict):
        return {k.encode() if isinstance(k, str) else k: _b(v)
                for k, v in o.items()}
    return o


def test_noncanonical_integers_rejected():
    for bad in (b"i01e", b"i-0e", b"ie", b"i-e", b"i1x2e"):
        with pytest.raises(ValueError):
            bdecode(bad)


def test_unsorted_dict_keys_rejected():
    # canonical form requires sorted keys; infohash identity depends
    # on it
    raw = b"d1:b1:x1:a1:ye"
    with pytest.raises(ValueError, match="sorted"):
        bdecode(raw)


def test_duplicate_dict_keys_rejected():
    raw = b"d1:a1:x1:a1:ye"
    with pytest.raises(ValueError, match="sorted"):
        bdecode(raw)


def test_verification_all_fixtures():
    for i in range(_N_TORRENT):
        m = decode_torrent(encode_torrent(i), _payload_bytes(i))
        exp_pieces = (_payload_len(i) + _PIECE_LEN - 1) // _PIECE_LEN
        assert m["n_pieces"] == exp_pieces
        assert m["pieces_ok"] == exp_pieces
        assert m["length_match"] == 1


def test_corrupt_payload_counted_not_raised():
    payload = bytearray(_payload_bytes(0))
    payload[10] ^= 0xFF  # corrupt piece 0
    m = decode_torrent(encode_torrent(0), bytes(payload))
    assert m["pieces_ok"] == m["n_pieces"] - 1
    assert m["length_match"] == 1


def test_short_payload_detected():
    m = decode_torrent(encode_torrent(0), _payload_bytes(0)[:-100])
    assert m["length_match"] == 0
    assert m["pieces_ok"] < m["n_pieces"]


def test_piece_count_crosscheck():
    # tamper the declared length so it disagrees with the piece table
    meta = bytearray(encode_torrent(0))
    n = _payload_len(0)
    idx = bytes(meta).find(b"6:lengthi%de" % n)
    assert idx > 0
    bad = bytes(meta).replace(b"6:lengthi%de" % n,
                              b"6:lengthi%de" % (n + _PIECE_LEN))
    with pytest.raises(ValueError, match="piece count"):
        decode_torrent(bad, _payload_bytes(0))


def test_registered_op(spark, sf_dir):
    from cs_pipeline_spark.sources.torrent import scan_torrent_manifest

    rows = {r.fname: r for r in
            scan_torrent_manifest(spark, sf_dir).collect()}
    assert len(rows) == _N_TORRENT
    for i in range(_N_TORRENT):
        got = rows[f"part-{i:03d}.torrent"]
        assert got.pieces_ok == got.n_pieces
        assert got.length == _payload_len(i)
