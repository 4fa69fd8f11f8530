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


# ---------- gzip-member shards (CommonCrawl layout, round 9) ----------


def test_warc_gz_members_census_matches_plain():
    from cs_pipeline_spark.sources.warc import encode_warc_gz

    for i in range(3):
        plain = decode_warc_records(encode_warc(i))
        gz = decode_warc_records(encode_warc_gz(i))
        for k in _warc_meta(i):
            assert gz[k] == plain[k], (i, k)
        assert gz["n_gzip_members"] == _warc_meta(i)["n_records"]
        assert plain["n_gzip_members"] == 0


def test_warc_gz_truncated_member_rejected():
    from cs_pipeline_spark.sources.warc import encode_warc_gz

    payload = encode_warc_gz(1)
    with pytest.raises(ValueError, match="gzip|truncated"):
        decode_warc_records(payload[: len(payload) - 3])


def test_warc_gz_mixed_interleave():
    from cs_pipeline_spark.sources.warc import (
        _gzip_member,
        _record,
        encode_warc_gz,
    )

    # plain record followed by a gzip member followed by plain
    plain = _record("request", "http://x/a", b"GET /a HTTP/1.1\r\n\r\n")
    gz = _gzip_member(plain)
    m = decode_warc_records(plain + gz + plain)
    assert m["n_records"] == 3
    assert m["n_gzip_members"] == 1


def test_warc_gz_registered_op(spark, sf_dir):
    from cs_pipeline_spark.sources.warc import (
        _N_GZWARCS,
        scan_warc_gz_records,
    )

    rows = {
        r.fname: r for r in scan_warc_gz_records(spark, sf_dir).collect()
    }
    assert len(rows) == _N_GZWARCS
    for i in range(_N_GZWARCS):
        name = f"mix-{i:03d}.warc" + (".gz" if i % 2 == 1 else "")
        r = rows[name]
        m = _warc_meta(i)
        assert r.n_records == m["n_records"]
        assert r.n_gzip_members == (m["n_records"] if i % 2 else 0)


# ---------- CDX ranged fetch (round 9) ----------


def test_cdx_fetch_member_roundtrip():
    from cs_pipeline_spark.sources.warc import (
        _warc_gz_members,
        encode_warc_gz,
        fetch_cdx_member,
    )

    for i in (1, 3, 5):
        shard = encode_warc_gz(i)
        off = 0
        for rtype, url, blob in _warc_gz_members(i):
            if rtype == "response":
                m = fetch_cdx_member(shard, off, len(blob), url)
                p = int(url.rsplit("page", 1)[1])
                exp_status = 404 if (p + i) % 4 == 3 else 200
                assert m["status"] == exp_status
            off += len(blob)


def test_cdx_stale_index_detected():
    from cs_pipeline_spark.sources.warc import (
        _warc_gz_members,
        encode_warc_gz,
        fetch_cdx_member,
    )

    shard = encode_warc_gz(1)
    members = _warc_gz_members(1)
    off0 = len(members[0][2]) + len(members[1][2])  # first response
    rtype, url, blob = members[2]
    assert rtype == "response"
    # off-by-one offset → not a gzip member
    with pytest.raises(ValueError, match="gzip member|stale"):
        fetch_cdx_member(shard, off0 + 1, len(blob), url)
    # short length → member unterminated
    with pytest.raises(ValueError, match="member|stale"):
        fetch_cdx_member(shard, off0, len(blob) - 2, url)
    # long length → covers more than one member
    with pytest.raises(ValueError, match="exactly one member"):
        fetch_cdx_member(shard, off0, len(blob) + len(members[3][2]), url)
    # wrong URL → URI mismatch
    with pytest.raises(ValueError, match="URI mismatch"):
        fetch_cdx_member(shard, off0, len(blob), "http://example.com/nope")


def test_cdx_registered_op(spark, sf_dir):
    from cs_pipeline_spark.sources.warc import scan_cdx_ranged_fetch

    rows = scan_cdx_ranged_fetch(spark, sf_dir).collect()
    assert len(rows) == sum(3 + i for i in (1, 3, 5))
    assert {r.status for r in rows} == {200, 404}
