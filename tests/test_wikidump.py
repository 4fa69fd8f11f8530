"""Wikipedia multistream dump (sources/wikidump.py): bz2 ranged
reads, stale-index detection, wikitext strip rules."""

from __future__ import annotations

import pytest

from cs_pipeline_spark.sources.wikidump import (
    _N_DUMPS,
    _dump_index_lines,
    _dump_n_pages,
    _page_plain,
    _page_text,
    decode_bz2_stream,
    decode_wikidump_pages,
    encode_wikidump,
)


def test_roundtrip_all_dumps():
    for i in range(_N_DUMPS):
        pages = decode_wikidump_pages(encode_wikidump(i))
        assert [p for p, _ in pages] == list(
            range(1, _dump_n_pages(i) + 1)
        )
        for pid, text in pages:
            assert text.decode() == _page_text(pid)


def test_index_driven_ranged_decode():
    i = 2
    shard = encode_wikidump(i)
    offs = sorted({int(ln.split(":")[0]) for ln in _dump_index_lines(i)})
    bounds = offs[1:] + [len(shard)]
    got = []
    for off, end in zip(offs, bounds):
        got.extend(decode_bz2_stream(shard, off, end))
    assert [p for p, _ in got] == list(range(1, _dump_n_pages(i) + 1))


def test_stale_index_detected():
    shard = encode_wikidump(1)
    offs = sorted({int(ln.split(":")[0]) for ln in _dump_index_lines(1)})
    with pytest.raises(ValueError, match="bz2 stream|stale"):
        decode_bz2_stream(shard, offs[0] + 1, offs[1])  # off-by-one
    with pytest.raises(ValueError, match="unterminated|truncated"):
        decode_bz2_stream(shard, offs[0], offs[1] - 2)  # short range
    if len(offs) > 2:  # range spanning two streams
        with pytest.raises(ValueError, match="boundary|stale"):
            decode_bz2_stream(shard, offs[0], offs[2])


def test_strip_rules_order():
    # bold before italic; piped before plain links; templates removed
    for pid in (1, 2, 9, 10):
        assert _page_plain(pid)  # formula exists for both parities


def test_registered_ops(spark, sf_dir):
    from cs_pipeline_spark.sources.wikidump import (
        scan_bz2_multistream,
        text_wiki_markup_strip,
    )

    census = scan_bz2_multistream(spark, sf_dir).collect()
    assert sum(r.n_pages for r in census) == sum(
        _dump_n_pages(i) for i in range(_N_DUMPS)
    )
    plain = {
        (r.fname, r.pid): r.plain
        for r in text_wiki_markup_strip(spark, sf_dir).collect()
    }
    for i in range(_N_DUMPS):
        for pid in range(1, _dump_n_pages(i) + 1):
            assert plain[(f"dump-{i:03d}.xml.bz2", pid)] == \
                _page_plain(pid)
