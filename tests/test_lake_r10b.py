"""Round-10 second wave: Hudi timeline, Iceberg position deletes,
parquet page index, zstd frames, MKV metadata, Delta deletion
vectors. The oracle gate hash-checks totals; these tests pin the
SEMANTIC branch points the hashes alone could miss (replace-beats-
newer-slice, sequence-gate rejection, partial trailing pages,
writer independence via the reference zstd decoder)."""

from __future__ import annotations

import pyarrow as pa

from cs_pipeline_spark.registry import queries


def _rows(spark, sf_dir, op):
    return queries()[op](spark, sf_dir).collect()


def test_hudi_head_snapshot_semantics(spark, sf_dir):
    from cs_pipeline_spark.sources.hudi_timeline import (
        _BASE_INSTANT,
        _REPL_IDX,
    )

    rows = {r.instant: r for r in _rows(spark, sf_dir,
                                        "scan_hudi_timeline")}
    # pending instant (idx 6) must not appear
    assert set(rows) == {_BASE_INSTANT + i for i in range(_REPL_IDX + 1)}
    head = rows[_BASE_INSTANT + _REPL_IDX]
    prev = rows[_BASE_INSTANT + _REPL_IDX - 1]
    # replace kills 2 groups, writes 2 -> group count unchanged
    assert head.n_file_groups == prev.n_file_groups
    # fg-1-0 was upserted at commit 3 (slice sz 2300); at v=4 the
    # group count is 15 creates... instead pin byte deltas: head
    # swaps out fg-0-0 (latest sz 1000) + fg-1-0 (latest upsert sz
    # 2300) for the clustered 5000+6000
    assert head.total_bytes == prev.total_bytes - 1000 - 2300 + 11000


def test_hudi_upsert_counts_group_once(spark, sf_dir):
    from cs_pipeline_spark.sources.hudi_timeline import _BASE_INSTANT

    rows = {r.instant: r for r in _rows(spark, sf_dir,
                                        "scan_hudi_timeline")}
    # commit 2 creates 3 groups AND upserts fg-0-2: group count
    # grows by 3 (not 4), bytes grow by creates + (new slice - old)
    v1, v2 = rows[_BASE_INSTANT + 1], rows[_BASE_INSTANT + 2]
    assert v2.n_file_groups == v1.n_file_groups + 3
    creates = sum(1000 + 100 * 2 + 10 * k for k in range(3))
    old_slice = 1000 + 100 * 0 + 10 * 2  # fg-0-2 created at c=0
    assert v2.total_bytes == v1.total_bytes + creates + (
        2000 + 100 * 2
    ) - old_slice


def test_iceberg_deletes_sequence_gate(spark, sf_dir):
    rows = {r.path: r for r in _rows(spark, sf_dir,
                                     "scan_iceberg_deletes")}
    assert len(rows) == 10  # head-live files
    # applied: 3 from del-0 + 1 from del-1
    assert rows["data/f-0-0.parquet"].n_pos_deletes == 4
    assert rows["data/f-2-1.parquet"].n_pos_deletes == 2
    # del-1 (seq 1) may NOT touch f-3-0 (data seq 3)
    assert rows["data/f-3-0.parquet"].n_pos_deletes == 0
    # dead target f-0-2 is absent entirely
    assert "data/f-0-2.parquet" not in rows
    for r in rows.values():
        assert r.live_rows == r.record_count - r.n_pos_deletes


def test_page_index_partial_tail_page(spark, sf_dir):
    rows = [r for r in _rows(spark, sf_dir, "scan_parquet_page_index")
            if r.fname == "pidx-001.parquet" and r.col == "b"]
    # n=1137, rgs=500: last rg has 137 rows -> pages of 100 + 37
    tail = [r for r in rows if r.row_group == 2]
    assert sorted(r.page_rows for r in tail) == [37, 100]
    last = max(tail, key=lambda r: r.page)
    # rows 1100..1136: nulls at 1100,1110,1120,1130
    assert last.null_count == 4
    assert last.stat_min == 1101 and last.stat_max == 1136


def test_zstd_frames_roundtrip_reference_decoder(spark, sf_dir):
    """Writer independence: our hand-built frames must decompress
    byte-identically under the REAL zstd (via pyarrow), so the
    matched encode/decode pair cannot self-cancel."""
    from cs_pipeline_spark.sources.zstd_frame import (
        _N_ZST,
        _zst_blocks,
        encode_zstd_frame,
    )

    for i in range(_N_ZST):
        payload = b"".join(d for _t, d in _zst_blocks(i))
        out = pa.decompress(
            encode_zstd_frame(i),
            decompressed_size=len(payload),
            codec="zstd",
        )
        assert bytes(out) == payload
    rows = _rows(spark, sf_dir, "scan_zstd_frames")
    assert len(rows) == _N_ZST
    for r in rows:
        assert r.n_blocks == r.n_raw_blocks + r.n_rle_blocks


def test_mkv_tracks(spark, sf_dir):
    rows = [r for r in _rows(spark, sf_dir, "mm_decode_mkv_meta")
            if r.fname == "clip-003.mkv"]
    assert len(rows) == 3  # 1 video + 2 audio (i=3 odd)
    vid = next(r for r in rows if r.track_type == 1)
    assert (vid.pixel_w, vid.pixel_h) == (640 + 48, 360 + 27)
    assert vid.codec_id == "V_MPEG4/ISO/AVC"
    assert vid.sample_hz is None
    aud = [r for r in rows if r.track_type == 2]
    assert sorted(a.channels for a in aud) == [2, 3]
    assert all(r.duration_ms == 13000 for r in rows)


def test_delta_dv_decode(spark, sf_dir):
    rows = {r.path: r for r in _rows(spark, sf_dir, "scan_delta_dv")}
    assert all(r.card_match == 1 for r in rows.values())
    assert rows["dv-b.parquet"].dv_cardinality == 5000  # bitmap path
    assert rows["dv-c.parquet"].pos_sum == (
        sum(3 * j for j in range(100))
        + sum(65536 + 5 * j for j in range(200))
    )
    assert rows["dv-none.parquet"].live_rows == 5000


def test_lz4_decompressor_vs_reference():
    """Writer independence for the LZ4 path: the dependency-free
    block decoder must agree with the real lz4 (via pyarrow
    lz4_raw), including overlapping matches (offset < length)."""
    from cs_pipeline_spark.sources.parquet_pages import lz4_decompress

    for payload in (b"ab" * 500, bytes(range(256)) * 8, b"x" * 1000,
                    b"abcabcabcabc" * 100 + b"tail"):
        comp = pa.compress(payload, codec="lz4_raw", asbytes=True)
        assert lz4_decompress(comp, max_out=len(payload)) == payload


def test_lz4_pages_rows_match(spark, sf_dir):
    rows = _rows(spark, sf_dir, "scan_parquet_lz4_pages")
    assert len(rows) == 4
    assert all(r.rows_match == 1 for r in rows)


def test_orc_col_stats_match_table(spark, sf_dir):
    """Spark-written ORC zone maps must equal what the documents
    table says was written — writer/decoder independence."""
    from cs_pipeline_spark.tables import load

    rows = {(r.shard, r.col_name): r
            for r in _rows(spark, sf_dir, "scan_orc_col_stats")}
    docs = (
        load(spark, "documents", sf_dir)
        .selectExpr("doc_id div 100 as shard", "doc_id",
                    "length(text) as tlen")
        .groupBy("shard")
        .agg({"doc_id": "sum", "tlen": "max", "*": "count"})
        .collect()
    )
    for d in docs:
        r = rows[(d["shard"], "doc_id")]
        assert r.stat_sum == d["sum(doc_id)"]
        assert r.n_values == d["count(1)"]
        assert rows[(d["shard"], "tlen")].stat_max == d["max(tlen)"]


def test_zstd_checksum_reference_verifies(spark, sf_dir):
    """The reference zstd decoder VERIFIES content checksums — it
    accepting our frames proves the XXH64 implementation bit-exact;
    a corrupted trailing checksum must fail both decoders."""
    from cs_pipeline_spark.sources.zstd_frame import (
        _zck_blocks,
        decode_zstd_frame,
        encode_zstd_frame_ck,
        xxhash64,
    )

    # spec test vectors
    assert xxhash64(b"") == 0xEF46DB3751D8E999
    assert xxhash64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxhash64(b"abc") == 0x44BC2CF5AD770999
    frame = bytearray(encode_zstd_frame_ck(1))
    payload = b"".join(d for _t, d in _zck_blocks(1))
    out = pa.decompress(bytes(frame), decompressed_size=len(payload),
                        codec="zstd")
    assert bytes(out) == payload
    frame[-1] ^= 0xFF  # corrupt the stored checksum
    try:
        decode_zstd_frame(bytes(frame))
        raise AssertionError("corrupt checksum accepted")
    except ValueError:
        pass
    rows = _rows(spark, sf_dir, "scan_zstd_checksum")
    assert all(r.checksum_ok == 1 for r in rows)


def test_avro_resolution_reorder_and_defaults(spark, sf_dir):
    rows = {r.fname: r for r in _rows(spark, sf_dir,
                                      "scan_avro_evolved")}
    # v1 files: every score defaulted (0.25 -> quarter 1 per row)
    g0 = rows["gen-0.avro"]
    assert g0.defaulted_score_rows == g0.n_rows == g0.score_q_sum
    # v3 reordered writer: ids still sum correctly (name matching)
    g2 = rows["gen-2.avro"]
    assert g2.id_sum == sum(5 * r + 2 for r in range(180))
    assert g2.tag_none_rows == 0


def test_soundex_classic_vectors(spark, sf_dir):
    """Pin the documented variant against the classic examples it
    shares with standard Soundex (the first-letter-code rule cases
    are intentionally excluded — see the op docstring)."""
    from cs_pipeline_spark.operators.text import _soundex_col
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("robert",), ("rupert",), ("ashcraft",), ("tymczak",),
         ("honeyman",)],
        "tok string",
    ).select("tok", _soundex_col(F.col("tok")).alias("code"))
    got = {r.tok: r.code for r in df.collect()}
    assert got == {"robert": "R163", "rupert": "R163",
                   "ashcraft": "A261", "tymczak": "T522",
                   "honeyman": "H555"}


def test_hevc_meta_fields(spark, sf_dir):
    rows = {r.fname: r for r in _rows(spark, sf_dir,
                                      "mm_video_hevc_meta")}
    r1 = rows["hevc-001.mp4"]  # Main10, tier 1
    assert (r1.profile_idc, r1.tier_flag, r1.bit_depth) == (2, 1, 10)
    r0 = rows["hevc-000.mp4"]  # cropped (i%3==0)
    assert r0.width == 64 * 10 - 2 and r0.height == 64 * 6 - 2


def test_png_provenance_ai_flag(spark, sf_dir):
    rows = {r.fname: r for r in _rows(spark, sf_dir,
                                      "mm_png_provenance")}
    # even files carry the SD 'parameters' stamp
    assert rows["prov-000.png"].ai_generated == 1
    assert rows["prov-001.png"].ai_generated == 0
    assert "XML:com.adobe.xmp" in rows["prov-001.png"].keywords
    # zTXt text mass counts DECOMPRESSED chars
    assert rows["prov-003.png"].n_itxt == 1


def test_id3_utf16_and_padding(spark, sf_dir):
    rows = {r.fname: r for r in _rows(spark, sf_dir, "mm_id3_tags")}
    assert rows["id3-002.mp3"].artist == "artist-2"
    assert rows["id3-005.mp3"].year_ == 1990 + 15
    assert all(r.n_frames == 4 for r in rows.values())


def test_roaring_bitmap_container_positions():
    """Planted-positive check (round-9 convention for membership
    structures): the bitmap-container walk must recover EXACT
    positions, not just counts."""
    from cs_pipeline_spark.sources.delta_dv import (
        roaring_deserialize,
        roaring_serialize,
    )

    pos = [3 * j + 1 for j in range(5001)]  # > 4096 -> bitset
    assert roaring_deserialize(roaring_serialize(pos)) == pos
    mixed = [5, 70000, 70002, 131072 + 9]
    assert roaring_deserialize(roaring_serialize(mixed)) == sorted(mixed)
