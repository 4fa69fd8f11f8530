"""Crawl-path robustness contract for the binary parsers: on ANY
malformed input they must raise ValueError (one catchable type for
the mapInPandas decoders) — never IndexError / struct.error /
KeyError. Hypothesis drives random payloads plus seeded mutations of
valid fixtures (ADVICE r7 #3 hardened jpeg.py; these pin it and
extend the guarantee to the WAV and DC-JPEG parsers)."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from cs_pipeline_spark.sources.jpeg import (
    decode_jpeg_dc,
    decode_jpeg_gps,
    decode_jpeg_meta,
    encode_jpeg,
    encode_jpeg_dc,
    encode_jpeg_gps,
)
from cs_pipeline_spark.sources.avro_ocf import (
    decode_avro_flat,
    decode_avro_ocf,
    encode_avro_ocf,
)
from cs_pipeline_spark.sources.bmp import decode_bmp_meta, encode_bmp
from cs_pipeline_spark.sources.flac import decode_flac_meta, encode_flac
from cs_pipeline_spark.sources.gif import decode_gif_meta, encode_gif as encode_gif_anim
from cs_pipeline_spark.sources.mp4 import (
    decode_hevc_sps,
    decode_mp4_hevc_meta,
    decode_mp4_keyframe_pixels,
    decode_mp4_sps_meta,
    decode_mp4_meta,
    encode_hevc_sps,
    encode_mp4,
    encode_mp4_avc,
    encode_mp4_hevc,
    encode_mp4_mjpeg,
)
from cs_pipeline_spark.sources.png import (
    decode_png_text,
    encode_png_text,
)
from cs_pipeline_spark.sources.mp3 import (
    decode_mp3_id3,
    encode_mp3_id3,
)
from cs_pipeline_spark.sources.mp3 import decode_mp3_meta, encode_mp3
from cs_pipeline_spark.sources.npy import decode_npy_meta, encode_npy
from cs_pipeline_spark.sources.parquet_footer import (
    decode_parquet_footer,
    encode_parquet_tbl,
)
from cs_pipeline_spark.sources.ogg import decode_ogg_meta, encode_ogg
from cs_pipeline_spark.sources.pdf import (
    decode_pdf_meta,
    encode_pdf,
    encode_pdf_text,
    extract_pdf_text,
)
from cs_pipeline_spark.sources.safetensors import (
    decode_safetensors_meta,
    encode_safetensors,
)
from cs_pipeline_spark.sources.warc import (
    decode_warc_records,
    encode_warc,
    encode_warc_gz,
)
from cs_pipeline_spark.sources.tar import decode_tar_members, encode_tar
from cs_pipeline_spark.sources.tfrecord import (
    decode_tfrecord_meta,
    encode_tfrecord,
)
from cs_pipeline_spark.sources.iceberg import encode_iceberg_manifest
from cs_pipeline_spark.sources.orc_meta import (
    decode_orc_postscript,
    encode_orc_meta,
)
from cs_pipeline_spark.sources.parquet_pages import (
    decode_parquet_col_stats,
    decode_parquet_column_pages,
    decode_parquet_string_pages,
    encode_parquet_lz4,
)
from cs_pipeline_spark.sources.wav import decode_wav, encode_wav
from cs_pipeline_spark.sources.wikidump import (
    decode_wikidump_pages,
    encode_wikidump,
)
from cs_pipeline_spark.sources.webp import decode_webp_meta, encode_webp
from cs_pipeline_spark.sources.parquet_pageindex import (
    decode_parquet_page_index,
    encode_parquet_pageidx,
)
from cs_pipeline_spark.sources.zstd_frame import (
    decode_zstd_frame,
    encode_zstd_frame,
    encode_zstd_frame_ck,
)
from cs_pipeline_spark.sources.orc_meta import (
    decode_orc_col_stats,
)
from cs_pipeline_spark.sources.avro_ocf import (
    encode_avro_evolved,
    resolve_avro_evolved,
)
from cs_pipeline_spark.sources.arrow_ipc import (
    decode_arrow_file,
    decode_arrow_stream,
    encode_arrow_ipc,
    encode_arrow_stream,
)
from cs_pipeline_spark.sources.deflate import (
    decode_zlib_multistream,
    encode_zlib_multistream,
)
from cs_pipeline_spark.sources.msgpack import (
    decode_msgpack_stream,
    encode_msgpack_stream,
)
from cs_pipeline_spark.sources.xz_container import (
    decode_xz_container,
    encode_xz_multistream,
)
from cs_pipeline_spark.sources.sqlite_db import (
    decode_sqlite_db,
    encode_sqlite_db,
)
from cs_pipeline_spark.sources.gzip_members import (
    decode_gzip_members,
    encode_gzip_members,
)
from cs_pipeline_spark.sources.cbor import (
    decode_cbor_stream,
    encode_cbor_stream,
)
from cs_pipeline_spark.sources.torrent import (
    decode_torrent,
    encode_torrent,
)
from cs_pipeline_spark.sources.zip_cdir import (
    decode_zip_cdir,
    encode_zip_archive,
)


def _parse_torrent(b: bytes):
    # fuzz shim: verify against an empty payload (mismatches count,
    # malformed metainfo must still be ValueError-only)
    return decode_torrent(b, b"")
from cs_pipeline_spark.sources.mkv import decode_mkv_meta, encode_mkv
from cs_pipeline_spark.sources.delta_dv import (
    roaring_deserialize,
    roaring_serialize,
)


def _encode_roaring_seed(i: int) -> bytes:
    return roaring_serialize(
        [7 * j + i for j in range(200)]
        + [65536 * (1 + i) + 3 * j for j in range(50)]
    )

_PARSERS = [
    (decode_jpeg_meta, encode_jpeg),
    (decode_jpeg_dc, encode_jpeg_dc),
    (decode_jpeg_gps, encode_jpeg_gps),
    (decode_wav, encode_wav),
    (decode_wikidump_pages, encode_wikidump),
    (decode_gif_meta, encode_gif_anim),
    (decode_webp_meta, encode_webp),
    (decode_mp4_meta, encode_mp4),
    (decode_mp4_keyframe_pixels, encode_mp4_mjpeg),
    (decode_mp4_sps_meta, encode_mp4_avc),
    (decode_flac_meta, encode_flac),
    (decode_tar_members, encode_tar),
    (decode_mp3_meta, encode_mp3),
    (decode_ogg_meta, encode_ogg),
    (decode_pdf_meta, encode_pdf),
    (extract_pdf_text, encode_pdf_text),
    (decode_warc_records, encode_warc),
    (decode_warc_records, encode_warc_gz),
    (decode_safetensors_meta, encode_safetensors),
    (decode_tfrecord_meta, encode_tfrecord),
    (decode_npy_meta, encode_npy),
    (decode_parquet_footer, encode_parquet_tbl),
    (decode_bmp_meta, encode_bmp),
    (decode_avro_ocf, encode_avro_ocf),
    (decode_avro_flat, encode_avro_ocf),
    (decode_avro_flat, encode_iceberg_manifest),
    (decode_parquet_column_pages, encode_parquet_tbl),
    (decode_parquet_col_stats, encode_parquet_tbl),
    (decode_parquet_string_pages, encode_parquet_tbl),
    (decode_orc_postscript, encode_orc_meta),
    (decode_parquet_page_index, encode_parquet_pageidx),
    (decode_parquet_column_pages, encode_parquet_lz4),
    (decode_zstd_frame, encode_zstd_frame),
    (decode_zstd_frame, encode_zstd_frame_ck),
    (decode_orc_col_stats, encode_orc_meta),
    (resolve_avro_evolved, encode_avro_evolved),
    (decode_mkv_meta, encode_mkv),
    (roaring_deserialize, _encode_roaring_seed),
    (decode_mp4_hevc_meta, encode_mp4_hevc),
    (decode_hevc_sps, encode_hevc_sps),
    (decode_png_text, encode_png_text),
    (decode_mp3_id3, encode_mp3_id3),
    (decode_arrow_file, encode_arrow_ipc),
    (decode_arrow_stream, encode_arrow_stream),
    (decode_zlib_multistream, encode_zlib_multistream),
    (decode_msgpack_stream, encode_msgpack_stream),
    (decode_xz_container, encode_xz_multistream),
    (decode_sqlite_db, encode_sqlite_db),
    (decode_gzip_members, encode_gzip_members),
    (decode_cbor_stream, encode_cbor_stream),
    (_parse_torrent, encode_torrent),
    (decode_zip_cdir, encode_zip_archive),
]


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_random_bytes_never_escape_valueerror(payload):
    for parse, _ in _PARSERS:
        try:
            parse(payload)
        except ValueError:
            pass  # the contract


def test_truncations_of_valid_files_never_escape_valueerror():
    for parse, encode in _PARSERS:
        payload = encode(1)
        for cut in range(0, len(payload), 3):
            try:
                parse(payload[:cut])
            except ValueError:
                pass


def test_seeded_byte_flips_never_escape_valueerror():
    rng = random.Random(12345)
    for parse, encode in _PARSERS:
        base = bytearray(encode(2))
        for _ in range(300):
            mutated = bytearray(base)
            for _ in range(rng.randint(1, 4)):
                mutated[rng.randrange(len(mutated))] = rng.randrange(256)
            try:
                parse(bytes(mutated))
            except ValueError:
                pass


def test_quarantine_boundary_is_exact(spark, sf_dir):
    """Odd-indexed fixtures (structurally truncated) quarantine;
    even ones parse — both directions pinned per format."""
    from cs_pipeline_spark.sources.quarantine import (
        _N_Q,
        mm_decode_quarantine,
    )

    rows = {r.format: r for r in mm_decode_quarantine(spark, sf_dir).collect()}
    assert set(rows) == {"gif", "mp3"}
    for fmt in ("gif", "mp3"):
        r = rows[fmt]
        assert r.n_files == _N_Q
        assert r.n_ok == _N_Q // 2
        assert r.n_quarantined == _N_Q // 2


# ---------- round-9 property tests (encode/parse inverses) ----------


@settings(max_examples=150, deadline=None)
@given(st.integers(min_value=-(2**62), max_value=2**62))
def test_avro_zigzag_varint_roundtrip(v):
    from cs_pipeline_spark.sources.avro_ocf import _AR, _zz

    assert _AR(_zz(v)).long() == v


@settings(max_examples=150, deadline=None)
@given(st.text(min_size=0, max_size=60))
def test_pdf_literal_string_roundtrip(s):
    """Escape-encode any text the way the fixture writer would, parse
    it back with _pdf_string — must be the identity (codepoints kept
    to latin-1 range: the writer's WinAnsi subset)."""
    from cs_pipeline_spark.sources.pdf import _pdf_string

    s = "".join(c if ord(c) < 256 and c not in "\r" else "x" for c in s)
    enc = s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    payload = ("(" + enc + ")").encode("latin-1")
    text, end = _pdf_string(payload, 0)
    assert text == s
    assert end == len(payload)
