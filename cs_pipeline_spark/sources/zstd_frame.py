"""Zstandard FRAME decode — raw/RLE-block frames, dependency-free.

Zstd is the default codec of modern lake writers (Spark 4 writes ORC
as zstd out of the box; parquet zstd is everywhere), so a format-
triage engine needs to at least walk a frame: magic 0xFD2FB528 LE,
Frame_Header_Descriptor (FCS-size bits 7-6, Single_Segment bit 5,
Content_Checksum bit 2, Dictionary_ID bits 1-0), optional
Window_Descriptor, Frame_Content_Size, then 3-byte-LE block headers
(bit 0 last, bits 1-2 type: 0 raw / 1 RLE / 2 compressed) to the end.
Raw and RLE blocks need no entropy decoding, so frames built from
them are fully decodable here — and they are REAL zstd: the fixture
writer's output round-trips through the reference decoder
(tests pin ``pyarrow.decompress(frame) == payload``, so the matched
writer/reader pair cannot self-cancel).

Fixture: one ``.zst`` file per index — 3+i alternating raw/RLE
blocks whose bytes are stated by formula, FCS-16 single-segment
header — so the DuckDB oracle recomputes the declared content size,
block census, and the exact decoded byte mass.

Scale: per-file mapInPandas over binaryFile — embarrassingly
parallel, no shuffle; a frame walk reads headers + block payloads
sequentially exactly as a streaming decompressor would, no
random access needed. Malformed input raises ValueError only
(tests/test_parser_fuzz.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from cs_pipeline_spark.registry import register
from cs_pipeline_spark.sources.scans import _fixture, _scratch

_N_ZST = 4
_ZSTD_MAGIC = bytes.fromhex("28b52ffd")  # 0xFD2FB528 little-endian

_BT_RAW, _BT_RLE, _BT_COMPRESSED = 0, 1, 2


def _zst_blocks(i: int) -> list[tuple[int, bytes]]:
    """(type, decoded bytes) per block for fixture file i — all
    stated by formula so the oracle recomputes the byte mass."""
    out = []
    for b in range(3 + i):
        if b % 2 == 0:
            out.append((
                _BT_RAW,
                bytes((b * 13 + j * 7 + i) % 256 for j in range(90 + i)),
            ))
        else:
            out.append((
                _BT_RLE,
                bytes([(b * 11 + i) % 256]) * (120 + b),
            ))
    return out


def encode_zstd_frame(i: int) -> bytes:
    """A real single-segment FCS-16 zstd frame from raw/RLE blocks
    (round-trips through the reference decoder — see tests)."""
    blocks = _zst_blocks(i)
    size = sum(len(d) for _t, d in blocks)
    if not 256 <= size < 65792:
        raise ValueError("fixture bug: FCS-16 range")
    out = bytearray(_ZSTD_MAGIC)
    # FHD 0x60: FCS-flag 1 (2-byte field, stores size-256),
    # Single_Segment set, no checksum, no dictionary
    out.append(0x60)
    out += (size - 256).to_bytes(2, "little")
    for b, (t, data) in enumerate(blocks):
        last = 1 if b == len(blocks) - 1 else 0
        if t == _BT_RAW:
            out += ((len(data) << 3) | (t << 1) | last).to_bytes(
                3, "little"
            )
            out += data
        else:  # RLE: size field = run length, content = the one byte
            out += ((len(data) << 3) | (t << 1) | last).to_bytes(
                3, "little"
            )
            out.append(data[0])
    return bytes(out)


@_fixture
def _fx_zstd_frames(spark: SparkSession, sf_dir: str) -> None:
    import os

    out_dir = _scratch(sf_dir, "real_zstd")
    os.makedirs(out_dir, exist_ok=True)
    for i in range(_N_ZST):
        p = f"{out_dir}/doc-{i:03d}.zst"
        if not os.path.exists(p):
            tmp = p + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(encode_zstd_frame(i))
            os.replace(tmp, p)


def decode_zstd_frame(payload: bytes) -> dict:
    """Walk one zstd frame; decode raw/RLE blocks (compressed blocks
    raise — this is the triage path, not an entropy decoder).
    ValueError-only."""
    if len(payload) < 6 or payload[:4] != _ZSTD_MAGIC:
        raise ValueError("not a zstd frame: bad magic")
    p = 4
    fhd = payload[p]
    p += 1
    fcs_flag = fhd >> 6
    single_segment = bool(fhd & 0x20)
    if fhd & 0x18:
        raise ValueError("malformed zstd: reserved FHD bits set")
    has_checksum = bool(fhd & 0x04)
    did_flag = fhd & 0x03
    if not single_segment:
        if p >= len(payload):
            raise ValueError("truncated zstd: window descriptor")
        p += 1
    did_len = (0, 1, 2, 4)[did_flag]
    p += did_len
    fcs_len = (0, 2, 4, 8)[fcs_flag]
    if fcs_flag == 0 and single_segment:
        fcs_len = 1
    if p + fcs_len > len(payload):
        raise ValueError("truncated zstd: frame content size")
    declared = None
    if fcs_len:
        declared = int.from_bytes(payload[p : p + fcs_len], "little")
        if fcs_len == 2:
            declared += 256
    p += fcs_len

    n_blocks = n_raw = n_rle = 0
    decoded = bytearray()
    while True:
        if p + 3 > len(payload):
            raise ValueError("truncated zstd: block header")
        hdr = int.from_bytes(payload[p : p + 3], "little")
        p += 3
        last, btype, bsize = hdr & 1, (hdr >> 1) & 3, hdr >> 3
        n_blocks += 1
        if btype == _BT_RAW:
            if p + bsize > len(payload):
                raise ValueError("truncated zstd: raw block")
            decoded += payload[p : p + bsize]
            p += bsize
            n_raw += 1
        elif btype == _BT_RLE:
            if p >= len(payload):
                raise ValueError("truncated zstd: RLE byte")
            if bsize > 1 << 17:
                raise ValueError("malformed zstd: RLE run too long")
            decoded += bytes([payload[p]]) * bsize
            p += 1
            n_rle += 1
        elif btype == _BT_COMPRESSED:
            raise ValueError(
                "unsupported zstd: compressed block (triage decoder)"
            )
        else:
            raise ValueError("malformed zstd: reserved block type")
        if last:
            break
    if has_checksum:
        if p + 4 > len(payload):
            raise ValueError("truncated zstd: checksum")
        p += 4
    if p != len(payload):
        raise ValueError("malformed zstd: trailing bytes after frame")
    if declared is not None and declared != len(decoded):
        raise ValueError("malformed zstd: content size mismatch")
    return {
        "content_size": len(decoded),
        "n_blocks": n_blocks,
        "n_raw_blocks": n_raw,
        "n_rle_blocks": n_rle,
        "byte_mass": sum(decoded),
        "fcs_declared": 1 if declared is not None else 0,
    }


_ZS_COLS = (
    "content_size n_blocks n_raw_blocks n_rle_blocks byte_mass "
    "fcs_declared".split()
)

_ZS_ORACLE = f"""
    WITH files AS (SELECT unnest(range(0, {_N_ZST})) AS i),
    blocks AS (SELECT i, unnest(range(0, 3 + i)) AS b FROM files),
    raw AS (SELECT i, b, 90 + i AS sz,
                   (SELECT SUM((b * 13 + j.j * 7 + i) % 256)
                    FROM (SELECT unnest(range(0, 90 + i)) AS j) j)
                     AS mass
            FROM blocks WHERE b % 2 = 0),
    rle AS (SELECT i, b, 120 + b AS sz,
                   (120 + b) * ((b * 11 + i) % 256) AS mass
            FROM blocks WHERE b % 2 = 1),
    u AS (SELECT i, b, sz, mass, 1 AS is_raw FROM raw
          UNION ALL
          SELECT i, b, sz, mass, 0 AS is_raw FROM rle)
    SELECT printf('doc-%03d.zst', CAST(i AS INT)) AS fname,
           CAST(SUM(sz) AS BIGINT) AS content_size,
           CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(SUM(is_raw) AS BIGINT) AS n_raw_blocks,
           CAST(SUM(1 - is_raw) AS BIGINT) AS n_rle_blocks,
           CAST(SUM(mass) AS BIGINT) AS byte_mass,
           CAST(1 AS BIGINT) AS fcs_declared
    FROM u GROUP BY i
"""


@register(
    "scan_zstd_frames",
    _ZS_ORACLE,
    doc="zstd frame decode (raw/RLE blocks): magic + frame-header-"
    "descriptor walk (FCS size, single-segment, checksum, dict-ID "
    "bits), 3-byte block headers to the last block, raw/RLE payload "
    "reassembly with the declared content size cross-checked — block "
    "census + exact decoded byte mass per file, hash-checked against "
    "the fixture formula (frames round-trip through the reference "
    "zstd decoder in tests)",
)
def scan_zstd_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The triage layer for the lake's default codec: a frame whose
    headers don't walk to EOF is corrupt long before entropy decoding
    matters, and raw/RLE frames (zstd's own fallback for
    incompressible or constant data) decode completely without an
    FSE/Huffman stage. The byte-mass checksum pins the whole decoded
    stream, so a desync anywhere in the block walk changes the hash.

    Scale: see module docstring — per-file map over binaryFile, no
    shuffle; headers-first walk matches how a streaming reader
    validates multi-GB frames without buffering them.
    """
    schema = "fname string, " + ", ".join(
        f"{c} long" for c in _ZS_COLS
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["fname", *_ZS_COLS]
        for pdf in it:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                m = decode_zstd_frame(bytes(content))
                m["fname"] = path.rsplit("/", 1)[-1]
                rows.append(m)
            yield (
                pd.DataFrame(rows, columns=cols)
                if rows
                else pd.DataFrame({k: [] for k in cols})
            )

    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.zst")
        .load(_scratch(sf_dir, "real_zstd"))
    )
    return bf.select("path", "content").mapInPandas(
        batches, schema=schema
    )
