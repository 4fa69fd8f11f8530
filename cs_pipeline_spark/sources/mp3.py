"""Real MP3 (MPEG-1 Layer III) frame-header decode — dependency-free.

MP3 is the dominant crawl audio format the way JPEG is the dominant
image format; WAV/FLAC readers alone leave the long tail unread. This
module follows the ``sources/gif.py``/``flac.py`` pattern: a
pure-python *writer* that emits real MP3 streams — an ID3v2 tag with
its SYNCHSAFE 28-bit size (7 bits per byte, the classic off-by-8×
trap), then frame after frame with true 11-bit sync words, the V1/L3
bitrate-index table, sample-rate index, and padding bit, each frame's
length derived exactly as decoders do (144·bitrate/samplerate +
padding) — plus a *parser* that skips the tag by synchsafe size and
walks frames by computed length, validating sync/version/layer on
every header.

Malformed input raises ValueError only (the crawl contract, pinned by
tests/test_parser_fuzz.py): a broken sync, a free/bad bitrate index,
a reserved sample-rate index, a non-synchsafe tag byte, or a final
frame that overruns EOF all surface as one catchable type.

Fixture content is stated by an arithmetic formula, so the DuckDB
oracle recomputes every output column — a full value-hash check.

Scale: per-file mapInPandas over a binaryFile scan; the walk reads 4
header bytes per frame and skips audio payloads by size — cost is
frames, not bytes — and one ~8-column row per file leaves the worker.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from cs_pipeline_spark.registry import register
from cs_pipeline_spark.sources.scans import _fixture, _scratch

_N_MP3S = 8
# MPEG-1 Layer III bitrate table (kbps), index 1..14; 0 = free, 15 = bad
_BITRATES = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
             160, 192, 224, 256, 320)
_RATES = (44100, 48000, 32000)  # sample-rate index 0..2; 3 reserved
_SPF = 1152  # samples per MPEG-1 Layer III frame


def _mp3_meta(i: int) -> dict:
    n_frames = 40 + 9 * i
    sr_idx = i % 3
    cbr = i % 4 == 3

    def idx(f: int) -> int:
        return 5 if cbr else 1 + ((f * 3 + i) % 9)

    def pad(f: int) -> int:
        return (f + i) % 2

    frames = [(idx(f), pad(f)) for f in range(n_frames)]
    sr = _RATES[sr_idx]
    sizes = [144 * _BITRATES[ix] * 1000 // sr + p for ix, p in frames]
    return {
        "n_frames": n_frames,
        "sr_idx": sr_idx,
        "sample_rate": sr,
        "frames": frames,
        "id3_bytes": 30 + 11 * i if i % 2 == 0 else 0,
        "audio_bytes": sum(sizes),
        "bitrate_sum_kbps": sum(_BITRATES[ix] for ix, _ in frames),
        "is_vbr": 0 if cbr else 1,
        "duration_ms": n_frames * _SPF * 1000 // sr,
    }


# ---------- writer ----------


def _synchsafe(v: int) -> bytes:
    return bytes(
        [(v >> 21) & 0x7F, (v >> 14) & 0x7F, (v >> 7) & 0x7F, v & 0x7F]
    )


def encode_mp3(i: int) -> bytes:
    m = _mp3_meta(i)
    out = bytearray()
    if m["id3_bytes"]:
        out += b"ID3" + bytes([3, 0, 0]) + _synchsafe(m["id3_bytes"])
        out += bytes((k * 7 + i) % 128 for k in range(m["id3_bytes"]))
    for f, (ix, p) in enumerate(m["frames"]):
        size = 144 * _BITRATES[ix] * 1000 // m["sample_rate"] + p
        b2 = (ix << 4) | (m["sr_idx"] << 2) | (p << 1)
        out += bytes([0xFF, 0xFB, b2, 0x00])
        # payload bytes are formula noise that never fakes a sync word
        out += bytes((k * 13 + f * 5 + i) % 128 for k in range(size - 4))
    return bytes(out)


# ---------- parser (the op under test) ----------

_P_COLS = (
    "id3_bytes n_frames sample_rate audio_bytes bitrate_sum_kbps "
    "is_vbr duration_ms"
).split()


def decode_mp3_meta(payload: bytes) -> dict:
    """Skip the ID3v2 tag by its synchsafe size, then walk MPEG-1
    Layer III frames by computed length (144·bitrate/samplerate +
    padding), validating sync/version/layer per header. Raises
    ValueError on anything malformed."""
    pos = 0
    id3 = 0
    if payload[:3] == b"ID3":
        if len(payload) < 10:
            raise ValueError("truncated MP3: short ID3v2 header")
        ss = payload[6:10]
        if any(b & 0x80 for b in ss):
            raise ValueError("malformed MP3: non-synchsafe ID3 size")
        id3 = (ss[0] << 21) | (ss[1] << 14) | (ss[2] << 7) | ss[3]
        pos = 10 + id3
        if pos > len(payload):
            raise ValueError("truncated MP3: ID3 tag overruns payload")
    n_frames = 0
    audio_bytes = 0
    br_sum = 0
    rates = set()
    brs = set()
    while pos < len(payload):
        if pos + 4 > len(payload):
            raise ValueError("truncated MP3: short frame header")
        b0, b1, b2, _b3 = payload[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError("malformed MP3: lost frame sync")
        if (b1 >> 3) & 0x3 != 0x3:
            raise ValueError("unsupported MP3: not MPEG-1")
        if (b1 >> 1) & 0x3 != 0x1:
            raise ValueError("unsupported MP3: not Layer III")
        ix = b2 >> 4
        if ix == 0 or ix == 15:
            raise ValueError("malformed MP3: free/bad bitrate index")
        sr_idx = (b2 >> 2) & 0x3
        if sr_idx == 3:
            raise ValueError("malformed MP3: reserved sample-rate index")
        pad = (b2 >> 1) & 0x1
        rate = _RATES[sr_idx]
        size = 144 * _BITRATES[ix] * 1000 // rate + pad
        if pos + size > len(payload):
            raise ValueError("truncated MP3: frame overruns payload")
        n_frames += 1
        audio_bytes += size
        br_sum += _BITRATES[ix]
        rates.add(rate)
        brs.add(ix)
        pos += size
    if n_frames == 0:
        raise ValueError("malformed MP3: no audio frames")
    if len(rates) != 1:
        raise ValueError("malformed MP3: mixed sample rates")
    rate = rates.pop()
    return {
        "id3_bytes": id3,
        "n_frames": n_frames,
        "sample_rate": rate,
        "audio_bytes": audio_bytes,
        "bitrate_sum_kbps": br_sum,
        "is_vbr": 1 if len(brs) > 1 else 0,
        "duration_ms": n_frames * _SPF * 1000 // rate,
    }


# ---------- fixtures + registered op ----------


def write_mp3_fixtures(out_dir: str) -> list[str]:
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in range(_N_MP3S):
        p = f"{out_dir}/track-{i:03d}.mp3"
        if not os.path.exists(p):
            tmp = p + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(encode_mp3(i))
            os.replace(tmp, p)
        paths.append(p)
    return paths


@_fixture
def _fx_mp3_tracks(spark: SparkSession, sf_dir: str) -> None:
    write_mp3_fixtures(_scratch(sf_dir, "real_mp3s"))


_BR_SQL = "CASE 1 + ((f * 3 + i) % 9) " + " ".join(
    f"WHEN {ix} THEN {_BITRATES[ix]}" for ix in range(1, 10)
) + " END"
_RATE_SQL = "CASE i % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END"

_MP3_ORACLE = f"""
    WITH tracks AS (SELECT unnest(range(0, {_N_MP3S})) AS i),
    frames AS (SELECT i, unnest(range(0, 40 + 9 * i)) AS f FROM tracks),
    fr AS (SELECT i, f,
                  CASE WHEN i % 4 = 3 THEN {_BITRATES[5]}
                       ELSE {_BR_SQL} END AS kbps,
                  (f + i) % 2 AS pad,
                  {_RATE_SQL} AS sr
           FROM frames),
    agg AS (SELECT i, MAX(sr) AS sr, COUNT(*) AS n_frames,
                   SUM(144 * kbps * 1000 // sr + pad) AS audio_bytes,
                   SUM(kbps) AS bitrate_sum_kbps,
                   CASE WHEN COUNT(DISTINCT kbps) > 1 THEN 1 ELSE 0 END
                     AS is_vbr
            FROM fr GROUP BY i)
    SELECT printf('track-%03d.mp3', CAST(i AS INT)) AS fname,
           CAST(CASE WHEN i % 2 = 0 THEN 30 + 11 * i ELSE 0 END
                AS BIGINT) AS id3_bytes,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST(sr AS BIGINT) AS sample_rate,
           CAST(audio_bytes AS BIGINT) AS audio_bytes,
           CAST(bitrate_sum_kbps AS BIGINT) AS bitrate_sum_kbps,
           CAST(is_vbr AS BIGINT) AS is_vbr,
           CAST(n_frames * {_SPF} * 1000 // sr AS BIGINT) AS duration_ms
    FROM agg
"""


@register(
    "mm_decode_mp3_meta",
    _MP3_ORACLE,
    doc="REAL MP3 frame-header decode: binaryFile + mapInPandas walk — "
    "synchsafe ID3v2 skip, per-frame sync/version/layer validation, "
    "V1/L3 bitrate-table frame sizing (144·kbps/rate + padding), "
    "frame census, VBR detection, exact duration from the 1152-sample "
    "frame constant — hash-checked against the fixture formula",
)
def mm_decode_mp3_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dominant crawl audio format, walked for real: 8 fixture
    tracks sweep all three MPEG-1 sample rates, nine bitrate indices
    (VBR) plus a CBR track, alternating padding bits, and ID3v2 tags
    on even tracks — whose SYNCHSAFE size (7 bits per byte) is the
    branch naive parsers read as a plain u32 and overrun by 8×. Audio
    payloads are skipped by the computed frame length, never decoded.

    Scale: see module docstring — per-file mapInPandas, 4 header
    bytes per frame, one row per file out.
    """
    schema = "fname string, " + ", ".join(f"{c} long" for c in _P_COLS)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                m = decode_mp3_meta(bytes(content))
                m["fname"] = path.rsplit("/", 1)[-1]
                rows.append(m)
            cols = ["fname", *_P_COLS]
            yield pd.DataFrame(rows, columns=cols) if rows else \
                pd.DataFrame({k: [] for k in cols})

    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.mp3")
        .load(_scratch(sf_dir, "real_mp3s"))
    )
    return bf.select("path", "content").mapInPandas(batches, schema=schema)
