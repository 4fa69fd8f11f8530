"""Minimal TIFF 6.0 codec + real raster-decode scan.

The reference ingests monthly WTD GeoTIFFs with rasterio
(`pipeline/carbonpipeline/dataset.py:148-169`: open masked → drop the
band axis → stamp a time coordinate parsed from the filename).
``scan_raster_tif`` reproduces those *scan semantics* over parquet
fixtures; this module closes the remaining gap — decoding ACTUAL TIFF
bytes — without rasterio (not in this container) via a dependency-free
reader for the subset of TIFF 6.0 every uncompressed single-band
GeoTIFF uses:

- header: byte order (``II``/``MM``) + magic 42 + first-IFD offset;
- one IFD of 12-byte entries ``(tag u16, type u16, count u32,
  value-or-offset u32)``;
- pixel data in strips located by StripOffsets/StripByteCounts.

GeoTIFF-specific tags (ModelPixelScale etc.) are simply *unknown tags*
to this reader — it extracts the raster grid and ignores them, exactly
what the reference does after ``squeeze('band')``. If ``rasterio`` IS
importable, ``decode_raster`` prefers it (same output contract), so
the production path lights up automatically where the dependency
exists.

Scale: decode runs inside ``mapInPandas`` over a ``binaryFile`` scan —
one Arrow batch of (path, content) rows in, long-format grid rows out;
linear in executors, no shuffle until the caller aggregates.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cs_pipeline_spark.registry import register
from cs_pipeline_spark.sources.scans import _fixture, _scratch

# TIFF field types → byte widths (TIFF 6.0 §2)
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}
_T_SHORT, _T_LONG = 3, 4

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES_PER_PIXEL = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_SAMPLE_FORMAT = 339

_FMT_UINT, _FMT_INT, _FMT_FLOAT = 1, 2, 3


def _tag_values(buf: bytes, bo: str, entry: bytes) -> tuple[int, list[int]]:
    """Decode one IFD entry → (tag, integer values). Out-of-line value
    arrays are followed through their offset."""
    tag, ftype, count = struct.unpack(bo + "HHI", entry[:8])
    size = _TYPE_SIZE.get(ftype, 1) * count
    raw = entry[8:12] if size <= 4 else None
    if raw is None:
        (off,) = struct.unpack(bo + "I", entry[8:12])
        raw = buf[off : off + size]
    if ftype == _T_SHORT:
        vals = list(struct.unpack(bo + "H" * count, raw[: 2 * count]))
    elif ftype == _T_LONG:
        vals = list(struct.unpack(bo + "I" * count, raw[: 4 * count]))
    else:  # other types unused by the tags we read
        vals = []
    return tag, vals


def decode_tiff(payload: bytes) -> tuple[int, int, list[float]]:
    """Decode an uncompressed single-band striped TIFF → (height,
    width, row-major cell values). Raises ValueError on anything
    outside the supported subset (compression, multi-sample)."""
    if payload[:2] == b"II":
        bo = "<"
    elif payload[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    magic, ifd_off = struct.unpack(bo + "HI", payload[2:8])
    if magic != 42:
        raise ValueError("not a TIFF: bad magic")
    (n_entries,) = struct.unpack(bo + "H", payload[ifd_off : ifd_off + 2])
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        start = ifd_off + 2 + 12 * i
        tag, vals = _tag_values(payload, bo, payload[start : start + 12])
        tags[tag] = vals
    if tags.get(_TAG_COMPRESSION, [1])[0] != 1:
        raise ValueError("unsupported: compressed TIFF")
    if tags.get(_TAG_SAMPLES_PER_PIXEL, [1])[0] != 1:
        raise ValueError("unsupported: multi-sample TIFF")
    width = tags[_TAG_WIDTH][0]
    height = tags[_TAG_HEIGHT][0]
    bits = tags.get(_TAG_BITS, [1])[0]
    fmt = tags.get(_TAG_SAMPLE_FORMAT, [_FMT_UINT])[0]
    data = b"".join(
        payload[o : o + c]
        for o, c in zip(tags[_TAG_STRIP_OFFSETS], tags[_TAG_STRIP_COUNTS])
    )
    n = width * height
    if fmt == _FMT_FLOAT and bits == 32:
        vals = struct.unpack(bo + "f" * n, data[: 4 * n])
    elif fmt == _FMT_FLOAT and bits == 64:
        vals = struct.unpack(bo + "d" * n, data[: 8 * n])
    elif fmt == _FMT_INT and bits == 16:
        vals = struct.unpack(bo + "h" * n, data[: 2 * n])
    elif fmt == _FMT_UINT and bits == 16:
        vals = struct.unpack(bo + "H" * n, data[: 2 * n])
    elif fmt == _FMT_INT and bits == 32:
        vals = struct.unpack(bo + "i" * n, data[: 4 * n])
    else:
        raise ValueError(f"unsupported sample layout: fmt={fmt} bits={bits}")
    return height, width, [float(v) for v in vals]


def encode_tiff_f32(
    width: int, height: int, values: list[float], big_endian: bool = False
) -> bytes:
    """Write a single-strip float32 TIFF (the fixture writer — also a
    handy sink for tests of the reader's both-endianness support)."""
    bo = ">" if big_endian else "<"
    n = width * height
    data = struct.pack(bo + "f" * n, *[float(v) for v in values])
    entries = [
        (_TAG_WIDTH, _T_LONG, 1, width),
        (_TAG_HEIGHT, _T_LONG, 1, height),
        (_TAG_BITS, _T_SHORT, 1, 32),
        (_TAG_COMPRESSION, _T_SHORT, 1, 1),
        (_TAG_STRIP_OFFSETS, _T_LONG, 1, 0),  # patched below
        (_TAG_SAMPLES_PER_PIXEL, _T_SHORT, 1, 1),
        (_TAG_ROWS_PER_STRIP, _T_LONG, 1, height),
        (_TAG_STRIP_COUNTS, _T_LONG, 1, len(data)),
        (_TAG_SAMPLE_FORMAT, _T_SHORT, 1, _FMT_FLOAT),
    ]
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * len(entries) + 4
    out = bytearray()
    out += (b"II" if bo == "<" else b"MM") + struct.pack(bo + "HI", 42, ifd_off)
    out += struct.pack(bo + "H", len(entries))
    for tag, ftype, count, value in sorted(entries):
        if tag == _TAG_STRIP_OFFSETS:
            value = data_off
        if ftype == _T_SHORT:
            # inline SHORT value is left-justified in the 4-byte slot
            # (TIFF 6.0 §2, both byte orders)
            out += struct.pack(bo + "HHIHH", tag, ftype, count, value, 0)
        else:
            out += struct.pack(bo + "HHII", tag, ftype, count, value)
    out += struct.pack(bo + "I", 0)  # next-IFD pointer: none
    out += data
    return bytes(out)


def decode_raster(payload: bytes) -> tuple[int, int, list[float]]:
    """Decode raster bytes → (height, width, values). Prefers rasterio
    when importable (full GeoTIFF support: compression, tiling, CRS);
    falls back to the built-in uncompressed-strip reader."""
    try:
        import rasterio  # noqa: F401
        from rasterio.io import MemoryFile

        with MemoryFile(payload) as mem, mem.open() as src:
            band = src.read(1)
            h, w = band.shape
            return h, w, [float(v) for v in band.reshape(-1)]
    except ImportError:
        return decode_tiff(payload)


# ---------- the registered real-decode scan ----------
#
# Fixture: 3 monthly files wtd-v1-YYYYMMDD.tif (2024 month-ends, same
# naming as scan_raster_tif), 8×6 grids whose cells are the exact
# dyadic rationals ((y*53 + x*19 + m*7) % 1024) / 32 — representable
# losslessly in float32, so the decode → double chain is bit-exact on
# both engines and the oracle can state the values arithmetically.

_RT_W, _RT_H = 8, 6
_RT_MONTH_STAMPS = {1: "20240131", 2: "20240229", 3: "20240331"}


def _fixture_cell(m: int, y: int, x: int) -> float:
    return ((y * 53 + x * 19 + m * 7) % 1024) / 32.0


def write_raster_fixtures(out_dir: str) -> list[str]:
    """Materialize the 3 monthly TIFF fixtures (idempotent)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for m, stamp in _RT_MONTH_STAMPS.items():
        p = f"{out_dir}/wtd-v1-{stamp}.tif"
        if not os.path.exists(p):
            vals = [
                _fixture_cell(m, y, x)
                for y in range(_RT_H)
                for x in range(_RT_W)
            ]
            # encode FIRST, write via rename: a crash mid-encode must
            # never leave a half-written file the idempotence check
            # would later mistake for a finished fixture
            payload = encode_tiff_f32(
                # month 2 is big-endian: the reader must not care
                _RT_W, _RT_H, vals, big_endian=(m == 2)
            )
            tmp = p + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(payload)
            os.replace(tmp, p)
        paths.append(p)
    return paths


@_fixture
def _fx_raster_tifs(spark: SparkSession, sf_dir: str) -> None:
    """ensure_fixtures hook: materialize the TIFF fixtures in scratch
    so the registered builder stays pure (computes paths + reads)."""
    write_raster_fixtures(_scratch(sf_dir, "real_tifs"))


def decode_raster_df(spark: SparkSession, tif_dir: str) -> DataFrame:
    """binaryFile scan over ``*.tif`` → mapInPandas decode → long grid
    rows ``(fname, y_idx, x_idx, wtd)``. The filename (never the
    machine-local path) is carried out for the time stamp."""
    schema = "fname string, y_idx long, x_idx long, wtd double"

    def decode_batches(
        it: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in it:
            frames = []
            for path, content in zip(pdf["path"], pdf["content"]):
                h, w, vals = decode_raster(bytes(content))
                fname = path.rsplit("/", 1)[-1]
                frames.append(
                    pd.DataFrame(
                        {
                            "fname": fname,
                            "y_idx": [i // w for i in range(h * w)],
                            "x_idx": [i % w for i in range(h * w)],
                            "wtd": vals,
                        }
                    )
                )
            yield pd.concat(frames) if frames else pd.DataFrame(
                {"fname": [], "y_idx": [], "x_idx": [], "wtd": []}
            )

    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tif")
        .load(tif_dir)
    )
    return bf.select("path", "content").mapInPandas(
        decode_batches, schema=schema
    )


_RT_ORACLE = f"""
    WITH m AS (SELECT unnest([1, 2, 3]) AS m),
    g AS (
      SELECT m, y.y_idx, x.x_idx
      FROM m,
           (SELECT unnest(range(0, {_RT_H})) AS y_idx) y,
           (SELECT unnest(range(0, {_RT_W})) AS x_idx) x
    )
    SELECT strftime(last_day(make_date(2024, CAST(m AS INT), 1)),
                    '%Y-%m-%d') AS time,
           CAST(y_idx AS BIGINT) AS y_idx,
           CAST(x_idx AS BIGINT) AS x_idx,
           CAST((y_idx * 53 + x_idx * 19 + m * 7) % 1024 AS DOUBLE) / 32.0
             AS wtd
    FROM g
"""


@register(
    "scan_raster_decode",
    _RT_ORACLE,
    doc="REAL TIFF byte decode: binaryFile scan → mapInPandas strip "
    "decode (pure-python TIFF 6.0 reader; rasterio when available) → "
    "band-dropped long grid with filename-stamped time "
    "(dataset.py:148-169 on actual bytes)",
)
def scan_raster_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's raster ingest on REAL bytes: monthly ``.tif``
    files decoded from their actual TIFF structure (header, IFD,
    strips — one file per month, one big-endian to prove byte-order
    handling), time parsed from the filename, grid emitted long-form.

    Fixture values are dyadic rationals exactly representable in
    float32, so decode → double is lossless and the oracle states the
    cells arithmetically — a full value-hash check of the decoder.

    Scale: decode parallelizes per file inside mapInPandas (Arrow
    batches of whole files); at 100 TB the same plan reads object-
    store rasters with ``pathGlobFilter`` pruning, and rasterio
    (when present) swaps in transparently for compressed/tiled
    GeoTIFFs.
    """

    tif_dir = _scratch(sf_dir, "real_tifs")
    df = decode_raster_df(spark, tif_dir)
    file_date = F.to_date(
        F.regexp_extract(F.col("fname"), r"wtd-v1-(\d{8})", 1), "yyyyMMdd"
    )
    return df.select(
        F.date_format(file_date, "yyyy-MM-dd").alias("time"),
        "y_idx",
        "x_idx",
        "wtd",
    )
