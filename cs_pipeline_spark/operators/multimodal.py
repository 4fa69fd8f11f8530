"""Multimodal-column operators (SURVEY §2.10 extension, north star).

Design for image/audio/video at 100 TB: media ride as opaque
``binary`` columns with *typed metadata columns next to them*; decode
/ feature-extraction is per-row map work in Arrow-batched
``mapInPandas`` (no shuffle), so it scales linearly with executors
and pipelines with the parquet scan. The image/audio codecs are not
in this container, so the decode step is a DETERMINISTIC STUB (see
``_fake_decode``) — the Spark-side plumbing (schema, batching, UDF
signature, partitioning) is real and tested; swap ``_fake_decode``
for PIL/ffmpeg calls in production.

The test corpus has no binary table, so binaries are derived
deterministically from ``documents.text`` (utf-8 encode) — the
operators themselves are written against a ``(id, payload binary)``
contract.

- ``mm_binary_meta`` — typed metadata extraction: byte length, md5
  digest, magic-bytes prefix. Oracle-checked (md5/hex agree across
  engines on utf-8 payloads).
- ``mm_frame_sample`` — fixed-stride frame/window sampling from a
  payload: frame index + per-frame digest (audio frame / video
  keyframe selection shape). Oracle-checked.
- ``mm_decode_png`` (sources/png.py) — REAL image decode: binaryFile
  scan → mapInPandas pure-python PNG reader (CRC-verified chunks,
  zlib inflate, all five unfilters) → per-image stats, hash-checked
  against the fixture formula. ``decode_images``/``decode_images_real``
  below remain the generic plumbing for PIL-equipped deployments.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from cs_pipeline_spark.operators.helpers import (
    dround,
    literal_df,
    with_prefix_agg,
)
from cs_pipeline_spark.registry import register
from cs_pipeline_spark.tables import load

# ---------- typed metadata over binary payloads ----------


@register(
    "mm_binary_meta",
    "SELECT doc_id, octet_length(encode(text)) AS byte_len, "
    "md5(text) AS digest, left(hex(encode(text)), 8) AS magic "
    "FROM documents",
    doc="binary payload metadata: byte length, md5, magic-byte prefix",
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata lives in plain columns NEXT to the payload so filters
    (dedup by digest, route by magic) push down without touching the
    bytes — at 100 TB the payload column is never read unless needed
    (parquet column pruning)."""
    docs = load(spark, "documents", sf_dir)
    payload = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        F.length(payload).alias("byte_len"),
        F.md5(payload).alias("digest"),
        F.substring(F.hex(payload), 1, 8).alias("magic"),
    )


# ---------- fixed-stride frame sampling ----------

_FRAME_LEN = 16
_STRIDE = 64


@register(
    "mm_frame_sample",
    "SELECT doc_id, "
    f"unnest(range(0, greatest((length(text) - {_FRAME_LEN}) // {_STRIDE}, -1) + 1)) AS frame_idx, "
    f"unnest(list_transform(range(0, greatest((length(text) - {_FRAME_LEN}) // {_STRIDE}, -1) + 1), "
    f"i -> md5(substring(text, CAST(i * {_STRIDE} + 1 AS INT), {_FRAME_LEN})))) AS frame_md5 "
    "FROM documents",
    doc="fixed-stride frame sampling from payloads (frame idx + digest)",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video/audio frame-sampling shape: emit every stride-th window of
    the payload as a frame row. Pure per-row explode — parallel by
    construction; the downstream decode consumes frame rows."""
    docs = load(spark, "documents", sf_dir)
    n_frames = (
        F.greatest(
            F.floor((F.length("text") - _FRAME_LEN) / _STRIDE), F.lit(-1)
        )
        + 1
    ).cast("int")
    frames = F.transform(
        F.sequence(F.lit(0), n_frames - 1),
        lambda i: F.md5(F.col("text").substr(i * _STRIDE + 1, F.lit(_FRAME_LEN))),
    )
    return docs.select(
        "doc_id", F.posexplode(frames).alias("frame_idx", "frame_md5")
    )


# ---------- aspect-preserving resize planning ----------

_TARGET = 224  # fit into 224×224, aspect preserved


@register(
    "mm_resize_dims",
    "WITH meta AS (SELECT doc_id, "
    "CAST(16 * (8 + (doc_id * 7) % 120) AS INT) AS width, "
    "CAST(16 * (8 + (doc_id * 13) % 120) AS INT) AS height FROM documents) "
    "SELECT doc_id, width, height, "
    f"CAST(GREATEST(ROUND(width * LEAST(CAST({_TARGET} AS DOUBLE) / width, "
    f"CAST({_TARGET} AS DOUBLE) / height)), 1) AS INT) AS out_w, "
    f"CAST(GREATEST(ROUND(height * LEAST(CAST({_TARGET} AS DOUBLE) / width, "
    f"CAST({_TARGET} AS DOUBLE) / height)), 1) AS INT) AS out_h, "
    f"FLOOR(LEAST(CAST({_TARGET} AS DOUBLE) / width, "
    f"CAST({_TARGET} AS DOUBLE) / height) * 1000000.0 + 0.5) "
    "/ 1000000.0 AS scale "
    "FROM meta",
    doc="aspect-preserving resize planning from typed metadata (resize "
    "compute itself is the mapInPandas decode stage)",
)
def mm_resize_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize *planning* stays in typed-metadata columns (pure
    expressions — width/height never require touching the payload);
    only the pixel work belongs in the mapInPandas decode stage. At
    100 TB that ordering matters: plan → filter no-op resizes → decode
    only what changes."""
    docs = load(spark, "documents", sf_dir)
    meta = docs.select(
        "doc_id",
        (16 * (8 + (F.col("doc_id") * 7) % 120)).cast("int").alias("width"),
        (16 * (8 + (F.col("doc_id") * 13) % 120)).cast("int").alias("height"),
    )
    scale = F.least(
        F.lit(float(_TARGET)) / F.col("width"),
        F.lit(float(_TARGET)) / F.col("height"),
    )
    return meta.select(
        "doc_id",
        "width",
        "height",
        F.greatest(F.round(F.col("width") * scale), F.lit(1))
        .cast("int")
        .alias("out_w"),
        F.greatest(F.round(F.col("height") * scale), F.lit(1))
        .cast("int")
        .alias("out_h"),
        dround(scale, 6).alias("scale"),
    )


# ---------- mapInPandas decode pipeline (STUB decoder) ----------

_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("format", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int, str, list[float]]:
    """STUB for an image decoder (PIL/libjpeg not in this container).

    Deterministic: all outputs derive from a blake2b digest of the
    payload, so the operator is replay-stable. Replace with
    ``PIL.Image.open(io.BytesIO(payload))`` + a real featurizer in
    production — the surrounding plumbing does not change.
    """
    d = hashlib.blake2b(payload, digest_size=16).digest()
    width = 16 * (8 + d[0] % 120)  # plausible 128..2032 px
    height = 16 * (8 + d[1] % 120)
    channels = 3 if d[2] % 4 else 1
    fmt = ("jpeg", "png", "webp")[d[3] % 3]
    features = [round(b / 255.0, 6) for b in d[4:12]]
    return width, height, channels, fmt, features


def _pil_decode(payload: bytes) -> tuple[int, int, int, str, list[float]]:
    """Real decoder, used when PIL is importable (same output contract
    as ``_fake_decode``): true dimensions/mode/format plus an 8-bin
    intensity histogram as the feature vector. Raises ImportError when
    PIL is absent — callers fall back to the stub."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(payload)) as im:
        width, height = im.size
        channels = len(im.getbands())
        fmt = (im.format or "unknown").lower()
        hist = im.convert("L").histogram()  # 256 bins
        total = float(sum(hist)) or 1.0
        features = [
            round(sum(hist[i * 32 : (i + 1) * 32]) / total, 6)
            for i in range(8)
        ]
    return width, height, channels, fmt, features


def _decode_payload(payload: bytes) -> tuple[int, int, int, str, list[float]]:
    """PIL when available (real bytes), deterministic stub otherwise —
    the ``decode_raster`` gating pattern (sources/tiff.py)."""
    try:
        return _pil_decode(payload)
    except ImportError:
        return _fake_decode(payload)
    except Exception:
        # undecodable bytes with PIL present: fall back to the stub so
        # the pipeline keeps moving (a production decoder would route
        # these to a quarantine column instead of failing the batch)
        return _fake_decode(payload)


def decode_images(df: DataFrame, payload_col: str, id_col: str) -> DataFrame:
    """mapInPandas decode: Arrow batches in, one decoded row per image.

    The iterator-of-batches signature keeps peak memory at one Arrow
    batch per task regardless of partition size — the shape a real
    decoder needs (decode is CPU-bound; batches pipeline with the
    scan)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(i), *_fake_decode(bytes(p)))
                for i, p in zip(pdf[id_col], pdf[payload_col])
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "channels",
                    "format",
                    "features",
                ],
            )

    return df.mapInPandas(fn, schema=_DECODE_SCHEMA)


def decode_images_real(
    df: DataFrame, payload_col: str, id_col: str
) -> DataFrame:
    """Production decode path: identical plumbing to ``decode_images``
    but per-payload decode goes through ``_decode_payload`` (PIL when
    importable, deterministic stub otherwise). The registered op keeps
    the stub for replay stability; this is the entry point a deployment
    with codecs installed uses."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(i), *_decode_payload(bytes(p)))
                for i, p in zip(pdf[id_col], pdf[payload_col])
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "channels",
                    "format",
                    "features",
                ],
            )

    return df.mapInPandas(fn, schema=_DECODE_SCHEMA)


# The former `mm_decode_image_stub` (deterministic fake decode,
# rows-only check) is superseded by the REAL hash-checked PNG decode
# op `mm_decode_png` in sources/png.py (VERDICT r5 item 3). The
# decode_images / decode_images_real helpers above remain the
# plumbing API for deployments with codec libraries installed.


# ---------- modality routing ----------

_MAGIC_SQL = r"""CASE doc_id % 4
      WHEN 0 THEN '\xFF\xD8\xFF'::BLOB
      WHEN 1 THEN 'RIFF'::BLOB
      WHEN 2 THEN '\x00\x00\x01\xBA'::BLOB
      ELSE ''::BLOB END || encode(text)"""


@register(
    "mm_modality_route",
    f"""
    WITH p AS (SELECT doc_id, source, {_MAGIC_SQL} AS payload FROM documents),
    r AS (SELECT doc_id, source, octet_length(payload) AS n_bytes,
            CASE WHEN hex(payload) LIKE 'FFD8FF%'   THEN 'image'
                 WHEN hex(payload) LIKE '52494646%' THEN 'audio'
                 WHEN hex(payload) LIKE '000001BA%' THEN 'video'
                 ELSE 'text' END AS modality
          FROM p)
    SELECT modality, COUNT(*) AS n_docs,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           COUNT(DISTINCT source) AS n_sources
    FROM r GROUP BY modality
    """,
    doc="magic-byte modality routing: classify binary payloads (JPEG/RIFF/MPEG-PS prefixes) and aggregate per modality — the dispatch step in front of per-modality decode pipelines",
)
def mm_modality_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Route rows to modality-specific pipelines by sniffing magic
    bytes — never by trusting a filename/extension column. The test
    corpus has no binary table, so payloads get a deterministic magic
    prefix stamped by ``doc_id % 4`` and the classifier must recover
    it (round-trip check).

    Scale: classification is a per-row prefix compare on the FIRST
    bytes only — with payload metadata stored columnar, the router
    reads the magic/prefix column and defers the heavy bytes until a
    modality pipeline actually consumes them (parquet column pruning
    + lazy materialization). The aggregate is a 4-group hash-agg.
    """
    docs = load(spark, "documents", sf_dir)
    m = F.col("doc_id") % 4
    magic = (
        F.when(m == 0, F.lit(bytes([0xFF, 0xD8, 0xFF])))
        .when(m == 1, F.lit(b"RIFF"))
        .when(m == 2, F.lit(bytes([0x00, 0x00, 0x01, 0xBA])))
        .otherwise(F.lit(b""))
    )
    payload = F.concat(magic, F.encode("text", "UTF-8"))
    hx = F.hex(payload)
    modality = (
        F.when(hx.startswith("FFD8FF"), F.lit("image"))
        .when(hx.startswith("52494646"), F.lit("audio"))
        .when(hx.startswith("000001BA"), F.lit("video"))
        .otherwise(F.lit("text"))
    )
    return (
        docs.select(
            "source",
            F.length(payload).alias("n_bytes"),
            modality.alias("modality"),
        )
        .groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


# ---------- audio chunking plan ----------

_CHUNK_MS = 10000
_MS_PER_CHAR = 25  # fake duration metadata: 25 ms of audio per char


@register(
    "mm_audio_chunk_plan",
    f"""
    WITH d AS (SELECT doc_id, n_chars * {_MS_PER_CHAR} AS duration_ms
               FROM documents),
    c AS (SELECT doc_id, duration_ms,
            unnest(generate_series(0,
              CAST(FLOOR((duration_ms - 1) / {_CHUNK_MS}.0) AS BIGINT))) AS chunk_idx
          FROM d)
    SELECT doc_id, chunk_idx,
           chunk_idx * {_CHUNK_MS} AS chunk_start_ms,
           least({_CHUNK_MS}, duration_ms - chunk_idx * {_CHUNK_MS}) AS chunk_len_ms
    FROM c
    """,
    doc="audio chunking plan from typed duration metadata: fixed 10 s chunks via sequence+explode (integer-only; the chunk DECODE is the mapInPandas stage, this is the shuffle-free planning step)",
)
def mm_audio_chunk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunking long media into fixed windows is planned from METADATA
    (duration), never by decoding bytes: one `sequence`+`explode` per
    row, zero shuffle, and the resulting (doc, chunk) rows drive the
    Arrow-batched decode stage (see ``decode_images``) with byte
    ranges. Duration here is synthesized as n_chars·25 ms (the
    corpus table carries no audio bytes); all chunk math is
    integer-exact. REAL decoded durations now exist too:
    ``mm_decode_wav`` (sources/wav.py) parses actual RIFF/PCM bytes
    and ``mm_audio_chunk_decoded`` runs this exact chunk plan over
    those decoded durations — decode-then-plan end to end.
    """
    docs = load(spark, "documents", sf_dir)
    dur = (F.col("n_chars") * F.lit(_MS_PER_CHAR)).alias("duration_ms")
    d = docs.select("doc_id", dur)
    n_last = F.floor((F.col("duration_ms") - 1) / F.lit(float(_CHUNK_MS)))
    return (
        d.withColumn("chunk_idx", F.explode(F.sequence(F.lit(0).cast("long"), n_last)))
        .select(
            "doc_id",
            "chunk_idx",
            (F.col("chunk_idx") * _CHUNK_MS).alias("chunk_start_ms"),
            F.least(
                F.lit(_CHUNK_MS).cast("long"),
                F.col("duration_ms") - F.col("chunk_idx") * _CHUNK_MS,
            ).alias("chunk_len_ms"),
        )
    )


# ---------- 2D tile plan for oversized images ----------

_TILE = 64


@register(
    "mm_image_tile_plan",
    f"""
    WITH dims AS (
      SELECT doc_id,
             64 + (doc_id % 9) * 32 AS width,
             48 + (doc_id % 7) * 32 AS height,
             (64 + (doc_id % 9) * 32 + {_TILE} - 1) // {_TILE} AS ntx,
             (48 + (doc_id % 7) * 32 + {_TILE} - 1) // {_TILE} AS nty
      FROM documents
    ), tiles AS (
      SELECT doc_id, width, height, ntx,
             unnest(range(ntx * nty)) AS k
      FROM dims
    )
    SELECT doc_id, width, height,
           CAST(k % ntx AS BIGINT) AS tile_x,
           CAST(k // ntx AS BIGINT) AS tile_y,
           CAST(least({_TILE}, width - (k % ntx) * {_TILE}) AS BIGINT) AS tile_w,
           CAST(least({_TILE}, height - (k // ntx) * {_TILE}) AS BIGINT) AS tile_h
    FROM tiles
    """,
    doc=f"2D {_TILE}×{_TILE} tile plan for oversized images (edge tiles "
    "clipped): per-row double sequence explode, zero shuffle — the "
    "patch scheduler for a vision encoder",
)
def mm_image_tile_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tile an image grid into encoder-sized patches — the 2D analogue
    of ``doc_chunk_split`` (ViT patching / SAM tiling): every image
    yields ceil(w/T)·ceil(h/T) tiles, edge tiles carry their clipped
    true size. Dimensions are synthesized deterministically from
    doc_id (the corpus has no real images — same convention as the
    decode stub).

    Scale: the tile list is generated per row with two nested
    ``sequence``+``explode`` — a narrow flatMap that pipelines with
    the scan, no shuffle, no Python. The decoder then consumes
    (doc_id, tile_x, tile_y) work units, which is exactly the unit a
    GPU batcher wants to pack.
    """
    docs = load(spark, "documents", sf_dir)
    dims = docs.select(
        "doc_id",
        (64 + (F.col("doc_id") % 9) * 32).alias("width"),
        (48 + (F.col("doc_id") % 7) * 32).alias("height"),
    )
    ntx = F.expr(f"(width + {_TILE} - 1) div {_TILE}")
    nty = F.expr(f"(height + {_TILE} - 1) div {_TILE}")
    tiles = dims.select(
        "doc_id",
        "width",
        "height",
        ntx.alias("ntx"),
        F.explode(F.sequence(F.lit(0), ntx * nty - 1)).alias("k"),
    )
    tx = F.col("k") % F.col("ntx")
    ty = F.expr("k div ntx")
    return tiles.select(
        "doc_id",
        "width",
        "height",
        tx.alias("tile_x"),
        ty.alias("tile_y"),
        F.least(F.lit(_TILE), F.col("width") - tx * _TILE).alias("tile_w"),
        F.least(F.lit(_TILE), F.col("height") - ty * _TILE).alias("tile_h"),
    )


_COLLATE_B = 32  # images per training batch
_SIZE_CLASS_PX = 262144  # 512x512 pixel-count classes for bucketed batching


_SQL_COLLATE = f"""
    WITH meta AS (
      SELECT doc_id,
             CAST(16 * (8 + (doc_id * 7) % 120) AS BIGINT) AS w,
             CAST(16 * (8 + (doc_id * 13) % 120) AS BIGINT) AS h
      FROM documents
    ), by_id AS (
      SELECT 'by_id' AS strategy, doc_id // {_COLLATE_B} AS batch_id, w, h
      FROM meta
    ), ranked AS (
      SELECT doc_id, w, h, (w * h) // {_SIZE_CLASS_PX} AS sc,
             ROW_NUMBER() OVER (PARTITION BY (w * h) // {_SIZE_CLASS_PX}
               ORDER BY h, w, doc_id) - 1 AS rk
      FROM meta
    ), by_size AS (
      SELECT 'by_size' AS strategy,
             sc * 100000 + rk // {_COLLATE_B} AS batch_id, w, h
      FROM ranked
    ), u AS (
      SELECT * FROM by_id UNION ALL SELECT * FROM by_size
    )
    SELECT strategy, CAST(batch_id AS BIGINT) AS batch_id,
           CAST(COUNT(*) AS BIGINT) AS n_imgs,
           CAST(MAX(w) AS BIGINT) AS max_w,
           CAST(MAX(h) AS BIGINT) AS max_h,
           CAST(SUM(w * h) AS BIGINT) AS px_payload,
           CAST(COUNT(*) * MAX(w) * MAX(h) AS BIGINT) AS px_padded,
           CAST((COUNT(*) * MAX(w) * MAX(h) - SUM(w * h)) * 1000000
                // (COUNT(*) * MAX(w) * MAX(h)) AS BIGINT) AS waste_ppm
    FROM u GROUP BY strategy, batch_id
"""


@register(
    "mm_batch_collate_plan",
    _SQL_COLLATE,
    doc=f"training-batch collation planning ({_COLLATE_B} imgs/batch): "
    "per-batch padded dims and integer-ppm padding waste, for naive "
    "id-order vs dimension-sorted batching — the vision twin of "
    "pack_sequences",
)
def mm_batch_collate_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vision-batch collation: images in a batch are padded to the
    batch max (w, h), so batch composition determines wasted pixels
    (= wasted FLOPs). This op plans batches two ways and quantifies
    the difference:

    - ``by_id``: arrival-order batching (the naive loader).
    - ``by_size``: size-class bucketed batching — images are first
      bucketed into 512×512-pixel-count classes (``(w*h) div 262144``,
      a pure arithmetic key), then dimension-sorted and batched WITHIN
      each class. Similar shapes land together, collapsing padding
      waste (the bucketed-batching trick every production vision
      loader ships); batch ids are namespaced per class
      (``sc*100000 + rank div B``).

    Pure metadata planning — payload bytes are never touched (the
    ``mm_resize_dims`` rule: plan in typed columns, decode only what
    training actually loads). All outputs are exact integers;
    waste_ppm is an integer floor-ratio.

    Scale: by_id groups on an arithmetic key (map-side combined,
    no sort). by_size windows PARTITION BY size class — each executor
    sorts one pixel-count class, never the whole corpus (round 3's
    global row_number was the repo's last full-table single-partition
    sort). Padding cares only about within-class order, so class-
    local ranks are exactly as good as a global rank; at 100 TB add
    a second salt key inside hot classes if one class dominates.
    """
    docs = load(spark, "documents", sf_dir)
    meta = docs.select(
        "doc_id",
        (16 * (8 + (F.col("doc_id") * 7) % 120)).cast("long").alias("w"),
        (16 * (8 + (F.col("doc_id") * 13) % 120)).cast("long").alias("h"),
    )
    by_id = meta.select(
        F.lit("by_id").alias("strategy"),
        F.expr(f"doc_id div {_COLLATE_B}").alias("batch_id"),
        "w",
        "h",
    )
    from pyspark.sql.window import Window as _W

    sc = F.expr(f"(w * h) div {_SIZE_CLASS_PX}")
    rk = (
        F.row_number().over(
            _W.partitionBy("sc").orderBy("h", "w", "doc_id")
        )
        - 1
    )
    by_size = meta.withColumn("sc", sc).select(
        "w", "h", "sc", rk.cast("long").alias("rk")
    ).select(
        F.lit("by_size").alias("strategy"),
        # integer div, matching the oracle's `rk // B` — never a float
        # division truncated back to integer (repo convention)
        F.expr(f"sc * 100000 + rk div {_COLLATE_B}").alias("batch_id"),
        "w",
        "h",
    )
    u = by_id.unionByName(by_size)
    return u.groupBy("strategy", "batch_id").agg(
        F.count(F.lit(1)).alias("n_imgs"),
        F.max("w").alias("max_w"),
        F.max("h").alias("max_h"),
        F.sum(F.col("w") * F.col("h")).alias("px_payload"),
        (F.count(F.lit(1)) * F.max("w") * F.max("h")).alias("px_padded"),
        F.expr(
            "(count(1) * max(w) * max(h) - sum(w * h)) * 1000000"
            " div (count(1) * max(w) * max(h))"
        )
        .cast("long")
        .alias("waste_ppm"),
    )


_SHARD_BYTES = 20000  # target payload bytes per training shard


@register(
    "mm_shard_manifest",
    f"""
    WITH d AS (
      SELECT doc_id, n_chars,
             SUM(n_chars) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS bytes_before
      FROM documents
    ), s AS (
      SELECT doc_id, n_chars,
             CAST(COALESCE(bytes_before, 0) // {_SHARD_BYTES} AS BIGINT)
               AS shard_id
      FROM d
    )
    SELECT shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS shard_bytes,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM s GROUP BY shard_id
    """,
    doc=f"webdataset-style shard manifest: docs packed into "
    f"~{_SHARD_BYTES}-byte shards by cumulative payload in id order — "
    "per-shard counts, bytes, and doc ranges (the tar/TFRecord plan)",
)
def mm_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard planning (webdataset/TFRecord): assign records
    to fixed-byte-budget shards by CUMULATIVE payload size in a
    stable order, and emit the manifest (count, bytes, id range per
    shard) the loader's shuffle-by-shard reads. Assignment uses the
    bytes BEFORE each doc (exclusive prefix sum), so a record always
    lands in the shard that was open when it arrived — shards may
    overflow by at most one record, never undershoot, and every
    record maps to exactly one shard deterministically.

    Contiguous id ranges per shard (asserted in tests) are what make
    the manifest seekable: a reader maps shard → [first_doc,
    last_doc] and scans that slice only.

    Scale: one global prefix sum — at 100 TB this is the
    repartitionByRange + per-partition-offset two-pass prefix sum
    (the documented global-sort recipe); per-shard rollup is
    map-side-combined. n_chars stands in for the real payload byte
    length (``mm_binary_meta``'s length column in production).
    """
    docs = load(spark, "documents", sf_dir)
    s = with_prefix_agg(
        docs.select("doc_id", "n_chars"), "doc_id", (), "n_chars", "sum",
        out="bytes_before", inclusive=False,
    ).select(
        "doc_id",
        "n_chars",
        F.expr(
            f"cast(coalesce(bytes_before, 0) div {_SHARD_BYTES} as bigint)"
        ).alias("shard_id"),
    )
    return s.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("shard_bytes"),
        F.min("doc_id").cast("long").alias("first_doc"),
        F.max("doc_id").cast("long").alias("last_doc"),
    )


def _xmodal_sql() -> str:
    nrm = (
        "(SELECT SUM(q * q) FROM (SELECT CAST(FLOOR(CAST(x AS DOUBLE) "
        "* 1000000.0 + 0.5) AS BIGINT) AS q FROM unnest(e.embedding) u(x)))"
    )
    return f"""
    WITH j AS (
      SELECT d.lang, CAST(d.n_chars AS HUGEINT) AS x,
             CAST({nrm} // 1000000000 AS HUGEINT) AS y
      FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    ),
    m AS (
      SELECT lang, CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * x) AS sxx,
             SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM j GROUP BY lang
    )
    SELECT lang, CAST(n AS BIGINT) AS n_pairs,
      CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0 THEN
        FLOOR(CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE) /
        SQRT(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) *
             CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE))
        * 1000000000.0 + 0.5) / 1000000000.0
      END AS corr_len_norm
    FROM m
    """


@register(
    "mm_text_embed_consistency",
    _xmodal_sql(),
    doc="cross-modal consistency audit: per-lang Pearson correlation "
    "between document length and embedding squared norm (exact "
    "integer moments) — a broken embedding batch (zeros, truncation, "
    "misaligned ids) shows up as a correlation break",
)
def mm_text_embed_consistency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Joins the text modality to its embedding modality on the shared
    id and correlates a cheap text statistic (length) with a cheap
    vector statistic (squared norm), per language. The absolute value
    is uninteresting; the MONITORED value is its stability — an
    embedding-service regression (zero vectors, wrong truncation,
    id misalignment after a backfill) breaks the correlation
    immediately. This is the cross-modal twin of ``dq_value_drift_psi``.

    Determinism: squared norms are exact integer sums on the 1e6
    grid, floor-scaled by 1e9 to keep the second moment inside
    HUGEINT/DECIMAL(38,0) (the pre-scale overflow rule); the Pearson
    is the agg_corr exact-moment form, quantized at 1e-9.

    Scale: one equi-join on the id (both sides id-partitioned in a
    real lake — co-located), one map-side-combined moment aggregate
    per lang. No vector pairwise work at all.
    """
    docs = load(spark, "documents", sf_dir)
    emb = load(spark, "embeddings", sf_dir)
    j = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "lang",
        F.col("n_chars").cast("decimal(38,0)").alias("x"),
        F.expr(
            "aggregate(transform(embedding, "
            "x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS LONG)), "
            "0L, (acc, q) -> acc + q * q) div 1000000000"
        )
        .cast("decimal(38,0)")
        .alias("y"),
    )
    m = j.groupBy("lang").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    d = lambda c: c.cast("string").cast("double")  # noqa: E731
    varx = m.n * m.sxx - m.sx * m.sx
    vary = m.n * m.syy - m.sy * m.sy
    cov = m.n * m.sxy - m.sx * m.sy
    r = F.when(
        (varx > 0) & (vary > 0),
        F.floor(
            d(cov) / F.sqrt(d(varx) * d(vary)) * F.lit(1e9) + F.lit(0.5)
        )
        / F.lit(1e9),
    )
    return m.select(
        "lang",
        F.col("n").cast("long").alias("n_pairs"),
        r.alias("corr_len_norm"),
    )


_IL_CHUNK = 200  # chars per text chunk (doc_chunk_split's geometry)
_IL_IMG_EVERY = 2  # one image slot after every 2 text chunks


@register(
    "mm_interleave_plan",
    f"""
    WITH chunks AS (
      SELECT doc_id, unnest(range(0,
             CAST(CEIL(CAST(length(text) AS DOUBLE) / {_IL_CHUNK})
                  AS BIGINT))) AS chunk_idx
      FROM documents
    ),
    seq AS (
      SELECT doc_id, chunk_idx,
             chunk_idx + chunk_idx // {_IL_IMG_EVERY} AS seq_pos,
             'text' AS kind,
             CAST(chunk_idx AS BIGINT) AS ref
      FROM chunks
      UNION ALL
      SELECT doc_id,
             CAST(NULL AS BIGINT),
             (img + 1) * {_IL_IMG_EVERY} + img AS seq_pos,
             'image' AS kind,
             img AS ref
      FROM (
        SELECT doc_id, unnest(range(0,
               CAST(CEIL(CAST(length(text) AS DOUBLE) / {_IL_CHUNK})
                    AS BIGINT) // {_IL_IMG_EVERY})) AS img
        FROM documents) t
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CASE WHEN kind = 'text' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_text,
           CAST(SUM(CASE WHEN kind = 'image' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_images,
           CAST(MAX(seq_pos) AS BIGINT) AS last_pos,
           COALESCE(COUNT(*) = MAX(seq_pos) + 1
                    AND COUNT(DISTINCT seq_pos) = COUNT(*), FALSE)
             AS layout_dense
    FROM seq GROUP BY doc_id
    """,
    doc="interleaved multimodal sequence planning (MMC4-style): text "
    "chunks and image slots merged into one dense, gap-free position "
    "layout per document — density pinned in-plan; the arithmetic "
    "that turns separate modality tables into a training sequence",
)
def mm_interleave_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved-modality training data (the MMC4/Flamingo layout):
    a document's text chunks and its image slots must merge into ONE
    position-addressed sequence. The layout is pure integer
    arithmetic — text chunk i sits at i + i div k (shifted past the
    images already emitted), image j sits after every k-th chunk at
    (j+1)·k + j — and the plan PROVES per document that positions are
    dense and collision-free (count == max_pos+1 == distinct), the
    invariant the packer downstream assumes. The image DECODE stays
    in the mapInPandas stub stage; this is the shuffle-free planning
    step, like ``mm_batch_collate_plan``.

    Scale: two scan-level explodes unioned, one groupBy(doc_id) —
    the fact table never shuffles raw text, only (doc, position)
    rows. Sequence assembly then sorts WITHIN each doc partition.
    """
    docs = load(spark, "documents", sf_dir)
    n_chunks = F.ceil(
        F.length("text").cast("double") / F.lit(_IL_CHUNK)
    ).cast("long")
    text = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    ).select(
        "doc_id",
        (
            F.col("chunk_idx")
            + F.expr(f"chunk_idx div {_IL_IMG_EVERY}")
        ).alias("seq_pos"),
        F.lit("text").alias("kind"),
        F.col("chunk_idx").cast("long").alias("ref"),
    )
    n_imgs = F.expr(
        f"CAST(CEIL(CAST(length(text) AS DOUBLE) / {_IL_CHUNK}) AS BIGINT) "
        f"div {_IL_IMG_EVERY}"
    )
    imgs = docs.select(
        "doc_id",
        F.explode(
            # n_imgs = 0 would make sequence(0, -1) DESCEND ([0, -1])
            # — the shingles guard: emit an empty array instead
            F.when(
                n_imgs > 0, F.sequence(F.lit(0), n_imgs - 1)
            ).otherwise(F.array().cast("array<bigint>"))
        ).alias("img"),
    ).select(
        "doc_id",
        (
            (F.col("img") + 1) * F.lit(_IL_IMG_EVERY) + F.col("img")
        ).alias("seq_pos"),
        F.lit("image").alias("kind"),
        F.col("img").cast("long").alias("ref"),
    )
    seq = text.unionByName(imgs)
    return seq.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(F.when(F.col("kind") == "text", 1).otherwise(0))
        .cast("long")
        .alias("n_text"),
        F.sum(F.when(F.col("kind") == "image", 1).otherwise(0))
        .cast("long")
        .alias("n_images"),
        F.max("seq_pos").cast("long").alias("last_pos"),
        F.coalesce(
            (F.count(F.lit(1)) == F.max("seq_pos") + 1)
            & (F.countDistinct("seq_pos") == F.count(F.lit(1))),
            F.lit(False),
        ).alias("layout_dense"),
    )


@register(
    "mm_modality_coverage",
    """
    WITH j AS (
      SELECT d.lang, d.source,
             CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END AS has_emb
      FROM documents d LEFT JOIN embeddings e ON e.vec_id = d.doc_id
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(has_emb) AS BIGINT) AS n_with_embedding,
           CAST(SUM(has_emb) * 1000000 // COUNT(*) AS BIGINT)
             AS coverage_ppm,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
    FROM j GROUP BY lang
    """,
    doc="modality-completeness matrix: per language, how many "
    "documents have their embedding modality present (left-join "
    "coverage, integer ppm) — the dataset-card row multimodal "
    "training joins silently depend on",
)
def mm_modality_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modality coverage — the silent-skew detector for multimodal
    training: the inner join in ``train_assembly_e2e`` DROPS any
    document whose embedding is missing, so uneven coverage across
    languages becomes an invisible re-weighting of the training mix.
    This audit makes the drop visible per language BEFORE assembly:
    a lang at 40% coverage will be under-represented 2.5× after the
    join no matter what the mixture weights say.

    Scale: one id-keyed left join (bucketed/co-located at 100 TB —
    the presence check never reads the vector payload, only the key
    column), one map-side-combined rollup.
    """
    docs = load(spark, "documents", sf_dir)
    emb = load(spark, "embeddings", sf_dir).select("vec_id")
    j = docs.join(emb, docs.doc_id == emb.vec_id, "left").select(
        "lang",
        "source",
        F.when(F.col("vec_id").isNotNull(), 1).otherwise(0).alias("has_emb"),
    )
    return j.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("has_emb").cast("long").alias("n_with_embedding"),
        F.expr("sum(has_emb) * 1000000 div count(1)")
        .cast("long")
        .alias("coverage_ppm"),
        F.countDistinct("source").cast("long").alias("n_sources"),
    )


# ---------- flagship: multimodal curation report, end to end ----------

_DHASH_DUP_T = 10  # Hamming ≤ 10 of 56 bits → near-duplicate pair


def _mm_curate_oracle() -> str:
    """Compose the REGISTERED oracles of the real byte decoders into
    one (modality, metric, value) report — the anomaly_suite_e2e
    pattern: each subquery is an individually hash-checked op, so the
    flagship cannot drift from its parts."""
    # force the providers to register (module import order is not
    # registration order — the round-7 convention)
    import cs_pipeline_spark.sources.flac  # noqa: F401
    import cs_pipeline_spark.sources.gif  # noqa: F401
    import cs_pipeline_spark.sources.jpeg  # noqa: F401
    import cs_pipeline_spark.sources.mp3  # noqa: F401
    import cs_pipeline_spark.sources.mp4  # noqa: F401
    import cs_pipeline_spark.sources.png  # noqa: F401
    import cs_pipeline_spark.sources.wav  # noqa: F401
    import cs_pipeline_spark.sources.webp  # noqa: F401
    from cs_pipeline_spark.registry import _REGISTRY

    o = {
        k: _REGISTRY[k].oracle
        for k in (
            "mm_decode_wav",
            "mm_audio_energy",
            "mm_audio_silence_trim",
            "mm_decode_flac_meta",
            "mm_decode_jpeg_dc",
            "mm_image_dhash",
            "mm_decode_gif_meta",
            "mm_decode_webp_meta",
            "mm_exif_gps",
            "mm_decode_mp4_meta",
            "mm_video_keyframes",
            "mm_video_hevc_meta",
            "mm_png_provenance",
            "mm_id3_tags",
        )
    }
    return f"""
    SELECT 'audio' AS modality, 'n_clips' AS metric,
           CAST(COUNT(*) AS BIGINT) AS value
    FROM ({o['mm_decode_wav']})
    UNION ALL
    SELECT 'audio', 'total_ms', CAST(SUM(duration_ms) AS BIGINT)
    FROM ({o['mm_decode_wav']})
    UNION ALL
    SELECT 'audio', 'silent_frames', CAST(SUM(is_silence) AS BIGINT)
    FROM ({o['mm_audio_energy']})
    UNION ALL
    SELECT 'audio', 'voiced_frames',
           CAST(SUM(1 - is_silence) AS BIGINT)
    FROM ({o['mm_audio_energy']})
    UNION ALL
    SELECT 'image', 'n_jpeg', CAST(COUNT(*) AS BIGINT)
    FROM ({o['mm_decode_jpeg_dc']})
    UNION ALL
    SELECT 'image', 'blank_jpeg', CAST(SUM(is_blank) AS BIGINT)
    FROM ({o['mm_decode_jpeg_dc']})
    UNION ALL
    SELECT 'image', 'near_dup_pairs', CAST(COUNT(*) AS BIGINT)
    FROM ({o['mm_image_dhash']}) WHERE hamming <= {_DHASH_DUP_T}
    UNION ALL
    SELECT 'image', 'compared_pairs', CAST(COUNT(*) AS BIGINT)
    FROM ({o['mm_image_dhash']})
    UNION ALL
    SELECT 'image', 'gif_frames', CAST(SUM(n_frames) AS BIGINT)
    FROM ({o['mm_decode_gif_meta']})
    UNION ALL
    SELECT 'image', 'gif_anim_ms', CAST(SUM(total_delay_cs) * 10 AS BIGINT)
    FROM ({o['mm_decode_gif_meta']})
    UNION ALL
    SELECT 'image', 'webp_alpha', CAST(SUM(has_alpha) AS BIGINT)
    FROM ({o['mm_decode_webp_meta']})
    UNION ALL
    SELECT 'privacy', 'gps_tagged', CAST(SUM(has_gps) AS BIGINT)
    FROM ({o['mm_exif_gps']})
    UNION ALL
    SELECT 'audio', 'flac_clips', CAST(COUNT(*) AS BIGINT)
    FROM ({o['mm_decode_flac_meta']})
    UNION ALL
    SELECT 'audio', 'flac_ms', CAST(SUM(duration_ms) AS BIGINT)
    FROM ({o['mm_decode_flac_meta']})
    UNION ALL
    SELECT 'audio', 'trimmed_windows',
           CAST(SUM(leading_silence + trailing_silence) AS BIGINT)
    FROM ({o['mm_audio_silence_trim']})
    UNION ALL
    SELECT 'audio', 'kept_windows', CAST(SUM(kept_windows) AS BIGINT)
    FROM ({o['mm_audio_silence_trim']})
    UNION ALL
    SELECT 'video', 'n_clips', CAST(COUNT(*) AS BIGINT)
    FROM ({o['mm_decode_mp4_meta']})
    UNION ALL
    SELECT 'video', 'total_ms', CAST(SUM(duration_ms) AS BIGINT)
    FROM ({o['mm_decode_mp4_meta']})
    UNION ALL
    SELECT 'video', 'keyframes', CAST(COUNT(*) AS BIGINT)
    FROM ({o['mm_video_keyframes']})
    UNION ALL
    SELECT 'video', 'gop_bytes', CAST(SUM(gop_bytes) AS BIGINT)
    FROM ({o['mm_video_keyframes']})
    UNION ALL
    SELECT 'video', 'hevc_clips', CAST(COUNT(*) AS BIGINT)
    FROM ({o['mm_video_hevc_meta']})
    UNION ALL
    SELECT 'video', 'hevc_10bit', CAST(SUM(CASE WHEN bit_depth = 10
           THEN 1 ELSE 0 END) AS BIGINT)
    FROM ({o['mm_video_hevc_meta']})
    UNION ALL
    SELECT 'provenance', 'ai_generated',
           CAST(SUM(ai_generated) AS BIGINT)
    FROM ({o['mm_png_provenance']})
    UNION ALL
    SELECT 'provenance', 'text_chunks',
           CAST(SUM(n_text + n_ztxt + n_itxt) AS BIGINT)
    FROM ({o['mm_png_provenance']})
    UNION ALL
    SELECT 'provenance', 'tagged_tracks', CAST(COUNT(*) AS BIGINT)
    FROM ({o['mm_id3_tags']})
    UNION ALL
    SELECT 'provenance', 'distinct_artists',
           CAST(COUNT(DISTINCT artist) AS BIGINT)
    FROM ({o['mm_id3_tags']})
    """


@register(
    "mm_curate_e2e",
    _mm_curate_oracle(),
    doc="flagship #7: the multimodal curation report end to end — real "
    "WAV decode (clip count, total duration), framed energy (silent vs "
    "voiced frames), baseline-JPEG DC decode (blank-image screen), "
    "perceptual dHash near-dup pairs, GIF frame/animation census, WebP "
    "alpha census, the EXIF GPS location-PII count, FLAC inventory, "
    "silence-trim mass, MP4 video inventory + GOP census, HEVC "
    "clip/bit-depth census, PNG provenance (AI-generation stamps, "
    "text-chunk mass), and ID3 attribution (tagged tracks, distinct "
    "artists) composed into one (modality, metric, value) report; "
    "both sides reuse the fourteen hash-checked decoder definitions "
    "by reference",
)
def mm_curate_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-page answer to 'what is in this multimodal shard and
    what would curation cut?' — audio inventory and silence mass
    (VAD-style), blank-image counts from the JPEG DC screen, and
    dHash near-duplicate pairs at Hamming ≤ 10 of 56 bits.

    Composition is by reference (the anomaly_suite_e2e contract):
    the Spark side calls the four REGISTERED decode builders
    (memoized), the oracle embeds their registered SQL as subqueries
    — structurally incapable of disagreeing with the parts.

    Scale: every part is per-file mapInPandas decode work (see their
    docstrings); the flagship adds one 1-row aggregate per decoder —
    run as concurrent jobs (guide §2.6) — and a 26-row literal report.
    """
    from cs_pipeline_spark.sources.flac import mm_decode_flac_meta
    from cs_pipeline_spark.sources.gif import mm_decode_gif_meta
    from cs_pipeline_spark.sources.jpeg import mm_decode_jpeg_dc, mm_exif_gps
    from cs_pipeline_spark.sources.mp3 import mm_id3_tags
    from cs_pipeline_spark.sources.mp4 import (
        mm_decode_mp4_meta,
        mm_video_hevc_meta,
        mm_video_keyframes,
    )
    from cs_pipeline_spark.sources.png import (
        mm_image_dhash,
        mm_png_provenance,
    )
    from cs_pipeline_spark.sources.wav import (
        mm_audio_energy,
        mm_audio_silence_trim,
        mm_decode_wav,
    )
    from cs_pipeline_spark.sources.webp import mm_decode_webp_meta

    # sub-builder CALLS run inside the pool workers below (their
    # registered wrappers push their own pin-stack keys per thread —
    # the r10 thread-local-pin convention), so plan construction of
    # the 14 decoders overlaps too, not just their jobs.
    wav, energy, jdc, dh = (
        mm_decode_wav, mm_audio_energy, mm_decode_jpeg_dc, mm_image_dhash
    )
    gif, webp, gps, flac = (
        mm_decode_gif_meta, mm_decode_webp_meta, mm_exif_gps,
        mm_decode_flac_meta,
    )
    trim, mp4, gop, hevc = (
        mm_audio_silence_trim, mm_decode_mp4_meta, mm_video_keyframes,
        mm_video_hevc_meta,
    )
    prov, id3 = mm_png_provenance, mm_id3_tags

    # ONE aggregate per decoder (the lake_audit_e2e rationale, guide
    # §1.2), and — r11, guide §2.6 — the 14 independent decode+agg
    # jobs run CONCURRENTLY from a thread pool at build time instead
    # of sequentially inside one union action: each job's decode tail
    # back-fills cores freed by the others, so cold ≈ max(decoder)
    # instead of Σ. The 26 bounded (modality, metric, value) rows are
    # collected and returned as a literal relation (the r10 bounded-
    # pick convention: emb_kmeans_lloyd/BPE merge tables) — every
    # action still computes from the raw files at build time (the
    # bench evicts the memoized plan before each timed run), nothing
    # persists across invocations. The cast(value as long) matches the
    # previous stack() unpivot bit-for-bit; same 26 rows/labels/values.
    def block(builder, metrics) -> list:
        agg = builder(spark, sf_dir).agg(
            *[
                c.cast("long").alias(f"m{i}")
                for i, (_, _, c) in enumerate(metrics)
            ]
        )
        row = agg.collect()[0]
        return [
            (mod, met, row[f"m{i}"])
            for i, (mod, met, _) in enumerate(metrics)
        ]

    blocks = [
        (wav, [
            ("audio", "n_clips", F.count(F.lit(1))),
            ("audio", "total_ms", F.sum("duration_ms")),
        ]),
        (energy, [
            ("audio", "silent_frames", F.sum("is_silence")),
            ("audio", "voiced_frames", F.sum(1 - F.col("is_silence"))),
        ]),
        (jdc, [
            ("image", "n_jpeg", F.count(F.lit(1))),
            ("image", "blank_jpeg", F.sum("is_blank")),
        ]),
        (dh, [
            ("image", "near_dup_pairs",
             F.count(
                 F.when(F.col("hamming") <= _DHASH_DUP_T, F.lit(1))
             )),
            ("image", "compared_pairs", F.count(F.lit(1))),
        ]),
        (gif, [
            ("image", "gif_frames", F.sum("n_frames")),
            ("image", "gif_anim_ms", F.sum("total_delay_cs") * 10),
        ]),
        (webp, [
            ("image", "webp_alpha", F.sum("has_alpha")),
        ]),
        (gps, [
            ("privacy", "gps_tagged", F.sum("has_gps")),
        ]),
        (flac, [
            ("audio", "flac_clips", F.count(F.lit(1))),
            ("audio", "flac_ms", F.sum("duration_ms")),
        ]),
        (trim, [
            ("audio", "trimmed_windows",
             F.sum(
                 F.col("leading_silence") + F.col("trailing_silence")
             )),
            ("audio", "kept_windows", F.sum("kept_windows")),
        ]),
        (mp4, [
            ("video", "n_clips", F.count(F.lit(1))),
            ("video", "total_ms", F.sum("duration_ms")),
        ]),
        (gop, [
            ("video", "keyframes", F.count(F.lit(1))),
            ("video", "gop_bytes", F.sum("gop_bytes")),
        ]),
        (hevc, [
            ("video", "hevc_clips", F.count(F.lit(1))),
            ("video", "hevc_10bit",
             F.sum(F.when(F.col("bit_depth") == 10, 1).otherwise(0))),
        ]),
        (prov, [
            ("provenance", "ai_generated", F.sum("ai_generated")),
            ("provenance", "text_chunks",
             F.sum(
                 F.col("n_text") + F.col("n_ztxt") + F.col("n_itxt")
             )),
        ]),
        (id3, [
            ("provenance", "tagged_tracks", F.count(F.lit(1))),
            ("provenance", "distinct_artists",
             F.countDistinct("artist")),
        ]),
    ]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=10) as ex:
        futs = [ex.submit(block, builder, m) for builder, m in blocks]
        rows = [r for f in futs for r in f.result()]
    return literal_df(
        spark, rows, "modality string, metric string, value long"
    )
