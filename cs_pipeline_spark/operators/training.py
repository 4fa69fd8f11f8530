"""Training-data assembly operators (SURVEY §2.10 extension, north star).

The last mile of an LLM data pipeline, after curation (text.py) and
dedup (dedup.py): split documents into model-sized chunks, pack
variable-length documents into fixed token budgets, score text against
a corpus language model, and canonicalize URLs for crawl dedup.

Scale design (100 TB):

- ``doc_chunk_split``: chunk offsets are computed per row with
  ``sequence`` + ``posexplode`` — zero shuffle, zero Python; output
  size is corpus_chars/stride rows, each carrying an md5 instead of
  the chunk text, so the operator's own output stays narrow.
- ``pack_sequences``: one window cumsum per source partition (a single
  range-partition shuffle on (source, doc_id)) followed by integer
  bin assignment — the contiguous-fill packing a streaming tokenizer
  uses; no driver-side bin state.
- ``text_lm_score``: corpus unigram counts (one map-side-combined
  shuffle on term), joined back on the same key (exchange reuse), and
  integer-exact moments only — the float "mean corpus frequency"
  is a SINGLE correctly-rounded division per doc, so the score is
  bit-identical on any engine/topology.
- ``dedup_url_canonical``: pure per-row regexp canonicalization, then
  a hash-groupBy on the canonical key — same shape (and same scale
  story) as ``dedup_exact``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cs_pipeline_spark.operators.dedup import (
    _NORM,
    _NORM_DUCK,
    _sql_shingles,
    _tokens,
    shingles,
)
from cs_pipeline_spark.registry import pin, register
from cs_pipeline_spark.tables import load

_DUCK_TOKENS = f"string_split({_NORM_DUCK}, ' ')"

# ---------- fixed-window chunking (training-example splitter) ----------

_CHUNK = 200  # chars per chunk
_STRIDE = 150  # chunk start interval → 50-char overlap


@register(
    "doc_chunk_split",
    f"""
    WITH n AS (SELECT doc_id, {_NORM_DUCK} AS t FROM documents)
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_idx,
           CAST((i * {_STRIDE}) + 1 AS BIGINT) AS chunk_off,
           CAST(length(substring(t, (i * {_STRIDE}) + 1, {_CHUNK})) AS BIGINT)
             AS chunk_chars,
           md5(substring(t, (i * {_STRIDE}) + 1, {_CHUNK})) AS chunk_md5
    FROM n, unnest(range(0, greatest(
          CAST(ceil((length(t) - {_CHUNK}) / {_STRIDE}.0) AS BIGINT) + 1,
          1))) AS u(i)
    """,
    doc=f"split docs into {_CHUNK}-char chunks, stride {_STRIDE} "
    f"(overlap {_CHUNK - _STRIDE}) — per-row sequence+posexplode, zero "
    "shuffle; chunks carried as md5, not text",
)
def doc_chunk_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-window chunking — the context-window splitter
    that turns documents into training examples.

    Chunk k covers chars [k·stride, k·stride + chunk); the last chunk
    is the first one whose window reaches the end (so short tails are
    not emitted twice), and every doc emits ≥ 1 chunk (empty docs
    included, as one empty chunk — deterministic row count).

    Scale: offsets come from ``sequence(0, n_chunks-1)`` evaluated
    per row and ``posexplode`` — a narrow-dependency flatMap, no
    shuffle, no Python. Emitting ``md5(chunk)`` keeps the output
    ~60 bytes/row regardless of chunk size; a downstream tokenizer
    reads the (doc_id, chunk_off) coordinates instead of re-shipping
    text.
    """
    docs = load(spark, "documents", sf_dir)
    t = F.expr(_NORM)
    n_chunks = F.greatest(
        F.ceil((F.length("t") - F.lit(_CHUNK)) / F.lit(float(_STRIDE)))
        + F.lit(1),
        F.lit(1),
    )
    chunk = F.substring("t", (F.col("i") * _STRIDE + 1).cast("int"), _CHUNK)
    return (
        docs.select("doc_id", t.alias("t"))
        .select(
            "doc_id",
            "t",
            F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("long"))).alias(
                "i"
            ),
        )
        .select(
            "doc_id",
            F.col("i").alias("chunk_idx"),
            (F.col("i") * _STRIDE + 1).alias("chunk_off"),
            F.length(chunk).cast("long").alias("chunk_chars"),
            F.md5(chunk).alias("chunk_md5"),
        )
    )


# ---------- token-budget sequence packing ----------

_BUDGET = 512  # whitespace tokens per packed sequence


@register(
    "pack_sequences",
    f"""
    WITH toks AS (
      SELECT doc_id, source, len({_DUCK_TOKENS}) AS n_tokens
      FROM documents
    ), packed AS (
      SELECT source, n_tokens,
             CAST(floor((SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - 1) / {_BUDGET}) AS BIGINT) AS bin_id
      FROM toks
    )
    SELECT source, bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM packed GROUP BY source, bin_id
    """,
    doc=f"contiguous-fill sequence packing into {_BUDGET}-token bins "
    "(cumsum window + integer bin id) — the batch-assembly planner",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into fixed token budgets by contiguous fill:
    docs are laid out in (source, doc_id) order on a token number
    line and bin k owns tokens [k·budget, (k+1)·budget) — the packing
    a streaming tokenizer produces when it concatenates documents and
    cuts every `budget` tokens. A doc belongs to the bin its LAST
    token lands in (``(cumsum−1) div budget``), so bins are contiguous
    doc ranges and every doc has exactly one bin.

    Output is the packing PLAN (per-bin doc count and token total) —
    the thing a batch assembler materializes — not the concatenated
    text.

    Scale: one window cumsum = one range-partition shuffle keyed on
    source (the partition column a crawl corpus is already bucketed
    by); the follow-up groupBy re-uses integer keys with map-side
    combine. All integer arithmetic — no quantization machinery.
    """
    docs = load(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id",
        "source",
        F.size(_tokens(F.expr(_NORM))).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.select(
        "source",
        "n_tokens",
        F.floor((F.sum("n_tokens").over(w) - 1) / _BUDGET).alias("bin_id"),
    )
    return packed.groupBy("source", "bin_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


# ---------- corpus unigram-LM scoring (perplexity proxy) ----------


@register(
    "text_lm_score",
    f"""
    WITH tf AS (
      SELECT doc_id, unnest({_DUCK_TOKENS}) AS term FROM documents
    ), cf AS (
      SELECT term, COUNT(*) AS c FROM tf GROUP BY term
    ), scored AS (
      SELECT tf.doc_id, COUNT(*) AS n_tokens, SUM(cf.c) AS sum_freq
      FROM tf JOIN cf ON cf.term = tf.term
      GROUP BY tf.doc_id
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(sum_freq AS BIGINT) AS sum_freq,
           CAST(sum_freq AS DOUBLE) / CAST(n_tokens AS DOUBLE)
             AS mean_freq
    FROM scored
    """,
    doc="unigram corpus-LM score per doc (mean token corpus-frequency, "
    "the perplexity-proxy curation signal) — integer-exact moments, "
    "one float division",
)
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score each document against a unigram language model built from
    the corpus itself: mean corpus frequency of the document's tokens.
    Natural text scores high (common words), gibberish and boilerplate
    score low/odd — the cheap stand-in for the KenLM-perplexity filter
    in CCNet-style curation, rank-equivalent for outlier cutoffs.

    Determinism: both moments (token count, summed corpus frequency)
    are integers; ``mean_freq`` is one correctly-rounded IEEE division
    of exact integers — bit-identical across engines, no log() in
    sight (ln's last-ulp differs between libm implementations, so a
    true log-prob sum would need quantization; the integer formulation
    needs none).

    Scale: the count table is a map-side-combined shuffle on term; the
    join back to the exploded tokens reuses that term partitioning,
    and the per-doc reduce shuffles (doc_id, partial sums) only. The
    count table is Zipf-shaped but the join is stream-stream on the
    already-partitioned key — no broadcast of an unbounded vocabulary.
    """
    docs = load(spark, "documents", sf_dir)
    tf = docs.select(
        "doc_id", F.explode(_tokens(F.expr(_NORM))).alias("term")
    )
    cf = tf.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    return (
        tf.join(cf, "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("c").cast("long").alias("sum_freq"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "sum_freq",
            (
                F.col("sum_freq").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("mean_freq"),
        )
    )


# ---------- URL canonicalization dedup (crawl frontier) ----------

# Synthetic-but-deterministic URL per doc (the corpus has no URL
# column): doc_id decides host casing, query noise, fragment,
# index.html suffix, and trailing slash — the exact decorations a
# canonicalizer must strip. Same synthesis on both engines.
_URL_SPARK = (
    "concat('https://', "
    "CASE WHEN doc_id % 5 = 0 THEN upper(source) ELSE source END, "
    "'.example.com/page/', CAST(doc_id % 12 AS STRING), "
    "CASE WHEN doc_id % 3 = 0 THEN '/index.html' "
    "     WHEN doc_id % 3 = 1 THEN '/' ELSE '' END, "
    "CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&ref=rss' ELSE '' END, "
    "CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END)"
)
_URL_DUCK = (
    "concat('https://', "
    "CASE WHEN doc_id % 5 = 0 THEN upper(source) ELSE source END, "
    "'.example.com/page/', CAST(doc_id % 12 AS VARCHAR), "
    "CASE WHEN doc_id % 3 = 0 THEN '/index.html' "
    "     WHEN doc_id % 3 = 1 THEN '/' ELSE '' END, "
    "CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&ref=rss' ELSE '' END, "
    "CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END)"
)


def canonical_url(url: F.Column) -> F.Column:
    """Crawl-dedup URL canonicalization: drop query+fragment, strip a
    trailing /index.html, strip the trailing slash, lowercase the
    scheme+host (path case is preserved — it is significant)."""
    c = F.regexp_replace(url, r"[?#].*$", "")
    c = F.regexp_replace(c, r"/index\.html$", "")
    c = F.regexp_replace(c, r"/$", "")
    host = F.regexp_extract(c, r"^(https?://[^/]*)", 1)
    rest = F.regexp_replace(c, r"^https?://[^/]*", "")
    return F.concat(F.lower(host), rest)


_STRIP_DUCK = (
    "regexp_replace(regexp_replace(regexp_replace("
    "url, '[?#].*$', ''), '/index\\.html$', ''), '/$', '')"
)
_CANON_DUCK = (
    "concat(lower(regexp_extract(u2, '^(https?://[^/]*)', 1)), "
    "regexp_replace(u2, '^https?://[^/]*', ''))"
).replace("u2", _STRIP_DUCK)

_URL_ORACLE = (
    "WITH raw AS (SELECT doc_id, " + _URL_DUCK + " AS url FROM documents), "
    "canon AS (SELECT doc_id, " + _CANON_DUCK + " AS canonical FROM raw) "
    "SELECT canonical, CAST(COUNT(*) AS BIGINT) AS n_urls, "
    "MIN(doc_id) AS keep_doc_id "
    "FROM canon GROUP BY canonical HAVING COUNT(*) > 1"
)


@register(
    "dedup_url_canonical",
    _URL_ORACLE,
    doc="URL canonicalization dedup: strip query/fragment/index.html/"
    "trailing-slash + lowercase host, hash-groupBy on canonical form "
    "(crawl-frontier dedup; URLs synthesized deterministically)",
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL duplicate groups with the kept (min) doc_id — the
    first dedup stage of a web-crawl pipeline, upstream of content
    hashing: ``?utm_…`` tracking params, ``#fragment``\\ s,
    ``/index.html`` and trailing slashes all collapse, and host case
    folds while path case survives.

    Scale: per-row regexp chain (JVM codegen, no Python), then the
    ``dedup_exact`` shape — a map-side-combined hash-groupBy keyed on
    the canonical string. At crawl scale the canonical key is
    near-unique, so combine output ≈ input and AQE coalesces the
    post-shuffle partitions.
    """
    docs = load(spark, "documents", sf_dir)
    with_url = docs.select("doc_id", F.expr(_URL_SPARK).alias("url"))
    canon = with_url.select(
        "doc_id", canonical_url(F.col("url")).alias("canonical")
    )
    return (
        canon.groupBy("canonical")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("n_urls") > 1)
    )


# ---------- corpus-wide span dedup (C4-style) ----------

_SPAN_N = 8  # tokens per span


@register(
    "dedup_span_corpus",
    f"""
    WITH toks AS (SELECT doc_id, {_DUCK_TOKENS} AS t FROM documents),
    spans AS (
      SELECT doc_id, unnest(list_distinct({_sql_shingles('t', _SPAN_N)})) AS s
      FROM toks
    ), owner AS (
      SELECT s, MIN(doc_id) AS owner_doc FROM spans GROUP BY s
    ), per_doc AS (
      SELECT sp.doc_id,
             COUNT(*) AS n_spans,
             SUM(CASE WHEN ow.owner_doc = sp.doc_id THEN 1 ELSE 0 END)
               AS n_owned
      FROM spans sp JOIN owner ow ON ow.s = sp.s
      GROUP BY sp.doc_id
    )
    SELECT doc_id, CAST(n_spans AS BIGINT) AS n_spans,
           CAST(n_owned AS BIGINT) AS n_owned,
           CAST(n_owned AS DOUBLE) / CAST(n_spans AS DOUBLE) AS own_ratio
    FROM per_doc
    """,
    doc=f"C4-style corpus-wide span dedup plan: distinct {_SPAN_N}-token "
    "spans, first-occurrence (min doc_id) ownership, per-doc retention "
    "ratio — integer moments + one division",
)
def dedup_span_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The planning view of C4's duplicated-span removal: every
    distinct 8-token span belongs to its corpus-first (min doc_id)
    document; later documents repeating the span would have it cut.
    Per doc: how many distinct spans it has, how many it owns, and the
    retention ratio a span-cut pass would leave.

    Docs shorter than the span width emit no spans and drop out — the
    same behavior as C4 (short docs are handled by length filters, not
    span dedup).

    Scale: spans are deduped per doc BEFORE the corpus shuffle
    (list_distinct on the row side), so the groupBy(s) carries each
    (doc, span) once; ownership is a min-aggregate (map-side combine),
    and the join back rides the same span-key partitioning. The span
    strings could be hashed to 16-byte digests to cut wire bytes —
    kept as strings here so the oracle stays readable.
    """
    docs = load(spark, "documents", sf_dir)
    toked = docs.select("doc_id", _tokens(F.expr(_NORM)).alias("t"))
    spans = toked.select(
        "doc_id",
        F.explode(F.array_distinct(shingles(F.col("t"), _SPAN_N))).alias("s"),
    )
    owner = spans.groupBy("s").agg(F.min("doc_id").alias("owner_doc"))
    per_doc = (
        spans.join(owner, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum(
                F.when(F.col("owner_doc") == F.col("doc_id"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_owned"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_spans",
        "n_owned",
        (
            F.col("n_owned").cast("double") / F.col("n_spans").cast("double")
        ).alias("own_ratio"),
    )


# ---------- arbitrary-length exact substring repeats ----------

_REP_K = 8  # anchor width (tokens): repeats of ≥ this length are caught
_REP_PACK = 1_000_000  # packs (doc_id, pos) — positions stay < 1e6


def _rep_sh_sql() -> str:
    return " || ' ' || ".join(f"t[pos + {j}]" for j in range(_REP_K))


_SUBSTR_ORACLE = f"""
    WITH toks AS (SELECT doc_id, {_DUCK_TOKENS} AS t FROM documents),
    wins AS (
      SELECT doc_id,
             unnest(range(1, greatest(len(t) - {_REP_K - 1}, 0) + 1)) AS pos,
             t
      FROM toks
    ), occ AS (
      SELECT doc_id, pos, md5({_rep_sh_sql()}) AS d,
             doc_id * {_REP_PACK} + pos AS packed
      FROM wins
    ), c AS (
      SELECT d, COUNT(*) AS cnt, MIN(packed) AS first_packed
      FROM occ GROUP BY d
    ), cut AS (
      SELECT o.doc_id, o.pos
      FROM occ o JOIN c ON c.d = o.d
      WHERE c.cnt >= 2 AND o.packed > c.first_packed
    ), brk AS (
      SELECT doc_id, pos,
             CASE WHEN pos <= lag(pos) OVER
                    (PARTITION BY doc_id ORDER BY pos) + {_REP_K}
                  THEN 0 ELSE 1 END AS b
      FROM cut
    ), isl AS (
      SELECT doc_id, pos,
             SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS g
      FROM brk
    )
    SELECT doc_id,
           CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) + {_REP_K} - MIN(pos) AS BIGINT) AS span_len,
           CAST(COUNT(*) AS BIGINT) AS n_windows
    FROM isl GROUP BY doc_id, g
"""


@register(
    "dedup_substring_repeats",
    _SUBSTR_ORACLE,
    doc=f"arbitrary-length exact substring dedup (Lee-et-al-style "
    f"'remove every long repeat'): {_REP_K}-token rolling anchors → "
    "corpus-duplicated windows (keep the corpus-first occurrence) → "
    "per-doc gap-merge into MAXIMAL cut spans — the standard "
    "pretraining repeat-removal pass, two-phase rolling-hash instead "
    "of a suffix array",
)
def dedup_substring_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 'remove every repeat of ≥ k tokens' pretraining pass
    (VERDICT r7 missing #3), as a two-phase rolling-anchor plan
    instead of a suffix array:

    1. every k-token window hashes to a 16-byte anchor digest;
    2. an anchor occurring ≥ 2 times corpus-wide marks every
       occurrence EXCEPT the corpus-first (min packed (doc_id, pos))
       as cut;
    3. per doc, cut windows merge into maximal spans whenever they
       overlap or touch (gap ≤ k) — one row per maximal repeated
       span: 1-based token start, token length, window count.

    Recall contract: an exact repeat of length L ≥ k tokens has all
    L−k+1 of its windows duplicated, so the WHOLE repeat is always
    covered by one merged span regardless of L — arbitrary-length
    coverage from fixed-width anchors (the suffix-array guarantee
    that matters). Precision tradeoff vs a true suffix array: two
    distinct repeats closer than k tokens merge into one span, and a
    span's coverage may over-extend by < k tokens at each end —
    acceptable for removal (slightly more text cut, never less).
    Planted-repeat fixture: tests/test_recall_floor.py.

    Scale: the anchor shuffle carries exactly TWO int64s per window —
    an xxhash64 anchor digest and the packed (doc_id, pos) — never
    text (the r10 narrowing, guide §2.3: the md5 form shipped a
    32-char string per row; doc_id/pos unpack from ``packed`` after
    the join, so they don't ride the shuffle either; cut stage 2.4 →
    1.5 s at sf0.1). The digest only decides anchor equality and
    never leaves the stage, so the oracle's md5 keys give identical
    spans absent a 64-bit collision. Collision rate at scale
    (birthday bound, n distinct windows): expected false-duplicate
    anchors ≈ n²/2⁶⁵ — negligible at 2³² windows (~0.5 expected
    collisions over 4·10⁹ windows), but at a 100 TB corpus
    (~10¹³ windows) ≈ 2.7·10⁶ colliding pairs, i.e. ~10⁻⁷ of
    windows falsely flagged. Since a collision only OVER-removes
    (never under-removes) and each costs ≤ 2k+ spurious tokens cut,
    that is ~10⁻⁷ of the corpus — acceptable for a removal pass; if
    deletion precision ever matters, salt-and-pair two independent
    64-bit hashes (collision odds then n²/2¹²⁹). The count pass is map-side
    combined; the join back rides the same digest partitioning
    (dedup_span_corpus shape) with the duplicated-anchor filter
    applied to the aggregated side BEFORE the join. The gap-merge
    window partitions BY DOC (bounded by doc length), never
    globally. At 100 TB this is exactly the deduplicate-text-datasets
    two-pass shape with Spark shuffles replacing the suffix-array
    sort.
    """
    docs = load(spark, "documents", sf_dir)
    toked = docs.select("doc_id", _tokens(F.expr(_NORM)).alias("t"))
    occ = toked.select(
        "doc_id",
        F.posexplode(shingles(F.col("t"), _REP_K)).alias("pos0", "s"),
    ).select(
        F.xxhash64(F.col("s")).alias("d"),
        (F.col("doc_id") * _REP_PACK + F.col("pos0") + 1).alias("packed"),
    )
    # r11: per-anchor min/count as a WINDOW over d instead of
    # groupBy(d) + join back — same hashpartitioning(d) distribution
    # (bounded by anchor multiplicity), but one shuffle and no join:
    # the join form re-shuffled occ a second time and sort-merged it
    # against the aggregate (cut stage noop 1.40 → 0.83 s at sf0.1).
    wd = Window.partitionBy("d")
    cut = (
        occ.withColumn("first_packed", F.min("packed").over(wd))
        .withColumn("cnt", F.count(F.lit(1)).over(wd))
        .filter(
            (F.col("cnt") >= 2)
            & (F.col("packed") > F.col("first_packed"))
        )
        .select(
            F.expr(f"packed div {_REP_PACK}").alias("doc_id"),
            (F.col("packed") % _REP_PACK).alias("pos"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    brk = cut.withColumn(
        "b",
        F.when(F.col("pos") <= F.lag("pos").over(w) + _REP_K, 0).otherwise(1),
    )
    isl = brk.withColumn(
        "g",
        F.sum("b").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return isl.groupBy("doc_id", "g").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + _REP_K - F.min("pos")).alias("span_len"),
        F.count(F.lit(1)).cast("long").alias("n_windows"),
    ).select("doc_id", "span_start", "span_len", "n_windows")


# ---------- hashing-trick featurization ----------

_HASH_DIM = 256


def _fh_spark(feat: str, col: str):
    """(bucket, sign) of the hashing trick for feature `feat=value`.

    md5-based so both engines agree bit-for-bit (Spark's `hash`/xxhash64
    has no DuckDB twin): bucket = first 8 hex digits mod D, sign from
    the 9th hex digit's parity — the signed hashing trick that keeps
    collision noise zero-mean (Weinberger et al., feature hashing).
    """
    h = F.md5(F.concat(F.lit(feat + "="), F.col(col)))
    bucket = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _HASH_DIM
    )
    sign = F.when(
        F.conv(F.substring(h, 9, 1), 16, 10).cast("long") % 2 == 0, 1
    ).otherwise(-1)
    return bucket, sign


def _fh_sql(feat: str, col: str) -> tuple[str, str]:
    h = f"md5('{feat}=' || {col})"
    bucket = (
        f"(CAST(('0x' || substring({h}, 1, 8)) AS BIGINT) % {_HASH_DIM})"
    )
    sign = (
        f"(CASE WHEN CAST(('0x' || substring({h}, 9, 1)) AS BIGINT) % 2 = 0 "
        "THEN 1 ELSE -1 END)"
    )
    return bucket, sign


_LB, _LS = _fh_sql("lang", "lang")
_SB, _SS = _fh_sql("source", "source")


@register(
    "f_feature_hash",
    f"""
    SELECT doc_id,
           CAST({_LB} AS BIGINT) AS lang_bucket,
           CAST({_LS} AS INTEGER) AS lang_sign,
           CAST({_SB} AS BIGINT) AS source_bucket,
           CAST({_SS} AS INTEGER) AS source_sign
    FROM documents
    """,
    doc=f"signed hashing-trick featurization of categoricals into "
    f"{_HASH_DIM} buckets (md5-derived, engine-agnostic) — the "
    "unbounded-vocabulary featurizer that needs no dictionary",
)
def f_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: categorical features map to fixed-dimension
    indices with a deterministic hash and a ± sign, no vocabulary
    table, no fit step — the only featurizer that works on an
    unbounded category stream (new sources appear daily at 100 TB).

    Zero shuffle: pure per-row expressions, pipelined with the scan.
    A model trainer consumes (bucket, sign) pairs directly as sparse
    vector entries.
    """
    docs = load(spark, "documents", sf_dir)
    lb, ls = _fh_spark("lang", "lang")
    sb, ss = _fh_spark("source", "source")
    return docs.select(
        "doc_id",
        lb.alias("lang_bucket"),
        ls.cast("int").alias("lang_sign"),
        sb.alias("source_bucket"),
        ss.cast("int").alias("source_sign"),
    )


# ---------- flagship #5: training-data assembly funnel ----------

_TA_PRIME = 1000000007
_TA_MULT = 2654435761 % _TA_PRIME


def _ta_oracle() -> str:
    """Stage funnel, all integer-set algebra (bit-exact cross-engine)."""
    return f"""
    WITH base AS (
      SELECT d.doc_id, d.source, len({_DUCK_TOKENS}) AS n_tokens,
             length({_NORM_DUCK}) AS n_chars
      FROM documents d
      WHERE (((d.doc_id % {_TA_PRIME}) * {_TA_MULT}) % {_TA_PRIME}) % 100 < 80
    ),
    emb AS (
      SELECT b.* FROM base b JOIN embeddings e ON e.vec_id = b.doc_id
    ),
    chunks AS (
      SELECT doc_id, unnest(range(0,
        CASE WHEN n_chars <= {_CHUNK} THEN 1
             ELSE CAST(ceil(CAST(n_chars - {_CHUNK} AS DOUBLE) / {_STRIDE})
                  AS BIGINT) + 1 END)) AS i
      FROM emb
    ),
    packed AS (
      SELECT source, n_tokens,
             CAST(floor((SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - 1) / {_BUDGET}) AS BIGINT) AS bin_id
      FROM emb
    ),
    bins AS (
      SELECT source, bin_id, SUM(n_tokens) AS bin_tokens
      FROM packed GROUP BY source, bin_id
    ),
    batches AS (
      SELECT source, bin_id // 64 AS batch_id FROM bins
      GROUP BY source, bin_id // 64
    )
    SELECT 'train_docs' AS stage, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(n_tokens) AS DOUBLE) AS metric FROM base
    UNION ALL
    SELECT 'embedded', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(n_tokens) AS DOUBLE) FROM emb
    UNION ALL
    SELECT 'chunks', CAST(COUNT(*) AS BIGINT), NULL FROM chunks
    UNION ALL
    SELECT 'packed_bins', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(bin_tokens) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE) * {_BUDGET}) FROM bins
    UNION ALL
    SELECT 'batches', CAST(COUNT(*) AS BIGINT), NULL FROM batches
    """


@register(
    "train_assembly_e2e",
    _ta_oracle(),
    doc="flagship #5: training-data assembly funnel — 80% train split "
    "→ embedding inner-join → 200/150-char chunking → 512-token "
    "contiguous packing → 64-bin batches; one (stage, n_rows, metric) "
    "row per stage (metric: token mass / bin fill ratio)",
)
def train_assembly_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus→model-ready handoff composed end-to-end: the docs
    ``curate_corpus_e2e`` would release become the train split
    (multiplicative-hash bucket < 80, ``sample_train_split``'s hash),
    keep only docs whose embedding exists (the modality-completeness
    join every multimodal trainer runs), chunk for context windows
    (``doc_chunk_split`` offsets), pack whole docs into 512-token
    contiguous bins (``pack_sequences``), and group bins into
    64-sequence batches. The funnel reports stage counts plus token
    mass and mean bin-fill ratio — the numbers a training launch
    checklist actually reads.

    Scale: split + chunk are scan-level projections; the embedding
    join is key-partitioned (both sides id-keyed — at 100 TB this is
    the bucketed-join case, ``join_bucketed``); packing is one window
    cumsum per source partition; every stage count is a map-side-
    combined aggregate. Integer algebra end to end — the only floats
    are two final single divisions.
    """
    docs = load(spark, "documents", sf_dir)
    emb_ids = load(spark, "embeddings", sf_dir).select(
        F.col("vec_id").alias("doc_id")
    )
    bucket = (
        (F.col("doc_id") % F.lit(_TA_PRIME)) * F.lit(_TA_MULT)
    ) % F.lit(_TA_PRIME) % F.lit(100)
    base = (
        docs.filter(bucket < 80)
        .select(
            "doc_id",
            "source",
            F.size(_tokens(F.expr(_NORM))).alias("n_tokens"),
            F.length(F.expr(_NORM)).alias("n_chars"),
        )
    )
    base = pin(base)
    emb = pin(base.join(emb_ids, "doc_id"))

    n_chunks = F.when(F.col("n_chars") <= _CHUNK, F.lit(1)).otherwise(
        F.ceil((F.col("n_chars") - _CHUNK).cast("double") / _STRIDE) + 1
    )
    chunks = emb.select(
        "doc_id", F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("i")
    )

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = emb.select(
        "source",
        "n_tokens",
        F.floor((F.sum("n_tokens").over(w) - 1) / _BUDGET).alias("bin_id"),
    )
    bins = packed.groupBy("source", "bin_id").agg(
        F.sum("n_tokens").alias("bin_tokens")
    )
    batches = bins.groupBy(
        "source", (F.col("bin_id") / 64).cast("long").alias("batch_id")
    ).agg(F.count(F.lit(1)).alias("_n"))

    def row(stage: str, df: DataFrame, metric) -> DataFrame:
        return df.agg(
            F.lit(stage).alias("stage"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            metric.alias("metric"),
        )

    null_d = F.lit(None).cast("double")
    out = row("train_docs", base, F.sum("n_tokens").cast("double"))
    out = out.unionByName(row("embedded", emb, F.sum("n_tokens").cast("double")))
    out = out.unionByName(row("chunks", chunks, F.max(null_d)))
    out = out.unionByName(
        row(
            "packed_bins",
            bins,
            F.sum("bin_tokens").cast("double")
            / (F.count(F.lit(1)).cast("double") * F.lit(float(_BUDGET))),
        )
    )
    out = out.unionByName(row("batches", batches, F.max(null_d)))
    return out


_SFT_PROMPT_TOKENS = 12
_SFT_MAX_TOKENS = 160


@register(
    "text_sft_pairs",
    f"""
    WITH t AS (
      SELECT doc_id, lang,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ',
               'g')), ' ') AS toks
      FROM documents
    ), p AS (
      SELECT doc_id, lang,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             array_to_string(toks[1:{_SFT_PROMPT_TOKENS}], ' ')
               AS prompt,
             array_to_string(toks[{_SFT_PROMPT_TOKENS + 1}:len(toks)], ' ')
               AS response
      FROM t WHERE len(toks) > {_SFT_PROMPT_TOKENS}
        AND len(toks) <= {_SFT_MAX_TOKENS}
    )
    SELECT doc_id, lang, n_tokens,
           '<|user|>' || prompt || '<|assistant|>' || response
             AS rendered,
           CAST(length('<|user|>' || prompt || '<|assistant|>'
                || response) AS BIGINT) AS n_chars_rendered
    FROM p
    """,
    doc=f"SFT pair assembly: docs split into ({_SFT_PROMPT_TOKENS}-token "
    "prompt, remainder response), rendered through a chat template "
    f"with a {_SFT_MAX_TOKENS}-token budget gate — the "
    "instruction-tuning formatting step",
)
def text_sft_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instruction-tuning data assembly: split each document into a
    prompt prefix and response remainder, gate on a token budget
    (over-long docs route to ``doc_chunk_split`` first), and render
    through a fixed chat template — the exact formatting job between
    a curated corpus and an SFT dataloader, where template drift
    silently corrupts training (hence hash-verified rendering).

    Pure expression work: normalize → split → slice → join → concat;
    the rendered string's length is the packing input
    (``pack_sequences`` consumes token counts the same way). The
    synthetic prompt/response split stands in for real field pairs;
    the template, gating, and budget plumbing are the real contract.

    Scale: stateless per-row projection fused with the scan — zero
    shuffles; the budget gate prunes before the expensive concat.
    """
    docs = load(spark, "documents", sf_dir)
    norm = "trim(regexp_replace(lower(text), '\\\\s+', ' '))"
    t = docs.select(
        "doc_id", "lang", F.split(F.expr(norm), " ").alias("toks")
    )
    n = F.size("toks")
    p = t.filter(
        (n > _SFT_PROMPT_TOKENS) & (n <= _SFT_MAX_TOKENS)
    ).select(
        "doc_id",
        "lang",
        n.cast("long").alias("n_tokens"),
        F.concat_ws(
            " ", F.slice("toks", 1, _SFT_PROMPT_TOKENS)
        ).alias("prompt"),
        F.concat_ws(
            " ",
            F.expr(
                f"slice(toks, {_SFT_PROMPT_TOKENS + 1}, "
                f"size(toks) - {_SFT_PROMPT_TOKENS})"
            ),
        ).alias("response"),
    )
    rendered = F.concat(
        F.lit("<|user|>"),
        F.col("prompt"),
        F.lit("<|assistant|>"),
        F.col("response"),
    )
    return p.select(
        "doc_id",
        "lang",
        "n_tokens",
        rendered.alias("rendered"),
        F.length(rendered).cast("long").alias("n_chars_rendered"),
    )


@register(
    "train_dpo_pairs",
    f"""
    WITH t AS (SELECT doc_id, lang, source,
      CAST(len(list_distinct(string_split({_NORM_DUCK}, ' '))) * 1000000
           // len(string_split({_NORM_DUCK}, ' ')) AS BIGINT) AS score
      FROM documents),
    r AS (SELECT *,
      ROW_NUMBER() OVER (PARTITION BY lang, source
                         ORDER BY score DESC, doc_id) AS rc,
      ROW_NUMBER() OVER (PARTITION BY lang, source
                         ORDER BY score ASC, doc_id) AS rr
      FROM t),
    g AS (SELECT lang, source,
      MAX(CASE WHEN rc = 1 THEN doc_id END) AS chosen_doc_id,
      MAX(CASE WHEN rc = 1 THEN score END) AS chosen_score,
      MAX(CASE WHEN rr = 1 THEN doc_id END) AS rejected_doc_id,
      MAX(CASE WHEN rr = 1 THEN score END) AS rejected_score
      FROM r GROUP BY lang, source)
    SELECT lang, source, chosen_doc_id, chosen_score,
           rejected_doc_id, rejected_score,
           chosen_score - rejected_score AS margin
    FROM g WHERE chosen_doc_id <> rejected_doc_id
    """,
    doc="preference-pair construction for DPO/RLHF training: per "
    "(lang, source) group, the highest- vs lowest-scoring doc by "
    "integer-ppm lexical diversity, with the preference margin — "
    "deterministic argmax/argmin tie-broken on doc_id, degenerate "
    "one-doc / all-equal groups dropped",
)
def train_dpo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chosen/rejected preference pairs per group — the relational
    skeleton of DPO data prep (score here is the integer lexical-
    diversity ppm; production swaps in any reward/quality column, the
    plan is unchanged). Argmax and argmin are lexicographic struct
    mins (min(struct(−score, doc_id)) / min(struct(score, doc_id))) —
    both partial-aggregatable, so the shuffle carries one struct per
    group, never raw docs; the oracle states the same picks with rank
    windows. Groups where chosen == rejected (single doc, or every
    score equal) are dropped — no degenerate pairs.

    Scale: one map-side-combined aggregate on the (bounded) group key;
    hot groups are absorbed by the combiner. No sort of raw rows.
    """
    docs = load(spark, "documents", sf_dir)
    toked = docs.select(
        "doc_id", "lang", "source", _tokens(F.expr(_NORM)).alias("toks")
    )
    t = toked.select(
        "doc_id",
        "lang",
        "source",
        F.expr(
            "cast(size(array_distinct(toks)) * 1000000 div size(toks) "
            "as bigint)"
        ).alias("score"),
    )
    g = t.groupBy("lang", "source").agg(
        F.min(
            F.struct((-F.col("score")).alias("ns"), F.col("doc_id").alias("d"))
        ).alias("c"),
        F.min(
            F.struct(F.col("score").alias("s"), F.col("doc_id").alias("d"))
        ).alias("rj"),
    )
    return g.select(
        "lang",
        "source",
        F.col("c.d").alias("chosen_doc_id"),
        (-F.col("c.ns")).alias("chosen_score"),
        F.col("rj.d").alias("rejected_doc_id"),
        F.col("rj.s").alias("rejected_score"),
        (-F.col("c.ns") - F.col("rj.s")).alias("margin"),
    ).filter(F.col("chosen_doc_id") != F.col("rejected_doc_id"))
