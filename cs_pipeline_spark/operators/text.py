"""Text-analysis operators for LLM-corpus curation (SURVEY §2.10).

Extension operators on the ``documents`` table (north star; no
reference citation). All hot-path math is native Column expressions —
ratios of exactly-counted integers, so both engines produce
bit-identical doubles and the driver's value-hash check applies in
full (no rows-only fallbacks in this module).

- ``text_stats`` — length / punctuation / digit / stopword ratios and
  a composite quality score (Gopher-style heuristics, simplified).
- ``text_quality_filter`` — rule flags + pass/fail verdict per doc.
- ``text_lang_id`` — n-gram-heuristic language ID: per-language
  function-word hit counts + a CJK character signal, deterministic
  argmax (fixed priority order breaks ties).
- ``text_token_count`` — whitespace tokens and a BPE-ish regex token
  count (letter runs | single digits | single symbols), the standard
  pre-tokenizer shape.
- ``text_fingerprint`` — document fingerprint via rolling 8-char
  windows → md5 → min/max (winnowing-style); two docs sharing a
  min-fingerprint are containment candidates.

Scale: every op here is a pure per-row map — no shuffle at all. On
100 TB these pipeline into one stage fused with the scan (and the
stopword/ngram literals ride along in the closure, no broadcast
needed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cs_pipeline_spark.operators.dedup import _NORM, _NORM_DUCK, _tokens
from cs_pipeline_spark.registry import register
from cs_pipeline_spark.tables import load

# ---------- shared ----------

_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "by", "at", "be", "this", "that",
)


def _hits(tokens: Column, words: tuple[str, ...]) -> Column:
    """Occurrence count of any of `words` among tokens (HOF filter —
    interpreted, but trivially cheap next to the scan)."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def _sql_hits(tokens: str, words: tuple[str, ...]) -> str:
    lit = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    return f"len(list_filter({tokens}, t -> list_contains({lit}, t)))"


_DUCK_TOKENS = f"string_split({_NORM_DUCK}, ' ')"


# ---------- text_stats ----------


@register(
    "text_stats",
    "SELECT doc_id, "
    f"length({_NORM_DUCK}) AS n_chars_norm, "
    f"len({_DUCK_TOKENS}) AS n_tokens, "
    f"CAST(length(replace({_NORM_DUCK}, ' ', '')) AS DOUBLE) / len({_DUCK_TOKENS}) AS avg_token_len, "
    "CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio, "
    "CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / length(text) AS digit_ratio, "
    f"CAST({_sql_hits(_DUCK_TOKENS, _STOPWORDS)} AS DOUBLE) / len({_DUCK_TOKENS}) AS stopword_ratio "
    "FROM documents",
    doc="per-doc length/punct/digit/stopword stats (quality heuristics)",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    norm = F.expr(_NORM)
    toks = _tokens(norm)
    n_tokens = F.size(toks)
    raw_len = F.length("text")
    punct = raw_len - F.length(F.regexp_replace("text", "[.,;:!?]", ""))
    digit = raw_len - F.length(F.regexp_replace("text", "[0-9]", ""))
    return docs.select(
        "doc_id",
        F.length(norm).alias("n_chars_norm"),
        n_tokens.alias("n_tokens"),
        (
            F.length(F.replace(norm, F.lit(" "), F.lit(""))).cast("double")
            / n_tokens
        ).alias("avg_token_len"),
        (punct.cast("double") / raw_len).alias("punct_ratio"),
        (digit.cast("double") / raw_len).alias("digit_ratio"),
        (_hits(toks, _STOPWORDS).cast("double") / n_tokens).alias(
            "stopword_ratio"
        ),
    )


# ---------- text_quality_filter ----------

_MIN_TOKENS = 20
_MAX_TOKENS = 100000
_MIN_AVG_LEN = 2.0
_MAX_AVG_LEN = 12.0
_MIN_STOPWORD = 0.01


@register(
    "text_quality_filter",
    "WITH s AS (SELECT doc_id, "
    f"len({_DUCK_TOKENS}) AS n_tokens, "
    f"CAST(length(replace({_NORM_DUCK}, ' ', '')) AS DOUBLE) / len({_DUCK_TOKENS}) AS avg_token_len, "
    f"CAST({_sql_hits(_DUCK_TOKENS, _STOPWORDS)} AS DOUBLE) / len({_DUCK_TOKENS}) AS stopword_ratio "
    "FROM documents) "
    "SELECT doc_id, "
    f"n_tokens < {_MIN_TOKENS} OR n_tokens > {_MAX_TOKENS} AS flag_length, "
    f"avg_token_len < {_MIN_AVG_LEN} OR avg_token_len > {_MAX_AVG_LEN} AS flag_word_len, "
    f"stopword_ratio < {_MIN_STOPWORD} AS flag_stopword, "
    f"NOT (n_tokens < {_MIN_TOKENS} OR n_tokens > {_MAX_TOKENS} "
    f"OR avg_token_len < {_MIN_AVG_LEN} OR avg_token_len > {_MAX_AVG_LEN} "
    f"OR stopword_ratio < {_MIN_STOPWORD}) AS quality_pass "
    "FROM s",
    doc="Gopher-style quality rules → per-doc flags + pass verdict",
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    norm = F.expr(_NORM)
    toks = _tokens(norm)
    n_tokens = F.size(toks)
    avg_len = (
        F.length(F.replace(norm, F.lit(" "), F.lit(""))).cast("double")
        / n_tokens
    )
    stop_ratio = _hits(toks, _STOPWORDS).cast("double") / n_tokens
    flag_length = (n_tokens < _MIN_TOKENS) | (n_tokens > _MAX_TOKENS)
    flag_word_len = (avg_len < _MIN_AVG_LEN) | (avg_len > _MAX_AVG_LEN)
    flag_stopword = stop_ratio < _MIN_STOPWORD
    return docs.select(
        "doc_id",
        flag_length.alias("flag_length"),
        flag_word_len.alias("flag_word_len"),
        flag_stopword.alias("flag_stopword"),
        (~(flag_length | flag_word_len | flag_stopword)).alias("quality_pass"),
    )


# ---------- text_lang_id ----------

_LANG_WORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr": ("le", "la", "les", "et", "est", "dans", "que", "pour"),
    "es": ("el", "los", "las", "es", "en", "que", "por", "una"),
}
_LANG_PRIORITY = ("en", "de", "fr", "es")  # deterministic tie-break
_CJK_RE = "[\\x{4e00}-\\x{9fff}]"  # \x{..} parses in both RE2 and Java


@register(
    "text_lang_id",
    "WITH h AS (SELECT doc_id, lang, "
    + ", ".join(
        f"{_sql_hits(_DUCK_TOKENS, _LANG_WORDS[lang])} AS hits_{lang}"
        for lang in _LANG_PRIORITY
    )
    + f", regexp_matches(text, '{_CJK_RE}') AS has_cjk FROM documents) "
    "SELECT doc_id, lang, "
    "CASE WHEN has_cjk THEN 'zh' "
    "WHEN hits_en = 0 AND hits_de = 0 AND hits_fr = 0 AND hits_es = 0 THEN 'und' "
    "WHEN hits_en >= hits_de AND hits_en >= hits_fr AND hits_en >= hits_es THEN 'en' "
    "WHEN hits_de >= hits_fr AND hits_de >= hits_es THEN 'de' "
    "WHEN hits_fr >= hits_es THEN 'fr' ELSE 'es' END AS pred_lang "
    "FROM h",
    doc="n-gram-heuristic language ID (function-word hits + CJK signal)",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    toks = _tokens(F.expr(_NORM))
    h = {lang: _hits(toks, _LANG_WORDS[lang]) for lang in _LANG_PRIORITY}
    scored = docs.select(
        "doc_id",
        "lang",
        *[h[lang].alias(f"hits_{lang}") for lang in _LANG_PRIORITY],
        (F.regexp_count("text", F.lit(_CJK_RE)) > 0).alias("has_cjk"),
    )
    c = F.col
    pred = (
        F.when(c("has_cjk"), F.lit("zh"))
        .when(
            (c("hits_en") == 0)
            & (c("hits_de") == 0)
            & (c("hits_fr") == 0)
            & (c("hits_es") == 0),
            F.lit("und"),
        )
        .when(
            (c("hits_en") >= c("hits_de"))
            & (c("hits_en") >= c("hits_fr"))
            & (c("hits_en") >= c("hits_es")),
            F.lit("en"),
        )
        .when(
            (c("hits_de") >= c("hits_fr")) & (c("hits_de") >= c("hits_es")),
            F.lit("de"),
        )
        .when(c("hits_fr") >= c("hits_es"), F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    return scored.select("doc_id", "lang", pred.alias("pred_lang"))


# ---------- text_token_count ----------

# BPE-ish pre-tokenizer: letter runs | single digits | single symbols.
_BPE_RE = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]"


@register(
    "text_token_count",
    "SELECT doc_id, "
    f"len({_DUCK_TOKENS}) AS ws_tokens, "
    f"len(regexp_extract_all({_NORM_DUCK}, '{_BPE_RE}')) AS bpe_tokens, "
    f"length({_NORM_DUCK}) AS n_chars "
    "FROM documents",
    doc="whitespace + BPE-ish regex token counts per document",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    norm = F.expr(_NORM)
    return docs.select(
        "doc_id",
        F.size(_tokens(norm)).alias("ws_tokens"),
        F.regexp_count(norm, F.lit(_BPE_RE)).alias("bpe_tokens"),
        F.length(norm).alias("n_chars"),
    )


# ---------- text_fingerprint ----------

_WIN = 8  # rolling window width in chars


@register(
    "text_fingerprint",
    "WITH w AS (SELECT doc_id, "
    f"list_transform(range(1, greatest(length({_NORM_DUCK}) - {_WIN - 1}, 1) + 1), "
    f"i -> md5(substring({_NORM_DUCK}, i, {_WIN}))) AS hs "
    "FROM documents) "
    "SELECT doc_id, list_aggregate(hs, 'min') AS fp_min, "
    "list_aggregate(hs, 'max') AS fp_max, len(hs) AS n_windows FROM w",
    doc="winnowing-style fingerprint: min/max md5 over rolling 8-char windows",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash fingerprinting: every 8-char window is hashed; the
    min (and max) hash is a deterministic sketch of the document robust
    to edits outside the extremal windows. Shared ``fp_min`` between two
    docs ⇒ shared 8-gram ⇒ containment candidates."""
    docs = load(spark, "documents", sf_dir)
    norm = F.expr(_NORM)
    hs = F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.length(norm) - (_WIN - 1), F.lit(1))
        ),
        lambda i: F.md5(norm.substr(i, F.lit(_WIN))),
    )
    out = docs.select("doc_id", hs.alias("hs"))
    return out.select(
        "doc_id",
        F.array_min("hs").alias("fp_min"),
        F.array_max("hs").alias("fp_max"),
        F.size("hs").alias("n_windows"),
    )
