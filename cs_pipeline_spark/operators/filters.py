"""Projection / filter / predicate operators (SURVEY §2.2).

All are single-pass narrow transformations — they fuse into the scan's
WholeStageCodegen stage and (for parquet-native columns) push down to
the reader as PushedFilters / ReadSchema. No shuffles anywhere here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cs_pipeline_spark.functions.constants import (
    SHORTNAME_TO_FULLNAME,
    VARIABLES_FOR_PREDICTOR,
)
from cs_pipeline_spark.functions.era5_fixture import ERA5_CTE, era5_events
from cs_pipeline_spark.operators.helpers import dround, sql_dround, with_prefix_agg, literal_df
from cs_pipeline_spark.registry import register
from cs_pipeline_spark.tables import EVENTS_TS_SQL, load

_RENAME_COLS = ["u10", "v10", "t2m", "d2m", "sp", "fal"]


@register(
    "rename_shortnames",
    f"WITH {ERA5_CTE} SELECT event_id, "
    + ", ".join(f'{c} AS "{SHORTNAME_TO_FULLNAME[c]}"' for c in _RENAME_COLS)
    + " FROM era5",
    doc="shortname→CDS-fullname rename map (dataset.py:237-244, constants.py:31-52)",
)
def rename_shortnames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-driven rename: only names present in the map are
    renamed (reference guards with ``if var in ds``)."""
    df = era5_events(spark, sf_dir).select("event_id", *_RENAME_COLS)
    mapping = {c: SHORTNAME_TO_FULLNAME[c] for c in _RENAME_COLS if c in df.columns}
    return df.withColumnsRenamed(mapping)


@register(
    "drop_cols",
    "SELECT l_orderkey, l_partkey, l_suppkey, l_quantity, l_extendedprice, "
    "l_discount, l_returnflag, l_linestatus, l_shipdate FROM lineitem",
    doc="drop bookkeeping columns (dataset.py:31 number/expver pattern)",
)
def drop_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, "lineitem", sf_dir).drop("l_linenumber", "l_tax")


@register(
    "filter_sentinel_to_null",
    "SELECT event_id, CASE WHEN xv < 1e10 THEN xv END AS xco2 FROM "
    "(SELECT event_id, CASE WHEN event_id % 37 = 0 THEN 1e12 "
    "ELSE 400.0 + value / 100.0 END AS xv FROM events) t",
    doc="sentinel ≥1e10 → null (dataset.py:144)",
)
def filter_sentinel_to_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    xv = F.when(F.col("event_id") % 37 == 0, F.lit(1e12)).otherwise(
        F.lit(400.0) + F.col("value") / 100.0
    )
    return ev.select(
        "event_id",
        F.when(xv < 1e10, xv).alias("xco2"),
    )


@register(
    "filter_top_of_hour",
    f"SELECT event_id, {EVENTS_TS_SQL} AS ts FROM events "
    f"WHERE minute({EVENTS_TS_SQL}) = 0 AND CAST(second({EVENTS_TS_SQL}) AS INT) = 0",
    doc="keep rows at minute==0 and second==0 (processor.py:52)",
)
def filter_top_of_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    return ev.filter((F.minute("ts") == 0) & (F.second("ts") == 0)).select(
        "event_id", "ts"
    )


_T0, _T1 = "2024-01-10 00:00:00", "2024-01-20 00:00:00"


@register(
    "filter_time_range",
    f"SELECT event_id, {EVENTS_TS_SQL} AS ts, value FROM events "
    f"WHERE {EVENTS_TS_SQL} BETWEEN TIMESTAMP '{_T0}' AND TIMESTAMP '{_T1}'",
    doc="timestamp.between(start, end) (processor.py:54-62)",
)
def filter_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    return ev.filter(
        F.col("ts").between(F.to_timestamp(F.lit(_T0)), F.to_timestamp(F.lit(_T1)))
    ).select("event_id", "ts", "value")


@register(
    "filter_missing_rows",
    "SELECT event_id, "
    f"CAST(year({EVENTS_TS_SQL}) AS BIGINT) AS year, "
    f"CAST(month({EVENTS_TS_SQL}) AS BIGINT) AS month, "
    f"CAST(day({EVENTS_TS_SQL}) AS BIGINT) AS day, "
    f"strftime({EVENTS_TS_SQL}, '%H:%M:%S') AS time, va, vb FROM "
    "(SELECT event_id, ts, "
    "CASE WHEN value % 11.0 < 1.0 THEN NULL ELSE value END AS va, "
    "CASE WHEN value % 13.0 < 1.0 THEN NULL ELSE value * 2.0 END AS vb "
    "FROM events) t WHERE va IS NULL OR vb IS NULL",
    doc="isolate rows with any missing value + calendar parts (processor.py:89-109)",
)
def filter_missing_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    va = F.when(F.col("value") % 11.0 < 1.0, F.lit(None)).otherwise(F.col("value"))
    vb = F.when(F.col("value") % 13.0 < 1.0, F.lit(None)).otherwise(
        F.col("value") * 2.0
    )
    df = ev.select("event_id", "ts", va.alias("va"), vb.alias("vb"))
    return df.filter(F.col("va").isNull() | F.col("vb").isNull()).select(
        "event_id",
        F.year("ts").cast("bigint").alias("year"),
        F.month("ts").cast("bigint").alias("month"),
        F.dayofmonth("ts").cast("bigint").alias("day"),
        F.date_format("ts", "HH:mm:ss").alias("time"),
        "va",
        "vb",
    )


# Snapped-coordinate → requested-value remap with identity fallback
# (reference dataset.py:197-210: dict .map with fallback).
_REMAP = {45.0: 45.017, 46.75: 46.735}


@register(
    "coord_value_remap",
    f"WITH {ERA5_CTE} SELECT event_id, latitude, "
    "CASE WHEN latitude = 45.0 THEN 45.017 "
    "WHEN latitude = 46.75 THEN 46.735 ELSE latitude END AS latitude_remapped "
    "FROM era5",
    doc="snapped→requested coord remap, identity fallback (dataset.py:197-210)",
)
def coord_value_remap(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = era5_events(spark, sf_dir)
    expr = F.col("latitude")
    for k, v in _REMAP.items():
        expr = F.when(F.col("latitude") == k, F.lit(v)).otherwise(expr)
    return df.select("event_id", "latitude", expr.alias("latitude_remapped"))


@register(
    "project_predictor_inputs",
    f"WITH {ERA5_CTE} SELECT event_id, avg_ishf, avg_slhtf, avg_sdswrf, "
    "avg_sdlwrf, avg_snlwrf, fal FROM era5",
    doc="select only the inputs a predictor needs → Catalyst column pruning (processor.py:40-42)",
)
def project_predictor_inputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column pruning driven by VARIABLES_FOR_PREDICTOR: asking for G
    reads exactly its six inputs (verified in ReadSchema)."""
    from cs_pipeline_spark.functions.constants import FULLNAME_TO_SHORTNAME

    shortnames = [
        FULLNAME_TO_SHORTNAME[v] for v in VARIABLES_FOR_PREDICTOR["G"]
    ]
    return era5_events(spark, sf_dir).select("event_id", *shortnames)


@register(
    "f_parse_messy_numbers",
    """
    WITH m AS (SELECT o_orderkey,
        CASE o_orderkey % 4
          WHEN 0 THEN '$' || CAST(o_totalprice AS VARCHAR)
          WHEN 1 THEN CAST(o_totalprice AS VARCHAR) || ' USD'
          WHEN 2 THEN 'n/a'
          ELSE CAST(o_totalprice AS VARCHAR) END AS raw
      FROM orders WHERE o_orderkey < 4000)
    SELECT o_orderkey, raw,
           TRY_CAST(regexp_replace(raw, '[$, ]|USD', '', 'g') AS DOUBLE) AS parsed
    FROM m
    """,
    doc="tolerant numeric parsing: strip currency/unit decoration + try_cast (null on garbage, never a job-killing ANSI error) — the messy-CSV cleaning primitive",
)
def f_parse_messy_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real ingest data carries '$1,234.5', '99 USD', 'n/a'. Under
    ANSI mode (engine default) a plain CAST on garbage KILLS the job
    — `try_cast` + a stripping regex turns unparseable cells into
    nulls that flow into the null-skipping aggregates instead.
    Expression-side only, scan-fused; the messy strings here are
    derived deterministically (the corpus has no dirty column)."""
    o = load(spark, "orders", sf_dir).filter(F.col("o_orderkey") < 4000)
    raw = (
        F.when(
            F.col("o_orderkey") % 4 == 0,
            F.concat(F.lit("$"), F.col("o_totalprice").cast("string")),
        )
        .when(
            F.col("o_orderkey") % 4 == 1,
            F.concat(F.col("o_totalprice").cast("string"), F.lit(" USD")),
        )
        .when(F.col("o_orderkey") % 4 == 2, F.lit("n/a"))
        .otherwise(F.col("o_totalprice").cast("string"))
    )
    return (
        o.select("o_orderkey", raw.alias("raw"))
        .withColumn("parsed", F.expr(
            "try_cast(regexp_replace(raw, '[$, ]|USD', '') AS DOUBLE)"
        ))
    )


@register(
    "dq_expectations",
    """
    SELECT rule, n_violations, n_rows,
           CAST(n_violations AS DOUBLE) / n_rows AS violation_ratio,
           n_violations = 0 AS passed
    FROM (
      SELECT 'value_non_negative' AS rule,
             COUNT(CASE WHEN value < 0 THEN 1 END) AS n_violations,
             COUNT(*) AS n_rows FROM events
      UNION ALL
      SELECT 'event_type_in_domain',
             COUNT(CASE WHEN event_type NOT IN
               ('view','click','purchase','signup','error') THEN 1 END),
             COUNT(*) FROM events
      UNION ALL
      SELECT 'ts_in_expected_range',
             COUNT(CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-01'
                         OR CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-02-01'
                   THEN 1 END),
             COUNT(*) FROM events
      UNION ALL
      SELECT 'user_id_positive',
             COUNT(CASE WHEN user_id <= 0 THEN 1 END),
             COUNT(*) FROM events
    )
    """,
    doc="data-quality expectations report: domain/range/sign rules evaluated in ONE scan (conditional counts), rendered as (rule, violations, ratio, passed) rows — the per-batch DQ gate",
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation-suite evaluation (Great-Expectations shape): every
    rule is a conditional count inside a single aggregation, so N
    rules cost one scan — never one scan per rule. The report is
    unpivoted from the 1-row aggregate, and a `passed` verdict per
    rule gates the downstream pipeline. At 100 TB: run per ingest
    partition and store the report next to the data (the audit trail
    data contracts want)."""
    ev = load(spark, "events", sf_dir)
    rules = {
        "value_non_negative": F.col("value") < 0,
        "event_type_in_domain": ~F.col("event_type").isin(
            "view", "click", "purchase", "signup", "error"
        ),
        "ts_in_expected_range": (
            F.col("ts") < F.lit("2024-01-01").cast("timestamp")
        ) | (F.col("ts") >= F.lit("2024-02-01").cast("timestamp")),
        "user_id_positive": F.col("user_id") <= 0,
    }
    agg = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.count(F.when(cond, F.lit(1))).alias(f"v_{name}")
            for name, cond in rules.items()
        ],
    )
    stack_args = ", ".join(
        f"'{name}', v_{name}" for name in rules
    )
    stacked = agg.select(
        F.expr(
            f"stack({len(rules)}, {stack_args}) AS (rule, n_violations)"
        ),
        "n_rows",
    )
    return stacked.select(
        "rule",
        "n_violations",
        "n_rows",
        (F.col("n_violations").cast("double") / F.col("n_rows")).alias(
            "violation_ratio"
        ),
        (F.col("n_violations") == 0).alias("passed"),
    )


_K_ANON = 5
_CHAR_BUCKET = 100


@register(
    "dq_k_anonymity",
    f"""
    WITH g AS (
      SELECT lang, source, n_chars // {_CHAR_BUCKET} AS len_bucket,
             CAST(COUNT(*) AS BIGINT) AS group_size
      FROM documents GROUP BY lang, source, len_bucket
    )
    SELECT lang, source, CAST(len_bucket AS BIGINT) AS len_bucket,
           group_size, group_size < {_K_ANON} AS violates_k
    FROM g
    """,
    doc=f"k-anonymity release gate (k={_K_ANON}) over quasi-identifiers "
    f"(lang, source, {_CHAR_BUCKET}-char length bucket) — per-group "
    "sizes + violation flag, one map-side-combined pass",
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy release gate: bucket every document by its
    quasi-identifier tuple and flag buckets smaller than k — records in
    flagged buckets are re-identifiable by their metadata alone and
    must be generalized or suppressed before the corpus ships.

    Scale: one hash aggregation on the quasi-identifier tuple with
    map-side combine (group count ≪ rows); integer-only output. The
    k-suppression action itself is then a broadcast semi-join of the
    flagged tuples back onto the corpus — the `dedup_exact` shape.
    """
    docs = load(spark, "documents", sf_dir)
    g = docs.groupBy(
        "lang",
        "source",
        F.expr(f"n_chars div {_CHAR_BUCKET}").alias("len_bucket"),
    ).agg(F.count(F.lit(1)).cast("long").alias("group_size"))
    return g.select(
        "lang",
        "source",
        "len_bucket",
        "group_size",
        (F.col("group_size") < _K_ANON).alias("violates_k"),
    )


# ---------- Benford's-law digit audit ----------

import math as _math

_BENFORD = {d: round(_math.log10(1 + 1 / d), 6) for d in range(1, 10)}
_BENFORD_SQL = (
    "benford(digit, expected_share) AS (VALUES "
    + ", ".join(f"({d}, {p})" for d, p in _BENFORD.items())
    + ")"
)


@register(
    "dq_benford",
    f"""
    WITH {_BENFORD_SQL},
    c AS (
      SELECT CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM lineitem WHERE l_extendedprice > 0.0
    ),
    d AS (
      SELECT cents // CAST(POWER(10, LENGTH(CAST(cents AS VARCHAR)) - 1)
                      AS BIGINT) AS digit
      FROM c
    ),
    o AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM d GROUP BY digit),
    t AS (SELECT SUM(n_obs) AS n FROM o)
    SELECT b.digit, COALESCE(o.n_obs, 0) AS n_obs,
           FLOOR(CAST(COALESCE(o.n_obs, 0) AS DOUBLE) / t.n
                 * 1000000.0 + 0.5) / 1000000.0 AS obs_share,
           b.expected_share,
           FLOOR((CAST(COALESCE(o.n_obs, 0) AS DOUBLE) / t.n
                 - b.expected_share) * 1000000.0 + 0.5) / 1000000.0
             AS deviation
    FROM benford b LEFT JOIN o ON o.digit = b.digit, t
    """,
    doc="Benford's-law first-digit audit of price amounts: exact "
    "leading digit via integer-cents string length (no log10 float "
    "edge), observed vs log10(1+1/d) expected shares — the classic "
    "fabricated-data / corrupted-feed detector",
)
def dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law. The
    digit is computed from exact integer cents (FLOOR(x·100+0.5)) by
    dividing by 10^(len−1) — integer→string length is canonical in
    both engines, avoiding the log10(10^k)≈k−ε trap that flips a
    digit at power-of-ten boundaries. One division per digit row at
    the end; expected shares are shared literals.

    Scale: one map-side-combined 9-group aggregation over a pushed
    projection — the cheapest fraud tripwire a 100 TB feed can run.
    """
    li = load(spark, "lineitem", sf_dir).filter(
        F.col("l_extendedprice") > 0.0
    )
    cents = F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long")
    digit = F.expr(
        "cents div cast(power(10, length(cast(cents as string)) - 1) "
        "as bigint)"
    )
    o = (
        li.select(cents.alias("cents"))
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    t = o.agg(F.sum("n_obs").alias("n"))
    b = literal_df(
        spark, list(_BENFORD.items()), "digit bigint, expected_share double"
    )
    share = F.coalesce(F.col("n_obs"), F.lit(0)).cast("double") / F.col("n")
    return (
        b.join(o, "digit", "left")
        .join(F.broadcast(t))
        .select(
            "digit",
            F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_obs"),
            dround(share, 6).alias("obs_share"),
            "expected_share",
            dround(share - F.col("expected_share"), 6).alias("deviation"),
        )
    )


# ---------- referential-integrity + uniqueness audits ----------

_FK_RULES = [
    # (rule id, child table, child key, parent table, parent key)
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    # deliberately violating rule: l_partkey is NOT a supplier key (its
    # domain is ~20× wider) — simulates the schema-drift misdeclaration
    # this audit exists to catch, and keeps the check non-vacuous (a DQ
    # report that can only say "ok" verifies nothing)
    ("lineitem.l_partkey->supplier", "lineitem", "l_partkey", "supplier", "s_suppkey"),
]


@register(
    "dq_referential",
    " UNION ALL ".join(
        f"SELECT '{rid}' AS rule, "
        f"(SELECT COUNT(*) FROM {child} WHERE {ck} IS NOT NULL) AS n_rows, "
        f"(SELECT COUNT(*) FROM {child} c WHERE c.{ck} IS NOT NULL AND "
        f"NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{ck})) "
        "AS n_orphans"
        for rid, child, ck, parent, pk in _FK_RULES
    ),
    doc="referential-integrity audit: orphaned foreign keys per FK rule "
    "(anti-join counts), one report row per rule — includes a "
    "deliberately-broken rule so the check is non-vacuous",
)
def dq_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK-orphan report: for each declared child→parent rule, how many
    child rows reference a parent key that does not exist. The
    post-ingest gate that catches partial loads (parent partition
    missing) and key-domain drift (a feed changing its id space) —
    exactly what the deliberately-misdeclared ``lineitem.l_partkey→supplier`` rule shows.

    Scale: each rule is a LEFT ANTI join — Catalyst broadcasts the
    parent's key column when small and falls back to a shuffled hash
    join keyed on the FK otherwise; counts are map-side-combined. The
    rules run as one union plan, so shared scans dedup via exchange
    reuse.
    """
    out = None
    for rid, child, ck, parent, pk in _FK_RULES:
        c = load(spark, child, sf_dir).filter(F.col(ck).isNotNull())
        p = load(spark, parent, sf_dir).select(F.col(pk).alias(ck)).distinct()
        orphans = c.join(p, ck, "left_anti")
        row = c.agg(F.count(F.lit(1)).alias("n_rows")).crossJoin(
            orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
        ).select(F.lit(rid).alias("rule"), "n_rows", "n_orphans")
        out = row if out is None else out.unionByName(row)
    return out


_TEXT_NORM_DUCK = (
    "md5(array_to_string(list_slice(string_split("
    "trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '), 1, 2), ' '))"
)
_TEXT_NORM_SPARK = (
    "md5(array_join(slice(split("
    "trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' '), 1, 2), ' '))"
)

_UNIQ_RULES = [
    # (rule id, table, spark key expr, duckdb key expr)
    ("documents.doc_id", "documents", "CAST(doc_id AS STRING)", "CAST(doc_id AS VARCHAR)"),
    ("embeddings.vec_id", "embeddings", "CAST(vec_id AS STRING)", "CAST(vec_id AS VARCHAR)"),
    ("events.event_id", "events", "CAST(event_id AS STRING)", "CAST(event_id AS VARCHAR)"),
    ("orders.o_orderkey", "orders", "CAST(o_orderkey AS STRING)", "CAST(o_orderkey AS VARCHAR)"),
    # content-level "natural key": the 2-word normalized title prefix
    # collides heavily in any real corpus — the non-vacuous rule that
    # shows what declaring a weak natural key as unique would miss
    ("documents.title_prefix", "documents", _TEXT_NORM_SPARK, _TEXT_NORM_DUCK),
]


@register(
    "dq_uniqueness",
    " UNION ALL ".join(
        f"SELECT '{rid}' AS rule, COUNT(*) AS n_rows, "
        "COUNT(DISTINCT k) AS n_distinct, "
        "CAST(COUNT(*) - COUNT(DISTINCT k) AS BIGINT) AS n_excess "
        f"FROM (SELECT {dexpr} AS k FROM {tbl})"
        for rid, tbl, _sexpr, dexpr in _UNIQ_RULES
    ),
    doc="primary-key / content-key uniqueness audit: rows vs distinct "
    "keys per declared rule, excess = duplicate mass — includes the "
    "2-word title-prefix natural key, which collides by construction",
)
def dq_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniqueness audit: for each declared key, total rows vs distinct
    keys; ``n_excess`` > 0 means duplicate keys slipped in (double
    ingest, replayed feed, near-dup corpus). Surrogate keys must come
    back clean; the title-prefix natural key quantifies how
    non-unique a tempting "natural key" really is before anyone joins
    on it.

    Scale: COUNT(DISTINCT) compiles to a two-stage partial-distinct
    aggregate (map-side dedup before the shuffle); keys travel as
    16-byte digests for the content rule, never document text. One
    union plan, one pass per table.
    """
    out = None
    for rid, tbl, sexpr, _dexpr in _UNIQ_RULES:
        t = load(spark, tbl, sf_dir)
        row = (
            t.select(F.expr(sexpr).alias("k"))
            .agg(
                F.lit(rid).alias("rule"),
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct("k").alias("n_distinct"),
                (F.count(F.lit(1)) - F.countDistinct("k"))
                .cast("long")
                .alias("n_excess"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "f_safe_arithmetic",
    """
    SELECT event_id,
           CASE WHEN d = 0 THEN NULL ELSE CAST(n AS DOUBLE) / d END AS safe_div,
           CASE WHEN d = 0 THEN NULL ELSE n % d END AS safe_mod,
           CASE WHEN n > 9223372036854775807 - 1000000000 THEN NULL
                ELSE n + 1000000000 END AS safe_add
    FROM (SELECT event_id, event_id * 1000000 AS n,
                 event_id % 7 AS d FROM events)
    """,
    doc="ANSI-safe arithmetic surface: try_divide/try_mod/try_add turn "
    "divide-by-zero and overflow into nulls instead of job-killing "
    "ANSI errors — the guard rails batch pipelines need when "
    "denominators come from data",
)
def f_safe_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Under ANSI mode (Spark 4 default) a single zero denominator or
    int64 overflow anywhere in 100 TB KILLS the whole job. The
    ``try_*`` function family yields null instead, which flows into
    the null-skipping aggregates. Every seventh event here has a zero
    denominator by construction, so the guard demonstrably fires; the
    oracle states the identical semantics as CASE expressions.

    Scale: pure expression-side, scan-fused, zero shuffle.
    """
    ev = load(spark, "events", sf_dir)
    n = F.col("event_id") * F.lit(1000000).cast("long")
    d = F.col("event_id") % 7
    return ev.select(
        "event_id",
        F.expr(
            "try_divide(cast(event_id * 1000000 as double), event_id % 7)"
        ).alias("safe_div"),
        F.try_mod(n, d).alias("safe_mod"),
        F.try_add(n, F.lit(1000000000).cast("long")).alias("safe_add"),
    )


# ---------- ingest-volume anomaly gate ----------

_VOL_WIN = 7  # trailing-days baseline for the volume z-score
_VOL_Z = 2.0


@register(
    "dq_volume_anomaly",
    f"""
    WITH d0 AS (SELECT date_trunc('day', {EVENTS_TS_SQL}) AS day,
                       event_type, COUNT(*) AS n_events
                FROM events GROUP BY 1, 2),
    spine AS (SELECT s.day, t.event_type
              FROM (SELECT unnest(generate_series(
                      (SELECT MIN(day) FROM d0),
                      (SELECT MAX(day) FROM d0),
                      INTERVAL 1 DAY)) AS day) s
              CROSS JOIN (SELECT DISTINCT event_type FROM d0) t),
    d AS (SELECT sp.day, sp.event_type,
            COALESCE(d0.n_events, 0) AS n_events
          FROM spine sp LEFT JOIN d0
            ON d0.day = sp.day AND d0.event_type = sp.event_type),
    w AS (SELECT day, event_type, n_events,
            SUM(n_events) OVER tw AS s1,
            SUM(n_events * n_events) OVER tw AS s2,
            COUNT(*) OVER tw AS cnt
          FROM d
          WINDOW tw AS (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN {_VOL_WIN} PRECEDING AND 1 PRECEDING)),
    z AS (SELECT day, event_type, n_events, s1, cnt,
            ({_VOL_WIN} * s2 - s1 * s1) AS vnum,
            CASE WHEN cnt = {_VOL_WIN}
                  AND ({_VOL_WIN} * s2 - s1 * s1) > 0 THEN
              (n_events - CAST(s1 AS DOUBLE) / {_VOL_WIN}.0)
              / SQRT(CAST({_VOL_WIN} * s2 - s1 * s1 AS DOUBLE)
                     / {_VOL_WIN}.0 / {_VOL_WIN}.0)
            END AS zscore
          FROM w)
    SELECT day, event_type, n_events,
           {{Z6}} AS z6,
           (COALESCE(ABS(zscore) > {_VOL_Z}, FALSE)
            OR (cnt = {_VOL_WIN} AND vnum = 0
                AND n_events * {_VOL_WIN} <> s1)) AS is_anomaly
    FROM z
    """.replace("{Z6}", sql_dround("zscore")),
    doc=f"daily ingest-volume anomaly on a complete calendar spine: "
    f"per-type z-score vs the trailing {_VOL_WIN} CALENDAR days "
    "(zero-filled — a dead feed IS the anomaly), |z| > 2 or any "
    "deviation off a zero-variance baseline flagged",
)
def dq_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly gate over a COMPLETE day spine. Two failure
    modes a naive daily-groupBy monitor misses, both closed here:
    a fully dead feed emits no row at all (the spine zero-fills it,
    so the outage day scores a hard negative z), and a ROWS window
    over observed days silently bridges gaps (the spine makes ROWS ≡
    calendar days). A third: a perfectly regular feed (variance 0)
    makes z undefined exactly when the baseline is strongest — any
    deviation from a zero-variance baseline is flagged directly via
    exact integer comparison (n·7 ≠ Σ). The z-score itself derives
    from exact integer window sums (cancellation-free n·Σx² − (Σx)²),
    quantized through ``dround``/``sql_dround`` — the shared
    cross-engine recipe, not an inline copy.

    Scale: the corpus collapses to |days|·|types| daily counts in one
    map-side-combined pass (served incrementally from
    ``agg_incremental_merge`` partials in production); the spine is
    calendar-bounded metadata.
    """
    from pyspark.sql import Window

    from cs_pipeline_spark.operators.helpers import dround, sql_dround

    ev = load(spark, "events", sf_dir)
    d0 = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    bounds = d0.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    types = d0.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    d = spine.join(d0, ["day", "event_type"], "left").select(
        "day",
        "event_type",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
    )
    tw = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-_VOL_WIN, -1)
    )
    s1 = F.sum("n_events").over(tw)
    s2 = F.sum(F.col("n_events") * F.col("n_events")).over(tw)
    cnt = F.count(F.lit(1)).over(tw)
    num = F.lit(_VOL_WIN) * s2 - s1 * s1
    mean = s1.cast("double") / F.lit(float(_VOL_WIN))
    std = F.sqrt(
        num.cast("double") / F.lit(float(_VOL_WIN)) / F.lit(float(_VOL_WIN))
    )
    z = F.when(
        (cnt == _VOL_WIN) & (num > 0), (F.col("n_events") - mean) / std
    )
    flat_dev = (
        (cnt == _VOL_WIN)
        & (num == 0)
        & (F.col("n_events") * _VOL_WIN != s1)
    )
    return (
        d.withColumn("zscore", z)
        .withColumn("flat_dev", flat_dev)
        .select(
            "day",
            "event_type",
            "n_events",
            dround("zscore", 6).alias("z6"),
            (
                F.coalesce(
                    F.abs(F.col("zscore")) > F.lit(_VOL_Z), F.lit(False)
                )
                | F.col("flat_dev")
            ).alias("is_anomaly"),
        )
    )


# ---------- order-independent table checksum ----------

_CK_P = 1000000007  # mixing modulus (keeps every product < 2^62)
_CK_M = (2654435761 % _CK_P, 2246822519 % _CK_P,
         3266489917 % _CK_P, 668265263 % _CK_P)


def _ck_mix_sql(terms: list[str]) -> str:
    parts = [
        f"(({t}) % {_CK_P}) * {m}" for t, m in zip(terms, _CK_M)
    ]
    return "(" + " + ".join(parts) + f") % {_CK_P}"


@register(
    "dq_table_checksum",
    f"""
    WITH o AS (
      SELECT {_ck_mix_sql([
          "o_orderkey",
          "o_custkey",
          "CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)",
          "datediff('day', DATE '1970-01-01', o_orderdate)",
      ])} AS h FROM orders
    ), l AS (
      SELECT {_ck_mix_sql([
          "l_orderkey",
          "l_linenumber",
          "l_partkey",
          "CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)",
      ])} AS h FROM lineitem
    )
    SELECT 'orders' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(bit_xor(h) AS BIGINT) AS xor_sig,
           CAST(SUM(CAST(h AS HUGEINT)) % {_CK_P} AS BIGINT) AS sum_sig
    FROM o
    UNION ALL
    SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
           CAST(bit_xor(h) AS BIGINT),
           CAST(SUM(CAST(h AS HUGEINT)) % {_CK_P} AS BIGINT)
    FROM l
    """,
    doc="order-independent table checksums (XOR + modular-sum of a "
    "multiplicative row hash) for orders and lineitem — the "
    "replication/migration reconciliation primitive",
)
def dq_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-system reconciliation: two copies of a table match iff
    row count + two order-independent signatures match — no sort, no
    row-by-row diff. XOR catches single-row corruption; the modular
    sum catches the duplicate-pair case XOR is blind to (x⊕x = 0).

    Hash discipline: every operand is reduced mod p BEFORE the
    multiply (products stay < 2^62 — Spark wraps int64 silently while
    DuckDB raises, so pre-reduction is what keeps the two engines on
    the same arithmetic; the ``sample_train_split`` overflow rule).
    Money/quantity enter as exact cents; dates as epoch days. Both
    aggregates are commutative/associative → partition-order-free and
    MERGEABLE: per-partition signatures combine by xor/sum-mod-p, so
    a 100 TB reconciliation ships one tiny signature row per shard.

    Scale: one map-side-combined pass per table, zero row shuffles
    (the aggregate states are single integers).
    """
    o = load(spark, "orders", sf_dir)
    li = load(spark, "lineitem", sf_dir)

    def mix(terms: list) -> F.Column:
        acc = None
        for t, m in zip(terms, _CK_M):
            part = (t % F.lit(_CK_P)) * F.lit(m)
            acc = part if acc is None else acc + part
        return acc % F.lit(_CK_P)

    oh = o.select(
        mix(
            [
                F.col("o_orderkey"),
                F.col("o_custkey"),
                F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast(
                    "long"
                ),
                F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).cast(
                    "long"
                ),
            ]
        ).alias("h")
    )
    lh = li.select(
        mix(
            [
                F.col("l_orderkey"),
                F.col("l_linenumber").cast("long"),
                F.col("l_partkey"),
                F.floor(F.col("l_quantity") * 100.0 + F.lit(0.5)).cast(
                    "long"
                ),
            ]
        ).alias("h")
    )

    def sig(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(h)").cast("long").alias("xor_sig"),
            (F.sum(F.col("h").cast("decimal(38,0)")) % F.lit(_CK_P))
            .cast("long")
            .alias("sum_sig"),
        ).select(
            F.lit(name).alias("table_name"), "n_rows", "xor_sig", "sum_sig"
        )

    return sig(oh, "orders").unionByName(sig(lh, "lineitem"))


# ---------- fiscal 4-4-5 calendar mapping ----------

_FY_START = "1996-01-01"  # fiscal year anchor (a Monday), inside the orders range


@register(
    "f_fiscal_445",
    f"""
    WITH d AS (
      SELECT o_orderkey, o_orderdate,
             datediff('day', DATE '{_FY_START}', o_orderdate) AS doff
      FROM orders WHERE o_orderdate >= DATE '{_FY_START}'
        AND o_orderdate < DATE '{_FY_START}' + INTERVAL 364 DAY
    ), w AS (
      SELECT *, doff // 7 AS wk FROM d
    )
    SELECT o_orderkey, o_orderdate,
           CAST(wk AS BIGINT) AS fiscal_week,
           CAST(wk // 13 + 1 AS BIGINT) AS fiscal_quarter,
           CAST(CASE WHEN wk % 13 < 4 THEN 1
                     WHEN wk % 13 < 8 THEN 2
                     ELSE 3 END + (wk // 13) * 3 AS BIGINT)
             AS fiscal_period,
           CAST(doff - wk * 7 + 1 AS BIGINT) AS day_of_week
    FROM w
    """,
    doc="4-4-5 fiscal calendar mapping: order dates to 52-week fiscal "
    "weeks/periods/quarters by pure integer day arithmetic — the "
    "retail-calendar assignment every BI stack needs",
)
def f_fiscal_445(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 4-4-5 retail calendar: each quarter is 13 weeks split into
    months of 4, 4, and 5 weeks, so every fiscal period has a whole
    number of weeks and period-over-period comparisons align by
    weekday. No calendar function can produce it — it is pure integer
    arithmetic on the day offset from the fiscal anchor:
    week = doff div 7, quarter = week div 13, period within quarter by
    the 4/8 boundaries. A 52-week window keeps the mapping total (the
    real-world 53rd-week rule is a documented policy choice layered on
    the same arithmetic).

    Every output is an exact integer; both engines floor-divide
    non-negative operands identically (the `div` rule).

    Scale: stateless per-row projection fused with the scan; the date
    filter pushes down to parquet (planning-time literals).
    """
    o = load(spark, "orders", sf_dir)
    start = F.lit(_FY_START).cast("date")
    d = o.filter(
        (F.col("o_orderdate") >= start)
        & (F.col("o_orderdate") < F.date_add(start, 364))
    ).select(
        "o_orderkey",
        "o_orderdate",
        F.datediff("o_orderdate", start).alias("doff"),
    )
    wk = F.expr("doff div 7")
    return d.select(
        "o_orderkey",
        "o_orderdate",
        wk.cast("long").alias("fiscal_week"),
        F.expr("doff div 7 div 13 + 1").cast("long").alias("fiscal_quarter"),
        (
            F.when(F.expr("(doff div 7) % 13") < 4, 1)
            .when(F.expr("(doff div 7) % 13") < 8, 2)
            .otherwise(3)
            + F.expr("doff div 7 div 13") * 3
        )
        .cast("long")
        .alias("fiscal_period"),
        (F.col("doff") - wk * 7 + 1).cast("long").alias("day_of_week"),
    )


# ---------- business-day arithmetic ----------


def _busday_extra_table() -> dict[tuple[int, int], int]:
    """extra[(dow1, rem)] = business days among the `rem` calendar days
    following a day whose ISO dow is dow1 (1=Mon..7=Sun). Generated
    once in Python; emitted as literals into BOTH engines' CASE
    expressions so the two can never disagree."""
    out = {}
    for dow1 in range(1, 8):
        for rem in range(7):
            n = 0
            for k in range(1, rem + 1):
                d = (dow1 - 1 + k) % 7 + 1  # ISO dow of day k after
                if d <= 5:
                    n += 1
            out[(dow1, rem)] = n
    return out


_BUSDAY_EXTRA = _busday_extra_table()


def _busday_case(dow_expr: str, rem_expr: str) -> str:
    whens = " ".join(
        f"WHEN ({dow_expr}) = {d} AND ({rem_expr}) = {r} THEN {v}"
        for (d, r), v in _BUSDAY_EXTRA.items()
    )
    return f"(CASE {whens} END)"


@register(
    "f_business_days",
    f"""
    SELECT l.l_orderkey, l.l_linenumber,
           CAST(datediff('day', o.o_orderdate, l.l_shipdate) AS BIGINT)
             AS calendar_days,
           CAST((datediff('day', o.o_orderdate, l.l_shipdate) // 7) * 5
                + {_busday_case("isodow(o.o_orderdate)",
                                "datediff('day', o.o_orderdate, l.l_shipdate) % 7")}
                AS BIGINT) AS business_days
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_orderkey < 400 AND l.l_shipdate >= o.o_orderdate
    """,
    doc="business-day latency between order and ship date: full weeks x 5 "
    "plus a generated (weekday, remainder) lookup emitted as literals "
    "into both engines — the SLA arithmetic calendars make painful",
)
def f_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekend-aware day counting (order date → ship date) — the
    difference between a 5-day SLA and a 7-day one. Closed form:
    ``full_weeks·5 + extra(dow(start),
    days mod 7)`` where the 7×7 ``extra`` table counts Mon–Fri days in
    the remainder window. The table is GENERATED in Python and pasted
    as literals into both the Column expression and the oracle SQL —
    the two engines execute the same lookup by construction (holiday
    calendars extend the same way: another generated literal table).

    ISO day-of-week on both sides (Spark ``dayofweek`` is
    Sunday-based — ``weekday()+1`` gives ISO; DuckDB ``isodow``).
    Defined on FORWARD intervals only — the synthetic corpus contains
    ship-before-order rows (data errors in a real pipeline) and the
    closed form's div/mod pair is floor-consistent only for
    non-negative spans, so those rows are filtered on both sides.

    Scale: stateless per-row integer arithmetic fused with the scan;
    the key filter pushes down.
    """
    li = load(spark, "lineitem", sf_dir).filter(F.col("l_orderkey") < 400)
    o = load(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    li = li.join(
        F.broadcast(o), li.l_orderkey == o.o_orderkey
    ).filter(F.col("l_shipdate") >= F.col("o_orderdate"))
    n = F.datediff("l_shipdate", "o_orderdate")
    dow = F.weekday("o_orderdate") + 1  # ISO: 1=Mon..7=Sun
    extra = None
    for (d, r), v in _BUSDAY_EXTRA.items():
        cond = (dow == d) & (n % 7 == r)
        extra = (
            F.when(cond, F.lit(v))
            if extra is None
            else extra.when(cond, F.lit(v))
        )
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        n.cast("long").alias("calendar_days"),
        (F.expr("datediff(l_shipdate, o_orderdate) div 7") * 5 + extra)
        .cast("long")
        .alias("business_days"),
    )


_FRESH_SLA_S = 3600  # freshness SLA: every stream within 1h of the head


@register(
    "dq_freshness_lag",
    f"""
    WITH m AS (
      SELECT event_type,
             MAX(epoch_us({EVENTS_TS_SQL})) AS mx,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type
    ),
    g AS (SELECT MAX(mx) AS gmx FROM m)
    SELECT m.event_type, m.n AS n_events,
           CAST((g.gmx - m.mx) // 1000000 AS BIGINT) AS lag_s,
           COALESCE((g.gmx - m.mx) // 1000000 > {_FRESH_SLA_S}, FALSE)
             AS sla_breach
    FROM m CROSS JOIN g
    """,
    doc=f"per-stream freshness audit: each event type's lag behind "
    f"the newest event anywhere, with a {_FRESH_SLA_S}s SLA verdict — "
    "the stalled-producer detector a pipeline health page reads",
)
def dq_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness monitoring: a producer that silently stops shows up
    as its stream's max event time falling behind the global head.
    Lag is an exact integer second count; the SLA flag is the
    COALESCE'd boolean (nullable-boolean canonicalization rule).

    Scale: one map-side-combined MAX per key (no raw-row shuffle),
    one 1-row global max broadcast back. O(types) output.
    """
    ev = load(spark, "events", sf_dir)
    m = ev.groupBy("event_type").agg(
        F.max(F.unix_micros("ts")).alias("mx"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    g = m.agg(F.max("mx").alias("gmx"))
    return m.crossJoin(F.broadcast(g)).select(
        "event_type",
        F.col("n").alias("n_events"),
        F.expr("(gmx - mx) div 1000000").cast("long").alias("lag_s"),
        F.coalesce(
            F.expr(f"(gmx - mx) div 1000000 > {_FRESH_SLA_S}"), F.lit(False)
        ).alias("sla_breach"),
    )


_L_DIV = 3


@register(
    "dq_l_diversity",
    f"""
    WITH g AS (
      SELECT lang, n_chars // {_CHAR_BUCKET} AS len_bucket,
             CAST(COUNT(*) AS BIGINT) AS group_size,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sensitive
      FROM documents GROUP BY lang, len_bucket
    )
    SELECT lang, CAST(len_bucket AS BIGINT) AS len_bucket, group_size,
           n_sensitive, n_sensitive < {_L_DIV} AS violates_l
    FROM g
    """,
    doc=f"l-diversity release gate (l={_L_DIV}): per quasi-identifier "
    "group, the sensitive attribute (source) must take ≥ l distinct "
    "values — catches the homogeneity attack k-anonymity misses",
)
def dq_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The homogeneity-attack complement to ``dq_k_anonymity``: a
    bucket can satisfy k-anonymity yet leak everything if all its
    members share one sensitive value — an attacker who places a
    record in the bucket learns the attribute without identifying the
    row. Distinct-l-diversity requires ≥ l distinct sensitive values
    per quasi-identifier group; violating groups need generalization
    or suppression before release. Run BOTH gates: k bounds
    re-identification, l bounds attribute disclosure.

    Scale: one aggregation on the quasi-identifier tuple; the
    COUNT(DISTINCT) is a two-phase partial aggregate (Spark expands
    it map-side) — no raw-row shuffle beyond the distinct pairs.
    """
    docs = load(spark, "documents", sf_dir)
    g = docs.groupBy(
        "lang",
        F.expr(f"n_chars div {_CHAR_BUCKET}").alias("len_bucket"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("group_size"),
        F.countDistinct("source").cast("long").alias("n_sensitive"),
    )
    return g.select(
        "lang",
        "len_bucket",
        "group_size",
        "n_sensitive",
        (F.col("n_sensitive") < _L_DIV).alias("violates_l"),
    )


@register(
    "dq_sequence_gaps",
    """
    WITH s AS (
      SELECT event_id,
             event_id - LAG(event_id) OVER (ORDER BY event_id) AS delta
      FROM events
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(event_id) AS BIGINT) AS min_id,
           CAST(MAX(event_id) AS BIGINT) AS max_id,
           CAST(MAX(event_id) - MIN(event_id) + 1 - COUNT(*) AS BIGINT)
             AS n_missing,
           CAST(SUM(CASE WHEN delta = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_duplicates,
           CAST(SUM(CASE WHEN delta > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_gap_runs,
           CAST(MAX(delta) - 1 AS BIGINT) AS max_gap
    FROM s
    """,
    doc="monotonic-id completeness audit: missing-id mass from the "
    "range-vs-count identity plus gap-run/duplicate counts from lag "
    "deltas — the first question asked of any ingested sequence "
    "('did we drop events?')",
)
def dq_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-completeness audit for monotonically-assigned ids:
    total missing mass is the exact identity max−min+1−count (no scan
    of the gaps themselves), while lag deltas localize it — how many
    distinct gap RUNS, the largest one, and any duplicated ids
    (delta 0 — the at-least-once-delivery fingerprint). A producer
    crash shows as one big run; steady sampling loss shows as many
    size-1 runs; both alarm differently.

    Scale: the identity needs only min/max/count (map-side combined,
    no order); the lag pass needs the total order — at 100 TB run it
    per shard/partition key (ids are per-partition monotonic in
    Kafka anyway), exactly like the other sequence ops.
    """
    ev = load(spark, "events", sf_dir)
    # lag of the sort key itself == exclusive running max of it — the
    # two-phase bucketed form (no single-partition window)
    s = with_prefix_agg(
        ev.select("event_id"), "event_id", (), "event_id", "max",
        out="prev", inclusive=False,
    ).select("event_id", (F.col("event_id") - F.col("prev")).alias("delta"))
    return s.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("event_id").cast("long").alias("min_id"),
        F.max("event_id").cast("long").alias("max_id"),
        (F.max("event_id") - F.min("event_id") + 1 - F.count(F.lit(1)))
        .cast("long")
        .alias("n_missing"),
        F.sum(F.when(F.col("delta") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_duplicates"),
        F.sum(F.when(F.col("delta") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_gap_runs"),
        (F.max("delta") - 1).cast("long").alias("max_gap"),
    )


@register(
    "dq_order_reconcile",
    """
    WITH li AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
                  * (1 + l_tax) * 100.0 + 0.5) AS HUGEINT)) AS BIGINT)
               AS computed_cents
      FROM lineitem GROUP BY l_orderkey
    ),
    j AS (
      SELECT o.o_orderkey,
             CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT)
               AS stated_cents,
             li.computed_cents,
             abs(CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT)
                 - li.computed_cents) AS diff_cents
      FROM orders o JOIN li ON li.l_orderkey = o.o_orderkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN diff_cents <= 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_reconciled,
           CAST(SUM(CASE WHEN diff_cents > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_mismatched,
           CAST(MAX(diff_cents) AS BIGINT) AS max_diff_cents,
           CAST(SUM(CASE WHEN diff_cents > 1 THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS mismatch_ppm
    FROM j
    """,
    doc="cross-table financial reconciliation: each order's stated "
    "total vs the cent-exact recomputed lineitem sum "
    "(price·(1−disc)·(1+tax)) — the invoice-integrity audit; "
    "mismatches localize upstream pricing/rounding bugs",
)
def dq_order_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconciliation — the audit that catches what per-table checks
    cannot: a header total and its detail rows disagreeing. Both
    sides are cent-quantized BEFORE comparison (the money convention:
    never compare raw doubles), a ±1-cent tolerance absorbs the
    header's own rounding, and the mismatch count/magnitude localize
    whether the generator rounds per-line or per-order. On the
    synthetic corpus the stated totals are independent draws — the
    audit REPORTS that honestly (high mismatch_ppm), which is exactly
    its job on broken data.

    Scale: one map-side-combined detail rollup, one id-keyed join to
    headers (bucketed/co-located at 100 TB), a 1-row verdict.
    """
    li = load(spark, "lineitem", sf_dir)
    o = load(spark, "orders", sf_dir)
    computed = li.groupBy("l_orderkey").agg(
        F.sum(
            F.floor(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
                * F.lit(100.0)
                + F.lit(0.5)
            ).cast("decimal(38,0)")
        )
        .cast("long")
        .alias("computed_cents")
    )
    j = o.join(computed, o.o_orderkey == computed.l_orderkey).select(
        F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("stated_cents"),
        "computed_cents",
    ).select(
        F.abs(F.col("stated_cents") - F.col("computed_cents")).alias(
            "diff_cents"
        )
    )
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.when(F.col("diff_cents") <= 1, 1).otherwise(0))
        .cast("long")
        .alias("n_reconciled"),
        F.sum(F.when(F.col("diff_cents") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_mismatched"),
        F.max("diff_cents").cast("long").alias("max_diff_cents"),
        F.expr(
            "sum(CASE WHEN diff_cents > 1 THEN 1 ELSE 0 END) * 1000000 "
            "div count(1)"
        )
        .cast("long")
        .alias("mismatch_ppm"),
    )
