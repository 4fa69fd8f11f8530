"""Privacy / anonymity audit operators (engine extension; absent in
reference — the data-governance surface a training-data pipeline needs
before releasing or mixing user-derived corpora).

Five operators over the TPC-H-ish ``customer`` / ``events`` tables:

- ``privacy_k_anonymity``: equivalence-class size profile of a
  quasi-identifier (QI) tuple — the k-anonymity audit (Sweeney 2002).
- ``privacy_l_diversity``: per-class distinct-count of a sensitive
  attribute — the l-diversity refinement (Machanavajjhala 2007).
- ``privacy_generalization_ladder``: re-identification risk vs a
  4-level QI generalization lattice (Mondrian/Datafly flavor) —
  how much suppression each coarsening level still needs.
- ``privacy_dp_counts``: per-key counts with DETERMINISTIC Laplace
  noise (inverse-CDF on an affine-mod-prime draw, the
  ``agg_bootstrap_ci`` pattern) — the differential-privacy release
  shape with zero ``rand()`` so both engines produce identical bits.
- ``privacy_t_closeness``: per-class total-variation distance to the
  global sensitive mix, integer-ppm — completes the k/l/t triple.

Scale (100 TB): every op is one map-side-combined hash aggregation on
the QI key (class tables are bounded by the distinct-QI domain, orders
of magnitude smaller than the fact table), followed by a tiny
re-aggregation over class sizes. No windows, no joins, no collect.
The ladder op fans each row out 4x (one row per generalization level)
BEFORE the single shuffle — one exchange, not four scans.

Determinism: bucket keys come from one IEEE double division + FLOOR
(identical bits on both engines — the agg_histogram convention); all
counts are exact integers; the only transcendental (Laplace ln) is
quantized via ``dround`` before comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cs_pipeline_spark.operators.helpers import dround, sql_dround
from cs_pipeline_spark.registry import register
from cs_pipeline_spark.tables import load

# k-anonymity threshold: classes smaller than this are "at risk"
_K = 5
# l-diversity threshold on the sensitive attribute
_L = 3

# QI bucket: floor(c_acctbal / 1000.0) — one IEEE division + floor,
# bit-identical across engines (agg_histogram convention)
_BUCKET = 'CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT)'


def _classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equivalence classes of the (nationkey, acctbal-bucket) QI."""
    cust = load(spark, "customer", sf_dir)
    return (
        cust.groupBy(
            F.col("c_nationkey"),
            F.floor(F.col("c_acctbal") / F.lit(1000.0))
            .cast("long")
            .alias("bal_bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "privacy_k_anonymity",
    f"""
    WITH cls AS (
      SELECT c_nationkey, {_BUCKET} AS bal_bucket, COUNT(*) AS n
      FROM customer GROUP BY 1, 2
    )
    SELECT n AS class_size,
           CAST(COUNT(*) AS BIGINT) AS num_classes,
           CAST(SUM(n) AS BIGINT) AS num_rows,
           n < {_K} AS at_risk
    FROM cls GROUP BY n ORDER BY class_size
    """,
    doc=f"k-anonymity audit: equivalence-class size profile of the (nation, acctbal-bucket) quasi-identifier with the k<{_K} at-risk flag — the re-identification risk histogram run before releasing user-derived data",
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-size histogram of the QI partition: how many equivalence
    classes (and rows) sit at each anonymity level k, flagged when
    k < 5 (Sweeney's k-anonymity, the release-gate form).

    Scale: groupBy(QI) is one map-side-combined shuffle bounded by the
    QI domain; the second groupBy(n) aggregates the already-tiny class
    table. ``at_risk`` is never NULL (count(*) >= 1), so no COALESCE
    canonicalization is needed.
    """
    cls = _classes(spark, sf_dir)
    return (
        cls.groupBy(F.col("n").alias("class_size"))
        .agg(
            F.count(F.lit(1)).alias("num_classes"),
            F.sum("n").alias("num_rows"),
        )
        .withColumn("at_risk", F.col("class_size") < F.lit(_K))
        .orderBy("class_size")
    )


@register(
    "privacy_l_diversity",
    f"""
    WITH cls AS (
      SELECT c_nationkey, {_BUCKET} AS bal_bucket,
             COUNT(*) AS n,
             COUNT(DISTINCT c_mktsegment) AS l
      FROM customer GROUP BY 1, 2
    )
    SELECT l AS diversity,
           CAST(COUNT(*) AS BIGINT) AS num_classes,
           CAST(SUM(n) AS BIGINT) AS num_rows,
           l < {_L} AS at_risk
    FROM cls GROUP BY l ORDER BY diversity
    """,
    doc=f"l-diversity audit: per-QI-class distinct sensitive values (mktsegment), histogrammed with the l<{_L} at-risk flag — catches the homogeneity attack k-anonymity misses (a k=50 class where all 50 share the sensitive value)",
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity profile: distinct-count of the sensitive attribute
    within each QI equivalence class, then a histogram over l.

    Scale: exact COUNT(DISTINCT) inside groupBy(QI) expands to the
    standard two-phase partial aggregate (distinct pairs first) — both
    shuffles keyed and map-side combined; no global distinct.
    """
    cust = load(spark, "customer", sf_dir)
    cls = cust.groupBy(
        F.col("c_nationkey"),
        F.floor(F.col("c_acctbal") / F.lit(1000.0))
        .cast("long")
        .alias("bal_bucket"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("c_mktsegment").alias("l"),
    )
    return (
        cls.groupBy(F.col("l").alias("diversity"))
        .agg(
            F.count(F.lit(1)).alias("num_classes"),
            F.sum("n").alias("num_rows"),
        )
        .withColumn("at_risk", F.col("diversity") < F.lit(_L))
        .orderBy("diversity")
    )


# generalization lattice: bucket widths per level (level 3 drops the
# balance dimension entirely — classes collapse to nations)
_WIDTHS = {0: 1000.0, 1: 5000.0, 2: 20000.0}


@register(
    "privacy_generalization_ladder",
    f"""
    WITH lv AS (SELECT unnest([0, 1, 2, 3]) AS level),
    base AS (
      SELECT lv.level, c_nationkey,
             CASE
               WHEN lv.level = 0 THEN CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT)
               WHEN lv.level = 1 THEN CAST(FLOOR(c_acctbal / 5000.0) AS BIGINT)
               WHEN lv.level = 2 THEN CAST(FLOOR(c_acctbal / 20000.0) AS BIGINT)
               ELSE 0
             END AS bal_bucket
      FROM customer CROSS JOIN lv
    ),
    cls AS (
      SELECT level, c_nationkey, bal_bucket, COUNT(*) AS n
      FROM base GROUP BY 1, 2, 3
    )
    SELECT level,
           CAST(COUNT(*) AS BIGINT) AS num_classes,
           CAST(MIN(n) AS BIGINT) AS min_k,
           CAST(SUM(CASE WHEN n < {_K} THEN n ELSE 0 END) AS BIGINT)
             AS suppressed_rows,
           CAST((SUM(CASE WHEN n < {_K} THEN n ELSE 0 END) * 1000000)
                // SUM(n) AS BIGINT) AS suppressed_ppm
    FROM cls GROUP BY level ORDER BY level
    """,
    doc=f"generalization-lattice risk ladder: 4 QI coarsening levels (acctbal width 1000 → 5000 → 20000 → dropped) scored by min-k and the row fraction still needing suppression for k>={_K} — the Datafly/Mondrian 'how much do we have to blur' curve",
)
def privacy_generalization_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppression cost at each generalization level: rows living in
    classes below k=5 would have to be dropped; the ladder shows the
    privacy/utility trade (coarser QI → fewer suppressed rows).

    Scale: each row fans out 4x (one per level) BEFORE the single
    groupBy(level, QI) shuffle — one exchange instead of four scans;
    the per-level summary aggregates the bounded class table. ppm uses
    integer ``div`` (non-negative operands — Spark ``div`` and DuckDB
    ``//`` agree).
    """
    cust = load(spark, "customer", sf_dir)
    fan = cust.select(
        "c_nationkey",
        "c_acctbal",
        F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("level"),
    )
    bucket = F.lit(0).cast("long")
    for lvl, width in sorted(_WIDTHS.items(), reverse=True):
        bucket = F.when(
            F.col("level") == lvl,
            F.floor(F.col("c_acctbal") / F.lit(width)).cast("long"),
        ).otherwise(bucket)
    cls = fan.groupBy(
        "level", "c_nationkey", bucket.alias("bal_bucket")
    ).agg(F.count(F.lit(1)).alias("n"))
    summary = cls.groupBy("level").agg(
        F.count(F.lit(1)).alias("num_classes"),
        F.min("n").alias("min_k"),
        F.sum(F.when(F.col("n") < _K, F.col("n")).otherwise(0)).alias(
            "suppressed_rows"
        ),
        F.sum("n").alias("total_n"),
    )
    return summary.select(
        "level",
        "num_classes",
        "min_k",
        "suppressed_rows",
        F.expr("(suppressed_rows * 1000000) div total_n").alias(
            "suppressed_ppm"
        ),
    ).orderBy("level")


@register(
    "privacy_anonymize_release",
    f"""
    WITH lv AS (SELECT unnest([0, 1, 2, 3]) AS level),
    fan AS (
      SELECT lv.level, c_custkey, c_nationkey, c_acctbal,
             CASE
               WHEN lv.level = 0 THEN CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT)
               WHEN lv.level = 1 THEN CAST(FLOOR(c_acctbal / 5000.0) AS BIGINT)
               WHEN lv.level = 2 THEN CAST(FLOOR(c_acctbal / 20000.0) AS BIGINT)
               ELSE 0
             END AS bal_bucket
      FROM customer CROSS JOIN lv
    ),
    sz AS (
      SELECT level, c_nationkey, bal_bucket, COUNT(*) AS n
      FROM fan GROUP BY 1, 2, 3
    ),
    pick AS (
      SELECT f.c_custkey,
             MIN(f.c_nationkey) AS nat,
             MIN(f.c_acctbal) AS bal,
             MIN(CASE WHEN s.n >= {_K} THEN f.level END) AS lvl
      FROM fan f
      JOIN sz s ON s.level = f.level
              AND s.c_nationkey = f.c_nationkey
              AND s.bal_bucket = f.bal_bucket
      GROUP BY f.c_custkey
    )
    SELECT c_custkey,
           CAST(COALESCE(lvl, 4) AS BIGINT) AS level_used,
           CASE WHEN lvl IS NOT NULL THEN nat END AS nation_released,
           CASE
             WHEN lvl = 0 THEN CAST(FLOOR(bal / 1000.0) AS BIGINT)
             WHEN lvl = 1 THEN CAST(FLOOR(bal / 5000.0) AS BIGINT)
             WHEN lvl = 2 THEN CAST(FLOOR(bal / 20000.0) AS BIGINT)
           END AS bal_bucket_released,
           CASE WHEN lvl = 0 THEN 1000 WHEN lvl = 1 THEN 5000
                WHEN lvl = 2 THEN 20000 END AS bal_width
    FROM pick ORDER BY c_custkey
    """,
    doc=f"k-anonymized release (local recoding): per row, the SMALLEST generalization level whose equivalence class reaches k>={_K} — finer levels keep more balance resolution; rows failing even nation-level are fully suppressed (level 4, NULL QI). The transform the ladder op only audits",
)
def privacy_anonymize_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-recoding k-anonymization: each row is released at its
    minimal generalization level ℓ where the level-ℓ class holds ≥ k
    rows (classic Datafly per-record descent); level 4 = suppressed.
    Class sizes are measured on the ORIGINAL partition per level (the
    standard nested-generalization estimate — published classes only
    gain members when coarser rows fold in, so k is a lower bound).

    Scale: three keyed shuffles — fan-out groupBy(level, QI) for class
    sizes, a class-keyed equi-join of the 4x fan against the bounded
    class table, and groupBy(custkey) to pick min qualifying level.
    The released bucket is recomputed from (acctbal, level) expression-
    side, so no struct-min or second join is needed. No windows, no
    collect; the QI domain bounds the class table well below fact
    scale.
    """
    cust = load(spark, "customer", sf_dir)
    fan = cust.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("level"),
    )
    bucket = F.lit(0).cast("long")
    for lvl, width in sorted(_WIDTHS.items(), reverse=True):
        bucket = F.when(
            F.col("level") == lvl,
            F.floor(F.col("c_acctbal") / F.lit(width)).cast("long"),
        ).otherwise(bucket)
    fan = fan.withColumn("bal_bucket", bucket)
    sz = fan.groupBy("level", "c_nationkey", "bal_bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    pick = (
        fan.join(sz, ["level", "c_nationkey", "bal_bucket"])
        .groupBy("c_custkey")
        .agg(
            F.min("c_nationkey").alias("nat"),
            F.min("c_acctbal").alias("bal"),
            F.min(
                F.when(F.col("n") >= _K, F.col("level"))
            ).alias("lvl"),
        )
    )
    rel_bucket = F.lit(None).cast("long")
    for lvl, width in sorted(_WIDTHS.items(), reverse=True):
        rel_bucket = F.when(
            F.col("lvl") == lvl,
            F.floor(F.col("bal") / F.lit(width)).cast("long"),
        ).otherwise(rel_bucket)
    width_col = F.lit(None).cast("int")
    for lvl, width in sorted(_WIDTHS.items(), reverse=True):
        width_col = F.when(
            F.col("lvl") == lvl, F.lit(int(width))
        ).otherwise(width_col)
    return pick.select(
        "c_custkey",
        F.coalesce(F.col("lvl"), F.lit(4)).cast("long").alias("level_used"),
        F.when(F.col("lvl").isNotNull(), F.col("nat")).alias(
            "nation_released"
        ),
        rel_bucket.alias("bal_bucket_released"),
        width_col.alias("bal_width"),
    ).orderBy("c_custkey")


# Laplace scale b = sensitivity/epsilon = 1/0.1; draws come from an
# affine-mod-prime generator (agg_bootstrap_ci pattern) so the
# "noise" is deterministic and engine-identical
_LAPLACE_B = 10.0
_PRIME = 2147483647  # 2^31 - 1


def _seed_sql(n: str, et: str) -> str:
    return f"(({n}) * 131 + ascii({et}) * 7 + length({et})) % {_PRIME}"


@register(
    "privacy_dp_counts",
    f"""
    WITH cnt AS (
      SELECT event_type, COUNT(*) AS n_exact FROM events GROUP BY event_type
    ),
    draw AS (
      SELECT event_type, n_exact,
             CAST(((1103515245 * ({_seed_sql('n_exact', 'event_type')})
                   + 12345) % {_PRIME}) + 1 AS DOUBLE)
               / {float(_PRIME + 2):.1f} AS u
      FROM cnt
    )
    SELECT event_type, n_exact,
           {sql_dround(
               f"n_exact + (-{_LAPLACE_B} * sign(u - 0.5)"
               f" * ln(1.0 - 2.0 * abs(u - 0.5)))", 3)}
             AS noisy_count
    FROM draw ORDER BY event_type
    """,
    doc=f"differential-privacy count release: per-event-type counts plus Laplace(b={_LAPLACE_B}) noise drawn via inverse-CDF on a deterministic affine-mod-prime generator (zero rand(), bit-stable across engines) — the DP release shape with an auditable noise path",
)
def privacy_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-noised counts with a fully deterministic noise draw:
    u = affine(seed) mod p scaled into (0,1) (the +1 / p+2 scaling
    keeps u strictly inside (0,1) so ln never sees 0), then the
    Laplace inverse CDF -b*sgn(u-1/2)*ln(1-2|u-1/2|). The ln term is
    the only transcendental and is quantized (``dround`` 1e-3) before
    the hash comparison, per the chi2/entropy convention.

    Scale: one map-side-combined count shuffle on event_type; the
    noise is per-group scalar arithmetic. Seed pre-mods by p so the
    affine multiply stays under int64 even at 1e12-row groups.
    """
    ev = load(spark, "events", sf_dir)
    cnt = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_exact"))
    seed = (
        F.col("n_exact") * F.lit(131)
        + F.ascii(F.col("event_type")) * F.lit(7)
        + F.length(F.col("event_type"))
    ) % F.lit(_PRIME)
    u_raw = (F.lit(1103515245) * seed + F.lit(12345)) % F.lit(_PRIME)
    u = (u_raw + F.lit(1)).cast("double") / F.lit(float(_PRIME + 2))
    noise = (
        F.lit(-_LAPLACE_B)
        * F.signum(u - F.lit(0.5))
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u - F.lit(0.5)))
    )
    return (
        cnt.select(
            "event_type",
            "n_exact",
            dround(F.col("n_exact") + noise, 3).alias("noisy_count"),
        )
        .orderBy("event_type")
    )


# t-closeness threshold in ppm of total-variation distance (t > 0.3)
_T_PPM = 300000


@register(
    "privacy_t_closeness",
    f"""
    WITH seg AS (
      SELECT c_nationkey, {_BUCKET} AS bal_bucket, c_mktsegment,
             COUNT(*) AS n_cs
      FROM customer GROUP BY 1, 2, 3
    ),
    withc AS (
      SELECT *, SUM(n_cs) OVER (PARTITION BY c_nationkey, bal_bucket)
                  AS n_c
      FROM seg
    ),
    gmix AS (
      SELECT c_mktsegment, COUNT(*) AS n_s FROM customer GROUP BY 1
    ),
    tot AS (SELECT COUNT(*) AS big_n FROM customer),
    terms AS (
      SELECT w.c_nationkey, w.bal_bucket, w.n_c,
             (w.n_cs * 1000000) // w.n_c AS p_c_ppm,
             (g.n_s * 1000000) // t.big_n AS p_g_ppm
      FROM withc w
      JOIN gmix g ON g.c_mktsegment = w.c_mktsegment
      CROSS JOIN tot t
    ),
    cls AS (
      SELECT c_nationkey, bal_bucket,
             CAST(MIN(n_c) AS BIGINT) AS n_c,
             CAST((SUM(abs(p_c_ppm - p_g_ppm))
                   + (1000000 - SUM(p_g_ppm))) // 2 AS BIGINT) AS t_ppm
      FROM terms GROUP BY 1, 2
    )
    SELECT t_ppm // 100000 AS t_decile,
           CAST(COUNT(*) AS BIGINT) AS num_classes,
           CAST(SUM(n_c) AS BIGINT) AS num_rows,
           (t_ppm // 100000) >= {_T_PPM // 100000} AS at_risk
    FROM cls GROUP BY 1, 4 ORDER BY t_decile
    """,
    doc=f"t-closeness audit: per-QI-class total-variation distance (integer ppm) between the class sensitive-value mix and the global mix, histogrammed by decile with the t>{_T_PPM / 1e6} at-risk flag — completes the k/l/t anonymity triple (catches skewed-but-diverse classes l-diversity passes)",
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-variation t-closeness over the categorical sensitive
    attribute: t = ½(Σ_present |p_c − p_g| + absent global mass),
    every probability quantized to integer ppm via floor-div BEFORE
    the sum (the quantize-terms-before-sum convention) — bit-exact,
    no float division anywhere.

    Scale: groupBy(QI, segment) is the only fact-scale shuffle; the
    n_c window partitions by QI (bounded classes, never global); the
    5-row global mix and 1-row total broadcast. ppm floor-div keeps
    everything in int64 up to ~9e12 rows per class (pre-scale beyond
    that, per the helpers overflow convention).
    """
    from pyspark.sql import Window

    cust = load(spark, "customer", sf_dir)
    bucket = (
        F.floor(F.col("c_acctbal") / F.lit(1000.0))
        .cast("long")
        .alias("bal_bucket")
    )
    seg = cust.groupBy(
        F.col("c_nationkey"), bucket, F.col("c_mktsegment")
    ).agg(F.count(F.lit(1)).alias("n_cs"))
    wc = seg.withColumn(
        "n_c",
        F.sum("n_cs").over(
            Window.partitionBy("c_nationkey", "bal_bucket")
        ),
    )
    glob = cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_s")
    )
    tot = cust.agg(F.count(F.lit(1)).alias("big_n"))
    terms = (
        wc.join(F.broadcast(glob), "c_mktsegment")
        .crossJoin(F.broadcast(tot))
        .select(
            "c_nationkey",
            "bal_bucket",
            "n_c",
            F.expr("(n_cs * 1000000) div n_c").alias("p_c_ppm"),
            F.expr("(n_s * 1000000) div big_n").alias("p_g_ppm"),
        )
    )
    cls = terms.groupBy("c_nationkey", "bal_bucket").agg(
        F.min("n_c").alias("n_c"),
        F.expr(
            "CAST((SUM(abs(p_c_ppm - p_g_ppm))"
            " + (1000000 - SUM(p_g_ppm))) div 2 AS BIGINT)"
        ).alias("t_ppm"),
    )
    return (
        cls.groupBy(
            F.expr("t_ppm div 100000").alias("t_decile"),
        )
        .agg(
            F.count(F.lit(1)).alias("num_classes"),
            F.sum("n_c").alias("num_rows"),
        )
        .withColumn(
            "at_risk", F.col("t_decile") >= F.lit(_T_PPM // 100000)
        )
        .orderBy("t_decile")
    )


# ---------- randomized response (local DP) ----------


@register(
    "privacy_randomized_response",
    f"""
    WITH q AS (
      SELECT event_type,
             CAST(value >= 500.0 AS INT) AS sens,
             (((event_id % {_PRIME}) * 1103515245 + 12345) % {_PRIME})
               % 4 AS coin
      FROM events
    ),
    rr AS (
      SELECT event_type, sens,
             CASE WHEN coin < 3 THEN sens ELSE 1 - sens END AS reported
      FROM q
    ),
    g AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(sens) AS BIGINT) AS true_cnt,
             CAST(SUM(reported) AS BIGINT) AS reported_cnt
      FROM rr GROUP BY event_type
    )
    SELECT event_type, n, true_cnt, reported_cnt,
           4 * reported_cnt - n AS est_x2,
           CAST((4 * reported_cnt - n) * 1000000 // (2 * n) AS BIGINT)
             AS est_rate_ppm,
           CAST(true_cnt * 1000000 // n AS BIGINT) AS true_rate_ppm,
           CAST(ABS((4 * reported_cnt - n) * 1000000 // (2 * n)
                    - true_cnt * 1000000 // n) AS BIGINT) AS err_ppm
    FROM g
    """,
    doc="randomized response (Warner, p=3/4): each row reports its "
    "sensitive bit truthfully on a deterministic 3-of-4 hash coin "
    "and flipped otherwise, debiased per group as 2(obs − n/4) in "
    "exact integers — the LOCAL-DP mechanism (epsilon = ln 3 per "
    "row, no trusted curator) beside privacy_dp_counts' central "
    "Laplace release",
)
def privacy_randomized_response(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Local differential privacy: the rows THEMSELVES lie. With
    truth probability p = 3/4 each report is ε = ln(p/(1−p)) = ln 3
    locally private, and the population rate is recovered by the
    unbiased inverse 2·(obs − n/4) — here kept exact as est_x2 =
    4·obs − n (twice the estimate, a pure integer; the ppm rate
    divides once, truncating identically on both engines). The
    per-group error vs the true rate makes the utility cost of the
    mechanism part of the release — at n rows the RR noise is
    O(1/√n), visible at sf0.01 and negligible at 100 TB.

    The 'coin' is the repo's affine-mod-prime generator on event_id
    (zero rand(), bit-stable across engines — privacy_dp_counts'
    convention; a production deployment swaps in client-side
    entropy, which is exactly why the mechanism lives engine-side as
    a pure column expression).

    Scale: one map-side-combined fact pass; the debias is 5-row
    scalar arithmetic. Nothing shuffles but the group counts.
    """
    ev = load(spark, "events", sf_dir)
    q = ev.select(
        "event_type",
        (F.col("value") >= 500.0).cast("int").alias("sens"),
        (
            (
                (F.col("event_id") % _PRIME) * F.lit(1103515245)
                + F.lit(12345)
            )
            % F.lit(_PRIME)
            % 4
        ).alias("coin"),
    )
    rr = q.select(
        "event_type",
        "sens",
        F.when(F.col("coin") < 3, F.col("sens"))
        .otherwise(1 - F.col("sens"))
        .alias("reported"),
    )
    g = rr.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("sens").cast("long").alias("true_cnt"),
        F.sum("reported").cast("long").alias("reported_cnt"),
    )
    return g.select(
        "event_type",
        "n",
        "true_cnt",
        "reported_cnt",
        (F.lit(4) * F.col("reported_cnt") - F.col("n")).alias("est_x2"),
        F.expr(
            "cast((4 * reported_cnt - n) * 1000000 div (2 * n) as bigint)"
        ).alias("est_rate_ppm"),
        F.expr("cast(true_cnt * 1000000 div n as bigint)").alias(
            "true_rate_ppm"
        ),
        F.expr(
            "cast(abs((4 * reported_cnt - n) * 1000000 div (2 * n) "
            "- true_cnt * 1000000 div n) as bigint)"
        ).alias("err_ppm"),
    )
