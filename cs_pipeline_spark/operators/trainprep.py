"""Training-set preparation primitives: mergeable deterministic
sampling, mergeable quantile sketching, and leakage-safe feature
encoding.

These complete the "assemble a training corpus at 100 TB" story:
every op is a pure function of the data (multiplicative-hash
priorities, never rand()), mergeable (the partial-result contract the
backfill/increment pattern needs — see ``agg_incremental_merge``,
``agg_hll_mergeable``), and integer-exact end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cs_pipeline_spark.operators.helpers import one_part, with_rank_targets
from cs_pipeline_spark.registry import register
from cs_pipeline_spark.tables import load

_P = 1000000007
_MULT = 2654435761 % _P
_RES_K = 32

_PRI = f"((event_id % {_P}) * {_MULT}) % {_P}"


@register(
    "sample_reservoir_merge",
    f"""
    WITH q AS (
      SELECT event_id, value, {_PRI} AS pri FROM events
    ),
    direct AS (
      SELECT event_id, value, pri,
             ROW_NUMBER() OVER (ORDER BY pri, event_id) AS rank
      FROM q QUALIFY rank <= {_RES_K}
    ),
    parts AS (
      SELECT event_id, value, pri FROM (
        SELECT event_id, value, pri,
               ROW_NUMBER() OVER (PARTITION BY event_id % 4
                                  ORDER BY pri, event_id) AS prn
        FROM q) t
      WHERE prn <= {_RES_K}
    ),
    merged AS (
      SELECT event_id FROM (
        SELECT event_id,
               ROW_NUMBER() OVER (ORDER BY pri, event_id) AS rank
        FROM parts) t
      WHERE rank <= {_RES_K}
    ),
    inv AS (
      SELECT COUNT(*) = 0 AS ok
      FROM direct d LEFT JOIN merged m ON m.event_id = d.event_id
      WHERE m.event_id IS NULL
    )
    SELECT CAST(d.rank AS BIGINT) AS rank, d.event_id, d.value,
           COALESCE(inv.ok, FALSE) AS merge_ok
    FROM direct d CROSS JOIN inv
    """,
    doc=f"mergeable deterministic 'reservoir' sample: global top-{_RES_K} "
    "by multiplicative-hash priority, with a pinned proof that merging "
    "per-shard top-k reservoirs reproduces the global sample exactly",
)
def sample_reservoir_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded uniform sampling that MERGES: take the k rows with the
    smallest hash priority. Because the priority is a pure function of
    the key, top-k is distributive — top-k(shard reservoirs) ==
    global top-k — which is the property a 1000-executor sampler
    needs (each task keeps k rows, the driver merges k·tasks rows,
    never a global shuffle of the corpus). rand()-based reservoirs
    lose both determinism and mergeability.

    The plan computes the sample BOTH ways (direct global top-k, and
    per-shard top-k → merge → re-rank) and emits the equality as a
    ``merge_ok`` column the oracle pins TRUE.

    Scale: the per-shard pass is a window over event_id % 4 shards
    (at 100 TB: the natural input partitions); the merge re-ranks
    k·shards ≪ corpus rows. The 'direct' global window exists only to
    prove equality at test scale.
    """
    ev = load(spark, "events", sf_dir)
    q = ev.select("event_id", "value", F.expr(_PRI).alias("pri"))
    # global top-K via orderBy+limit → TakeOrderedAndProject (per-task
    # K-row heaps, driver merges K·P rows); ranks re-derived on the K
    # survivors only
    direct = (
        q.orderBy("pri", "event_id")
        .limit(_RES_K)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy(one_part("pri")).orderBy(
                    "pri", "event_id"
                )
            ),
        )
    )
    parts = (
        q.withColumn(
            "prn",
            F.row_number().over(
                Window.partitionBy(F.expr("event_id % 4")).orderBy(
                    "pri", "event_id"
                )
            ),
        )
        .filter(F.col("prn") <= _RES_K)
    )
    merged = (
        parts.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy(one_part("pri")).orderBy("pri", "event_id")
            )
        )
        .filter(F.col("rank") <= _RES_K)
        .select("event_id")
    )
    inv = (
        direct.join(merged, "event_id", "left_anti")
        .agg((F.count(F.lit(1)) == 0).alias("ok"))
    )
    return (
        direct.crossJoin(F.broadcast(inv))
        .select(
            F.col("rank").cast("long").alias("rank"),
            "event_id",
            "value",
            F.coalesce("ok", F.lit(False)).alias("merge_ok"),
        )
    )


_QV = "CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)"


@register(
    "agg_quantile_sketch_mergeable",
    f"""
    WITH q AS (SELECT {_QV} AS qv, event_id FROM events),
    r AS (
      SELECT qv,
             ROW_NUMBER() OVER (ORDER BY qv, event_id) AS rn,
             COUNT(*) OVER () AS n
      FROM q
    ),
    exact AS (
      SELECT MAX(n) AS n,
             MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT)
                 THEN qv END) AS e50,
             MAX(CASE WHEN rn = CAST(CEIL(0.99 * n) AS BIGINT)
                 THEN qv END) AS e99
      FROM r
    ),
    hist AS (
      SELECT CAST(length(printf('%b', qv)) AS BIGINT) AS b,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM q GROUP BY 1
    ),
    cum AS (
      SELECT b, SUM(c) OVER (ORDER BY b) AS cum FROM hist
    ),
    sk AS (
      SELECT
        (SELECT MIN(b) FROM cum, exact
          WHERE cum >= CAST(CEIL(0.5 * exact.n) AS BIGINT)) AS b50,
        (SELECT MIN(b) FROM cum, exact
          WHERE cum >= CAST(CEIL(0.99 * exact.n) AS BIGINT)) AS b99
    ),
    halves AS (
      SELECT event_id % 2 AS half,
             CAST(length(printf('%b', qv)) AS BIGINT) AS b,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM q GROUP BY 1, 2
    ),
    remerged AS (
      SELECT b, CAST(SUM(c) AS BIGINT) AS c FROM halves GROUP BY b
    ),
    inv AS (
      SELECT COUNT(*) = 0 AS ok FROM (
        SELECT b, c FROM hist EXCEPT SELECT b, c FROM remerged
      ) t
    )
    SELECT CAST(exact.n AS BIGINT) AS n_rows,
           CAST(exact.e50 AS DOUBLE) / 1000000.0 AS exact_p50,
           CAST(exact.e99 AS DOUBLE) / 1000000.0 AS exact_p99,
           sk.b50 AS p50_bucket, sk.b99 AS p99_bucket,
           COALESCE(CAST(length(printf('%b', exact.e50)) AS BIGINT)
                    = sk.b50, FALSE) AS p50_in_bucket,
           COALESCE(CAST(length(printf('%b', exact.e99)) AS BIGINT)
                    = sk.b99, FALSE) AS p99_in_bucket,
           COALESCE(inv.ok, FALSE) AS split_invariant
    FROM exact CROSS JOIN sk CROSS JOIN inv
    """,
    doc="mergeable log2-bucket quantile sketch: constant-memory "
    "histogram whose p50/p99 bucket must contain the exact discrete "
    "quantile (pinned verdicts) and whose halves-merge equals the "
    "full build — completes the sketch family (HLL, bitmap, CMS) "
    "with quantiles",
)
def agg_quantile_sketch_mergeable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """HDR-histogram-style quantile sketch: values bucket by integer
    bit length (floor(log2)+1 of the quantized value — an exact
    integer both engines compute from the binary string length, no
    float log). The sketch is O(64) counters, trivially mergeable
    (counts add), and answers quantiles with a relative-error bound
    of 2× (the bucket's span). The plan verifies the contract
    in-query: the exact discrete p50/p99 (rank pick) must land inside
    the sketch's chosen bucket, and a halves-built sketch must equal
    the full build — both emitted as pinned-TRUE booleans
    (COALESCE'd — the nullable-boolean canonicalization rule).

    Scale: the sketch build is one map-side-combined aggregate on
    ≤64 keys — the 100 TB path. The exact-quantile branch (global
    rank) exists only as the test-scale verifier, exactly like the
    approx_distinct / CMS contract ops.
    """
    ev = load(spark, "events", sf_dir)
    q = ev.select(F.expr(_QV).alias("qv"), "event_id")
    picks = with_rank_targets(
        q,
        "qv",
        ("event_id",),
        [
            "cast(ceil(0.5 * nn) as bigint)",
            "cast(ceil(0.99 * nn) as bigint)",
        ],
    )
    exact = picks.agg(
        F.max("nn").alias("n"),
        F.max(F.when(F.col("tid") == 0, F.col("value"))).alias("e50"),
        F.max(F.when(F.col("tid") == 1, F.col("value"))).alias("e99"),
    )
    blen = lambda c: F.length(F.bin(c)).cast("long")  # noqa: E731
    hist = q.groupBy(blen(F.col("qv")).alias("b")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    cum = hist.select(
        "b",
        F.sum("c").over(
            Window.partitionBy(one_part("b")).orderBy("b")
        ).alias("cum")
    )
    sk = (
        cum.crossJoin(F.broadcast(exact.select("n")))
        .select(
            F.when(
                F.col("cum") >= F.ceil(F.lit(0.5) * F.col("n")), F.col("b")
            ).alias("c50"),
            F.when(
                F.col("cum") >= F.ceil(F.lit(0.99) * F.col("n")), F.col("b")
            ).alias("c99"),
        )
        .agg(F.min("c50").alias("b50"), F.min("c99").alias("b99"))
    )
    halves = q.groupBy(
        F.expr("event_id % 2").alias("half"), blen(F.col("qv")).alias("b")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    remerged = halves.groupBy("b").agg(
        F.sum("c").cast("long").alias("c")
    )
    inv = (
        hist.exceptAll(remerged)
        .agg((F.count(F.lit(1)) == 0).alias("ok"))
    )
    return (
        exact.crossJoin(F.broadcast(sk))
        .crossJoin(F.broadcast(inv))
        .select(
            F.col("n").cast("long").alias("n_rows"),
            (F.col("e50").cast("double") / F.lit(1e6)).alias("exact_p50"),
            (F.col("e99").cast("double") / F.lit(1e6)).alias("exact_p99"),
            F.col("b50").alias("p50_bucket"),
            F.col("b99").alias("p99_bucket"),
            F.coalesce(blen(F.col("e50")) == F.col("b50"), F.lit(False)).alias(
                "p50_in_bucket"
            ),
            F.coalesce(blen(F.col("e99")) == F.col("b99"), F.lit(False)).alias(
                "p99_in_bucket"
            ),
            F.coalesce("ok", F.lit(False)).alias("split_invariant"),
        )
    )


@register(
    "features_target_encode_loo",
    f"""
    WITH q AS (
      SELECT event_type, {_QV} AS qv FROM events
    ),
    s AS (
      SELECT event_type, qv,
             SUM(qv) OVER (PARTITION BY event_type) AS st,
             COUNT(*) OVER (PARTITION BY event_type) AS nt
      FROM q
    ),
    te AS (
      SELECT event_type, nt, (st - qv) // (nt - 1) AS te_micro FROM s
    )
    SELECT event_type,
           CAST(MAX(nt) AS BIGINT) AS n,
           CAST(SUM(te_micro) // COUNT(*) AS BIGINT) AS te_mean_micro,
           CAST(MIN(te_micro) AS BIGINT) AS te_min_micro,
           CAST(MAX(te_micro) AS BIGINT) AS te_max_micro
    FROM te GROUP BY event_type
    """,
    doc="leave-one-out target encoding of the event-type category: "
    "each row's encoding excludes its own target ((S−x)/(n−1), exact "
    "integer micro-units) — the leakage-safe categorical feature, "
    "audited per category",
)
def features_target_encode_loo(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Target encoding done right: encoding row i by the category MEAN
    would leak row i's own label into its feature (the classic
    target-leakage bug); the leave-one-out form (S−xᵢ)/(n−1) removes
    the self-term. On quantized integers both the numerator and the
    integer division are exact, so the row-level feature is
    bit-deterministic — what a reproducible training set requires.
    Output is the per-category audit (n, mean/min/max of the
    encoding); the row-level column is the same ``te`` expression.

    Scale: one shuffle on the category key; the window (sum, count)
    and the final rollup share that partitioning — Catalyst reuses
    the exchange, so the fact table moves once. No join, no second
    pass.
    """
    ev = load(spark, "events", sf_dir)
    q = ev.select("event_type", F.expr(_QV).alias("qv"))
    w = Window.partitionBy("event_type")
    s = q.select(
        "event_type",
        "qv",
        F.sum("qv").over(w).alias("st"),
        F.count(F.lit(1)).over(w).alias("nt"),
    )
    te = s.select(
        "event_type",
        "nt",
        F.expr("(st - qv) div (nt - 1)").alias("te_micro"),
    )
    return te.groupBy("event_type").agg(
        F.max("nt").cast("long").alias("n"),
        F.expr("sum(te_micro) div count(1)")
        .cast("long")
        .alias("te_mean_micro"),
        F.min("te_micro").cast("long").alias("te_min_micro"),
        F.max("te_micro").cast("long").alias("te_max_micro"),
    )


@register(
    "features_minmax_scale",
    f"""
    WITH q AS (
      SELECT event_type, {_QV} AS qv FROM events
    ),
    s AS (
      SELECT event_type, qv,
             MIN(qv) OVER (PARTITION BY event_type) AS mn,
             MAX(qv) OVER (PARTITION BY event_type) AS mx
      FROM q
    ),
    sc AS (
      SELECT event_type, mn, mx,
             CASE WHEN mx = mn THEN CAST(0 AS BIGINT)
                  ELSE (qv - mn) * 1000000 // (mx - mn) END AS sp
      FROM s
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MAX(mn) AS DOUBLE) / 1000000.0 AS feat_min,
           CAST(MAX(mx) AS DOUBLE) / 1000000.0 AS feat_max,
           CAST(SUM(sp) // COUNT(*) AS BIGINT) AS mean_scaled_ppm,
           CAST(SUM(CASE WHEN sp = 0 OR sp = 1000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_at_bounds
    FROM sc GROUP BY event_type
    """,
    doc="min-max feature scaling audit: per-category range and the "
    "integer-ppm scaled distribution (mean, boundary mass) — the "
    "normalization every tabular trainer applies, with the exact "
    "per-row expression a feature store materializes",
)
def features_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-max normalization as an auditable plan: the per-row scaled
    feature is (x − min)·1e6 div (max − min) — exact integer ppm on
    the quantized grid (degenerate constant categories scale to 0
    instead of dividing by zero). The rollup reports the range, the
    scaled mean (≈ where the mass sits inside [0, 1]) and the count
    pinned at the boundaries (outlier-sensitivity signal: min-max is
    dominated by extremes — compare ``win_rolling_zscore`` for the
    robust alternative).

    Scale: min/max windows and the rollup share one category-key
    exchange (the ``features_target_encode_loo`` shape). At 100 TB
    the same expression materializes as a feature column with the
    (min, max) pair from a broadcast stats table.
    """
    ev = load(spark, "events", sf_dir)
    q = ev.select("event_type", F.expr(_QV).alias("qv"))
    w = Window.partitionBy("event_type")
    s = q.select(
        "event_type",
        "qv",
        F.min("qv").over(w).alias("mn"),
        F.max("qv").over(w).alias("mx"),
    )
    sc = s.select(
        "event_type",
        "mn",
        "mx",
        F.expr(
            "CASE WHEN mx = mn THEN 0L "
            "ELSE (qv - mn) * 1000000 div (mx - mn) END"
        ).alias("sp"),
    )
    return sc.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.max("mn").cast("double") / F.lit(1e6)).alias("feat_min"),
        (F.max("mx").cast("double") / F.lit(1e6)).alias("feat_max"),
        F.expr("sum(sp) div count(1)").cast("long").alias("mean_scaled_ppm"),
        F.sum(
            F.when((F.col("sp") == 0) | (F.col("sp") == 1000000), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_at_bounds"),
    )


# ---------- weight of evidence / information value ----------


@register(
    "features_woe_iv",
    """
    WITH q AS (
      SELECT CAST(hour(ts) AS BIGINT) AS bin_hour,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ),
    b AS (
      SELECT bin_hour,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(y) AS HUGEINT) AS g
      FROM q GROUP BY bin_hour
    ),
    t AS (SELECT SUM(g) AS gt, SUM(n - g) AS bt FROM b),
    w AS (
      SELECT b.bin_hour, b.n, b.g, b.n - b.g AS bad, t.gt, t.bt,
             CASE WHEN b.g > 0 AND b.n - b.g > 0 THEN
               CAST(FLOOR(
                 ln(CAST(CAST(b.g * t.bt AS VARCHAR) AS DOUBLE)
                    / CAST(CAST((b.n - b.g) * t.gt AS VARCHAR) AS DOUBLE))
                 * 1000000000.0 + 0.5) AS BIGINT)
             ELSE NULL END AS woe_q
      FROM b, t
    ),
    iv AS (
      SELECT bin_hour, n, g, bad, gt, bt, woe_q,
             CASE WHEN woe_q IS NULL THEN 0 ELSE
               CAST(FLOOR(
                 CAST(CAST(g * bt - bad * gt AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(gt * bt AS VARCHAR) AS DOUBLE)
                 * (CAST(woe_q AS DOUBLE) / 1000000000.0)
                 * 1000000000.0 + 0.5) AS BIGINT)
             END AS term_q
      FROM w
    )
    SELECT bin_hour,
           CAST(n AS BIGINT) AS n_events,
           CAST(g AS BIGINT) AS n_good,
           CAST(bad AS BIGINT) AS n_bad,
           CAST(woe_q AS DOUBLE) / 1000000000.0 AS woe,
           CAST(term_q AS DOUBLE) / 1000000000.0 AS iv_term,
           CAST(CAST((SELECT SUM(term_q) FROM iv) AS DOUBLE)
             / 1000000000.0 AS DOUBLE) AS iv_total
    FROM iv
    """,
    doc="weight-of-evidence feature screening: per hour-of-day bin, "
    "WOE = ln(good-share / bad-share) of purchase conversion from "
    "exact integer counts (each ln and IV term floor-quantized 1e-9 "
    "before any cross-bin sum), plus the total information value — "
    "the credit-scoring-style predictive-power screen that ranks "
    "candidate categorical features BEFORE any model is trained",
)
def features_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight of evidence + information value — the standard screen
    for 'does this categorical feature separate the binary target at
    all': WOE_c = ln((good_c/G)/(bad_c/B)) per category, and
    IV = Σ_c (good_c/G − bad_c/B)·WOE_c (rule of thumb: < 0.02
    useless, > 0.3 strong). Here the feature is hour-of-day and the
    target is purchase conversion.

    Determinism: counts are exact HUGEINT/decimal(38,0); the WOE
    ratio (g·B)/(bad·G) is one correctly-rounded double division of
    string-cast exact integers, its ln floor-quantized to the 1e-9
    grid; each IV term multiplies the exact share difference
    (g·B − bad·G)/(G·B) by the QUANTIZED WOE and is itself quantized
    before the cross-bin integer sum (the chi2/entropy convention).
    One-sided bins (no goods or no bads) get NULL WOE and contribute
    0 to IV — the no-smoothing convention, stated rather than hidden.

    Scale: one map-side-combined pass over the fact table builds the
    24-row bin table; totals and the IV sum are broadcast-joined
    back. The fact table moves once; everything after is
    dimension-sized. Products g·B reach n² — decimal(38,0)/HUGEINT
    per the overflow convention (int64 caps near 3e9·3e9).
    """
    ev = load(spark, "events", sf_dir)
    q = ev.select(
        F.hour("ts").cast("long").alias("bin_hour"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    b = q.groupBy("bin_hour").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("y").cast("decimal(38,0)").alias("g"),
    )
    t = b.agg(
        F.sum("g").alias("gt"),
        F.sum(F.col("n") - F.col("g")).alias("bt"),
    )
    bad = F.col("n") - F.col("g")
    woe_q = F.when(
        (F.col("g") > 0) & (bad > 0),
        F.floor(
            F.log(
                (F.col("g") * F.col("bt")).cast("string").cast("double")
                / (bad * F.col("gt")).cast("string").cast("double")
            )
            * F.lit(1e9)
            + F.lit(0.5)
        ).cast("long"),
    )
    w = b.join(F.broadcast(t)).select(
        "bin_hour",
        "n",
        "g",
        bad.alias("bad"),
        "gt",
        "bt",
        woe_q.alias("woe_q"),
    )
    term_q = F.when(F.col("woe_q").isNull(), F.lit(0).cast("long")).otherwise(
        F.floor(
            (F.col("g") * F.col("bt") - F.col("bad") * F.col("gt"))
            .cast("string")
            .cast("double")
            / (F.col("gt") * F.col("bt")).cast("string").cast("double")
            * (F.col("woe_q").cast("double") / F.lit(1e9))
            * F.lit(1e9)
            + F.lit(0.5)
        ).cast("long")
    )
    iv = w.withColumn("term_q", term_q)
    tot_iv = iv.agg(
        (F.sum("term_q").cast("double") / F.lit(1e9)).alias("iv_total")
    )
    return iv.join(F.broadcast(tot_iv)).select(
        "bin_hour",
        F.col("n").cast("long").alias("n_events"),
        F.col("g").cast("long").alias("n_good"),
        F.col("bad").cast("long").alias("n_bad"),
        (F.col("woe_q").cast("double") / F.lit(1e9)).alias("woe"),
        (F.col("term_q").cast("double") / F.lit(1e9)).alias("iv_term"),
        "iv_total",
    )
