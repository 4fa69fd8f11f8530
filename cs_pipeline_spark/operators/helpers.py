"""Hash-stable aggregate builders (Spark Column + DuckDB SQL twins).

The driver verifies every query by order-insensitive VALUE HASH against
a DuckDB oracle. Two engine-difference traps make naive double
aggregation non-reproducible:

1. **Double sums are not associative** — Spark's partial/final
   aggregation order differs from DuckDB's scan order (ULP drift).
2. **double→decimal casts disagree**: Spark rounds the *shortest
   decimal representation* (BigDecimal.valueOf → HALF_UP), DuckDB
   rounds the *exact binary value*. Near a decimal-grid tie these
   pick different sides (~1e-4 of values at scale 10) — empirically
   observed as 2/10000 RH² casts differing by 1e-10.

Convention that is deterministic by construction:

- Quantize with ``FLOOR(x·1e6 + 0.5)`` — multiply/add/floor are all
  exactly-rounded IEEE ops, bit-identical in both engines, and the
  result is an *integer* (≤ ~1e17 here), so the subsequent cast to
  DECIMAL is exact in both engines: no rounding ever happens on the
  decimal side.
- Sum the integers in DECIMAL(38,0) (exact, associative), convert
  the total to double via a *string* cast (string→double parsing is
  correctly rounded in both engines; DuckDB's direct decimal→double
  cast is not), then divide by the quantum.
- Second moments square the quantized integers in DECIMAL(19,0)
  (exact), so variance/std derive from exact sums with the same
  double expression on both sides.

Semantics: aggregates are computed over values rounded half-up to
1e-6 — i.e. ``dsum`` is Σ round₆(x). The 1e-6 quantum is far below
any physical meaning in this pipeline and buys bit-exact re-runs on
any cluster topology (a property a production pipeline wants anyway).
Cost: one multiply+floor per row pre-shuffle — negligible.
``min``/``max``/``max_by`` need no treatment (exact, order-free).

TRAP: when the aggregated expression is a raw FLOAT column, wrap it
in ``CAST(... AS DOUBLE)`` on the DuckDB side — DuckDB's
FLOAT*DOUBLE arithmetic does not match Spark's float→double
promotion (observed: one-quantum drift in sim_ivf_kmeans until the
explicit cast). Spark's Column path promotes exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

Q1 = 1000000.0  # quantum⁻¹ for first moments (6 dp)
Q2 = 1000000000000.0  # Q1² for second moments


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _nn(col: Column | str) -> Column:
    """NaN→null + float→double promotion on the aggregated expression.

    Makes every deterministic aggregate *skipna* (xarray semantics,
    /root/reference/pipeline/carbonpipeline/dataset.py:144) at the
    expression level, where it costs one codegen op per row and — unlike
    an ingest-wide projection — cannot block parquet filter pushdown on
    the raw columns. The explicit double cast also closes the
    FLOAT*DOUBLE promotion trap (module docstring) on both engines.
    """
    d = _c(col).cast("double")
    return F.nanvl(d, F.lit(None).cast("double"))


def _quant(c: Column) -> Column:
    # exact in both engines: *, + are correctly-rounded IEEE, floor exact
    return F.floor(c * F.lit(Q1) + F.lit(0.5))


def _dec_to_double(c: Column) -> Column:
    return c.cast("string").cast("double")


def dsum(col: Column | str) -> Column:
    """Engine-agnostic skipna sum: Σ round₆(x), exact integer-decimal
    path; NaN treated as missing (``_nn``)."""
    q = _quant(_nn(col))
    return _dec_to_double(F.sum(q.cast("decimal(38,0)"))) / F.lit(Q1)


def davg(col: Column | str) -> Column:
    """Engine-agnostic skipna mean: exact quantized sum / non-NaN
    non-null count."""
    return dsum(col) / F.count(_nn(col))


def _var_numerator(col: Column | str) -> Column:
    """Exact integer numerator n·Σq² − (Σq)² of the population variance
    of the quantized values (×Q2·n² the real variance).

    The subtraction happens in exact DECIMAL integer arithmetic, so the
    catastrophic cancellation of the naive E[x²]−E[x]² float formula is
    impossible: a constant group yields exactly 0. Value bounds (|x| ≤
    1e7, group size ≤ 1e5) keep every intermediate < 1e37 < decimal(38).
    """
    c = _nn(col)
    q = _quant(c)
    # s1 is the IDENTICAL expression dsum/davg aggregate — Catalyst
    # dedups equal aggregate expressions, so mean+std on one column
    # share one sum buffer instead of computing two.
    s1 = F.sum(q.cast("decimal(38,0)"))
    # NOTE: a long-split variant (q = h·2¹⁶+l, three long products
    # summed separately) was benchmarked and is SLOWER — three
    # decimal sum buffers cost more than one per-row decimal multiply.
    s2 = F.sum(
        q.cast("decimal(19,0)") * q.cast("decimal(19,0)")
    )  # q² ≤ 1e26 → exact in decimal(38,0)
    n = F.count(c).cast("decimal(20,0)")
    return s2 * n - s1 * s1  # capped decimal(38,0); values ≤ ~1e34, exact


def dvar_pop(col: Column | str) -> Column:
    """Engine-agnostic population variance from the exact integer
    numerator: (n·Σq² − (Σq)²) / n² / Q2 — only the final divisions are
    float, each correctly rounded identically in Spark and DuckDB.

    Null (not 0.0) on an all-null group — xarray-skipna semantics
    (/root/reference/pipeline/carbonpipeline/core.py:217-248, ddof=0).
    """
    c = _nn(col)
    nd = F.count(c).cast("double")
    num = _dec_to_double(_var_numerator(c))
    return F.when(F.count(c) > 0, num / (nd * nd) / F.lit(Q2))


def dstd_pop(col: Column | str) -> Column:
    """Engine-agnostic population stddev: sqrt of ``dvar_pop``."""
    return F.sqrt(dvar_pop(col))


# --- Spark SQL twins (r11): ONE parsed expression instead of the
# Column-object tree. Building davg/dstd via the Column API costs
# ~90 py4j round trips per aggregate (measured: compile_agg_schema
# alone was 1.3 s / 9631 round trips of the resample build); F.expr
# of the identical SQL is one. Literals carry the D suffix so they
# parse as DOUBLE exactly like F.lit(1e6) (a bare 1000000.0 parses
# as DECIMAL and would change the arithmetic). Must mirror the
# Column builders above EXACTLY — the resample hash gate pins it.


def spark_sql_nn(expr: str) -> str:
    """Spark-SQL twin of ``_nn``."""
    return f"nanvl(CAST(({expr}) AS DOUBLE), CAST(NULL AS DOUBLE))"


def _spark_sql_quant(nn: str) -> str:
    return f"FLOOR(({nn}) * 1000000.0D + 0.5D)"


def spark_sql_dsum(expr: str) -> str:
    """Spark-SQL twin of ``dsum``."""
    q = _spark_sql_quant(spark_sql_nn(expr))
    return (
        f"(CAST(CAST(SUM(CAST({q} AS DECIMAL(38,0))) AS STRING) "
        f"AS DOUBLE) / 1000000.0D)"
    )


def spark_sql_davg(expr: str) -> str:
    """Spark-SQL twin of ``davg``."""
    return f"({spark_sql_dsum(expr)} / COUNT({spark_sql_nn(expr)}))"


def spark_sql_dstd_pop(expr: str) -> str:
    """Spark-SQL twin of ``dstd_pop`` (population variance from the
    exact integer numerator, sqrt at the end)."""
    nn = spark_sql_nn(expr)
    q = _spark_sql_quant(nn)
    s1 = f"SUM(CAST({q} AS DECIMAL(38,0)))"
    s2 = f"SUM(CAST({q} AS DECIMAL(19,0)) * CAST({q} AS DECIMAL(19,0)))"
    num = f"({s2} * CAST(COUNT({nn}) AS DECIMAL(20,0)) - {s1} * {s1})"
    nd = f"CAST(COUNT({nn}) AS DOUBLE)"
    return (
        f"SQRT(CASE WHEN COUNT({nn}) > 0 THEN "
        f"((CAST(CAST({num} AS STRING) AS DOUBLE) / ({nd} * {nd})) "
        f"/ 1000000000000.0D) END)"
    )


# --- DuckDB SQL twins (must mirror the expressions above exactly) ---


def _sql_nn(expr: str) -> str:
    # mirror of ``_nn``: NaN→NULL + double promotion, identical skipna
    # semantics on the oracle side
    d = f"CAST(({expr}) AS DOUBLE)"
    return f"(CASE WHEN ISNAN({d}) THEN NULL ELSE {d} END)"


def sql_dsum(expr: str) -> str:
    e = _sql_nn(expr)
    return (
        "(CAST(CAST(SUM(CAST(FLOOR((" + e + ") * 1000000.0 + 0.5) "
        "AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) / 1000000.0)"
    )


def sql_davg(expr: str) -> str:
    return f"({sql_dsum(expr)} / COUNT({_sql_nn(expr)}))"


def _sql_var_numerator(expr: str) -> str:
    # HUGEINT (int128) mirrors Spark's decimal(38,0): the n·Σq² − (Σq)²
    # subtraction is exact integer arithmetic in BOTH engines.
    e = _sql_nn(expr)
    q = f"CAST(FLOOR(({e}) * 1000000.0 + 0.5) AS HUGEINT)"
    return (
        f"(SUM({q} * {q}) * CAST(COUNT({e}) AS HUGEINT)"
        f" - SUM({q}) * SUM({q}))"
    )


def sql_dvar_pop(expr: str) -> str:
    e = _sql_nn(expr)
    n = f"CAST(COUNT({e}) AS DOUBLE)"
    num = f"CAST(CAST({_sql_var_numerator(expr)} AS VARCHAR) AS DOUBLE)"
    return (
        f"CASE WHEN COUNT({e}) > 0 THEN "
        f"(({num} / ({n} * {n})) / 1000000000000.0) END"
    )


def sql_dstd_pop(expr: str) -> str:
    return f"SQRT({sql_dvar_pop(expr)})"


def dround(col: Column | str, digits: int = 6) -> Column:
    """Engine-agnostic fixed-point rounding: FLOOR(x·10^d + 0.5)/10^d.

    ``round(x, d)`` is NOT cross-engine safe on rational ratios:
    Spark rounds the SHORTEST decimal repr (BigDecimal.valueOf,
    HALF_UP), DuckDB rounds the exact binary value — a quotient of
    integers that lands on a decimal tie (e.g. n/128 → 7-digit
    expansion ending in 5) flips between them (observed: 3/1500 rows
    of win_outage_mttr at sf0.1). FLOOR of the identical double is
    exact and identical by construction. Half-up toward +∞ on
    negatives — consistent everywhere.
    """
    q = float(10**digits)
    return F.floor(_c(col) * F.lit(q) + F.lit(0.5)) / F.lit(q)


def sql_dround(expr: str, digits: int = 6) -> str:
    """DuckDB twin of ``dround``."""
    q = f"{float(10 ** digits):.1f}"
    return f"(FLOOR(({expr}) * {q} + 0.5) / {q})"


# ---------------------------------------------------------------------------
# Two-phase distributed total-order machinery
# ---------------------------------------------------------------------------
#
# `row_number().over(Window.orderBy(k))` / `sum(v).over(Window.orderBy(k)
# .rowsBetween(unboundedPreceding, …))` plan as `WindowExec: No Partition
# Defined` — EVERY row funnels through one executor. The helpers below
# compute the IDENTICAL result with a bounded plan:
#
#   phase 1  bucket rows by a monotone value-range key (floor of an affine
#            map of the sort key onto [0, nb)), window WITHIN each bucket;
#   phase 2  aggregate one row per bucket (count / sum / min / max), prefix
#            those nb rows on the driver-scale side, broadcast-join the
#            offsets back.
#
# Monotone bucketing ⇒ global order = bucket order ∘ intra-bucket order, so
# rank = intra-bucket rank + Σ counts of lower buckets, and prefix-agg =
# intra-bucket prefix ⊕ aggregate of lower buckets, for any associative ⊕.
# The bucket id is computed in DOUBLE (monotone under int64→double rounding,
# overflow-free for full-range hashes) and never leaves the plan, so float
# imprecision can only move a row to a neighboring bucket — which cannot
# change the final rank/prefix because the map stays monotone and equal keys
# always share a bucket. The DuckDB oracle keeps its plain global window:
# results are bit-identical by construction.
#
# Cost: the input subtree is evaluated twice (once for the nb-row bucket
# stats, once for the main pass) — two cheap scans instead of one
# single-executor sort of the full table.


def one_part(col: Column | str) -> Column:
    """Constant-but-non-foldable single-partition window key (always 0).

    Marks a window as INTENTIONALLY single-partition — its input is
    bounded by construction (a day spine, a decile table, the nb-row
    two-phase offsets) — without tripping WindowExec's "No Partition
    Defined" warning, which must stay a true signal for accidental
    full-table windows. ``partitionBy(lit(1))`` does NOT work: Spark
    4's ``EliminateWindowPartitions`` rule folds literal keys away and
    the spec is empty again. ``coalesce(cast(col as long), 0) % 1`` is
    0 for every row yet opaque to constant folding.
    """
    return F.coalesce(_c(col).cast("long"), F.lit(0)) % F.lit(1)


def _bucket_col(key: Column, mn: Column, mx: Column, nb: int) -> Column:
    span = mx - mn
    raw = F.floor((key - mn) * F.lit(float(nb)) / (span + F.lit(1.0)))
    b = F.least(F.lit(nb - 1), F.greatest(F.lit(0), raw.cast("int")))
    # Spark's default sort is asc_nulls_first: park null keys below bucket 0
    return F.coalesce(b, F.lit(-1))


def with_total_rank(
    df,
    key: Column | str,
    tiebreaks: tuple = (),
    nb: int = 64,
    rn: str = "rn",
    nn: str | None = None,
    descending: bool = False,
):
    """df + a total-order rank column, computed in two bounded phases.

    Bit-identical to ``F.row_number().over(Window.orderBy(key, *tiebreaks))``
    (plus, when ``nn`` is set, ``F.count(1).over(Window.partitionBy(lit(1)))``)
    but no executor ever sorts more than ~1/nb of the rows. ``key`` must be
    numeric (any width — bucketing happens in double); ties on
    ``(key, *tiebreaks)`` are nondeterministic in BOTH forms, so include a
    unique tiebreak when row identity matters (value-at-rank picks don't).

    Scale: one value-range-bucketed shuffle + per-bucket sort for the main
    pass, one map-side-combined nb-row aggregate for the offsets. The nb-row
    offset window is the only unpartitioned window left — bounded by
    construction.
    """
    from pyspark.sql.window import Window

    k = _c(key).cast("double")
    stats = df.agg(F.min(k).alias("_tp_mn"), F.max(k).alias("_tp_mx"))
    raw_bucket = _bucket_col(
        -k if descending else k,
        -F.col("_tp_mx") if descending else F.col("_tp_mn"),
        -F.col("_tp_mn") if descending else F.col("_tp_mx"),
        nb,
    )
    # null keys: Spark sorts them FIRST ascending (asc_nulls_first,
    # bucket -1 from _bucket_col's coalesce) but LAST under desc —
    # park them ABOVE every real bucket in the descending case
    b = df.crossJoin(F.broadcast(stats)).withColumn(
        "_tpb",
        F.when(k.isNull(), F.lit(nb if descending else -1)).otherwise(
            raw_bucket
        ),
    )
    order = [_c(key).desc() if descending else _c(key)] + [
        _c(t) for t in tiebreaks
    ]
    wloc = Window.partitionBy("_tpb").orderBy(*order)
    cnts = b.groupBy("_tpb").agg(F.count(F.lit(1)).alias("_bc"))
    # partitionBy(lit(1)): the offsets side is ≤ nb+1 rows by
    # construction — a single partition is intended; the literal
    # partition spec documents that and keeps the WindowExec
    # "No Partition Defined" warning a true signal elsewhere
    woff = Window.partitionBy(one_part("_tpb")).orderBy("_tpb").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = cnts.select(
        "_tpb",
        F.coalesce(F.sum("_bc").over(woff), F.lit(0)).alias("_tp_off"),
        F.sum("_bc")
        .over(Window.partitionBy(one_part("_tpb")))
        .alias("_tp_nn"),
    )
    out = (
        b.join(F.broadcast(offs), "_tpb")
        .withColumn(rn, (F.col("_tp_off") + F.row_number().over(wloc)).cast("long"))
    )
    if nn is not None:
        out = out.withColumn(nn, F.col("_tp_nn"))
    return out.drop("_tpb", "_tp_mn", "_tp_mx", "_tp_off", "_tp_nn")


_PREFIX_KINDS = {
    "sum": (F.sum, lambda off, loc: off + loc),
    "min": (F.min, F.least),
    "max": (F.max, F.greatest),
}


def with_prefix_aggs(
    df,
    key: Column | str,
    tiebreaks: tuple,
    specs: list,
    nb: int = 64,
):
    """df + SEVERAL running aggregates over ONE total order
    (key, *tiebreaks), sharing a single two-phase pass.

    ``specs`` is a list of ``(val, kind, out, inclusive)`` tuples
    (kind ∈ sum/min/max). Each output column is bit-identical to
    ``F.<kind>(val).over(Window.orderBy(key, *tiebreaks)
    .rowsBetween(unboundedPreceding, 0 if inclusive else -1))`` —
    including the NULL on an exclusive frame's first row — under the
    same tie caveat as ``with_total_rank``, assuming non-null vals.
    Exclusive prefix-max of the sort key itself equals ``lag(key)``
    when keys are strictly increasing — the distributed form of
    sequence-gap lags.

    Scale: ONE bucketed shuffle + local window pass and ONE nb-row
    offset side regardless of how many aggregates ride it — N running
    totals cost the same two scans as one (agg_ks_test's CDF pair).
    """
    from pyspark.sql.window import Window

    k = _c(key).cast("double")
    stats = df.agg(F.min(k).alias("_tp_mn"), F.max(k).alias("_tp_mx"))
    b = df.crossJoin(F.broadcast(stats)).withColumn(
        "_tpb", _bucket_col(k, F.col("_tp_mn"), F.col("_tp_mx"), nb)
    )
    order = [_c(key)] + [_c(t) for t in tiebreaks]
    per_aggs = [F.count(F.lit(1)).alias("_bc")]
    for i, (val, kind, _out, _incl) in enumerate(specs):
        aggf, _ = _PREFIX_KINDS[kind]
        per_aggs.append(aggf(_c(val)).alias(f"_bv{i}"))
    per = b.groupBy("_tpb").agg(*per_aggs)
    wprev = Window.partitionBy(one_part("_tpb")).orderBy("_tpb").rowsBetween(
        Window.unboundedPreceding, -1
    )
    off_cols = [
        "_tpb",
        F.coalesce(F.sum("_bc").over(wprev), F.lit(0)).alias("_tp_pc"),
    ]
    for i, (val, kind, _out, _incl) in enumerate(specs):
        aggf, _ = _PREFIX_KINDS[kind]
        off_cols.append(aggf(f"_bv{i}").over(wprev).alias(f"_tp_pv{i}"))
    offs = per.select(*off_cols)
    out = b.join(F.broadcast(offs), "_tpb")
    drop = ["_tpb", "_tp_mn", "_tp_mx", "_tp_pc"]
    for i, (val, kind, name, inclusive) in enumerate(specs):
        aggf, combine = _PREFIX_KINDS[kind]
        end = 0 if inclusive else -1
        wloc = (
            Window.partitionBy("_tpb")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, end)
        )
        loc = aggf(_c(val)).over(wloc)
        pv = F.col(f"_tp_pv{i}")
        combined = F.when(F.col("_tp_pc") == 0, loc).otherwise(
            F.when(loc.isNull(), pv).otherwise(combine(pv, loc))
        )
        out = out.withColumn(name, combined)
        drop.append(f"_tp_pv{i}")
    return out.drop(*drop)


def with_prefix_agg(
    df,
    key: Column | str,
    tiebreaks: tuple,
    val: Column | str,
    kind: str = "sum",
    nb: int = 64,
    out: str = "cum",
    inclusive: bool = True,
):
    """Single-aggregate convenience wrapper over ``with_prefix_aggs``
    (see its docstring for the exact-equivalence contract)."""
    return with_prefix_aggs(
        df, key, tiebreaks, [(val, kind, out, inclusive)], nb=nb
    )

def literal_df(spark, rows, schema):
    """BOUNDED driver-known rows as a JVM-literal plan (one literal
    projection of ``spark.range(1)`` per row, unioned — constant-folds
    to a LocalRelation at plan time). Use this instead of
    ``spark.createDataFrame`` whenever the rows end up INSIDE a
    returned query plan: a createDataFrame-backed table is a
    Python-RDD scan that re-executes on every downstream action
    (measured 0.2–0.7 s per action for even a 1-row table — the r10
    ml_adaboost_stumps finding); a literal projection costs nothing
    after planning. Rows must be few (≤ dozens): each row adds a
    plan node. ``schema`` is a StructType or a DDL string."""
    if isinstance(schema, str):
        import pyspark.sql.types as _T

        schema = _T.StructType.fromDDL(schema)
    if not rows:
        return (
            spark.range(0, 1, 1, 1)
            .select(
                *[
                    F.lit(None).cast(f.dataType).alias(f.name)
                    for f in schema.fields
                ]
            )
            .where(F.lit(False))
        )
    # r11: atomic-typed rows render as a VALUES LocalRelation — a
    # collect()/count() over it short-circuits via executeCollect with
    # NO Spark job at all (the Range-CASE form below still launched
    # one no-op task per action, and its CASE chains re-JITed per cold
    # plan). Doubles go through a string cast (java string→double
    # parse is correctly rounded; a bare 1.5 literal would parse as
    # DECIMAL first); strings escape backslash+quote (Spark SQL string
    # literals treat backslash as an escape — the r8 srt.py lesson).
    sql_rows = _values_rows(rows, schema)
    if sql_rows is not None:
        names = ", ".join(
            f"c{ci} AS `{f.name}`" for ci, f in enumerate(schema.fields)
        )
        cnames = ", ".join(f"c{ci}" for ci in range(len(schema.fields)))
        return spark.sql(
            f"SELECT {names} FROM (VALUES {sql_rows}) AS t({cnames})"
        )
    cols = []
    for ci, f in enumerate(schema.fields):
        col = F.when(F.col("id") == 0, F.lit(rows[0][ci]))
        for ri in range(1, len(rows)):
            col = col.when(F.col("id") == ri, F.lit(rows[ri][ci]))
        cols.append(col.cast(f.dataType).alias(f.name))
    # non-atomic fallback — single-partition Range + per-column CASE
    # chains: ONE task per action (a union of one-row projections
    # costs a task per row)
    return spark.range(0, len(rows), 1, 1).select(*cols)


def _values_rows(rows, schema):
    """Render bounded rows as SQL VALUES cells (every cell cast to its
    exact schema type), or None when a type is outside the atomic set
    (array/map/struct/timestamp…) — caller falls back to Range-CASE."""
    import math

    import pyspark.sql.types as _T

    def cell(v, dt):
        ddl = dt.simpleString()
        if v is None:
            return f"CAST(NULL AS {ddl})"
        if isinstance(dt, (_T.DoubleType, _T.FloatType)):
            fv = float(v)
            if fv != fv:
                return f"CAST('NaN' AS {ddl})"
            if math.isinf(fv):
                return f"CAST('{'-' if fv < 0 else ''}Infinity' AS {ddl})"
            return f"CAST('{fv!r}' AS {ddl})"
        if isinstance(dt, _T.BooleanType):
            return "TRUE" if v else "FALSE"
        if isinstance(
            dt, (_T.LongType, _T.IntegerType, _T.ShortType, _T.ByteType)
        ):
            return f"CAST({int(v)} AS {ddl})"
        if isinstance(dt, _T.DecimalType):
            return f"CAST('{v}' AS {ddl})"
        if isinstance(dt, _T.StringType):
            s = str(v).replace("\\", "\\\\").replace("'", "\\'")
            return f"'{s}'"
        return None

    out = []
    for row in rows:
        cells = [
            cell(row[ci], f.dataType)
            for ci, f in enumerate(schema.fields)
        ]
        if any(c is None for c in cells):
            return None
        out.append("(" + ", ".join(cells) + ")")
    return ", ".join(out)


def with_rank_targets(df, key, tiebreaks, rank_sqls, nb: int = 64):
    """Pick the ``key`` VALUES at specific global ranks (1-based,
    ascending key order) without sorting the whole input.

    ``rank_sqls`` are SQL strings over the bigint column ``nn`` (total
    row count), e.g. ``"(nn - 1) div 2 + 1"`` for the lower median or
    ``"(k * (nn - 1)) div 10 + 1"``-style families (reference ``nn``
    and the 0-based target index ``tid``). Returns one row per target:
    ``(tid, rank, nn, value)`` where ``value`` is the key at that
    global rank — bit-identical to filtering
    ``row_number().over(Window.orderBy(key, *tiebreaks)) == rank``
    (``tiebreaks`` are accepted for signature parity but cannot affect
    the result: the VALUE at a rank is tiebreak-independent).

    Plan — driver-coordinated bounded-histogram locate (the
    ``approxQuantile`` job shape, made exact by refinement):
      1. one scan: global key range;
      2. one scan: nb-row bucket histogram (count + key min/max per
         bucket, map-side combined), COLLECTED — the locate walk,
         the rank-expression evaluation (over a one-row-per-target
         LOCAL relation, so Spark SQL arithmetic semantics are kept
         bit-exactly) and the single-valued-bucket short-circuit
         (min <=> max — includes the all-NULL bucket and any point
         mass) run on the driver over <= nb+1 rows;
      3. for target buckets still multi-valued: one scan of those
         buckets only -> nb-row sub-histograms, collected, located the
         same way (single-valued SUB-buckets answer here);
      4. the final rank pick runs over DISTINCT key values of the
         located sub-buckets only (value + multiplicity prefix sum),
         never over raw rows, with driver-known literal rank bounds.
    The result is a LocalRelation (<= len(rank_sqls) rows): consumers
    broadcast literal rows instead of re-executing a multi-stage
    subplan per action, and the 8-job broadcast-exchange chain of the
    previous all-Spark formulation collapses to <= 4 scans.

    Scale: every collect is bounded by construction — <= nb+1
    histogram rows, <= nb*t sub-histogram rows, <= t result rows —
    independent of input size; the driver never touches raw rows. A
    skewed distribution cannot recreate a hot sort partition:
    dense-but-continuous keys sort ~1/nb**2 of the distinct values;
    exact point masses short-circuit at step 2/3. Use
    ``with_total_rank`` when every row needs its rank.
    """
    import pyspark.sql.types as T
    from pyspark.sql.window import Window

    spark = df.sparkSession
    kv = _c(key)
    k = kv.cast("double")
    vtype = df.select(kv.alias("_v")).schema[0].dataType
    out_schema = T.StructType(
        [
            T.StructField("tid", T.LongType()),
            T.StructField("rank", T.LongType()),
            T.StructField("nn", T.LongType()),
            T.StructField("value", vtype),
        ]
    )

    # 1. global key range (one map-side-combined scan)
    mn, mx = df.agg(F.min(k), F.max(k)).first()

    # 2. nb-row first-level histogram, collected (<= nb+1 rows: null
    #    keys park in bucket -1 via _bucket_col's coalesce; an
    #    all-null input has mn None and every row lands there too)
    if mn is None:
        bexpr = F.lit(-1)
    else:
        bexpr = _bucket_col(k, F.lit(mn), F.lit(mx), nb)
    hist = (
        df.groupBy(bexpr.alias("_tpb"))
        .agg(
            F.count(F.lit(1)).alias("_bc"),
            F.min(kv).alias("_bmn"),
            F.max(kv).alias("_bmx"),
            F.min(k).alias("_bdn"),
            F.max(k).alias("_bdx"),
        )
        .collect()
    )
    hist = sorted(hist, key=lambda r: r["_tpb"])
    nn = sum(r["_bc"] for r in hist)
    if nn == 0 or not rank_sqls:
        return literal_df(spark, [], out_schema)

    # rank expressions evaluated by Spark itself over a local relation
    # (one row per target) — identical semantics to the distributed
    # form, no re-implementation of SQL arithmetic on the driver
    rank_case = (
        "CASE "
        + " ".join(
            f"WHEN tid = {i} THEN CAST(({sql}) AS BIGINT)"
            for i, sql in enumerate(rank_sqls)
        )
        + " END"
    )
    import pyspark.sql.types as _T

    # VALUES → LocalRelation: the projection constant-folds and
    # collect() short-circuits via executeCollect — NO Spark job.
    # The literal_df(Range) form launched a 1-task job per call
    # (measured 0.25–0.5 s across the 11 rank-target consumers).
    # Arithmetic still runs in Spark SQL over BIGINT columns —
    # identical semantics to the distributed form.
    vals = ", ".join(
        f"(CAST({i} AS BIGINT), CAST({nn} AS BIGINT))"
        for i in range(len(rank_sqls))
    )
    targets = spark.sql(
        f"SELECT tid, nn, {rank_case} AS rank "
        f"FROM (VALUES {vals}) AS t(tid, nn)"
    ).collect()

    def _veq(a, b):
        """Driver mirror of Spark's ``eqNullSafe``: NULL<=>NULL is
        true, and NaN equals NaN (Spark's total order), unlike
        Python's ``==``."""
        if a is None or b is None:
            return a is None and b is None
        if a != a and b != b:  # both NaN
            return True
        return a == b

    def _locate(rows, rank):
        """(bucket row, offset-below) whose (off, off+count] span
        covers rank, or (None, None) when the rank is out of range —
        the same semantics as the range-join it replaces."""
        off = 0
        for r in rows:
            if off < rank <= off + r[1]:
                return r, off
            off += r[1]
        return None, None

    l1 = [
        (r["_tpb"], r["_bc"], r["_bmn"], r["_bmx"], r["_bdn"], r["_bdx"])
        for r in hist
    ]
    binfo = {r[0]: r for r in l1}
    done = []  # (tid, rank, nn, value)
    multi = []  # (tid, rank, bucket_id, local_rank)
    for t in targets:
        rank = t["rank"]
        if rank is None:
            continue
        r, off = _locate(l1, rank)
        if r is None:
            continue
        tpb, _bc, bmn, bmx, _bdn, _bdx = r
        if _veq(bmn, bmx):
            done.append((t["tid"], rank, nn, bmn))
        else:
            multi.append((t["tid"], rank, tpb, rank - off))
    if not multi:
        return literal_df(spark, done, out_schema)

    # 3. refinement level: re-bucket the (non-null, multi-valued)
    #    target buckets over their OWN key range; sub-histograms
    #    collected (<= nb rows per target bucket)
    tb = sorted({m[2] for m in multi})
    # per-bucket range literals via ONE map lookup each over the
    # pre-projected _tpb attribute — a nested when-chain here embeds
    # the (already sizeable) bucket expression once per level and
    # blows codegen past the 64 KB method limit (interpreted
    # fallback); the map form stays compact
    bdn_map = F.create_map(
        *[x for bid in tb for x in (F.lit(int(bid)), F.lit(binfo[bid][4]))]
    )
    bdx_map = F.create_map(
        *[x for bid in tb for x in (F.lit(int(bid)), F.lit(binfo[bid][5]))]
    )
    sub0 = df.select(
        bexpr.alias("_tpb"), k.alias("_kd"), kv.alias("_kv")
    ).where(F.col("_tpb").isin(*[int(b) for b in tb]))
    sub = sub0.select(
        "_tpb",
        _bucket_col(
            F.col("_kd"),
            F.element_at(bdn_map, F.col("_tpb")),
            F.element_at(bdx_map, F.col("_tpb")),
            nb,
        ).alias("_tpb2"),
        "_kv",
    )
    h2 = (
        sub.groupBy("_tpb", "_tpb2")
        .agg(
            F.count(F.lit(1)).alias("_bc2"),
            F.min("_kv").alias("_bmn2"),
            F.max("_kv").alias("_bmx2"),
        )
        .collect()
    )
    by_bucket = {}
    for r in sorted(h2, key=lambda r: (r["_tpb"], r["_tpb2"])):
        by_bucket.setdefault(r["_tpb"], []).append(
            (r["_tpb2"], r["_bc2"], r["_bmn2"], r["_bmx2"])
        )
    multi2 = []  # (tid, rank, bucket_id, sub_bucket_id, local2_rank)
    for tid, rank, bid, lrank in multi:
        r, off2 = _locate(by_bucket[bid], lrank)
        if r is None:
            continue
        tpb2, _bc2, bmn2, bmx2 = r
        if _veq(bmn2, bmx2):  # keys in level-2 buckets are never null
            done.append((tid, rank, nn, bmn2))
        else:
            multi2.append((tid, rank, bid, tpb2, lrank - off2))
    if not multi2:
        return literal_df(spark, done, out_schema)

    # 4. final pick over DISTINCT values of the located sub-buckets
    #    only: multiplicity prefix sum, driver-known literal bounds
    pair_filter = None
    for _tid, _rank, bid, b2id, _lr2 in multi2:
        c = (F.col("_tpb") == bid) & (F.col("_tpb2") == b2id)
        pair_filter = c if pair_filter is None else (pair_filter | c)
    vals = (
        sub.where(pair_filter)
        .groupBy("_tpb", "_tpb2", "_kv")
        .agg(F.count(F.lit(1)).alias("_vc"))
    )
    wcum = (
        Window.partitionBy("_tpb", "_tpb2")
        .orderBy("_kv")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tv2 = vals.withColumn("_vcum", F.sum("_vc").over(wcum))
    t2 = literal_df(
        spark,
        [(tid, rank, int(bid), int(b2id), lr2)
         for tid, rank, bid, b2id, lr2 in multi2],
        _T.StructType(
            [
                _T.StructField("tid", _T.LongType()),
                _T.StructField("rank", _T.LongType()),
                _T.StructField("_tpb", _T.IntegerType()),
                _T.StructField("_tpb2", _T.IntegerType()),
                _T.StructField("_lr2", _T.LongType()),
            ]
        ),
    )
    picked = (
        tv2.join(F.broadcast(t2), ["_tpb", "_tpb2"])
        .filter(
            (F.col("_lr2") > F.col("_vcum") - F.col("_vc"))
            & (F.col("_lr2") <= F.col("_vcum"))
        )
        .select("tid", "rank", "_kv")
        .collect()
    )
    done.extend((r["tid"], r["rank"], nn, r["_kv"]) for r in picked)
    return literal_df(spark, done, out_schema)
