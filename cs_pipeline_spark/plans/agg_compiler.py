"""AGG_SCHEMA compiler: declarative schema → aggregate Columns.

The reference drives hourly→daily/monthly resampling from a
declarative per-predictor schema (reference ``core.py:217-248``,
schema ``Processing/processing_utils.py:142-256``). This compiles the
same schema into one flat list of Spark aggregate Columns — all
predictors aggregated in a single ``groupBy().agg()`` pass (one
shuffle), instead of the reference's per-predictor loop.

Semantics notes (SURVEY §7 hard parts):
- ``std`` is **population** std (xarray ddof=0) → derived from exact
  decimal sums (see operators/helpers.py), not Spark's sample
  ``stddev``.
- ``delta`` is last−first within the bucket in time order (reference
  ``s.iloc[-1] − s.iloc[0]``) → ``max_by − min_by`` over an explicit
  order column; deterministic, unlike positional first/last.
- ``DROP`` at a granularity omits the predictor entirely.

Scale: mean/std compile to partial-aggregatable sums, so map-side
combine applies; the shuffle carries O(groups × columns) agg states.
At 100 TB with a (lat, lon, day) key this is the dominant shuffle —
the grouping key should be aligned with storage partitioning
(partitionBy(region_id) + sort by time) so AQE coalesces cleanly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from cs_pipeline_spark.functions.constants import AGG_SCHEMA
from cs_pipeline_spark.operators.helpers import (
    spark_sql_davg,
    spark_sql_dstd_pop,
    spark_sql_dsum,
    sql_davg,
    sql_dstd_pop,
    sql_dsum,
)


def active_predictors(granularity: str, predictors: list[str] | None = None) -> list[str]:
    """Predictors with a non-DROP spec at this granularity."""
    preds = predictors or list(AGG_SCHEMA)
    return [p for p in preds if AGG_SCHEMA[p][granularity] != "DROP"]


def compile_agg_schema(
    granularity: str,
    predictors: list[str] | None = None,
    order_col: str = "valid_time",
) -> list[Column]:
    """Spark aggregate Columns for every (predictor, output) pair.

    r11: each aggregate is ONE ``F.expr`` of the helpers' Spark-SQL
    twin instead of a Column-object tree — the Column path cost ~90
    py4j round trips per aggregate (1.3 s of the resample build for
    ~100 aggregates); the parsed expressions are identical (the
    resample hash gate pins it).
    """
    out: list[Column] = []
    for p in active_predictors(granularity, predictors):
        spec = AGG_SCHEMA[p][granularity]
        for name, kind in spec.items():
            if kind == "mean":
                e = spark_sql_davg(p)
            elif kind == "std":
                e = spark_sql_dstd_pop(p)
            elif kind == "min":
                e = f"MIN({p})"
            elif kind == "max":
                e = f"MAX({p})"
            elif kind == "sum":
                e = spark_sql_dsum(p)
            elif kind == "delta":
                e = (
                    f"(max_by({p}, {order_col}) "
                    f"- min_by({p}, {order_col}))"
                )
            else:  # pragma: no cover
                raise ValueError(f"unknown agg kind {kind!r} for {p}")
            out.append(F.expr(e).alias(name))
    return out


def compile_agg_schema_sql(
    granularity: str,
    predictors: list[str] | None = None,
    order_col: str = "valid_time",
) -> list[str]:
    """DuckDB SQL twins of :func:`compile_agg_schema` (same order)."""
    out: list[str] = []
    for p in active_predictors(granularity, predictors):
        spec = AGG_SCHEMA[p][granularity]
        for name, kind in spec.items():
            if kind == "mean":
                e = sql_davg(p)
            elif kind == "std":
                e = sql_dstd_pop(p)
            elif kind == "min":
                e = f"MIN({p})"
            elif kind == "max":
                e = f"MAX({p})"
            elif kind == "sum":
                e = sql_dsum(p)
            elif kind == "delta":
                e = f"(arg_max({p}, {order_col}) - arg_min({p}, {order_col}))"
            else:  # pragma: no cover
                raise ValueError(f"unknown agg kind {kind!r} for {p}")
            out.append(f"{e} AS {name}")
    return out
