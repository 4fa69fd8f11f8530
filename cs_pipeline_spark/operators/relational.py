"""Flagship + core relational queries.

The flagship mirrors the reference's core pipeline shape — *scan →
filter time range → derive scalar columns → groupBy calendar bucket →
multi-agg → sort* (``run_area_process``, reference
``pipeline/carbonpipeline/core.py:170-257``) — expressed TPC-H-Q1-style
on ``lineitem``.

Scale notes (100 TB): this is a single scan + one hash aggregation.
The filter and the 6-column projection reach the parquet reader
(PushedFilters / ReadSchema in ``.explain``); partial aggregation
happens map-side so the shuffle carries only (few groups × agg states),
not rows. No other shuffle exists in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cs_pipeline_spark.operators.helpers import (
    davg,
    dsum,
    sql_davg,
    sql_dsum,
)
from cs_pipeline_spark.registry import register
from cs_pipeline_spark.tables import load

CUTOFF = "1998-09-02 00:00:00"


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit(CUTOFF)))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Flagship: scan→filter→derive→hash-agg→sort (reference core.py:170-257 shape)",
)(pricing_summary)


@register(
    "q3_top_orders",
    f"""
    SELECT o.o_orderkey,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '1998-03-15'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    """,
    doc="3-way join + agg; customer dim is broadcast-joined",
)
def top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority-style join query.

    Scale: customer filtered on segment is small relative to lineitem →
    Spark's AQE converts it to a broadcast join (verified in explain);
    the lineitem↔orders join shuffles on orderkey, which is also the
    aggregation key, so the groupBy reuses the join's partitioning
    (one exchange, not two).
    """
    c = load(spark, "customer", sf_dir).filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1998-03-15"))
    )
    l = load(spark, "lineitem", sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(rev).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "join_inner_equi",
    """
    SELECT n.n_name, c.c_name, c.c_acctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
    doc="plain inner equi-join, dim side broadcast",
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, "customer", sf_dir)
    n = load(spark, "nation", sf_dir)
    return c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "n_name", "c_name", "c_acctbal"
    )


@register(
    "join_left_outer",
    """
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 200000
    """,
    doc="left outer join with pushed non-equi condition",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, "customer", sf_dir)
    o = load(spark, "orders", sf_dir)
    return c.join(
        o,
        (c.c_custkey == o.o_custkey) & (o.o_totalprice > 200000),
        "left",
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@register(
    "join_semi",
    """
    SELECT c.c_custkey, c.c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
    doc="left-semi join (reference month semi-join dataset.py:49-50 analogue)",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join: restrict left to keys present on the right.

    Mirrors the reference's restriction of CO₂ months to ERA5 months
    (reference dataset.py:49-50, np.unique + sel).
    """
    c = load(spark, "customer", sf_dir)
    o = load(spark, "orders", sf_dir).filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    """
    SELECT c.c_custkey, c.c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT'
                        AND o.o_orderdate >= TIMESTAMP '1997-01-01')
    """,
    doc="left-anti join: customers with no urgent order since 1997 (filtered right side keeps the anti-set non-empty at every sf — a 0-row result would make the check vacuous)",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, "customer", sf_dir)
    o = load(spark, "orders", sf_dir).filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q_parts_by_supplier_nation",
    f"""
    SELECT n.n_name AS nation, p.p_brand,
           COUNT(*) AS n_lineitems,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           {sql_davg('p.p_retailprice')} AS avg_retail
    FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size <= 25
    GROUP BY n.n_name, p.p_brand
    """,
    doc="4-way star join: fact ⋈ part/supplier/nation dims, all broadcast",
)
def parts_by_supplier_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema shape: lineitem is the only big side; part,
    supplier, nation are dims → three broadcast joins, zero fact-side
    shuffles before the final aggregation. The p_size filter prunes
    the part dim BEFORE the broadcast (filter-then-broadcast, never
    the reverse)."""
    l = load(spark, "lineitem", sf_dir)
    p = load(spark, "part", sf_dir).filter(F.col("p_size") <= 25)
    s = load(spark, "supplier", sf_dir)
    n = load(spark, "nation", sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            dsum(rev).alias("revenue"),
            davg("p_retailprice").alias("avg_retail"),
        )
    )
