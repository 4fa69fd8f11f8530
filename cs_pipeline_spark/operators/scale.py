"""Scale patterns (SURVEY §4 / north star): bucketed co-located joins
and manual skew salting.

These are the two levers the engine reaches for when AQE alone isn't
enough at 100 TB:

- **Bucketing**: both join sides written ``bucketBy(N, key)`` share a
  partitioning on disk, so the join needs NO exchange — at 100 TB this
  turns the nightly fact-to-fact join from a full double shuffle into
  a zip of pre-sorted buckets. (`tests/test_scale.py` asserts the
  bucketed plan is Exchange-free with broadcast disabled.)
- **Salting**: when one key dominates (the reference's analogue: one
  region holding most of the grid), a deterministic salt splits the
  hot key's rows across S sub-partitions and replicates the dim side
  S×; the aggregate over the salted join is salt-invisible. AQE's
  skew-join split handles sort-merge cases automatically; explicit
  salting remains the tool for skewed *aggregations* and
  broadcast-infeasible dims.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cs_pipeline_spark.operators.helpers import dsum, sql_dsum
from cs_pipeline_spark.registry import register
from cs_pipeline_spark.tables import load

N_BUCKETS = 8
N_SALTS = 8


def _tag(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")


def bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write orders+customer bucketed by custkey (once per session/sf).

    ``bucketBy`` requires the table catalog; the bucket count must
    match on both sides for the exchange-free join.
    """
    from cs_pipeline_spark.sources.scans import _scratch

    t_orders = f"orders_b_{_tag(sf_dir)}"
    t_cust = f"customer_b_{_tag(sf_dir)}"
    # explicit external-table paths: keeps bucket data in the repo
    # scratch dir no matter what the session's warehouse dir is
    if not spark.catalog.tableExists(t_orders):
        (
            load(spark, "orders", sf_dir)
            .write.mode("overwrite")
            .option("path", _scratch(sf_dir, t_orders))
            .bucketBy(N_BUCKETS, "o_custkey")
            .sortBy("o_custkey")
            .saveAsTable(t_orders)
        )
    if not spark.catalog.tableExists(t_cust):
        (
            load(spark, "customer", sf_dir)
            .write.mode("overwrite")
            .option("path", _scratch(sf_dir, t_cust))
            .bucketBy(N_BUCKETS, "c_custkey")
            .sortBy("c_custkey")
            .saveAsTable(t_cust)
        )
    return t_orders, t_cust


@register(
    "join_bucketed",
    "SELECT c.c_custkey, COUNT(*) AS n_orders, "
    f"{sql_dsum('o.o_totalprice')} AS sum_price "
    "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
    "GROUP BY c.c_custkey",
    doc="co-located bucketed join: bucketBy both sides on the key → "
    "exchange-free join (scale path for fact-to-fact joins)",
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    t_orders, t_cust = bucketed_tables(spark, sf_dir)
    o = spark.table(t_orders)
    c = spark.table(t_cust)
    joined = c.join(o, c.c_custkey == o.o_custkey)
    # the groupBy key equals the bucket key → the aggregation reuses
    # the bucketing too: zero exchanges end-to-end (modulo final agg)
    return joined.groupBy("c_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("sum_price"),
    )


# ---------- skew salting ----------

# Deterministic skewed key: ~70% of lineitem rows land on key 0.
_SKEW_KEY_SQL = (
    "CASE WHEN l_orderkey % 10 < 7 THEN 0 "
    "ELSE CAST(l_orderkey % 100 AS BIGINT) END"
)


@register(
    "join_skew_salted",
    f"WITH fact AS (SELECT {_SKEW_KEY_SQL} AS skew_key, l_extendedprice "
    "FROM lineitem), "
    "dim AS (SELECT CAST(x AS BIGINT) AS skew_key, "
    "1.0 + CAST(x AS DOUBLE) * 0.01 AS factor FROM range(100) t(x)) "
    "SELECT f.skew_key, COUNT(*) AS n_rows, "
    f"{sql_dsum('f.l_extendedprice * d.factor')} AS weighted_price "
    "FROM fact f JOIN dim d ON f.skew_key = d.skew_key "
    "GROUP BY f.skew_key",
    doc="skew-salted join: deterministic salt splits the hot key across "
    "sub-partitions, dim replicated ×S; aggregate is salt-invisible",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key join without a hot partition: the fact side gets
    ``salt = xxhash64(row-id) % S`` appended to the key; the dim side
    is exploded ×S. Every (key, salt) partition then holds ≤ 1/S of
    the hot key's rows. The salt never reaches the output — the
    aggregate collapses it. At 100 TB this is how a 70%-hot key
    aggregation avoids a straggler task."""
    li = load(spark, "lineitem", sf_dir)
    fact = li.select(
        F.expr(_SKEW_KEY_SQL).alias("skew_key"),
        "l_extendedprice",
        F.pmod(
            F.xxhash64("l_orderkey", "l_linenumber"), F.lit(N_SALTS)
        ).alias("salt"),
    )
    dim = (
        spark.range(100)
        .select(
            F.col("id").alias("skew_key"),
            (1.0 + F.col("id").cast("double") * 0.01).alias("factor"),
        )
        .withColumn(
            "salt", F.explode(F.array(*[F.lit(s) for s in range(N_SALTS)]))
        )
    )
    return (
        fact.join(dim, ["skew_key", "salt"])
        .groupBy("skew_key")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("l_extendedprice") * F.col("factor")).alias(
                "weighted_price"
            ),
        )
    )
