"""Equivalence properties of the two-phase total-order helpers.

`with_total_rank` / `with_prefix_agg` (operators/helpers.py) claim
bit-identity with the single-partition `Window.orderBy(...)` forms
while bucketing the sort. These tests pin that claim on the real
events table — ranks, descending ranks, value-at-rank picks,
inclusive/exclusive prefix sums, prefix min/max, and the
lag-of-sort-key identity — plus degenerate inputs (constant key,
single row, nb larger than the row count).
"""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cs_pipeline_spark.operators.helpers import (
    with_prefix_agg,
    with_total_rank,
)
from cs_pipeline_spark.tables import load


def _q(spark, sf_dir):
    ev = load(spark, "events", sf_dir)
    return ev.select(
        "event_id",
        F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("long").alias("qv"),
    )


def test_rank_matches_global_window(spark, sf_dir):
    q = _q(spark, sf_dir)
    ref = q.select(
        "event_id",
        F.row_number().over(Window.orderBy("qv", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy(F.lit(1))).alias("nn"),
    )
    got = with_total_rank(q, "qv", ("event_id",), nn="nn").select(
        "event_id", "rn", "nn"
    )
    bad = (
        ref.alias("a")
        .join(got.alias("b"), "event_id")
        .filter("a.rn <> b.rn or a.nn <> b.nn")
    )
    assert bad.count() == 0


def test_rank_descending_matches(spark, sf_dir):
    q = _q(spark, sf_dir)
    ref = q.select(
        "event_id",
        F.row_number()
        .over(Window.orderBy(F.col("qv").desc(), "event_id"))
        .alias("rn"),
    )
    got = with_total_rank(q, "qv", ("event_id",), descending=True).select(
        "event_id", "rn"
    )
    assert (
        ref.alias("a")
        .join(got.alias("b"), "event_id")
        .filter("a.rn <> b.rn")
        .count()
        == 0
    )


def test_value_at_median_rank_matches(spark, sf_dir):
    q = _q(spark, sf_dir)
    ref = (
        q.select(
            "qv",
            F.row_number().over(Window.orderBy("qv")).alias("rn"),
            F.count(F.lit(1))
            .over(Window.partitionBy(F.lit(1)))
            .alias("nn"),
        )
        .filter(F.expr("rn = (nn - 1) div 2 + 1"))
        .collect()[0]
    )
    got = (
        with_total_rank(q, "qv", (), nn="nn")
        .filter(F.expr("rn = (nn - 1) div 2 + 1"))
        .collect()[0]
    )
    assert ref.qv == got.qv


def test_prefix_sum_inclusive_exclusive(spark, sf_dir):
    q = _q(spark, sf_dir)
    wincl = Window.orderBy("qv", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wexcl = Window.orderBy("qv", "event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ref = q.select(
        "event_id",
        F.sum("qv").over(wincl).alias("ci"),
        F.sum("qv").over(wexcl).alias("ce"),
    )
    got = with_prefix_agg(
        with_prefix_agg(q, "qv", ("event_id",), "qv", "sum", out="ci"),
        "qv",
        ("event_id",),
        "qv",
        "sum",
        out="ce",
        inclusive=False,
    ).select("event_id", "ci", "ce")
    bad = (
        ref.alias("a")
        .join(got.alias("b"), "event_id")
        .filter(
            "a.ci <> b.ci or coalesce(a.ce, -1) <> coalesce(b.ce, -1)"
        )
    )
    assert bad.count() == 0


def test_exclusive_prefix_max_is_lag_of_sort_key(spark, sf_dir):
    q = _q(spark, sf_dir).select("event_id")
    ref = q.select(
        "event_id",
        F.lag("event_id").over(Window.orderBy("event_id")).alias("p"),
    )
    got = with_prefix_agg(
        q, "event_id", (), "event_id", "max", out="p", inclusive=False
    ).select("event_id", "p")
    bad = (
        ref.alias("a")
        .join(got.alias("b"), "event_id")
        .filter("coalesce(a.p, -1) <> coalesce(b.p, -1)")
    )
    assert bad.count() == 0


def test_prefix_min_matches(spark, sf_dir):
    q = _q(spark, sf_dir)
    ref = q.select(
        "event_id",
        F.min("qv")
        .over(
            Window.orderBy("event_id").rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .alias("m"),
    )
    got = with_prefix_agg(
        q, "event_id", (), "qv", "min", out="m"
    ).select("event_id", "m")
    assert (
        ref.alias("a")
        .join(got.alias("b"), "event_id")
        .filter("a.m <> b.m")
        .count()
        == 0
    )


def test_degenerate_constant_key_and_single_row(spark, sf_dir):
    # constant key: every row lands in one bucket — degrades to the
    # global form, never crashes or drops rows
    df = spark.range(0, 100).select(
        F.col("id").alias("event_id"), F.lit(7).alias("qv")
    )
    r = with_total_rank(df, "qv", ("event_id",), nn="nn")
    rows = {x.event_id: (x.rn, x.nn) for x in r.collect()}
    assert sorted(rn for rn, _ in rows.values()) == list(range(1, 101))
    assert all(nn == 100 for _, nn in rows.values())
    assert rows[0][0] == 1 and rows[99][0] == 100
    # single row
    one = spark.range(1).select(
        F.col("id").alias("event_id"), F.lit(3).alias("qv")
    )
    row = with_total_rank(one, "qv", (), nn="nn").collect()[0]
    assert row.rn == 1 and row.nn == 1
    rowp = with_prefix_agg(
        one, "qv", (), "qv", "sum", out="c", inclusive=False
    ).collect()[0]
    assert rowp.c is None


def test_rank_plan_has_no_unpartitioned_fact_window(spark, sf_dir):
    # the whole point: the fact-table window must be partitioned; the
    # only unpartitioned window allowed is the nb-row offsets side
    q = _q(spark, sf_dir)
    plan = with_total_rank(
        q, "qv", ("event_id",), nn="nn"
    )._jdf.queryExecution().executedPlan().toString()
    import re

    wins = re.findall(r"Window \[.*?\]", plan)
    # every Window over row_number on the fact side must carry a
    # partition spec (_tpb); offset windows run over the aggregated
    # nb-row side only
    for w in wins:
        if "row_number()" in w:
            assert "_tpb" in w, w


def test_rank_targets_match_global_ranks(spark, sf_dir):
    from cs_pipeline_spark.operators.helpers import with_rank_targets

    q = _q(spark, sf_dir)
    nn = q.count()
    ref = q.select(
        "qv", F.row_number().over(Window.orderBy("qv")).alias("rn")
    )
    targets = {k: (k * (nn - 1)) // 10 + 1 for k in range(1, 10)}
    refvals = {
        k: ref.filter(F.col("rn") == r).select("qv").collect()[0][0]
        for k, r in targets.items()
    }
    got = with_rank_targets(
        q.select("qv"),
        "qv",
        (),
        ["((tid + 1) * (nn - 1)) div 10 + 1"] * 9,
    )
    rows = {r.tid: (r.rank, r.nn, r.value) for r in got.collect()}
    assert len(rows) == 9
    for k in range(1, 10):
        assert rows[k - 1] == (targets[k], nn, refvals[k])


def test_prefix_aggs_multi_matches_singles(spark, sf_dir):
    from cs_pipeline_spark.operators.helpers import with_prefix_aggs

    q = _q(spark, sf_dir)
    wi = Window.orderBy("qv", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    we = Window.orderBy("qv", "event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ref = q.select(
        "event_id",
        F.sum("qv").over(wi).alias("cs"),
        F.max("qv").over(we).alias("pm"),
    )
    got = with_prefix_aggs(
        q,
        "qv",
        ("event_id",),
        [("qv", "sum", "cs", True), ("qv", "max", "pm", False)],
    ).select("event_id", "cs", "pm")
    bad = (
        ref.alias("a")
        .join(got.alias("b"), "event_id")
        .filter(
            "a.cs <> b.cs or coalesce(a.pm, -1) <> coalesce(b.pm, -1)"
        )
    )
    assert bad.count() == 0


def test_helpers_on_empty_input(spark):
    from cs_pipeline_spark.operators.helpers import with_rank_targets

    empty = spark.range(0).select(
        F.col("id").alias("event_id"), (F.col("id") * 2).alias("qv")
    )
    assert with_total_rank(empty, "qv", ("event_id",), nn="nn").count() == 0
    assert (
        with_prefix_agg(empty, "qv", (), "qv", "sum", out="c").count() == 0
    )
    assert (
        with_rank_targets(empty, "qv", (), ["(nn - 1) div 2 + 1"]).count()
        == 0
    )


def test_rank_null_keys_both_directions(spark):
    # Spark semantics: asc → nulls first, desc → nulls last; the
    # bucketed form must agree in both directions
    df = spark.createDataFrame(
        [(1, 5), (2, None), (3, 1), (4, None), (5, 9)],
        "event_id long, qv long",
    )
    for desc in (False, True):
        order = (
            Window.orderBy(F.col("qv").desc(), "event_id")
            if desc
            else Window.orderBy("qv", "event_id")
        )
        ref = {
            r.event_id: r.rn
            for r in df.select(
                "event_id", F.row_number().over(order).alias("rn")
            ).collect()
        }
        got = {
            r.event_id: r.rn
            for r in with_total_rank(
                df, "qv", ("event_id",), descending=desc
            ).collect()
        }
        assert got == ref, (desc, got, ref)


def test_rank_targets_skewed_and_point_mass(spark):
    # adversarial for single-level bucketing: 90% of rows are one
    # point mass (single-value shortcut) and the rest a dense cluster
    # inside one value-range bucket (refinement level). The two-level
    # form must still match the global row_number pick exactly.
    from cs_pipeline_spark.operators.helpers import with_rank_targets

    df = spark.range(10000).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 10 < 9, F.lit(500000))
        .otherwise(500000 + (F.col("id") % 97))
        .cast("long")
        .alias("qv"),
    )
    nn = df.count()
    ref = df.select(
        "qv", F.row_number().over(Window.orderBy("qv")).alias("rn")
    )
    sqls = [f"(({k}) * (nn - 1)) div 10 + 1" for k in range(1, 10)] + [
        "nn",  # the global max
        "1",   # the global min
    ]
    got = {
        r.tid: (r.rank, r.nn, r.value)
        for r in with_rank_targets(df, "qv", (), sqls).collect()
    }
    assert len(got) == len(sqls)
    for tid, sql in enumerate(sqls):
        rank = got[tid][0]
        refval = ref.filter(F.col("rn") == rank).collect()[0][0]
        assert got[tid] == (rank, nn, refval), (tid, sql)
