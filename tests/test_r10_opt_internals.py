"""Round-10 optimization internals.

Pins the three pieces of machinery the optimization round changed
under hash-checked ops:

- ``literal_df`` — JVM-literal bounded tables must round-trip values
  and types exactly like ``spark.createDataFrame`` (they replaced it
  inside returned plans to kill the per-action Python-RDD scan).
- ``_km_driver_rounds`` / ``_trunc_div`` — the driver-coordinated
  Lloyd's must match a brute-force Python Lloyd's with Spark ``div``
  semantics (truncate toward zero) exactly, including the
  smallest-cluster-id tiebreak and empty-cluster drop-out.
- ``ts_matrix_profile``'s STOMP tiebreak — equal-distance neighbors
  must resolve to the SMALLEST neighbor index (the relational
  ``min(struct(d2, j))`` contract the numpy loop replaced).
"""

from __future__ import annotations

import decimal

import numpy as np
import pyspark.sql.types as T

from cs_pipeline_spark.operators.helpers import literal_df


def test_literal_df_roundtrip(spark):
    sch = T.StructType(
        [
            T.StructField("l", T.LongType()),
            T.StructField("d", T.DoubleType()),
            T.StructField("s", T.StringType()),
            T.StructField("b", T.BooleanType()),
            T.StructField("dec", T.DecimalType(38, 0)),
        ]
    )
    rows = [
        (1, 1.5, "a", True, decimal.Decimal(10**30)),
        (2, float("nan"), None, False, decimal.Decimal(-7)),
        (None, -0.0, "", None, None),
    ]
    got = literal_df(spark, rows, sch)
    ref = spark.createDataFrame(rows, sch)
    assert [f.dataType for f in got.schema.fields] == [
        f.dataType for f in ref.schema.fields
    ]
    g = got.collect()
    r = ref.collect()
    assert len(g) == len(r) == 3
    for gr, rr in zip(g, r):
        for c in sch.fieldNames():
            gv, rv = gr[c], rr[c]
            if isinstance(gv, float) and gv != gv:
                assert rv != rv
            else:
                assert gv == rv, (c, gv, rv)


def test_literal_df_empty(spark):
    sch = T.StructType([T.StructField("x", T.LongType())])
    df = literal_df(spark, [], sch)
    assert df.count() == 0
    assert df.schema.fieldNames() == ["x"]


def test_literal_df_one_task(spark):
    # r11: atomic rows render as a VALUES LocalRelation — actions over
    # it are JOBLESS (executeCollect), strictly better than the old
    # one-task Range-CASE contract this test used to pin.
    df = literal_df(
        spark,
        [(i,) for i in range(9)],
        T.StructType([T.StructField("x", T.LongType())]),
    )
    assert "LocalTableScan" in df._jdf.queryExecution().executedPlan().toString()
    assert sorted(r["x"] for r in df.collect()) == list(range(9))
    # non-atomic types fall back to the single-partition Range-CASE
    arr = literal_df(
        spark,
        [([1, 2],), ([3],)],
        T.StructType([T.StructField("a", T.ArrayType(T.LongType()))]),
    )
    assert arr.rdd.getNumPartitions() == 1
    assert [list(r["a"]) for r in arr.collect()] == [[1, 2], [3]]


def test_trunc_div_matches_spark_div(spark):
    from cs_pipeline_spark.operators.similarity import _trunc_div

    cases = [(7, 2), (-7, 2), (7, -2), (-7, -2), (6, 3), (-6, 3), (0, 5)]
    rows = literal_df(
        spark,
        cases,
        T.StructType(
            [
                T.StructField("a", T.LongType()),
                T.StructField("b", T.LongType()),
            ]
        ),
    )
    got = [r["q"] for r in rows.selectExpr("a div b as q").collect()]
    assert got == [_trunc_div(a, b) for a, b in cases]


def _brute_lloyd(eq, k, rounds):
    """Reference Lloyd's: argmin (d2, cluster_id), floor-div-toward-
    zero centroid update, empty clusters dropped."""
    from cs_pipeline_spark.operators.similarity import _trunc_div

    cids = sorted(i for i in range(len(eq)) if i < k)
    C = {c: list(eq[c]) for c in cids}
    inertias = []
    for r in range(rounds + 1):
        assign = {}
        tot = 0
        for v, e in enumerate(eq):
            best = None
            for c in sorted(C):
                d2 = sum((a - b) ** 2 for a, b in zip(e, C[c]))
                if best is None or (d2, c) < best:
                    best = (d2, c)
            assign[v] = best[1]
            tot += best[0]
        inertias.append(tot)
        if r < rounds:
            newC = {}
            for c in sorted(C):
                members = [eq[v] for v, a in assign.items() if a == c]
                if not members:
                    continue
                newC[c] = [
                    _trunc_div(sum(col), len(members))
                    for col in zip(*members)
                ]
            C = newC
    return inertias, assign


def test_km_driver_rounds_matches_bruteforce(spark):
    from cs_pipeline_spark.operators.similarity import (
        _km_assign_df,
        _km_driver_rounds,
        _KM_K,
    )

    rng = np.random.RandomState(7)
    n, d = 60, 8
    eq = rng.randint(-2000000, 2000000, size=(n, d)).astype(np.int64)
    # plant exact ties: two points equidistant from two seeds
    eq[10] = eq[0]
    eq[11] = eq[1]
    rows = [(int(i), [int(x) for x in eq[i]]) for i in range(n)]
    eqs = spark.createDataFrame(rows, "vec_id long, eq array<long>")
    rounds = 2
    inertias, cids, C = _km_driver_rounds(eqs, rounds)
    ref_inertias, ref_assign = _brute_lloyd(
        [list(r) for r in eq], _KM_K, rounds
    )
    assert inertias == ref_inertias
    got = {
        r["vec_id"]: r["cluster_id"]
        for r in _km_assign_df(eqs, cids, C).collect()
    }
    assert got == ref_assign


def test_stomp_core_matches_allpairs_reference():
    """The STOMP diagonal loop must equal an all-pairs reference with
    the exact (d2, j) lexicographic min — including ties (a constant
    prefix makes whole runs of windows identical, d2 = 0) and the
    exclusion zone."""
    from cs_pipeline_spark.operators.timeseries import (
        _MP_EXCL,
        _MP_M,
        _stomp_core,
    )

    rng = np.random.RandomState(3)
    n = _MP_M + _MP_EXCL + 40
    y = rng.randint(0, 50, size=n).astype(np.int64)
    y[: _MP_M + 2 * _MP_EXCL + 4] = 7  # constant prefix → exact ties
    best_d2, best_j, seen = _stomp_core(y)
    nw = n - _MP_M + 1

    def win(i):  # 1-based window
        return y[i - 1 : i - 1 + _MP_M]

    for i in range(1, nw + 1):
        cands = [j for j in range(1, nw + 1) if abs(j - i) >= _MP_EXCL]
        if not cands:
            assert not seen[i - 1]
            continue
        ref = min(
            (int(((win(i) - win(j)) ** 2).sum()), j) for j in cands
        )
        assert seen[i - 1]
        assert (int(best_d2[i - 1]), int(best_j[i - 1])) == ref, i


def test_stomp_core_short_series_empty():
    from cs_pipeline_spark.operators.timeseries import (
        _MP_M,
        _stomp_core,
    )

    d2, j, seen = _stomp_core(np.arange(_MP_M - 1, dtype=np.int64))
    assert len(d2) == len(j) == len(seen) == 0
