"""Property test: the AGG_SCHEMA compiler matches pandas ground truth
on random frames (independent of the DuckDB oracle — verifies the
*semantics*: mean/std(ddof=0)/min/max/sum/delta-in-time-order, nulls
skipped)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cs_pipeline_spark.functions.constants import AGG_SCHEMA
from cs_pipeline_spark.plans.agg_compiler import compile_agg_schema

_PRED = "TA"  # daily spec: mean + std + min + max


def _pandas_expected(pdf: pd.DataFrame) -> dict:
    out = {}
    for g, grp in pdf.groupby("g"):
        v = grp["TA"].dropna()
        # helpers round each value to 6 dp before aggregating
        vq = np.floor(v.to_numpy() * 1e6 + 0.5) / 1e6
        out[g] = {
            "TA_mean": vq.mean() if len(vq) else None,
            "TA_std": float(np.sqrt(max((vq**2).mean() - vq.mean() ** 2, 0.0)))
            if len(vq)
            else None,
            "TA_min": v.min() if len(v) else None,
            "TA_max": v.max() if len(v) else None,
        }
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(
            st.integers(0, 3),  # group
            st.one_of(
                st.none(),
                st.floats(
                    min_value=-1e5,
                    max_value=1e5,
                    allow_nan=False,
                    allow_infinity=False,
                ),
            ),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_agg_schema_matches_pandas(spark, data):
    spec = AGG_SCHEMA[_PRED]["daily"]
    assert set(spec.values()) <= {"mean", "std", "min", "max"}
    pdf = pd.DataFrame(
        {
            "g": [g for g, _ in data],
            "TA": [v for _, v in data],
            "event_id": range(len(data)),
        }
    )
    sdf = spark.createDataFrame(pdf.astype({"TA": "float64"}))
    got = {
        r["g"]: r.asDict()
        for r in sdf.groupBy("g")
        .agg(*compile_agg_schema("daily", [_PRED], order_col="event_id"))
        .collect()
    }
    want = _pandas_expected(pdf)
    assert set(got) == set(want)
    for g in want:
        for k, w in want[g].items():
            v = got[g][k]
            if w is None or (isinstance(w, float) and math.isnan(w)):
                assert v is None or (isinstance(v, float) and math.isnan(v))
            else:
                assert v is not None and abs(v - w) <= 1e-6 * max(
                    1.0, abs(w)
                ), (g, k, v, w)


@given(
    st.lists(
        st.floats(
            min_value=-100.0,
            max_value=100.0,
            allow_nan=False,
            allow_infinity=False,
            width=32,
        ),
        min_size=1,
        max_size=16,
    )
)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_qdot_matches_exact_python(spark, vec):
    """qdot's quantized self-dot must equal the exact Python
    recomputation bit-for-bit (same floor/quantum), for any floats."""
    from pyspark.sql import Row

    from cs_pipeline_spark.operators.dedup import qdot
    df = spark.createDataFrame(
        [Row(v=[float(x) for x in vec])], "v array<double>"
    )
    got = df.select(qdot(F.col("v"), F.col("v")).alias("d")).collect()[0]["d"]
    want = (
        sum(math.floor(x * x * 1000000.0 + 0.5) for x in vec) / 1000000.0
    )
    assert got == want


@given(
    st.lists(
        st.floats(
            min_value=-100.0,
            max_value=100.0,
            allow_nan=False,
            allow_infinity=False,
            width=32,
        ),
        min_size=1,
        max_size=16,
    ),
    st.lists(
        st.floats(
            min_value=-100.0,
            max_value=100.0,
            allow_nan=False,
            allow_infinity=False,
            width=32,
        ),
        min_size=1,
        max_size=16,
    ),
)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ql2_matches_exact_python(spark, a, b):
    """_ql2's quantized squared-L2 must equal the exact Python
    recomputation bit-for-bit, for any float pair (PQ distance
    kernel)."""
    from pyspark.sql import Row

    from cs_pipeline_spark.operators.similarity import _ql2

    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    df = spark.createDataFrame(
        [Row(a=[float(x) for x in a], b=[float(y) for y in b])],
        "a array<double>, b array<double>",
    )
    got = df.select(_ql2(F.col("a"), F.col("b")).alias("d")).collect()[0]["d"]
    want = (
        sum(
            math.floor((x - y) * (x - y) * 1000000.0 + 0.5)
            for x, y in zip(a, b)
        )
        / 1000000.0
    )
    assert got == want


def test_bootstrap_ci_brackets_mean(spark, sf_dir):
    """Percentile-bootstrap contract: lo < hi, the point estimate sits
    inside the interval at these group sizes, and the interval width
    is comparable to the jackknife's (same data, same statistic)."""
    from cs_pipeline_spark.operators.aggregate import (
        agg_bootstrap_ci,
        agg_jackknife_ci,
    )

    boot = {r.event_type: r for r in agg_bootstrap_ci(spark, sf_dir).collect()}
    jk = {r.event_type: r for r in agg_jackknife_ci(spark, sf_dir).collect()}
    assert boot and set(boot) == set(jk)
    for et, r in boot.items():
        assert r.boot_lo < r.boot_hi, et
        assert r.boot_lo <= r.theta <= r.boot_hi, et
        assert abs(r.theta - jk[et].theta) < 1e-9, et
        bw = r.boot_hi - r.boot_lo
        jw = jk[et].ci_hi - jk[et].ci_lo
        # ~90% percentile CI vs ±2SE (~95%): same order of magnitude
        assert 0.2 * jw < bw < 5.0 * jw, (et, bw, jw)
