"""Property test: continuous-quantile interpolation matches numpy's
'linear' percentile semantics on random frames (independent of the
DuckDB oracle — verifies the math, not just cross-engine agreement)."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from cs_pipeline_spark.operators.helpers import dround


def _cont(spark, values: list[float], q: float) -> float:
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(values)], "i long, v double"
    )
    wq = Window.orderBy("v", "i")
    r = df.select(
        "v",
        F.row_number().over(wq).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    pos = F.lit(q) * (F.col("n") - 1) + 1
    lo = F.max(F.when(F.col("rn") == F.floor(pos), F.col("v")))
    hi = F.max(F.when(F.col("rn") == F.ceil(pos), F.col("v")))
    p = r.agg(F.max("n").alias("n_rows"), lo.alias("lo"), hi.alias("hi"))
    posf = F.lit(q) * (F.col("n_rows") - 1) + 1
    frac = posf - F.floor(posf)
    return p.select(
        (F.col("lo") + (F.col("hi") - F.col("lo")) * frac).alias("p")
    ).collect()[0].p


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1,
        max_size=40,
    ),
    q=st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.9, 1.0]),
)
def test_cont_quantile_matches_numpy(spark, values, q):
    got = _cont(spark, values, q)
    want = float(np.percentile(np.asarray(values, dtype=np.float64), q * 100))
    assert math.isclose(got, want, rel_tol=1e-12, abs_tol=1e-9), (
        values, q, got, want,
    )
