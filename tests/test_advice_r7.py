"""Round-7 ADVICE regressions: degenerate inputs the sf fixtures never
exercise but real corpora do.

1. win_ewma_chart on a >=32-day spine — the old _EWMA_BLOCK = 32 made
   j reach 32, so ft = shiftleft(1L, 64) - 1: Spark masks the shift to
   0 (ft = 0, divide-by-zero Infinity) while DuckDB throws Out of
   Range. Block length 31 keeps the max shift at 62 on both engines.
2. ts_dtw_distance with exactly ONE complete day (m = 1) — Spark's
   sequence(3L, 2L) DESCENDS, folding diagonals out of order; the
   m < 2 guard answers from the DP base case |a1 - b1|.
3. ml_adaboost_stumps on a perfectly separable corpus (e1 = 0) — the
   half-log-odds hits ln of a /0: Spark Infinity vs DuckDB NULL. Both
   sides now guard alphas / err2_ppm to NULL.

Each test runs the REAL registered builder against the REAL DuckDB
oracle on a synthetic events table, through the same canonical
row-hash comparison the driver uses.
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from cs_pipeline_spark import registry


def _canon_cell(v):
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", repr(v))
    if isinstance(v, np.floating):
        return _canon_cell(float(v))
    if isinstance(v, np.integer):
        return ("i", int(v))
    if isinstance(v, pd.Timestamp):
        return ("t", v.isoformat())
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    return ("s", str(v))


def _canon(pdf: pd.DataFrame):
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in pdf.itertuples(index=False)
    ]
    rows.sort()
    return cols, rows


def _write_events(tmp_path, rows):
    """rows: list of (event_id, ts, user_id, event_type, value)."""
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    pdf["props"] = "{}"
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    sf = str(tmp_path)
    pdf.to_parquet(os.path.join(sf, "events.parquet"), index=False)
    return sf


def _run_both(spark, name, sf):
    spec = registry.all_specs()[name]
    sdf = spec.fn.__wrapped__(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'"
    )
    odf = con.execute(spec.oracle).df()
    con.close()
    return sdf, odf


def test_ewma_chart_survives_40_day_horizon(spark, tmp_path):
    rows = []
    base = dt.datetime(2024, 1, 1)
    for d in range(40):
        for k in range(3):
            rows.append(
                (
                    d * 3 + k,
                    base + dt.timedelta(days=d, hours=k),
                    k,
                    "view",
                    100.0 + d * 1.5 + k * 0.25,
                )
            )
    sf = _write_events(tmp_path, rows)
    sdf, odf = _run_both(spark, "win_ewma_chart", sf)
    assert len(sdf) == 40
    # two blocks: days 1..31 -> block 0, days 32..40 -> block 1
    assert sorted(sdf["block"].unique()) == [0, 1]
    assert np.isfinite(sdf["ewma_dev"].to_numpy()[1:]).all()
    assert _canon(sdf) == _canon(odf)


def test_dtw_single_complete_day_is_base_case(spark, tmp_path):
    base = dt.datetime(2024, 1, 1)
    rows = [
        # day 0: both types present -> the ONLY complete day
        (0, base, 1, "a", 100.0),
        (1, base, 2, "b", 250.0),
        # day 1: only type a; day 2: only type b (incomplete -> dropped)
        (2, base + dt.timedelta(days=1), 1, "a", 105.0),
        (3, base + dt.timedelta(days=2), 2, "b", 260.0),
    ]
    sf = _write_events(tmp_path, rows)
    sdf, odf = _run_both(spark, "ts_dtw_distance", sf)
    assert len(sdf) == 1
    r = sdf.iloc[0]
    assert r["n_days"] == 1
    # DTW of two length-1 series is |a1 - b1| = 150.0 in micro units
    assert r["dtw_micro"] == 150_000_000
    assert _canon(sdf) == _canon(odf)


def test_adaboost_perfect_stump_yields_null_alphas(spark, tmp_path):
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(1, 21):
        rows.append(
            (
                i,
                base + dt.timedelta(hours=i % 24),
                i,
                "error" if i > 10 else "view",
                float(i),
            )
        )
    sf = _write_events(tmp_path, rows)
    sdf, odf = _run_both(spark, "ml_adaboost_stumps", sf)
    assert len(sdf) == 1
    r = sdf.iloc[0]
    # the decile threshold t = 10.0 separates perfectly: e1 = 0
    assert r["err1_ppm"] == 0
    for c in ("alpha1", "alpha2", "err2_ppm"):
        v = r[c]
        assert v is None or (isinstance(v, float) and math.isnan(v)), c
    assert _canon(sdf) == _canon(odf)


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-q"]))
