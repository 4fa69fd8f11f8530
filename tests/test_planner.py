"""Request-group planner parity (processor.py:116-186 semantics) and
dedup determinism.

The planner expectations below are hand-derived from the reference's
rules for the fixed range 2024-01-20 07:00 → 2024-03-05 14:00:
- January is partial → one group per day; Jan 20 carries hours 07-23
  (17 h), Jan 21-31 are full days.
- February 2024 is fully covered → ONE full-month group (29 days, leap).
- March is partial → Mar 1-4 full days, Mar 5 carries hours 00-14 (15 h).
"""

from __future__ import annotations

from cs_pipeline_spark.plans.request_groups import request_groups

SF_DIR = "/root/testdata/sf0.001"


def test_request_groups_reference_semantics(spark):
    rows = {
        (r.y, r.m, r.day): (r.n_days, r.n_hours, r.granularity)
        for r in request_groups(
            spark, "2024-01-20 07:00:00", "2024-03-05 14:00:00"
        ).collect()
    }
    # 12 Jan day-groups + 1 Feb month-group + 5 Mar day-groups
    assert len(rows) == 18
    assert rows[(2024, 2, None)] == (29, 24, "month")
    assert rows[(2024, 1, "2024-01-20")] == (1, 17, "day")
    assert rows[(2024, 1, "2024-01-21")] == (1, 24, "day")
    assert rows[(2024, 3, "2024-03-05")] == (1, 15, "day")
    assert (2024, 1, "2024-01-19") not in rows
    # no day-rows for the full month
    assert not any(y == 2024 and m == 2 and d for (y, m, d) in rows)


def test_minhash_lsh_deterministic(spark):
    """Signatures must be identical across runs/partitionings — the
    vectorized token-hash path has no run-dependent state."""
    from cs_pipeline_spark.operators.dedup import dedup_minhash_lsh

    a = sorted(map(tuple, dedup_minhash_lsh(spark, SF_DIR).collect()))
    b = sorted(map(tuple, dedup_minhash_lsh(spark, SF_DIR).collect()))
    assert a == b


def test_simhash_deterministic(spark):
    from cs_pipeline_spark.operators.dedup import dedup_simhash

    a = sorted(map(tuple, dedup_simhash(spark, SF_DIR).collect()))
    b = sorted(map(tuple, dedup_simhash(spark, SF_DIR).collect()))
    assert a == b and len(a) > 0


# ---------- property: planner ≡ reference semantics ----------

from calendar import monthrange  # noqa: E402

import pandas as pd  # noqa: E402
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_BASE = pd.Timestamp("2023-01-01 00:00:00")


def _reference_groups(start: pd.Timestamp, end: pd.Timestamp) -> set:
    """Clean-room port of the reference's hourly grouping rules
    (processor.py:157-186) for hour-aligned inputs."""
    out = set()
    for month in pd.period_range(start=start, end=end, freq="M"):
        ms, me = month.start_time, month.end_time
        a, b = max(start, ms), min(end, me)
        if a > b:
            continue
        if a.floor("h") == ms and b.floor("h") >= me.floor("h"):
            out.add(
                (
                    month.year,
                    month.month,
                    None,
                    monthrange(month.year, month.month)[1],
                    24,
                    "month",
                )
            )
            continue
        days = pd.date_range(a.floor("D"), b.floor("D"), freq="D")
        for d in days:
            h0 = a.hour if d == days[0] else 0
            h1 = b.hour if d == days[-1] else 23
            if h0 > h1:
                continue
            out.add(
                (d.year, d.month, d.strftime("%Y-%m-%d"), 1, h1 - h0 + 1, "day")
            )
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(off=st.integers(0, 20000), dur=st.integers(1, 6000))
def test_request_groups_property(spark, off, dur):
    start = _BASE + pd.Timedelta(hours=off)
    end = start + pd.Timedelta(hours=dur)
    got = {
        (r.y, r.m, r.day, r.n_days, r.n_hours, r.granularity)
        for r in request_groups(
            spark, str(start), str(end)
        ).collect()
    }
    assert got == _reference_groups(start, end)
