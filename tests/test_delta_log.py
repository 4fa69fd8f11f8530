"""Transaction-log replay (sources/delta_log.py): fold semantics,
tie precedence, time travel."""

from __future__ import annotations

from cs_pipeline_spark.sources.delta_log import (
    _ADDS_PER_COMMIT,
    _N_COMMITS,
    _READD_COMMIT,
    _READD_PATH,
    _READD_RECS,
    _READD_SZ,
    _add_info,
    _remove_path,
    scan_delta_log,
)


def _expected(v: int) -> tuple[int, int, int]:
    live = {}
    for c in range(v + 1):
        for k in range(_ADDS_PER_COMMIT):
            path, sz, recs = _add_info(c, k)
            live[path] = (sz, recs)
        if c == _READD_COMMIT:
            live[_READD_PATH] = (_READD_SZ, _READD_RECS)
        if c >= 2:
            live.pop(_remove_path(c), None)
    return (
        len(live),
        sum(s for s, _ in live.values()),
        sum(r for _, r in live.values()),
    )


def test_time_travel_census(spark, sf_dir):
    rows = {r.version: r for r in scan_delta_log(spark, sf_dir).collect()}
    assert set(rows) == set(range(_N_COMMITS))
    for v in range(_N_COMMITS):
        n, b, rec = _expected(v)
        r = rows[v]
        assert (r.n_live_files, r.live_bytes, r.live_records) == (n, b, rec)


def test_snapshots_actually_shrink_on_remove():
    # version 2 removes a version-0 file: net growth is 3-1=2 files
    n1 = _expected(1)[0]
    n2 = _expected(2)[0]
    assert n2 == n1 + _ADDS_PER_COMMIT - 1
