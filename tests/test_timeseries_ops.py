"""Invariants for forward-fill, interval-bucket join, late-data drop."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from cs_pipeline_spark.operators.joins import join_interval_buckets
from cs_pipeline_spark.operators.windows import win_fill_forward
from cs_pipeline_spark.streaming.batch_twins import stream_late_data_drop


def test_fill_forward_carries_last_nonnull(spark, sf_dir):
    rows = win_fill_forward(spark, sf_dir).collect()
    # replay per user in (no order guarantee from collect — re-sort)
    from cs_pipeline_spark.tables import load
    from pyspark.sql import functions as F

    ev = (
        load(spark, "events", sf_dir)
        .select("event_id", "user_id", "ts", "event_type", "value")
        .collect()
    )
    order = {r["event_id"]: (r["ts"], r["event_id"]) for r in ev}
    raw_null = {r["event_id"] for r in ev if r["event_type"] == "click"}
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, grp in by_user.items():
        grp.sort(key=lambda r: order[r["event_id"]])
        carry = None
        for r in grp:
            if r["event_id"] in raw_null:
                assert r["raw_value"] is None
                assert r["filled_value"] == carry
            else:
                assert r["filled_value"] == r["raw_value"]
                carry = r["raw_value"]


def test_interval_join_no_nested_loop(spark, sf_dir):
    out = join_interval_buckets(spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan  # the whole point of the bucketing
    rows = out.collect()
    assert all(r["n_items"] >= 1 for r in rows)


def test_late_data_drop_window_span(spark, sf_dir):
    rows = stream_late_data_drop(spark, sf_dir).collect()
    assert rows, "cutoff must keep the last 30 minutes"
    # all surviving windows sit within 40min of the max window end
    max_end = max(r["win_end"] for r in rows)
    for r in rows:
        assert (max_end - r["win_start"]) <= dt.timedelta(minutes=40)
        assert r["n_events"] >= 1


def test_modality_route_partitions_docs(spark, sf_dir):
    from cs_pipeline_spark.operators.multimodal import mm_modality_route
    from cs_pipeline_spark.tables import load

    rows = {r["modality"]: r for r in mm_modality_route(spark, sf_dir).collect()}
    n_docs = load(spark, "documents", sf_dir).count()
    assert set(rows) == {"image", "audio", "video", "text"}
    assert sum(r["n_docs"] for r in rows.values()) == n_docs


def test_audio_chunks_tile_duration_exactly(spark, sf_dir):
    from cs_pipeline_spark.operators.multimodal import (
        _CHUNK_MS,
        _MS_PER_CHAR,
        mm_audio_chunk_plan,
    )
    from cs_pipeline_spark.tables import load

    chunks = mm_audio_chunk_plan(spark, sf_dir).collect()
    durs = {
        r["doc_id"]: r["n_chars"] * _MS_PER_CHAR
        for r in load(spark, "documents", sf_dir).collect()
    }
    per_doc: dict[int, list] = {}
    for c in chunks:
        per_doc.setdefault(c["doc_id"], []).append(c)
    for doc_id, grp in per_doc.items():
        grp.sort(key=lambda c: c["chunk_idx"])
        assert [c["chunk_idx"] for c in grp] == list(range(len(grp)))
        assert sum(c["chunk_len_ms"] for c in grp) == durs[doc_id]
        assert all(0 < c["chunk_len_ms"] <= _CHUNK_MS for c in grp)
        assert all(
            c["chunk_start_ms"] == c["chunk_idx"] * _CHUNK_MS for c in grp
        )


def test_asof_nearest_is_true_argmin(spark, sf_dir):
    from cs_pipeline_spark.operators.joins import join_asof_nearest
    from cs_pipeline_spark.tables import load

    got = {
        r["event_id"]: (r["nearest_error_value"], r["nearest_dt_us"])
        for r in join_asof_nearest(spark, sf_dir).collect()
    }
    ev = load(spark, "events", sf_dir).select(
        "event_id", "user_id", "ts", "event_type", "value"
    ).collect()
    per_user: dict[int, list] = {}
    for r in ev:
        per_user.setdefault(r["user_id"], []).append(r)
    checked = 0
    for u, rows in per_user.items():
        errors = [
            (int(r["ts"].timestamp() * 1e6), r["value"], r["event_id"])
            for r in rows
            if r["event_type"] == "error"
        ]
        for r in rows:
            t = int(r["ts"].timestamp() * 1e6)
            want_val, want_dt = got[r["event_id"]]
            if not errors:
                assert want_val is None and want_dt is None
                continue
            best = min(abs(et - t) for et, _, _ in errors)
            assert want_dt == best
            checked += 1
    assert checked >= 1000


def test_merge_upsert_dispositions(spark, sf_dir):
    from cs_pipeline_spark.operators.joins import merge_upsert_snapshot
    from cs_pipeline_spark.tables import load

    rows = merge_upsert_snapshot(spark, sf_dir).collect()
    base = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in load(spark, "orders", sf_dir)
        .select("o_orderkey", "o_totalprice")
        .collect()
    }
    ops = {"insert": 0, "update": 0, "keep": 0}
    for r in rows:
        ops[r["op"]] += 1
        if r["op"] == "insert":
            assert r["o_orderkey"] < 0 and r["o_orderkey"] not in base
        elif r["op"] == "update":
            assert r["price"] == base[r["o_orderkey"]] + 1000.0
        else:
            assert r["price"] == base[r["o_orderkey"]]
    assert ops["insert"] == 5
    assert ops["update"] == sum(1 for k in base if k % 100 == 0)
    assert len(rows) == len(base) + 5


def test_scd2_intervals_chain(spark, sf_dir):
    from cs_pipeline_spark.operators.windows import win_scd2_intervals

    rows = win_scd2_intervals(spark, sf_dir).collect()
    per_user: dict[int, list] = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(r)
    for u, grp in per_user.items():
        grp.sort(key=lambda r: (r["valid_from"], r["event_id"]))
        assert sum(1 for r in grp if r["is_current"]) == 1
        assert grp[-1]["valid_to"] is None
        for a, b in zip(grp, grp[1:]):
            assert a["valid_to"] == b["valid_from"]  # gapless chain


def test_messy_numbers_null_on_garbage(spark, sf_dir):
    from cs_pipeline_spark.operators.filters import f_parse_messy_numbers

    rows = f_parse_messy_numbers(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r["raw"] == "n/a":
            assert r["parsed"] is None
        else:
            assert r["parsed"] is not None and r["parsed"] > 0


def test_merge_broadcast_plan_and_equivalence(spark, sf_dir):
    from cs_pipeline_spark.operators.joins import (
        merge_upsert_broadcast,
        merge_upsert_snapshot,
    )

    bcast = merge_upsert_broadcast(spark, sf_dir)
    plan = bcast._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan  # zero base-side shuffles
    a = sorted(map(tuple, bcast.collect()))
    b = sorted(map(tuple, merge_upsert_snapshot(spark, sf_dir).collect()))
    assert a == b  # identical relation to the full-outer form


def test_ml_sample_assembly_igbp_is_nearest(spark, sf_dir):
    from cs_pipeline_spark.operators.windows import (
        _IGBP_N,
        ml_sample_assembly,
    )

    rows = ml_sample_assembly(spark, sf_dir).collect()
    assert rows
    for r in rows[:200]:
        # recompute nearest igbp cell per axis (ties -> smaller ref)
        lats = [44.9 + k * 0.5 for k in range(_IGBP_N)]
        lons = [-74.1 + k * 0.5 for k in range(_IGBP_N)]
        ky = min(range(_IGBP_N), key=lambda k: (abs(r["latitude"] - lats[k]), lats[k]))
        kx = min(range(_IGBP_N), key=lambda k: (abs(r["longitude"] - lons[k]), lons[k]))
        assert r["igbp_code"] == (ky * _IGBP_N + kx) % 17
        assert 1 <= r["doy"] <= 366 and 0 <= r["tod"] <= 23


def test_streak_islands_bruteforce(spark, sf_dir):
    from cs_pipeline_spark.operators.windows import win_streak_islands
    from cs_pipeline_spark.tables import load

    got = {
        (r["user_id"], r["event_type"]): (r["max_streak"], r["n_streaks"])
        for r in win_streak_islands(spark, sf_dir).collect()
    }
    ev = sorted(
        load(spark, "events", sf_dir)
        .select("user_id", "event_type", "ts", "event_id")
        .collect(),
        key=lambda r: (r["ts"], r["event_id"]),
    )
    per_user: dict[int, list] = {}
    for r in ev:
        per_user.setdefault(r["user_id"], []).append(r["event_type"])
    want: dict[tuple, list] = {}
    for u, seq in per_user.items():
        run, prev = 0, None
        for t in seq + [None]:
            if t == prev:
                run += 1
            else:
                if prev is not None:
                    want.setdefault((u, prev), []).append(run)
                run, prev = 1, t
    for key, runs in want.items():
        assert got[key] == (max(runs), len(runs))
    assert set(got) == set(want)


def test_xcorr_leadlag_invariants(spark, sf_dir):
    """CCF sanity: |xcorr| <= 1, exactly one peak value per type (ties
    all flagged), and each type covers all 7 lags with n_pairs > 1."""
    from cs_pipeline_spark.operators.timeseries import ts_xcorr_leadlag

    rows = ts_xcorr_leadlag(spark, sf_dir).collect()
    assert rows, "empty CCF output"
    by_type: dict[str, list] = {}
    for r in rows:
        assert -1.0 <= r.xcorr <= 1.0
        assert r.n_pairs > 1
        by_type.setdefault(r.event_type, []).append(r)
    for et, rs in by_type.items():
        assert sorted(r.lag_hours for r in rs) == [-3, -2, -1, 0, 1, 2, 3]
        peak = max(r.xcorr for r in rs)
        for r in rs:
            assert r.is_peak == (r.xcorr == peak), (et, r)


def test_mann_kendall_invariants(spark, sf_dir):
    """MK contract: S bounded by pair count, var_s18 matches the
    closed form minus a nonnegative tie correction, verdict follows
    the quantized z, and a manufactured monotone series trends."""
    from cs_pipeline_spark.operators.timeseries import ts_mann_kendall

    rows = ts_mann_kendall(spark, sf_dir).collect()
    assert rows
    for r in rows:
        npairs = r.n_hours * (r.n_hours - 1) // 2
        assert abs(r.s_stat) <= npairs
        full = r.n_hours * (r.n_hours - 1) * (2 * r.n_hours + 5)
        assert 0 <= r.var_s18 <= full  # tie correction only shrinks
        if r.trend == "increasing":
            assert r.z >= 1.96
        elif r.trend == "decreasing":
            assert r.z <= -1.96
        else:
            assert abs(r.z) < 1.96 + 1e-9

    # strictly increasing synthetic series -> S = n(n-1)/2, 'increasing'
    import pandas as pd

    n = 40
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "event_type": ["synth"] * n,
                "ts": pd.date_range("2024-01-01", periods=n, freq="h"),
                "value": [float(i) for i in range(n)],
            }
        )
    )
    # monotone series ⇒ every hour pair concordant ⇒ S = n(n-1)/2
    from pyspark.sql import functions as F

    s = (
        df.groupBy("event_type", F.expr("unix_micros(date_trunc('hour', ts)) div 3600000000").alias("h"))
        .agg(F.floor(F.avg("value") * 1e6 + 0.5).cast("long").alias("mq"))
    )
    b = s.select(F.col("event_type").alias("e2"), F.col("h").alias("h2"), F.col("mq").alias("m2"))
    conc = (
        s.join(b, (F.col("event_type") == F.col("e2")) & (F.col("h2") > F.col("h")))
        .select(F.sum(F.when(F.col("m2") > F.col("mq"), 1).otherwise(0)).alias("c"))
        .collect()[0].c
    )
    assert conc == n * (n - 1) // 2
