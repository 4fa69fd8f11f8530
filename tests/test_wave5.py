"""Invariants for wave-5 ops: CDC apply, interval overlap join,
retention cohorts, mergeable HLL, tile plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from cs_pipeline_spark.operators.aggregate import (
    agg_hll_mergeable,
    agg_new_vs_returning,
    agg_retention_cohorts,
)
from cs_pipeline_spark.operators.joins import (
    _INCIDENT_US,
    _SESS_GAP_US,
    join_interval_overlap,
)
from cs_pipeline_spark.operators.multimodal import mm_image_tile_plan
from cs_pipeline_spark.streaming.batch_twins import stream_cdc_apply
from cs_pipeline_spark.tables import load


def _events(spark, sf_dir):
    return (
        load(spark, "events", sf_dir)
        .select(
            "event_id",
            "user_id",
            F.unix_micros("ts").alias("us"),
            "event_type",
            "value",
        )
        .collect()
    )


def test_cdc_apply_matches_python_replay(spark, sf_dir):
    rows = {r["user_id"]: r for r in stream_cdc_apply(spark, sf_dir).collect()}
    by_user: dict[int, list] = {}
    for r in _events(spark, sf_dir):
        by_user.setdefault(r["user_id"], []).append(r)
    for user, grp in by_user.items():
        grp.sort(key=lambda r: (r["us"], r["event_id"]))
        last = grp[-1]
        if last["event_type"] == "error":
            assert user not in rows, user
        else:
            assert rows[user]["final_value"] == last["value"]
            assert rows[user]["n_ops"] == len(grp)


def test_interval_overlap_matches_bruteforce(spark, sf_dir):
    got = {
        (r["user_id"], r["sess_id"], r["incident_id"]): r["overlap_us"]
        for r in join_interval_overlap(spark, sf_dir).collect()
    }
    by_user: dict[int, list] = {}
    for r in _events(spark, sf_dir):
        by_user.setdefault(r["user_id"], []).append(r)
    want = {}
    for user, grp in by_user.items():
        grp.sort(key=lambda r: (r["us"], r["event_id"]))
        sessions = []
        for r in grp:
            if not sessions or r["us"] >= sessions[-1][1] + _SESS_GAP_US:
                sessions.append([r["us"], r["us"]])
            else:
                sessions[-1][1] = r["us"]
        incidents = [
            (r["event_id"], r["us"], r["us"] + _INCIDENT_US)
            for r in grp
            if r["event_type"] == "error"
        ]
        for sid, (lo, hi_last) in enumerate(sessions, start=1):
            hi = hi_last + _SESS_GAP_US
            for iid, ilo, ihi in incidents:
                if lo < ihi and ilo < hi:
                    want[(user, sid, iid)] = min(hi, ihi) - max(lo, ilo)
    assert got == want


def test_retention_cohort_zero_offset_is_cohort_size(spark, sf_dir):
    rows = agg_retention_cohorts(spark, sf_dir).collect()
    # offset-0 cell of each cohort = every user appears in their own
    # acquisition week
    ev = load(spark, "events", sf_dir).select(
        "user_id", F.expr("unix_micros(ts) div 604800000000").alias("wk")
    ).collect()
    first = {}
    for r in ev:
        first[r["user_id"]] = min(first.get(r["user_id"], r["wk"]), r["wk"])
    cohort_sizes: dict[int, int] = {}
    for u, w in first.items():
        cohort_sizes[w] = cohort_sizes.get(w, 0) + 1
    zero = {r["cohort_wk"]: r["n_users"] for r in rows if r["week_offset"] == 0}
    assert zero == cohort_sizes
    assert all(r["week_offset"] >= 0 for r in rows)


def test_new_vs_returning_consistency(spark, sf_dir):
    rows = sorted(
        agg_new_vs_returning(spark, sf_dir).collect(), key=lambda r: r["d"]
    )
    total_users = (
        load(spark, "events", sf_dir).select("user_id").distinct().count()
    )
    cum = 0
    for r in rows:
        assert r["n_new"] <= r["n_active"] <= r["n_events"]
        cum += r["n_new"]
        assert r["cum_users"] == cum
    assert rows[-1]["cum_users"] == total_users
    assert rows[0]["n_new"] == rows[0]["n_active"]  # day 1: all new


def test_hll_merge_consistency_flags(spark, sf_dir):
    rows = agg_hll_mergeable(spark, sf_dir).collect()
    assert rows
    assert all(r["merge_consistent"] for r in rows)
    assert all(r["approx_ok"] for r in rows)


def test_tile_plan_counts(spark, sf_dir):
    rows = mm_image_tile_plan(spark, sf_dir).collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, grp in per_doc.items():
        w, h = grp[0]["width"], grp[0]["height"]
        ntx, nty = -(-w // 64), -(-h // 64)
        assert len(grp) == ntx * nty
        assert sum(t["tile_w"] * t["tile_h"] for t in grp) == w * h
