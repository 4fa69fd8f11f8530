"""Invariants for sampling, histogram, and embedding-profile ops."""

from __future__ import annotations

import math

from cs_pipeline_spark.operators.aggregate import (
    agg_histogram,
    sample_stratified,
)
from cs_pipeline_spark.operators.similarity import emb_norm_stats
from cs_pipeline_spark.tables import load


def test_stratified_exact_quota_and_stability(spark, sf_dir):
    a = sample_stratified(spark, sf_dir).collect()
    b = sample_stratified(spark, sf_dir).collect()
    # deterministic: identical across runs
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per_lang: dict[str, list] = {}
    for r in a:
        per_lang.setdefault(r["lang"], []).append(r)
    n_docs_per_lang = {
        r["lang"]: r["n"]
        for r in load(spark, "documents", sf_dir)
        .groupBy("lang")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    for lang, grp in per_lang.items():
        assert len(grp) == min(10, n_docs_per_lang[lang])
        assert sorted(r["rn"] for r in grp) == list(range(1, len(grp) + 1))


def test_histogram_partitions_all_rows(spark, sf_dir):
    rows = agg_histogram(spark, sf_dir).collect()
    n_orders = load(spark, "orders", sf_dir).count()
    assert sum(r["n"] for r in rows) == n_orders
    for r in rows:
        assert r["bin_low"] <= r["min_v"] <= r["max_v"] < r["bin_low"] + 50000.0
        assert r["bin"] == int(r["bin_low"] // 50000.0)


def test_emb_norms_match_numpy(spark, sf_dir):
    rows = emb_norm_stats(spark, sf_dir).collect()
    embs = {
        r["vec_id"]: r["embedding"]
        for r in load(spark, "embeddings", sf_dir).collect()
    }
    assert len(rows) == len(embs)
    for r in rows:
        v = embs[r["vec_id"]]
        assert r["dim"] == len(v)
        true_norm = math.sqrt(sum(float(x) * float(x) for x in v))
        # quantized self-dot ⇒ ≤ dim·5e-7 absolute error on the square
        assert abs(r["l2_norm"] - true_norm) < 1e-3
        assert r["l2_norm"] >= 0.0


def test_approx_verdicts_hold(spark, sf_dir):
    from cs_pipeline_spark.operators.aggregate import (
        agg_approx_distinct,
        agg_approx_quantile,
    )

    for r in agg_approx_distinct(spark, sf_dir).collect():
        assert r["approx_ok"] is True
        assert r["n_exact"] > 0
    for r in agg_approx_quantile(spark, sf_dir).collect():
        assert r["approx_ok"] is True


def test_profile_nulls_ratios(spark, sf_dir):
    from cs_pipeline_spark.operators.aggregate import profile_nulls

    rows = {r["col"]: r for r in profile_nulls(spark, sf_dir).collect()}
    assert set(rows) == {"value", "props", "event_type"}
    for r in rows.values():
        assert 0 <= r["n_nulls"] <= r["n_rows"]
        assert abs(r["null_ratio"] - r["n_nulls"] / r["n_rows"]) < 1e-12
    # derivation rates differ by construction (%11 vs %7 vs %13)
    assert rows["props"]["n_nulls"] > rows["value"]["n_nulls"]


def test_min_cost_supplier_is_true_argmin(spark, sf_dir):
    from cs_pipeline_spark.operators.subqueries import q_min_cost_supplier

    best = {
        r["p_partkey"]: (r["best_acctbal"], r["best_suppkey"])
        for r in q_min_cost_supplier(spark, sf_dir).collect()
    }
    li = load(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey").distinct()
    sup = {
        r["s_suppkey"]: r["s_acctbal"]
        for r in load(spark, "supplier", sf_dir).collect()
    }
    pairs: dict[int, list] = {}
    for r in li.collect():
        pairs.setdefault(r["l_partkey"], []).append(r["l_suppkey"])
    for pk, supps in pairs.items():
        want = min((sup[s], s) for s in supps)
        assert best[pk] == want


def test_ntile_deciles_balanced(spark, sf_dir):
    from cs_pipeline_spark.operators.windows import win_ntile_decile

    rows = win_ntile_decile(spark, sf_dir).collect()
    per_type: dict[str, list] = {}
    for r in rows:
        per_type.setdefault(r["event_type"], []).append(r)
    for t, grp in per_type.items():
        grp.sort(key=lambda r: r["decile"])
        assert [r["decile"] for r in grp] == list(range(1, 11))
        # equal-frequency: sizes differ by at most 1
        sizes = [r["n"] for r in grp]
        assert max(sizes) - min(sizes) <= 1
        # bucket value ranges are non-decreasing
        for a, b in zip(grp, grp[1:]):
            assert a["lo"] <= a["hi"] <= b["hi"]


def test_mode_matches_bruteforce(spark, sf_dir):
    from collections import Counter

    from cs_pipeline_spark.operators.aggregate import agg_mode_per_group

    got = {
        r["user_id"]: (r["mode_type"], r["n_mode"])
        for r in agg_mode_per_group(spark, sf_dir).collect()
    }
    events = load(spark, "events", sf_dir).select("user_id", "event_type").collect()
    per_user: dict[int, Counter] = {}
    for r in events:
        per_user.setdefault(r["user_id"], Counter())[r["event_type"]] += 1
    for u, c in per_user.items():
        want = min(((-n, t) for t, n in c.items()))
        assert got[u] == (want[1], -want[0])


def test_sorted_sink_no_exchange(spark, sf_dir):
    from cs_pipeline_spark.tables import load as _load

    ev = _load(spark, "events", sf_dir).select("event_id", "ts")
    plan = (
        ev.sortWithinPartitions("ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # local sort only — the layout is free


def test_multiprobe_structure_and_order(spark, sf_dir):
    from cs_pipeline_spark.operators.similarity import (
        TOP_K,
        sim_ivf_multiprobe,
    )

    rows = sim_ivf_multiprobe(spark, sf_dir).collect()
    per_q: dict[int, list] = {}
    for r in rows:
        assert r["neighbor_id"] != r["query_id"]
        per_q.setdefault(r["query_id"], []).append(r)
    for q, grp in per_q.items():
        assert len(grp) <= TOP_K
        sims = sorted((r["cos_sim"] for r in grp), reverse=True)
        assert all(-1.001 <= s <= 1.001 for s in sims)
        # no duplicate neighbors
        ids = [r["neighbor_id"] for r in grp]
        assert len(ids) == len(set(ids))


def test_rolling_zscore_matches_numpy(spark, sf_dir):
    import numpy as np

    from cs_pipeline_spark.operators.windows import win_rolling_zscore

    got = {r["event_id"]: r for r in win_rolling_zscore(spark, sf_dir).collect()}
    ev = sorted(
        load(spark, "events", sf_dir)
        .select("event_id", "user_id", "ts", "value")
        .collect(),
        key=lambda r: (r["ts"], r["event_id"]),
    )
    per_user: dict[int, list] = {}
    for r in ev:
        per_user.setdefault(r["user_id"], []).append(r)
    checked = 0
    for u, rows in per_user.items():
        for i, r in enumerate(rows):
            win = [x["value"] for x in rows[max(0, i - 7) : i + 1]]
            g = got[r["event_id"]]
            assert g["n_win"] == len(win)
            vq = np.floor(np.array(win) * 1e6 + 0.5) / 1e6
            assert abs(g["roll_mean"] - vq.mean()) < 1e-9 * max(1, abs(vq.mean()))
            std = float(np.sqrt(max((vq**2).mean() - vq.mean() ** 2, 0.0)))
            if len(win) > 1 and std > 1e-9:
                want = (r["value"] - vq.mean()) / std
                assert abs(g["zscore"] - want) < 1e-6 * max(1.0, abs(want))
                checked += 1
    assert checked > 100


def test_corr_matches_numpy(spark, sf_dir):
    import numpy as np

    from cs_pipeline_spark.operators.aggregate import agg_corr

    got = {
        r["l_returnflag"]: r["corr_qty_price"]
        for r in agg_corr(spark, sf_dir).collect()
    }
    rows = load(spark, "lineitem", sf_dir).select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).collect()
    per_flag: dict[str, list] = {}
    for r in rows:
        per_flag.setdefault(r["l_returnflag"], []).append(
            (r["l_quantity"], r["l_extendedprice"])
        )
    for flag, pairs in per_flag.items():
        x = np.floor(np.array([p[0] for p in pairs]) * 1e6 + 0.5) / 1e6
        y = np.floor(np.array([p[1] for p in pairs]) * 1e6 + 0.5) / 1e6
        want = float(np.corrcoef(x, y)[0, 1])
        assert abs(got[flag] - want) < 1e-9


def test_incremental_merge_equals_full_scan(spark, sf_dir):
    from cs_pipeline_spark.operators.aggregate import agg_incremental_merge
    from pyspark.sql import functions as F

    got = {
        r["event_type"]: (r["n"], r["sum_value"])
        for r in agg_incremental_merge(spark, sf_dir).collect()
    }
    ev = load(spark, "events", sf_dir)
    q = F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5)).cast("decimal(38,0)")
    full = {
        r["event_type"]: (r["n"], r["s"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count("value").alias("n"),
            (F.sum(q).cast("string").cast("double") / F.lit(1e6)).alias("s"),
        )
        .collect()
    }
    assert got == full  # bit-exact, not approximately equal


def test_dq_one_scan_and_verdicts(spark, sf_dir):
    from cs_pipeline_spark.operators.filters import dq_expectations

    rows = {r["rule"]: r for r in dq_expectations(spark, sf_dir).collect()}
    assert len(rows) == 4
    for r in rows.values():
        assert r["passed"] == (r["n_violations"] == 0)
        assert 0 <= r["violation_ratio"] <= 1
    # a useful report contains BOTH verdicts on this corpus: the
    # value/domain/range rules hold, user_id=0 rows violate the
    # positivity rule
    assert rows["value_non_negative"]["passed"]
    assert rows["event_type_in_domain"]["passed"]
    assert not rows["user_id_positive"]["passed"]
    assert rows["user_id_positive"]["n_violations"] > 0
    # one scan: a single aggregate node feeds the stack
    plan = (
        dq_expectations(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # memoized builders return the executed DF after the earlier
    # collect(); AQE's toString then appends an "== Initial Plan =="
    # section — count scans in the FINAL plan only
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") - final.count("ReusedExchange") <= 1
