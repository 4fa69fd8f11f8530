"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``. The LAST stdout
line is a summary-only JSON object ``{"metric", "value": total_sec,
"unit": "sec", "sf", "n_queries", "detail"}`` sized to survive the
driver's ~2000-char tail capture; the per-query cold/warm/spread dicts
are written to ``BENCH_DETAIL.json`` next to this file.

Each query is built from the central registry and executed to
completion with a count-style action (``df.write.format("noop")``
semantics via ``_to_java_object_rdd``-free ``count()``), so the
timing covers scan → shuffle → result, not plan construction.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per pipeline family (relational agg, join-heavy,
# calendar resample, enrichment join, window, reshape, text dedup,
# fuzzy dedup, vector similarity). Keep ~10 so the bench stays a
# feedback loop, not a marathon.
HEADLINE = [
    "process_area_e2e",
    "process_point_e2e",
    "q1_pricing_summary",
    "q3_top_orders",
    "agg_resample_daily",
    "agg_resample_monthly",
    "convert_predictors",
    "join_enrich_co2",
    "join_gapfill_station",
    "win_sliding_time",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "sim_topk_bruteforce",
    "sim_hybrid_rrf",
    "features_user_rfm",
    "ts_decompose",
    "agg_market_basket",
    "graph_bfs_distance",
    "win_range_frame",
    "text_stats",
    "mm_frame_sample",
    # round-2 additions: corpus shuffle ops, range join, decontamination
    "text_keywords_rare",
    "join_interval_buckets",
    "text_contamination_check",
    "curate_corpus_e2e",
    # round-2 additions: retrieval scoring, stream-stream band join
    "text_bm25_rank",
    "stream_interval_join",
    # round-2 wave 4: graph, training assembly, IVF-PQ
    "graph_pagerank",
    "text_lm_score",
    "doc_chunk_split",
    "sim_ivf_pq_topk",
    # round-2 wave 9: bloom pre-filter, triangle census, curation,
    # changepoint
    "join_bloom_prefilter",
    "graph_triangles",
    "corpus_budget_select",
    "win_cusum_changepoint",
    "events_analytics_e2e",
    # round-2 wave 10: sliding distinct (scatter), DQ anomaly gate,
    # nearest-centroid audit
    "win_sliding_distinct",
    "dq_volume_anomaly",
    "emb_centroid_classify",
    "train_assembly_e2e",
    # round-3: in-engine ML (NB training+scoring, stump), spectral
    # periodicity, mergeable reservoir, silhouette, prefix-dim eval
    "ml_naive_bayes",
    "ml_decision_stump",
    "ts_fourier_power",
    "sample_reservoir_merge",
    "emb_silhouette",
    "emb_matryoshka_eval",
    "ml_gate_e2e",
    "ts_holt_linear",
    # round-4: ANN/dedup scale paths (hyperplane-LSH embedding dedup,
    # IVF nprobe recall sweep, connected-components clustering) + the
    # real TIFF byte decode — regressions here are 100 TB regressions
    "dedup_embedding_lsh",
    "sim_ivf_nprobe_recall",
    "dedup_clusters",
    "scan_raster_decode",
    # round-4 late wave: privacy audit family representative (4x
    # fan-out before one shuffle — the heaviest of the five)
    "privacy_generalization_ladder",
    # round-5: new families — PPS weighted sampling (two-phase prefix
    # sum), iterative BPE training, int8 calibration, Hampel despike
    "sample_pps_systematic",
    "text_bpe_train3",
    "emb_int8_calibrate",
    "win_hampel_filter",
    # round-5 late wave: walk corpus, symbolic TS index, path mining
    "graph_random_walks",
    "ts_sax_words",
    "events_path_trigrams",
    # round-6: new families — item-item CF (basket pair fan-out),
    # 2-round AdaBoost (multi-pass + rank targets), factorial ANOVA,
    # EWMA chart (blocked bounded window), RAKE phrase extraction
    "rec_item_item",
    "ml_adaboost_stumps",
    "agg_two_way_anova",
    "win_ewma_chart",
    "text_rake_keywords",
    # round-7: JPEG header decode (binaryFile + mapInPandas), depth-8
    # BPE loop (8 chained checkpoint rounds — plan-size regression
    # canary), SemDeDup funnel (kmeans + salted pair stage), index-
    # backed incremental LSH
    "mm_decode_jpeg_meta",
    "text_bpe_train8",
    "dedup_semantic_e2e",
    "dedup_lsh_incremental",
    # round-7 wave 2: O(n²)-diagonal matrix profile, 8-round greedy
    # facility location, 4-round batch perceptron
    "ts_matrix_profile",
    "corpus_facility_select",
    "ml_perceptron_batch",
    "emb_dbscan_cosine",
    "text_unigram_viterbi",
    "ts_granger_causality",
    "anomaly_suite_e2e",
    # round-8: real audio decode (RIFF/PCM via mapInPandas), the
    # baseline-JPEG DC Huffman entropy decode, arbitrary-length
    # substring dedup, incremental IVF fold-in, WordPiece training,
    # generation-eval overlap metrics, DSIR selection weights
    "mm_decode_wav",
    "mm_decode_jpeg_dc",
    "dedup_substring_repeats",
    "sim_ivf_incremental",
    "text_wordpiece_train4",
    "text_rouge_n",
    "corpus_dsir_weights",
    "mm_curate_e2e",
    # round-8 late wave: GIF/WebP container decodes, EXIF GPS PII,
    # WordPiece max-munch encode (8-step loop canary)
    "mm_decode_gif_meta",
    "mm_decode_webp_meta",
    "mm_exif_gps",
    "text_wordpiece_encode",
    # round-8 final wave: video/lossless-audio containers, GOP census,
    # silence-run trim, chrF eval, content-defined chunk dedup
    "mm_decode_mp4_meta",
    "mm_video_keyframes",
    "mm_decode_flac_meta",
    "mm_audio_silence_trim",
    "text_chrf",
    "dedup_cdc_chunks",
    "scan_tar_members",
    "mm_decode_mp3_meta",
    "mm_wds_samples",
    "scan_srt_cues",
    "mm_decode_ogg_meta",
    "mm_decode_pdf_meta",
    "text_html_extract",
    "scan_warc_records",
    "crawl_ingest_e2e",
    "scan_robots_rules",
    "text_license_detect",
    "scan_safetensors_meta",
    "mm_caption_align",
    "sink_wds_shards",
    "scan_tfrecord_meta",
    "scan_npy_header",
    "mm_decode_quarantine",
    "mm_decode_bmp",
    # round-9 wave: PDF text read path, gzip-member WARC, audio
    # spectral features, video keyframe pixels, incremental-ingest
    "text_pdf_extract",
    "scan_warc_gz_records",
    "mm_audio_features",
    "mm_video_keyframe_pixels",
    "sim_ivf_retrain",
    "ingest_incremental_e2e",
    "scan_cdx_ranged_fetch",
    "scan_parquet_footer",
    "scan_bz2_multistream",
    "text_wiki_markup_strip",
    "dedup_bloom_incremental",
    "scan_avro_blocks",
    "sink_avro_roundtrip",
    "scan_delta_log",
    "lake_audit_e2e",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from cs_pipeline_spark import registry
    from cs_pipeline_spark.session import get_spark

    spark = get_spark(app_name="cs_pipeline_bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.all_specs()

    # Warmup pass (untimed): first execution of each query pays one-time
    # session costs — codegen/JIT compilation, file-listing, Python
    # worker fork — that are amortized to ~zero on any long-running
    # cluster job. The timed pass below measures steady-state
    # throughput, the number that extrapolates to the 100 TB target.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    for name in HEADLINE:
        if name in specs:
            specs[name].fn(spark, sf_dir).count()

    # Timed, COLD headline: each timed run first evicts the op's
    # memoized plan (registry.evict) so plan construction AND any
    # localCheckpoint / pinned-intermediate work is rebuilt inside the
    # timing window. min-of-N over the memoized DataFrame only
    # re-counted materialized state for iterative ops (dedup_clusters
    # 0.03 s warm vs 6.4 s cold — VERDICT r7), so builder-reported and
    # driver-recorded numbers disagreed by construction. Cold min-of-2
    # is the headline; WARM min-of-2 (min-of-5 when sub-second —
    # scheduling noise on local[32] smears short runs up to ~2.5×,
    # PLANS.md r5) is kept as a secondary column. Per-query SPREAD
    # (max−min over the cold runs) is recorded: only adjudicate a
    # round-over-round delta exceeding the recorded spread.
    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in HEADLINE:
        if name not in specs:
            continue
        n = 0
        cold_runs: list[float] = []
        for _ in range(2):
            registry.evict(name, spark, sf_dir)
            t0 = time.perf_counter()
            n = specs[name].fn(spark, sf_dir).count()
            cold_runs.append(time.perf_counter() - t0)
        warm_runs: list[float] = []
        for _ in range(2):
            t0 = time.perf_counter()
            n = specs[name].fn(spark, sf_dir).count()
            warm_runs.append(time.perf_counter() - t0)
        if min(warm_runs) < 1.0:
            for _ in range(3):
                t0 = time.perf_counter()
                n = specs[name].fn(spark, sf_dir).count()
                warm_runs.append(time.perf_counter() - t0)
        cold[name] = round(min(cold_runs), 4)
        warm[name] = round(min(warm_runs), 4)
        spreads[name] = round(max(cold_runs) - min(cold_runs), 4)
        print(
            f"# {name}: {n} rows cold {cold[name]}s "
            f"(±{spreads[name]}s) warm {warm[name]}s",
            file=sys.stderr,
        )

    total = round(sum(cold.values()), 4)
    # Per-query detail goes to a FILE: the driver's stdout tail capture
    # is ~2000 chars, and 78-entry queries/spread dicts pushed the JSON
    # headline past it for two rounds (BENCH_r06/r07 "parsed": null).
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": cold,
                "warm": warm,
                "spread": spreads,
                "sf": sf,
            },
            f,
            indent=1,
        )
    # LAST stdout line: summary-only JSON, short enough for any tail
    # capture to hold whole.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(cold),
                "detail": "BENCH_DETAIL.json",
            }
        )
    )


if __name__ == "__main__":
    main()
