"""sf0.1 → sf1 scaling-exponent checkpoint (VERDICT r5 item 6).

Runs the slowest headline queries at sf0.1 and at the derived sf1
(tools/make_sf1.py, 10× facts) and reports the empirical scaling
exponent  α = log10(t_sf1 / t_sf0.1)  — the slope a 10× data-size
step produces. α ≈ 1 is linear, α < 1 means fixed overhead still
dominates at this size, α ≫ 1 is the quadratic surprise this
checkpoint exists to catch (the unguarded minhash band join would
have shown α → 2 here).

Usage: python tools/scale_bench.py [op ...]   (default: the list below)
Emits a markdown table on stdout — paste/commit into SCALE.md.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 10 slowest from BENCH_r05 + the two guarded dedup ops (the guards
# are exactly what a duplicate-heavy 10× corpus stresses)
DEFAULT_OPS = [
    "agg_market_basket",
    "dedup_embedding_lsh",
    "ml_naive_bayes",
    "join_bloom_prefilter",
    "emb_matryoshka_eval",
    "graph_triangles",
    "text_keywords_rare",
    "sim_ivf_pq_topk",
    "curate_corpus_e2e",
    "text_bpe_train3",
    "dedup_minhash_lsh",
    "dedup_exact",
]


def run(ops: list[str]) -> list[tuple[str, float, float, float, int, int]]:
    from cs_pipeline_spark import registry
    from cs_pipeline_spark.session import get_spark
    from tools.make_sf1 import build

    sf1_dir = build()
    spark = get_spark(app_name="scale_bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.all_specs()
    rows = []
    for name in ops:
        fn = specs[name].fn
        out = []
        for sf_dir in ("/root/testdata/sf0.1", sf1_dir):
            fn(spark, sf_dir).count()  # warm: codegen, listing, fixtures
            best, n = float("inf"), 0
            for _ in range(3):
                t0 = time.perf_counter()
                n = fn(spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            out.append((best, n))
        (t01, n01), (t1, n1) = out
        alpha = math.log10(t1 / t01)
        rows.append((name, t01, t1, alpha, n01, n1))
        print(
            f"# {name}: sf0.1 {t01:.3f}s ({n01} rows) → sf1 {t1:.3f}s "
            f"({n1} rows)  α={alpha:.2f}",
            file=sys.stderr,
        )
    return rows


def main() -> None:
    ops = sys.argv[1:] or DEFAULT_OPS
    rows = run(ops)
    print("| query | t sf0.1 (s) | t sf1 (s) | α (10× step) | rows sf0.1 → sf1 |")
    print("|---|---|---|---|---|")
    for name, t01, t1, a, n01, n1 in rows:
        print(f"| {name} | {t01:.3f} | {t1:.3f} | {a:.2f} | {n01} → {n1} |")


if __name__ == "__main__":
    main()
