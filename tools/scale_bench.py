"""sf0.1 → sf1 scaling-exponent gate (VERDICT r5 item 6, promoted to a
standing full-bench gate by VERDICT r6 item 2).

Runs EVERY headline bench query (bench.py HEADLINE — includes the 4
e2e flagships) at sf0.1 and at the derived sf1 (tools/make_sf1.py,
10× facts) and reports the empirical scaling exponent
α = log10(t_sf1 / t_sf0.1) — the slope a 10× data-size step produces.
α ≈ 1 is linear, α < 1 means fixed overhead still dominates at this
size, α ≫ 1 is the quadratic surprise this gate exists to catch (the
unguarded minhash band join would have shown α → 2 here; the round-6
embedding-LSH recall collapse was also found by this checkpoint).

GATE: exits non-zero if any query's time grows faster than its WORK
bound — runtime may grow at most like max(input growth, output
growth). On the replica corpus several dedup/band-join queries emit
quadratically more OUTPUT (10× replicas of every doc → ~100-1000×
near-dup pairs: that is the correct answer, not a plan defect), so
the raw α vs the 10× input step alone would flag them while their
per-output-row cost actually FELL. Formally: with g = max(10,
n_sf1/n_sf0.1), fail when log_g(t_sf1/t_sf0.1) > 1.05 and t_sf1 ≥
0.5 s. The time floor exempts queries where both measurements are
pure fixed overhead (a 0.05 s → 0.6 s "jump" is scheduler noise at
min-of-5, not a scaling law — PLANS.md r5 measured up to 2.5× spread
on sub-second runs); everything slow enough for the slope to be
meaningful is gated strictly.

Usage: python tools/scale_bench.py [op ...]   (default: full HEADLINE)
Emits a markdown table on stdout — paste/commit into SCALE.md.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALPHA_MAX = 1.05
T_FLOOR = 0.5  # sf1 seconds below which α is overhead noise, not slope


def default_ops() -> list[str]:
    from bench import HEADLINE

    return list(HEADLINE)


def _best_time(fn, spark, sf_dir) -> tuple[float, int]:
    fn(spark, sf_dir).count()  # warm: codegen, listing, fixtures
    runs: list[float] = []
    n = 0
    for _ in range(3):
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        runs.append(time.perf_counter() - t0)
    if min(runs) < 1.0:  # sub-second: escalate to min-of-5 (bench.py rule)
        for _ in range(2):
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
    return min(runs), n


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
        if name not in specs:
            continue
        fn = specs[name].fn
        t01, n01 = _best_time(fn, spark, "/root/testdata/sf0.1")
        t1, n1 = _best_time(fn, spark, sf1_dir)
        alpha = math.log10(t1 / t01)
        rows.append((name, t01, t1, alpha, n01, n1))
        print(
            f"# {name}: sf0.1 {t01:.3f}s ({n01} rows) → sf1 {t1:.3f}s "
            f"({n1} rows)  α={alpha:.2f}",
            file=sys.stderr,
        )
    return rows


def gate_alpha(
    t01: float, t1: float, n01: int, n1: int
) -> tuple[float, float]:
    """(raw 10×-step α, work-bound α): the latter measures time growth
    against max(input 10×, output growth) — the admissible work."""
    a = math.log10(t1 / t01)
    g = max(10.0, n1 / max(n01, 1))
    return a, math.log(t1 / t01) / math.log(g)


def main() -> None:
    ops = sys.argv[1:] or default_ops()
    rows = run(ops)
    print(
        "| query | t sf0.1 (s) | t sf1 (s) | α (10× step) "
        "| α vs work bound | rows sf0.1 → sf1 |"
    )
    print("|---|---|---|---|---|---|")
    failed = []
    for name, t01, t1, a, n01, n1 in rows:
        _, aw = gate_alpha(t01, t1, n01, n1)
        flag = " **FAIL**" if (aw > ALPHA_MAX and t1 >= T_FLOOR) else ""
        print(
            f"| {name} | {t01:.3f} | {t1:.3f} | {a:.2f} "
            f"| {aw:.2f}{flag} | {n01} → {n1} |"
        )
        if flag:
            failed.append((name, aw, t1))
    if failed:
        print(
            f"\nSCALE GATE FAILED — work-bound α > {ALPHA_MAX} with "
            f"t_sf1 ≥ {T_FLOOR}s: "
            + ", ".join(f"{n} (α={a:.2f}, {t:.2f}s)" for n, a, t in failed),
            file=sys.stderr,
        )
        sys.exit(1)


if __name__ == "__main__":
    main()
