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

GATE: exits non-zero if any query shows α > 1.05 **and** its sf1 time
is ≥ 0.5 s. The time floor exempts queries where both measurements are
pure fixed overhead (a 0.05 s → 0.6 s "jump" is scheduler noise at
min-of-5, not a scaling law — PLANS.md r5 measured up to 2.5× spread
on sub-second runs); everything slow enough for α to be meaningful is
gated strictly.

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


def main() -> None:
    ops = sys.argv[1:] or default_ops()
    rows = run(ops)
    print("| query | t sf0.1 (s) | t sf1 (s) | α (10× step) | rows sf0.1 → sf1 |")
    print("|---|---|---|---|---|")
    failed = []
    for name, t01, t1, a, n01, n1 in rows:
        flag = " **FAIL**" if (a > ALPHA_MAX and t1 >= T_FLOOR) else ""
        print(
            f"| {name} | {t01:.3f} | {t1:.3f} | {a:.2f}{flag} | {n01} → {n1} |"
        )
        if flag:
            failed.append((name, a, t1))
    if failed:
        print(
            f"\nSCALE GATE FAILED — α > {ALPHA_MAX} with t_sf1 ≥ "
            f"{T_FLOOR}s: "
            + ", ".join(f"{n} (α={a:.2f}, {t:.2f}s)" for n, a, t in failed),
            file=sys.stderr,
        )
        sys.exit(1)


if __name__ == "__main__":
    main()
