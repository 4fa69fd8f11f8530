"""Round-10 optimization probe: per-op cold/warm timing + plan capture.

Usage::

    python tools/opt_probe.py [--plans DIR] [--suffix before] op [op ...]

Mirrors bench.py's pinned-cold protocol (fixtures pre-built in warmup,
evict → rebuild → count, min-of-2) for the named ops only, and writes
each op's ``.explain("formatted")`` to ``<DIR>/<op>_<suffix>.txt``
(default plans/r10, suffix "before"). Timing uses the same count()
action as bench.py so numbers are comparable; pass ``--noop`` to time
with the noop sink instead (guide §1.4) when diagnosing whether an
op's cost is in the computation or the count-pruned subtree.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ops", nargs="+")
    ap.add_argument("--plans", default=None, help="dir for explain dumps")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--noop", action="store_true",
                    help="time with the noop sink instead of count()")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from bench import _warmup
    from cs_pipeline_spark import registry
    from cs_pipeline_spark.session import get_spark

    spark = get_spark(app_name="opt_probe")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.all_specs()
    missing = [n for n in args.ops if n not in specs]
    if missing:
        raise SystemExit(f"unknown ops: {missing}")

    _warmup(spark, specs, args.ops, args.sf_dir)

    def run(df) -> int:
        if args.noop:
            df.write.format("noop").mode("overwrite").save()
            return -1
        return df.count()

    for name in args.ops:
        spark.sparkContext.setJobDescription(f"probe:{name}")
        cold_runs = []
        n = -1
        for _ in range(args.runs):
            registry.evict(name, spark, args.sf_dir, blocking=True)
            t0 = time.perf_counter()
            n = run(specs[name].fn(spark, args.sf_dir))
            cold_runs.append(time.perf_counter() - t0)
        warm_runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            n = run(specs[name].fn(spark, args.sf_dir))
            warm_runs.append(time.perf_counter() - t0)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = specs[name].fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w"
            ) as f:
                f.write(plan)
        print(
            f"{name}: rows={n} cold={min(cold_runs):.3f}s "
            f"(runs {['%.3f' % c for c in cold_runs]}) "
            f"warm={min(warm_runs):.3f}s",
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
