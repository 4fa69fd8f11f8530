"""Local replay of the driver's correctness gate.

For every registered query: run the Spark builder and the DuckDB oracle
on the same sf dir, then compare row count, column names, and values
(order-insensitive, exact). Reports per-query PASS/FAIL with diagnosis
(max numeric diff when values mismatch) so float-determinism issues are
visible before the driver runs.

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

from cs_pipeline_spark import registry
from cs_pipeline_spark.session import get_spark
from cs_pipeline_spark.tables import TABLE_NAMES


def _canon_cell(v):
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", repr(v))
    if isinstance(v, (np.floating,)):
        return _canon_cell(float(v))
    if isinstance(v, (np.integer,)):
        return ("i", int(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("a", tuple(_canon_cell(x) for x in v))
    if isinstance(v, pd.Timestamp):
        return ("t", v.isoformat())
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    return ("s", str(v))


def _canon_df(pdf: pd.DataFrame):
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [tuple(_canon_cell(v) for v in row) for row in pdf.itertuples(index=False)]
    rows.sort()
    return cols, rows


def _max_numeric_diff(a_rows, b_rows):
    worst = 0.0
    for ra, rb in zip(a_rows, b_rows):
        for ca, cb in zip(ra, rb):
            if ca[0] == "f" and cb[0] == "f":
                try:
                    d = abs(float(ca[1]) - float(cb[1]))
                    rel = d / max(1e-30, abs(float(ca[1])))
                    worst = max(worst, min(d, rel))
                except ValueError:
                    pass
    return worst


def main() -> int:
    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    if vanilla:
        args.remove("--vanilla")
    sf_dir = "/root/testdata/sf0.01"
    if args and os.path.isdir(args[0]):
        sf_dir = args[0]
        args = args[1:]

    specs = registry.all_specs()
    names = args or sorted(specs)

    if vanilla:
        # replicate the driver exactly: no engine configs at all
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("check_vanilla")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
    else:
        spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = n_rows_only = 0
    for name in names:
        spec = specs[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            # fresh cursor per query: a failed statement must not
            # poison the shared connection for the remaining queries
            odf = con.cursor().execute(spec.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        sc, srows = _canon_df(sdf)
        oc, orows = _canon_df(odf)
        status = []
        if len(srows) != len(orows):
            status.append(f"rowcount {len(srows)} vs {len(orows)}")
        if sc != oc:
            status.append(f"cols {sc} vs {oc}")
        if not status and srows != orows:
            diff = _max_numeric_diff(srows, orows)
            nbad = sum(1 for a, b in zip(srows, orows) if a != b)
            status.append(f"values ({nbad}/{len(srows)} rows differ, maxdiff≈{diff:.2e})")
            for a, b in zip(srows, orows):
                if a != b:
                    print(f"      spark:  {a}")
                    print(f"      oracle: {b}")
                    break
        if status:
            print(f"FAIL  {name}: {'; '.join(status)} [{time.time()-t0:.1f}s]")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only, sf_dir={sf_dir}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
