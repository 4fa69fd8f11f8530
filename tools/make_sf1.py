"""Generate a deterministic sf1 dataset (10× sf0.1 facts) in scratch.

No sf1 dir ships with the test environment (TESTDATA.md stops at
sf0.1), and /root/testdata is read-only — so the sf1 scale checkpoint
(VERDICT r5 item 6) materializes its input here, derived 1:10 from
sf0.1 with DuckDB:

- dimension tables (region/nation/customer/supplier/part) copy as-is —
  dims grow far slower than facts in real deployments;
- fact tables replicate 10× with primary keys shifted by
  k · 10^12 (replica k), foreign keys into dims left in range, so
  join fan-outs and group cardinalities scale the way a real 10×
  ingest would;
- documents/embeddings replicate with shifted ids but IDENTICAL
  text/vectors — deliberately: a 10× corpus of exact replicas is the
  boilerplate-heavy workload the dedup/LSH hot-bucket guards exist
  for, so the scale bench stresses them for real.

Idempotent: skips tables whose output already exists.
Usage: python tools/make_sf1.py [out_dir]   (default .tmp/sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DEFAULT_OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp", "sf1"
)
REPLICAS = 10
SHIFT = 10**12

DIMS = ["region", "nation", "customer", "supplier", "part"]
# fact table → columns shifted per replica (primary/unique keys only)
FACT_KEYS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def build(out_dir: str = DEFAULT_OUT) -> str:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in DIMS:
        dst = f"{out_dir}/{t}.parquet"
        if os.path.exists(dst):
            continue
        con.sql(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{dst}' "
            f"(FORMAT PARQUET, COMPRESSION ZSTD)"
        )
    for t, keys in FACT_KEYS.items():
        dst = f"{out_dir}/{t}.parquet"
        if os.path.exists(dst):
            continue
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + r.k * {SHIFT} AS {c}" if c in keys else c for c in cols
        )
        con.sql(
            f"COPY (SELECT {sel} FROM '{SRC}/{t}.parquet', "
            f"(SELECT unnest(range(0, {REPLICAS})) AS k) r) TO '{dst}' "
            f"(FORMAT PARQUET, COMPRESSION ZSTD, ROW_GROUP_SIZE 262144)"
        )
    return out_dir


if __name__ == "__main__":
    out = build(sys.argv[1] if len(sys.argv) > 1 else DEFAULT_OUT)
    for f in sorted(os.listdir(out)):
        p = os.path.join(out, f)
        print(f"{os.path.getsize(p)/1e6:8.1f} MB  {f}")
    print(out)
