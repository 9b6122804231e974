"""Pre-driver parity insurance: run registered queries against their
DuckDB oracles exactly the way the external correctness gate does
(row count + sorted columns + order-insensitive value comparison) and
report any divergence BEFORE the driver records it.

Usage:
  python scripts/parity.py --front 50                # the driver's sample
  python scripts/parity.py --all                     # full registry
  python scripts/parity.py q_foo q_bar               # named queries
  python scripts/parity.py --sf /root/testdata/sf0.001 --front 50
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--front", type=int, default=0, help="check the first N registry entries")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import duckdb
    import pandas as pd

    from etl_pipeline_project_auraverse_spark.queries import ORACLE, QUERIES, load_all
    from etl_pipeline_project_auraverse_spark.session import get_spark

    load_all()
    if args.all:
        names = list(QUERIES)
    elif args.front:
        names = list(QUERIES)[: args.front]
    else:
        names = args.names
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark(app_name="parity")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    failures = []
    for i, name in enumerate(names):
        t0 = time.monotonic()
        try:
            sdf = QUERIES[name](spark, args.sf).toPandas()
            if name not in ORACLE:
                print(f"[{i+1}/{len(names)}] {name}: NO ORACLE (rows-only) "
                      f"{len(sdf)} rows  {time.monotonic()-t0:.1f}s")
                continue
            odf = con.sql(ORACLE[name]).df()
            scols = sorted(sdf.columns)
            s = sdf[scols].sort_values(scols).reset_index(drop=True)
            o = (
                odf[scols]
                .sort_values(scols)
                .reset_index(drop=True)
                .astype({c: s[c].dtype for c in scols})
            )
            pd.testing.assert_frame_equal(s, o)
            print(f"[{i+1}/{len(names)}] {name}: OK {len(s)} rows  "
                  f"{time.monotonic()-t0:.1f}s", flush=True)
        except Exception as exc:  # noqa: BLE001 — report and continue
            failures.append(name)
            msg = str(exc).replace("\n", " | ")[:400]
            print(f"[{i+1}/{len(names)}] {name}: FAIL {msg}", flush=True)

    print(f"\n{len(names) - len(failures)}/{len(names)} green at {args.sf}")
    if failures:
        print("FAILURES:", " ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
