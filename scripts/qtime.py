"""Ad-hoc per-query measurement harness for optimization rounds.

Usage:
    python scripts/qtime.py q_name [q_name ...] [--runs N] [--plan DIR]
        [--sf DIR]

Times each named registry query with the SAME methodology as bench.py
(min over N runs of plan+execute+collect, clearCache between runs) and
optionally writes .explain("formatted") output to DIR/<name>.txt.
This is a measurement tool only — the driver contract lives in
bench.py, unchanged.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_pipeline_project_auraverse_spark.queries import QUERIES, load_all  # noqa: E402
from etl_pipeline_project_auraverse_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plan", default=None, help="dir for explain output")
    ap.add_argument("--suffix", default="", help="plan file name suffix")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    load_all()
    spark = get_spark(app_name="qtime")
    # same warmup as bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(args.sf, "lineitem.parquet")).count()

    for name in args.names:
        fn = QUERIES[name]
        if args.plan:
            os.makedirs(args.plan, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, args.sf).explain("formatted")
            out = Path(args.plan) / f"{name}{args.suffix}.txt"
            out.write_text(buf.getvalue())
        runs = []
        for _ in range(args.runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, args.sf).collect()
            runs.append(round(time.perf_counter() - t0, 4))
        print(f"{name}: min={min(runs):.3f}  runs={runs}", flush=True)


if __name__ == "__main__":
    main()
