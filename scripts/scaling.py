"""Cross-SF scaling sweep: time the pinned comparison core at
sf0.001 / sf0.01 / sf0.1 and write SCALING.md.

The point is the 100x question: a plan whose cost is dominated by a
per-row data term scales ~linearly with SF once the fixed job overhead
(session jobs, broadcast builds, shuffle setup — amortized away on a
real cluster) is subtracted; a plan hiding a super-linear term (an
unbounded sort, an all-pairs join) shows up here as a t(0.1)/t(0.01)
ratio far above the ~10x row-count ratio. Min-of-3 per cell, same
noise policy as bench.py.

Usage: python scripts/scaling.py  (writes SCALING.md at the repo root)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CORE  # noqa: E402  (the pinned never-rotating set)

SFS = [
    ("sf0.001", "/root/testdata/sf0.001"),
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
]


def main() -> None:
    from etl_pipeline_project_auraverse_spark.queries import QUERIES, load_all
    from etl_pipeline_project_auraverse_spark.session import get_spark

    load_all()
    spark = get_spark(app_name="scaling")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    cells: dict[str, dict[str, float]] = {}
    for sf_name, sf_dir in SFS:
        for name in CORE:
            fn = QUERIES[name]
            runs = []
            while len(runs) < 3 or (min(runs) > 1.0 and len(runs) < 5):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                runs.append(time.perf_counter() - t0)
            cells.setdefault(name, {})[sf_name] = round(min(runs), 3)
            print(f"{name} @ {sf_name}: {cells[name][sf_name]}s", flush=True)

    lines = [
        "# Cross-SF scaling of the pinned comparison core",
        "",
        "Min-of-3 wall seconds per query on `local[32]`, driven by",
        "`scripts/scaling.py`. Row counts grow ~10x per SF step, so a",
        "data-dominated plan shows `t(sf0.1)/t(sf0.01)` well under 10 at",
        "these sizes (fixed per-job overhead — session jobs, broadcast",
        "builds, shuffle setup — still dominates at small SF and is",
        "amortized on a real cluster); a super-linear plan (unbounded",
        "sort, all-pairs join) would blow past it. Ratios are the scale",
        "evidence the plan-lint suite's structural checks can't give.",
        "",
        "| query | sf0.001 | sf0.01 | sf0.1 | t(0.1)/t(0.01) |",
        "|---|---|---|---|---|",
    ]
    for name in CORE:
        c = cells[name]
        ratio = c["sf0.1"] / c["sf0.01"] if c["sf0.01"] else float("nan")
        lines.append(
            f"| {name} | {c['sf0.001']:.3f} | {c['sf0.01']:.3f} "
            f"| {c['sf0.1']:.3f} | {ratio:.2f} |"
        )
    total = {sf: sum(c[sf] for c in cells.values()) for sf, _ in SFS}
    lines += [
        "",
        f"**Core totals:** sf0.001 {total['sf0.001']:.1f}s · "
        f"sf0.01 {total['sf0.01']:.1f}s · sf0.1 {total['sf0.1']:.1f}s "
        f"(overall ratio sf0.1/sf0.01 = "
        f"{total['sf0.1'] / total['sf0.01']:.2f} against a 10x row-count "
        "step).",
        "",
    ]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(root, "SCALING.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
