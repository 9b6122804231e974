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
    lines += _file_skipping_section(spark)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(root, "SCALING.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")
    spark.stop()


def _file_skipping_section(spark) -> list[str]:
    """Measured file pruning (r8 verdict ask #6): write sf0.1 orders
    as 64 real parquet files under three layouts — natural order,
    Z-order, Hilbert — each with a per-file min/max manifest, then
    count how many files a 10% band predicate on each clustered
    dimension actually reads via ``operators/file_skipping.read_pruned``.
    This turns the layout family's structural claim into N-of-M files
    skipped on disk."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from etl_pipeline_project_auraverse_spark.operators.file_skipping import (
        read_pruned,
        write_with_stats,
    )
    from etl_pipeline_project_auraverse_spark.operators.zorder import (
        hilbert_key,
        quantize,
        zorder_key,
        zorder_layout,
    )
    from etl_pipeline_project_auraverse_spark.queries.layout import ZBITS

    n_files = 64
    orders = spark.read.parquet("/root/testdata/sf0.1/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    s = orders.agg(
        F.min("o_custkey").alias("mnc"), F.max("o_custkey").alias("mxc"),
        F.min("o_totalprice").alias("mnp"), F.max("o_totalprice").alias("mxp"),
    ).first()
    xq = quantize(F.col("o_custkey"), F.lit(s["mnc"]), F.lit(s["mxc"]), ZBITS)
    yq = quantize(
        F.col("o_totalprice"), F.lit(s["mnp"]), F.lit(s["mxp"]), ZBITS
    )
    base = orders.select("*", xq.alias("xq"), yq.alias("yq"))
    layouts = {
        "natural": orders.repartition(n_files),
        "zorder": zorder_layout(
            base, zorder_key([F.col("xq"), F.col("yq")], ZBITS), n_files
        ).drop("xq", "yq"),
        "hilbert": zorder_layout(
            hilbert_key(base, F.col("xq"), F.col("yq"), ZBITS),
            F.col("hkey"),
            n_files,
        ).drop("xq", "yq", "hkey"),
    }
    # 10% bands in the middle of each clustered dimension
    p_lo = s["mnp"] + 0.45 * (s["mxp"] - s["mnp"])
    p_hi = s["mnp"] + 0.55 * (s["mxp"] - s["mnp"])
    c_lo = s["mnc"] + 0.45 * (s["mxc"] - s["mnc"])
    c_hi = s["mnc"] + 0.55 * (s["mxc"] - s["mnc"])
    rows = []
    tmp = tempfile.mkdtemp(prefix="skipping_")
    try:
        for name, df in layouts.items():
            path = os.path.join(tmp, name)
            write_with_stats(df, path, ["o_custkey", "o_totalprice"])
            _, rp = read_pruned(spark, path, {"o_totalprice": (p_lo, p_hi)})
            _, rc = read_pruned(spark, path, {"o_custkey": (c_lo, c_hi)})
            rows.append((name, rp, rc))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    out = [
        "## Measured file skipping (sf0.1 orders, 64 files per layout)",
        "",
        "Real parquet files + the `operators/file_skipping` min/max",
        "manifest; each cell is files READ / files TOTAL for a 10% band",
        "predicate on that dimension (fewer read = more skipped). The",
        "natural layout prunes almost nothing on the non-write-ordered",
        "dimension; the space-filling-curve layouts keep BOTH envelopes",
        "tight — the property that decides scan cost at 100 TB, where a",
        "skipped file is a task never scheduled.",
        "",
        "| layout | price band reads | custkey band reads |",
        "|---|---|---|",
    ]
    for name, rp, rc in rows:
        out.append(
            f"| {name} | {rp.n_read}/{rp.n_total} "
            f"({rp.n_skipped} skipped) | {rc.n_read}/{rc.n_total} "
            f"({rc.n_skipped} skipped) |"
        )
    out.append("")
    return out


if __name__ == "__main__":
    main()
