"""Schema inference artifact + versioning + drift detection (A1–A5,
K2; reference ``backend/etl_pipeline.py:246-293``).

Spark-first: the reference profiles with row-at-a-time Python maps
(``non_null.map(infer_type).value_counts()``, etl_pipeline.py:257).
Here the whole profile — type histogram + majority vote (A1),
nullability (A2), examples (A3), modal confidence (A4), PK candidacy
(A5) — is computed in ONE distributed aggregation shaped
unpivot → groupBy(col, value) → groupBy(col); two shuffles regardless
of column count. At 100 TB the exact distinct/modal counts would swap
to ``approx_count_distinct``/sketches with the same query shape.

Artifact layout matches the reference exactly (schema_id =
``v{unix_time}``, fields[].{name,path,type,nullable,examples,
confidence}, primary_key_candidates, compatible_dbs) so a reference
consumer can read our schema JSON unchanged. DeepDiff is replaced by a
small order-insensitive dict diff (the lib isn't in this container).

Determinism deviation (documented, SURVEY §7 hard part (b)): examples
are the 3 *smallest* distinct values, not pandas' incidental first-3.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# infer_type regex classes, reference etl_pipeline.py:228-244
INT_RE = r"^\d+$"
FLOAT_RE = r"^\d*\.\d+$"
DATE_RE = r"^\d{4}-\d{2}-\d{2}"

TYPE_PRECEDENCE = ["integer", "float", "boolean", "date", "string"]


def profile_table(df: DataFrame) -> list[dict[str, Any]]:
    """One-pass per-column profile powering the schema artifact."""
    if not df.columns:
        return []
    stack = ", ".join(f"'{c}', CAST(`{c}` AS STRING)" for c in df.columns)
    vals = df.selectExpr(f"stack({len(df.columns)}, {stack}) AS (col_name, v)")
    vc = vals.groupBy("col_name", "v").agg(F.count("*").alias("cnt"))

    v, cnt = F.col("v"), F.col("cnt")
    # examples = 3 smallest distinct values, collected via a rank ≤ 3
    # guard over a spillable sort window so the aggregation buffer holds
    # at most 3 elements — never a column's whole distinct set (same
    # bounded-state shape as queries/profiling.py)
    w_ex = Window.partitionBy("col_name").orderBy(F.col("v").asc_nulls_last())
    vc = vc.withColumn("__rn", F.row_number().over(w_ex))
    example_of = F.when((F.col("__rn") <= 3) & v.isNotNull(), v)
    nn_sum = lambda cond: F.sum(F.when(v.isNotNull() & cond, cnt).otherwise(0))  # noqa: E731
    empty_as_null = v.isNotNull() & (F.trim(v) == "")  # infer_type: '' → null class
    rows = (
        vc.groupBy("col_name")
        .agg(
            F.sum(cnt).alias("n_rows"),
            F.sum(F.when(v.isNull() | (F.trim(v) == ""), cnt).otherwise(0)).alias("n_nullish"),
            F.sum(F.when(v.isNull(), cnt).otherwise(0)).alias("n_nulls"),
            F.count(F.when(v.isNotNull(), 1)).alias("n_distinct"),
            F.sum(F.when(v.isNotNull(), cnt).otherwise(0)).alias("n_nonnull"),
            nn_sum(~empty_as_null & F.trim(v).rlike(INT_RE)).alias("n_int"),
            nn_sum(~empty_as_null & F.trim(v).rlike(FLOAT_RE)).alias("n_float"),
            nn_sum(F.lower(F.trim(v)).isin("true", "false")).alias("n_bool"),
            nn_sum(
                ~F.trim(v).rlike(INT_RE)
                & ~F.trim(v).rlike(FLOAT_RE)
                & F.trim(v).rlike(DATE_RE)
            ).alias("n_date"),
            F.max(F.when(v.isNotNull(), cnt)).alias("modal_cnt"),
            F.array_sort(F.collect_list(example_of)).alias("examples"),
        )
        .collect()
    )
    profiles = []
    for r in rows:
        counts = {
            "integer": r["n_int"],
            "float": r["n_float"],
            "boolean": r["n_bool"],
            "date": r["n_date"],
        }
        classified = sum(counts.values())
        counts["string"] = r["n_nonnull"] - r["n_nullish"] + r["n_nulls"] - classified
        # majority vote over non-null classes (reference line 257-259),
        # deterministic precedence on ties
        if r["n_nonnull"] == 0 or max(counts.values()) <= 0:
            voted = "string"
        else:
            voted = max(TYPE_PRECEDENCE, key=lambda t: (counts[t], -TYPE_PRECEDENCE.index(t)))
        profiles.append(
            {
                "name": r["col_name"],
                "n_rows": r["n_rows"],
                "type": voted,
                "nullable": r["n_nulls"] > 0,
                "examples": list(r["examples"]),
                "confidence": (
                    float(r["modal_cnt"] / r["n_nonnull"]) if r["n_nonnull"] else 1.0
                ),
                "pk_candidate": r["n_nulls"] == 0 and r["n_distinct"] == r["n_rows"],
            }
        )
    profiles.sort(key=lambda p: p["name"])
    return profiles


def generate_schema(df: DataFrame, now: int | None = None) -> dict[str, Any]:
    """Reference-layout schema artifact (etl_pipeline.py:246-276)."""
    ts = int(now if now is not None else time.time())
    profiles = profile_table(df)
    return {
        "schema_id": f"v{ts}",
        "generated_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime(ts)),
        "fields": [
            {
                "name": p["name"],
                "path": f"$.{p['name']}",
                "type": p["type"],
                "nullable": p["nullable"],
                "examples": p["examples"],
                "confidence": p["confidence"],
            }
            for p in profiles
        ],
        "primary_key_candidates": [p["name"] for p in profiles if p["pk_candidate"]],
        "compatible_dbs": ["postgresql", "mongodb"],
    }


def schema_path(schema_dir: str, source_id: str) -> str:
    return os.path.join(schema_dir, f"{source_id}_schema.json")


def load_schema(schema_dir: str, source_id: str) -> dict | None:
    """K2 read side (etl_pipeline.py:279-287)."""
    path = schema_path(schema_dir, source_id)
    if not os.path.exists(path):
        return None
    try:
        with open(path, encoding="utf-8") as f:
            return json.load(f)
    except Exception:
        return None


def save_schema(schema_dir: str, source_id: str, schema: dict) -> str:
    """K2 write side (etl_pipeline.py:289-293)."""
    os.makedirs(schema_dir, exist_ok=True)
    path = schema_path(schema_dir, source_id)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(schema, f, indent=2)
    return path


def diff_schemas(old: Any, new: Any, path: str = "$") -> dict[str, Any]:
    """Order-insensitive structural diff (DeepDiff stand-in for the
    drift report, etl_pipeline.py:307-309). Lists are compared as
    multisets of their JSON renderings; dicts key-by-key."""
    changes: dict[str, Any] = {}

    def walk(o: Any, n: Any, p: str) -> None:
        if isinstance(o, dict) and isinstance(n, dict):
            for k in o.keys() - n.keys():
                changes.setdefault("removed", []).append(f"{p}.{k}")
            for k in n.keys() - o.keys():
                changes.setdefault("added", []).append(f"{p}.{k}")
            for k in o.keys() & n.keys():
                walk(o[k], n[k], f"{p}.{k}")
        elif isinstance(o, list) and isinstance(n, list):
            oset = sorted(json.dumps(x, sort_keys=True, default=str) for x in o)
            nset = sorted(json.dumps(x, sort_keys=True, default=str) for x in n)
            if oset != nset:
                changes.setdefault("changed", []).append(p)
        else:
            if o != n:
                changes.setdefault("changed", []).append(p)

    walk(old, new, path)
    return changes
