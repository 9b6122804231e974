"""Generate ATTESTATION.json — the per-query driver-attestation ledger.

For every query in the registry, collect which rounds gave it a green
driver CORRECTNESS row (rows+schema+hash match, no error), which gave
it a red row, and when it was last attested. The rotation bookkeeping
in ``queries/__init__.py`` used to live in a hand-maintained comment;
this ledger is derived directly from the recorded ``CORRECTNESS_r*.json``
artifacts so the "N never attested" number is checkable in one read
and cannot go stale.

Usage:  python scripts/attestation.py   (writes ATTESTATION.json at repo root)
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_ledger() -> dict:
    from etl_pipeline_project_auraverse_spark.queries import QUERIES, ORACLE, load_all

    load_all()

    green: dict[str, list[int]] = {}
    red: dict[str, list[int]] = {}
    rounds: list[int] = []
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        rounds.append(rnd)
        for name, res in json.load(open(path)).items():
            ok = (
                isinstance(res, dict)
                and res.get("rows_match")
                and res.get("schema_match")
                and res.get("hash_match") in (True, None)  # None = rows-only check
                and not res.get("err")
            )
            (green if ok else red).setdefault(name, []).append(rnd)

    queries = {}
    for name in QUERIES:
        g = green.get(name, [])
        queries[name] = {
            "green_rounds": g,
            "red_rounds": red.get(name, []),
            "last_green": max(g) if g else None,
            "has_oracle": name in ORACLE,
        }

    never = sorted(n for n, q in queries.items() if not q["green_rounds"] and not q["red_rounds"])
    return {
        "rounds_seen": rounds,
        "registry_size": len(queries),
        "ever_attested": len(queries) - len(never),
        "never_attested": never,
        "queries": queries,
    }


def main() -> None:
    ledger = build_ledger()
    out = os.path.join(REPO, "ATTESTATION.json")
    with open(out, "w") as f:
        json.dump(ledger, f, indent=1, sort_keys=False)
        f.write("\n")
    print(
        f"wrote {out}: {ledger['registry_size']} queries, "
        f"{ledger['ever_attested']} ever attested, "
        f"{len(ledger['never_attested'])} never attested"
    )


if __name__ == "__main__":
    main()
