"""Round-end checklist in one command.

Runs, in order, on an idle JVM (don't run concurrently with pytest —
CPU steal inflates every timing; see the r7 BENCH_SWEEP re-record):

1. attestation-ledger regeneration (ATTESTATION.json) — FIRST, so a
   CORRECTNESS_r{N}.json that landed after the previous round's regen
   (the r7 gap: the ledger said rounds_seen [1..6] because the driver
   writes its artifact after this script runs) is folded in before
   anything reads the ledger;
2. full-registry DuckDB parity at the driver's sf0.01 gate scale,
   written to PARITY_r{N}.log (carriage-return progress fragments
   stripped so every per-query line survives grep);
3. attestation-ledger regeneration again (idempotent; picks up any
   registry additions made this round);
4. optionally the cross-SF scaling sweep (SCALING.md) with --scaling.

bench.py is left to its own invocation (the driver runs it per round;
run it manually for a committed refresh).

Usage: python scripts/round_end.py 8 [--scaling]
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    if len(sys.argv) < 2 or not sys.argv[1].isdigit():
        print(__doc__)
        return 2
    n = int(sys.argv[1])
    env = dict(os.environ)

    # Fold in any CORRECTNESS artifact that landed since the last regen
    # (the driver writes its file AFTER this script ran last round).
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "attestation.py")],
        check=True,
        cwd=ROOT,
    )

    raw = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "parity.py"), "--all"],
        capture_output=True,
        text=True,
        env=env,
        cwd=ROOT,
    )
    noise = re.compile(r"WARN|log4j|setLogLevel|NativeCodeLoader|^\[Stage")
    lines = []
    for line in (raw.stdout + raw.stderr).splitlines():
        last = line.split("\r")[-1].rstrip()
        # .strip(): progress-bar erase lines are spaces-only, not empty
        if last.strip() and not noise.search(last):
            lines.append(last)
    log = os.path.join(ROOT, f"PARITY_r{n:02d}.log")
    with open(log, "w") as f:
        f.write("\n".join(lines) + f"\nexit={raw.returncode}\n")
    print(f"wrote {log} (exit={raw.returncode})")
    if raw.returncode != 0:
        print("PARITY FAILED — fix before committing the log")
        return raw.returncode

    subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "attestation.py")],
        check=True,
        cwd=ROOT,
    )
    if "--scaling" in sys.argv:
        subprocess.run(
            [sys.executable, os.path.join(ROOT, "scripts", "scaling.py")],
            check=True,
            cwd=ROOT,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
