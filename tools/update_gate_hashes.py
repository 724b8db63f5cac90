#!/usr/bin/env python3
"""Refresh tests/gate_hashes.json — the driver-gate re-entry pin.

Usage:
    python tools/update_gate_hashes.py --round N [--sf-dir DIR]

Policy enforcement (VERDICT.md round 3, item 1): for every query whose
recorded hash CHANGED and which is NOT in DRIVER_GATE this round, the
refresh re-runs the local oracle (tools/check.py machinery) on that
query first and refuses the new pin unless it is green — so a changed
builder can only leave the gate's purview with fresh correctness
evidence, never silently. Gate members refresh unconditionally (the
driver is about to prove them this round).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.gate_hash import HASH_FILE, current_hashes, recorded  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from cvemate_spark.queries import DRIVER_GATE

    cur = current_hashes()
    rec = recorded().get("hashes", {})
    gate = set(DRIVER_GATE)
    changed_outside_gate = sorted(
        n for n in cur if n in rec and rec[n] != cur[n] and n not in gate
    )
    if changed_outside_gate:
        print(
            f"changed outside gate -> re-proving locally first: {changed_outside_gate}"
        )
        r = subprocess.run(
            [sys.executable, str(REPO / "tools" / "check.py"), args.sf_dir]
            + changed_outside_gate,
            capture_output=True,
            text=True,
        )
        tail = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        print(tail)
        if r.returncode != 0 or " 0 bad" not in tail:
            print("REFUSED: local oracle not green for changed queries", file=sys.stderr)
            return 1
    HASH_FILE.write_text(
        json.dumps({"round": args.round, "hashes": cur}, indent=1, sort_keys=True)
        + "\n"
    )
    print(f"pinned {len(cur)} hashes at round {args.round} -> {HASH_FILE}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
