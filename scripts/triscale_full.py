#!/usr/bin/env python
"""Full tri-scale refresh (r13 verdict item 6): run the ENTIRE registry
through the local gate replica (scripts/gatecheck.py) at all three driver
SFs and rewrite scripts/triscale/sf0_{001,01,1}.json — the per-SF records
whose last full sweep (r10) covered 181 of what is now 257 queries. The
per-round delta discipline (triscale_delta.py) stays in force for future
rounds; this script exists for full-registry refreshes.

Usage: python scripts/triscale_full.py

Each SF runs in its own subprocess (gatecheck owns the SparkSession and
the sf0.1 oracle-cost overrides); the full per-SF result map is
snapshotted from gatecheck_local.json after each leg.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    ok = True
    for sf_dir in SFS:
        sf_tag = "sf" + sf_dir.rstrip("/").split("sf")[-1].replace(".", "_")
        env = dict(os.environ, PROTEUS_GATE_SF_DIR=sf_dir)
        r = subprocess.run(
            [sys.executable, str(REPO / "scripts" / "gatecheck.py"), "999"],
            env=env, cwd=REPO, capture_output=True, text=True,
        )
        lines = r.stdout.splitlines()
        bad = [ln for ln in lines if ln.lstrip().startswith("✗")]
        print(f"--- {sf_tag} (exit {r.returncode}, {len(bad)} failures) ---")
        for ln in bad:
            print(ln)
        print(lines[-1] if lines else "(no output)")
        snap = json.loads((REPO / "gatecheck_local.json").read_text())
        dest = REPO / "scripts" / "triscale" / f"{sf_tag}.json"
        dest.write_text(json.dumps(snap, indent=1, default=str))
        print(f"wrote {dest} ({len(snap)} entries)")
        ok = ok and r.returncode == 0 and not bad
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
