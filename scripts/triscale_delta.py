#!/usr/bin/env python
"""Tri-scale delta record: run the round's changed/new queries through the
local gate replica (scripts/gatecheck.py) at all three driver SFs and
write scripts/triscale/r{N}_delta.json in the established format
({query: {"sf0.001": entry, "sf0.01": entry, "sf0.1": entry}}).

Usage: python scripts/triscale_delta.py r12_delta q1,q2,...

Each SF runs in its own subprocess (gatecheck owns the SparkSession and
the sf0.1 oracle-cost overrides); results are snapshotted from
gatecheck_local.json between runs, before the next SF's merge replaces
the same-name entries.
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
    if len(sys.argv) != 3:
        sys.exit("usage: triscale_delta.py <record-name> <q1,q2,...>")
    record_name, qarg = sys.argv[1], sys.argv[2]
    names = [n.strip() for n in qarg.split(",") if n.strip()]
    # merge into an existing record of the same name (same discipline as
    # gatecheck_local.json: partial runs must not discard prior coverage)
    dest = REPO / "scripts" / "triscale" / f"{record_name}.json"
    out: dict[str, dict] = {}
    if dest.exists():
        out = json.loads(dest.read_text())
    for n in names:
        out[n] = {}
    ok = True
    for sf_dir in SFS:
        sf_key = "sf" + sf_dir.rstrip("/").split("sf")[-1]
        env = dict(os.environ, PROTEUS_GATE_SF_DIR=sf_dir)
        r = subprocess.run(
            [sys.executable, str(REPO / "scripts" / "gatecheck.py"), qarg],
            env=env, cwd=REPO, capture_output=True, text=True,
        )
        print(f"--- {sf_key} (exit {r.returncode}) ---")
        print("\n".join(
            line for line in r.stdout.splitlines() if line.lstrip().startswith(("✓", "✗"))
        ))
        ok = ok and r.returncode == 0
        snap = json.loads((REPO / "gatecheck_local.json").read_text())
        for n in names:
            entry = snap.get(n, {"err": "missing from gatecheck output"})
            # gatecheck_local.json is a committed, merged file: if the
            # subprocess died before its final write, snap still holds a
            # PRIOR run's entry. Two provenance checks keep a stale record
            # — green OR error — from being recorded as this SF's result:
            # the entry's sf_dir stamp must match, AND this subprocess's
            # own stdout must show it actually ran the query (guards
            # same-SF staleness). Error entries are checked too: a stale
            # error left by a run at another SF must not be mislabeled as
            # this scale's failure.
            ran_now = f" {n} " in r.stdout or f" {n}:" in r.stdout
            if entry.pop("sf_dir", None) != sf_dir or not ran_now:
                entry = {"err": f"no fresh gatecheck entry for {sf_key} "
                                "(stale record from another SF/run)"}
                ok = False
            out[n][sf_key] = entry
    dest.write_text(json.dumps(out, indent=1))
    n_ok = sum(1 for n in names for s in out[n].values() if s.get("ok"))
    print(f"{n_ok}/{len(names) * len(SFS)} ok -> {dest} ({len(out)} queries in record)")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
