#!/usr/bin/env python
"""Compare two bench.py JSON outputs (A/B of two code states run
back-to-back on the same machine): per-query ratios on the common
subset, calibration probes, and the common-subset total. Accepts either
raw bench.py stdout (one JSON line, possibly after warnings) or a
driver BENCH_r*.json wrapper (with a "parsed" field). Usage:

    python scripts/bench_ab_compare.py A.json B.json [label_a label_b]
"""

from __future__ import annotations

import json
import sys

PROBES = ("calibration_sec", "calibration_io_sec", "calibration_shuffle_sec")


def load(path: str) -> dict:
    with open(path) as f:
        text = f.read()
    try:
        d = json.loads(text)
        if "parsed" in d and isinstance(d["parsed"], dict):
            return d["parsed"]
        if "queries" in d:
            return d
    except json.JSONDecodeError:
        pass
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)
    raise SystemExit(f"no bench JSON found in {path}")


def main() -> None:
    a, b = load(sys.argv[1]), load(sys.argv[2])
    la = sys.argv[3] if len(sys.argv) > 3 else "A"
    lb = sys.argv[4] if len(sys.argv) > 4 else "B"
    qa, qb = a["queries"], b["queries"]
    # drop zero-timed A-leg rows (sub-ms artifacts) so ratios stay finite
    common = [q for q in qa if q in qb and qa[q] > 0]
    if not common:
        raise SystemExit("no common queries with nonzero A-leg timings")
    ta = sum(qa[q] for q in common)
    tb = sum(qb[q] for q in common)
    print(f"common subset ({len(common)} queries): "
          f"{la} {ta:.2f}s  {lb} {tb:.2f}s  ratio {tb / ta:.3f}")
    for probe in PROBES:
        if probe in a and probe in b and a[probe] > 0:
            print(f"{probe}: {la} {a[probe]:.3f}  {lb} {b[probe]:.3f}  "
                  f"ratio {b[probe] / a[probe]:.3f}")
    rows = sorted(common, key=lambda q: qb[q] / qa[q])
    print(f"\nqueries at ratio <=0.87 / >=1.15 (or watched):")
    print(f"{'query':38s} {la:>8s} {lb:>8s}  ratio")
    for q in rows:
        r = qb[q] / qa[q]
        if r <= 0.87 or r >= 1.15 or q == "text_bm25_topk":
            print(f"{q:38s} {qa[q]:8.3f} {qb[q]:8.3f}  {r:.3f}")


if __name__ == "__main__":
    main()
