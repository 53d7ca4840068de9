#!/usr/bin/env python
"""Registry-wide base-table scan-count audit (r17 optimization round).

For EVERY registered gate, build the query frame at $PROTEUS_GATE_SF_DIR
(default sf0.01) and count, in the formatted physical plan:

- how many times each base parquet table is scanned,
- how many `Scan ExistingRDD` nodes appear (localCheckpoint pins),
- how many Exchange / ReusedExchange nodes the plan holds.

A table scanned >= 2x is either a declared multi-pass algorithm
(self-join, train/eval split, two-phase rank) or a repeated-subplan
defect of the kind E11/E14/E16 fixed (one logical pass executing as
several corpus scans because Spark materializes no common subplans).
The JSON output is the worklist for adjudicating every flag one way or
the other; the adjudications live in OPTIMIZATION_r17.md.

Build-time eager actions (checkpoints, collected broadcasts) execute as
part of fn() — their scans do NOT appear in the final plan, so the
counts here are the *per-action* residual scans, a lower bound on total
passes; builder-side passes are audited separately (E6/E7 instrumented
them driver-side).

Usage: python scripts/scan_audit.py [out.json] [name1,name2,...]
"""

from __future__ import annotations

import json
import os
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("PROTEUS_GATE_SF_DIR", "/root/testdata/sf0.01")

_SCAN_RE = re.compile(r"Location: \S+ \[[^\]]*?([a-z_0-9]+)\.parquet\]")


def main() -> None:
    out_path = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "plans" / "r17" / "scan_audit.json"
    from proteus_engine_spark.queries.registry import REGISTRY
    from proteus_engine_spark.session import get_session

    names = list(REGISTRY)
    if len(sys.argv) > 2:
        names = [n.strip() for n in sys.argv[2].split(",") if n.strip()]

    spark = get_session(app_name="proteus-scan-audit")
    report: dict[str, dict] = {}
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # keep going; a failure is itself a finding
            report[name] = {"error": repr(e)}
            print(f"ERROR {name}: {e!r}", file=sys.stderr)
            continue
        tables: dict[str, int] = {}
        for m in _SCAN_RE.finditer(plan):
            t = m.group(1).rsplit("/", 1)[-1]
            tables[t] = tables.get(t, 0) + 1
        entry = {
            "scans": tables,
            "rdd_scans": plan.count("Scan ExistingRDD"),
            "exchanges": len(re.findall(r"\bExchange\b", plan)),
            "reused_exchanges": len(re.findall(r"\bReusedExchange\b", plan)),
            "max_table_scans": max(tables.values(), default=0),
            # Python-boundary and join-shape census (guide §3/§4): each
            # node is one JVM<->Python crossing / join strategy instance
            # in the final plan.
            "arrow_eval": plan.count("ArrowEvalPython"),
            "batch_eval": plan.count("BatchEvalPython"),
            "map_in_pandas": plan.count("MapInPandas"),
            "flatmap_groups": plan.count("FlatMapGroupsInPandas"),
            "cartesian": plan.count("CartesianProduct"),
            "smj": plan.count("SortMergeJoin"),
            "bnl": plan.count("BroadcastNestedLoopJoin"),
        }
        report[name] = entry
        flag = " <== MULTI-SCAN" if entry["max_table_scans"] >= 2 else ""
        print(f"{name}: {tables} rdd={entry['rdd_scans']}{flag}")
    spark.stop()

    multi = {
        n: e for n, e in report.items() if e.get("max_table_scans", 0) >= 2
    }
    out_path.write_text(json.dumps(report, indent=1, sort_keys=True))
    print(f"\n{len(report)} gates audited, {len(multi)} with a table scanned >=2x:")
    for n in sorted(multi):
        print(f"  {n}: {multi[n]['scans']}")


if __name__ == "__main__":
    main()
