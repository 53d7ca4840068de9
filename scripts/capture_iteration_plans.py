#!/usr/bin/env python
"""Capture the PER-ITERATION physical plans of checkpoint-stepped
queries (pagerank etc.): hooks DataFrame.localCheckpoint to dump each
frame's formatted plan right before it materializes, then runs the gate.

Usage: python scripts/capture_iteration_plans.py <suffix> <query> [out_dir]
Writes plans/<round>/<query>_iter<N>_<suffix>.txt
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1]
    name = sys.argv[2]
    out_dir = REPO / "plans" / os.environ.get("PROTEUS_PLANS_ROUND", "r18")
    out_dir.mkdir(parents=True, exist_ok=True)

    # pyspark 4: the classic implementation class overrides the abstract
    # pyspark.sql.DataFrame methods — patch the class actually dispatched
    from pyspark.sql.classic.dataframe import DataFrame

    from proteus_engine_spark.queries.registry import REGISTRY
    from proteus_engine_spark.session import get_session

    spark = get_session(app_name="proteus-iter-plan-capture")
    real = DataFrame.localCheckpoint
    counter = {"n": 0}

    def hooked(self, eager=True):
        i = counter["n"]
        counter["n"] += 1
        try:
            plan = self._sc._jvm.PythonSQLUtils.explainString(
                self._jdf.queryExecution(), "formatted"
            )
        except Exception as e:
            plan = f"EXPLAIN FAILED: {e!r}"
        (out_dir / f"{name}_iter{i:02d}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_iter{i:02d}_{suffix}.txt ({len(plan)} chars)")
        return real(self, eager=eager)

    DataFrame.localCheckpoint = hooked
    try:
        df = REGISTRY[name].fn(spark, SF_DIR)
        n = df.count()
        print(f"{name}: {n} rows, {counter['n']} checkpoints")
    finally:
        DataFrame.localCheckpoint = real
    spark.stop()


if __name__ == "__main__":
    main()
