#!/usr/bin/env python
"""StreamingQueryProgress decomposition for the state-partition change
(VERDICT r17 item 1 'Done' evidence): run stream_delta_trigger_fires' and
stream_session_windows_chained's pipelines at N state partitions, capture
per-batch durationMs (addBatch/commitOffsets/...) and stateOperators
commitTimeMs, one session, interleaved.

Usage: python scripts/stream_progress_trace.py [out.json]
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from proteus_engine_spark.session import DEFAULT_SF_DIR, get_session  # noqa: E402
from proteus_engine_spark.streaming.sources import (  # noqa: E402
    events_stream,
    run_to_completion_observed,
)


def delta_pipeline(spark):
    from proteus_engine_spark.streaming.triggers import DeltaTrigger, triggered_window_agg

    ev = events_stream(spark, DEFAULT_SF_DIR)
    return triggered_window_agg(
        ev, "user_id", "ts", "value",
        trigger=DeltaTrigger(50.005), window_ms=None,
        watermark_delay="10 minutes",
    )


def chained_pipeline(spark):
    from proteus_engine_spark.streaming.windows import chained_window_sessions

    ev = events_stream(spark, DEFAULT_SF_DIR)
    return chained_window_sessions(
        ev, "user_id", "ts",
        watermark="10 minutes", bucket="1 hour", gap="90 minutes",
        bucket_aggs=[F.count(F.lit(1)).alias("n")],
        session_aggs=[F.sum("n").alias("n_events"), F.count(F.lit(1)).alias("n_buckets")],
    )


def summarize(progress):
    out = []
    for pr in progress:
        p = pr if isinstance(pr, dict) else json.loads(pr.json)
        out.append(
            {
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows"),
                "durationMs": p.get("durationMs"),
                "state": [
                    {
                        k: so.get(k)
                        for k in (
                            "operatorName", "commitTimeMs", "numRowsTotal",
                            "numRowsUpdated", "numShufflePartitions",
                            "numStateStoreInstances",
                        )
                    }
                    for so in p.get("stateOperators", [])
                ],
            }
        )
    return out


def main() -> None:
    out_path = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "plans/r18/stream_progress_trace.json"
    spark = get_session(app_name="stream_progress_trace")
    report = {}
    for qname, builder in (("delta_trigger", delta_pipeline), ("chained_sessions", chained_pipeline)):
        for parts in (32, 8):
            # warm-up + measured run
            for tag in ("warm", "run"):
                t0 = time.perf_counter()
                _, progress = run_to_completion_observed(
                    builder(spark), f"trace_{qname}_{parts}_{tag}", "append",
                    state_partitions=parts,
                )
                dt = round(time.perf_counter() - t0, 4)
            report[f"{qname}@{parts}"] = {
                "wall_sec": dt,
                "batches": summarize(progress),
            }
            print(f"{qname}@{parts}: {dt}s, {len(progress)} batches")
    out_path.write_text(json.dumps(report, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
