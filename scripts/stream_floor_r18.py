#!/usr/bin/env python
"""Streaming floor decomposition at the r18 adaptive partition count
(the r17 E4 experiment re-run at 8 state partitions): passthrough
(source+sink machinery), native windowed agg (state-store floor),
trivial applyInPandasWithState (Python-stateful floor), and the real
delta-trigger gate — interleaved, one session.

If gate ~= trivial-stateful floor, the residual is the
applyInPandasWithState machinery itself, not the trigger logic — the
irreducibility evidence VERDICT r17 item 1 asks for.

Usage: python scripts/stream_floor_r18.py [rounds]
"""
from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: E402

from proteus_engine_spark.queries.registry import REGISTRY  # noqa: E402
from proteus_engine_spark.session import DEFAULT_SF_DIR, get_session  # noqa: E402
from proteus_engine_spark.streaming.sources import (  # noqa: E402
    events_stream,
    run_to_completion,
)

PARTS = 8


def passthrough(spark):
    ev = events_stream(spark, DEFAULT_SF_DIR).select("event_id")
    return run_to_completion(ev, "floor_pass", "append", state_partitions=PARTS)


def native_agg(spark):
    ev = events_stream(spark, DEFAULT_SF_DIR)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return run_to_completion(agg, "floor_native", "update", state_partitions=PARTS)


def trivial_stateful(spark):
    ev = events_stream(spark, DEFAULT_SF_DIR)

    def fn(key, pdfs, state):
        n = sum(len(p) for p in pdfs)
        prev = state.get[0] if state.exists else 0
        state.update((prev + n,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [prev + n]})

    out = (
        ev.select("user_id", "ts", "event_id", "value")
        .withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, "user_id long, n long", "n long", "update",
            GroupStateTimeout.NoTimeout,
        )
    )
    return run_to_completion(out, "floor_trivial", "update", state_partitions=PARTS)


def delta_gate(spark):
    return REGISTRY["stream_delta_trigger_fires"].fn(spark, DEFAULT_SF_DIR)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_session(app_name="stream_floor_r18")
    legs = [
        ("passthrough", passthrough),
        ("native_agg", native_agg),
        ("trivial_stateful", trivial_stateful),
        ("delta_gate", delta_gate),
    ]
    samples: dict[str, list[float]] = {}
    probes = []
    for r in range(rounds + 1):
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr("sum(id)").collect()
        probes.append(round(time.perf_counter() - t0, 4))
        for name, fn in legs:
            t0 = time.perf_counter()
            fn(spark).count()
            dt = time.perf_counter() - t0
            if r > 0:
                samples.setdefault(name, []).append(round(dt, 4))
    print(
        json.dumps(
            {
                "state_partitions": PARTS,
                "probes_cpu": probes,
                "medians": {k: round(statistics.median(v), 4) for k, v in samples.items()},
                "samples": samples,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
