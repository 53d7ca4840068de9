#!/usr/bin/env python
"""Interleaved A/B: adaptive state partitioning ON (the r18 code path,
state_partitions_for) vs OFF (session-default 32 partitions — the r17
behavior), same session, alternating legs, median of N rounds.

Leg B (off) is produced by monkeypatching state_partitions_for to return
None in every module that binds it, so both legs run the IDENTICAL query
code otherwise.

Usage: python scripts/ab_stream_adaptive.py [rounds] [q1,q2,...]
"""
from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import proteus_engine_spark.queries.streaming_q as sq  # noqa: E402
import proteus_engine_spark.streaming.sources as src  # noqa: E402
from proteus_engine_spark.queries.registry import REGISTRY  # noqa: E402
from proteus_engine_spark.session import DEFAULT_SF_DIR, get_session  # noqa: E402

QUERIES = [
    "stream_session_windows_chained",
    "stream_delta_trigger_fires",
    "stream_tumble_agg",
    "stream_dedup_media_phash",
]

_REAL = src.state_partitions_for


def _off(*a, **k):
    return None


def set_mode(on: bool) -> None:
    fn = _REAL if on else _off
    src.state_partitions_for = fn
    sq.state_partitions_for = fn


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    queries = sys.argv[2].split(",") if len(sys.argv) > 2 else QUERIES
    spark = get_session(app_name="ab_stream_adaptive")
    samples: dict[tuple[str, str], list[float]] = {}
    probes = []
    for r in range(rounds + 1):  # round 0 discarded (warm-up)
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr("sum(id)").collect()
        probes.append(round(time.perf_counter() - t0, 4))
        for name in queries:
            fn = REGISTRY[name].fn
            for leg in ("adaptive", "default32"):
                set_mode(leg == "adaptive")
                t0 = time.perf_counter()
                n = fn(spark, DEFAULT_SF_DIR).count()
                dt = time.perf_counter() - t0
                set_mode(True)
                if r > 0:
                    samples.setdefault((name, leg), []).append(round(dt, 4))
                samples.setdefault((name, leg + "_rows"), []).append(float(n))
    out = {
        "probes_cpu": probes,
        "results": [
            {
                "query": q,
                "leg": leg,
                "median": round(statistics.median(v), 4),
                "samples": v,
            }
            for (q, leg), v in sorted(samples.items())
        ],
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
