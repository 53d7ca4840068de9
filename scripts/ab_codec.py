#!/usr/bin/env python
"""Shuffle-codec A/B (VERDICT r18 item 7, guide §2.3/§9): lz4 (default)
vs zstd on the two biggest shufflers. spark.io.compression.codec is fixed
at SparkContext start, so each invocation runs ONE leg; the shell loop
alternates legs across processes and each leg records the cpu+shuffle
calibration probes so cross-process drift is attributable.

Usage: python scripts/ab_codec.py <lz4|zstd>   (one JSON line per run)
Loop:  for i in 1 2 3 4 5 6; do for c in lz4 zstd; do python scripts/ab_codec.py $c; done; done
"""
from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from proteus_engine_spark.queries.registry import REGISTRY  # noqa: E402
from proteus_engine_spark.session import DEFAULT_SF_DIR, get_session  # noqa: E402

QUERIES = ["dedup_minhash_lsh", "corpus_shuffle_order"]


def main() -> None:
    codec = sys.argv[1]
    spark = get_session(
        app_name=f"ab_codec_{codec}",
        extra_conf={"spark.io.compression.codec": codec},
    )
    t0 = time.perf_counter()
    spark.range(200_000_000).selectExpr("sum(id)").collect()
    probe_cpu = round(time.perf_counter() - t0, 4)
    shuffle_src = (
        spark.range(20_000_000)
        .selectExpr("id % 1000000 AS k", "id % 97 AS v")
        .repartition(32)
        .persist()
    )
    shuffle_src.count()
    t0 = time.perf_counter()
    (
        shuffle_src.groupBy("k").sum("v")
        .join(shuffle_src.hint("merge"), "k")
        .selectExpr("sum(`sum(v)` + v)")
        .collect()
    )
    probe_shuffle = round(time.perf_counter() - t0, 4)
    shuffle_src.unpersist()

    timings = {}
    for name in QUERIES:
        fn = REGISTRY[name].fn
        fn(spark, DEFAULT_SF_DIR).count()  # warm
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, DEFAULT_SF_DIR).count()
            runs.append(round(time.perf_counter() - t0, 4))
        timings[name] = {"median": round(statistics.median(runs), 4), "runs": runs}
    print(
        json.dumps(
            {
                "codec": codec,
                "probe_cpu": probe_cpu,
                "probe_shuffle": probe_shuffle,
                "timings": timings,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
