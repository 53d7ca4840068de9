#!/usr/bin/env python
"""Interleaved A/B: r18 page_rank (od attached once, nonsink derived from
the contribution frame) vs the r17 implementation (per-iteration outd
joins + scores⋈outd nonsink), same session. The r17 body is inlined below
verbatim from git HEAD~ so both legs run in one process.

Usage: python scripts/ab_pagerank.py [rounds]
"""
from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from proteus_engine_spark.graph.library import _vertices, page_rank  # noqa: E402
from proteus_engine_spark.queries.graph_q import _cust_part_edges  # noqa: E402
from proteus_engine_spark.session import DEFAULT_SF_DIR, get_session  # noqa: E402


def page_rank_r17(edges, damping=0.85, iterations=10, src="src", dst="dst"):
    edges = edges.select(src, dst).localCheckpoint(eager=True)
    verts = _vertices(edges, src, dst).localCheckpoint(eager=True)
    n = verts.count()
    outd = edges.groupBy(F.col(src).alias("vertex")).agg(
        F.count(F.lit(1)).alias("od")
    ).localCheckpoint(eager=True)
    scores = verts.withColumn("score", F.lit(1.0 / n))
    for _ in range(iterations):
        nonsink = scores.join(outd, "vertex").agg(
            F.coalesce(F.sum("score"), F.lit(0.0)).alias("__ns__")
        )
        contrib = (
            edges.select(F.col(src).alias("vertex"), F.col(dst).alias("to"))
            .join(scores, "vertex")
            .join(outd, "vertex")
            .groupBy(F.col("to").alias("vertex"))
            .agg(F.sum(F.col("score") / F.col("od")).alias("contrib"))
        )
        base = (
            F.lit(1.0 - damping) + F.lit(damping) * (F.lit(1.0) - F.col("__ns__"))
        ) / n
        scores = (
            verts.join(contrib, "vertex", "left")
            .crossJoin(F.broadcast(nonsink))
            .select(
                "vertex",
                (base + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))).alias("score"),
            )
            .localCheckpoint(eager=True)
        )
    return scores


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_session(app_name="ab_pagerank")
    samples: dict[str, list[float]] = {}
    probes = []
    sums = {}
    for r in range(rounds + 1):
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr("sum(id)").collect()
        probes.append(round(time.perf_counter() - t0, 4))
        for leg, fn in (("r18", page_rank), ("r17", page_rank_r17)):
            t0 = time.perf_counter()
            out = fn(_cust_part_edges(spark, DEFAULT_SF_DIR), damping=0.85, iterations=3)
            s = out.agg(F.sum(F.round("score", 6))).collect()[0][0]
            dt = time.perf_counter() - t0
            sums[leg] = s
            if r > 0:
                samples.setdefault(leg, []).append(round(dt, 4))
    print(
        json.dumps(
            {
                "probes_cpu": probes,
                "score_sums_6dp": sums,
                "medians": {k: round(statistics.median(v), 4) for k, v in samples.items()},
                "samples": samples,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
