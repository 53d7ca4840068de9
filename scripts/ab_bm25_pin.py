#!/usr/bin/env python
"""Interleaved A/B: r18 bm25_topk (candidate-postings tf pinned) vs r17
(lazy tf, runtime reuse misses in the hybrid gate). Leg B swaps
textstats.bm25_topk for the r17 body inlined below; the gates bind it by
function-local import, so the patch takes effect per leg.

Usage: python scripts/ab_bm25_pin.py [rounds]
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

import proteus_engine_spark.datapipe.textstats as ts  # noqa: E402
from proteus_engine_spark.queries.registry import REGISTRY  # noqa: E402
from proteus_engine_spark.session import DEFAULT_SF_DIR, get_session  # noqa: E402

_NEW = ts.bm25_topk


def bm25_topk_r17(docs, queries=None, id_col="doc_id", text_col="text",
                  k1=1.2, b=0.75, k=10, num_docs=None, query_terms=None,
                  doc_lengths=None):
    from pyspark.sql.window import Window

    spark = docs.sparkSession
    if (queries is None) == (query_terms is None):
        raise ValueError("pass exactly one of queries / query_terms")
    if query_terms is not None:
        qdf = query_terms
    else:
        qrows = []
        for qid, qtext in enumerate(queries):
            terms = [t for t in qtext.lower().split() if t]
            for t in terms:
                qrows.append((qid, t))
        qdf = (
            spark.createDataFrame(qrows, "query_id long, term string")
            .groupBy("query_id", "term")
            .agg(F.count(F.lit(1)).alias("qtf"))
        )
    toks = docs.select(F.col(id_col), F.explode(ts._tokens(text_col)).alias("term"))
    if doc_lengths is not None:
        dl = doc_lengths.select(F.col(id_col), F.col("dl").cast("long"))
    else:
        dl = docs.select(F.col(id_col), ts.token_count(text_col).cast("long").alias("dl"))
    if num_docs is not None:
        n_df = spark.range(1).select(F.lit(int(num_docs)).alias("n_docs"))
    else:
        n_df = dl.agg(F.count(F.lit(1)).alias("n_docs"))
    avg_df = dl.agg(F.avg("dl").alias("avgdl"))
    qterms = F.broadcast(qdf.select("term").distinct())
    tf = (
        toks.join(qterms, "term")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.when(F.col("tf") >= 1, 1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qdf), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(n_df))
        .crossJoin(F.broadcast(avg_df))
        .select(
            "query_id",
            id_col,
            (
                F.col("qtf")
                * F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * (F.col("tf") * (k1 + 1.0))
                / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
            ).alias("part"),
        )
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("part"), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("query_id", id_col, "score", "rk")
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_session(app_name="ab_bm25_pin")
    samples: dict[tuple[str, str], list[float]] = {}
    rows = {}
    probes = []
    for r in range(rounds + 1):
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr("sum(id)").collect()
        probes.append(round(time.perf_counter() - t0, 4))
        for name in ("sim_hybrid_rrf", "text_bm25_topk"):
            for leg, impl in (("pinned", _NEW), ("r17", bm25_topk_r17)):
                ts.bm25_topk = impl
                try:
                    t0 = time.perf_counter()
                    n = REGISTRY[name].fn(spark, DEFAULT_SF_DIR).count()
                    dt = time.perf_counter() - t0
                finally:
                    ts.bm25_topk = _NEW
                rows[(name, leg)] = n
                if r > 0:
                    samples.setdefault((name, leg), []).append(round(dt, 4))
    print(json.dumps({
        "probes_cpu": probes,
        "rows": {f"{q}/{leg}": v for (q, leg), v in rows.items()},
        "medians": {f"{q}/{leg}": round(statistics.median(v), 4) for (q, leg), v in samples.items()},
        "samples": {f"{q}/{leg}": v for (q, leg), v in samples.items()},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
