#!/usr/bin/env python
"""Interleaved A/B: minhash signature computation via groupBy-aggregate
(current: explode shingles -> 64 codegen'd min aggregates -> Exchange of
(doc_id, 64x8B minima)) vs per-row higher-order functions (candidate:
array_min(transform(...)) per permutation -- ZERO exchange for the
signature step, guide §2.4, VERDICT r17 item 5).

The HOF variant computes the same minima per doc from the same distinct
shingle set, so results are identical; the question is whether the
interpreted higher-order lambdas (no whole-stage codegen) cost more CPU
locally than the removed exchange + final-agg save.

Usage: python scripts/ab_minhash_hof.py [rounds]
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

import proteus_engine_spark.datapipe.dedup as dd  # noqa: E402
from proteus_engine_spark.queries.registry import REGISTRY  # noqa: E402
from proteus_engine_spark.session import DEFAULT_SF_DIR, get_session  # noqa: E402

_REAL = dd._minhash_columns


def _minhash_columns_hof(docs, id_col="doc_id", text_col="text", num_perm=64, shingle_k=3):
    from proteus_engine_spark.operators.partitioning import widen_if_narrow

    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    base = widen_if_narrow(docs.select(id_col, text_col), n_parts, id_col)
    # one shingle-hash array per doc; CollapseProject will not inline a
    # non-cheap alias referenced 64 times, so __hs__ computes once
    hs = base.select(
        id_col,
        F.transform(
            dd.shingle_array(text_col, k=shingle_k), lambda s: F.xxhash64(s)
        ).alias("__hs__"),
    )
    def _perm(p):
        # NB: a `lambda x, p=p:` here would have arity 2 and PySpark would
        # bind the second parameter to the ARRAY INDEX — closure instead
        return lambda x: F.xxhash64(x, F.lit(p))

    mins = [
        F.array_min(F.transform(F.col("__hs__"), _perm(p))).alias(f"mh_{p}")
        for p in range(num_perm)
    ]
    return hs.select(F.col(id_col), *mins)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_session(app_name="ab_minhash_hof")
    fn = REGISTRY["dedup_minhash_lsh"].fn
    samples: dict[str, list[float]] = {}
    rowcounts: dict[str, int] = {}
    probes = []
    for r in range(rounds + 1):
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr("sum(id)").collect()
        probes.append(round(time.perf_counter() - t0, 4))
        for leg in ("agg", "hof"):
            dd._minhash_columns = _REAL if leg == "agg" else _minhash_columns_hof
            try:
                t0 = time.perf_counter()
                n = fn(spark, DEFAULT_SF_DIR).count()
                dt = time.perf_counter() - t0
            finally:
                dd._minhash_columns = _REAL
            rowcounts[leg] = n
            if r > 0:
                samples.setdefault(leg, []).append(round(dt, 4))
    print(
        json.dumps(
            {
                "probes_cpu": probes,
                "rows": rowcounts,
                "medians": {k: round(statistics.median(v), 4) for k, v in samples.items()},
                "samples": samples,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
