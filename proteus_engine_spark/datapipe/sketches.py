"""Frequency sketches: mergeable bounded-memory summaries for corpus
statistics that would otherwise need a full-cardinality shuffle — the
companion family to the built-in HLL++ distinct sketch
(agg_approx_distinct_bounds) and the approx-percentile tier.

Misra-Gries heavy hitters: k counters per partition, merged by count
summation — the mergeable-summaries result (Agarwal et al. 2012): a
merged MG sketch over N items undercounts any item by at most N/(k+1),
never overcounts, and every item with true frequency above N/(k+1) is
present. At 100 TB this replaces a vocabulary-cardinality groupBy with
a fixed k-row summary per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_heavy_hitters(
    df: DataFrame,
    item_col: str,
    k: int = 64,
) -> DataFrame:
    """Approximate heavy hitters over ``item_col``: per-partition
    Misra-Gries sketches (k counters each) merged by item-keyed count
    summation. Returns (item string, est long) — up to partitions·k rows
    before the caller's cut; estimates NEVER exceed the true count and
    undershoot by at most N/(k+1).

    The per-partition pass is BATCH-vectorized, not per-row: each Arrow
    batch reduces to a value_counts dict (C speed), merges into the
    running counter table, and a single decrement step (subtract the
    (k+1)-th largest, drop non-positives) restores the k-counter bound —
    counter-table-sized Python per batch, the mapInPandas discipline.
    Estimates depend on partition/batch order BY NATURE of the sketch;
    consumers verify against bounds, not values (the verdict-gate
    pattern of agg_approx_distinct_bounds).
    """
    if k < 1:
        raise ValueError("k must be >= 1")

    def sketch(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            counts = pdf[item_col].value_counts()
            for item, c in counts.items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k:
                # decrement by the (k+1)-th largest value: the batched
                # equivalent of repeated all-counter decrements — at most
                # k counters survive, and total decrement mass stays
                # bounded by the processed item count
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {i: c - cut for i, c in counters.items() if c - cut > 0}
        yield pd.DataFrame(
            {"item": list(counters.keys()), "est": list(counters.values())}
        )

    partials = df.select(F.col(item_col).cast("string").alias(item_col)).mapInPandas(
        sketch, "item string, est long"
    )
    return partials.groupBy("item").agg(F.sum("est").alias("est"))
