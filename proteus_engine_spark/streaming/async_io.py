"""Async I/O enrichment (AsyncDataStream parity).

Reference: AsyncDataStream.orderedWait/unorderedWait
(/root/reference/flink-streaming-java/src/main/java/org/apache/flink/
streaming/api/datastream/AsyncDataStream.java:103,148) — per-record async
requests against an external service with bounded in-flight capacity,
results re-emitted in arrival order (ordered) or completion order
(unordered).

Spark-first shape: external lookups belong in `mapInPandas` — one Arrow
batch at a time crosses into Python, and the lookups for that batch run
concurrently on a thread pool (capacity = the reference's in-flight bound).
`ordered=True` re-emits in input order (orderedWait); `ordered=False`
yields results as they complete within the batch (unorderedWait — note
Spark still preserves batch boundaries, so disorder is bounded by the
batch, strictly stronger than the reference's contract). Each partition
opens its own pool — the RichAsyncFunction open()/close() lifecycle — so
connection reuse amortizes across batches.

At scale: the pattern keeps the driver out of the loop entirely and bounds
memory to (arrow batch size × capacity). For idempotent lookups this is
exactly-once under retry like any deterministic map.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from concurrent.futures import ThreadPoolExecutor
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame


def async_enrich(
    df: DataFrame,
    lookup: Callable[[dict[str, Any]], dict[str, Any]],
    out_schema: str,
    capacity: int = 32,
    ordered: bool = True,
) -> DataFrame:
    """Enrich each row with the result of an (I/O-bound) lookup callable.

    ``lookup`` receives the row as a dict and returns a dict of new/updated
    columns; it must be picklable and thread-safe. ``capacity`` bounds
    concurrent in-flight lookups per partition (AsyncDataStream's
    capacity). ``out_schema`` is the full output schema DDL.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with ThreadPoolExecutor(max_workers=capacity) as pool:
            for pdf in batches:
                rows = pdf.to_dict("records")
                if ordered:
                    pairs = zip(rows, pool.map(lookup, rows))
                else:
                    from concurrent.futures import as_completed

                    futs = {pool.submit(lookup, r): r for r in rows}
                    pairs = ((futs[f], f.result()) for f in as_completed(futs))
                out = []
                for base, extra in pairs:
                    merged = dict(base)
                    merged.update(extra)
                    out.append(merged)
                yield pd.DataFrame(out)

    return df.mapInPandas(run, out_schema)
