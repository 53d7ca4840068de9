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


def misra_gries_grouped(
    df: DataFrame,
    item_col: str,
    group_col: str,
    k: int = 64,
) -> DataFrame:
    """PER-GROUP Misra-Gries heavy hitters — misra_gries_heavy_hitters
    under a grouping key (the per-source / per-language vocabulary-
    profile shape, the same grouped lift quantile_sketch_bounds_grouped
    gives the GK sketch): each partition keeps an INDEPENDENT k-counter
    sketch per group value, so the mergeable-summaries bound applies
    group-wise — after the count-summing merge, a group's estimate never
    exceeds its true count and undershoots by at most N_g/(k+1) for that
    group's own item total N_g, and every item above that threshold is
    present (Agarwal et al. 2012 applies per group because groups never
    share counters).

    Returns (group_col string, item string, est long) — at most
    partitions·k rows PER GROUP before the caller's cut.

    Scale shape: per-partition state is (groups seen in the partition)
    × k counters; the merge shuffles only those fixed-size partials
    keyed by (group, item) with map-side combine. For extreme group
    cardinality, pre-partitioning by the group column keeps each
    partition's group set — and therefore its sketch memory — small."""
    if k < 1:
        raise ValueError("k must be >= 1")

    def sketch(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            counts = pdf.groupby([group_col, item_col], sort=False).size()
            for (g, item), c in counts.items():
                d = counters.setdefault(g, {})
                d[item] = d.get(item, 0) + int(c)
            for g, d in list(counters.items()):
                if len(d) > k:
                    cut = sorted(d.values(), reverse=True)[k]
                    counters[g] = {
                        i: c - cut for i, c in d.items() if c - cut > 0
                    }
        rows = [
            (g, i, c) for g, d in counters.items() for i, c in d.items()
        ]
        yield pd.DataFrame(rows, columns=[group_col, "item", "est"])

    partials = df.select(
        F.col(group_col).cast("string").alias(group_col),
        F.col(item_col).cast("string").alias(item_col),
    ).mapInPandas(sketch, f"{group_col} string, item string, est long")
    return partials.groupBy(group_col, "item").agg(F.sum("est").alias("est"))


def _cm_buckets(item_col: str, depth: int, width: int) -> list:
    """The seeded (row, bucket) struct array shared by table build and
    probe — ONE definition, because estimates only probe the right cells
    if both sides derive identical buckets (the "SAME seeded hashes"
    invariant)."""
    return [
        F.struct(
            F.lit(i).alias("row"),
            F.pmod(F.xxhash64(F.col(item_col), F.lit(i)), F.lit(width)).alias(
                "bucket"
            ),
        )
        for i in range(depth)
    ]


def count_min_table(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-Min sketch as a PURE DataFrame aggregation — no Python in
    the data path at all: for each of ``depth`` seeded hash rows the
    item buckets via xxhash64(item, seed) mod width (JVM-side,
    whole-stage codegen), and the sketch table is one (row, bucket)
    count with map-side combine — at most depth·width rows regardless of
    corpus size, trivially mergeable across corpora by cell-wise sum.
    Returns (row int, bucket long, c long). The frequency companion to
    Misra-Gries with the OPPOSITE error side: CM never undercounts and
    overcounts by at most εN with ε = e/width at confidence 1-(1/e)^depth
    (Cormode & Muthukrishnan 2005)."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    rows = _cm_buckets(item_col, depth, width)
    return (
        df.select(F.explode(F.array(*rows)).alias("rb"))
        .select(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def quantile_sketch_bounds(
    df: DataFrame,
    value_col: str,
    qs: tuple[float, ...] = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99),
    accuracy: int = 1000,
) -> DataFrame:
    """Approximate quantiles with an analytic rank-error verdict — the
    quantile member of the sketch family next to HLL++ (distinct),
    Count-Min and Misra-Gries (frequency). Spark-first: the sketch is
    the BUILT-IN ``percentile_approx`` (ApproximatePercentile — the
    Greenwald-Khanna-family mergeable summary running JVM-side with
    map-side combine; a hand-rolled Python KLL would be strictly worse),
    so the engine's job is the verdict, not the sketch: for each q the
    estimate's exact rank window [count(v < est), count(v <= est)] must
    overlap round(q·n) ± (n/accuracy + 1) — ApproximatePercentile's
    published guarantee (rank error <= n/accuracy) plus one for target
    rounding. Returns (q_pct int, n long, target_rank long,
    within_bounds boolean) — one row per requested quantile.

    The estimate VALUE is partition-merge-order-dependent by nature, so
    consumers (and the oracle) verify the bound, never the value — the
    agg_approx_distinct_bounds discipline. Scale shape: two scans total
    (one for the sketch — a 1-row partial aggregate — and one for the
    conditional rank counts of all q estimates together, another 1-row
    aggregate below a broadcast of the first); zero row shuffles."""
    if accuracy < 1:
        raise ValueError("accuracy must be >= 1")
    vals = df.select(F.col(value_col).alias("v")).filter(F.col("v").isNotNull())
    sketch = vals.agg(
        F.percentile_approx(
            "v", F.array(*[F.lit(float(q)) for q in qs]), F.lit(accuracy)
        ).alias("ap"),
        F.count(F.lit(1)).alias("n"),
    )
    rank_aggs = []
    for i in range(len(qs)):
        est = F.col("ap")[i]
        rank_aggs += [
            F.sum(F.when(F.col("v") <= est, 1).otherwise(0)).alias(f"le_{i}"),
            F.sum(F.when(F.col("v") < est, 1).otherwise(0)).alias(f"lt_{i}"),
        ]
    ranks = vals.crossJoin(F.broadcast(sketch)).groupBy("n").agg(*rank_aggs)
    slack = F.expr(f"n div {accuracy}") + F.lit(1)
    per_q = [
        F.struct(
            F.lit(int(round(q * 100))).alias("q_pct"),
            F.round(F.lit(float(q)) * F.col("n")).cast("long").alias("target_rank"),
            (
                (F.col(f"le_{i}") >= F.round(F.lit(float(q)) * F.col("n")).cast("long") - slack)
                & (F.col(f"lt_{i}") <= F.round(F.lit(float(q)) * F.col("n")).cast("long") + slack)
            ).alias("within_bounds"),
        )
        for i, q in enumerate(qs)
    ]
    return (
        ranks.select(F.col("n"), F.explode(F.array(*per_q)).alias("r"))
        .select(
            F.col("r.q_pct").alias("q_pct"),
            F.col("n"),
            F.col("r.target_rank").alias("target_rank"),
            F.col("r.within_bounds").alias("within_bounds"),
        )
    )


def count_min_estimate(
    table: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates from a count_min_table: each query item
    re-derives its depth buckets with the SAME seeded hashes, joins the
    sketch table on (row, bucket), and takes the minimum cell — the CM
    estimate. Missing cells count 0 (an item hashing to an untouched
    cell has estimate 0 — correct: it never occurred). Returns
    (item_col, est long). The join is broadcast-friendly in both
    directions: the table is depth·width rows, the query set is
    typically small."""
    rows = _cm_buckets(item_col, depth, width)
    probes = items.select(
        F.col(item_col), F.explode(F.array(*rows)).alias("rb")
    ).select(item_col, F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(table), ["row", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
    )


def quantile_sketch_merge_bounds(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    qs: tuple[float, ...] = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99),
    accuracy: int = 1000,
    partitions_per_side: int = 4,
) -> DataFrame:
    """The MERGE proof for the quantile sketch's 100 TB partial-agg story:
    two DISJOINT slices are each repartitioned so their partitions never
    co-mingle, then unioned — union concatenates partitions, so the one
    aggregate that follows necessarily builds ``partitions_per_side``
    per-slice partial ``percentile_approx`` sketches PER SIDE and merges
    them across the slice boundary (ApproximatePercentile's merge path,
    the exact mechanism a 1000-executor aggregation relies on). The
    verdict then checks the MERGED estimates against the analytic rank
    bound over the union (quantile_sketch_bounds' discipline): a merge
    that lost or double-counted rows fails the bound.

    Output adds (n_left, n_right) so disjoint coverage is pinned:
    n == n_left + n_right. The per-side counts are two extra 1-row
    aggregate scans kept separate for verdict clarity; a production
    pipeline folds them into the rank scan with a side tag."""
    va = (
        df_a.select(F.col(value_col).alias("v"))
        .filter(F.col("v").isNotNull())
        .repartition(partitions_per_side)
    )
    vb = (
        df_b.select(F.col(value_col).alias("v"))
        .filter(F.col("v").isNotNull())
        .repartition(partitions_per_side)
    )
    base = quantile_sketch_bounds(va.union(vb), "v", qs, accuracy)
    na = va.agg(F.count(F.lit(1)).alias("n_left"))
    nb = vb.agg(F.count(F.lit(1)).alias("n_right"))
    return (
        base.crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .select("q_pct", "n", "n_left", "n_right", "target_rank", "within_bounds")
    )


def quantile_sketch_bounds_grouped(
    df: DataFrame,
    value_col: str,
    group_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.9),
    accuracy: int = 500,
) -> DataFrame:
    """PER-GROUP approximate quantiles with the analytic rank-error
    verdict — quantile_sketch_bounds applied under a grouping key (the
    shape every per-source / per-language corpus profile runs): one
    grouped ``percentile_approx`` aggregate builds an independent GK
    summary per group, the 1-row-per-group sketch frame broadcasts back
    over the values, and a second grouped aggregate computes each
    estimate's exact rank window [count(v < est), count(v <= est)]
    WITHIN its group — which must overlap round(q·n_g) ± (n_g div
    accuracy + 1), the per-group version of the published bound.

    Returns (group_col, q_pct int, n long, target_rank long,
    within_bounds boolean) — one row per (group, q); groups with no
    non-null values emit nothing (the empty-input convention).

    Scale shape: two grouped aggregates over the scan — both shuffle
    only per-partition partial states keyed by the group (map-side
    combine), and the sketch frame that joins back is group-cardinality
    sized, so the broadcast is as small as the group count, independent
    of corpus size."""
    if accuracy < 1:
        raise ValueError("accuracy must be >= 1")
    vals = (
        df.select(F.col(group_col).alias("__g__"), F.col(value_col).alias("v"))
        .filter(F.col("v").isNotNull())
    )
    sketch = vals.groupBy("__g__").agg(
        F.percentile_approx(
            "v", F.array(*[F.lit(float(q)) for q in qs]), F.lit(accuracy)
        ).alias("ap"),
        F.count(F.lit(1)).alias("n"),
    )
    joined = vals.join(F.broadcast(sketch), "__g__")
    rank_aggs = [F.first("n").alias("n")]
    for i in range(len(qs)):
        est = F.col("ap")[i]
        rank_aggs += [
            F.sum(F.when(F.col("v") <= est, 1).otherwise(0)).alias(f"le_{i}"),
            F.sum(F.when(F.col("v") < est, 1).otherwise(0)).alias(f"lt_{i}"),
        ]
    ranks = joined.groupBy("__g__").agg(*rank_aggs)
    slack = F.expr(f"n div {accuracy}") + F.lit(1)
    per_q = [
        F.struct(
            F.lit(int(round(q * 100))).alias("q_pct"),
            F.round(F.lit(float(q)) * F.col("n")).cast("long").alias("target_rank"),
            (
                (F.col(f"le_{i}") >= F.round(F.lit(float(q)) * F.col("n")).cast("long") - slack)
                & (F.col(f"lt_{i}") <= F.round(F.lit(float(q)) * F.col("n")).cast("long") + slack)
            ).alias("within_bounds"),
        )
        for i, q in enumerate(qs)
    ]
    return (
        ranks.select("__g__", F.col("n"), F.explode(F.array(*per_q)).alias("r"))
        .select(
            F.col("__g__").alias(group_col),
            F.col("r.q_pct").alias("q_pct"),
            F.col("n"),
            F.col("r.target_rank").alias("target_rank"),
            F.col("r.within_bounds").alias("within_bounds"),
        )
    )
