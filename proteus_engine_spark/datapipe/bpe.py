"""BPE tokenizer training (Sennrich et al. 2016) — the tokenizer-prep
step of a training-data pipeline, Spark-first.

Scale shape: the corpus is touched EXACTLY ONCE (the word-count
aggregation); every merge iteration then runs over the VOCABULARY-sized
symbol table — pair counts are weighted by word frequency, so 100 TB of
text costs the same per-iteration work as its distinct-word list. Each
iteration is one explode + one aggregation + a 1-row driver sync (the
argmax pair — the kmeans/pagerank sync discipline), and the symbol
rewrite is a pure Catalyst fold (no Python in the loop). Lineage is
truncated per iteration with an eager localCheckpoint, the ALS/pagerank
pattern for iterative plans.

Determinism: the argmax pair breaks ties by (left, right) ascending —
byte-wise UTF8 ordering on the Spark side, code-point ordering in the
pure-Python mirror (identical on the ASCII corpus; documented). The
greedy left-to-right merge never merges overlapping occurrences (aaa +
(a,a) -> [aa, a]), matching the reference BPE implementations; the fold
carries a just-merged flag to enforce it.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END_MARKER = "</w>"


@dataclass(frozen=True)
class Merge:
    step: int
    left: str
    right: str
    merged: str
    pair_count: int


def word_symbol_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(syms array<string>, n bigint): every distinct lowercased
    whitespace word split into characters + END_MARKER, weighted by its
    corpus frequency. The ONE corpus-sized pass of BPE training."""
    c = F.col(text_col)
    return (
        docs.filter(F.length(F.trim(c)) > 0)
        .select(F.explode(F.split(F.lower(c), r"\s+")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.concat(F.split("w", ""), F.array(F.lit(END_MARKER))).alias("syms"),
            "n",
        )
    )


def _merge_fold(syms: Column, left: str, right: str, merged: str) -> Column:
    """Greedy left-to-right non-overlapping replacement of the adjacent
    (left, right) symbol pair with `merged` — a Catalyst aggregate fold
    with a struct (arr, just-merged) accumulator; no Python, no UDF."""
    a, b, ab = F.lit(left), F.lit(right), F.lit(merged)
    return F.aggregate(
        syms,
        F.struct(
            F.array().cast("array<string>").alias("arr"),
            F.lit(False).alias("just"),
        ),
        lambda acc, x: F.when(
            (~acc.just)
            & (F.size(acc.arr) > 0)
            & (F.element_at(acc.arr, -1) == a)
            & (x == b),
            F.struct(
                F.concat(
                    F.slice(acc.arr, 1, F.size(acc.arr) - 1), F.array(ab)
                ).alias("arr"),
                F.lit(True).alias("just"),
            ),
        ).otherwise(
            F.struct(F.concat(acc.arr, F.array(x)).alias("arr"), F.lit(False).alias("just"))
        ),
        lambda acc: acc.arr,
    )


def bpe_train(
    docs: DataFrame, n_merges: int = 8, text_col: str = "text"
) -> list[Merge]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the merge
    table in learned order. Stops early if no adjacent pair is left.

    Per iteration: adjacent pairs come from arrays_zip of the symbol
    array against its own 1-shifted slice (exploded, weighted by the
    word count), ONE aggregation picks the (count desc, left, right)
    argmax, and the vocabulary's symbol arrays are rewritten by the
    _merge_fold expression — vocabulary-sized work throughout."""
    syms = word_symbol_table(docs, text_col).localCheckpoint(eager=True)
    merges: list[Merge] = []
    for step in range(n_merges):
        pairs = (
            syms.filter(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.arrays_zip(
                        F.slice("syms", 1, F.size("syms") - 1).alias("l"),
                        F.slice("syms", 2, F.size("syms") - 1).alias("r"),
                    )
                ).alias("p"),
                "n",
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not pairs:
            break
        top = pairs[0]
        merged = top.l + top.r
        merges.append(Merge(step, top.l, top.r, merged, int(top.cnt)))
        syms = syms.select(
            _merge_fold(F.col("syms"), top.l, top.r, merged).alias("syms"), "n"
        ).localCheckpoint(eager=True)
    return merges


def bpe_segment(token: Column, merges: list[Merge]) -> Column:
    """Apply a learned merge table to a single token column: chars +
    END_MARKER, then every merge in learned order as nested Catalyst
    folds — scan-fused, no Python, usable directly in a tokenize/count
    projection over the full corpus."""
    syms = F.concat(F.split(token, ""), F.array(F.lit(END_MARKER)))
    for m in merges:
        syms = _merge_fold(syms, m.left, m.right, m.merged)
    return syms


def merges_frame(spark, merges: list[Merge]) -> DataFrame:
    """The learned merge table as a DataFrame (bounded — n_merges rows),
    for registry/gate consumption."""
    return spark.createDataFrame(
        [(m.step, m.left, m.right, m.merged, m.pair_count) for m in merges],
        "step int, left string, right string, merged string, pair_count long",
    )
