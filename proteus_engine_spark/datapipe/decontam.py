"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set — the standard train/test
contamination filter in LLM corpus pipelines (the n-gram-overlap
procedure of GPT-3 appendix C / PaLM appendix; Gopher uses 13-gram
overlap). The reference engine has no such operator; this belongs to the
training-data-pipeline surface the engine adds on top of SURVEY §2.

Scale shape (the expensive half is the corpus, so everything is sized by
it):
- Eval grams: distinct n-grams of the benchmark set. Benchmarks are
  ~10^4-10^6 documents, so this side is small; it is aggregated to ONE
  distinct 8-byte hash per gram and left to AQE — broadcast when it fits,
  shuffle-hash join otherwise (no forced hint: a pathological "eval set"
  that is a corpus fraction must not OOM executors).
- Corpus grams: generated JVM-side (transform over a token-index
  sequence, same machinery as dedup.shingle_array), hashed to 8 bytes
  IN the scan projection and joined on the hash — the shuffle carries
  (doc_id, hash), never gram strings. xxhash64 collisions (2^-64 per
  pair) can at worst merge two distinct grams into one flag count —
  irrelevant for a contamination verdict and deterministic across runs.
- Output is per-document (doc-keyed aggregation after the join), so the
  whole pipeline is scan -> explode -> hash join -> doc-keyed count:
  no corpus-wide state, no all-pairs anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from proteus_engine_spark.datapipe.dedup import shingle_array


def ngram_overlap_counts(
    corpus: DataFrame,
    eval_set: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Per corpus document, the number of distinct word ``n``-grams it
    shares with ANY document of ``eval_set``. Documents with zero overlap
    are absent (this feeds a contamination filter; absent = clean).
    Returns (id_col, n_shared_grams long).

    Documents SHORTER than ``n`` tokens contribute NO grams on either
    side (the GPT-3/Gopher convention): shingle_array would otherwise
    emit one partial whole-text pseudo-gram — right for dedup, wrong
    here, where a 2-token eval doc must not flag every corpus doc equal
    to those 2 tokens (and an empty doc must not match every other
    empty doc on the "" gram)."""

    def _full_grams(col: str) -> F.Column:
        from proteus_engine_spark.datapipe.textstats import _tokens

        return F.when(
            F.size(_tokens(col)) >= n, shingle_array(col, k=n)
        ).otherwise(F.array().cast("array<string>"))

    eval_grams = (
        eval_set.select(F.explode(_full_grams(text_col)).alias("gram"))
        .select(F.xxhash64("gram").alias("gh"))
        .distinct()
    )
    # Explicit repartition before the gram explode: a single small input
    # file otherwise puts ALL corpus-side shingling on one task (AQE
    # never widens an un-shuffled scan); on a many-file 100 TB input the
    # scan is already parallel and this is one cheap narrow shuffle of
    # (id, text).
    n_parts = corpus.sparkSession.sparkContext.defaultParallelism
    corpus_grams = (
        corpus.select(id_col, text_col)
        .repartition(n_parts)
        .select(
            F.col(id_col),
            F.explode(_full_grams(text_col)).alias("gram"),
        )
        .select(id_col, F.xxhash64("gram").alias("gh"))
    )
    # corpus grams are distinct per doc (shingle_array array_distincts),
    # eval grams distinct overall -> count(*) counts distinct shared grams
    return (
        corpus_grams.join(eval_grams, "gh")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared_grams"))
    )


def decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_shared_grams: int = 1,
) -> DataFrame:
    """Remove from ``corpus`` every document sharing at least
    ``min_shared_grams`` distinct word n-grams with the eval set
    (left-anti join against the flagged ids — doc-keyed, no corpus
    re-shuffle beyond the flag join)."""
    flagged = ngram_overlap_counts(corpus, eval_set, id_col, text_col, n).filter(
        F.col("n_shared_grams") >= min_shared_grams
    )
    return corpus.join(flagged.select(id_col), id_col, "left_anti")
