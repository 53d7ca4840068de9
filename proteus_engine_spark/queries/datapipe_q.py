"""LLM-data-pipeline queries over the documents/embeddings tables: dedup,
similarity search, text analysis, multimodal plumbing.

Oracle policy: exact/portable ops (digest dedup, token Jaccard, quality
stats, fingerprints, brute-force cosine) carry full DuckDB oracles.
Hash-function-dependent ops (MinHash-LSH, SimHash, hyperplane-LSH ANN) have
no portable SQL equivalent (xxhash64 is Spark-specific) → rows-only check,
with the exact-Jaccard / brute-force query as their semantic verifier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from proteus_engine_spark.datapipe.dedup import (
    embedding_cosine_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_buckets,
)
from proteus_engine_spark.datapipe.multimodal import attach_media_columns, decode_images
from proteus_engine_spark.datapipe.similarity import brute_force_topk, ivf_ann_topk, lsh_ann_topk
from proteus_engine_spark.datapipe.textstats import (
    document_fingerprint,
    language_id,
    quality_stats,
    token_count,
)
from proteus_engine_spark.queries.registry import register
from proteus_engine_spark.sources import load_table


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
    tags=("datapipe", "dedup", "bench"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content digest — shuffles 16-byte hashes, not text."""
    return exact_dedup(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_ngram_jaccard",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, n_chars // 100 AS len_bucket,
             list_distinct(string_split_regex(lower(text), '\\s+')) AS tok_set
      FROM documents
    )
    SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
           CAST(len(list_intersect(l.tok_set, r.tok_set)) AS DOUBLE)
             / len(list_distinct(list_concat(l.tok_set, r.tok_set))) AS jaccard
    FROM toks l JOIN toks r
      ON l.lang = r.lang AND l.len_bucket = r.len_bucket AND l.doc_id < r.doc_id
    WHERE CAST(len(list_intersect(l.tok_set, r.tok_set)) AS DOUBLE)
             / len(list_distinct(list_concat(l.tok_set, r.tok_set))) >= 0.8
    """,
    tags=("datapipe", "dedup"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard pairs within (lang, length-bucket) blocks —
    the verification tier for LSH candidates (SURVEY §7 step 8)."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "len_bucket", F.floor(F.col("n_chars") / 100).cast("long")
    )
    return ngram_jaccard_pairs(docs, block_cols=["lang", "len_bucket"], threshold=0.8).select(
        "doc_a", "doc_b", "jaccard"
    )


@register("dedup_minhash_lsh", oracle=None, tags=("datapipe", "dedup", "bench"))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64 perms) + 16-band LSH near-dup pairs. No portable oracle
    (xxhash64 permutations are engine-specific); semantics verified against
    dedup_ngram_jaccard in tests/test_datapipe.py."""
    return minhash_lsh_pairs(load_table(spark, sf_dir, "documents"), jaccard_threshold=0.5)


@register(
    "dedup_embedding_cosine",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                 / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) AS cos_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                   * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) >= 0.35
    """,
    tags=("datapipe", "dedup", "similarity"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, exact within label blocks — the
    self-join shuffles on the block key, the fold-based dot product runs
    JVM-side. The unblocked scale path (multi-table hyperplane LSH) is
    dedup_embedding_cosine_lsh."""
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_cosine_pairs(emb, threshold=0.35, block_col="label")


@register("dedup_embedding_cosine_lsh", oracle=None, tags=("datapipe", "dedup", "similarity"))
def dedup_embedding_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unblocked embedding near-dup via 8 independent 4-bit hyperplane-LSH
    tables + exact-cosine verification (rows-only: bucket assignment is
    engine-specific; precision/recall vs the exact query is asserted in
    tests/test_datapipe.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_cosine_pairs(emb, threshold=0.35, block_col=None, dim=64, nbits=4, n_tables=8)


@register("dedup_simhash", oracle=None, tags=("datapipe", "dedup"))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash fingerprints + prefix buckets (rows-only check)."""
    return simhash_buckets(load_table(spark, sf_dir, "documents"))


@register(
    "text_quality_stats",
    oracle="""
    SELECT doc_id,
           length(text) AS n_chars_calc,
           len(string_split_regex(text, '\\s+')) AS n_tokens,
           CAST(length(text) - len(string_split_regex(text, '\\s+')) + 1 AS DOUBLE)
             / greatest(len(string_split_regex(text, '\\s+')), 1) AS mean_word_len,
           CAST(length(regexp_replace(text, '[^.,;:!?''"]', '', 'g')) AS DOUBLE)
             / greatest(length(text), 1) AS punct_ratio,
           CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
             / greatest(length(text), 1) AS digit_ratio,
           CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE)
             / greatest(length(text), 1) AS upper_ratio
    FROM documents
    """,
    tags=("datapipe", "text"),
)
def text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter feature set (lengths, ratios) — codegen'd expressions
    over the scan, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return quality_stats(docs).select(
        "doc_id", "n_chars_calc", "n_tokens", "mean_word_len", "punct_ratio", "digit_ratio", "upper_ratio"
    )


@register(
    "text_language_id",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang AS lang_true,
             len(list_intersect(list_distinct(string_split_regex(lower(text), '\\s+')),
                 ['der','die','das','und','ist','nicht','ein','mit','auf','zu'])) AS s_de,
             len(list_intersect(list_distinct(string_split_regex(lower(text), '\\s+')),
                 ['the','and','of','to','is','in','that','it','was','for'])) AS s_en,
             len(list_intersect(list_distinct(string_split_regex(lower(text), '\\s+')),
                 ['el','la','los','que','es','no','un','una','con','por'])) AS s_es,
             len(list_intersect(list_distinct(string_split_regex(lower(text), '\\s+')),
                 ['le','la','les','et','est','pas','un','une','dans','pour'])) AS s_fr
      FROM documents
    )
    SELECT doc_id, lang_true,
           CASE WHEN s_fr > greatest(s_de, s_en, s_es) THEN 'fr'
                WHEN s_es > greatest(s_de, s_en) THEN 'es'
                WHEN s_en > s_de THEN 'en'
                WHEN s_de > 0 THEN 'de'
                ELSE 'und' END AS lang_pred
    FROM scored
    """,
    tags=("datapipe", "text"),
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-anchor language ID. Argmax with ties → earliest language in
    sorted order (matches the CASE cascade in the oracle exactly)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_true"),
        language_id("text").alias("lang_pred"),
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split_regex(lower(text), '\\s+'))), ' ')) AS fingerprint,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens
    FROM documents
    """,
    tags=("datapipe", "text"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive md5 fingerprint + BPE-ish token count."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        document_fingerprint("text").alias("fingerprint"),
        token_count("text", mode="bpe").alias("n_bpe_tokens"),
    )


@register(
    "sim_topk_bruteforce",
    oracle="""
    WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_vec FROM embeddings WHERE vec_id < 5),
         c AS (SELECT vec_id AS c_id, embedding::DOUBLE[] AS c_vec FROM embeddings),
         scored AS (
           SELECT q_id, c_id,
                  round(list_dot_product(q_vec, c_vec)
                        / (sqrt(list_dot_product(q_vec, q_vec)) * sqrt(list_dot_product(c_vec, c_vec))), 6) AS cos_sim
           FROM q, c
         )
    SELECT q_id, c_id, cos_sim,
           row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rank
    FROM scored
    QUALIFY rank <= 5
    """,
    tags=("datapipe", "similarity", "bench"),
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for 5 query vectors against the whole corpus —
    broadcast queries, sequential-fold dot product (same order both engines,
    rounded at 1e-6 and de-tied by c_id for a deterministic cut)."""
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    queries = emb.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("q_id"), vec.alias("vec"))
    corpus = emb.select(F.col("vec_id").alias("c_id"), vec.alias("vec"))
    return brute_force_topk(queries, corpus, k=5)


@register("sim_ann_lsh", oracle=None, tags=("datapipe", "similarity"))
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH approximate top-k (rows-only; recall vs brute force is
    asserted in tests/test_datapipe.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    queries = emb.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("q_id"), vec.alias("vec"))
    corpus = emb.select(F.col("vec_id").alias("c_id"), vec.alias("vec"))
    return lsh_ann_topk(queries, corpus, dim=64, k=5, nbits=6)


@register("sim_ann_ivf", oracle=None, tags=("datapipe", "similarity"))
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: deterministic k-means coarse quantizer (16
    cells, 1 Lloyd iteration), queries probe their 4 nearest cells, exact
    cosine re-rank inside probed cells (rows-only: cell assignment is
    engine-specific; recall vs brute force asserted in tests)."""
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    queries = emb.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("q_id"), vec.alias("vec"))
    corpus = emb.select(F.col("vec_id").alias("c_id"), vec.alias("vec"))
    return ivf_ann_topk(queries, corpus, dim=64, k=5, n_centroids=16, n_probe=4, n_iter=1)


@register("multimodal_decode", oracle=None, tags=("datapipe", "multimodal"))
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: documents' text bytes stand in for media
    payloads (binary column), decoded via the Arrow-batched mapInPandas
    path with the stubbed codec (rows-only; plumbing asserted in tests)."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
    )
    media = attach_media_columns(docs)
    return decode_images(media)
