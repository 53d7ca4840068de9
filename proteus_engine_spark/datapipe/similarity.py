"""Similarity search over an embedding column (array<float>).

- brute_force_topk — exact cosine top-k: query set broadcast against the
  corpus; per-row dot product with built-in higher-order functions
  (zip_with + aggregate, JVM-side), top-k via per-query window. The
  baseline and the verifier for the ANN path.
- lsh_ann_topk     — random-hyperplane LSH: 2^nbits sign-pattern buckets
  from deterministic pseudo-random hyperplanes; candidates = bucket-mates
  (with multi-probe on neighboring buckets optional at call site);
  exact cosine re-rank inside buckets only.

Scale shape: brute force is O(|Q|·|C|) — fine for |Q| small (broadcast), a
re-rank kernel otherwise. LSH makes the corpus side shuffle on a 4-byte
bucket id; at 100 TB of embeddings the bucket join replaces the cartesian.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from proteus_engine_spark.functions.fastlit import double_array, double_array_2d


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<double> columns — sequential
    left-fold, same order both engines (oracle: DuckDB list_dot_product)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "q_id",
    c_id: str = "c_id",
    vec: str = "vec",
    method: str = "fold",
) -> DataFrame:
    """Exact cosine top-k per query.

    queries: (q_id, vec array<double>) — must be small enough to broadcast.
    corpus:  (c_id, vec array<double>).
    Returns (q_id, c_id, cos_sim, rank<=k), ties broken by c_id so the cut
    is deterministic across engines.

    method="fold" (default): crossJoin + sequential-fold dot product —
    the reference scorer whose summation ORDER matches the DuckDB
    oracle's list_dot_product exactly; right for small query batches.
    method="gemm": BLAS row tiles per Arrow batch with an IN-WORKER
    partial top-k cut (each batch emits only its own top-k per query
    under the identical (cos desc, c_id asc) order, which provably
    contains the global top-k), then the same global window — the
    (queries × corpus) interpreted-fold cost collapses to matmuls and
    only batches × queries × k rows ever leave Python. Rounding is
    HALF_UP via sign·floor(|x|·1e6 + 0.5), bit-identical to F.round and
    the oracle (the _gemm_block_pairs discipline — np.round is
    half-to-even and would diverge on midpoints). Use for large query
    batches (the kNN-classification shape)."""
    if method == "gemm":
        scored = _gemm_topk_scores(queries, corpus, k, q_id, c_id, vec)
    elif method == "fold":
        q = queries.select(F.col(q_id), F.col(vec).alias("q_vec"))
        c = corpus.select(F.col(c_id), F.col(vec).alias("c_vec"))
        scored = F.broadcast(q).crossJoin(c).select(
            q_id,
            c_id,
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
        )
    else:
        raise ValueError(f"unknown method {method!r}")
    w = Window.partitionBy(q_id).orderBy(F.desc("cos_sim"), F.asc(c_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _gemm_topk_scores(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    q_id: str,
    c_id: str,
    vec: str,
) -> DataFrame:
    """(q_id, c_id, cos_sim) candidates for the gemm path: the query
    matrix rides the closure (driver-collected — queries are
    broadcast-sized by brute_force_topk's contract), each corpus Arrow
    batch scores as one matmul, and a per-(query, batch) partial top-k
    cut under the global (cos desc, c_id asc) order bounds the emission
    to queries × k rows per batch."""
    import numpy as np

    q_rows = queries.select(q_id, vec).collect()
    q_dt = queries.schema[q_id].dataType.simpleString()
    c_dt = corpus.schema[c_id].dataType.simpleString()
    out_schema = f"{q_id} {q_dt}, {c_id} {c_dt}, cos_sim double"
    if not q_rows:  # np.stack([]) would raise; the fold path returns empty
        return queries.sparkSession.createDataFrame([], out_schema)
    qids = [r[0] for r in q_rows]
    Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    qn = np.sqrt((Q * Q).sum(axis=1))
    if (qn == 0).any():
        # the fold path yields NULL cosines for a zero-norm query (every
        # candidate unrankable); failing fast beats silently ranking on
        # NaN, which Spark sorts ABOVE every real value in a desc window
        raise ValueError("gemm path: query vector with zero norm")

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[c_id].to_numpy()
            M = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec]])
            mn = np.sqrt((M * M).sum(axis=1))
            # zero-norm corpus vectors are unrankable (the fold path gives
            # them NULL cosine, which sorts LAST in the desc window and
            # never enters a top-k with >= k real candidates); dropping
            # them here keeps NaN out of the scores — Spark sorts NaN
            # FIRST in a desc window, the opposite of NULL
            keep = mn > 0
            if not keep.all():
                ids, M, mn = ids[keep], M[keep], mn[keep]
                if not len(ids):
                    continue
            G = (Q @ M.T) / np.outer(qn, mn)
            C = np.sign(G) * np.floor(np.abs(G) * 1e6 + 0.5) / 1e6
            kk = min(k, len(ids))
            out_q, out_c, out_s = [], [], []
            for i, qid in enumerate(qids):
                order = np.lexsort((ids, -C[i]))[:kk]
                out_q.extend([qid] * kk)
                out_c.extend(ids[order])
                out_s.extend(C[i][order])
            yield pd.DataFrame({q_id: out_q, c_id: out_c, "cos_sim": out_s})

    return corpus.select(c_id, vec).mapInPandas(score, out_schema)


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit hyperplane (splitmix-style LCG on
    (plane_idx, component) — no RNG state, reproducible across runs and
    cluster re-executions, which matters for incremental corpus builds)."""
    comps = []
    for j in range(dim):
        x = (plane_idx * 0x9E3779B97F4A7C15 + j * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 31
        x = (x * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 29
        comps.append((x / 2**64) * 2.0 - 1.0)
    n = math.sqrt(sum(v * v for v in comps)) or 1.0
    return [v / n for v in comps]


def lsh_bucket(vec: Column, dim: int, nbits: int = 8, plane_offset: int = 0) -> Column:
    """Random-hyperplane signature: nbits sign bits packed into an int.
    ``plane_offset`` selects a disjoint hyperplane family, so callers can
    build multiple independent tables (banding for recall)."""
    bucket = F.lit(0).cast("long")
    for b in range(nbits):
        plane = F.lit(_hyperplane(dim, plane_offset + b))
        bit = (_dot(vec, plane) > 0).cast("long")
        bucket = bucket + F.shiftleft(bit, b)
    return bucket


def _bucket_fold(vec: Column, bank: Column) -> Column:
    """array<long> of per-table bucket ids: fold sign bits of the plane
    dot products into an int per table (bit << i as bit * 2^i — shiftleft
    needs a literal shift amount; exact in double for i < 53)."""
    return F.transform(
        bank,
        lambda table: F.aggregate(
            F.transform(
                table,
                lambda p, i: (_dot(vec, p) > 0).cast("long")
                * F.pow(F.lit(2.0), i).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )


def attach_lsh_buckets(
    df: DataFrame, vec: Column, dim: int, nbits: int, n_tables: int
) -> DataFrame:
    """Add exploded (table, bucket) columns for every row: one row per
    (input row, table).

    The full hyperplane bank travels as DATA — a single-row broadcast
    cross join — not as an expression tree: inlining n_tables×nbits
    literal plane arrays into the projection makes Catalyst ANALYSIS the
    bottleneck (2-3 s of driver time per query at 16 tables×64 dims,
    re-paid on every plan traversal), while a one-row broadcast join plans
    in milliseconds, costs nothing at runtime, and executes the identical
    fold. At 100 TB the bank is still one row — the broadcast is free."""
    planes = [
        [_hyperplane(dim, t * nbits + b) for b in range(nbits)] for t in range(n_tables)
    ]
    bank = df.sparkSession.createDataFrame(
        [(planes,)], "___bank array<array<array<double>>>"
    )
    return (
        df.crossJoin(F.broadcast(bank))
        .select("*", F.posexplode(_bucket_fold(vec, F.col("___bank"))).alias("table", "bucket"))
        .drop("___bank")
    )


def kmeans_centroids(
    corpus: DataFrame,
    dim: int,
    n_centroids: int = 16,
    n_iter: int = 2,
    c_id: str = "c_id",
    vec: str = "vec",
) -> list[list[float]]:
    """Deterministic Lloyd k-means over an array<double> column, for IVF
    coarse quantization. Seeds = the n_centroids lowest-id vectors (no RNG
    — reproducible across runs/re-executions). Each iteration: broadcast
    the centroid table, assign by argmin L2 (JVM-side fold), recompute
    means per (cluster, dimension) via posexplode + avg. Centroids
    (n_centroids × dim doubles) are collected to the driver per iteration —
    the same driver-sync MLlib's k-means does; the data-sized work stays
    distributed."""
    seeds = [
        r["v"]
        for r in corpus.orderBy(c_id).limit(n_centroids).select(F.col(vec).alias("v")).collect()
    ]
    if not seeds:
        raise ValueError("kmeans_centroids: corpus has no vectors to seed from")
    # a corpus smaller than n_centroids seeds fewer clusters (standard
    # k-means degradation) — without this clamp the Lloyd loop would
    # index past the seed list and crash
    n_centroids = min(n_centroids, len(seeds))
    centroids = [list(map(float, s)) for s in seeds]
    for _ in range(n_iter):
        assigned = _assign_clusters(corpus, centroids, vec)
        rows = (
            assigned.select("__cluster__", F.posexplode(F.col(vec)).alias("pos", "x"))
            .groupBy("__cluster__", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("__cluster__")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias("centroid")
            )
            .collect()
        )
        new = {r["__cluster__"]: list(map(float, r["centroid"])) for r in rows}
        centroids = [new.get(i, centroids[i]) for i in range(n_centroids)]
    return centroids


def _centroid_table(spark, centroids: list[list[float]]):
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)], "cl_id int, cl_vec array<double>"
    )


def _assign_clusters(df: DataFrame, centroids: list[list[float]], vec: str) -> DataFrame:
    """Nearest-centroid id per row, via a broadcast join + argmin distance
    (min_by over the exploded centroid table — all JVM-side)."""
    ct = _centroid_table(df.sparkSession, centroids)
    d2 = F.aggregate(
        F.zip_with(F.col(vec), F.col("cl_vec"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = df.crossJoin(F.broadcast(ct)).withColumn("__d2__", d2)
    return (
        scored.groupBy(*df.columns)
        .agg(F.min_by("cl_id", F.struct("__d2__", "cl_id")).alias("__cluster__"))
    )


def ivf_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_iter: int = 2,
    q_id: str = "q_id",
    c_id: str = "c_id",
    vec: str = "vec",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means coarse quantizer,
    corpus partitioned by nearest centroid, queries probe their n_probe
    nearest cells, exact cosine re-rank inside probed cells only.

    Scale shape: the corpus side shuffles on a 4-byte cell id (and in a
    persisted index it would be *written partitioned* by cell, making a
    probe a partition-pruned scan); per-query work drops from |C| to
    ~|C|·n_probe/n_centroids. Recall ≥ LSH at equal candidate budget on
    clustered data because cells follow the data distribution."""
    centroids = kmeans_centroids(corpus, dim, n_centroids, n_iter, c_id, vec)
    c_assigned = _assign_clusters(corpus, centroids, vec).select(
        F.col(c_id), F.col(vec).alias("c_vec"), F.col("__cluster__").alias("cell")
    )
    # queries: top n_probe cells by distance (explode the per-query ranking)
    ct = _centroid_table(queries.sparkSession, centroids)
    d2 = F.aggregate(
        F.zip_with(F.col(vec), F.col("cl_vec"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    q_cells = (
        queries.crossJoin(F.broadcast(ct))
        .withColumn("__d2__", d2)
        .withColumn(
            "__rk__",
            F.row_number().over(
                Window.partitionBy(q_id).orderBy(F.asc("__d2__"), F.asc("cl_id"))
            ),
        )
        .filter(F.col("__rk__") <= n_probe)
        .select(F.col(q_id), F.col(vec).alias("q_vec"), F.col("cl_id").alias("cell"))
    )
    scored = (
        F.broadcast(q_cells)
        .join(c_assigned, "cell")
        .select(
            q_id,
            c_id,
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cos_sim"), F.asc(c_id))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    nbits: int = 8,
    n_tables: int = 1,
    q_id: str = "q_id",
    c_id: str = "c_id",
    vec: str = "vec",
) -> DataFrame:
    """Approximate top-k: hash both sides into sign-pattern buckets from
    ``n_tables`` independent hyperplane families, join on (table, bucket),
    exact cosine re-rank over the deduped candidate union. Recall =
    1-(1-p^nbits)^n_tables for bit-agreement probability p — tune n_tables
    up (or nbits down) for recall, nbits up for candidate-set size. The
    (table, bucket) key is 8 bytes, so at 100 TB the candidate join stays a
    plain shuffle-hash join; candidates per query are bounded by the bucket
    occupancy, never the corpus."""
    q = attach_lsh_buckets(
        queries.select(F.col(q_id), F.col(vec).alias("q_vec")),
        F.col("q_vec"), dim, nbits, n_tables,
    )
    c = attach_lsh_buckets(
        corpus.select(F.col(c_id), F.col(vec).alias("c_vec")),
        F.col("c_vec"), dim, nbits, n_tables,
    )
    # Score BEFORE deduping: a pair colliding in several tables is scored
    # once per collision (cheap, deterministic — identical value), but the
    # dedup shuffle then carries 24-byte (q, c, score) rows instead of two
    # full embedding vectors per row. At 100 TB the vectors never ride a
    # shuffle at all: they are consumed map-side where the bucket join
    # produced them.
    scored = (
        F.broadcast(q)
        .join(c, ["table", "bucket"])
        .select(
            q_id,
            c_id,
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
        )
        .dropDuplicates([q_id, c_id])
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cos_sim"), F.asc(c_id))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)



def _exact_rerank(
    cand: DataFrame, corpus: DataFrame, k: int, q_id: str, c_id: str, vec: str
) -> DataFrame:
    """The quantized-ANN family's shared final tier: join the candidate
    set (q_id, q_vec, c_id) back to the raw corpus vectors, score EXACT
    cosine rounded to 1e-6, keep top-k per query with the (cos_sim desc,
    c_id) tie-break. One definition so the re-rank convention — the
    "approx distances order candidates but never reach the output"
    discipline — cannot drift between the PQ / IVF-PQ / SQ8 gates."""
    rer = cand.join(
        corpus.select(F.col(c_id), F.col(vec).alias("c_vec")), c_id
    ).select(
        q_id,
        c_id,
        F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cos_sim"), F.asc(c_id))
    return rer.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def pq_codebooks(
    corpus: DataFrame,
    dim: int,
    m_subspaces: int = 4,
    n_codes: int = 16,
    n_iter: int = 2,
    c_id: str = "c_id",
    vec: str = "vec",
) -> list[list[list[float]]]:
    """Product-quantization codebooks: the vector space is split into
    m_subspaces contiguous sub-vectors and each subspace gets its own
    n_codes-centroid k-means codebook (Jégou et al. 2011). Reuses the
    deterministic lowest-id-seed Lloyd quantizer, once per subspace —
    m driver syncs of n_codes x (dim/m) doubles, the same driver-sync
    budget class as the IVF coarse quantizer."""
    if dim % m_subspaces:
        raise ValueError(f"m_subspaces={m_subspaces} must divide dim={dim}")
    sub = dim // m_subspaces
    books = []
    for s in range(m_subspaces):
        sub_corpus = corpus.select(
            F.col(c_id), F.slice(F.col(vec), s * sub + 1, sub).alias("vec")
        )
        books.append(kmeans_centroids(sub_corpus, sub, n_codes, n_iter, c_id, "vec"))
    return books


def _book_lit(book: list[list[float]]) -> Column:
    # one F.expr parse instead of n_codes x sub literal round trips
    return double_array_2d(book)


def _sub_d2s(sub_vec: Column, book: list[list[float]]) -> Column:
    """Array of squared L2 distances from one sub-vector to every code of
    one codebook — a transform over the literal codebook, sequential
    fold per code (all JVM, no join)."""
    return F.transform(
        _book_lit(book),
        lambda cb: F.aggregate(
            F.zip_with(sub_vec, cb, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )


def pq_encode(
    corpus: DataFrame,
    books: list[list[list[float]]],
    dim: int,
    c_id: str = "c_id",
    vec: str = "vec",
) -> DataFrame:
    """Encode every vector as m small integer codes (argmin code per
    subspace, ties to the LOWEST code id via array_position-of-min).
    ONE scan projection — the codebooks ride the plan as literals, so
    encoding needs no join and no shuffle; the encoded table is m bytes-
    ish per vector, the 100 TB memory win PQ exists for."""
    m = len(books)
    sub = dim // m
    cols = [F.col(c_id)]
    for s, book in enumerate(books):
        d2s = _sub_d2s(F.slice(F.col(vec), s * sub + 1, sub), book)
        cols.append(
            (F.array_position(d2s, F.array_min(d2s)) - 1).cast("int").alias(f"code_{s}")
        )
    return corpus.select(*cols)


def pq_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    m_subspaces: int = 4,
    n_codes: int = 16,
    n_iter: int = 2,
    n_candidates: int = 32,
    q_id: str = "q_id",
    c_id: str = "c_id",
    vec: str = "vec",
) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation and
    exact re-rank — the standard shape at 10^9+ vectors (FAISS IVF-PQ's
    PQ half; compose with ivf_ann_topk's cells to also prune the scan):

    1. train m per-subspace codebooks (deterministic Lloyd);
    2. encode the corpus to m small ints per vector (one scan, no join);
    3. per query, build the ADC lookup table (n_codes d2 values per
       subspace — a per-row expression over the SAME literal codebooks,
       so query LUT and corpus codes provably share one quantizer);
    4. score every (query, code-row) pair as m LUT lookups — the pair
       walk touches m ints + m doubles per candidate instead of dim
       floats, which is the ADC speedup;
    5. keep the n_candidates best by (adc, c_id) and exact-cosine
       re-rank ONLY those against the raw vectors (candidate-bounded
       second scan), returning (q_id, c_id, cos_sim, rank <= k).

    ADC values order candidates but never reach the output — the emitted
    cos_sim is exact, which is also what makes the gate oracle-portable
    (float fold-order wobble in adc could at worst swap candidates at the
    n_candidates boundary; verified empirically against the oracle at
    all three gate SFs)."""
    if n_candidates < k:
        raise ValueError(f"n_candidates={n_candidates} must be >= k={k}")
    books = pq_codebooks(corpus, dim, m_subspaces, n_codes, n_iter, c_id, vec)
    m = len(books)
    sub = dim // m
    encoded = pq_encode(corpus, books, dim, c_id, vec)

    lut_cols = [F.col(q_id), F.col(vec).alias("q_vec")]
    for s, book in enumerate(books):
        lut_cols.append(
            _sub_d2s(F.slice(F.col(vec), s * sub + 1, sub), book).alias(f"lut_{s}")
        )
    q_luts = queries.select(*lut_cols)

    adc = None
    for s in range(m):
        term = F.element_at(F.col(f"lut_{s}"), F.col(f"code_{s}") + 1)
        adc = term if adc is None else adc + term
    pairs = (
        F.broadcast(q_luts)
        .crossJoin(encoded)
        .select(q_id, "q_vec", F.col(c_id), adc.alias("__adc__"))
    )
    w_c = Window.partitionBy(q_id).orderBy(F.asc("__adc__"), F.asc(c_id))
    cand = (
        pairs.withColumn("__crk__", F.row_number().over(w_c))
        .filter(F.col("__crk__") <= n_candidates)
        .select(q_id, "q_vec", c_id)
    )
    return _exact_rerank(cand, corpus, k, q_id, c_id, vec)


def ivfpq_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    m_subspaces: int = 4,
    n_codes: int = 16,
    n_iter: int = 2,
    n_candidates: int = 32,
    q_id: str = "q_id",
    c_id: str = "c_id",
    vec: str = "vec",
) -> DataFrame:
    """IVF-PQ: the two scale levers composed the way FAISS composes them —
    the IVF coarse quantizer prunes WHICH corpus rows are scanned
    (queries touch ~n_probe/n_centroids of the corpus), PQ shrinks WHAT
    a scanned row costs (m LUT lookups instead of dim multiplications).
    Candidate generation is the probed-cell join from ivf_ann_topk with
    the pair scoring of pq_ann_topk; the final answer is an exact cosine
    re-rank of the n_candidates best ADC candidates per query.

    Both halves are independently oracle-gated (sim_ann_ivf, sim_ann_pq);
    the composition is relational plumbing between them — its recall is
    pytest-verified against brute force on the real corpus."""
    if n_candidates < k:
        raise ValueError(f"n_candidates={n_candidates} must be >= k={k}")
    # coarse quantizer + cell assignment (ivf_ann_topk's front half)
    centroids = kmeans_centroids(corpus, dim, n_centroids, n_iter, c_id, vec)
    c_assigned = _assign_clusters(corpus, centroids, vec).select(
        F.col(c_id), F.col(vec).alias("c_vec"), F.col("__cluster__").alias("cell")
    )
    books = pq_codebooks(corpus, dim, m_subspaces, n_codes, n_iter, c_id, vec)
    m = len(books)
    sub = dim // m
    encoded = pq_encode(
        c_assigned.select(F.col(c_id), F.col("c_vec").alias(vec)), books, dim, c_id, vec
    ).join(c_assigned.select(c_id, "cell"), c_id)

    ct = _centroid_table(queries.sparkSession, centroids)
    d2 = F.aggregate(
        F.zip_with(F.col(vec), F.col("cl_vec"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    lut_cols = [F.col(q_id), F.col(vec), F.col("cell")]
    q_cells = (
        queries.crossJoin(F.broadcast(ct))
        .withColumn("__d2__", d2)
        .withColumn(
            "__rk__",
            F.row_number().over(
                Window.partitionBy(q_id).orderBy(F.asc("__d2__"), F.asc("cl_id"))
            ),
        )
        .filter(F.col("__rk__") <= n_probe)
        .select(F.col(q_id), F.col(vec), F.col("cl_id").alias("cell"))
    )
    for s, book in enumerate(books):
        lut_cols.append(
            _sub_d2s(F.slice(F.col(vec), s * sub + 1, sub), book).alias(f"lut_{s}")
        )
    q_luts = q_cells.select(*lut_cols).withColumnRenamed(vec, "q_vec")

    adc = None
    for s in range(m):
        term = F.element_at(F.col(f"lut_{s}"), F.col(f"code_{s}") + 1)
        adc = term if adc is None else adc + term
    pairs = (
        F.broadcast(q_luts)
        .join(encoded, "cell")  # the IVF prune: only probed cells are scored
        .select(q_id, "q_vec", F.col(c_id), adc.alias("__adc__"))
    )
    w_c = Window.partitionBy(q_id).orderBy(F.asc("__adc__"), F.asc(c_id))
    cand = (
        pairs.withColumn("__crk__", F.row_number().over(w_c))
        .filter(F.col("__crk__") <= n_candidates)
        .select(q_id, "q_vec", c_id)
    )
    return _exact_rerank(cand, corpus, k, q_id, c_id, vec)


def sq8_train(
    corpus: DataFrame, dim: int, vec: str = "vec"
) -> tuple[list[float], list[float]]:
    """Scalar-quantization trainer (the FAISS SQ8 tier): per-dimension
    (lo, step) with step = (max - min) / 256 over the corpus. ONE
    posexplode + groupBy(dim) aggregation — map-side partials shrink the
    shuffle to #partitions x dim rows — and a dim-row driver sync, the
    same bounded-sync class as the IVF/PQ centroid collection. min/max
    are exact (no float summation), so the trained range is
    deterministic and reproducible on any engine."""
    rows = (
        corpus.select(F.posexplode(F.col(vec)).alias("p", "x"))
        .groupBy("p")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .collect()
    )
    if len(rows) != dim:
        raise ValueError(f"expected {dim} dimensions, saw {len(rows)}")
    lo = [0.0] * dim
    step = [0.0] * dim
    for r in rows:
        lo[r.p] = float(r.lo)
        step[r.p] = (float(r.hi) - float(r.lo)) / 256.0
    return lo, step


def sq8_encode(
    corpus: DataFrame,
    lo: list[float],
    step: list[float],
    c_id: str = "c_id",
    vec: str = "vec",
) -> DataFrame:
    """Encode every vector to dim uint8 codes: code_i = clamp(floor(
    (x_i - lo_i) / step_i), 0, 255) (constant dimensions — step 0 —
    code 0). One scan projection, the (lo, step) tables ride the plan
    as literals: no join, no shuffle, and the encoded corpus is dim
    bytes per vector — the 4x memory cut SQ8 exists for."""
    lo_lit = double_array(lo)
    st_lit = double_array(step)
    codes = F.transform(
        F.col(vec),
        lambda x, i: F.when(
            F.element_at(st_lit, i + 1) > 0,
            F.least(
                F.lit(255),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (x - F.element_at(lo_lit, i + 1))
                        / F.element_at(st_lit, i + 1)
                    ).cast("int"),
                ),
            ),
        ).otherwise(F.lit(0)),
    )
    return corpus.select(F.col(c_id), codes.alias("codes"))


def sq8_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_candidates: int = 32,
    q_id: str = "q_id",
    c_id: str = "c_id",
    vec: str = "vec",
) -> DataFrame:
    """Scalar-quantization ANN with asymmetric scoring and exact re-rank
    — the third quantization lever next to IVF (scan prune) and PQ
    (code compression); FAISS's ScalarQuantizer.QT_8bit:

    1. train per-dimension (lo, step) from corpus min/max (exact — no
       k-means, which is SQ's operational advantage);
    2. encode the corpus to dim uint8 codes in one scan;
    3. score query-vs-codes asymmetrically against reconstruction
       centers lo_i + (code_i + 0.5) * step_i — raw query floats, so
       only the corpus side pays quantization error;
    4. keep n_candidates by (approx_d2, c_id), exact-cosine re-rank to
       top-k, identical to the PQ discipline: approx distances order
       candidates but never reach the output.

    The reconstruction arithmetic is written with the exact same
    operation tree the oracle uses ((q_i - (lo_i + (c_i + 0.5)*st_i))
    squared via self-multiplication, summed left-to-right), so both
    engines walk bitwise-identical doubles into the candidate cut."""
    if n_candidates < k:
        raise ValueError(f"n_candidates={n_candidates} must be >= k={k}")
    lo, step = sq8_train(corpus, dim, vec)
    encoded = sq8_encode(corpus, lo, step, c_id, vec)
    lo_lit = double_array(lo)
    st_lit = double_array(step)

    def term(code: Column, i: Column) -> Column:
        center = F.element_at(lo_lit, i + 1) + (
            code.cast("double") + F.lit(0.5)
        ) * F.element_at(st_lit, i + 1)
        d = F.element_at(F.col("q_vec"), i + 1) - center
        return d * d

    adc = F.aggregate(
        F.transform(F.col("codes"), term), F.lit(0.0), lambda acc, x: acc + x
    )
    pairs = (
        F.broadcast(queries.select(F.col(q_id), F.col(vec).alias("q_vec")))
        .crossJoin(encoded)
        .select(q_id, "q_vec", F.col(c_id), adc.alias("__adc__"))
    )
    w_c = Window.partitionBy(q_id).orderBy(F.asc("__adc__"), F.asc(c_id))
    cand = (
        pairs.withColumn("__crk__", F.row_number().over(w_c))
        .filter(F.col("__crk__") <= n_candidates)
        .select(q_id, "q_vec", c_id)
    )
    return _exact_rerank(cand, corpus, k, q_id, c_id, vec)


def knn_classify(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "q_id",
    c_id: str = "c_id",
    vec: str = "vec",
    label: str = "label",
) -> DataFrame:
    """k-nearest-neighbor majority-vote classification over an embedding
    corpus — the label-transfer / weak-labeling step of a training-data
    pipeline (label new examples from their nearest labeled neighbors
    before a model exists). For each query vector: the k most-cosine-
    similar labeled corpus vectors vote; the winning label maximizes
    (votes, summed similarity, -label) in that order. Returns
    (q_id, predicted int, votes long, sim_micro_sum long).

    Determinism discipline: each neighbor's rounded cosine quantizes to
    integer micro-units (round(cos·1e6) as long) BEFORE the vote sums, so
    the per-label similarity mass is an exact integer sum — accumulation
    order cannot move it — and every tie-break layer (votes, mass, label
    asc) is exact.

    Scale shape: the scorer is brute_force_topk's GEMM path (BLAS row
    tiles + in-worker partial top-k — the interpreted-fold crossJoin is
    ~10x slower at hundreds of queries); at corpus scale swap the
    candidate generator for the LSH/IVF/PQ paths in this module
    (identical vote stage — the top-k frame is the interface). The vote
    itself is a (query, label) aggregate over k·|queries| rows followed
    by a query-keyed min_by argmax — never a corpus-sized shuffle."""
    topk = brute_force_topk(queries, corpus.select(c_id, vec), k=k,
                            q_id=q_id, c_id=c_id, vec=vec, method="gemm")
    labeled = topk.join(
        corpus.select(F.col(c_id), F.col(label).alias("_lbl")), c_id
    )
    votes = (
        labeled.withColumn("sim_micro", F.round(F.col("cos_sim") * 1e6, 0).cast("long"))
        .groupBy(q_id, "_lbl")
        .agg(
            F.count(F.lit(1)).alias("votes"),
            F.sum("sim_micro").alias("sim_micro_sum"),
        )
    )
    return (
        votes.groupBy(q_id)
        .agg(
            F.min_by(
                F.struct(F.col("_lbl"), F.col("votes"), F.col("sim_micro_sum")),
                F.struct(
                    (-F.col("votes")).alias("nv"),
                    (-F.col("sim_micro_sum")).alias("ns"),
                    F.col("_lbl"),
                ),
            ).alias("best")
        )
        .select(
            q_id,
            F.col("best._lbl").alias("predicted"),
            F.col("best.votes").alias("votes"),
            F.col("best.sim_micro_sum").alias("sim_micro_sum"),
        )
    )


def hard_negative_topk(
    anchors: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    q_id: str = "q_id",
    c_id: str = "c_id",
    vec: str = "vec",
    label: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor,
    the k most-similar corpus vectors with a DIFFERENT label — the
    near-miss negatives that make a contrastive batch informative
    (random negatives are trivially far; the hard ones sit just across
    the decision boundary). Returns (q_id, c_id, cos_sim, rank<=k),
    rounded-then-ranked with c_id tie-break.

    Scale shape: identical to brute_force_topk with the label-inequality
    predicate applied BEFORE the rank window (anchors broadcast with
    their labels; the filter drops same-label candidates at scan rate, so
    the window ranks only cross-label rows). At corpus scale swap the
    crossJoin for an ANN candidate generator and keep the filter+window —
    mining only needs near-neighbors, which is exactly what ANN returns."""
    a = anchors.select(
        F.col(q_id), F.col(vec).alias("q_vec"), F.col(label).alias("q_lbl")
    )
    c = corpus.select(
        F.col(c_id), F.col(vec).alias("c_vec"), F.col(label).alias("c_lbl")
    )
    scored = (
        F.broadcast(a)
        .crossJoin(c)
        .filter(F.col("q_lbl") != F.col("c_lbl"))
        .select(
            q_id,
            c_id,
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cos_sim"), F.asc(c_id))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    topk: int = 10,
    q_id: str = "q_id",
    c_id: str = "c_id",
    rank: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009): combine any number
    of per-query rankings — lexical BM25, dense cosine, ANN, heuristic —
    into one list by summing 1/(k + rank) per candidate; the standard
    hybrid-retrieval merge (rank-based, so incomparable scores fuse
    without calibration). A candidate missing from a ranking simply
    contributes nothing for it. Returns (q_id, c_id, rrf_score double
    rounded 1e-6, rank long), top-k per query, rounded-then-ranked with
    c_id tie-break.

    Scale shape: inputs are already top-k frames (queries × k rows
    each); the fuse is one unionByName + one (q_id, c_id) aggregate +
    one query-keyed window over ≤ |rankings|·k rows per query — nothing
    corpus-sized enters. The 1/(k+rank) terms are single IEEE divisions
    of exact integers, identical in any engine; each per-candidate sum
    has ≤ |rankings| addends in ascending-ranking order both engines
    (rounding at 1e-6 absorbs the last-ulp reorder risk — the repo-wide
    double-sum quantum discipline)."""
    if not rankings:
        raise ValueError("rankings must be non-empty")
    parts = [
        r.select(F.col(q_id), F.col(c_id), F.col(rank).cast("long").alias("rank"))
        for r in rankings
    ]
    allr = parts[0]
    for p in parts[1:]:
        allr = allr.unionByName(p)
    fused = (
        allr.select(
            q_id, c_id, (F.lit(1.0) / (F.lit(float(k)) + F.col("rank"))).alias("part")
        )
        .groupBy(q_id, c_id)
        .agg(F.round(F.sum("part"), 6).alias("rrf_score"))
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("rrf_score"), F.asc(c_id))
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= topk)
    )
