"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All built-in expressions — at 100 TB these run
inside whole-stage codegen over the parquet scan, no Python, no shuffle
(embarrassingly parallel per document).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from proteus_engine_spark.functions.fastlit import string_array

# Tiny per-language stopword anchor sets (language-ID heuristic tier; a real
# deployment would swap in fastText via mapInPandas — see multimodal.py for
# the gated-dependency pattern).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "un", "une", "dans", "pour"],
    "es": ["el", "la", "los", "que", "es", "no", "un", "una", "con", "por"],
}

BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _tokens(text: str | Column) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(c), r"\s+")


def token_count(text: str | Column, mode: str = "whitespace") -> Column:
    """Token count: whitespace tier or BPE-ish regex tier (letters runs /
    digit runs / single punctuation — a proxy for subword token counts).

    Empty / whitespace-only text counts 0 tokens (split('') yields ['']
    — one phantom token — in Spark AND DuckDB; the guard is mirrored in
    every oracle, the same discipline repetition_stats established)."""
    c = F.col(text) if isinstance(text, str) else text
    if mode == "whitespace":
        return F.when(
            F.length(F.trim(c)) > 0, F.size(F.split(c, r"\s+"))
        ).otherwise(F.lit(0))
    if mode == "bpe":
        return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0))
    raise ValueError(f"unknown mode {mode!r}")


def stopword_ratio(text: str | Column, lang: str = "en") -> Column:
    toks = _tokens(text)
    hits = F.size(F.array_intersect(F.array_distinct(toks), string_array(STOPWORDS[lang])))
    return hits.cast("double") / F.greatest(F.size(F.array_distinct(toks)), F.lit(1))


def language_id(text: str | Column) -> Column:
    """Heuristic language ID: distinct-stopword hits per language, argmax
    (ties → lexicographically first language, deterministic). Returns
    'und' when no list matches."""
    toks = F.array_distinct(_tokens(text))
    scores = [
        (lang, F.size(F.array_intersect(toks, string_array(ws))))
        for lang, ws in sorted(STOPWORDS.items())
    ]
    best = None
    best_lang = F.lit("und")
    for lang, score in scores:
        if best is None:
            best, best_lang = score, F.when(score > 0, F.lit(lang)).otherwise(F.lit("und"))
        else:
            gt = score > best
            best_lang = F.when(gt, F.lit(lang)).otherwise(best_lang)
            best = F.when(gt, score).otherwise(best)
    return best_lang


def quality_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: lengths, token stats, punctuation and
    digit ratios, uppercase ratio, mean word length — the standard
    pre-training quality-filter feature set."""
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tokens = token_count(c)  # empty/whitespace-only -> 0, oracle-mirrored
    n_punct = F.length(F.regexp_replace(c, r"[^.,;:!?'\"]", ""))
    n_digit = F.length(F.regexp_replace(c, r"[^0-9]", ""))
    n_upper = F.length(F.regexp_replace(c, r"[^A-Z]", ""))
    return docs.withColumns(
        {
            "n_chars_calc": n_chars,
            "n_tokens": n_tokens,
            "mean_word_len": (n_chars - n_tokens + 1).cast("double") / F.greatest(n_tokens, F.lit(1)),
            "punct_ratio": n_punct.cast("double") / F.greatest(n_chars, F.lit(1)),
            "digit_ratio": n_digit.cast("double") / F.greatest(n_chars, F.lit(1)),
            "upper_ratio": n_upper.cast("double") / F.greatest(n_chars, F.lit(1)),
        }
    )


def document_fingerprint(text: str | Column) -> Column:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token set — robust to token reordering, portable across engines (both
    sides agree on md5 of the same joined string). For shift-robust
    winnowing-style fingerprints, combine with dedup.shingles + min-hash."""
    toks = F.sort_array(F.array_distinct(_tokens(text)))
    return F.md5(F.concat_ws(" ", toks))


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, §A1.1 repetition
    removal — the standard LLM-corpus quality filters):

    - ``n_tokens``        whitespace token count
    - ``dup_token_frac``  1 - distinct/total tokens (in-doc, no shuffle)
    - ``top_bigram_cov``  chars covered by the best repeated word-bigram
                          (max over bigrams with count >= 2 of
                          count * len(gram)) / len(text); 0 if none repeat
    - ``dup_trigram_cov`` chars covered by ALL repeated word-trigrams
                          (sum over trigrams with count >= 2 of
                          count * len(gram)) / len(text). NOTE this
                          DEVIATES from Rae et al., who count each
                          character at most once (their fraction is
                          <= 1): overlapping occurrences double-count
                          here, so heavy overlap-repetition can push the
                          value past 1.0 — recalibrate any thresholds
                          taken from the paper (the behavior is pinned
                          by tests and mirrored in the oracle, so it is
                          a deliberate, stable definition — not the
                          paper's). ``top_bigram_cov`` likewise takes
                          max(count*len) over repeated bigrams, not the
                          most-frequent bigram's coverage

    Scale shape: token stats are per-row Catalyst expressions computed in
    the scan projection; both gram sizes ride ONE tagged explode
    (explode_outer — a doc too short for any n-gram keeps a NULL-gram
    row, so no doc-key re-join is needed to preserve it), then two
    doc-keyed aggregations. Everything is line-rate and perfectly
    partitioned by document — no corpus-wide state, no join.
    """
    # split(trim('')) yields [''] — one empty token — so empty or
    # whitespace-only docs must map to an EMPTY token array (n_tokens 0),
    # and the ratio columns need explicit zero-denominator guards
    # (divide-by-zero is NULL in Spark but the doc legitimately has zero
    # repetition — the signal is 0.0, not unknown).
    toks = F.when(
        F.length(F.trim(F.col(text_col))) > 0,
        F.split(F.trim(F.col(text_col)), r"\s+"),
    ).otherwise(F.array().cast("array<string>"))
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    # Scale-adaptive widening before the gram explode: a small
    # single-file input otherwise runs the whole tokenize+explode on ONE
    # task, and AQE never widens a compute-heavy, byte-light stage (same
    # rationale as the minhash signature pass); a many-file wide scan
    # skips the repartition instead of shuffling text payloads.
    from proteus_engine_spark.operators.partitioning import widen_if_narrow

    base = widen_if_narrow(
        docs.select(F.col(id_col), F.col(text_col)), n_parts, id_col
    ).select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        toks.alias("toks"),
    ).select(
        id_col,
        "n_chars",
        F.size("toks").alias("n_tokens"),
        F.when(
            F.size("toks") > 0,
            1.0
            - F.size(F.array_distinct("toks")).cast("double") / F.size("toks"),
        ).otherwise(F.lit(0.0)).alias("dup_token_frac"),
        F.explode_outer(
            F.flatten(
                F.array(
                    *[
                        # guard: sequence(1, 0) would generate DESCENDING
                        # [1, 0] and slice(_, 0, _) errors — short docs
                        # contribute an empty gram list instead
                        F.expr(
                            f"CASE WHEN size(toks) >= {n} THEN"
                            f" transform(sequence(1, size(toks) - {n - 1}),"
                            f" i -> named_struct(\'n\', {n},"
                            f" \'gram\', concat_ws(\' \', slice(toks, i, {n}))))"
                            f" ELSE CAST(array() AS array<struct<n:int,gram:string>>) END"
                        )
                        for n in (2, 3)
                    ]
                )
            )
        ).alias("g"),
    )
    keys = [id_col, "n_chars", "n_tokens", "dup_token_frac"]
    counts = base.groupBy(*keys, "g").agg(F.count(F.lit(1)).alias("cnt"))
    return counts.groupBy(*keys).agg(
        F.coalesce(
            F.max(
                F.when(
                    (F.col("g.n") == 2) & (F.col("cnt") >= 2),
                    F.col("cnt") * F.length("g.gram"),
                )
            ),
            F.lit(0),
        ).alias("big_cov"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("g.n") == 3) & (F.col("cnt") >= 2),
                    F.col("cnt") * F.length("g.gram"),
                )
            ),
            F.lit(0),
        ).alias("tri_cov"),
    ).select(
        id_col,
        "n_tokens",
        "dup_token_frac",
        F.when(
            F.col("n_chars") > 0,
            F.col("big_cov").cast("double") / F.col("n_chars"),
        ).otherwise(F.lit(0.0)).alias("top_bigram_cov"),
        F.when(
            F.col("n_chars") > 0,
            F.col("tri_cov").cast("double") / F.col("n_chars"),
        ).otherwise(F.lit(0.0)).alias("dup_trigram_cov"),
    )


def percentile_summary(
    df: DataFrame,
    value_col: "str | Column",
    group_cols: list[str],
    pcts: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    mode: str = "exact",
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group distribution summary (e.g. token-length percentiles per
    language — the profiling step before setting corpus length filters).
    Long-form output: group_cols + (pct double, value double), one row
    per requested percentile — scalar columns only, gate-safe.

    Two tiers, like the dedup operators:
    - ``mode="exact"``: Spark's `percentile` — linear interpolation at
      rank p*(n-1), identical to DuckDB's quantile_cont, so it is
      oracle-checkable. The aggregation buffers every value of a group
      in executor memory — correct for tests/small strata, NOT the
      100 TB path.
    - ``mode="approx"``: `approx_percentile` — a mergeable sketch with
      bounded memory (map-side partial combine, no value buffering);
      the production tier at corpus scale, within 1/accuracy relative
      rank error.
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    pct_arr = F.array(*[F.lit(float(p)) for p in pcts])
    if mode == "exact":
        vals = F.percentile(v, pct_arr)
    elif mode == "approx":
        vals = F.approx_percentile(v.cast("double"), pct_arr, F.lit(accuracy))
    else:
        raise ValueError(f"unknown mode {mode!r}")
    agg = df.groupBy(*group_cols).agg(vals.cast("array<double>").alias("__vals__"))
    return agg.select(
        *group_cols, F.posexplode("__vals__").alias("__i__", "value")
    ).select(
        *group_cols,
        F.element_at(pct_arr, F.col("__i__") + 1).alias("pct"),
        "value",
    )


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    num_docs: int | None = None,
) -> DataFrame:
    """Per-document top-k terms by smoothed TF-IDF (sklearn-style
    idf = ln((1+N)/(1+df)) + 1) — keyword extraction for corpus
    exploration / topic tagging. Deterministic: ties broken by term.
    Returns (id_col, term, score double, rk long).

    Scale shape: tokenize-explode feeds a (doc, term) count [shuffle 1,
    map-side combine], document frequencies are a term-keyed aggregate
    of that frame [shuffle 2, vocabulary-sized], the idf join is
    term-keyed (vocabulary-sized build side — AQE broadcasts real-world
    vocabularies), and top-k is one doc-keyed window [shuffle 3]. N is a
    single scalar: pass ``num_docs`` when known (ONE corpus scan total).
    With ``num_docs=None`` it is derived lazily in-plan as a 1-row
    count(*) aggregate crossJoined onto the vocabulary-sized df frame
    (Spark broadcasts the single row) — that aggregate re-reads the
    ``docs`` subplan, so the corpus is scanned a SECOND time (a
    DataFrame count is a real scan job on parquet, not metadata); at
    production scale pass ``num_docs``. Note N must count ALL docs
    including token-less ones (the smoothed idf denominator), which is
    why it cannot be derived from the tf frame."""
    from pyspark.sql.window import Window

    toks = docs.select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    # df must REFERENCE the tf column (count of tf>=1 == count(*) — tf is
    # never 0): with a bare count(*) Catalyst prunes tf's count on this
    # branch, the two tf subplans canonicalize differently, and
    # ReusedExchange never fires — the tokenize+count pass would run twice
    # per action (plan-tested in tests/test_round11.py). r18 executed-plan
    # census: with this reference trick in place, AQE's RUNTIME exchange
    # reuse covers every terminal — even a bare count() executes ONE
    # tokenize scan + a ReusedExchange for this branch
    # (plans/r18/text_tfidf_top_terms_executed_after.txt), closing the
    # r17 "double tokenize under bare count()" note.
    dfreq = tf.groupBy("term").agg(
        F.count(F.when(F.col("tf") >= 1, 1)).alias("df")
    )
    if num_docs is None:
        dfreq = dfreq.crossJoin(docs.agg(F.count("*").alias("__n__")))
        n_expr = F.col("__n__").cast("double")
    else:
        n_expr = F.lit(float(num_docs))
    idf = F.log((1.0 + n_expr) / (1.0 + F.col("df"))) + 1.0
    scored = tf.join(dfreq, "term").select(
        id_col, "term", (F.col("tf") * idf).alias("score")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select(id_col, "term", "score", "rk")
    )


def vocab_stats(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Corpus vocabulary profile: vocabulary size, total token count,
    hapax count (terms occurring exactly once), the most frequent term's
    corpus share, and the type-token ratio — the quick corpus-health
    readout before tokenizer/filter decisions. One row.

    All fields derive from exact integer counts (shares are single
    divisions of exact longs), so the output is engine-portable bit-for-
    bit. Scale shape: one explode feeding a term-keyed count with
    map-side combine (the vocabulary-sized shuffle), then a 1-row
    aggregate over the term-count frame."""
    toks = docs.select(F.explode(_tokens(text_col)).alias("term"))
    counts = toks.groupBy("term").agg(F.count("*").alias("cnt"))
    return counts.agg(
        F.count("*").alias("vocab_size"),
        F.sum("cnt").alias("n_tokens_total"),
        F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0)).alias("hapax_count"),
        (F.max("cnt").cast("double") / F.sum("cnt")).alias("top1_share"),
        (F.count("*").cast("double") / F.sum("cnt")).alias("type_token_ratio"),
    )


def bigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
    min_count: int = 1,
    broadcast_model: bool = False,
    train_eagerly: bool = True,
) -> DataFrame:
    """Per-document corpus-LM quality score: the mean log-probability of
    the document's bigrams under an add-α-smoothed bigram model trained
    on the corpus itself — the CCNet/Gopher-style "LM perplexity" filter
    tier (fluent text scores high, keyboard mash / boilerplate tables /
    wrong-language fragments score low), with the n-gram model standing
    in for the trained KenLM. Every statistic derives from the corpus's
    own bigram frame: P(w2|w1) = (c(w1,w2) + α) / (c(w1) + α·V) with
    V = |distinct w2|, so the whole computation is engine-portable SQL.
    Documents with fewer than 2 tokens are excluded (no bigram to score).
    Returns (id_col, n_bigrams long, logprob double rounded to 1e-6 —
    the double-sum quantum discipline used by the cosine scorers).

    Production tiers (the 100 TB knobs, all defaulting to the exact
    gated behavior):
    - ``min_count``: prune the bigram model to counts >= min_count —
      shipping a pruned LM, exactly like a KenLM count floor. The
      context counts c(w1) and V stay EXACT (aggregated from the
      unpruned bigram counts — contexts are vocabulary-sized, the
      bigram table is what explodes), so any bigram at or above the
      floor scores IDENTICALLY to the unpruned model; a pruned-away
      bigram scores as unseen, p = α / (c(w1) + α·V) — the documented
      lossy tradeoff of model pruning. Default 1 = no pruning.
    - ``broadcast_model``: hint the (pruned) model tables broadcast into
      the scoring joins — with a count floor the model is
      executor-memory-sized and the doc-bigram frame never shuffles on
      the join keys. Default False: AQE picks the strategy from actual
      sizes.
    - ``train_eagerly``: opt out of the construction-time checkpoint job
      when composing into a larger pipeline that will materialize once
      itself (the single-pass guarantee then becomes the CALLER's
      responsibility — without any materialization of the pre-agg the
      corpus scan re-runs per divergent branch, see below).

    Scale shape: the tokenize+explode pass runs ONCE, guaranteed
    structurally — it feeds a single (doc, w1, w2)-keyed pre-aggregation
    [shuffle 1, map-side combine] that is EAGERLY localCheckpoint-ed
    (training the model IS a materialization step; the checkpoint
    footprint ≈ the shuffle files the aggregation already wrote).
    Everything derives from the checkpoint: bigram counts are a (w1, w2)
    re-aggregation [shuffle 2, distinct-bigram sized], left-context
    counts and V derive from the bigram counts (never from the raw
    stream), and scoring joins the checkpointed doc-bigram frame against
    the model tables on their keys.
    The checkpoint is deliberate, not an optimization fallback: exchange
    reuse CANNOT protect this plan — Catalyst prunes the model tables'
    columns differently per branch (c1 drops w2, V drops w1, a count()
    terminal drops the scores), each branch then canonicalizes apart,
    and the corpus scan re-runs once per divergent branch (observed: 4
    scans per action). The call therefore runs one Spark job at
    construction time; blocks are released with the frame (GC), the
    zip_with_index checkpoint discipline. The per-doc mean is the
    instance-weighted sum over the aggregated rows, one doc-keyed
    aggregate; V is a 1-row in-plan aggregate (crossJoin broadcast)."""
    toks = docs.select(F.col(id_col), _tokens(text_col).alias("t"))
    big = (
        toks.filter(F.size("t") >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.expr("transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2))")
            ).alias("b"),
        )
        .select(id_col, F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    dbg = big.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    if train_eagerly:
        dbg = dbg.localCheckpoint(eager=True)  # ONE corpus pass, see docstring
    c12 = dbg.groupBy("w1", "w2").agg(F.sum("n").alias("c12"))
    # c1 and V derive from the UNPRUNED bigram counts: the context
    # normalizer and vocabulary must stay exact or every probability in
    # the model shifts, not just the pruned bigrams' (docstring tiers).
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    v2 = c12.agg(F.countDistinct("w2").alias("v2"))
    pruned = min_count > 1
    if pruned:
        c12 = c12.filter(F.col("c12") >= min_count)
    if broadcast_model:
        c12 = F.broadcast(c12)
        c1 = F.broadcast(c1)
    # Unpruned models join inner (every doc bigram is in the corpus model
    # by construction — the gated default keeps the cheaper join type);
    # a PRUNED model joins left: a pruned-away bigram keeps NULL c12 →
    # coalesce to 0, the add-α unseen probability. c1 always hits (the
    # context table stays unpruned), so that join stays inner either way.
    num = (F.coalesce(F.col("c12"), F.lit(0)) if pruned else F.col("c12"))
    p = (num + F.lit(alpha)) / (F.col("c1") + F.lit(alpha) * F.col("v2"))
    return (
        dbg.join(c12, ["w1", "w2"], "left" if pruned else "inner")
        .join(c1, "w1").crossJoin(v2)
        .groupBy(id_col)
        .agg(
            F.sum("n").alias("n_bigrams"),
            F.round(F.sum(F.col("n") * F.log(p)) / F.sum("n"), 6).alias("logprob"),
        )
    )


def quality_buckets(
    scored: DataFrame,
    score_col: str = "logprob",
    id_col: str = "doc_id",
    n_buckets: int = 10,
) -> DataFrame:
    """Assign each row to a quality percentile bucket (1 = worst score
    .. n_buckets = best) — the CCNet move after LM scoring: split the
    corpus into perplexity terciles/deciles and sample training data by
    bucket. Returns (id_col, score_col, bucket int).

    Scale shape — never ``ntile`` / ``percent_rank``: a rank-based
    bucketing is an unpartitioned window, i.e. a single-task sort of the
    full corpus (the q11 scale-killer class). Instead the n_buckets-1
    exact percentile cut points come from ONE 1-row aggregate
    (``percentile`` is a partial-aggregating JVM expression — map-side
    combine, no row shuffle), broadcast-crossJoined back, and the bucket
    is computed per-row as 1 + |{cuts strictly below the score}| (ties
    land in the LOWER bucket on both engines by the strict <). Buckets
    are therefore equal-frequency up to ties, and the whole op adds one
    broadcast and zero shuffles to the scoring plan.

    Engine-portability: Spark's `percentile` and DuckDB's
    `quantile_cont` interpolate with the identical
    lower + (upper-lower)*fraction formula over the same rounded
    inputs, so the cut points — and hence every bucket id — reproduce
    exactly (validated empirically at all three gate SFs)."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    qs = F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)])
    cuts = scored.agg(F.percentile(F.col(score_col), qs).alias("__cuts__"))
    s = F.col(score_col)
    return (
        scored.crossJoin(F.broadcast(cuts))
        .select(
            id_col,
            score_col,
            (F.size(F.filter(F.col("__cuts__"), lambda c: c < s)) + 1).alias("bucket"),
        )
    )


def winnowing_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the
    MOSS algorithm): hash every k-token gram, slide a ``window`` over the
    gram-hash sequence, keep the minimum hash of each window, distinct
    per doc. Guarantees every shared run of window+k-1 tokens between two
    documents yields at least one SHARED fingerprint — the shift-robust
    local fingerprinting document_fingerprint (whole-doc, order-
    insensitive) explicitly defers to. Returns (id_col,
    fingerprint string) — one row per selected gram hash per doc.

    Adaptation: plain per-window minimum (the paper breaks min-ties by
    rightmost position to further thin the set; ties here keep ONE copy
    anyway via the in-doc distinct, so the guarantee is unchanged and the
    selection stays expressible as array_min). Gram hashes are md5 hex
    strings compared lexicographically — engine-portable (identical
    strings and byte-wise ordering on both engines), which is what makes
    the fingerprint set oracle-checkable; a production deployment would
    swap xxhash64 for md5 one-for-one.

    Docs with fewer than k tokens emit nothing; docs with fewer grams
    than the window emit the single minimum of what exists (the paper's
    boundary convention — never zero fingerprints for a doc with >= 1
    gram). Scale shape: per-row JVM expressions end-to-end (tokenize,
    two transforms, in-doc distinct, one explode) — NO shuffle at all;
    output is bounded by total grams / expected gap (2/(window+1))."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    toks = _tokens(text_col)
    grams = F.expr(
        f"transform(sequence(1, size(__t__) - {k} + 1), "
        f"i -> md5(array_join(slice(__t__, i, {k}), ' ')))"
    )
    mins = F.expr(
        f"transform(sequence(1, greatest(size(__g__) - {window} + 1, 1)), "
        f"j -> array_min(slice(__g__, j, {window})))"
    )
    return (
        docs.select(F.col(id_col), toks.alias("__t__"))
        .filter(F.size("__t__") >= k)
        .select(F.col(id_col), grams.alias("__g__"))
        .select(F.col(id_col), F.explode(F.array_distinct(mins)).alias("fingerprint"))
    )


# The Gopher rule set's required-stopword anchor (Rae et al. 2021,
# Appendix A1.1: "contains at least two of the following English words").
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Gopher quality-filter rule set (Rae et al. 2021, Appendix A1.1 —
    the standard heuristic document filter ahead of dedup/LM-scoring in
    a pre-training pipeline). Per document, the seven rules and their
    conjunction:

    - ``r_word_count``: min_words <= #tokens <= max_words
    - ``r_mean_word_len``: mean token length in [3, 10] characters
    - ``r_symbol_ratio``: the paper's "greater than 0.1 for EITHER the
      hash symbol or the ellipsis" — #'#'/#tokens < 0.1 AND
      #ellipsis/#tokens < 0.1, tested SEPARATELY, with both the ASCII
      '...' and the Unicode '…' counting as ellipses (matching the
      ellipsis-line rule's character set)
    - ``r_bullet_lines``: <= 90% of lines start with a bullet
    - ``r_ellipsis_lines``: <= 30% of lines end with an ellipsis
    - ``r_alpha_words``: >= 80% of tokens contain an alphabetic char
    - ``r_stopwords``: >= 2 stopword OCCURRENCES from GOPHER_STOPWORDS
      (the Dolma/DataTrove reading of "contains at least two of the
      following English words" — token occurrences, not distinct words,
      so 'the ... the' satisfies it)
    - ``passes`` = AND of all seven.

    Scale/portability shape: every rule is a pure Catalyst expression
    over one tokenization — zero shuffles, runs fused into the parquet
    scan at 100 TB. Every ratio threshold is evaluated as an INTEGER
    cross-multiplication (e.g. 10*alpha_words >= 8*n_tokens), so no
    float division ever reaches a comparison and the oracle can mirror
    each rule bit-exactly. Counters are emitted alongside the booleans
    so a drifted tokenizer fails the hash, not just a flipped flag."""
    c = F.col(text_col)
    toks = F.split(F.lower(c), r"\s+")
    n_tokens = F.when(
        F.length(F.trim(c)) > 0, F.size(toks)
    ).otherwise(F.lit(0)).cast("long")
    sum_wl = F.when(
        F.length(F.trim(c)) > 0,
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x)),
    ).otherwise(F.lit(0)).cast("long")
    n_alpha = F.when(
        F.length(F.trim(c)) > 0,
        F.size(F.filter(toks, lambda x: x.rlike("[a-z]"))),
    ).otherwise(F.lit(0)).cast("long")
    stop_lit = string_array(GOPHER_STOPWORDS)
    n_stop = F.size(
        F.filter(toks, lambda x: F.array_contains(stop_lit, x))
    ).cast("long")
    lines = F.split(c, r"\n")
    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(
        F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]"))
    ).cast("long")
    n_ellipsis_l = F.size(
        F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$"))
    ).cast("long")
    n_hash = (F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))).cast("long")
    n_dots = F.regexp_count(c, F.lit(r"\.\.\.|…")).cast("long")

    r_wc = (n_tokens >= min_words) & (n_tokens <= max_words)
    r_mwl = (sum_wl >= 3 * n_tokens) & (sum_wl <= 10 * n_tokens) & (n_tokens > 0)
    # two independent caps, per the paper's "either ... or" phrasing
    r_sym = (10 * n_hash < n_tokens) & (10 * n_dots < n_tokens)
    r_bul = 10 * n_bullet <= 9 * n_lines
    r_ell = 10 * n_ellipsis_l <= 3 * n_lines
    r_alpha = (10 * n_alpha >= 8 * n_tokens) & (n_tokens > 0)
    r_stop = n_stop >= 2

    return docs.select(
        id_col,
        *carry_cols,
        n_tokens.alias("n_tokens"),
        sum_wl.alias("sum_word_len"),
        n_alpha.alias("n_alpha_words"),
        n_stop.alias("n_stop_hits"),
        r_wc.alias("r_word_count"),
        r_mwl.alias("r_mean_word_len"),
        r_sym.alias("r_symbol_ratio"),
        r_bul.alias("r_bullet_lines"),
        r_ell.alias("r_ellipsis_lines"),
        r_alpha.alias("r_alpha_words"),
        r_stop.alias("r_stopwords"),
        (r_wc & r_mwl & r_sym & r_bul & r_ell & r_alpha & r_stop).alias("passes"),
    )


def normalize_text(text: str | Column) -> Column:
    """Canonical text-normalization expression (the C4/CCNet pre-dedup
    canonicalization): lowercase, strip every non-alphanumeric rune to a
    space, collapse whitespace runs, trim. Two docs differing only in
    case, punctuation, or layout normalize to the same string — feed the
    result to exact dedup for "normalized exact" duplicate removal (the
    tier between byte-exact md5 dedup and MinHash near-dup). Pure
    Catalyst regexp expressions: runs in the scan projection at line
    rate, portable to any SQL engine with regexp_replace."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(c), r"[^a-z0-9\s]", " "), r"\s+", " "
        )
    )


def doc_lengths(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The (id_col, dl long) document-length frame bm25_topk's length
    normalization needs — factored out so repeated-retrieval callers can
    compute it ONCE, persist/checkpoint it, and pass it back via
    ``bm25_topk(doc_lengths=...)``: the doc-length count is the only
    corpus-sized shuffle in BM25 scoring, and re-deriving it per query
    batch is the avoidable cost the r13 verdict flagged (item 3)."""
    return docs.select(
        F.col(id_col), token_count(text_col).cast("long").alias("dl")
    )


def bm25_topk(
    docs: DataFrame,
    queries: list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
    num_docs: int | None = None,
    query_terms: DataFrame | None = None,
    doc_lengths: DataFrame | None = None,
    pin_postings: bool = False,
) -> DataFrame:
    """Batch BM25 retrieval: for each query string, the top-k documents
    by Okapi BM25 with the Lucene idf variant
    ``ln(1 + (N - df + 0.5) / (df + 0.5))`` (non-negative for every df)
    — the classic lexical-retrieval scorer used to mine
    training/eval-adjacent documents from a corpus (and the exact-match
    baseline every embedding retriever is graded against). Repeated
    query terms weight their contribution by query term frequency.
    Only documents sharing at least one term with the query are
    candidates (standard sparse retrieval — zero-score rows are never
    materialized). Returns (query_id long, id_col, score double rounded
    to 1e-6, rk long); ties break by ascending doc id AFTER rounding so
    the ranking is engine-portable.

    Scale shape: the query-term table is a literal (a few rows) and is
    BROADCAST into the postings stream BEFORE any aggregation, so the
    (doc, term) count shuffle carries only query-term postings
    [candidate-bounded shuffle 1]; document lengths are a doc-keyed
    count over the full token stream [shuffle 2 — unavoidable: BM25's
    length normalization needs every doc's length, but the shuffle rows
    are (doc, long) pairs, never text]; df and N are query-term-sized /
    1-row aggregates broadcast back; final top-k is one window
    partitioned by query_id over candidate-bounded rows. At a 10^9-doc
    corpus the only corpus-sized shuffle is the doc-length count — for
    repeated query batches (the normal retrieval loop) compute it once
    with the module-level ``doc_lengths()`` helper, persist or
    localCheckpoint it, and pass it via ``doc_lengths=``: the call then
    scans the corpus exactly once (the candidate postings pass) and
    derives avgdl and N from the tiny (id, dl) frame
    (test_bm25_doc_lengths_reuse_single_scan proves the plan shape).

    Queries come as EITHER a list of strings (whitespace-split into the
    literal query-term table) OR a ``query_terms`` DataFrame of
    (query_id long, term string, qtf long) — the doc-as-query /
    derived-query shape (e.g. hybrid retrieval querying by an existing
    document's tokens) where the query terms are themselves a tiny
    in-plan aggregate. The frame must stay broadcast-sized: it is
    hinted broadcast into the postings stream either way."""
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
            if not terms:
                raise ValueError(f"query {qid} has no terms")
            for t in terms:
                qrows.append((qid, t))
        qdf = (
            spark.createDataFrame(qrows, "query_id long, term string")
            .groupBy("query_id", "term")
            .agg(F.count(F.lit(1)).alias("qtf"))
        )

    toks = docs.select(F.col(id_col), F.explode(_tokens(text_col)).alias("term"))
    # doc lengths over the FULL token stream (length normalization), with
    # the empty-text phantom-token guard shared with token_count(); a
    # caller-precomputed frame replaces the corpus-sized count AND serves
    # as the N / avgdl source, so no second corpus scan survives
    if doc_lengths is not None:
        dl = doc_lengths.select(F.col(id_col), F.col("dl").cast("long"))
    else:
        dl = docs.select(
            F.col(id_col), token_count(text_col).cast("long").alias("dl")
        )
    if num_docs is not None:
        n_df = spark.range(1).select(F.lit(int(num_docs)).alias("n_docs"))
    else:
        n_df = dl.agg(F.count(F.lit(1)).alias("n_docs"))
    avg_df = dl.agg(F.avg("dl").alias("avgdl"))

    # candidate postings: broadcast the literal query-term table into the
    # token stream BEFORE counting, so the tf shuffle is candidate-bounded
    qterms = F.broadcast(qdf.select("term").distinct())
    tf = (
        toks.join(qterms, "term")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    if pin_postings:
        # r18: in the doc-as-query / reused-doc-lengths shape
        # (sim_hybrid_rrf) the df aggregate and the scoring join
        # canonicalize apart AT RUNTIME and AQE's exchange reuse misses —
        # the corpus tokenize+probe pass executed twice per query
        # (executed-plan census, plans/r18/sim_hybrid_rrf_executed_
        # {before,after}.txt: 2 text scans -> 0 in the main job). The pin
        # is candidate-bounded (docs sharing a query term × their matched
        # terms — the rows the tf shuffle already carries), never the raw
        # corpus. It stays OFF by default: in the literal-query shape
        # (text_bm25_topk) runtime reuse DOES fire and the pin only adds
        # a job (interleaved A/B plans/r18/ab_bm25_pin1.json: pinned
        # slower in all 5 rounds there, wash on the rrf gate locally).
        tf = tf.localCheckpoint(eager=True)
    # df REFERENCES tf (count of tf>=1 == count(*) — tf is never 0): a
    # bare count(*) would let Catalyst prune tf on this branch, the two
    # tf subplans would canonicalize apart, and ReusedExchange would
    # never fire for the scoring join (the tfidf_top_terms trick — see
    # its comment for the plan test)
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
                * F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
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


def ngram_diversity(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    max_n: int = 3,
) -> DataFrame:
    """Per-group n-gram diversity profile (distinct-n over total-n for
    n = 1..max_n) — the distinct-n / rep-n corpus-health metric family
    (Li et al. 2016): a source whose distinct-2 ratio collapses is
    emitting templated/looping text and should be down-weighted before
    training. N-grams are WITHIN-document (no grams span documents).
    Documents with fewer than n tokens contribute nothing at that n.
    Returns (group_col, n int, total_ngrams long, distinct_ngrams long,
    distinct_ratio double rounded to 1e-6), exact integer counts so the
    ratios are engine-portable single divisions.

    Scale shape: ONE corpus scan, structurally — the per-n gram arrays
    are built in a SINGLE projection (concat of max_n transform()
    expressions over the same token array; a union-of-branches shape
    would re-scan the corpus once per n, plan-tested) and explode once
    as (n, gram) structs feeding a two-level aggregate — (group, n,
    gram) count with map-side combine [the distinct pass], then a
    (group, n) rollup of distinct/total — so no countDistinct expansion
    and the widest shuffle is the (group, gram)-keyed count. Grams
    shuffle as strings here for oracle portability; swap the gram
    expression for xxhash64 when grouping a 10^12-gram corpus (the
    duplicate_spans discipline) — the counts are identical up to hash
    collisions."""
    # empty/whitespace-only docs are dropped BEFORE tokenizing: split('')
    # yields [''] — one phantom token — in Spark and DuckDB alike (the
    # token_count guard, mirrored in the oracle)
    toks = docs.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(group_col), _tokens(text_col).alias("t")
    )
    # one (n, gram)-struct array per n, guarded per doc length (sequence
    # with a zero/negative end DESCENDS in Spark — the CASE is load-bearing)
    parts = [
        F.expr(
            f"CASE WHEN size(t) >= {n} THEN"
            f" transform(sequence(1, size(t) - {n} + 1),"
            f" i -> struct({n} AS n, array_join(slice(t, i, {n}), ' ') AS gram))"
            f" ELSE array() END"
        )
        for n in range(1, max_n + 1)
    ]
    allg = toks.select(
        group_col, F.explode(F.concat(*parts)).alias("g")
    ).select(group_col, F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
    counted = allg.groupBy(group_col, "n", "gram").agg(F.count(F.lit(1)).alias("c"))
    return counted.groupBy(group_col, "n").agg(
        F.sum("c").alias("total_ngrams"),
        F.count(F.lit(1)).alias("distinct_ngrams"),
        F.round(F.count(F.lit(1)) / F.sum("c"), 6).alias("distinct_ratio"),
    )


def source_profile_similarity(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Pairwise cosine similarity between per-source unigram-count
    profiles — mirror/near-mirror SOURCE detection (two feeds serving the
    same content distribution, e.g. a site and its CDN mirror, re-crawled
    forums, scraped re-posts): document-level dedup misses them when the
    documents differ but the distribution matches; a profile cosine near
    1 flags the pair for source-level arbitration. Returns one row per
    unordered source pair (source_a < source_b lexically):
    (source_a, source_b, dot long, cos_sim double rounded 1e-6).

    Exactness: profiles are integer term counts, the pair dot product and
    per-source sum-of-squares are exact LONG sums, and the cosine is one
    double expression over three exact integers (sqrt/division are
    IEEE-correctly-rounded single ops) — engine-portable without any
    accumulation-order caveat.

    Scale shape: ONE tokenize pass into a (source, term) count with
    map-side combine [vocabulary × sources shuffle]; squared norms are a
    source-keyed rollup of that frame [enum-sized, broadcast back]; the
    pair dot is the profile frame self-joined ON TERM (never a document
    join) with source_a < source_b — per term the join emits
    C(sources_with_term, 2) rows, so the blow-up is bounded by the
    source enum, not the corpus. Group count is assumed enum-sized
    (sources, domains, shards); for 10^5+ groups move to MinHash over
    the profile sets (the dedup module's discipline)."""
    prof = (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(group_col), F.explode(_tokens(text_col)).alias("term"))
        .groupBy(group_col, "term")
        .agg(F.count(F.lit(1)).alias("c"))
        # Pin the (source, term, c) profile once: it feeds four subplans
        # below (both self-join sides + both norm broadcasts) and Spark
        # materializes no common subplans, so lazily the "ONE tokenize
        # pass" ran four times (r17 scan audit: documents 4x). The frame
        # is vocabulary x sources — corpus-size independent.
        .localCheckpoint(eager=True)
    )
    norms = prof.groupBy(group_col).agg(F.sum(F.col("c") * F.col("c")).alias("ss"))
    a = prof.select(
        F.col(group_col).alias("source_a"), "term", F.col("c").alias("ca")
    )
    b = prof.select(
        F.col(group_col).alias("source_b"), "term", F.col("c").alias("cb")
    )
    dots = (
        a.join(b, "term")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
    )
    na = F.broadcast(norms.select(F.col(group_col).alias("source_a"), F.col("ss").alias("ssa")))
    nb = F.broadcast(norms.select(F.col(group_col).alias("source_b"), F.col("ss").alias("ssb")))
    return (
        dots.join(na, "source_a")
        .join(nb, "source_b")
        .select(
            "source_a",
            "source_b",
            "dot",
            F.round(
                F.col("dot") / (F.sqrt(F.col("ssa")) * F.sqrt(F.col("ssb"))), 6
            ).alias("cos_sim"),
        )
    )


def bigram_pmi_top(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Collocation / phrase mining: the top-k adjacent word pairs by
    pointwise mutual information, PMI = ln(P(w1,w2) / (P(w1)·P(w2))) with
    P(w1,w2) = c12/N2 over bigram mass and P(w) = c/N1 over unigram mass
    — the word2vec-phrases / NPMI collocation detector that decides which
    token pairs deserve to become single vocabulary units before
    tokenizer training. ``min_count`` floors the bigram count (rare
    pairs produce unstable, spuriously-high PMI — the standard guard).
    Returns (w1, w2, c12 long, pmi double rounded 1e-6, rk long), ranked
    by (pmi desc, w1, w2).

    Determinism: all counts are exact longs; the PMI is ONE double
    expression — round(ln((1.0·c12·N1·N1) / (1.0·N2·c1·c2)), 6) — whose
    multiplication sequence is written identically in the oracle, so
    both engines evaluate the same IEEE product chain (doubles hold the
    magnitudes: 10^31 ≪ the double range; the 1e-6 round absorbs libm's
    last-ulp ln variance).

    Scale shape: ONE corpus scan, guaranteed structurally — unigrams and
    bigrams ride the same single projection (the ngram_diversity
    concat-of-transforms trick) into one (n, gram) count [the
    vocabulary+bigram-sized shuffle] which is EAGERLY localCheckpoint-ed
    (the bigram_logprob discipline: totals, unigram counts, and the
    bigram frame all branch from it with divergent column pruning, so
    exchange reuse cannot protect the scan — without the checkpoint the
    corpus would be read once per branch); totals are a 1-row aggregate
    broadcast back; the c1/c2 attachments are vocabulary-sized joins
    (AQE broadcasts real vocabularies); the global top-k is
    orderBy(desc pmi, w1, w2) + limit — Spark executes that as
    TakeOrderedAndProject: a per-partition partial top-k then a driver
    merge of k·partitions rows, NEVER a full sort or an unpartitioned
    window (the weighted_sample_es pattern; the r13 verdict flagged the
    previous row_number-over-empty-partition form, which sorted the
    entire floored bigram frame — ~10⁸-10⁹ rows at 100 TB even with the
    floor — in ONE task). The rank column attaches AFTER the limit, so
    its window input is k rows by construction."""
    from pyspark.sql.window import Window

    toks = docs.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        _tokens(text_col).alias("t")
    )
    parts = [
        F.expr(
            f"CASE WHEN size(t) >= {n} THEN"
            f" transform(sequence(1, size(t) - {n} + 1),"
            f" i -> struct({n} AS n, array_join(slice(t, i, {n}), ' ') AS gram))"
            f" ELSE array() END"
        )
        for n in (1, 2)
    ]
    counted = (
        toks.select(F.explode(F.concat(*parts)).alias("g"))
        .select(F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
        .groupBy("n", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)  # ONE corpus pass, see docstring
    )
    totals = counted.agg(
        F.sum(F.when(F.col("n") == 1, F.col("c"))).alias("n1"),
        F.sum(F.when(F.col("n") == 2, F.col("c"))).alias("n2"),
    )
    uni = counted.filter(F.col("n") == 1).select(
        F.col("gram").alias("term"), F.col("c").alias("cu")
    )
    big = (
        counted.filter((F.col("n") == 2) & (F.col("c") >= min_count))
        .select(
            F.element_at(F.split("gram", " "), 1).alias("w1"),
            F.element_at(F.split("gram", " "), 2).alias("w2"),
            F.col("c").alias("c12"),
        )
    )
    scored = (
        big.join(uni.select(F.col("term").alias("w1"), F.col("cu").alias("c1")), "w1")
        .join(uni.select(F.col("term").alias("w2"), F.col("cu").alias("c2")), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "c12",
            F.round(
                F.log(
                    (F.lit(1.0) * F.col("c12") * F.col("n1") * F.col("n1"))
                    / (F.lit(1.0) * F.col("n2") * F.col("c1") * F.col("c2"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    topk = scored.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2")).limit(k)
    # rk attaches over the k-row limit output — the window input is
    # constant-bounded, not the bigram frame (see docstring)
    w = Window.partitionBy().orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
    return topk.withColumn("rk", F.row_number().over(w).cast("long"))


def source_divergence(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source distribution-shift report: the KL divergence
    KL(P_s || P_corpus) of each source's unigram distribution from the
    whole-corpus distribution — the drift detector that flags a feed
    whose token distribution has diverged (language flip, spam
    injection, template takeover) even when every individual document
    passes the per-doc filters. Since every source term is in the corpus
    by construction, the divergence is finite with no smoothing. Returns
    (group_col, n_tokens long, kl_micro long, kl double) where kl_micro
    is the EXACT integer sum of per-term contributions quantized to
    micro-nats — round(1e6 · p_s · ln(p_s/p_c)) per term — so
    accumulation order cannot move the result (the NB/micro-unit
    discipline; kl = kl_micro/1e6 is derived for readability, never
    summed).

    Scale shape: ONE tokenize pass into a (group, term) count [the
    vocabulary × sources shuffle]; corpus term counts and totals derive
    from that frame (group-enum rollups, never a second scan); the
    per-term contribution is computed in the join projection and the KL
    is one group-keyed integer sum."""
    prof = (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(group_col), F.explode(_tokens(text_col)).alias("term"))
        .groupBy(group_col, "term")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)  # corpus + group models both derive
    )
    corpus = prof.groupBy("term").agg(F.sum("c").alias("cc"))
    gt = prof.groupBy(group_col).agg(F.sum("c").alias("nt"))
    tot = prof.agg(F.sum("c").alias("nc"))
    contrib = (
        prof.join(corpus, "term")
        .join(F.broadcast(gt), group_col)
        .crossJoin(F.broadcast(tot))
        .select(
            group_col,
            F.col("nt"),
            F.round(
                F.lit(1000000.0)
                * (F.col("c") / F.col("nt"))
                * F.log(
                    (F.lit(1.0) * F.col("c") * F.col("nc"))
                    / (F.lit(1.0) * F.col("nt") * F.col("cc"))
                ),
                0,
            ).cast("long").alias("k_micro"),
        )
    )
    return (
        contrib.groupBy(group_col)
        .agg(
            F.max("nt").alias("n_tokens"),
            F.sum("k_micro").alias("kl_micro"),
        )
        .select(
            group_col,
            "n_tokens",
            "kl_micro",
            (F.col("kl_micro") / 1000000.0).alias("kl"),
        )
    )


def concordance(
    docs: DataFrame,
    term: str,
    window: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keyword-in-context (KWIC) concordance: every occurrence of
    ``term`` with its ±window-token context — the corpus-inspection
    primitive behind "show me how this token is used" (filter-rule
    debugging, PII-pattern triage, tokenizer-merge sanity checks).
    Returns (id_col, pos long — 1-based token position, context string).

    Scale shape: zero shuffle — tokenize, positional explode, equality
    filter, and the context slice all fuse into the scan projection;
    output size is occurrence-bounded. The term filter lands AFTER the
    explode (posexplode of the token array), so the per-doc cost is the
    tokenize it already pays; for repeated interactive probes over the
    same corpus, persist the exploded (id, pos, token) frame once."""
    t = _tokens(text_col)
    base = docs.select(F.col(id_col), t.alias("t")).select(
        F.col(id_col),
        F.col("t"),
        F.posexplode(F.col("t")).alias("pos0", "tok"),
    )
    pos = F.col("pos0") + 1  # 1-based
    start = F.greatest(F.lit(1), pos - window)
    end = F.least(F.size("t"), pos + window)
    return (
        base.filter(F.col("tok") == term.lower())
        .select(
            id_col,
            pos.cast("long").alias("pos"),
            F.array_join(
                F.slice(F.col("t"), start, end - start + 1), " "
            ).alias("context"),
        )
    )
