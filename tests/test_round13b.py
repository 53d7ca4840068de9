"""Round-13 second wave: BM25 retrieval, the Naive Bayes source
classifier (exact micro-nat scoring), incremental dedup, and n-gram
diversity — hand-computed mirrors on tiny frames plus the scale-shape
plan assertions."""

from __future__ import annotations

import math

import pytest

SF = "/root/testdata/sf0.001"


# ----------------------------- BM25


def _bm25_expected(docs, query, k1=1.2, b=0.75):
    """Pure-Python Okapi BM25 with the Lucene idf, mirroring bm25_topk."""
    toks = {i: t.lower().split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    qterms = query.lower().split()
    out = {}
    for i, t in toks.items():
        score = 0.0
        matched = False
        for q in set(qterms):
            tf = t.count(q)
            if tf == 0:
                continue
            matched = True
            df = sum(1 for tt in toks.values() if q in tt)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            qtf = qterms.count(q)
            score += (
                qtf * idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl))
            )
        if matched:
            out[i] = round(score, 6)
    return out


def test_bm25_matches_pure_python_mirror(spark):
    from proteus_engine_spark.datapipe.textstats import bm25_topk

    rows = [
        (1, "spark shuffle join join join"),
        (2, "join scan"),
        (3, "filter filter scan scan scan"),
        (4, "window agg stream"),
        (5, "nothing relevant here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.query_id, r.doc_id): (r.score, r.rk)
        for r in bm25_topk(df, ["join scan", "filter"], k=10).collect()
    }
    for qid, q in enumerate(["join scan", "filter"]):
        exp = _bm25_expected(rows, q)
        ranked = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))
        for rk, (doc, score) in enumerate(ranked, start=1):
            assert got[(qid, doc)] == (pytest.approx(score, abs=2e-6), rk)
        # no zero-match rows materialize
        assert {d for (g, d) in got if g == qid} == set(exp)


def test_bm25_repeated_query_terms_weight_by_qtf(spark):
    from proteus_engine_spark.datapipe.textstats import bm25_topk

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a a b b")], "doc_id long, text string"
    )
    single = {r.doc_id: r.score for r in bm25_topk(df, ["a"], k=10).collect()}
    double = {r.doc_id: r.score for r in bm25_topk(df, ["a a"], k=10).collect()}
    for d in single:
        assert double[d] == pytest.approx(2 * single[d], abs=2e-6)


def test_bm25_doc_lengths_reuse_single_scan(spark):
    """r13 verdict item 3: with a precomputed, checkpointed doc_lengths
    frame passed back in, each bm25_topk call must scan the corpus
    exactly ONCE (the candidate-postings pass) — the length count, N,
    and avgdl all derive from the tiny (id, dl) frame. Two query
    batches over the same lengths = two single-scan plans, identical
    scores to the self-computed path."""
    from proteus_engine_spark.datapipe.textstats import bm25_topk, doc_lengths
    from proteus_engine_spark.sources import load_table

    docs = load_table(spark, SF, "documents")
    dl = doc_lengths(docs).localCheckpoint(eager=True)  # computed ONCE
    for q in (["table scan"], ["filter pushdown"]):
        out = bm25_topk(docs, q, k=5, doc_lengths=dl)
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        base_df = bm25_topk(docs, q, k=5)
        base = {(r.query_id, r.doc_id): (r.score, r.rk)
                for r in base_df.collect()}
        base_plan = base_df._jdf.queryExecution().executedPlan().toString()
        # the reuse path must drop every corpus scan except the postings
        # pass (the tf lineage prints twice under AQE+ReusedExchange, so
        # compare counts rather than assert an absolute 1): self-computed
        # lengths re-scan the corpus for dl, N and avgdl; the dl frame
        # replaces all three
        assert plan.count("Scan parquet") < base_plan.count("Scan parquet"), plan
        got = {(r.query_id, r.doc_id): (r.score, r.rk) for r in out.collect()}
        assert got == base


def test_bm25_query_terms_prune_before_the_tf_shuffle(spark):
    """The broadcast of the literal query-term table must land BELOW the
    (doc, term) aggregation — the postings shuffle carries candidates
    only. Assert the executed plan joins the token stream to a broadcast
    BEFORE any hash aggregate over (doc_id, term)."""
    from proteus_engine_spark.datapipe.textstats import bm25_topk
    from proteus_engine_spark.sources import load_table

    docs = load_table(spark, SF, "documents")
    out = bm25_topk(docs, ["table scan"], k=5)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ----------------------------- Naive Bayes


def test_nb_matches_hand_model(spark):
    """Two classes, tiny vocab — every model weight checked by hand:
    loglik = ln((n_ct + 1) / (n_c + V)), prior = ln(docs_c / docs),
    quantized to integer micro-nats; doc scores are exact integer sums."""
    from proteus_engine_spark.datapipe.classify import nb_classify, nb_token_model

    train = spark.createDataFrame(
        [
            (1, "spam", "buy buy cheap"),
            (2, "spam", "cheap buy"),
            (3, "ham", "meeting notes agenda"),
        ],
        "doc_id long, source string, text string",
    )
    ev = spark.createDataFrame(
        [(10, "buy cheap cheap"), (11, "agenda notes"), (12, "unknownword")],
        "doc_id long, text string",
    )
    priors, lik = nb_token_model(train, class_col="source")
    got_lik = {(r.source, r.term): r.loglik_micro for r in lik.collect()}
    # vocab = {buy, cheap, meeting, notes, agenda}, V=5
    # spam: n_c=5 -> buy: ln(4/10), cheap: ln(3/10), meeting: ln(1/10)
    assert got_lik[("spam", "buy")] == round(math.log(4 / 10) * 1e6)
    assert got_lik[("spam", "cheap")] == round(math.log(3 / 10) * 1e6)
    assert got_lik[("spam", "meeting")] == round(math.log(1 / 10) * 1e6)
    # ham: n_c=3 -> notes: ln(2/8), buy: ln(1/8)
    assert got_lik[("ham", "notes")] == round(math.log(2 / 8) * 1e6)
    assert got_lik[("ham", "buy")] == round(math.log(1 / 8) * 1e6)
    assert len(got_lik) == 10  # dense: 5 terms x 2 classes

    got = {r.doc_id: (r.predicted, r.score_micro) for r in
           nb_classify(ev, priors, lik, class_col="source").collect()}
    p_spam = round(math.log(2 / 3) * 1e6)
    p_ham = round(math.log(1 / 3) * 1e6)
    s10 = p_spam + round(math.log(4 / 10) * 1e6) + 2 * round(math.log(3 / 10) * 1e6)
    assert got[10] == ("spam", s10)
    # "agenda notes": both terms occur once in ham -> ln((1+1)/(3+5)) each
    s11 = p_ham + 2 * round(math.log(2 / 8) * 1e6)
    assert got[11] == ("ham", s11)
    # OOV-only doc falls back to the prior argmax (spam: 2/3 > 1/3)
    assert got[12] == ("spam", p_spam)


def test_nb_tie_breaks_by_ascending_class(spark):
    from proteus_engine_spark.datapipe.classify import nb_classify, nb_token_model

    train = spark.createDataFrame(
        [(1, "b_class", "x"), (2, "a_class", "x")],
        "doc_id long, source string, text string",
    )
    ev = spark.createDataFrame([(9, "x")], "doc_id long, text string")
    priors, lik = nb_token_model(train, class_col="source")
    row = nb_classify(ev, priors, lik, class_col="source").collect()[0]
    assert row.predicted == "a_class"


def test_nb_min_count_prunes_vocab_and_renormalizes(spark):
    from proteus_engine_spark.datapipe.classify import nb_token_model

    train = spark.createDataFrame(
        [(1, "c", "a a a b")], "doc_id long, source string, text string"
    )
    _, lik = nb_token_model(train, class_col="source", min_count=2)
    got = {r.term: r.loglik_micro for r in lik.collect()}
    # vocab prunes to {a}; n_c counts only pruned-vocab tokens (3), V=1
    assert set(got) == {"a"}
    assert got["a"] == round(math.log(4 / 4) * 1e6)


# ----------------------------- incremental dedup


def test_incremental_dedup_drops_corpus_hits_and_batch_copies(spark):
    from proteus_engine_spark.datapipe.dedup import incremental_dedup

    corpus = spark.createDataFrame(
        [(1, "already kept"), (2, "old text")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, "already kept"),   # drops: digest in corpus
            (11, "fresh text"),     # survives
            (12, "fresh text"),     # collapses into 11
            (13, "other fresh"),    # survives
        ],
        "doc_id long, text string",
    )
    got = {
        r.keep_id: r.n_batch_copies
        for r in incremental_dedup(batch, corpus).collect()
    }
    assert got == {11: 2, 13: 1}


def test_incremental_dedup_shuffles_digests_not_text(spark):
    """Neither exchange in the executed plan may carry the text column."""
    from pyspark.sql import functions as F  # noqa: F401

    from proteus_engine_spark.datapipe.dedup import incremental_dedup
    from proteus_engine_spark.sources import load_table

    docs = load_table(spark, SF, "documents")
    out = incremental_dedup(
        docs.filter("doc_id % 3 = 0"), docs.filter("doc_id % 2 = 0")
    )
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text#" not in line


# ----------------------------- n-gram diversity


def test_ngram_diversity_known_counts(spark):
    from proteus_engine_spark.datapipe.textstats import ngram_diversity

    df = spark.createDataFrame(
        [
            (1, "s1", "a b a b"),
            (2, "s1", "a b"),
            (3, "s2", "x"),
            (4, "s2", "   "),  # whitespace-only: contributes nothing
        ],
        "doc_id long, source string, text string",
    )
    got = {
        (r.source, r.n): (r.total_ngrams, r.distinct_ngrams, r.distinct_ratio)
        for r in ngram_diversity(df).collect()
    }
    # s1 unigrams: a,b,a,b,a,b -> 6 total, 2 distinct
    assert got[("s1", 1)] == (6, 2, round(2 / 6, 6))
    # s1 bigrams: "a b","b a","a b" + "a b" -> 4 total, 2 distinct
    assert got[("s1", 2)] == (4, 2, 0.5)
    # s1 trigrams: "a b a","b a b" -> 2 total 2 distinct
    assert got[("s1", 3)] == (2, 2, 1.0)
    # s2: single 1-token doc; no bigrams/trigrams rows
    assert got[("s2", 1)] == (1, 1, 1.0)
    assert ("s2", 2) not in got
    assert ("s2", 3) not in got


def test_ngram_diversity_single_tokenize_pass(spark):
    """One corpus scan: the per-n gram arrays are built in one projection
    and exploded once — a union-of-branches shape would scan the parquet
    once (or twice) per n."""
    from proteus_engine_spark.datapipe.textstats import ngram_diversity
    from proteus_engine_spark.sources import load_table

    docs = load_table(spark, SF, "documents")
    out = ngram_diversity(docs)
    out.collect()
    # the optimized logical plan has exactly ONE relation node (the AQE
    # executed-plan string re-prints materialized query-stage subtrees,
    # so counting scans there double-counts the same scan)
    logical = out._jdf.queryExecution().optimizedPlan().toString()
    assert logical.count("Relation [") == 1


# ----------------------------- kNN classify / hard negatives


def _unit(v):
    n = sum(x * x for x in v) ** 0.5
    return [x / n for x in v]


def test_knn_classify_majority_and_mass_tiebreak(spark):
    from proteus_engine_spark.datapipe.similarity import knn_classify

    # corpus: two labels; query sits nearest three label-1 vectors
    corpus = spark.createDataFrame(
        [
            (1, _unit([1.0, 0.0]), 1),
            (2, _unit([0.9, 0.1]), 1),
            (3, _unit([0.8, 0.2]), 1),
            (4, _unit([0.0, 1.0]), 2),
            (5, _unit([0.1, 0.9]), 2),
        ],
        "c_id long, vec array<double>, label int",
    )
    q = spark.createDataFrame(
        [(100, _unit([1.0, 0.05]))], "q_id long, vec array<double>"
    )
    row = knn_classify(q, corpus, k=5).collect()[0]
    assert (row.q_id, row.predicted, row.votes) == (100, 1, 3)

    # 2-vs-2 vote (k=4 over a 4-vector corpus): similarity mass decides
    corpus22 = corpus.filter("c_id != 3")
    row = knn_classify(q, corpus22, k=4).collect()[0]
    assert row.predicted == 1 and row.votes == 2


def test_knn_label_tiebreak_is_ascending(spark):
    from proteus_engine_spark.datapipe.similarity import knn_classify

    # perfectly symmetric: one neighbor per label at the same similarity
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0], 7), (2, [0.0, 1.0], 3)],
        "c_id long, vec array<double>, label int",
    )
    q = spark.createDataFrame(
        [(9, _unit([1.0, 1.0]))], "q_id long, vec array<double>"
    )
    row = knn_classify(q, corpus, k=2).collect()[0]
    assert row.predicted == 3  # equal votes, equal mass -> smaller label


def test_hard_negatives_exclude_same_label(spark):
    from proteus_engine_spark.datapipe.similarity import hard_negative_topk

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 1),     # anchor
            (2, [0.99, 0.01], 1),   # same label: never a negative
            (3, [0.9, 0.1], 2),     # hard negative (closest cross-label)
            (4, [0.0, 1.0], 2),
        ],
        "c_id long, vec array<double>, label int",
    )
    anchors = corpus.filter("c_id = 1").selectExpr(
        "c_id as q_id", "vec", "label"
    )
    got = hard_negative_topk(anchors, corpus, k=2).collect()
    ids = [(r.c_id, r.rank) for r in sorted(got, key=lambda r: r.rank)]
    assert ids == [(3, 1), (4, 2)]


# ----------------------------- source profile similarity


def test_source_profile_similarity_exact_counts(spark):
    from proteus_engine_spark.datapipe.textstats import source_profile_similarity

    df = spark.createDataFrame(
        [
            (1, "m1", "a a b"),
            (2, "m2", "a b b"),
            (3, "m3", "zz"),
        ],
        "doc_id long, source string, text string",
    )
    got = {(r.source_a, r.source_b): (r.dot, r.cos_sim)
           for r in source_profile_similarity(df).collect()}
    # m1 profile {a:2, b:1}, m2 {a:1, b:2}: dot=4, |m1|=|m2|=sqrt(5)
    assert got[("m1", "m2")] == (4, round(4 / 5, 6))
    # m3 shares no terms: pair row absent (cos 0 by construction)
    assert ("m1", "m3") not in got and ("m2", "m3") not in got
    assert set(got) == {("m1", "m2")}


def test_source_profile_identical_sources_score_one(spark):
    from proteus_engine_spark.datapipe.textstats import source_profile_similarity

    df = spark.createDataFrame(
        [(1, "s1", "x y x"), (2, "s2", "x y x"), (3, "s2", "")],
        "doc_id long, source string, text string",
    )
    row = source_profile_similarity(df).collect()[0]
    assert (row.source_a, row.source_b, row.cos_sim) == ("s1", "s2", 1.0)


# ----------------------------- RRF fusion / doc-as-query BM25


def test_rrf_fuse_known_values(spark):
    from proteus_engine_spark.datapipe.similarity import rrf_fuse

    r1 = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)], "q_id long, c_id long, rank long"
    )
    r2 = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2)], "q_id long, c_id long, rank long"
    )
    got = {r.c_id: (r.rrf_score, r.rank)
           for r in rrf_fuse([r1, r2], k=60, topk=10).collect()}
    # 11: 1/62 + 1/61 ; 10: 1/61 ; 13: 1/62 ; 12: 1/63
    assert got[11] == (round(1 / 62 + 1 / 61, 6), 1)
    assert got[10] == (round(1 / 61, 6), 2)
    assert got[13] == (round(1 / 62, 6), 3)
    assert got[12] == (round(1 / 63, 6), 4)


def test_rrf_fuse_tie_breaks_by_candidate_id(spark):
    from proteus_engine_spark.datapipe.similarity import rrf_fuse

    r1 = spark.createDataFrame(
        [(0, 20, 1), (0, 5, 1)], "q_id long, c_id long, rank long"
    )  # same rank twice (two tied systems' outputs unioned)
    got = [(r.c_id, r.rank) for r in
           sorted(rrf_fuse([r1], k=60, topk=2).collect(), key=lambda r: r.rank)]
    assert got == [(5, 1), (20, 2)]


def test_bm25_query_terms_frame_matches_literal_queries(spark):
    """The doc-as-query frame path must reproduce the literal-list path
    when fed the identical (query_id, term, qtf) rows."""
    from pyspark.sql import functions as F

    from proteus_engine_spark.datapipe.textstats import bm25_topk

    df = spark.createDataFrame(
        [(1, "join scan scan"), (2, "join join"), (3, "scan filter")],
        "doc_id long, text string",
    )
    via_list = bm25_topk(df, ["join scan"], k=10).collect()
    qdf = spark.createDataFrame(
        [(0, "join", 1), (0, "scan", 1)], "query_id long, term string, qtf long"
    )
    via_frame = bm25_topk(df, query_terms=qdf, k=10).collect()
    key = lambda r: (r.query_id, r.doc_id)
    assert sorted(([r.query_id, r.doc_id, r.score, r.rk] for r in via_list)) == \
           sorted(([r.query_id, r.doc_id, r.score, r.rk] for r in via_frame))

    with pytest.raises(ValueError):
        bm25_topk(df)  # neither
    with pytest.raises(ValueError):
        bm25_topk(df, ["a"], query_terms=qdf)  # both


# ----------------------------- bigram PMI


def test_bigram_pmi_hand_computed(spark):
    from proteus_engine_spark.datapipe.textstats import bigram_pmi_top

    # corpus: "a b" x3, "a c" x1  ->  unigrams: a:4 b:3 c:1 + trailing
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "a c")], "doc_id long, text string"
    )
    got = {(r.w1, r.w2): (r.c12, r.pmi, r.rk)
           for r in bigram_pmi_top(df, min_count=1, k=10).collect()}
    # unigram counts: a:4, b:3, c:1 ; N1=8. bigrams within docs:
    # doc1: (a,b)x3, (b,a)x2 ; doc2: (a,c) ; N2=6
    n1, n2 = 8, 6
    exp_ab = round(math.log((1.0 * 3 * n1 * n1) / (1.0 * n2 * 4 * 3)), 6)
    exp_ba = round(math.log((1.0 * 2 * n1 * n1) / (1.0 * n2 * 3 * 4)), 6)
    exp_ac = round(math.log((1.0 * 1 * n1 * n1) / (1.0 * n2 * 4 * 1)), 6)
    assert got[("a", "b")][0:2] == (3, exp_ab)
    assert got[("b", "a")][0:2] == (2, exp_ba)
    assert got[("a", "c")][0:2] == (1, exp_ac)
    # ranking: ab and ac TIE at ln(8/3) (192/72 == 64/24) -> (w1, w2)
    # tie-break puts ab first; ba (ln 16/9) ranks last
    assert got[("a", "b")][2] == 1
    assert got[("a", "c")][2] == 2
    assert got[("b", "a")][2] == 3


def test_bigram_pmi_min_count_floor(spark):
    from proteus_engine_spark.datapipe.textstats import bigram_pmi_top

    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "a c")], "doc_id long, text string"
    )
    got = {(r.w1, r.w2) for r in bigram_pmi_top(df, min_count=3, k=10).collect()}
    assert got == {("a", "b")}


def test_bigram_pmi_single_corpus_scan(spark):
    from proteus_engine_spark.datapipe.textstats import bigram_pmi_top
    from proteus_engine_spark.sources import load_table

    out = bigram_pmi_top(load_table(spark, SF, "documents"), min_count=5, k=20)
    out.collect()
    # the eager checkpoint on the (n, gram) count is the ONLY corpus
    # read: no parquet relation survives into the result plan (totals /
    # unigram / bigram branches all derive from the checkpointed RDD)
    logical = out._jdf.queryExecution().optimizedPlan().toString()
    assert logical.count("Relation [") == 0


def test_bigram_pmi_topk_is_take_ordered(spark):
    """r13 verdict scale-killer fix: the global top-k must run as
    TakeOrderedAndProject (per-partition partial top-k + driver merge),
    never as a row_number over an unpartitioned window sorting the whole
    floored bigram frame in one task. The only Window in the plan is the
    rank attachment ABOVE the limit — its input is k rows."""
    from proteus_engine_spark.datapipe.textstats import bigram_pmi_top
    from proteus_engine_spark.sources import load_table

    out = bigram_pmi_top(load_table(spark, SF, "documents"), min_count=5, k=20)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # the rank window must sit above the limit, not below it: everything
    # AFTER the Window operator line must not contain the TakeOrdered
    widx, tidx = plan.index("Window"), plan.index("TakeOrderedAndProject")
    assert widx < tidx  # executed-plan strings print top-down


# ----------------------------- best-copy cluster resolution / bucketed batches


def test_cluster_keep_best_elects_longest(spark):
    from proteus_engine_spark.datapipe.dedup import cluster_keep_best

    docs = spark.createDataFrame(
        [
            (1, 10),   # cluster {1,2,3}: 2 is longest -> rep
            (2, 50),
            (3, 50),   # ties with 2 on quality -> lower id (2) wins
            (9, 7),    # singleton keeps itself
        ],
        "doc_id long, n_chars long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: (r.cluster_rep, r.is_kept)
           for r in cluster_keep_best(docs, pairs, "n_chars").collect()}
    assert got == {1: (2, False), 2: (2, True), 3: (2, False), 9: (9, True)}


def test_bucketed_batches_assignment(spark):
    from proteus_engine_spark.datapipe.sampling import bucketed_batches

    rows = [(i, "w " * (5 if i < 5 else 40)) for i in range(8)]
    df = spark.createDataFrame(
        [(i, t.strip()) for i, t in rows], "doc_id long, text string"
    )
    got = {r.doc_id: (r.bucket, r.batch_id, r.pos_in_batch)
           for r in bucketed_batches(df, batch_size=2, bucket_width=32).collect()}
    # docs 0-4: 5 tokens -> bucket 0; docs 5-7: 40 tokens -> bucket 1
    assert got[0] == (0, 0, 0) and got[1] == (0, 0, 1)
    assert got[2] == (0, 1, 0) and got[3] == (0, 1, 1)
    assert got[4] == (0, 2, 0)           # remainder batch of 1
    assert got[5] == (1, 0, 0) and got[6] == (1, 0, 1)
    assert got[7] == (1, 1, 0)


def test_bucketed_batches_no_per_bucket_window(spark):
    """The rank-in-bucket must come from the two-phase zip_with_index +
    broadcast offsets, never a data-keyed window: zip_with_index's OWN
    windows (per-partition-id local index; partition-count-sized offset
    cumsum) are parallel/bounded by construction — what must NOT appear
    is a window partitioned by the data-cardinality bucket column."""
    from proteus_engine_spark.datapipe.sampling import bucketed_batches
    from proteus_engine_spark.sources import load_table

    out = bucketed_batches(load_table(spark, SF, "documents"), 8, 32)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(bucket" not in plan


# ----------------------------- fixed-N sample / source divergence


def test_fixed_n_sample_exact_counts_and_permutation(spark):
    import hashlib

    from proteus_engine_spark.datapipe.sampling import fixed_n_sample

    rows = [(i, "g1" if i < 20 else "g2") for i in range(23)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = fixed_n_sample(df, 5, group_col="source", key_col="doc_id").collect()
    by_group = {}
    for r in got:
        by_group.setdefault(r.source, []).append((r.rank_in_group, r.doc_id))
    # g1 (20 rows) keeps exactly 5; g2 (3 rows) keeps all 3
    assert len(by_group["g1"]) == 5 and len(by_group["g2"]) == 3
    # the kept set + order mirror the md5 permutation
    for g, members in (("g1", range(20)), ("g2", range(20, 23))):
        perm = sorted(members, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        expect = [(rk, i) for rk, i in enumerate(perm[:5])]
        assert sorted(by_group[g]) == expect


def test_fixed_n_sample_no_per_group_window(spark):
    from proteus_engine_spark.datapipe.sampling import fixed_n_sample
    from proteus_engine_spark.sources import load_table

    out = fixed_n_sample(load_table(spark, SF, "documents"), 10)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(source" not in plan


def test_source_divergence_identical_sources_zero_kl(spark):
    from proteus_engine_spark.datapipe.textstats import source_divergence

    df = spark.createDataFrame(
        [(1, "s1", "a b c"), (2, "s2", "a b c")],
        "doc_id long, source string, text string",
    )
    got = {r.source: (r.n_tokens, r.kl_micro) for r in source_divergence(df).collect()}
    # both sources have the corpus distribution -> KL exactly 0
    assert got == {"s1": (3, 0), "s2": (3, 0)}


def test_source_divergence_matches_hand_kl(spark):
    from proteus_engine_spark.datapipe.textstats import source_divergence

    df = spark.createDataFrame(
        [(1, "s1", "a a b"), (2, "s2", "b")],
        "doc_id long, source string, text string",
    )
    # corpus: a:2, b:2 (N=4); s1: a:2/3, b:1/3 (nt=3); s2: b:1 (nt=1)
    def micro(x):
        import math
        return round(1e6 * x[0] * math.log(x[1]))
    s1 = micro((2 / 3, (2 * 4) / (3 * 2))) + micro((1 / 3, (1 * 4) / (3 * 2)))
    s2 = micro((1.0, (1 * 4) / (1 * 2)))
    got = {r.source: r.kl_micro for r in source_divergence(df).collect()}
    assert got == {"s1": s1, "s2": s2}


# ----------------------------- Misra-Gries heavy hitters


def test_misra_gries_exact_when_k_covers_cardinality(spark):
    from proteus_engine_spark.datapipe.sketches import misra_gries_heavy_hitters

    df = spark.createDataFrame(
        [(x,) for x in ["a"] * 5 + ["b"] * 3 + ["c"] * 2], "item string"
    )
    got = {r.item: r.est for r in
           misra_gries_heavy_hitters(df, "item", k=8).collect()}
    assert got == {"a": 5, "b": 3, "c": 2}


def test_misra_gries_bounds_under_decrement_pressure(spark):
    """k=2 over a 1-partition stream with 5 distinct items: estimates
    must never overcount, undercount by <= N/(k+1), and every item with
    true count > N/(k+1) must be present."""
    from proteus_engine_spark.datapipe.sketches import misra_gries_heavy_hitters

    stream = ["a"] * 40 + ["b"] * 25 + ["c"] * 3 + ["d"] * 2 + ["e"] * 2
    exact = {"a": 40, "b": 25, "c": 3, "d": 2, "e": 2}
    n = len(stream)
    df = spark.createDataFrame([(x,) for x in stream], "item string").coalesce(1)
    got = {r.item: r.est for r in
           misra_gries_heavy_hitters(df, "item", k=2).collect()}
    bound = n / 3  # N/(k+1)
    for item, est in got.items():
        assert est <= exact[item]
        assert exact[item] - est <= bound
    for item, c in exact.items():
        if c > bound:
            assert item in got


def test_misra_gries_merge_across_partitions(spark):
    from proteus_engine_spark.datapipe.sketches import misra_gries_heavy_hitters

    stream = ["x"] * 50 + ["y"] * 30 + ["z"] * 20
    df = spark.createDataFrame([(v,) for v in stream], "item string").repartition(4)
    got = {r.item: r.est for r in
           misra_gries_heavy_hitters(df, "item", k=8).collect()}
    # k covers the cardinality in every partition -> merged sums are exact
    assert got == {"x": 50, "y": 30, "z": 20}


# ----------------------------- Count-Min sketch / concordance


def test_count_min_never_undercounts_and_zero_for_absent(spark):
    from pyspark.sql import functions as F

    from proteus_engine_spark.datapipe.sketches import (
        count_min_estimate,
        count_min_table,
    )

    stream = ["a"] * 10 + ["b"] * 4 + ["c"] * 1
    df = spark.createDataFrame([(v,) for v in stream], "item string")
    table = count_min_table(df, "item", depth=4, width=64)
    # table mass: every row of the sketch holds the full stream count
    mass = {r.row: r.c for r in
            table.groupBy("row").agg(F.sum("c").alias("c")).collect()}
    assert mass == {0: 15, 1: 15, 2: 15, 3: 15}
    q = spark.createDataFrame([("a",), ("b",), ("c",), ("zz",)], "item string")
    got = {r.item: r.est for r in
           count_min_estimate(table, q, "item", depth=4, width=64).collect()}
    assert got["a"] >= 10 and got["b"] >= 4 and got["c"] >= 1
    for k, exact in (("a", 10), ("b", 4), ("c", 1)):
        assert got[k] - exact <= 15  # trivially within eN at tiny width
    # an item never inserted can only collide; with 3 distinct items in
    # 64 buckets x 4 rows the min cell is overwhelmingly 0 — and never
    # negative
    assert got["zz"] >= 0


def test_count_min_measured_margin(spark):
    """Tripwire for the agg_count_min_bounds verdict (r13 advice): the
    gate asserts the ANALYTIC e·N/width overcount bound (as 3N/256 in
    integers); this test RECORDS the measured max overcount on the gate
    corpus so drift toward the bound is visible before it flips the
    verdict. Fails only if the analytic bound itself is breached."""
    from pyspark.sql import functions as F

    from proteus_engine_spark.datapipe.sketches import (
        count_min_estimate,
        count_min_table,
    )
    from proteus_engine_spark.sources import load_table

    toks = load_table(spark, SF, "documents").select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("token")
    )
    table = count_min_table(toks, "token", depth=4, width=256)
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact_n"))
    total = exact.agg(F.sum("exact_n")).collect()[0][0]
    heavy = exact.filter(F.col("exact_n") >= total // 64)
    est = {r.token: r.est for r in count_min_estimate(
        table, heavy.select("token"), "token", depth=4, width=256).collect()}
    over = [est[r.token] - r.exact_n for r in heavy.collect()]
    bound = 3 * total // 256
    print(f"count-min measured max overcount={max(over)} "
          f"analytic bound (3N/256)={bound} N={total}")
    assert min(over) >= 0  # CM never undercounts (deterministic)
    assert max(over) <= bound


def test_count_min_width_one_degenerates_to_total(spark):
    from proteus_engine_spark.datapipe.sketches import (
        count_min_estimate,
        count_min_table,
    )

    df = spark.createDataFrame([("x",), ("y",), ("y",)], "item string")
    table = count_min_table(df, "item", depth=2, width=1)
    q = spark.createDataFrame([("x",)], "item string")
    got = count_min_estimate(table, q, "item", depth=2, width=1).collect()[0]
    assert got.est == 3  # every item shares the single cell


def test_concordance_positions_and_clipped_windows(spark):
    from proteus_engine_spark.datapipe.textstats import concordance

    df = spark.createDataFrame(
        [(1, "alpha beta TARGET gamma delta epsilon"),
         (2, "target at start here"),
         (3, "no match at all")],
        "doc_id long, text string",
    )
    got = {(r.doc_id, r.pos): r.context
           for r in concordance(df, "target", window=2).collect()}
    assert got == {
        (1, 3): "alpha beta target gamma delta",
        (2, 1): "target at start",
    }


# ----------------------------- ES weighted sampling


def test_weighted_sample_matches_python_mirror(spark):
    from proteus_engine_spark.datapipe.sampling import weighted_sample_es

    rows = [(i, (i * 37) % 200 + 1) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = [(r.doc_id, r.weight, r.es_micro) for r in
           weighted_sample_es(df, n=10).collect()]

    m = 2147483647
    def es(i, w):
        u = (i % (m - 1)) + 1  # seed in [1, m-1]: u never 0
        for _ in range(3):
            u = (48271 * u) % m
        return round(1e6 * math.log(u / m) / max(w, 1))
    exp = sorted(
        ((i, max(w, 1), es(i, w)) for i, w in rows),
        key=lambda t: (-t[2], t[0]),
    )[:10]
    assert sorted(got, key=lambda t: (-t[2], t[0])) == exp


def test_weighted_sample_uniforms_not_degenerate(spark):
    """r13 advice: one Lehmer step is monotone for keys < ~44,488, so
    sequential doc_ids (every gate SF) got uniforms confined to
    (2e-5, 0.112] and the draw degenerated into largest-id-first. The
    iterated step must (a) NOT be monotone over sequential keys and
    (b) span the unit interval — both tails present."""
    m = 2147483647
    us = []
    for i in range(5000):  # the sf0.01 doc_id range
        u = (i % (m - 1)) + 1
        for _ in range(3):
            u = (48271 * u) % m
        us.append(u / m)
    assert min(us) < 0.01 and max(us) > 0.99
    diffs = [b - a for a, b in zip(us, us[1:])]
    assert any(d < 0 for d in diffs) and any(d > 0 for d in diffs)
    # spread: every decile of (0,1) is hit by some sequential key
    assert {int(u * 10) for u in us} == set(range(10))


def test_weighted_sample_zero_weight_guard(spark):
    from proteus_engine_spark.datapipe.sampling import weighted_sample_es

    df = spark.createDataFrame([(1, 0), (2, 5)], "doc_id long, n_chars long")
    got = {r.doc_id: r.weight for r in weighted_sample_es(df, n=2).collect()}
    assert got == {1: 1, 2: 5}


def test_weighted_sample_plan_is_take_ordered(spark):
    from proteus_engine_spark.datapipe.sampling import weighted_sample_es
    from proteus_engine_spark.sources import load_table

    out = weighted_sample_es(load_table(spark, SF, "documents"), n=50)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_brute_force_topk_gemm_matches_fold(spark):
    """The BLAS path must reproduce the fold path tuple-for-tuple —
    same HALF_UP 1e-6 quantization, same (cos desc, c_id) cut."""
    from pyspark.sql import functions as F

    from proteus_engine_spark.datapipe.similarity import brute_force_topk
    from proteus_engine_spark.sources import load_table

    emb = load_table(spark, SF, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    q = emb.filter("vec_id < 7").select(F.col("vec_id").alias("q_id"), vec.alias("vec"))
    c = emb.select(F.col("vec_id").alias("c_id"), vec.alias("vec"))
    fold = brute_force_topk(q, c, k=5, method="fold").collect()
    gemm = brute_force_topk(q, c, k=5, method="gemm").collect()
    key = lambda r: (r.q_id, r.rank)
    assert sorted(([r.q_id, r.c_id, r.cos_sim, r.rank] for r in fold)) == \
           sorted(([r.q_id, r.c_id, r.cos_sim, r.rank] for r in gemm))

    with pytest.raises(ValueError):
        brute_force_topk(q, c, k=5, method="nope")


# ----------------------------- fuzzy incremental dedup


def test_incremental_fuzzy_drops_near_dups_not_distinct(spark):
    from proteus_engine_spark.datapipe.decontam import fuzzy_overlap_pairs

    # 20 tokens -> 18 shingles; a single edited token kills 3 of them,
    # leaving J = 15/21 ~ 0.714 >= 0.5 (a 10-token doc would fall to
    # 5/11 ~ 0.45 and miss the threshold)
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon")
    corpus = spark.createDataFrame(
        [(100, base), (101, "totally different words entirely here now ok yes")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (1, base),                                  # verbatim re-crawl
            (2, base.replace("delta", "DELTA!")),       # light edit, J >= 0.5
            (3, "unrelated fresh content nothing shared with anything"),
        ],
        "doc_id long, text string",
    )
    pairs = fuzzy_overlap_pairs(batch, corpus, jaccard_threshold=0.5)
    matched = {r.doc_id for r in pairs.select("doc_id").distinct().collect()}
    assert 1 in matched and 2 in matched and 3 not in matched
