"""Unigram-LM scoring, BM25 retrieval, Bloom decontamination
(pipeline/scoring.py)."""

import pytest
from pyspark.sql import functions as F

from steel_datafusion_spark.pipeline.scoring import (
    bloom_bit_positions, bloom_decontaminate, bm25_score,
    unigram_logprob_score,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_unigram_rare_tokens_score_higher(spark):
    rows = [(i, "common words common words common") for i in range(10)]
    rows.append((100, "zebra quark xylophone obelisk glyph"))
    rows.append((101, ""))
    out = {r.doc_id: r for r in
           unigram_logprob_score(_docs(spark, rows)).collect()}
    # identical docs -> identical scores
    assert len({out[i].mean_neg_logprob for i in range(10)}) == 1
    # all-rare doc carries much higher mean -ln p than the common docs
    assert out[100].mean_neg_logprob > out[0].mean_neg_logprob
    # empty doc: zero tokens, score 0
    assert out[101].n_tokens == 0 and out[101].mean_neg_logprob == 0.0
    assert out[0].n_tokens == 5


def test_unigram_score_is_plain_average(spark):
    """Single-token docs: score == -ln p of that token exactly (up to the
    documented 9dp term rounding)."""
    import math

    rows = [(1, "a"), (2, "a"), (3, "b")]
    out = {r.doc_id: r for r in
           unigram_logprob_score(_docs(spark, rows), alpha=0.5).collect()}
    total, vocab = 3.0, 2.0
    pa = (2 + 0.5) / (total + 0.5 * vocab)
    pb = (1 + 0.5) / (total + 0.5 * vocab)
    assert out[1].mean_neg_logprob == round(round(-math.log(pa), 9), 6)
    assert out[3].mean_neg_logprob == round(round(-math.log(pb), 9), 6)
    assert out[1].mean_neg_logprob < out[3].mean_neg_logprob


def test_bm25_orders_by_relevance(spark):
    rows = [
        (1, "spark spark spark query engine"),   # tf=3 for 'spark'
        (2, "spark appears once here only"),
        (3, "totally unrelated text about cats"),
        (4, "spark query spark query data"),     # two matching terms
    ]
    out = bm25_score(_docs(spark, rows), ["spark", "query"], k=10).collect()
    got = {r.doc_id: r for r in out}
    assert 3 not in got                           # no query term, no row
    assert got[4].rnk == 1                        # covers both terms
    assert got[1].bm25 > got[2].bm25              # higher tf wins
    with pytest.raises(ValueError):
        bm25_score(_docs(spark, rows), [])


def test_bm25_k_caps_results(spark):
    rows = [(i, f"spark doc number {i}") for i in range(30)]
    out = bm25_score(_docs(spark, rows), ["spark"], k=7).collect()
    assert len(out) == 7 and sorted(r.rnk for r in out) == list(range(1, 8))


def test_bloom_no_false_negatives(spark):
    """Benchmark docs screened against their own filter: every gram hits
    (n_hits == n_grams), flagged everywhere."""
    rows = [(i, f"shared prefix words here tail_{i} more filler text ok")
            for i in range(20)]
    d = _docs(spark, rows)
    out = {r.doc_id: r for r in
           bloom_decontaminate(d, d, n=3, bits=4096, k_hashes=4).collect()}
    for r in out.values():
        assert r.n_hits == r.n_grams > 0 and r.flagged


def test_bloom_disjoint_corpus_unflagged(spark):
    """A corpus sharing no 3-grams with the benchmark: at 4096 bits /
    4 hashes and this few grams, the deterministic filter has no false
    positives (verified fixture), so nothing flags."""
    bench = _docs(spark, [(1, "alpha beta gamma delta epsilon zeta")])
    corpus = _docs(spark, [(10, "one two three four five six seven"),
                           (11, "eight nine ten eleven twelve")])
    out = {r.doc_id: r for r in
           bloom_decontaminate(corpus, bench, n=3,
                               bits=4096, k_hashes=4).collect()}
    assert not out[10].flagged and not out[11].flagged
    assert out[10].n_hits == 0 and out[10].n_grams > 0


def test_bloom_bit_positions_bounded_and_validated(spark):
    bench = _docs(spark, [(1, "some benchmark text with several tokens")])
    pos = bloom_bit_positions(bench, bits=256, k_hashes=3).collect()
    assert 0 < len(pos) <= 256
    assert all(0 <= r.pos < 256 for r in pos)
    with pytest.raises(ValueError):
        bloom_bit_positions(bench, k_hashes=0)


def test_bloom_partial_overlap_counts(spark):
    """Corpus doc sharing exactly its prefix 3-grams with the benchmark:
    n_hits >= the true shared-gram count (Bloom may only ADD false
    positives, never lose true hits)."""
    shared = "alpha beta gamma delta"           # 2 distinct 3-grams
    bench = _docs(spark, [(1, shared)])
    corpus = _docs(spark, [(10, shared + " unique tail here"),
                           (11, "unrelated content entirely different")])
    out = {r.doc_id: r for r in
           bloom_decontaminate(corpus, bench, n=3,
                               bits=4096, k_hashes=4).collect()}
    assert out[10].flagged and out[10].n_hits >= 2
    assert not out[11].flagged


# ---------------------------------------------------------------------------
# n-gram novelty
# ---------------------------------------------------------------------------

def test_ngram_novelty_flags_shared_text(spark):
    from steel_datafusion_spark.pipeline.scoring import ngram_novelty_score

    shared = "the quick brown fox jumps over the lazy dog"
    rows = [(1, shared), (2, shared + " tail one"),
            (3, "completely different words appear in this document")]
    out = {r.doc_id: r for r in
           ngram_novelty_score(_docs(spark, rows), n=3).collect()}
    # doc 1 is wholly contained in doc 2's gram set
    assert out[1].novelty == 0.0
    assert out[1].shared_grams == out[1].n_grams
    # doc 2 shares doc 1's grams but its tail grams are unique
    assert 0.0 < out[2].novelty < 1.0
    # doc 3 shares nothing
    assert out[3].novelty == 1.0 and out[3].shared_grams == 0


def test_ngram_novelty_short_doc_whole_shingle(spark):
    from steel_datafusion_spark.pipeline.scoring import ngram_novelty_score

    rows = [(1, "two words"), (2, "two words"), (3, "other pair")]
    out = {r.doc_id: r for r in
           ngram_novelty_score(_docs(spark, rows), n=3).collect()}
    # <n tokens -> one whole-doc shingle; identical short docs share it
    assert out[1].n_grams == 1 and out[1].novelty == 0.0
    assert out[3].novelty == 1.0


def test_bigram_logprob_flags_word_salad(spark):
    from steel_datafusion_spark.pipeline.scoring import bigram_logprob_score

    # corpus where "the quick fox" sequences recur; doc 4 shuffles the
    # same words into unseen orders -> higher mean -ln p under bigrams
    docs = spark.createDataFrame([
        (1, "the quick fox runs home"),
        (2, "the quick fox runs away"),
        (3, "the quick fox sleeps now"),
        (4, "fox the runs quick home the"),
        (5, "x"),                      # <2 tokens -> 0 over 0 bigrams
        (6, ""),
    ], "doc_id long, text string")
    got = {r.doc_id: r for r in bigram_logprob_score(docs).collect()}
    assert got[5].n_bigrams == 0 and got[5].mean_neg_logprob == 0.0
    assert got[6].n_bigrams == 0
    assert got[1].n_bigrams == 4
    assert got[4].mean_neg_logprob > got[1].mean_neg_logprob
    assert got[4].mean_neg_logprob > got[2].mean_neg_logprob


def test_bigram_logprob_matches_duckdb(spark, duck):
    import os

    from steel_datafusion_spark import load_tables
    from steel_datafusion_spark.pipeline.scoring import (
        bigram_logprob_score, sql_bigram_logprob_score,
    )
    from tests.conftest import assert_df_matches_duck

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    d = load_tables(spark, sf)["documents"].select("doc_id", "text")
    assert_df_matches_duck(
        bigram_logprob_score(d), duck,
        sql_bigram_logprob_score("documents"))


def test_interpolated_unseen_bigram_backs_off_to_unigram(spark):
    from steel_datafusion_spark.pipeline.scoring import (
        bigram_logprob_score, interpolated_logprob_score,
    )

    # "order words" never occurs as a bigram, but both words are common:
    # the interpolated model should punish the salad doc LESS than the
    # pure bigram floor does relative to the fluent docs
    rows = [(i, "common words in common order appear in common order")
            for i in range(8)]
    rows.append((100, "order words common in appear order common in"))
    inter = {r.doc_id: r.mean_neg_logprob for r in
             interpolated_logprob_score(_docs(spark, rows)).collect()}
    bi = {r.doc_id: r.mean_neg_logprob for r in
          bigram_logprob_score(_docs(spark, rows)).collect()}
    # salad still scores worse than fluent under both models
    assert inter[100] > inter[0]
    assert bi[100] > bi[0]
    # but interpolation softens the gap (unigram mass is shared)
    assert (inter[100] - inter[0]) < (bi[100] - bi[0])


def test_interpolated_short_doc_scores_zero(spark):
    from steel_datafusion_spark.pipeline.scoring import (
        interpolated_logprob_score,
    )

    rows = [(1, "one"), (2, ""), (3, "two words here")]
    out = {r.doc_id: r for r in
           interpolated_logprob_score(_docs(spark, rows)).collect()}
    assert out[1].n_grams == 0 and out[1].mean_neg_logprob == 0.0
    assert out[2].n_grams == 0
    assert out[3].n_grams == 2


def test_perplexity_buckets_cuts_mode_agrees_with_ntile(spark):
    from steel_datafusion_spark.pipeline.scoring import perplexity_buckets

    rows = [(i, " ".join(["common"] * 5 + [f"rare{i % 7}"] * (i % 4)))
            for i in range(30)]
    docs = _docs(spark, rows)
    exact = {r.doc_id: r for r in
             perplexity_buckets(docs, n_buckets=3, mode="ntile").collect()}
    cuts = {r.doc_id: r for r in
            perplexity_buckets(docs, n_buckets=3, mode="cuts").collect()}
    assert set(exact) == set(cuts)
    # buckets are monotone in score in both modes
    for out in (exact, cuts):
        ordered = sorted(out.values(),
                         key=lambda r: (r.mean_neg_logprob, r.doc_id))
        bs = [r.bucket for r in ordered]
        assert bs == sorted(bs)
        assert {1, 2, 3} == set(bs)
    # the approx path may only disagree at quantile boundaries
    agree = sum(exact[i].bucket == cuts[i].bucket for i in exact)
    assert agree >= len(exact) * 0.8


def test_perplexity_buckets_matches_duckdb(spark, duck):
    import os

    from steel_datafusion_spark import load_tables
    from steel_datafusion_spark.pipeline.scoring import (
        perplexity_buckets, sql_perplexity_buckets,
    )
    from tests.conftest import assert_df_matches_duck

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    d = load_tables(spark, sf)["documents"].select("doc_id", "text")
    assert_df_matches_duck(
        perplexity_buckets(d, n_buckets=3), duck,
        sql_perplexity_buckets("documents", n_buckets=3))
