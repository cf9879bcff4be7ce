"""Chunking, duplicated-span, heavy-hitter, and classifier ops
(pipeline/chunking.py, pipeline/terms.py)."""

import pytest
from pyspark.sql import functions as F

from steel_datafusion_spark.pipeline.chunking import (
    chunk_by_tokens, duplicated_span_extents, duplicated_span_stats,
)
from steel_datafusion_spark.pipeline.terms import (
    heavy_hitters, with_classifier,
)
from steel_datafusion_spark.pipeline.text import tokens


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_covers_every_token_with_overlap(spark):
    text = " ".join(f"t{i}" for i in range(100))
    ch = chunk_by_tokens(_docs(spark, [(1, text)]), size=32, overlap=8) \
        .orderBy("chunk_id").collect()
    # strides of 24: starts 1, 25, 49, 73 -> 4 chunks, last truncated
    assert [r.chunk_start for r in ch] == [1, 25, 49, 73]
    assert [r.n_chunk_tokens for r in ch] == [32, 32, 32, 28]
    # consecutive chunks share exactly `overlap` tokens
    for a, b in zip(ch, ch[1:]):
        assert a.chunk_text.split()[-8:] == b.chunk_text.split()[:8]
    # concatenating stride-prefixes reconstructs the document
    rebuilt = []
    for r in ch[:-1]:
        rebuilt.extend(r.chunk_text.split()[:24])
    rebuilt.extend(ch[-1].chunk_text.split())
    assert " ".join(rebuilt) == text


def test_chunk_short_and_empty_docs_survive(spark):
    ch = chunk_by_tokens(
        _docs(spark, [(1, "only four tokens here"), (2, ""), (3, None)]),
        size=32, overlap=8)
    rows = {r.doc_id: r for r in ch.collect()}
    assert set(rows) == {1, 2, 3}          # one chunk each, nothing dropped
    assert rows[1].n_chunk_tokens == 4
    assert rows[2].n_chunk_tokens == 0 and rows[2].chunk_text == ""
    assert rows[3].n_chunk_tokens == 0


def test_chunk_exact_boundary_single_chunk(spark):
    text = " ".join(f"t{i}" for i in range(32))
    ch = chunk_by_tokens(_docs(spark, [(1, text)]), size=32, overlap=8).collect()
    assert len(ch) == 1 and ch[0].n_chunk_tokens == 32


def test_chunk_rejects_bad_overlap(spark):
    with pytest.raises(ValueError):
        chunk_by_tokens(_docs(spark, [(1, "x")]), size=8, overlap=8)


def test_duplicated_spans_find_planted_prefix(spark):
    shared = " ".join(f"s{i}" for i in range(20))
    rows = [(1, shared + " unique tail one two three"),
            (2, shared + " other ending entirely different"),
            (3, "no duplication in this document at all ok")]
    spans = duplicated_span_extents(_docs(spark, rows), n=8, min_df=2)
    got = {(r.doc_id, r.span_start, r.span_end) for r in spans.collect()}
    # shared 20-token prefix: duplicated gram starts 1..13, extent 1..20
    assert (1, 1, 20) in got and (2, 1, 20) in got
    assert not any(d == 3 for d, _, _ in got)


def test_duplicated_spans_stats_zero_for_clean_docs(spark):
    shared = " ".join(f"s{i}" for i in range(10))
    rows = [(1, shared), (2, shared), (3, "clean words only here")]
    stats = {r.doc_id: r for r in duplicated_span_stats(
        _docs(spark, rows), n=8, min_df=2).collect()}
    assert stats[1].dup_tokens == 10 and stats[1].n_spans == 1
    assert stats[3].dup_tokens == 0 and stats[3].n_spans == 0
    assert stats[3].n_tokens == 4


def test_duplicated_spans_with_gap_merge_into_disjoint_span(spark):
    # doc1's duplicated gram hits sit at positions 1 and 4 (gap 3 < n=8):
    # their extents [1,8] and [4,11] overlap, so they must merge into ONE
    # maximal span [1,11] — not two overlapping spans whose token sum (16)
    # exceeds the document's 11 tokens.
    a = [f"a{i}" for i in range(11)]
    rows = [
        (1, " ".join(a)),
        (2, " ".join(a[:8]) + " z1 z2 z3"),      # shares gram @ doc1 pos 1
        (3, "y1 y2 " + " ".join(a[3:11])),       # shares gram @ doc1 pos 4
    ]
    spans = duplicated_span_extents(_docs(spark, rows), n=8, min_df=2)
    d1 = [(r.span_start, r.span_end, r.span_tokens)
          for r in spans.filter(F.col("doc_id") == 1).collect()]
    assert d1 == [(1, 11, 11)]
    stats = {r.doc_id: r for r in duplicated_span_stats(
        _docs(spark, rows), n=8, min_df=2).collect()}
    for r in stats.values():
        assert r.dup_tokens <= r.n_tokens
    assert stats[1].dup_tokens == 11 and stats[1].n_spans == 1


def test_duplicated_spans_gap_beyond_n_stays_split(spark):
    # hits at positions 1 and 10 (gap 9 > n=8): extents [1,8] and [10,17]
    # are disjoint and non-adjacent — must remain two spans.
    s = [f"s{i}" for i in range(16)]
    rows = [
        (1, " ".join(s[:8]) + " u " + " ".join(s[8:])),
        (2, " ".join(s[:8]) + " v1 v2 v3"),
        (3, "w1 w2 w3 " + " ".join(s[8:])),
    ]
    spans = duplicated_span_extents(_docs(spark, rows), n=8, min_df=2)
    d1 = sorted((r.span_start, r.span_end)
                for r in spans.filter(F.col("doc_id") == 1).collect())
    assert d1 == [(1, 8), (10, 17)]


def test_duplicated_spans_max_df_caps_hot_grams(spark):
    shared = " ".join(f"s{i}" for i in range(8))
    rows = [(i, shared) for i in range(1, 6)]  # gram df = 5
    no_cap = duplicated_span_extents(_docs(spark, rows), n=8, min_df=2)
    capped = duplicated_span_extents(_docs(spark, rows), n=8, min_df=2,
                                     max_df=4)
    assert no_cap.count() == 5 and capped.count() == 0


def test_heavy_hitters_exact_vs_plain_groupby(spark):
    # skewed corpus across many partitions: the pruned two-phase plan must
    # equal the brute-force global aggregation exactly
    rows = [(i, ("common " * 5) + f"rare{i} filler{i % 7}") for i in range(200)]
    df = _docs(spark, rows).repartition(13)
    got = {(r.term, r.cnt) for r in heavy_hitters(df, "text", 50).collect()}
    ex = df.select(F.explode(tokens(F.col("text"))).alias("term"))
    total = ex.count()
    want = {(r.term, r.cnt) for r in
            ex.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") * 50 > total).collect()}
    assert got == want and ("common", 1000) in got


def test_classifier_label_matches_score_sign(spark):
    rows = [(i, f"word{i} stuff{i*3} things{i*7} more{i}") for i in range(50)]
    rows.append((99, ""))
    out = with_classifier(_docs(spark, rows)).collect()
    for r in out:
        assert -1.0 <= r.clf_score <= 1.0
        if r.doc_id == 99:
            assert r.clf_score == 0.0 and r.clf_label is False
        else:
            assert r.clf_label == (r.clf_score > 0)


def test_heavy_hitters_exact_under_bucket_collisions(spark):
    # n_buckets=4 forces massive bucket collisions: the candidate superset
    # balloons but the recount must still return the exact answer
    rows = [(i, ("common " * 5) + f"rare{i} filler{i % 7}") for i in range(80)]
    df = _docs(spark, rows).repartition(9)
    got = {(r.term, r.cnt)
           for r in heavy_hitters(df, "text", 50, n_buckets=4).collect()}
    ex = df.select(F.explode(tokens(F.col("text"))).alias("term"))
    total = ex.count()
    want = {(r.term, r.cnt) for r in
            ex.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") * 50 > total).collect()}
    assert got == want
