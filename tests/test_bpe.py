"""Distributed BPE learning (pipeline/bpe.py): hand-checkable merges on the
classic Sennrich-style toy corpus, segmentation consistency, and the DuckDB
mirror."""

import duckdb
import pytest
from pyspark.sql import functions as F

from steel_datafusion_spark.pipeline.bpe import (
    EOW, SEP, bpe_learn, bpe_segment, sql_bpe_learn,
)


@pytest.fixture(scope="module")
def toy(spark):
    # word frequencies: low×5, lower×2, newest×6, widest×3 (the textbook
    # example): "es" then "est" then "est</w>" dominate
    rows = [(1, " ".join(["low"] * 5 + ["lower"] * 2
                         + ["newest"] * 6 + ["widest"] * 3))]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bpe_learn_textbook_merges(toy):
    m = bpe_learn(toy, n_merges=4, vocab_partitions=1).collect()
    got = [(r["left"], r["right"], r["pair_freq"]) for r in m]
    # e+s appears in newest(6)+widest(3) = 9; then es+t = 9; then est+</w> = 9
    # (ties break (count desc, left asc, right asc): 'e','s' < 'es','t' etc.)
    assert got[0] == ("e", "s", 9)
    assert got[1] == ("es", "t", 9)
    assert got[2] == ("est", EOW, 9)
    # next: l+o appears in low(5)+lower(2) = 7
    assert got[3] == ("l", "o", 7)


def test_bpe_segment_applies_merges_in_order(toy, spark):
    merges = [(r["left"], r["right"]) for r in
              bpe_learn(toy, n_merges=4, vocab_partitions=1).collect()]
    seg = bpe_segment(spark.createDataFrame(
        [(1, "newest lowest")], "doc_id long, text string"), merges)
    out = {r["w"]: r["bpe_tokens"] for r in seg.collect()}
    assert out["newest"] == ["n", "e", "w", "est" + EOW]
    # "lowest" was never a training word but merges still apply: lo + est</w>
    assert out["lowest"] == ["lo", "w", "est" + EOW]


def test_bpe_learn_matches_duckdb_mirror(toy, spark):
    spark_rows = sorted(
        tuple(r) for r in bpe_learn(toy, n_merges=5,
                                    vocab_partitions=1).collect())
    con = duckdb.connect()
    text = toy.collect()[0]["text"]
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.execute("INSERT INTO docs VALUES (1, ?)", [text])
    duck_rows = sorted(
        tuple(r) for r in con.execute(
            sql_bpe_learn(n_merges=5, corpus_rel="docs")).fetchall())
    assert spark_rows == duck_rows


def test_bpe_stops_when_no_pairs_remain(spark):
    df = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    # words "a","b": only pairs (a,</w>) and (b,</w>) exist, then nothing
    m = bpe_learn(df, n_merges=10, vocab_partitions=1).collect()
    assert len(m) == 2
    assert {(r["left"], r["right"]) for r in m} == {("a", EOW), ("b", EOW)}


def test_sql_segment_mirror_matches_spark(toy, spark):
    """Learn-then-segment per-doc token counts: Spark (merges as plan
    literals) vs the DuckDB mirror (merges re-learned in CTEs, applied as
    nested replaces) — identical counts, including the early-stop case
    where n_merges exceeds the available pairs."""
    from steel_datafusion_spark.pipeline.bpe import sql_bpe_segment_tokens

    corpus = spark.createDataFrame(
        [(1, "newest widest low"), (2, "lower newest newest"), (3, "")],
        "doc_id long, text string")
    merges = [(r["left"], r["right"]) for r in
              bpe_learn(corpus, n_merges=8, vocab_partitions=1)
              .orderBy("rank").collect()]
    seg = bpe_segment(corpus.select("doc_id", "text"), merges)
    got = {r["doc_id"]: (r["n_words"], r["n_bpe"]) for r in
           seg.groupBy("doc_id").agg(
               F.count(F.lit(1)).alias("n_words"),
               F.sum("n_bpe_tokens").alias("n_bpe")).collect()}
    got[3] = got.get(3, (0, 0))  # empty doc never reaches the explode

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    for i, t in [(1, "newest widest low"), (2, "lower newest newest"),
                 (3, "")]:
        con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
    exp = {r[0]: (r[1], r[2]) for r in con.execute(
        sql_bpe_segment_tokens(n_merges=8)).fetchall()}
    assert got == exp
    assert exp[3] == (0, 0)


def test_segment_token_count_shrinks_with_merges(toy, spark):
    """More merges -> never more tokens per word (each merge is a strict
    contraction of the symbol string)."""
    merges = [(r["left"], r["right"]) for r in
              bpe_learn(toy, n_merges=6, vocab_partitions=1)
              .orderBy("rank").collect()]
    doc = spark.createDataFrame([(1, "newest lowest widest")],
                                "doc_id long, text string")
    n_none = bpe_segment(doc, []).agg(
        F.sum("n_bpe_tokens")).collect()[0][0]
    n_some = bpe_segment(doc, merges[:3]).agg(
        F.sum("n_bpe_tokens")).collect()[0][0]
    n_all = bpe_segment(doc, merges).agg(
        F.sum("n_bpe_tokens")).collect()[0][0]
    assert n_none >= n_some >= n_all
    assert n_all < n_none


def test_bpe_learn_periodic_barrier_bounds_lineage(spark, monkeypatch):
    """r16: a realistic vocabulary run (10^4+ merges) must not build an
    unbounded nested-replace chain — the loop re-barriers every
    ``barrier_every`` merges.  Checks (a) the barrier fires the expected
    number of times, (b) merges are identical with and without in-loop
    barriers, (c) a >K-merge learn completes."""
    import steel_datafusion_spark.pipeline.bpe as bpe_mod

    # corpus with many learnable merges: distinct long words, disjoint
    # alphabets, so pairs never collide across words and ~sum(len) merges
    # exist before exhaustion
    import string
    alphabet = string.ascii_letters + string.digits
    words = []
    for i in range(12):
        w = "".join(alphabet[(i * 7 + j * 3) % len(alphabet)]
                    for j in range(10))
        words.append(w)
    corpus = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string")

    calls = {"n": 0}
    real_barrier = bpe_mod.iteration_barrier

    def counting_barrier(df, **kw):
        calls["n"] += 1
        return real_barrier(df, **kw)

    monkeypatch.setattr(bpe_mod, "iteration_barrier", counting_barrier)

    # 40 merges, barrier every 8: 1 init + 4 in-loop (ranks 8,16,24,32 —
    # never after the final merge)
    m_k8 = bpe_learn(corpus, n_merges=40, vocab_partitions=1,
                     barrier_every=8).collect()
    assert calls["n"] == 5
    assert len(m_k8) == 40  # enough pairs to not early-stop

    calls["n"] = 0
    m_nobar = bpe_learn(corpus, n_merges=40, vocab_partitions=1,
                        barrier_every=10_000).collect()
    assert calls["n"] == 1  # init only — demo-scale learns pay ONE barrier
    assert [tuple(r) for r in m_k8] == [tuple(r) for r in m_nobar]
