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
