"""Round-9 continuation operators: hard-negative mining, best-member
dedup representatives, association rules, incremental aggregate merge."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# hard_negatives
# ---------------------------------------------------------------------------

def test_hard_negatives_excludes_same_label_and_ranks(spark):
    from steel_datafusion_spark.pipeline.similarity import hard_negatives

    rows = [
        (0, [1.0, 0.0], 0),      # anchor
        (1, [0.99, 0.14], 0),    # same label — must never appear
        (2, [0.95, 0.31], 1),    # closest other-label
        (3, [0.0, 1.0], 1),      # orthogonal other-label
        (4, [-1.0, 0.0], 2),     # opposite
    ]
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<float>, "
                               "label int")
    out = [r.asDict() for r in
           hard_negatives(df, k=2, anchors=df.filter(F.col("vec_id") == 0))
           .orderBy("rank").collect()]
    assert [r["neighbor_id"] for r in out] == [2, 3]
    assert [r["rank"] for r in out] == [1, 2]
    assert out[0]["score"] > out[1]["score"]
    assert all(r["neighbor_id"] != 1 for r in out)


def test_hard_negatives_k_caps_per_anchor(spark):
    from steel_datafusion_spark.pipeline.similarity import hard_negatives

    rows = [(i, [float(i % 7 + 1), 1.0], i % 2) for i in range(20)]
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<float>, "
                               "label int")
    out = hard_negatives(df, k=3).groupBy("anchor_id").count().collect()
    assert len(out) == 20
    assert all(r["count"] == 3 for r in out)


# ---------------------------------------------------------------------------
# keep_best_representatives
# ---------------------------------------------------------------------------

def test_keep_best_representatives_argmax_and_singletons(spark):
    from steel_datafusion_spark.pipeline.dedup import (
        keep_best_representatives,
    )

    corpus = spark.createDataFrame(
        [(1, "short"), (2, "the longest text here"), (3, "middle len"),
         (10, "a singleton")],
        "doc_id long, text string")
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "doc_id long, cluster_id long")
    kept = sorted(r["doc_id"] for r in keep_best_representatives(
        corpus, clusters, F.length("text")).collect())
    assert kept == [2, 10]            # longest member wins; singleton kept


def test_keep_best_representatives_tie_breaks_min_id(spark):
    from steel_datafusion_spark.pipeline.dedup import (
        keep_best_representatives,
    )

    corpus = spark.createDataFrame(
        [(5, "same"), (7, "same"), (6, "samX")],
        "doc_id long, text string")
    clusters = spark.createDataFrame(
        [(5, 5), (7, 5), (6, 5)], "doc_id long, cluster_id long")
    kept = [r["doc_id"] for r in keep_best_representatives(
        corpus, clusters, F.length("text")).collect()]
    assert kept == [5]


# ---------------------------------------------------------------------------
# association_rules
# ---------------------------------------------------------------------------

def _baskets(spark, rows):
    return spark.createDataFrame(rows, "basket long, item string")


def test_association_rules_exact_counts(spark):
    from steel_datafusion_spark.pipeline.basket import association_rules

    # 4 baskets: {a,b} x3, {a,c} x1 — and a repeat purchase of b in
    # basket 0 that must count once
    rows = [(0, "a"), (0, "b"), (0, "b"),
            (1, "a"), (1, "b"),
            (2, "a"), (2, "b"),
            (3, "a"), (3, "c")]
    out = {(r["item_a"], r["item_b"]): r.asDict()
           for r in association_rules(_baskets(spark, rows), "basket",
                                      "item", min_pair_count=1).collect()}
    ab = out[("a", "b")]
    assert ab["pair_count"] == 3
    assert ab["support"] == 0.75          # 3 of 4 baskets
    assert ab["conf_a_b"] == 0.75         # a appears in all 4
    assert ab["conf_b_a"] == 1.0          # every b basket has a
    assert ab["lift"] == 1.0              # 3*4/(4*3)
    ac = out[("a", "c")]
    assert ac["pair_count"] == 1 and ac["conf_b_a"] == 1.0
    assert ("b", "c") not in out


def test_association_rules_max_basket_cap(spark):
    from steel_datafusion_spark.pipeline.basket import association_rules

    rows = [(0, "a"), (0, "b")] + [(99, f"i{j}") for j in range(30)]
    out = association_rules(_baskets(spark, rows), "basket", "item",
                            min_pair_count=1, max_basket=10).collect()
    # the 30-item flood basket contributes no pairs; {a,b} survives
    assert {(r["item_a"], r["item_b"]) for r in out} == {("a", "b")}


def test_association_rules_matches_duckdb(spark, duck):
    import random

    from steel_datafusion_spark.pipeline.basket import (
        association_rules, sql_association_rules,
    )
    from tests.conftest import assert_df_matches_duck

    rng = random.Random(13)
    rows = [(rng.randrange(50), f"it{rng.randrange(12)}")
            for _ in range(600)]
    duck.execute("CREATE OR REPLACE TABLE bsk(basket BIGINT, item VARCHAR)")
    duck.executemany("INSERT INTO bsk VALUES (?, ?)", rows)
    assert_df_matches_duck(
        association_rules(_baskets(spark, rows), "basket", "item",
                          min_pair_count=3, max_basket=8),
        duck,
        sql_association_rules("bsk", "basket", "item",
                              min_pair_count=3, max_basket=8))


# ---------------------------------------------------------------------------
# incremental aggregate maintenance
# ---------------------------------------------------------------------------

def test_merge_agg_state_equals_full_rescan(spark):
    import random

    from steel_datafusion_spark.pipeline.cdc import agg_state, merge_agg_state

    rng = random.Random(3)
    rows = [(rng.randrange(5), round(rng.uniform(-100, 100), 3))
            for _ in range(400)]
    df = spark.createDataFrame(rows, "k int, v double")
    full = {r["k"]: r.asDict()
            for r in agg_state(df, ["k"], "v").collect()}
    a, b = rows[:150], rows[150:]
    merged = merge_agg_state(
        agg_state(spark.createDataFrame(a, "k int, v double"), ["k"], "v"),
        agg_state(spark.createDataFrame(b, "k int, v double"), ["k"], "v"),
        ["k"])
    got = {r["k"]: r.asDict() for r in merged.collect()}
    assert got == full


def test_merge_agg_state_disjoint_and_empty_sides(spark):
    from steel_datafusion_spark.pipeline.cdc import agg_state, merge_agg_state

    left = agg_state(spark.createDataFrame([(1, 2.0)], "k int, v double"),
                     ["k"], "v")
    right = agg_state(spark.createDataFrame([(2, 5.0)], "k int, v double"),
                      ["k"], "v")
    got = {r["k"]: r.asDict()
           for r in merge_agg_state(left, right, ["k"]).collect()}
    assert got[1]["n"] == 1 and float(got[1]["s"]) == 2.0
    assert got[2]["n"] == 1 and got[2]["mn"] == 5.0 and got[2]["mx"] == 5.0
    empty = agg_state(
        spark.createDataFrame([], "k int, v double"), ["k"], "v")
    again = {r["k"]: r.asDict()
             for r in merge_agg_state(left, empty, ["k"]).collect()}
    assert again[1]["n"] == 1 and again[1]["mn"] == 2.0


# ---------------------------------------------------------------------------
# tfidf_doc_topk
# ---------------------------------------------------------------------------

def test_tfidf_doc_topk_finds_shared_phrases(spark):
    from steel_datafusion_spark.pipeline.terms import tfidf_doc_topk

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma other words here"),       # shares a phrase w/1
        (3, "completely different text with nothing shared"),
        (4, "completely different text plus extra tail"),  # shares w/3
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["doc_id"], r["rank"]): r["neighbor_id"]
           for r in tfidf_doc_topk(df, k=2, max_df=3).collect()}
    assert out[(1, 1)] == 2 and out[(2, 1)] == 1
    assert out[(3, 1)] == 4 and out[(4, 1)] == 3
    # cross-group pairs share no shingle at all -> absent
    assert (1, 2) not in out or out[(1, 2)] in (2,)


def test_tfidf_doc_topk_max_df_drops_stop_phrases(spark):
    from steel_datafusion_spark.pipeline.terms import tfidf_doc_topk

    # every doc shares the same boilerplate phrase; with max_df=2 the
    # boilerplate shingles (df=4) drop, so only the planted pair remains
    rows = [(i, f"the common boilerplate line unique{i} word{i}")
            for i in range(4)]
    rows.append((100, "planted rare phrase match one two"))
    rows.append((101, "planted rare phrase match six seven"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_doc_topk(df, k=3, max_df=2).collect()
    pairs = {(r["doc_id"], r["neighbor_id"]) for r in out}
    assert (100, 101) in pairs and (101, 100) in pairs
    assert all(r["doc_id"] >= 100 for r in out), pairs


def test_tfidf_doc_topk_matches_duckdb(spark, duck):
    import os

    from steel_datafusion_spark import load_tables
    from steel_datafusion_spark.pipeline.terms import (
        sql_tfidf_doc_topk, tfidf_doc_topk,
    )
    from tests.conftest import assert_df_matches_duck

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    d = load_tables(spark, sf)["documents"].select("doc_id", "text")
    assert_df_matches_duck(
        tfidf_doc_topk(d, k=3, max_df=50), duck,
        sql_tfidf_doc_topk("documents", k=3, max_df=50))


# ---------------------------------------------------------------------------
# debounce_events
# ---------------------------------------------------------------------------

def test_debounce_collapses_bursts(spark):
    from datetime import datetime

    from steel_datafusion_spark.pipeline.rollup import debounce_events

    def t(m, s=0):
        return datetime(2026, 1, 1, 10, m, s)

    rows = [
        (1, 1, "click", t(0)),     # burst 1 start
        (2, 1, "click", t(2)),     #   within 5m
        (3, 1, "click", t(4)),     #   within 5m of #2
        (4, 1, "click", t(20)),    # burst 2 (gap 16m)
        (5, 1, "view",  t(1)),     # different type: own burst
        (6, 2, "click", t(3)),     # different user: own burst
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
              "ts timestamp")
    out = {r["event_id"]: r["burst_size"]
           for r in debounce_events(df, ["user_id", "event_type"],
                                    gap="5 minutes").collect()}
    assert out == {1: 3, 4: 1, 5: 1, 6: 1}


def test_debounce_chain_semantics_gap_from_predecessor(spark):
    from datetime import datetime

    from steel_datafusion_spark.pipeline.rollup import debounce_events

    # events every 4 minutes for 20 minutes: each is within gap of its
    # PREDECESSOR, so the whole chain is ONE burst even though the last
    # is 20m from the first (chained debounce, not windowed)
    rows = [(i, 1, "c", datetime(2026, 1, 1, 10, 4 * i))
            for i in range(6)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
              "ts timestamp")
    out = debounce_events(df, ["user_id", "event_type"],
                          gap="5 minutes").collect()
    assert len(out) == 1
    assert out[0]["event_id"] == 0 and out[0]["burst_size"] == 6


# ---------------------------------------------------------------------------
# schema evolution (mergeSchema)
# ---------------------------------------------------------------------------

def test_merge_schema_read_nulls_missing_column(spark, tmp_path):
    base = str(tmp_path / "tbl")
    spark.createDataFrame([(1, 10.0)], "k long, v double") \
        .write.mode("append").parquet(base)
    spark.createDataFrame([(2, 20.0, "x")], "k long, v double, tag string") \
        .write.mode("append").parquet(base)
    got = {r["k"]: r.asDict() for r in
           spark.read.option("mergeSchema", "true").parquet(base).collect()}
    assert set(got[1]) == {"k", "v", "tag"}
    assert got[1]["tag"] is None and got[2]["tag"] == "x"
    assert got[1]["v"] == 10.0 and got[2]["v"] == 20.0


# ---------------------------------------------------------------------------
# source_kl_divergence
# ---------------------------------------------------------------------------

def test_source_kl_far_source_scores_higher(spark):
    from steel_datafusion_spark.pipeline.terms import source_kl_divergence

    rows = [(i, "a", "common words shared by both typical sources")
            for i in range(10)]
    rows += [(100 + i, "b", "common words shared by both typical sources")
             for i in range(10)]
    rows += [(200 + i, "weird", "zebra quark xylophone obelisk glyph runic")
             for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, source string, "
                                     "text string")
    out = {r["source"]: r.asDict()
           for r in source_kl_divergence(df).collect()}
    # identical sources diverge equally (and little); the alien source most
    assert abs(out["a"]["kl_bits"] - out["b"]["kl_bits"]) < 1e-9
    assert out["weird"]["kl_bits"] > out["a"]["kl_bits"] * 2
    # every group sums over the full corpus vocabulary
    assert len({out[g]["vocab"] for g in out}) == 1


def test_source_kl_identical_mixture_is_near_zero(spark):
    from steel_datafusion_spark.pipeline.terms import source_kl_divergence

    rows = [(i, f"s{i % 2}", "one two three four five") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, source string, "
                                     "text string")
    out = source_kl_divergence(df).collect()
    assert all(abs(r["kl_bits"]) < 1e-6 for r in out)


# ---------------------------------------------------------------------------
# read_csv_permissive
# ---------------------------------------------------------------------------

def test_read_csv_permissive_quarantines_bad_rows(spark, tmp_path):
    from steel_datafusion_spark.sources.readers import read_csv_permissive

    p = tmp_path / "dirty.csv"
    p.write_text("1,10\n2,oops\n3,30\nnot,even,close\n")
    df = read_csv_permissive(spark, str(p), "id int, val int")
    rows = {r["id"]: r.asDict() for r in df.collect()}
    assert rows[1]["val"] == 10 and rows[1]["_corrupt_record"] is None
    assert rows[2]["val"] is None
    assert rows[2]["_corrupt_record"] == "2,oops"
    bad = [r for r in rows.values() if r["_corrupt_record"] is not None]
    assert len(bad) == 2                     # type error + arity error


def test_keep_best_representatives_agg_matches_window_and_string_score(
        spark):
    """r16: the kept set is a pure function of the (score DESC, id ASC)
    total order — numeric and string score encodings of the same order
    must pick identical representatives, including on ties (pins the
    tie semantics the skew probe's aggregation alternative must also
    reproduce)."""
    from steel_datafusion_spark.pipeline.dedup import (
        keep_best_representatives,
    )

    rows = [(i, f"txt{'x' * (i % 7)}") for i in range(1, 41)]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    # three clusters with internal score ties (i % 7 repeats)
    clusters = spark.createDataFrame(
        [(i, (i % 3) + 1) for i in range(1, 31)],
        "doc_id long, cluster_id long")
    num_kept = sorted(r["doc_id"] for r in keep_best_representatives(
        corpus, clusters, F.length("text")).collect())
    # string score: lexicographically longest-prefix ordering differs from
    # length in general, so compare against an equivalent numeric encoding
    # (zero-padded length renders string order == numeric order here)
    str_kept = sorted(r["doc_id"] for r in keep_best_representatives(
        corpus, clusters,
        F.lpad(F.length("text").cast("string"), 4, "0")).collect())
    assert num_kept == str_kept  # window path == aggregation path
    # per cluster the winner is max length, min id: verify directly
    import collections
    best = {}
    for i in range(1, 31):
        c = (i % 3) + 1
        key = (len(f"txt{'x' * (i % 7)}"), -i)
        if c not in best or key > best[c][0]:
            best[c] = (key, i)
    expect = sorted([v[1] for v in best.values()]
                    + list(range(31, 41)))  # singletons kept
    assert num_kept == expect
