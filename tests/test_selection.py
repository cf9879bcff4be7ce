"""DSIR importance resampling (pipeline/selection.py): semantics on
planted corpora, oracle parity, determinism of the hashed Gumbel draw,
and the gate's plan shape (broadcast LLR, TakeOrderedAndProject)."""

import pyspark.sql.functions as F
import pytest

from conftest import SF_DIR, assert_df_matches_duck

from steel_datafusion_spark.pipeline.queries import (
    _sql_dsir_select, q_dsir_select)
from steel_datafusion_spark.pipeline.selection import (
    dsir_logweights, dsir_select, sql_dsir_logweights)
from steel_datafusion_spark.plans.explain import explain_string


def _corpus(spark):
    # target: "cat" language; pool: two cat-like docs, two dog-like docs
    rows = [
        (1, "cat sat mat cat sat", True),
        (2, "cat mat cat cat sat mat", True),
        (10, "cat sat on the mat", False),
        (11, "the cat sat", False),
        (12, "dog ran far dog ran", False),
        (13, "far dog dog ran away", False),
        (14, "", False),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")


def test_target_like_docs_outweigh(spark):
    df = _corpus(spark)
    lw = {r["doc_id"]: r["logweight"]
          for r in dsir_logweights(df, F.col("tgt"),
                                   n_buckets=512).collect()}
    # every pool doc present exactly once, including the empty one
    assert set(lw) == {10, 11, 12, 13, 14}
    # cat-docs must beat dog-docs under a cat-corpus target
    assert min(lw[10], lw[11]) > max(lw[12], lw[13])
    assert lw[14] == 0.0  # no features -> no evidence


def test_greedy_select_order_and_k(spark):
    df = _corpus(spark)
    sel = dsir_select(df, F.col("tgt"), k=2, n_buckets=512,
                      seed=None).collect()
    assert len(sel) == 2
    assert all(r["sel_key"] == round(r["logweight"], 6) for r in sel)
    # greedy = exactly the top-k of the logweight table (desc, id asc)
    lw = dsir_logweights(df, F.col("tgt"), n_buckets=512).collect()
    expect = [r["doc_id"] for r in sorted(
        lw, key=lambda r: (-r["logweight"], r["doc_id"]))][:2]
    assert [r["doc_id"] for r in sel] == expect


def test_gumbel_is_deterministic_and_seed_sensitive(spark):
    df = _corpus(spark)
    a = [r["doc_id"] for r in dsir_select(df, F.col("tgt"), k=5,
                                          n_buckets=512, seed=3).collect()]
    b = [r["doc_id"] for r in dsir_select(df, F.col("tgt"), k=5,
                                          n_buckets=512, seed=3).collect()]
    c = [(r["doc_id"], r["sel_key"]) for r in
         dsir_select(df, F.col("tgt"), k=5, n_buckets=512,
                     seed=4).collect()]
    assert a == b  # same seed -> identical sample
    # different seed -> different keys (same ids possible, keys must move)
    keys_a = {r["doc_id"]: r["sel_key"] for r in
              dsir_select(df, F.col("tgt"), k=5, n_buckets=512,
                          seed=3).collect()}
    assert any(keys_a.get(d) != k for d, k in c)


def test_logweights_match_duck_oracle(spark, duck):
    from steel_datafusion_spark.sources.readers import load_tables

    docs = load_tables(spark, SF_DIR)["documents"]
    got = dsir_logweights(docs, F.col("lang") == "en", n_buckets=1024)
    assert_df_matches_duck(
        got, duck,
        sql_dsir_logweights("documents", "lang = 'en'", n_buckets=1024))


def test_gate_matches_oracle(spark, duck):
    assert_df_matches_duck(q_dsir_select(spark, SF_DIR), duck,
                           _sql_dsir_select())


def test_gate_plan_shape(spark):
    plan = explain_string(q_dsir_select(spark, SF_DIR))
    # LLR table broadcasts to the scoring join; top-k never global-sorts
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_validation(spark):
    df = _corpus(spark)
    with pytest.raises(ValueError):
        dsir_logweights(df, F.col("tgt"), n_buckets=0)
    with pytest.raises(ValueError):
        dsir_logweights(df, F.col("tgt"), alpha=0.0)
