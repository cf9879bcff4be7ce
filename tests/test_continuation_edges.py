"""Edge inputs for the round-8 continuation operators: empty/degenerate
relations must produce defined results, not exceptions or wrong shapes."""

import datetime

import pyspark.sql.functions as F
import pytest


def test_gapfill_single_observation_and_custom_interval(spark, duck):
    from steel_datafusion_spark.pipeline.rollup import gapfill, sql_gapfill

    base = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("k", base, 5.0), ("k", base + datetime.timedelta(seconds=150),
                            7.0)],
        "event_type string, ts timestamp, value double")
    # 60 s grid: buckets 0,60,120 — middle bucket filled
    out = sorted(gapfill(df, interval_s=60, method="linear").collect(),
                 key=lambda r: r["bucket_ts"])
    assert [r["value"] for r in out] == [5.0, 6.0, 7.0]
    assert [r["filled"] for r in out] == [False, True, False]
    # single observation -> 1-bucket grid, nothing to fill
    one = gapfill(df.limit(1), interval_s=60).collect()
    assert len(one) == 1 and not one[0]["filled"]


def test_dsir_empty_target_is_defined(spark):
    """No target docs: every LLR reduces to ln(alpha/(alpha*B)) - ln(q)
    — still defined, deterministic, no division by zero."""
    from steel_datafusion_spark.pipeline.selection import dsir_logweights

    df = spark.createDataFrame(
        [(1, "cat sat", False), (2, "dog ran far", False)],
        "doc_id long, text string, tgt boolean")
    rows = dsir_logweights(df, F.col("tgt"), n_buckets=32).collect()
    assert {r["doc_id"] for r in rows} == {1, 2}
    assert all(r["logweight"] is not None for r in rows)


def test_logreg_single_class_moves_bias_only_direction(spark):
    """All-positive labels: GD pushes every score toward 1 — bias must
    increase and training must not blow up."""
    from steel_datafusion_spark.pipeline.classifier import logreg_train

    df = spark.createDataFrame([(i, (i % 7) / 7.0, 1.0) for i in range(20)],
                               "id long, x1 double, y double")
    w, b = logreg_train(df, ["x1"], "y", iterations=10, lr=2.0)
    assert b > 0.0
    assert abs(w[0]) < 10 and abs(b) < 10  # no divergence


def test_join_size_estimate_empty_side(spark):
    from steel_datafusion_spark.operators.skew import join_size_estimate

    l = spark.createDataFrame([(1,), (2,)], "k int")
    r = spark.createDataFrame([], "k2 int")
    rep = join_size_estimate(l, "k", r, "k2").collect()[0]
    assert rep["n_right"] == 0 and rep["join_rows"] == 0
    assert rep["amplification"] == 0.0


def test_skew_diagnose_single_key(spark):
    from steel_datafusion_spark.operators.skew import skew_diagnose

    df = spark.createDataFrame([(1,)] * 9, "k int")
    rep = skew_diagnose(df, ["k"]).collect()[0]
    assert rep["n_keys"] == 1 and rep["skew_factor"] == 1.0
    assert rep["recommended_salt"] == 1


def test_zorder_skipping_empty_predicate_dims_subset(spark):
    """A predicate on ONE of the two clustered columns still reports all
    three layouts (the zorder cells carry both columns' envelopes)."""
    from steel_datafusion_spark.sources.layout import zorder_skipping_stats

    df = spark.createDataFrame(
        [(float(i % 16), float(i // 16)) for i in range(256)],
        "x double, y double")
    rep = zorder_skipping_stats(df, ["x", "y"],
                                [("p", {"x": (0.0, 0.25)})]).collect()
    assert {r["layout"] for r in rep} == {"zorder", "linear_x", "linear_y"}
    by = {r["layout"]: r for r in rep}
    # a 1-D slice on x: linear_x prunes hardest, linear_y cannot prune
    assert by["linear_x"]["hit_frac"] < 1.0
    assert by["linear_y"]["hit_frac"] == 1.0


def test_bpe_segment_no_merges_is_characters(spark):
    from steel_datafusion_spark.pipeline.bpe import EOW, bpe_segment

    df = spark.createDataFrame([(1, "ab c")], "doc_id long, text string")
    out = {r["w"]: r["bpe_tokens"] for r in bpe_segment(df, []).collect()}
    assert out["ab"] == ["a", "b" + EOW] or out["ab"] == ["a", "b", EOW]


def test_expectations_all_null_column(spark):
    from steel_datafusion_spark.operators.expectations import (
        validate_expectations)

    df = spark.createDataFrame([(None,), (None,)], "x int")
    rep = {r["rule"]: r for r in validate_expectations(
        df, [("not_null", "x"), ("unique", "x"),
             ("range", "x", 0, 1)]).collect()}
    assert rep["not_null"]["n_violations"] == 2
    assert rep["unique"]["n_rows"] == 0      # NULLs ignored
    assert rep["unique"]["ok"]
    assert rep["range"]["n_violations"] == 0  # NULL passes range
