"""Salted aggregation/join: same results as the unsalted plan, spread keys."""

from pyspark.sql import functions as F

from steel_datafusion_spark.operators.skew import salted_agg, salted_join


def test_salted_agg_matches_plain(spark, tables):
    li = tables["lineitem"]
    plain = {(r.l_returnflag, r.n, round(r.s, 2)) for r in
             li.groupBy("l_returnflag").agg(
                 F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("l_quantity").cast("decimal(28,10)"))
                  .cast("double").alias("s")).collect()}
    salted = {(r.l_returnflag, r.n, round(r.s, 2)) for r in
              salted_agg(
                  li, ["l_returnflag"],
                  partial_aggs=[F.count(F.lit(1)).alias("pn"),
                                F.sum(F.col("l_quantity").cast("decimal(28,10)"))
                                 .alias("ps")],
                  merge_aggs=[F.sum("pn").alias("n"),
                              F.sum("ps").cast("double").alias("s")],
                  salt_col="l_orderkey", salt=8).collect()}
    assert salted == plain


def test_salted_join_matches_plain(spark, tables):
    orders = tables["orders"].select("o_orderkey", "o_custkey")
    cust = tables["customer"].select("c_custkey", "c_mktsegment")
    plain = sorted((r.o_orderkey, r.c_mktsegment) for r in
                   orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
                   .select("o_orderkey", "c_mktsegment").collect())
    salted = sorted((r.o_orderkey, r.c_mktsegment) for r in
                    salted_join(orders, cust, "o_custkey", "c_custkey",
                                salt_col="o_orderkey", salt=8)
                    .select("o_orderkey", "c_mktsegment").collect())
    assert salted == plain


def test_salted_join_accepts_spark_join_aliases(spark, tables):
    """Spark's no-underscore aliases (leftsemi/leftouter/leftanti) are
    salt-safe and must not be rejected by the allowlist."""
    orders = tables["orders"].select("o_orderkey", "o_custkey").limit(100)
    cust = tables["customer"].select("c_custkey")
    for how in ("leftsemi", "left_semi", "LEFT_OUTER", "leftouter"):
        assert salted_join(orders, cust, "o_custkey", "c_custkey",
                           salt_col="o_orderkey", salt=4, how=how).count() >= 0
    try:
        salted_join(orders, cust, "o_custkey", "c_custkey",
                    salt_col="o_orderkey", salt=4, how="full_outer")
        raise AssertionError("full_outer must be rejected")
    except ValueError:
        pass


def test_skew_diagnose_planted_hot_key(spark):
    """900 rows on key 1, 10 keys with 10 rows each: n=1000, 11 keys,
    mean=90.909.., skew_factor=9.9, top1_share=0.9, salt=ceil(9.9)=10."""
    from steel_datafusion_spark.operators.skew import skew_diagnose

    rows = [(1, i) for i in range(900)] + [
        (k, i) for k in range(2, 12) for i in range(10)]
    df = spark.createDataFrame(rows, "k int, v int")
    r = skew_diagnose(df, ["k"], "planted").collect()[0]
    assert r["key"] == "planted"
    assert r["n_rows"] == 1000 and r["n_keys"] == 11
    assert r["max_count"] == 900
    assert r["top1_share"] == 0.9
    assert abs(r["skew_factor"] - 9.9) < 1e-6
    assert r["recommended_salt"] == 10
    assert r["p50_count"] == 10.0


def test_skew_diagnose_uniform_key_needs_no_salt(spark):
    from steel_datafusion_spark.operators.skew import skew_diagnose

    df = spark.createDataFrame([(k, i) for k in range(20) for i in range(5)],
                               "k int, v int")
    r = skew_diagnose(df, ["k"]).collect()[0]
    assert r["skew_factor"] == 1.0
    assert r["recommended_salt"] == 1


def test_skew_diagnose_salt_clamped(spark):
    from steel_datafusion_spark.operators.skew import skew_diagnose

    # one key with everything + many singletons -> huge factor, clamped
    rows = [(1, i) for i in range(5000)] + [(k, 0) for k in range(2, 1002)]
    df = spark.createDataFrame(rows, "k int, v int")
    r = skew_diagnose(df, ["k"], max_salt=64).collect()[0]
    assert r["recommended_salt"] == 64


def test_skew_diagnose_matches_duck(spark, duck):
    from conftest import SF_DIR, assert_df_matches_duck
    from steel_datafusion_spark.pipeline.queries import (
        _sql_skew_diagnose, q_skew_diagnose)

    assert_df_matches_duck(q_skew_diagnose(spark, SF_DIR), duck,
                           _sql_skew_diagnose())


def test_join_size_estimate_exact(spark):
    """The estimate IS the true join cardinality (exact, not a sketch):
    verify against the actual join on a hand-built many-to-many case."""
    from steel_datafusion_spark.operators.skew import join_size_estimate

    l = spark.createDataFrame(
        [(1,), (1,), (2,), (3,)], "k int")          # counts: 1->2, 2->1, 3->1
    r = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (9,)], "k2 int")   # counts: 1->3, 2->1, 9->1
    rep = join_size_estimate(l, "k", r, "k2", "toy").collect()[0]
    true_rows = l.join(r, l["k"] == r["k2"]).count()
    assert rep["join_rows"] == true_rows == 7        # 2*3 + 1*1
    assert rep["max_pair_rows"] == 6                 # hot key 1: 2*3
    assert rep["k_matched"] == 2
    assert rep["n_left"] == 4 and rep["n_right"] == 5
    assert rep["k_left"] == 3 and rep["k_right"] == 3
    assert rep["amplification"] == round(7 / 5, 6)


def test_join_size_estimate_disjoint_keys(spark):
    from steel_datafusion_spark.operators.skew import join_size_estimate

    l = spark.createDataFrame([(1,), (2,)], "k int")
    r = spark.createDataFrame([(3,), (4,)], "k2 int")
    rep = join_size_estimate(l, "k", r, "k2").collect()[0]
    assert rep["join_rows"] == 0 and rep["k_matched"] == 0
    assert rep["amplification"] == 0.0


def test_join_size_gate_matches_duck(spark, duck):
    from conftest import SF_DIR, assert_df_matches_duck
    from steel_datafusion_spark.pipeline.queries import (
        _sql_join_size_estimate, q_join_size_estimate)

    assert_df_matches_duck(q_join_size_estimate(spark, SF_DIR), duck,
                           _sql_join_size_estimate())
