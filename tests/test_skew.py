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
