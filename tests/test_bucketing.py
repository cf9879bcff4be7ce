"""Bucketed co-located join: the join plan must contain NO Exchange on
either side (storage-level co-partitioning replaces the shuffle)."""

from pyspark.sql import functions as F

from steel_datafusion_spark.sources.bucketing import read_table, write_bucketed


def test_bucketed_join_is_shuffle_free(spark, tables):
    orders = tables["orders"]
    lineitem = tables["lineitem"]

    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, ["o_orderkey"])
    write_bucketed(lineitem, "b_lineitem", ["l_orderkey"], 8, ["l_orderkey"])
    # at test scale both sides fit the broadcast threshold; disable it so the
    # planner exercises the SMJ path a 100 TB fact-fact join would take
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        bo, bl = read_table(spark, "b_orders"), read_table(spark, "b_lineitem")
        joined = bo.join(bl, bo["o_orderkey"] == bl["l_orderkey"]) \
                   .groupBy("o_orderpriority") \
                   .agg(F.count(F.lit(1)).alias("n"))

        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself must be exchange-free; the final single aggregation
        # exchange (on the groupBy key) is expected
        join_part = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
        assert "SortMergeJoin" in plan, f"expected SMJ in:\n{plan[:2000]}"
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan

        # and the result is correct vs the plain (shuffled) join
        want = (orders.join(lineitem,
                            orders["o_orderkey"] == lineitem["l_orderkey"])
                .groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n")))
        assert sorted(map(tuple, joined.collect())) == \
               sorted(map(tuple, want.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if old_aqe is not None:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
