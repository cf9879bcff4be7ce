"""Relational operator surface vs the DuckDB oracle on the driver's sf0.001
tables — the same compare shape the driver's t2 gate uses."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from steel_datafusion_spark import (
    agg_avg, agg_count_star, agg_max, agg_min, col, col_eq, df_aggregate,
    df_describe, df_distinct, df_distinct_on, df_except, df_filter,
    df_intersect, df_join, df_join_on, df_limit, df_select, df_sort,
    df_union, df_union_distinct, df_window, lit, sort_asc, sort_desc,
    sum_exact, window_spec, w_row_number, w_rank,
)

from conftest import assert_df_matches_duck


def test_aggregate_vs_oracle(tables, duck):
    li = tables["lineitem"]
    out = df_aggregate(
        li,
        [col("l_returnflag"), col("l_linestatus")],
        [
            sum_exact("l_quantity").alias("sum_qty"),
            agg_count_star().alias("cnt"),
            agg_min("l_discount").alias("min_disc"),
            agg_max("l_discount").alias("max_disc"),
        ],
    )
    assert_df_matches_duck(out, duck, """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS cnt,
               MIN(l_discount) AS min_disc,
               MAX(l_discount) AS max_disc
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """)


def test_join_name_lists_vs_oracle(tables, duck):
    out = df_join(
        tables["customer"], tables["nation"], "inner",
        ["c_nationkey"], ["n_nationkey"],
    ).select("c_custkey", "n_name")
    assert_df_matches_duck(out, duck, """
        SELECT c_custkey, n_name FROM customer
        JOIN nation ON c_nationkey = n_nationkey
    """)


def test_join_semi_anti(tables, duck):
    cust, orders = tables["customer"], tables["orders"]
    semi = df_join(cust, orders, "left_semi", ["c_custkey"], ["o_custkey"]).select("c_custkey")
    assert_df_matches_duck(semi, duck, """
        SELECT c_custkey FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """)
    anti = df_join(cust, orders, "left_anti", ["c_custkey"], ["o_custkey"]).select("c_custkey")
    assert_df_matches_duck(anti, duck, """
        SELECT c_custkey FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """)


def test_join_right_variants_by_swap(tables):
    cust, orders = tables["customer"], tables["orders"]
    rs = df_join(orders, cust, "right_semi", ["o_custkey"], ["c_custkey"])
    ls = df_join(cust, orders, "left_semi", ["c_custkey"], ["o_custkey"])
    assert sorted(r.c_custkey for r in rs.select("c_custkey").collect()) == \
           sorted(r.c_custkey for r in ls.select("c_custkey").collect())


def test_join_residual_filter(tables, duck):
    out = df_join(
        tables["orders"], tables["lineitem"], "inner",
        ["o_orderkey"], ["l_orderkey"],
        filter=F.col("l_quantity") > F.lit(45),
    ).select("o_orderkey", "l_linenumber")
    assert_df_matches_duck(out, duck, """
        SELECT o_orderkey, l_linenumber FROM orders
        JOIN lineitem ON o_orderkey = l_orderkey AND l_quantity > 45
    """)


def test_theta_join_on(tables, duck):
    n, r = tables["nation"], tables["region"]
    out = df_join_on(
        n, r, "inner",
        [n["n_regionkey"] == r["r_regionkey"], n["n_nationkey"] > F.lit(10)],
    ).select("n_name", "r_name")
    assert_df_matches_duck(out, duck, """
        SELECT n_name, r_name FROM nation JOIN region
        ON n_regionkey = r_regionkey AND n_nationkey > 10
    """)


def test_set_ops(tables, duck):
    c = tables["customer"]
    hi = df_select(df_filter(c, F.col("c_acctbal") > 5000), [col("c_custkey")])
    seg = df_select(df_filter(c, F.col("c_mktsegment") == "BUILDING"), [col("c_custkey")])
    assert_df_matches_duck(df_union(hi, seg), duck, """
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        UNION ALL
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """)
    assert_df_matches_duck(df_union_distinct(hi, seg), duck, """
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        UNION
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """)
    assert_df_matches_duck(df_intersect(hi, seg), duck, """
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        INTERSECT
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """)
    assert_df_matches_duck(df_except(hi, seg), duck, """
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        EXCEPT
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """)


def test_distinct(tables, duck):
    out = df_distinct(df_select(tables["customer"], [col("c_mktsegment")]))
    assert_df_matches_duck(out, duck, "SELECT DISTINCT c_mktsegment FROM customer")


def test_distinct_on_vs_oracle(tables, duck):
    ev = tables["events"]
    out = df_distinct_on(
        ev,
        [col("user_id")],
        [col("user_id"), col("event_id"), col("event_type")],
        [sort_desc(col("ts")), sort_asc(col("event_id"))],
    )
    assert_df_matches_duck(out, duck, """
        SELECT user_id, event_id, event_type FROM (
          SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id ASC) AS rn
          FROM events) t WHERE rn = 1
    """)


def test_limit_offset(tables, duck):
    out = df_limit(
        df_sort(tables["customer"], [sort_asc(col("c_custkey"))]), 10, 5
    ).select("c_custkey")
    assert_df_matches_duck(out, duck, """
        SELECT c_custkey FROM customer ORDER BY c_custkey LIMIT 5 OFFSET 10
    """)


def test_window_vs_oracle(tables, duck):
    ev = tables["events"]
    spec = window_spec([col("user_id")], [sort_desc(col("value")), sort_asc(col("event_id"))])
    out = df_filter(
        df_window(ev, [w_row_number(spec).alias("rn"), w_rank(spec).alias("rk")]),
        F.col("rn") <= 2,
    ).select("user_id", "event_id", "rn", "rk")
    assert_df_matches_duck(out, duck, """
        SELECT user_id, event_id, rn, rk FROM (
          SELECT user_id, event_id,
                 row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn,
                 rank()       OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rk
          FROM events) t WHERE rn <= 2
    """)


def test_union_positional_coercion(spark):
    a = spark.createDataFrame([Row(x=1, y="a")])
    b = spark.createDataFrame([Row(p=2, q="b")])  # different names: positional
    got = df_union(a, b).collect()
    assert {(r[0], r[1]) for r in got} == {(1, "a"), (2, "b")}


def test_describe_shape(tables):
    d = df_describe(tables["lineitem"].select("l_quantity", "l_returnflag"))
    rows = {r["describe"]: r for r in d.collect()}
    assert set(rows) == {"count", "null_count", "mean", "std", "min", "max", "median"}
    assert rows["null_count"]["l_quantity"] == "0"
    assert rows["min"]["l_returnflag"] is not None   # strings: min/max defined
    assert rows["mean"]["l_returnflag"] is None      # strings: no mean


def test_describe_approx_median_matches_exact_at_high_accuracy(tables):
    """The 100 TB scale path: percentile_approx with accuracy ≥ n is exact,
    so both describe modes must agree on this 60k-row column."""
    li = tables["lineitem"].select("l_quantity")
    exact = {r["describe"]: r for r in df_describe(li).collect()}
    approx = {r["describe"]: r
              for r in df_describe(li, approx_median=True,
                                   accuracy=1_000_000).collect()}
    assert approx["median"]["l_quantity"] == exact["median"]["l_quantity"]
    assert approx["count"]["l_quantity"] == exact["count"]["l_quantity"]


def test_agg_approx_percentile_exact_at_high_accuracy(spark, tables):
    from steel_datafusion_spark.functions.aggregates import (
        agg_approx_median, agg_approx_percentile)

    li = tables["lineitem"]
    row = li.agg(
        agg_approx_median("l_quantity", accuracy=1_000_000).alias("m"),
        agg_approx_percentile("l_quantity", 0.25, 1_000_000).alias("p25"),
        F.expr("median(l_quantity)").alias("exact_m"),
    ).collect()[0]
    assert row.m == row.exact_m
    assert row.p25 <= row.m


def test_window_ranking_derived_matches_native_windows(spark):
    """The r15 window_ranking gate derives percent_rank/ntile from
    (row_number, group count) instead of whole-partition window sorts;
    this pins the derived arithmetic to Spark's native window functions
    on groups covering n % 4 in {0,1,2,3}, n < buckets, n == 1, and
    duplicate order values (ties broken by the unique key)."""
    from pyspark.sql.window import Window

    rows = []
    sizes = {"a": 11, "b": 8, "c": 3, "d": 1, "e": 6}
    for g, n in sizes.items():
        for i in range(n):
            rows.append((g, i, float(100 - (i // 2))))  # ties every 2 keys
    df = spark.createDataFrame(rows, "g string, k int, price double")
    w = Window.partitionBy("g").orderBy(F.col("price").desc(),
                                        F.col("k").asc())
    native = df.select(
        "g", "k",
        F.row_number().over(w).alias("rn"),
        F.dense_rank().over(w).alias("dr"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.ntile(4).over(w).alias("q")).collect()
    n_by_g = {g: n for g, n in sizes.items()}
    for r in native:
        n, rn1 = n_by_g[r["g"]], r["rn"] - 1
        assert r["dr"] == r["rn"]  # unique order key => dense_rank == rn
        exp_pr = round(rn1 / (n - 1), 6) if n > 1 else 0.0
        assert r["pr"] == exp_pr
        bs, pad = n // 4, n % 4
        thr = (bs + 1) * pad
        exp_q = (rn1 // (bs + 1) if rn1 < thr
                 else pad + (rn1 - thr) // bs) + 1
        assert r["q"] == exp_q, (r, n)
