#!/usr/bin/env python
"""Runnable tour of the full reference surface (SURVEY.md §2) plus a taste
of the pipeline operators.  Starts with a 1:1 port of the reference demo
(/root/reference/test.scm), then exercises every §2 family end-to-end:
expressions, CASE, joins, aggregation, distinct-on, windows, sorting, set
ops, describe, explain, UDFs, and the datatype tokens.

Run: python examples/demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from steel_datafusion_spark import (  # noqa: E402
    DATATYPES, agg_avg, agg_count_star, case, col,
    col_add, col_and, col_ge, col_gt, col_like, col_mul, define_udf,
    df_aggregate, df_count, df_describe, df_distinct_on, df_except,
    df_explain, df_filter, df_intersect, df_join, df_join_on, df_limit,
    df_select, df_show, df_show_limit, df_sort, df_union_distinct, df_window,
    df_with_column, df_with_column_renamed, lit, load_tables, read_csv,
    session_context, sort_asc, sort_desc, sum_exact, udf_call, w_row_number,
    when, window_spec,
)
from steel_datafusion_spark.datatypes import Int64  # noqa: E402


def banner(title):
    print(f"\n=== {title} " + "=" * max(0, 60 - len(title)))


def main():
    spark = session_context(app_name="sdf-demo")
    spark.sparkContext.setLogLevel("ERROR")

    # --- the reference demo, 1:1 (test.scm:1-14) ---
    banner("reference demo: read-csv → select+udf → filter → show")
    path = "/tmp/sdf_example.csv"
    with open(path, "w") as f:
        f.write("a,b,c\n1,2,3\n20,10,50\n")
    df = read_csv(spark, path)
    my_udf = define_udf(spark, "double-it", [Int64], Int64, lambda s: s * 2)
    out = df_filter(
        df_select(df, [col("a"), col("b"),
                       udf_call(my_udf, [col("a")]).alias("doubled")]),
        col_ge(col("a"), col("b")),
    )
    df_show(out)  # reference semantics: prints ALL rows

    # --- df/explain (main.rs:267-272): plans as a DataFrame ---
    banner("df/explain")
    df_show(df_explain(out))

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    if not os.path.exists(sf):
        print(f"\n(testdata {sf} not found — stopping after the CSV demo)")
        return
    t = load_tables(spark, sf)
    orders, customer, events = t["orders"], t["customer"], t["events"]

    # --- expressions: arithmetic, boolean, LIKE, CASE (main.rs:38-135) ---
    banner("expressions + CASE")
    priced = df_select(orders, [
        col("o_orderkey"),
        col_add(col("o_totalprice"), lit(1.0)).alias("plus_one"),
        col_mul(col("o_totalprice"), lit(0.9)).alias("discounted"),
        case(col("o_orderstatus"))
        .with_when(lit("F"), lit("finished"))
        .otherwise(lit("open")).alias("status_word"),
        when(col_and(
            col_gt(col("o_totalprice"), lit(100000.0)),
            col_like(col("o_orderpriority"), "1%")),
            lit("big-urgent")).otherwise(lit("other")).alias("tier"),
    ])
    df_show_limit(priced, 5)

    # --- joins: name-list equi + theta (main.rs:232-265) ---
    banner("df/join + df/join-on")
    joined = df_join(orders, customer, "inner", ["o_custkey"], ["c_custkey"])
    print("equi-join rows:", df_count(joined))
    theta = df_join_on(
        df_limit(orders, 100), df_limit(customer, 100), "inner",
        [col_gt(col("o_totalprice"), col("c_acctbal"))])
    print("theta-join rows:", df_count(theta))

    # --- aggregate + agg ctors (main.rs:183-195) ---
    banner("df/aggregate")
    df_show(df_aggregate(orders, [col("o_orderstatus")], [
        agg_count_star().alias("n"),
        sum_exact("o_totalprice").alias("total"),
        agg_avg(col("o_totalprice")).alias("avg_price"),
    ]))

    # --- distinct-on, Postgres semantics (main.rs:160-174) ---
    banner("df/distinct-on: latest event per user (3 rows)")
    latest = df_distinct_on(
        events, [col("user_id")],
        [col("user_id"), col("event_id"), col("event_type")],
        [sort_desc(col("ts")), sort_asc(col("event_id"))])
    df_show_limit(latest, 3)

    # --- window functions (main.rs:197-202) ---
    banner("df/window: row_number per status")
    w = window_spec([col("o_orderstatus")], [sort_desc(col("o_totalprice"))])
    ranked = df_window(orders, [w_row_number(w).alias("rn")])
    df_show_limit(df_filter(ranked, col_ge(lit(3), col("rn")))
                  .select("o_orderstatus", "rn", "o_totalprice"), 9)

    # --- sort with explicit null ordering (main.rs:218-223) ---
    banner("df/sort (desc, nulls last)")
    df_show_limit(df_sort(orders, [sort_desc(col("o_totalprice"),
                                             nulls_first=False)]), 3)

    # --- set ops (main.rs:145-158, 274-286) ---
    banner("set ops")
    hi = df_select(df_filter(customer, col_gt(col("c_acctbal"), lit(5000.0))),
                   [col("c_custkey")])
    seg = df_select(df_filter(customer, col("c_mktsegment") == lit("BUILDING")),
                    [col("c_custkey")])
    print("union-distinct:", df_count(df_union_distinct(hi, seg)),
          "| intersect:", df_count(df_intersect(hi, seg)),
          "| except:", df_count(df_except(hi, seg)))

    # --- with-column / rename / limit / count / describe ---
    banner("df/with-column, rename, describe")
    enriched = df_with_column_renamed(
        df_with_column(orders, "is_big",
                       col_gt(col("o_totalprice"), lit(150000.0))),
        "o_orderpriority", "priority")
    print("columns:", enriched.columns[:6], "… rows:", df_count(enriched))
    df_show(df_describe(df_select(orders, [col("o_totalprice")])))

    # --- datatype tokens (main.rs:392-469) ---
    banner("datatype tokens")
    print(sorted(DATATYPES))

    # --- pipeline taste: near-dup detection on the test corpus ---
    banner("pipeline: minhash near-dup pairs")
    from steel_datafusion_spark.pipeline.dedup import minhash_dedup_pairs

    docs = t["documents"]
    pairs = minhash_dedup_pairs(docs, threshold=0.5)
    print(f"near-dup pairs (jaccard ≥ 0.5): {pairs.count()}")


if __name__ == "__main__":
    main()
