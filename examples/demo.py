#!/usr/bin/env python
"""Port of the reference demo (/root/reference/test.scm) to this engine,
plus a taste of the pipeline operators.  Run: python examples/demo.py"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from steel_datafusion_spark import (
    col, col_ge, define_udf, df_filter, df_select, df_show, load_tables,
    read_csv, session_context, udf_call,
)
from steel_datafusion_spark.datatypes import Int64


def main():
    spark = session_context(app_name="sdf-demo")
    spark.sparkContext.setLogLevel("ERROR")

    # --- the reference demo, 1:1 (test.scm:1-14) ---
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

    # --- pipeline taste: near-dup detection on the test corpus ---
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    if os.path.exists(sf):
        from steel_datafusion_spark.pipeline.dedup import minhash_dedup_pairs

        docs = load_tables(spark, sf)["documents"]
        pairs = minhash_dedup_pairs(docs, threshold=0.5)
        print(f"near-dup pairs (jaccard ≥ 0.5): {pairs.count()}")


if __name__ == "__main__":
    main()
