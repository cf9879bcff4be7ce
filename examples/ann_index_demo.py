#!/usr/bin/env python
"""Runnable tour of the dense-vector ANN family (pipeline/similarity.py).

The round-11 shape: a FIXED centroid count (nlist) whose id stride is
derived from one cheap corpus count — the broadcast and the per-vector
assignment work stay flat as the corpus grows — and the persisted index
(build once, probe many) so repeated query batches never re-assign the
corpus:

    brute force      -> the exact baseline (and the recall oracle)
    ivf_topk         -> inline IVF: quantize + probe in one plan
    build_ann_index  -> centroids + bucketed assignment as managed tables
    ivf_topk_index   -> probe the stored index; only the query side shuffles
    recall           -> approximate-vs-exact overlap per query

Run: python examples/ann_index_demo.py   (local[*], ~30 s)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from steel_datafusion_spark import session_context
from steel_datafusion_spark.pipeline.similarity import (
    build_ann_index, cosine_topk, ivf_topk, ivf_topk_index,
)
from steel_datafusion_spark.sources.readers import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    spark = session_context(app_name="ann-index-demo")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_tables(spark, SF_DIR)["embeddings"]
    n = emb.count()
    nlist = max(8, int(n ** 0.5))
    queries = emb.filter(F.col("vec_id") < 5)
    print(f"corpus: {n} vectors; nlist={nlist} (sqrt-N sizing rule)")

    exact = cosine_topk(queries, emb, k=10)
    print("\nexact brute-force top-3 of query 0:")
    exact.filter("query_id = 0 AND rank <= 3").show()

    approx = ivf_topk(queries, emb, k=10, nprobe=2, nlist=nlist)

    print("building the persisted index (centroids + bucketed assignment)…")
    build_ann_index(emb, "demo_ann_idx", nlist=nlist)
    try:
        stored = ivf_topk_index(queries, "demo_ann_idx", k=10, nprobe=2)
        same = sorted(map(tuple, approx.collect())) == \
            sorted(map(tuple, stored.collect()))
        print(f"stored-index results identical to inline IVF: {same}")

        hits = (stored.join(exact.select("query_id", "neighbor_id"),
                            ["query_id", "neighbor_id"])
                .groupBy("query_id").count())
        print("\nrecall@10 per query (stored index vs exact):")
        (exact.select("query_id").distinct()
         .join(hits, "query_id", "left")
         .withColumn("recall",
                     F.round(F.coalesce(F.col("count"), F.lit(0)) / 10, 2))
         .orderBy("query_id").show())
    finally:
        for t in ("demo_ann_idx_centroids", "demo_ann_idx_assign",
                  "demo_ann_idx_meta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
