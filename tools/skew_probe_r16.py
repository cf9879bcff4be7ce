#!/usr/bin/env python
"""Round-16 skewed-cluster probe (VERDICT r15 item 9): dedup APPLICATION
under a pathological cluster distribution — one near-dup cluster holding
10% of the corpus — vs a uniform distribution of size-2 clusters.

Probes, at ~10x the sf0.1 document count:

1. ``keep_best_representatives`` (dedup_keep_best's apply step — the
   row_number WINDOW shape) against a struct-min AGGREGATION alternative
   (reconstructed here) — the window sorts the whole hot cluster inside
   ONE partition, the aggregation combines it map-side but evaluates the
   members join twice;
2. ``keep_representatives`` (dedup_apply's apply step — no per-cluster
   ordering, skew-immune by shape; measured for the record);
3. ``connected_components(two-phase)`` on the hot-star edge set vs a
   uniform pair set (the clusters themselves have to be RESOLVED under
   the same skew).

Pass criterion (VERDICT): skewed-vs-uniform within ~1.5x, or the fix +
evidence.  Synthetic frames (no parquet): the probe isolates the apply
step's skew behavior from pair generation.

Usage: python tools/skew_probe_r16.py [--n 200000] [--reps 3]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def agg_keep_best(corpus, clusters, score, id_col="doc_id",
                  broadcast_limit=None):
    """min(struct(-score, id)) + winners-join argmax — the candidate
    skew-safe alternative, kept HERE for A/B: measured ~2x the window
    path locally (the members join evaluates twice), while the window
    passes the skew criterion; see keep_best_representatives' docstring."""
    from steel_datafusion_spark.pipeline.dedup import broadcast_if_small

    members = (corpus.select(F.col(id_col), score.alias("_score"))
               .join(broadcast_if_small(
                         clusters.select(id_col, "cluster_id"),
                         broadcast_limit), id_col))
    winners = (members.groupBy("cluster_id")
               .agg(F.min(F.struct((-F.col("_score")).alias("_ns"),
                                   F.col(id_col).alias("_wid")))
                    .alias("_w"))
               .select("cluster_id", F.col("_w._wid").alias("_wid")))
    drop = (members.join(broadcast_if_small(winners, broadcast_limit),
                         "cluster_id")
            .filter(F.col(id_col) != F.col("_wid"))
            .select(F.col(id_col)))
    return corpus.join(broadcast_if_small(drop, broadcast_limit),
                       id_col, "left_anti")


def main() -> int:
    n = 200_000
    reps = 3
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--n":
            n = int(args.pop(0))
        elif a == "--reps":
            reps = int(args.pop(0))
        else:
            raise SystemExit(f"unknown arg {a}")
    hot = n // 10

    from steel_datafusion_spark import session_context
    from steel_datafusion_spark.pipeline.dedup import (
        connected_components, keep_best_representatives,
        keep_representatives)

    spark = session_context(app_name="sdf-skew-probe-r16")
    spark.sparkContext.setLogLevel("ERROR")

    corpus = (spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 997).alias("n_chars"))).persist()
    corpus.count()
    # skewed: ids [0, hot) in ONE cluster; the rest in size-2 clusters
    skew = (spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < hot, F.lit(0))
        .otherwise(F.col("id") - (F.col("id") % 2)).alias("cluster_id"))
        ).persist()
    # uniform: everything in size-2 clusters
    unif = (spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") - (F.col("id") % 2)).alias("cluster_id"))).persist()
    skew.count(), unif.count()

    score = F.col("n_chars")
    impls = {
        "keep_best_agg": lambda cl: agg_keep_best(corpus, cl, score),
        "keep_best_window": lambda cl: keep_best_representatives(
            corpus, cl, score),
        "keep_reps": lambda cl: keep_representatives(corpus, cl),
    }
    out = {}
    for name, fn in impls.items():
        for dist, cl in (("skew", skew), ("uniform", unif)):
            best = None
            rows = None
            for _ in range(reps):
                spark.catalog.clearCache()
                corpus.persist().count()
                cl.persist().count()
                t0 = time.perf_counter()
                rows = fn(cl).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            out[f"{name}/{dist}"] = {"best": round(best, 3), "rows": rows}
            print(f"{name:18s} {dist:8s}: {best:6.2f}s ({rows} kept)",
                  file=sys.stderr)
        r = out[f"{name}/skew"]["best"] / out[f"{name}/uniform"]["best"]
        out[f"{name}/ratio"] = round(r, 2)
        print(f"{name:18s} skew/uniform ratio: {r:.2f}", file=sys.stderr)

    # two-phase CC under the same skew: hot star (0 -- i) + size-2 pairs
    pairs_skew = (spark.range(1, hot).select(
        F.lit(0).alias("doc_a"), F.col("id").alias("doc_b"))
        .unionByName(
            spark.range(hot, n, 2).select(
                F.col("id").alias("doc_a"),
                (F.col("id") + 1).alias("doc_b")))).persist()
    pairs_unif = (spark.range(0, n, 2).select(
        F.col("id").alias("doc_a"),
        (F.col("id") + 1).alias("doc_b"))).persist()
    pairs_skew.count(), pairs_unif.count()
    for dist, p in (("skew", pairs_skew), ("uniform", pairs_unif)):
        best = None
        for _ in range(reps):
            spark.catalog.clearCache()
            p.persist().count()
            t0 = time.perf_counter()
            nrows = connected_components(p, algorithm="two-phase").count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[f"cc_twophase/{dist}"] = {"best": round(best, 3), "rows": nrows}
        print(f"cc_twophase        {dist:8s}: {best:6.2f}s ({nrows} rows)",
              file=sys.stderr)
    out["cc_twophase/ratio"] = round(
        out["cc_twophase/skew"]["best"] / out["cc_twophase/uniform"]["best"],
        2)
    out["n"] = n
    out["hot"] = hot
    with open("bench_runs/skew_probe_r16.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
