#!/usr/bin/env python
"""Drift→recall calibration for the frozen IVF quantizer (VERDICT r12
next-round item 5).

``ann_index_append`` freezes the coarse quantizer: appended batches are
assigned to the TRAINING distribution's centroids, which never affects
correctness (probes stay exact within probed buckets) but loses recall
as the appended data walks away from the centroids — drifted vectors
pile into few, badly-fitting buckets, so a fixed nprobe covers a
shrinking share of each query's true neighbors.  The verb returns
``mean_centroid_cosine`` as the drift SIGNAL; this tool ties that
signal to the quantity an operator actually cares about (recall@k) so
``drift_threshold`` is a calibrated number instead of a guess.

Per drift level alpha: rebuild the base index (kmeans), synthesize a
drifted batch v' = v + alpha*d (one fixed random direction d, seeded —
a crude but monotone model of distribution shift), append it (recording
the signal), then measure recall@10 of the IVF probe against exact
brute force for QUERIES DRAWN FROM THE DRIFTED DISTRIBUTION, at several
nprobe.  Output: one JSON row per alpha + a calibration line (the
largest mean-cosine at which recall has dropped >5% below the
undrifted level — the recommended drift_threshold region).

Usage:
    python tools/drift_sweep.py [--sf /root/testdata/sf0.01]
                                [--out bench_runs/drift_sweep.json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALPHAS = [0.0, 0.3, 0.6, 1.0, 1.5, 2.5]
NPROBES = [1, 2, 4]
K = 10
N_QUERIES = 25


def main() -> int:
    out_path = "bench_runs/drift_sweep.json"
    sf = "/root/testdata/sf0.01"
    args = sys.argv[1:]
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]

    import numpy as np
    from pyspark.sql import functions as F

    from steel_datafusion_spark import session_context
    from steel_datafusion_spark.pipeline.similarity import (
        ann_index_append, build_ann_index, cosine_topk, ivf_topk_index,
    )
    from steel_datafusion_spark.sources.bucketing import drop_managed_table

    spark = session_context(app_name="drift-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    e = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
    n = e.count()
    dim = len(e.head().embedding)
    cut = n * 3 // 5
    base = e.filter(F.col("vec_id") < cut)
    tail = e.filter(F.col("vec_id") >= cut)
    rng = np.random.default_rng(13)
    d = rng.standard_normal(dim)
    d = (d / np.linalg.norm(d)).tolist()
    d_col = F.array(*[F.lit(float(x)) for x in d])

    name = "driftsweep_idx"
    tables = [f"{name}_{s}" for s in ("centroids", "assign", "meta")]
    rows = []
    # the ingest shape the r14 policy models: an UNDRIFTED reference
    # batch lands first (ann_index_append records its mean as
    # ref_signal — the first out-of-sample measurement), then the
    # drifted batch arrives and the relative policy judges it against
    # that reference.  Comparing against the BUILD mean instead would
    # mis-fire: it is in-sample (kmeans optimizes its own corpus) and
    # sits ~29% above any fresh batch at zero drift.  The reference is
    # the SAME tail undrifted (fresh ids), so signal_rel_drop(alpha=0)
    # is exactly 0 and the curve isolates drift from batch-composition
    # noise (a parity split of this fixture's tail shifts the mean by
    # ~11% on its own).
    ref_batch = tail.select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.col("embedding"), F.col("label"))
    for alpha in ALPHAS:
        for t in tables:
            drop_managed_table(spark, t)
        build_ann_index(base, name, nlist=10, n_buckets=4,
                        train="kmeans")
        r_ref = ann_index_append(ref_batch, name)
        assert r_ref["ref_signal"] is not None
        shifted = tail.select(
            (F.col("vec_id") + 2000000).alias("vec_id"),
            F.zip_with("embedding", d_col,
                       lambda a, b: (a + F.lit(float(alpha)) * b)
                       .cast("float")).alias("embedding"),
            F.col("label"))
        r = ann_index_append(shifted, name)
        corpus = base.unionByName(ref_batch).unionByName(shifted)
        q = shifted.filter(F.col("vec_id") < 2000000 + cut + N_QUERIES) \
            .select(F.col("vec_id"), F.col("embedding"), F.col("label"))
        bf = (cosine_topk(q, corpus, k=K)
              .select("query_id", "neighbor_id").persist())
        n_q = bf.select("query_id").distinct().count()
        row = {"alpha": alpha,
               "mean_centroid_cosine":
                   round(r["mean_centroid_cosine"], 4),
               "base_signal": round(r["base_signal"], 4),
               "ref_signal": round(r["ref_signal"], 4),
               "signal_rel_drop": round(r["signal_rel_drop"], 4),
               "retrain_recommended_default":
                   bool(r["retrain_recommended"]),
               "n_queries": n_q}
        for nprobe in NPROBES:
            approx = ivf_topk_index(q, name, k=K, nprobe=nprobe) \
                .select("query_id", "neighbor_id")
            hits = approx.join(bf, ["query_id", "neighbor_id"]).count()
            row[f"recall_nprobe{nprobe}"] = round(hits / (n_q * K), 4)
        bf.unpersist()
        rows.append(row)
        print(json.dumps(row), flush=True)
    for t in tables:
        drop_managed_table(spark, t)

    base_recall = rows[0]["recall_nprobe2"]
    for row in rows:
        row["recall_rel_nprobe2"] = round(
            row["recall_nprobe2"] / base_recall, 4)
    threshold = None
    rel_threshold = None
    for row in rows:
        if row["recall_nprobe2"] < 0.95 * base_recall:
            threshold = row["mean_centroid_cosine"]
            rel_threshold = row["signal_rel_drop"]
            break
    result = {"rows": rows, "k": K, "nprobes": NPROBES,
              "recall_baseline_nprobe2": base_recall,
              "build_time_mean_cosine": rows[0]["base_signal"],
              "ref_signal": rows[0]["ref_signal"],
              "calibrated_drift_threshold": threshold,
              "calibrated_relative_drop": rel_threshold,
              "note": ("r14: the verb applies the RELATIVE policy "
                       "itself — the first append records ref_signal "
                       "(first out-of-sample measurement) in the index "
                       "meta, later appends recommend retrain when "
                       "signal_rel_drop = 1 - mean/ref_signal exceeds "
                       "drift_rel_threshold (default 1%).  Each row "
                       "here is the DRIFTED second append judged "
                       "against an undrifted first append. "
                       "calibrated_relative_drop is the smallest "
                       "signal_rel_drop at which recall@10 (nprobe=2) "
                       "has lost >5%.  The build-time base_signal is "
                       "IN-SAMPLE (kmeans optimizes its own corpus) "
                       "and sits far above fresh batches at zero "
                       "drift — that is exactly why the policy anchors "
                       "to ref_signal, not the build mean.  Recall is "
                       "NOT monotone in drift: extreme drift "
                       "re-concentrates the appended mass into few "
                       "buckets and recall recovers — the dangerous "
                       "region is MODERATE drift, which the relative "
                       "policy catches.")}
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(f"wrote {out_path}: calibrated_drift_threshold={threshold}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
