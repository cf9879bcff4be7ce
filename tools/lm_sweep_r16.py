#!/usr/bin/env python
"""Round-16 evidence for the r15 tokenize-once LM-scorer trade (VERDICT
r15 item 8): A/B the CURRENT interpolated scorer (ONE persisted
per-(doc, bigram) count table feeds model AND scoring) against the
PRE-r15 shape (the corpus is tokenized twice: once for the model counts,
once more for the scoring join, which ships every token POSITION through
the bigram-key exchange) — at sf0.1 and at a 10x synthetic corpus
(scale_sweep.build_sf1x vocabulary-permuted copies, linear ground truth).

The old shape is reconstructed HERE, in tooling, purely for measurement;
the engine exposes only the tokenize-once path.  Both shapes produce
identical rows (same arithmetic, same rounding) — asserted on the first
rep at each scale.

Usage:
    python tools/lm_sweep_r16.py [--out bench_runs/lm_sweep_r16.json]
                                 [--reps N] [--scales sf0.1,sf1x]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def old_interpolated_logprob_score(df, id_col="doc_id", text_col="text",
                                   alpha=0.5, lam=0.7):
    """The pre-r15 (tokenize-twice) shape, for A/B only."""
    from steel_datafusion_spark.cache import track
    from steel_datafusion_spark.pipeline.scoring import _spread
    from steel_datafusion_spark.pipeline.text import tokens

    toks = tokens(F.col(text_col))
    bigram_arr = F.when(
        F.size(toks) < 2, F.array().cast("array<string>")
    ).otherwise(F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.concat_ws(" ", a, b)))
    bg = _spread(df).select(F.col(id_col), F.explode(bigram_arr).alias("bg"))
    counts = track(bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c"))
                   .persist())
    prefix = (counts.select(
        F.element_at(F.split(F.col("bg"), " "), 1).alias("w1"), "c")
        .groupBy("w1").agg(F.sum("c").alias("cp")))
    uni = (counts.select(
        F.element_at(F.split(F.col("bg"), " "), 2).alias("w2"), "c")
        .groupBy("w2").agg(F.sum("c").alias("cu")))
    totals = counts.agg(
        F.count(F.lit(1)).cast("double").alias("_vocab_bi"),
        F.sum("c").cast("double").alias("_n_pos"))
    vocab_uni = uni.agg(F.count(F.lit(1)).cast("double").alias("_vocab_uni"))
    logp = (counts
            .withColumn("w1", F.element_at(F.split(F.col("bg"), " "), 1))
            .withColumn("w2", F.element_at(F.split(F.col("bg"), " "), 2))
            .join(prefix, "w1").join(uni, "w2")
            .crossJoin(F.broadcast(totals))
            .crossJoin(F.broadcast(vocab_uni))
            .select("bg", F.round(-F.log(
                F.lit(lam) * ((F.col("c") + F.lit(alpha))
                              / (F.col("cp")
                                 + F.lit(alpha) * F.col("_vocab_bi")))
                + F.lit(1.0 - lam) * ((F.col("cu") + F.lit(alpha))
                                      / (F.col("_n_pos")
                                         + F.lit(alpha)
                                         * F.col("_vocab_uni")))), 9)
                .cast("decimal(20,9)").alias("nlp")))
    # the scoring join re-tokenizes: bg's lineage re-runs under the join
    scored = (bg.join(logp, "bg")
              .groupBy(id_col)
              .agg(F.count(F.lit(1)).alias("n_grams"),
                   F.sum("nlp").alias("s")))
    return (df.select(F.col(id_col)).distinct()
            .join(scored, id_col, "left")
            .select(
                F.col(id_col),
                F.coalesce(F.col("n_grams"), F.lit(0)).cast("long")
                .alias("n_grams"),
                F.when(F.col("n_grams").isNull(), F.lit(0.0))
                .otherwise(F.round(F.col("s").cast("double")
                                   / F.col("n_grams"), 6))
                .alias("mean_neg_logprob")))


def main() -> int:
    out_path = "bench_runs/lm_sweep_r16.json"
    reps = 3
    scales = ["sf0.1", "sf1x"]
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--out":
            out_path = args.pop(0)
        elif a == "--reps":
            reps = int(args.pop(0))
        elif a == "--scales":
            scales = args.pop(0).split(",")
        else:
            raise SystemExit(f"unknown arg {a}")

    from steel_datafusion_spark import session_context
    from steel_datafusion_spark.pipeline.scoring import (
        interpolated_logprob_score)
    from steel_datafusion_spark.sources.readers import load_tables

    spark = session_context(app_name="sdf-lm-sweep-r16")
    spark.sparkContext.setLogLevel("ERROR")

    base = "/root/testdata/sf0.1"
    dirs = {}
    for s in scales:
        if s == "sf1x":
            out_dir = "/tmp/sdf_lm_sweep_sf1x"
            if not os.path.exists(f"{out_dir}/documents.parquet"):
                from tools.scale_sweep import build_sf1x
                build_sf1x(spark, base, out_dir)
            dirs[s] = out_dir
        else:
            dirs[s] = f"/root/testdata/{s}"

    shapes = {
        "tokenize_once": lambda d: interpolated_logprob_score(d),
        "tokenize_twice_old": lambda d: old_interpolated_logprob_score(d),
    }
    results = {}
    for s in scales:
        docs_dir = dirs[s]
        t = load_tables(spark, docs_dir)
        n_docs = t["documents"].count()
        first_rows = {}
        for shape, fn in shapes.items():
            samples = []
            for rep in range(reps):
                spark.catalog.clearCache()
                d = load_tables(spark, docs_dir)["documents"]
                spark.sparkContext.setJobDescription(
                    f"lm-sweep {s} {shape} r{rep}")
                t0 = time.perf_counter()
                out = fn(d)
                arrow = out.toArrow()
                dt = round(time.perf_counter() - t0, 3)
                samples.append(dt)
                print(f"{s} {shape} rep{rep}: {dt}s "
                      f"({arrow.num_rows} rows)", file=sys.stderr)
                if rep == 0:
                    first_rows[shape] = sorted(
                        map(tuple, arrow.to_pylist()[0].items()))
                    first_rows.setdefault("_full_" + shape, arrow)
            results[f"{s}/{shape}"] = {
                "n_docs": n_docs, "samples": samples,
                "best": min(samples)}
        a = first_rows.get("_full_tokenize_once")
        b = first_rows.get("_full_tokenize_twice_old")
        if a is not None and b is not None:
            sa = sorted(map(str, a.to_pylist()))
            sb = sorted(map(str, b.to_pylist()))
            assert sa == sb, f"shapes disagree at {s}"
            print(f"{s}: shapes produce identical rows "
                  f"({len(sa)} rows)", file=sys.stderr)
        results[f"{s}/_match"] = True

    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: v for k, v in results.items()
                      if not k.endswith("_match")}, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
