#!/usr/bin/env python
"""End-to-end training-data curation pipeline on the documents table.

The full pre-training data path, each stage a lazy DataFrame transform —
one driver program, no intermediate materialization beyond the operators'
own barriers:

    raw docs
      → exact dedup            (md5 fingerprint, keep min doc_id)
      → near-dup clustering    (MinHash+LSH pairs → connected components,
                                keep each cluster's BEST member)
      → decontamination        (drop docs sharing 5-grams with the eval set)
      → repetition quality     (Gopher top-2-gram / dup-5-gram thresholds)
      → perplexity gate        (CCNet-style interpolated-LM buckets,
                                broadcast-cuts mode — drop the tail third)
      → mixture resampling     (deterministic md5 coin toward target
                                source weights)
      → train/val/test split   (hash thresholds — anti-leak)
      → sequence packing       (BPE-ish token counts → fixed-size chunks)

Run: python examples/curation_pipeline.py [sf_dir]  (default sf0.001)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from steel_datafusion_spark import session_context
from steel_datafusion_spark.cache import pipeline_cache_scope
from steel_datafusion_spark.pipeline.curation import (
    decontaminate, mixture_resample, repetition_stats,
)
from steel_datafusion_spark.pipeline.dedup import (
    connected_components, exact_dedup, minhash_dedup_pairs,
)
from steel_datafusion_spark.pipeline.packing import pack_chunks
from steel_datafusion_spark.pipeline.sampling import hash_split
from steel_datafusion_spark.sources.readers import load_tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = session_context(app_name="curation-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_tables(spark, sf_dir)["documents"]
    n0 = docs.count()

    with pipeline_cache_scope(spark):
        # 1. exact dedup — exact_dedup annotates every doc with its group
        # keeper; keep the keepers
        dup_ids = exact_dedup(docs).filter(F.col("is_dup")).select("doc_id")
        survivors = docs.join(dup_ids, "doc_id", "left_anti")

        # 2. near-dup clusters: keep each cluster's BEST member (longest
        # text — near-dup classes usually hold one full doc and several
        # truncated variants), not an arbitrary min-id one
        from steel_datafusion_spark.pipeline.dedup import (
            keep_best_representatives,
        )
        pairs = minhash_dedup_pairs(survivors, threshold=0.8)
        clusters = connected_components(pairs)
        survivors = keep_best_representatives(survivors, clusters,
                                              F.length("text"))

        # 3. decontamination vs a (stand-in) benchmark set
        eval_set = docs.filter(F.col("doc_id") % 97 == 0)
        contam = decontaminate(survivors, eval_set, n=5, min_hits=3) \
            .filter(F.col("contaminated")).select("doc_id")
        survivors = survivors.join(contam, "doc_id", "left_anti")

        # 4. repetition quality gate
        bad = repetition_stats(survivors).filter(~F.col("keep")) \
            .select("doc_id")
        survivors = survivors.join(bad, "doc_id", "left_anti")

        # 4b. exact-substring duplicated-span gate: drop docs that are
        # mostly duplicated token runs (Lee et al. style)
        from steel_datafusion_spark.pipeline.chunking import (
            duplicated_span_stats,
        )
        spans = duplicated_span_stats(survivors, n=8)
        spanbad = spans.filter(
            (F.col("n_tokens") > 0)
            & (F.col("dup_tokens") * 2 > F.col("n_tokens"))).select("doc_id")
        survivors = survivors.join(spanbad, "doc_id", "left_anti")

        # 4c. model-shaped quality gate: hashed linear classifier score
        from steel_datafusion_spark.pipeline.terms import with_classifier
        survivors = (with_classifier(survivors)
                     .filter(F.col("clf_score") > -0.5)
                     .drop("clf_score", "clf_label"))

        # 4d. domain adaptation: keep every English doc, plus the 50
        # non-English docs whose hashed n-gram distribution is most
        # English-like (DSIR importance resampling — the published
        # target-vs-pool selection shape)
        from steel_datafusion_spark.pipeline.selection import dsir_select

        # stage barrier: DSIR references the survivors relation several
        # times (target model, pool model, pool ids) — checkpointing here
        # keeps it from re-running the dedup/decontamination lineage per
        # reference
        survivors = survivors.localCheckpoint()
        tgt = F.col("lang") == "en"
        picked = dsir_select(survivors, tgt, k=50, n_buckets=2048,
                             seed=7).select("doc_id")
        survivors = survivors.join(
            survivors.filter(tgt).select("doc_id").unionByName(picked)
            .distinct(), "doc_id")

        # 4e. perplexity gate: CCNet-style interpolated-LM buckets over
        # the surviving corpus — drop the worst (tail) third
        from steel_datafusion_spark.pipeline.scoring import (
            perplexity_buckets,
        )
        tail = (perplexity_buckets(survivors, n_buckets=3, mode="cuts")
                .filter(F.col("bucket") == 3).select("doc_id"))
        survivors = survivors.join(tail, "doc_id", "left_anti")

        # 5. mixture: skew toward the first five sources
        targets = {f"src{i}": w for i, w in
                   enumerate([0.4, 0.3, 0.2, 0.05, 0.05])}
        mixed = mixture_resample(survivors, targets)

        # 6. anti-leak split
        split = hash_split(mixed, {"train": 0.9, "val": 0.05, "test": 0.05})

        # 7. pack the train split into fixed-token chunks (per source)
        from steel_datafusion_spark.pipeline.text import bpe_ish_token_count

        train = split.filter(F.col("split") == "train") \
            .withColumn("n_tok", bpe_ish_token_count(F.col("text")))
        packed = pack_chunks(train, group_cols=["source"],
                             order_col="doc_id", token_col="n_tok",
                             budget=512)

        counts = {r["split"]: r["n"] for r in
                  split.groupBy("split").agg(F.count("*").alias("n"))
                  .collect()}
        n_packed = packed.select("source", "bin_id").distinct().count()

        # corpus report: boilerplate heavy hitters over the kept train set
        from steel_datafusion_spark.pipeline.terms import heavy_hitters
        hot = heavy_hitters(train, "text", threshold_inv=64) \
            .orderBy(F.col("cnt").desc()).limit(5).collect()

        # shuffle-health report: would a groupBy/join on `source` hot-spot?
        from steel_datafusion_spark.operators.skew import skew_diagnose
        sk = skew_diagnose(train, ["source"], "train.source").collect()[0]

    print(f"raw docs:        {n0}")
    print(f"after curation:  {sum(counts.values())} {counts}")
    print(f"packed chunks:   {n_packed} (512-token, train split)")
    print("top boilerplate terms (>1/64 of train tokens): "
          + ", ".join(f"{r.term}({r.cnt})" for r in hot))
    print(f"source-key skew: factor {sk['skew_factor']}, "
          f"top1 share {sk['top1_share']}, "
          f"recommended salt {sk['recommended_salt']}")


if __name__ == "__main__":
    main()
