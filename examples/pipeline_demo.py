#!/usr/bin/env python
"""End-to-end training-data curation pipeline on the test corpus — every
stage a library operator, every stage lazy until an action:

    load → quality filter (Gopher repetition gates + token floor)
         → near-dedup (simhash pairs → two-phase CC → representative filter)
         → benchmark decontamination (broadcast eval shingles)
         → domain caps → mixture resampling
         → train/val/test split → training-order sharding
         → sequence-packing accounting per shard

Run: python examples/pipeline_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from steel_datafusion_spark import load_tables, session_context  # noqa: E402
from steel_datafusion_spark.pipeline.curation import (  # noqa: E402
    decontaminate, mixture_resample, repetition_stats,
)
from steel_datafusion_spark.pipeline.dedup import dedup_corpus  # noqa: E402
from steel_datafusion_spark.pipeline.packing import pack_bins_summary  # noqa: E402
from steel_datafusion_spark.pipeline.sampling import (  # noqa: E402
    domain_cap, hash_split, shard_assignment,
)
from steel_datafusion_spark.pipeline.text import token_count  # noqa: E402


def stage(n, label, df):
    print(f"  [{n}] {label}: {df.count()} docs")
    return df


def main():
    spark = session_context(app_name="curation-pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    docs = load_tables(spark, sf)["documents"]
    print(f"curation pipeline over {sf}")
    stage(0, "raw corpus", docs)

    # 1. quality filter: Gopher repetition gates + a token floor
    rep = repetition_stats(docs)
    quality = (docs.join(rep.select("doc_id", "keep", "n_tokens"), "doc_id")
               .filter(F.col("keep") & (F.col("n_tokens") >= 5))
               .select(docs.columns))
    quality = stage(1, "after quality filter", quality)

    # 2. near-dedup: one representative per simhash cluster
    deduped = stage(2, "after near-dedup",
                    dedup_corpus(quality, max_hamming=10))

    # 3. decontamination vs a pretend eval set (first 5 docs as "benchmark")
    evalset = docs.filter(F.col("doc_id") < 5).select("doc_id", "text")
    contam = decontaminate(deduped, evalset)
    clean = deduped.join(
        contam.filter(~F.col("contaminated")).select("doc_id"), "doc_id")
    clean = stage(3, "after decontamination", clean)

    # 4-5. per-domain caps, then resample toward a skewed mixture
    capped = stage(4, "after domain cap (20/source)", domain_cap(clean, 20))
    targets = {f"src{i}": (0.3 if i == 0 else 0.7 / 19) for i in range(20)}
    mixed = stage(5, "after mixture resample",
                  mixture_resample(capped, targets))

    # 6. split + shard for the data loader
    split = hash_split(mixed, {"train": 0.9, "val": 0.05, "test": 0.05})
    train = split.filter(F.col("split") == "train")
    sharded = shard_assignment(train, n_shards=4)
    print("  [6] train split shards:",
          sorted((r.shard, r["count"]) for r in
                 sharded.groupBy("shard").count().collect()))

    # 7. sequence-packing accounting: 2048-token bins in shard order
    with_tokens = sharded.withColumn("n_tokens", token_count(F.col("text")))
    bins = pack_bins_summary(with_tokens, ["shard"], "pos", "n_tokens", 2048)
    print("  [7] packing summary (first bins per shard):")
    bins.orderBy("shard", "bin_id").show(8, truncate=False)
    print("pipeline complete — every stage is a lazy DataFrame; the only "
          "actions are these counts and the final show.")


if __name__ == "__main__":
    main()
