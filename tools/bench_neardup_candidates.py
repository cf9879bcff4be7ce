"""Candidate-count evidence for the LSH-bucketed embedding neardup
(VERDICT r2 item 4).

Compares the number of candidate pairs fed to the exact-cosine verify by:

- ``blocked``  — r1's blocked all-pairs join (every same-label pair),
  the scale-killer: Σ_block |block|² work with parallelism = #blocks.
- ``lsh``      — the shipped sign-random-projection bucket join
  (n_planes bits + one-sided hamming-1 multiprobe, same-label conjunct):
  Σ_bucket |bucket|² · (1 + n_planes) work on 2^n_planes × #labels
  fine-grained hash keys.

Counting is done with the identical join conditions as the real pipeline
(pre-verify), so the numbers ARE the verify-stage input sizes.  Also
reports bucket-occupancy stats, which drive the n_planes sizing rule
documented in pipeline/similarity.py.

Usage: python tools/bench_neardup_candidates.py [sf_dir] [n_planes]
Writes one JSON line; paste results into PLANS.md (gen_plans.py appendix).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from steel_datafusion_spark import session_context  # noqa: E402
from steel_datafusion_spark.pipeline.queries import _aug_emb  # noqa: E402
from steel_datafusion_spark.pipeline.similarity import (  # noqa: E402
    hyperplanes, lsh_bucket,
)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_planes = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = session_context(app_name="sdf-neardup-candidates")
    spark.sparkContext.setLogLevel("ERROR")

    base = _aug_emb(spark, sf_dir).select(
        "vec_id", F.col("label").alias("blk"),
        lsh_bucket(F.col("embedding"), hyperplanes(n_planes)).alias("bucket"),
    ).persist()
    n = base.count()

    # blocked all-pairs candidates: count from per-label sizes (no join needed)
    blocks = base.groupBy("blk").agg(F.count(F.lit(1)).alias("c"))
    blocked = blocks.agg(
        F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("pairs")
    ).collect()[0].pairs

    # LSH candidates: same probe explode + join condition as
    # cosine_neardup_pairs, minus the cosine verify
    shifts = [0] + [1 << i for i in range(n_planes)]
    probes = base.select(
        "vec_id", "blk",
        F.explode(F.array(*[F.col("bucket").bitwiseXOR(F.lit(s))
                            for s in shifts])).alias("probe"))
    b = base.toDF("vid_b", "blk_b", "bucket_b")
    lsh = probes.join(
        b, on=[F.col("probe") == F.col("bucket_b"),
               F.col("vid_b") > F.col("vec_id"),
               F.col("blk") == F.col("blk_b")]).count()

    occ = base.groupBy("blk", "bucket").agg(F.count(F.lit(1)).alias("c")) \
        .agg(F.count(F.lit(1)).alias("n_buckets"),
             F.max("c").alias("max_bucket"),
             F.avg("c").alias("avg_bucket")).collect()[0]

    print(json.dumps({
        "sf_dir": sf_dir, "n_vectors": n, "n_planes": n_planes,
        "blocked_candidates": int(blocked), "lsh_candidates": int(lsh),
        "reduction_x": round(blocked / lsh, 1) if lsh else None,
        "occupied_buckets": occ.n_buckets,
        "max_bucket": occ.max_bucket,
        "avg_bucket": round(occ.avg_bucket, 1),
    }))


if __name__ == "__main__":
    main()
