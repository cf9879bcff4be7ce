#!/usr/bin/env python
"""Runnable tour of INCREMENTAL index maintenance (round 12): a growing
corpus never pays a full index rebuild.

ANN lifecycle (pipeline/similarity.py + streaming/operators.py):

    build_ann_index                  -> frozen quantizer + bucketed assignment
    ann_index_append                 -> absorb a batch, O(batch x nlist)
    streaming_ann_index_maintenance  -> vector stream -> manifest delta,
                                        exactly-once (txn watermarks)
    ivf_topk_index_delta             -> probe base ∪ delta
    ann_index_compact                -> fold the delta into the base

Dedup lifecycle (pipeline/dedup.py + streaming/operators.py):

    build_dedup_index       -> banded corpus + hot-bucket flood guard
    dedup_index_append      -> absorb a batch; hot guard recounted exactly
    streaming_dedup_ingest  -> dedup the crawl AS IT LANDS: every batch is
                               matched against the corpus AND everything
                               already streamed, replay-safe

Both grown indexes are bit-identical to from-scratch rebuilds (the gates
hash exactly that); this demo prints the lifecycle numbers.

Run: python examples/index_maintenance_demo.py   (local[*], ~60 s)
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from steel_datafusion_spark import session_context
from steel_datafusion_spark.pipeline.dedup import (
    build_dedup_index, dedup_index_append,
)
from steel_datafusion_spark.pipeline.similarity import (
    ann_index_append, ann_index_compact, build_ann_index,
    ivf_topk_index, ivf_topk_index_delta,
)
from steel_datafusion_spark.sources.readers import load_tables
from steel_datafusion_spark.streaming.operators import (
    streaming_ann_index_maintenance, streaming_dedup_ingest,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    spark = session_context(app_name="index-maintenance-demo")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="idx_demo_")
    try:
        e = load_tables(spark, SF_DIR)["embeddings"]
        cut = e.count() * 3 // 5
        print(f"== ANN: build on {cut} vectors, grow to {e.count()}")
        build_ann_index(e.filter(F.col("vec_id") < cut), "demo_ann",
                        nlist=10)
        tail = e.filter(F.col("vec_id") >= cut)
        st = ann_index_append(tail.filter(F.col("vec_id") % 2 == 0),
                              "demo_ann", drift_threshold=0.3)
        print(f"   append #1: {st}")
        # the other half arrives as a STREAM -> manifest delta,
        # exactly-once across restarts
        src = os.path.join(work, "vec_src")
        delta = os.path.join(work, "ann_delta")
        s2 = tail.filter(F.col("vec_id") % 2 == 1)
        s2.repartition(2).write.mode("overwrite").parquet(src)
        streaming_ann_index_maintenance(
            spark, src, s2.schema, "demo_ann", delta,
            os.path.join(work, "ann_work"))
        q = e.filter(F.col("vec_id") < 3)
        # materialize BEFORE compacting: a lazy plan over the old
        # assignment table can't be re-run once compaction swaps it
        # (standard Spark snapshot semantics, same as any OPTIMIZE)
        hits = sorted(map(tuple, ivf_topk_index_delta(
            q, "demo_ann", delta, k=5, nprobe=2).collect()))
        print(f"   base∪delta probe: {len(hits)} rows")
        print(f"   compact: {ann_index_compact(spark, 'demo_ann', delta)}")
        hits2 = sorted(map(tuple, ivf_topk_index(
            q, "demo_ann", k=5, nprobe=2).collect()))
        assert hits == hits2
        print("   post-compact probe identical — lifecycle closed")

        d = load_tables(spark, SF_DIR)["documents"].select("doc_id", "text")
        print("\n== Dedup: build on even ids, stream the crawl in")
        build_dedup_index(d.filter(F.col("doc_id") % 2 == 0), "demo_dd")
        st = dedup_index_append(
            d.filter((F.col("doc_id") % 2 == 1) & (F.col("doc_id") < 100)),
            "demo_dd")
        print(f"   append: {st}")
        crawl = os.path.join(work, "crawl_src")
        s1 = d.filter(F.col("doc_id") < 20).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat("text", F.lit(" crawl dup")).alias("text"))
        s2 = d.filter(F.col("doc_id") < 10).select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.concat("text", F.lit(" crawl dup")).alias("text"))
        s1.coalesce(1).write.mode("append").parquet(crawl)
        s2.coalesce(1).write.mode("append").parquet(crawl)
        matches = streaming_dedup_ingest(
            spark, crawl, s1.schema, "demo_dd",
            os.path.join(work, "dd_work"))
        n_sb = matches.filter(F.col("doc_a") < 1000000).count()
        n_ss = matches.filter(F.col("doc_a") >= 1000000).count()
        print(f"   streamed matches: {n_sb} vs-corpus, {n_ss} "
              f"vs-earlier-stream (cross-batch)")

        # close the dedup lifecycle too: compact the streamed delta
        # into the bucketed base, then show the RETENTION story — the
        # delta roots' file counts are bounded (per-batch vacuum keeps
        # 2 versions; the compact's reset empties the live snapshot)
        from steel_datafusion_spark.pipeline.dedup import (
            dedup_against_index, dedup_index_compact,
            minhash_dedup_against,
        )

        def _tree_files(root):
            return sum(len(fs) for _d, _s, fs in os.walk(root))

        dd_work = os.path.join(work, "dd_work")
        bands_delta = os.path.join(dd_work, "delta_bands")
        probe = d.filter(F.col("doc_id") < 8).select(
            (F.col("doc_id") + 3000000).alias("doc_id"),
            F.concat("text", F.lit(" crawl dup")).alias("text"))
        # ground truth: the probe against base ∪ appended ∪ streamed,
        # computed directly (no index)
        grown_corpus = (d.filter((F.col("doc_id") % 2 == 0)
                                 | (F.col("doc_id") < 100))
                        .unionByName(s1).unionByName(s2))
        want = sorted(map(tuple, minhash_dedup_against(
            probe, grown_corpus, threshold=0.5).collect()))
        n_before = _tree_files(bands_delta)
        st = dedup_index_compact(spark, "demo_dd", dd_work)
        print(f"   compact: {st}")
        post = sorted(map(tuple, dedup_against_index(
            probe, "demo_dd", threshold=0.5).collect()))
        assert post == want  # compacted index == direct computation
        n_after = _tree_files(bands_delta)
        print(f"   post-compact probe matches direct computation — "
              f"lifecycle closed; delta files {n_before} -> {n_after} "
              f"(bounded: reset snapshot is empty, retention keeps "
              f"2 versions)")
        return 0
    finally:
        for t in ("demo_ann_centroids", "demo_ann_assign", "demo_ann_meta",
                  "demo_dd_bands", "demo_dd_shingles", "demo_dd_meta",
                  "demo_dd_hot"):
            spark.sql(f"DROP TABLE IF EXISTS `{t}`")
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
