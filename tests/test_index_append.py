"""Incremental maintenance of the persisted ANN and dedup indexes
(VERDICT r11 item 2): ``ann_index_append`` / ``dedup_index_append``
absorb a corpus batch by assigning/banding ONLY the batch against the
stored quantizer/parameters and appending to the bucketed tables.

The contract under test:

1. an index grown across >=2 appends is BIT-IDENTICAL to a one-shot
   build over the full corpus with the same (frozen) quantizer — probes
   return exactly the same rows;
2. the append never re-scans the base corpus source (executed-plan
   assertion);
3. the MinHash hot-bucket flood guard stays EXACT through appends — a
   bucket pushed over the occupancy cap BY the batch is detected;
4. drift telemetry reports, and the bucketed layout survives appends.
"""

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _drop(spark, *tables):
    from steel_datafusion_spark.sources.bucketing import drop_managed_table

    for t in tables:
        drop_managed_table(spark, t)


def _idx_tables(name):
    return [f"{name}_{s}" for s in
            ("bands", "shingles", "meta", "hot", "centroids", "assign")]


def test_ann_index_append_equals_full_rebuild(spark):
    from steel_datafusion_spark.pipeline.similarity import (
        ann_index_append, build_ann_index, ivf_topk_index,
    )

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n = e.count()
    cut = n * 3 // 5
    base = e.filter(F.col("vec_id") < cut)
    b1 = e.filter((F.col("vec_id") >= cut) & (F.col("vec_id") % 2 == 0))
    b2 = e.filter((F.col("vec_id") >= cut) & (F.col("vec_id") % 2 == 1))
    q = e.filter(F.col("vec_id") < 5)
    _drop(spark, *_idx_tables("annap_g"), *_idx_tables("annap_f"))
    try:
        build_ann_index(base, "annap_g", nlist=10, n_buckets=4)
        r1 = ann_index_append(b1, "annap_g", drift_threshold=0.0)
        r2 = ann_index_append(b2, "annap_g")
        assert r1["appended"] + r2["appended"] == n - cut
        assert 0.0 <= r1["mean_centroid_cosine"] <= 1.0 or \
            r1["mean_centroid_cosine"] >= -1.0
        assert r1["retrain_recommended"] is False  # threshold 0.0
        grown = ivf_topk_index(q, "annap_g", k=10, nprobe=2)
        # one-shot rebuild over the FULL corpus with the SAME frozen
        # quantizer must reproduce the grown index bit-for-bit
        build_ann_index(e, "annap_f", nlist=10, n_buckets=4,
                        centroids=spark.table("annap_g_centroids"))
        full = ivf_topk_index(q, "annap_f", k=10, nprobe=2)
        assert _rows(grown) == _rows(full)
        assert len(_rows(grown)) == 5 * 10
        # the probe's candidate join still reads the bucketed layout
        # shuffle-free on the assignment side after appends
        plan = grown._jdf.queryExecution().executedPlan().toString()
        assert "annap_g_assign" in plan
        # at most the query side exchanges on the join key (none at all
        # when AQE broadcasts the probes); the appended bucketed
        # assignment scan reaches the join shuffle-free either way
        assert plan.count("Exchange hashpartitioning(centroid_id") <= 1, \
            plan[:3000]
        assert "SelectedBucketsCount" in plan  # bucket spec survived
    finally:
        _drop(spark, *_idx_tables("annap_g"), *_idx_tables("annap_f"))


def test_ann_index_append_rejects_missing_carry(spark):
    from steel_datafusion_spark.pipeline.similarity import (
        ann_index_append, build_ann_index,
    )

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet") \
        .withColumn("label", (F.col("vec_id") % 3).cast("int"))
    _drop(spark, *_idx_tables("annap_c"))
    try:
        build_ann_index(e.filter(F.col("vec_id") < 100), "annap_c",
                        nlist=5, n_buckets=2, carry=("label",))
        with pytest.raises(ValueError, match="label"):
            ann_index_append(
                e.filter(F.col("vec_id") >= 100).drop("label"), "annap_c")
    finally:
        _drop(spark, *_idx_tables("annap_c"))


def test_dedup_index_append_equals_full_rebuild(spark):
    from steel_datafusion_spark.pipeline.dedup import (
        build_dedup_index, dedup_against_index, dedup_index_append,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter((F.col("doc_id") % 2 == 1) & (F.col("doc_id") % 4 == 1))
    b2 = docs.filter((F.col("doc_id") % 2 == 1) & (F.col("doc_id") % 4 == 3))
    probe = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" steel spark dedup")).alias("text"))
    probe = spark.createDataFrame(probe.collect(), schema=probe.schema)
    _drop(spark, *_idx_tables("ddap_g"), *_idx_tables("ddap_f"))
    try:
        build_dedup_index(base, "ddap_g", n_buckets=4)
        s1 = dedup_index_append(b1, "ddap_g")
        s2 = dedup_index_append(b2, "ddap_g")
        assert s1["appended_docs"] + s2["appended_docs"] == \
            docs.count() - base.count()
        got = dedup_against_index(probe, "ddap_g", threshold=0.5)
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "testdata" not in plan  # probe never rescans the corpus
        build_dedup_index(docs, "ddap_f", n_buckets=4)
        want = dedup_against_index(probe, "ddap_f", threshold=0.5)
        assert _rows(got) == _rows(want)
        assert len(_rows(got)) >= 20  # the planted near-dups all match
    finally:
        _drop(spark, *_idx_tables("ddap_g"), *_idx_tables("ddap_f"))


def test_dedup_index_append_maintains_hot_guard_exactly(spark):
    """A band bucket pushed over the occupancy cap BY an appended batch
    must enter the hot table (with the global min-id rep), keeping the
    flood guard identical to a from-scratch build — probes on a grown
    index stay flood-proof."""
    from steel_datafusion_spark.pipeline.dedup import (
        build_dedup_index, dedup_against_index, dedup_index_append,
    )

    flood = "common boilerplate header repeated verbatim across pages"
    mk = lambda lo, hi: spark.createDataFrame(  # noqa: E731
        [(i, flood) for i in range(lo, hi)], "doc_id long, text string")
    _drop(spark, *_idx_tables("ddhot_g"), *_idx_tables("ddhot_f"))
    try:
        # cap=6: 4 base copies stay cold; +8 appended copies cross it
        build_dedup_index(mk(0, 4), "ddhot_g", n_buckets=2, max_bucket=6)
        assert spark.table("ddhot_g_hot").count() == 0
        dedup_index_append(mk(100, 108), "ddhot_g")
        hot_g = _rows(spark.table("ddhot_g_hot"))
        assert len(hot_g) > 0  # the batch made the bucket hot
        build_dedup_index(mk(0, 4).unionByName(mk(100, 108)), "ddhot_f",
                          n_buckets=2, max_bucket=6)
        assert hot_g == _rows(spark.table("ddhot_f_hot"))
        probe = spark.createDataFrame([(999999, flood)],
                                      "doc_id long, text string")
        got = dedup_against_index(probe, "ddhot_g", threshold=0.5)
        want = dedup_against_index(probe, "ddhot_f", threshold=0.5)
        assert _rows(got) == _rows(want)
    finally:
        _drop(spark, *_idx_tables("ddhot_g"), *_idx_tables("ddhot_f"))


def test_dedup_index_append_requires_meta(spark):
    from steel_datafusion_spark.pipeline.dedup import dedup_index_append

    _drop(spark, "ddnometa_meta")
    with pytest.raises(ValueError, match="meta"):
        dedup_index_append(
            spark.createDataFrame([(1, "x")], "doc_id long, text string"),
            "ddnometa")


def test_build_ann_index_in_place_rebuild_with_own_centroids(spark):
    """The documented maintenance call — rebuilding an index IN PLACE
    with its OWN stored centroids — must not destroy the quantizer it
    reads: the centroids argument is materialized before the drops."""
    from pyspark.sql import functions as F

    from steel_datafusion_spark.pipeline.similarity import (
        build_ann_index, ivf_topk_index,
    )

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    _drop(spark, *_idx_tables("annap_ip"))
    try:
        build_ann_index(e.filter(F.col("vec_id") < 300), "annap_ip",
                        nlist=8, n_buckets=2)
        q = e.filter(F.col("vec_id") < 3)
        before = _rows(ivf_topk_index(q, "annap_ip", k=5, nprobe=2))
        # grow the corpus, rebuild THE SAME index with its own quantizer
        build_ann_index(e, "annap_ip", nlist=8, n_buckets=2,
                        centroids=spark.table("annap_ip_centroids"))
        after = _rows(ivf_topk_index(q, "annap_ip", k=5, nprobe=2))
        assert len(after) == len(before) == 3 * 5  # index alive, grown
    finally:
        _drop(spark, *_idx_tables("annap_ip"))


def test_dedup_hot_swap_crash_recovers(spark):
    """A hot-table swap that crashed between the drop and the rename
    (swap table present, hot table gone) must self-heal on the next
    append or probe — a capped index may never silently probe
    unguarded."""
    from steel_datafusion_spark.pipeline.dedup import (
        build_dedup_index, dedup_against_index, dedup_index_append,
    )

    flood = "common boilerplate header repeated verbatim across pages"
    mk = lambda lo, hi: spark.createDataFrame(  # noqa: E731
        [(i, flood) for i in range(lo, hi)], "doc_id long, text string")
    _drop(spark, *_idx_tables("ddhot_r"))
    try:
        build_dedup_index(mk(0, 4), "ddhot_r", n_buckets=2, max_bucket=6)
        dedup_index_append(mk(100, 108), "ddhot_r")
        hot = sorted(map(tuple, spark.table("ddhot_r_hot").collect()))
        assert hot
        # simulate the crash window: hot dropped, swap holds the truth
        spark.table("ddhot_r_hot").write.saveAsTable("ddhot_r_hot_swap")
        _drop(spark, "ddhot_r_hot")
        probe = spark.createDataFrame([(999999, flood)],
                                      "doc_id long, text string")
        got = dedup_against_index(probe, "ddhot_r", threshold=0.5)
        got.collect()  # the probe healed the swap before running
        assert sorted(map(tuple,
                          spark.table("ddhot_r_hot").collect())) == hot
        assert not spark.catalog.tableExists("ddhot_r_hot_swap")
    finally:
        _drop(spark, *_idx_tables("ddhot_r"), "ddhot_r_hot_swap")
