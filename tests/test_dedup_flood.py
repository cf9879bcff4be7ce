"""Band-bucket occupancy cap (pipeline/dedup.py _candidates /
_match_batch_to_corpus): a planted boilerplate flood must produce a BOUNDED
candidate count (star edges to the bucket representative, O(m) per bucket)
instead of the uncapped O(m²) all-pairs join, while non-flood corpora are
bit-identical with the cap on or off and flood docs still resolve into one
connected component."""

from pyspark.sql import functions as F

from steel_datafusion_spark.pipeline.dedup import (
    build_dedup_index, connected_components, dedup_against_index,
    minhash_candidate_pairs, minhash_dedup_against, minhash_dedup_pairs,
)

FLOOD_N = 300
BOILER = ("this website uses cookies to improve your experience "
          "please accept our terms of service and privacy policy "
          "all rights reserved contact us for more information today")


def _flood_df(spark, n=FLOOD_N, extra=None):
    rows = [(i, BOILER) for i in range(n)]
    if extra:
        rows += extra
    return spark.createDataFrame(rows, "doc_id long, text string")


def _varied_df(spark, n=120):
    # distinct docs + a small planted near-dup set; no bucket approaches
    # the default cap, so capped and uncapped runs must agree exactly
    rows = [(i, f"unique document number {i} about topic {i * 7 % 13} "
                f"with body text segment {i * i} and trailing words {i % 5}")
            for i in range(n)]
    rows += [(1000 + i, rows[i][1] + " near dup suffix") for i in range(10)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_flood_candidates_bounded(spark):
    df = _flood_df(spark)
    capped = minhash_candidate_pairs(df, max_bucket=50)
    # identical texts ⇒ identical signatures ⇒ every band bucket holds all
    # FLOOD_N docs ⇒ star edges only: (min, other) for each of the others
    got = capped.collect()
    assert len(got) == FLOOD_N - 1
    assert all(r.doc_a == 0 and r.doc_a < r.doc_b for r in got)


def test_flood_still_one_cluster(spark):
    df = _flood_df(spark)
    pairs = minhash_dedup_pairs(df, max_bucket=50, threshold=0.5)
    cc = connected_components(pairs, algorithm="two-phase")
    clusters = {r.cluster_id for r in cc.collect()}
    assert clusters == {0}
    assert cc.count() == FLOOD_N


def test_cap_is_noop_without_flood(spark):
    df = _varied_df(spark)
    capped = {tuple(r) for r in
              minhash_dedup_pairs(df, max_bucket=1000).collect()}
    uncapped = {tuple(r) for r in
                minhash_dedup_pairs(df, max_bucket=None).collect()}
    assert capped == uncapped and len(capped) >= 5


def test_incremental_flood_probes_rep_only(spark):
    corpus = _flood_df(spark)
    batch = spark.createDataFrame(
        [(10_000 + i, BOILER + " tiny suffix") for i in range(5)],
        "doc_id long, text string")
    got = minhash_dedup_against(batch, corpus, threshold=0.5,
                                max_bucket=50).collect()
    # every batch doc matches exactly ONE corpus doc: the bucket rep —
    # bounded fan-out instead of 5 × FLOOD_N verifies
    assert len(got) == 5
    assert all(r.corpus_id == 0 for r in got)
    assert {r.batch_id for r in got} == {10_000 + i for i in range(5)}


def test_index_flood_probes_rep_only(spark, tmp_path):
    corpus = _flood_df(spark)
    build_dedup_index(corpus, "flood_idx", max_bucket=50)
    assert spark.table("flood_idx_hot").count() > 0
    meta = spark.table("flood_idx_meta").head()
    assert meta["max_bucket"] == 50
    batch = spark.createDataFrame(
        [(20_000, BOILER + " probe suffix")], "doc_id long, text string")
    got = dedup_against_index(batch, "flood_idx", threshold=0.5).collect()
    assert len(got) == 1 and got[0].corpus_id == 0
