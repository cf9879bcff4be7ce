"""Mergeable sketches (pipeline/sketches.py): the load-bearing claims are
(1) merged fine-grained sketches answer coarse queries EXACTLY as well as a
global sketch (HLL union equality), and (2) estimates stay inside the
documented error bounds vs exact answers."""

from pyspark.sql import functions as F

from steel_datafusion_spark.pipeline.sketches import (
    hll_merge_rollup, hll_rollup, kll_merge_quantiles, kll_quantile_rollup,
)


def _events(spark):
    # 9000 rows, 3 sources, user_id space overlaps across sources
    return spark.range(9000).select(
        (F.col("id") % 3).cast("string").alias("source"),
        (F.hash(F.col("id")) % 2500).alias("user_id"),
        (F.col("id") % 1000).cast("double").alias("value"))


def test_hll_merge_tracks_global_sketch(spark):
    df = _events(spark)
    per_source = hll_rollup(df, ["source"], "user_id", lg_k=12)
    merged = hll_merge_rollup(per_source, [], "sketch").collect()[0]
    direct = hll_rollup(df.withColumn("g", F.lit(1)), ["g"], "user_id",
                        lg_k=12).collect()[0]
    # register-level union is lossless; the estimators differ (HIP for an
    # incrementally-built sketch, composite for a union result) so the two
    # estimates agree within the lg_k=12 error bound, not bit-for-bit
    assert abs(merged.distinct_est - direct.distinct_est) \
        / direct.distinct_est < 0.02


def test_hll_estimate_within_error_bound(spark):
    df = _events(spark)
    exact = df.select("user_id").distinct().count()
    est = hll_merge_rollup(hll_rollup(df, ["source"], "user_id", lg_k=12),
                           [], "sketch").collect()[0].distinct_est
    assert abs(est - exact) / exact < 0.05      # lg_k 12 ≈ 1.6% rse; 3σ pad
    # per-group estimates also bounded
    for r in hll_rollup(df, ["source"], "user_id", lg_k=12).collect():
        ex = (df.filter(F.col("source") == r.source)
              .select("user_id").distinct().count())
        assert abs(r.distinct_est - ex) / ex < 0.05


def test_kll_merged_quantiles_near_exact(spark):
    df = _events(spark)
    sk = kll_quantile_rollup(df, ["source"], "value", k=200)
    got = kll_merge_quantiles(sk, [], [0.5, 0.9]).collect()[0]
    exact_p50, exact_p90 = df.selectExpr(
        "percentile(value, 0.5)", "percentile(value, 0.9)").collect()[0]
    # rank error ~1.65/sqrt(200) ≈ 1.2%; values 0..999 → |Δrank| ≈ |Δvalue|/1000
    assert abs(got.q_0_5 - exact_p50) <= 30
    assert abs(got.q_0_9 - exact_p90) <= 30


def test_kll_merge_empty_input_yields_null_not_error(spark):
    # a global groupBy over zero rows gives one row with an empty
    # collect_list; the merge must emit NULL quantiles, not an ANSI
    # element_at error
    df = _events(spark).filter(F.col("source") == "nope")
    sk = kll_quantile_rollup(df, ["source"], "value")
    got = kll_merge_quantiles(sk, [], [0.5]).collect()
    assert len(got) == 1 and got[0].q_0_5 is None


def test_kll_per_group_merge_matches_regrouped(spark):
    df = _events(spark)
    fine = kll_quantile_rollup(
        df.withColumn("day", (F.col("user_id") % 7)), ["source", "day"],
        "value", k=200)
    per_source = kll_merge_quantiles(fine, ["source"], [0.5])
    assert per_source.count() == 3
    for r in per_source.collect():
        exact = df.filter(F.col("source") == r.source).selectExpr(
            "percentile(value, 0.5)").collect()[0][0]
        assert abs(r.q_0_5 - exact) <= 40


def test_kll_two_level_merge_large_fanin(spark):
    """levels=2 (VERDICT r5 item 5): a 2000-sketch fan-in merges through
    salted partials; the result honors the same rank-error bound as a
    single-level merge, and no task folds the full fan-in."""
    df = spark.range(40000).select(
        (F.col("id") % 2000).alias("part"),          # 2000 fine sketches
        (F.col("id") % 2).cast("string").alias("grp"),
        (F.col("id") % 1000).cast("double").alias("value"))
    fine = kll_quantile_rollup(df, ["grp", "part"], "value", k=200)
    two = kll_merge_quantiles(fine, ["grp"], [0.5, 0.9],
                              levels=2, fanout=32)
    assert two.count() == 2
    for r in two.collect():
        exact_p50, exact_p90 = df.filter(F.col("grp") == r.grp).selectExpr(
            "percentile(value, 0.5)", "percentile(value, 0.9)").collect()[0]
        assert abs(r.q_0_5 - exact_p50) <= 40
        assert abs(r.q_0_9 - exact_p90) <= 40
    # the two merge trees agree within twice the rank bound
    one = {r.grp: r for r in
           kll_merge_quantiles(fine, ["grp"], [0.5, 0.9]).collect()}
    for r in two.collect():
        assert abs(r.q_0_5 - one[r.grp].q_0_5) <= 60
        assert abs(r.q_0_9 - one[r.grp].q_0_9) <= 60


def test_kll_levels_validation(spark):
    import pytest as _pytest
    df = _events(spark)
    sk = kll_quantile_rollup(df, ["source"], "value")
    with _pytest.raises(ValueError, match="levels"):
        kll_merge_quantiles(sk, [], [0.5], levels=3)


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------

def _terms(spark, words):
    return spark.createDataFrame([(w,) for w in words], "term string")


def test_countmin_never_undercounts_and_is_tight_when_sparse(spark):
    from steel_datafusion_spark.pipeline.sketches import (
        countmin_estimate, countmin_table)

    words = ["a"] * 50 + ["b"] * 7 + ["c"] * 1
    toks = _terms(spark, words)
    sk = countmin_table(toks, [], "term", depth=4, width=512)
    probes = _terms(spark, ["a", "b", "c", "absent"])
    est = {r.term: r.est_c
           for r in countmin_estimate(sk, probes, [], "term",
                                      depth=4, width=512).collect()}
    exact = {"a": 50, "b": 7, "c": 1, "absent": 0}
    for t, c in exact.items():
        assert est[t] >= c                      # CM never undercounts
        assert est[t] <= c + len(words)         # trivial upper bound
    # 3 distinct terms in 512 cells: collisions are impossible unless two
    # terms share a cell in EVERY row — astronomically unlikely and fixed
    # by the deterministic constants; pin exactness here
    assert est == exact


def test_countmin_merge_by_summing_cells_equals_global(spark):
    from steel_datafusion_spark.pipeline.sketches import (
        countmin_estimate, countmin_table)
    from pyspark.sql import functions as F

    rows = [(f"g{i % 3}", f"w{i % 17}") for i in range(200)]
    df = spark.createDataFrame(rows, "grp string, term string")
    # per-group sketches merged by summing cells
    per_group = countmin_table(df, ["grp"], "term", depth=4, width=64)
    merged = (per_group.groupBy("d", "cell")
              .agg(F.sum("c").alias("c")))
    direct = countmin_table(df, [], "term", depth=4, width=64)
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, direct.collect()))

    probes = _terms(spark, [f"w{i}" for i in range(17)])
    em = countmin_estimate(merged, probes, [], "term", depth=4, width=64)
    ed = countmin_estimate(direct, probes, [], "term", depth=4, width=64)
    assert sorted(map(tuple, em.collect())) == sorted(map(tuple, ed.collect()))


def test_countmin_depth_bounds_validated(spark):
    import pytest
    from steel_datafusion_spark.pipeline.sketches import countmin_table

    with pytest.raises(ValueError, match="depth"):
        countmin_table(_terms(spark, ["x"]), [], "term", depth=9)
