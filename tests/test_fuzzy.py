"""Fuzzy edit-distance join (pipeline/fuzzy.py): blocking exactness within
the pigeonhole bound, exact verify, short-string fallback."""

from pyspark.sql import functions as F

from steel_datafusion_spark.pipeline.fuzzy import fuzzy_match


def test_fuzzy_match_finds_all_within_distance(spark):
    catalog = spark.createDataFrame([
        (1, "the quick brown fox jumps over"),
        (2, "a completely different sentence here"),
        (3, "pack my box with five dozen jugs"),
    ], "cat_id long, title string")
    probes = spark.createDataFrame([
        (10, "the quick brown fox jumps over"),     # dist 0 → 1
        (11, "the quikc brown fox jumps ovre"),     # 2 swaps ≈ dist ≤ 4.. use 2 subs
        (12, "pack my box wit five dozen jugs"),    # 1 deletion → 3
        (13, "nothing remotely similar at all xx"),
    ], "probe_id long, q string")
    got = {(r.left_id, r.right_id): r.dist for r in fuzzy_match(
        probes, catalog, "probe_id", "q", "cat_id", "title",
        max_dist=4).collect()}
    assert got[(10, 1)] == 0
    assert got[(11, 1)] <= 4
    assert got[(12, 3)] == 1
    assert not any(l == 13 for l, _ in got)
    # verify stage guarantees no over-distance pair survives
    assert all(d <= 4 for d in got.values())


def test_fuzzy_match_exhaustive_vs_cartesian_oracle(spark):
    # strings long enough that blocking is pigeonhole-exact at max_dist=2:
    # the blocked join must equal the brute-force cartesian filter exactly
    import itertools
    words = ["alpha", "bravo", "charlie", "delta"]
    base = [" ".join(p) + " suffix padding words" for p in
            itertools.permutations(words, 3)]
    cat = spark.createDataFrame(list(enumerate(base)),
                                "cat_id long, title string")
    probes = spark.createDataFrame(
        [(100 + i, s.replace("a", "e", 1)) for i, s in enumerate(base[:12])],
        "probe_id long, q string")
    got = {(r.left_id, r.right_id) for r in fuzzy_match(
        probes, cat, "probe_id", "q", "cat_id", "title", max_dist=2).collect()}
    want = {(p.probe_id, c.cat_id)
            for p in probes.collect() for c in cat.collect()
            if __import__("duckdb").execute(
                "select levenshtein(?, ?)", [p.q, c.title]).fetchone()[0] <= 2}
    assert got == want and len(want) >= 12


def test_fuzzy_match_max_df_drops_hot_grams_keeps_matches(spark):
    """The 100 TB cost knob: a stop-gram present in every string must not
    drive d_L x d_R candidates; pairs still link through their rarer
    grams."""
    common = " common suffix shared by every single row here"
    cat = spark.createDataFrame(
        [(i, f"unique title number {i:04d}" + common) for i in range(40)],
        "cat_id long, title string")
    probes = spark.createDataFrame(
        [(100 + i, f"unique titze number {i:04d}" + common)  # 1 sub
         for i in range(10)],
        "probe_id long, q string")
    got = {(r.left_id, r.right_id) for r in fuzzy_match(
        probes, cat, "probe_id", "q", "cat_id", "title",
        max_dist=2, max_df=20).collect()}
    # every probe links to its own source despite the shared suffix's
    # grams (df=50 > max_df=20) being dropped
    assert {(100 + i, i) for i in range(10)} <= got
    assert all(d.dist <= 2 for d in fuzzy_match(
        probes, cat, "probe_id", "q", "cat_id", "title",
        max_dist=2, max_df=20).collect())


def test_fuzzy_match_short_strings(spark):
    # shorter than the n-gram width: whole-string gram still matches
    # identical strings (distance 0); near-miss short strings are
    # best-effort (documented)
    cat = spark.createDataFrame([(1, "ab")], "cat_id long, title string")
    probes = spark.createDataFrame([(9, "ab")], "probe_id long, q string")
    got = fuzzy_match(probes, cat, "probe_id", "q", "cat_id", "title",
                      max_dist=1).collect()
    assert [(r.left_id, r.right_id, r.dist) for r in got] == [(9, 1, 0)]
