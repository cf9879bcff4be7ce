"""SURVEY §5.3 edge-semantics: the silent-divergence traps between engines."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from steel_datafusion_spark import (
    col, df_distinct_on, df_except, df_intersect, df_join, df_union,
    sort_asc, sort_desc,
)


def test_null_join_keys_never_match(spark):
    a = spark.createDataFrame([(1,), (None,)], "k bigint")
    b = spark.createDataFrame([(1,), (None,)], "k2 bigint")
    inner = df_join(a, b, "inner", ["k"], ["k2"])
    assert [r.k for r in inner.collect()] == [1]  # NULL = NULL ⇒ NULL ⇒ no match
    left = df_join(a, b, "left", ["k"], ["k2"]).collect()
    assert sorted([(r.k, r.k2) for r in left], key=str) == sorted(
        [(1, 1), (None, None)], key=str)  # NULL row preserved with NULL right


def test_semi_anti_with_null_keys(spark):
    a = spark.createDataFrame([(1,), (2,), (None,)], "k bigint")
    b = spark.createDataFrame([(1,), (None,)], "k2 bigint")
    semi = df_join(a, b, "left_semi", ["k"], ["k2"])
    assert [r.k for r in semi.collect()] == [1]
    anti = df_join(a, b, "left_anti", ["k"], ["k2"])
    # anti keeps non-matching rows INCLUDING the NULL-keyed one (3VL)
    assert sorted([r.k for r in anti.collect()], key=str) == sorted([2, None], key=str)


def test_except_intersect_are_set_semantics(spark):
    # DataFusion except/intersect are DISTINCT semantics: duplicates collapse
    a = spark.createDataFrame([(1,), (1,), (2,), (3,)], "x int")
    b = spark.createDataFrame([(3,), (3,)], "x int")
    assert sorted(r.x for r in df_except(a, b).collect()) == [1, 2]   # 1 once
    assert sorted(r.x for r in df_intersect(a, b).collect()) == [3]   # 3 once


def test_union_numeric_coercion(spark):
    a = spark.createDataFrame([(1,)], "x int")
    b = spark.createDataFrame([(2.5,)], "x double")
    got = df_union(a.select(F.col("x").cast("double")), b).collect()
    assert sorted(r.x for r in got) == [1.0, 2.5]


def test_distinct_on_tie_breaking(spark):
    # two rows tie on the sort key; explicit second key decides deterministically
    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 10, "b"), (2, 5, "c")], "k int, v int, tag string")
    out = df_distinct_on(
        df, [col("k")], [col("k"), col("tag")],
        [sort_desc(col("v")), sort_asc(col("tag"))],
    ).collect()
    assert sorted((r.k, r.tag) for r in out) == [(1, "a"), (2, "c")]


def test_case_null_condition_falls_through(spark):
    from steel_datafusion_spark import case_otherwise, when, lit

    df = spark.createDataFrame([(None,)], "x boolean")
    got = df.select(
        case_otherwise(when(F.col("x"), lit("t")), lit("e")).alias("r")
    ).collect()
    assert got[0].r == "e"  # NULL condition ⇒ arm skipped ⇒ ELSE


def test_new_ops_empty_input_safety(spark):
    """Round-6 continuation ops must degrade to empty/zero results on an
    empty corpus — not throw (a pipeline stage fed an empty partition
    filter result is routine at scale)."""
    from steel_datafusion_spark.pipeline.chunking import (
        chunk_by_tokens, duplicated_span_extents,
    )
    from steel_datafusion_spark.pipeline.sampling import token_budget_subset
    from steel_datafusion_spark.pipeline.terms import (
        heavy_hitters, with_classifier,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert chunk_by_tokens(empty).count() == 0
    assert duplicated_span_extents(empty).count() == 0
    assert heavy_hitters(empty, "text", 64).count() == 0
    assert with_classifier(empty).count() == 0
    et = spark.createDataFrame([], "doc_id long, tok long")
    assert token_budget_subset(et, "tok", 100).count() == 0


def test_pq_with_tiny_corpus(spark):
    """PQ on a corpus barely >= ks still returns valid ranked neighbors."""
    from steel_datafusion_spark.pipeline.similarity import pq_topk

    rows = [(i, [float((i * j) % 7 - 3) for j in range(8)])
            for i in range(18)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = pq_topk(df.filter("vec_id < 2"), df, k=3, m=2, ks=16, shortlist=8)
    got = out.collect()
    assert {r.query_id for r in got} == {0, 1}
    for qid in (0, 1):
        ranks = sorted(r.rank for r in got if r.query_id == qid)
        assert ranks == list(range(1, len(ranks) + 1))
