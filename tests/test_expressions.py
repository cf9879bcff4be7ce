"""Expression-layer semantics: 3VL, LIKE family, CASE, arithmetic folds,
sort defaults, integer division — the silent-wrong-answer traps from
SURVEY.md §5.3."""

import pytest
from pyspark.sql import Row

from steel_datafusion_spark import (
    case, case_end, case_otherwise, col, col_add, col_and, col_div, col_eq,
    col_idiv, col_ilike, col_like, col_lt, col_mul, col_ne, col_not_ilike,
    col_not_like, col_or, col_sub, lit, sort_asc, sort_desc, when,
    df_sort, df_sort_by, df_filter,
)


@pytest.fixture(scope="module")
def tri(spark):
    return spark.createDataFrame(
        [Row(x=1, y=2), Row(x=None, y=2), Row(x=3, y=None), Row(x=4, y=4)]
    )


def test_filter_3vl_null_dropped(tri):
    # NULL predicate result drops the row (main.rs:176-181 semantics)
    out = df_filter(tri, col("x") >= col("y")).collect()
    assert [(r.x, r.y) for r in out] == [(4, 4)]


def test_col_lt_is_correct_not_reference_bug(tri):
    # reference col< computes > (main.rs:66-68); ours is a real <
    out = df_filter(tri, col_lt(col("x"), col("y"))).collect()
    assert [(r.x, r.y) for r in out] == [(1, 2)]


def test_and_or_3vl(spark):
    df = spark.createDataFrame(
        [(True, None), (False, None)], schema="a boolean, b boolean"
    )
    got = df.select(
        col_and(col("a"), col("b")).alias("and_"),
        col_or(col("a"), col("b")).alias("or_"),
    ).collect()
    assert (got[0].and_, got[0].or_) == (None, True)   # T AND NULL = NULL; T OR NULL = T
    assert (got[1].and_, got[1].or_) == (False, None)  # F AND NULL = F; F OR NULL = NULL


def test_arith_folds(spark):
    df = spark.createDataFrame([Row(a=10, b=3, c=2)])
    r = df.select(
        col_add(col("a"), col("b"), col("c")).alias("s"),
        col_sub(col("a"), col("b"), col("c")).alias("d"),
        col_mul(col("a"), col("b"), col("c")).alias("m"),
        col_div(col("a"), col("b")).alias("q"),
        col_idiv(col("a"), col("b")).alias("iq"),
        col_idiv(lit(-10), col("b")).alias("niq"),
    ).collect()[0]
    assert (r.s, r.d, r.m) == (15, 5, 60)
    assert abs(r.q - 10 / 3) < 1e-12          # Spark semantics: true division
    assert r.iq == 3                           # DataFusion parity: truncated
    assert r.niq == -3                         # truncation toward zero


def test_like_family(spark):
    df = spark.createDataFrame([Row(s="Hello"), Row(s="world"), Row(s=None)])
    r = df.select(
        col_like(col("s"), "He%").alias("l"),
        col_ilike(col("s"), "hel%").alias("il"),
        col_not_like(col("s"), "He%").alias("nl"),
        col_not_ilike(col("s"), "W_RLD").alias("nil"),
    ).collect()
    assert [x.l for x in r] == [True, False, None]
    assert [x.il for x in r] == [True, False, None]
    assert [x.nl for x in r] == [False, True, None]
    assert [x.nil for x in r] == [True, False, None]


def test_case_searched_and_simple(spark):
    df = spark.createDataFrame([Row(v=1), Row(v=2), Row(v=9)])
    searched = (
        when(col_eq(col("v"), lit(1)), lit("one"))
        .with_when(col_eq(col("v"), lit(2)), lit("two"))
    )
    simple = case(col("v")).with_when(lit(1), lit("I")).with_when(lit(2), lit("II"))
    r = df.select(
        case_otherwise(searched, lit("many")).alias("w_else"),
        case_end(simple).alias("no_else"),
    ).collect()
    assert [x.w_else for x in r] == ["one", "two", "many"]
    assert [x.no_else for x in r] == ["I", "II", None]  # no ELSE ⇒ NULL


def test_sort_by_nulls_last_default(spark):
    df = spark.createDataFrame([Row(x=2), Row(x=None), Row(x=1)])
    # DataFusion sort_by default: asc, NULLS LAST (Spark default would be first)
    got = [r.x for r in df_sort_by(df, [col("x")]).collect()]
    assert got == [1, 2, None]


def test_sort_explicit_combos(spark):
    df = spark.createDataFrame([Row(x=2), Row(x=None), Row(x=1)])
    assert [r.x for r in df_sort(df, [sort_desc(col("x"))]).collect()] == [None, 2, 1]
    assert [r.x for r in df_sort(df, [sort_desc(col("x"), nulls_first=False)]).collect()] == [2, 1, None]
    assert [r.x for r in df_sort(df, [sort_asc(col("x"), nulls_first=True)]).collect()] == [None, 1, 2]
