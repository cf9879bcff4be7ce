"""Property-based differential testing: random small frames through the same
relational ops in Spark and DuckDB must agree (the generalized form of the
driver's oracle gate — catches semantics drift the fixed queries miss).

Example counts are kept small: each example costs a Spark job (~0.2 s)."""

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

rows_strategy = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
        st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
        st.sampled_from(["a", "b", "c"]),
    ),
    min_size=0, max_size=25,
)

_SETTINGS = dict(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _frames(spark, rows):
    pdf = pd.DataFrame(rows, columns=["x", "g", "s"]).astype(
        {"x": "Int64", "g": "Int64", "s": "str"})
    sdf = spark.createDataFrame(
        [(None if pd.isna(x) else int(x),
          None if pd.isna(g) else int(g), s)
         for x, g, s in pdf.itertuples(index=False)],
        "x bigint, g bigint, s string")
    con = duckdb.connect()
    con.register("t", pdf)
    return sdf, con


@given(rows=rows_strategy)
@settings(**_SETTINGS)
def test_filter_3vl_matches_duckdb(spark, rows):
    sdf, con = _frames(spark, rows)
    got = sorted(str(r.x) for r in sdf.filter(F.col("x") > 0).collect())
    want = sorted(str(x) for (x,) in con.execute(
        "SELECT x FROM t WHERE x > 0").fetchall())
    assert got == want


@given(rows=rows_strategy)
@settings(**_SETTINGS)
def test_groupby_agg_matches_duckdb(spark, rows):
    sdf, con = _frames(spark, rows)
    got = sorted(
        (str(r.g), str(r.n), str(r.sx)) for r in
        sdf.groupBy("g").agg(F.count(F.lit(1)).alias("n"),
                             F.sum("x").alias("sx")).collect())
    want = sorted(
        (str(None if g is None else int(g)), str(n),
         str(None if sx is None else int(sx)))
        for g, n, sx in con.execute(
            "SELECT g, COUNT(*) AS n, SUM(x)::BIGINT AS sx FROM t GROUP BY g"
        ).fetchall())
    assert got == want


@given(rows=rows_strategy)
@settings(**_SETTINGS)
def test_sort_nulls_last_matches_duckdb(spark, rows):
    from steel_datafusion_spark import col, df_sort_by

    sdf, con = _frames(spark, rows)
    got = [str(r.x) for r in df_sort_by(sdf.select("x"), [col("x")]).collect()]
    want = [str(None if x is None else int(x)) for (x,) in con.execute(
        "SELECT x FROM t ORDER BY x ASC NULLS LAST").fetchall()]
    assert got == want


@given(rows=rows_strategy)
@settings(**_SETTINGS)
def test_distinct_matches_duckdb(spark, rows):
    sdf, con = _frames(spark, rows)
    got = sorted(str((r.g, r.s)) for r in sdf.select("g", "s").distinct().collect())
    want = sorted(str((None if g is None else int(g), s)) for g, s in con.execute(
        "SELECT DISTINCT g, s FROM t").fetchall())
    assert got == want


@given(rows=rows_strategy, rows2=rows_strategy)
@settings(**_SETTINGS)
def test_joins_match_duckdb(spark, rows, rows2):
    """Inner + left join multiplicity with duplicate keys and NULLs."""
    sdf_a, con = _frames(spark, rows)
    import pandas as pd

    pdf_b = pd.DataFrame(rows2, columns=["x", "g", "s"]).astype(
        {"x": "Int64", "g": "Int64", "s": "str"})
    sdf_b = spark.createDataFrame(
        [(None if pd.isna(x) else int(x),
          None if pd.isna(g) else int(g), s)
         for x, g, s in pdf_b.itertuples(index=False)],
        "x bigint, g bigint, s string")
    con.register("u", pdf_b)

    from steel_datafusion_spark import df_join

    inner = df_join(sdf_a, sdf_b.toDF("x2", "g2", "s2"), "inner", ["g"], ["g2"])
    got = sorted(str((r.g, r.s, r.s2)) for r in inner.select("g", "s", "s2").collect())
    want = sorted(str((None if g is None else int(g), s, s2)) for g, s, s2 in con.execute(
        "SELECT t.g, t.s, u.s AS s2 FROM t JOIN u ON t.g = u.g").fetchall())
    assert got == want

    left = df_join(sdf_a, sdf_b.toDF("x2", "g2", "s2"), "left", ["g"], ["g2"])
    got = sorted(str((r.g, r.s, r.s2)) for r in left.select("g", "s", "s2").collect())
    want = sorted(str((None if g is None else int(g), s, s2)) for g, s, s2 in con.execute(
        "SELECT t.g, t.s, u.s AS s2 FROM t LEFT JOIN u ON t.g = u.g").fetchall())
    assert got == want


# --- chunking invariants (round-6 continuation) -------------------------

_chunk_params = st.tuples(
    st.integers(min_value=2, max_value=40),   # size
    st.integers(min_value=0, max_value=39),   # overlap (clamped below size)
    st.integers(min_value=0, max_value=120),  # doc token count
)


@given(params=_chunk_params)
@settings(**_SETTINGS)
def test_chunking_invariants(spark, params):
    from steel_datafusion_spark.pipeline.chunking import chunk_by_tokens

    size, overlap, n_tok = params
    overlap = min(overlap, size - 1)
    stride = size - overlap
    text = " ".join(f"w{i}" for i in range(n_tok))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    ch = sorted(chunk_by_tokens(df, size=size, overlap=overlap).collect(),
                key=lambda r: r.chunk_id)
    # every doc yields >= 1 chunk; chunk ids are dense from 0
    assert [r.chunk_id for r in ch] == list(range(len(ch)))
    # starts advance by exactly stride; no chunk exceeds `size` tokens
    assert all(r.chunk_start == r.chunk_id * stride + 1 for r in ch)
    assert all(0 <= r.n_chunk_tokens <= size for r in ch)
    # full coverage: reconstruct from stride-prefixes + final chunk
    toks = []
    for r in ch[:-1]:
        toks.extend(r.chunk_text.split()[:stride])
    toks.extend(ch[-1].chunk_text.split())
    assert toks == text.split()
    # minimality: at most one trailing chunk would be empty-of-new-tokens
    if len(ch) > 1:
        assert ch[-1].chunk_start <= max(n_tok, 1)
