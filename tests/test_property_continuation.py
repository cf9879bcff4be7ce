"""Property-based tests for the round-8 continuation operators: invariants
that hold for ANY input, not just the gate fixtures.

Example counts stay small (each example costs Spark jobs)."""

import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --- Z-order interleave ------------------------------------------------

@settings(**_SETTINGS)
@given(pts=st.lists(st.tuples(st.integers(0, 15), st.integers(0, 15)),
                    min_size=2, max_size=12, unique=True))
def test_zorder_interleave_is_injective_on_the_grid(spark, pts):
    """Distinct bucket pairs must get distinct z-keys (bit interleave is a
    bijection on the grid) — a collision would silently merge cells in
    the pruning report."""
    from steel_datafusion_spark.sources.layout import _interleave

    df = spark.createDataFrame(pts, "bx long, by long")
    out = df.select(_interleave([F.col("bx"), F.col("by")], 4)
                    .alias("z")).collect()
    zs = [r["z"] for r in out]
    assert len(set(zs)) == len(pts)
    assert all(0 <= z < 256 for z in zs)


# --- gapfill ------------------------------------------------------------

series_strategy = st.lists(
    st.tuples(st.integers(0, 10),                 # bucket index (hour)
              st.floats(-100, 100, allow_nan=False, width=32)),
    min_size=1, max_size=15)


@settings(**_SETTINGS)
@given(obs=series_strategy)
def test_gapfill_invariants(spark, obs):
    """For any series: the grid is dense over [min,max] buckets, observed
    buckets are never altered or flagged, LOCF leaves no NULLs (grid
    starts at an observation), and linear fills stay inside the convex
    hull of the two surrounding observations."""
    from steel_datafusion_spark.pipeline.rollup import gapfill

    base = datetime.datetime(2024, 1, 1)
    rows = [("k", base + datetime.timedelta(hours=h), float(v))
            for h, v in obs]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, "
                                     "value double")
    for method in ("locf", "linear"):
        out = sorted(gapfill(df, method=method).collect(),
                     key=lambda r: r["bucket_ts"])
        hours = {h for h, _ in obs}
        lo, hi = min(hours), max(hours)
        assert len(out) == hi - lo + 1                      # dense grid
        by_h = {int((r["bucket_ts"] - out[0]["bucket_ts"]) // 3600) + lo: r
                for r in out}
        assert set(by_h) == set(range(lo, hi + 1))
        for h in hours:
            assert not by_h[h]["filled"]
            assert by_h[h]["value"] is not None
        if method == "locf":
            assert all(r["value"] is not None for r in out)
        else:
            vals = [r["value"] for r in out]
            mn = min(v for v in vals if v is not None)
            mx = max(v for v in vals if v is not None)
            for r in out:
                if r["filled"] and r["value"] is not None:
                    assert mn - 1e-6 <= r["value"] <= mx + 1e-6


# --- expectations -------------------------------------------------------

@settings(**_SETTINGS)
@given(vals=st.lists(st.one_of(st.none(),
                               st.integers(-10, 10)),
                     min_size=0, max_size=20))
def test_expectations_counts_match_python(spark, vals):
    """not_null / range / unique violation counts equal a plain Python
    recount for any column content."""
    from steel_datafusion_spark.operators.expectations import (
        validate_expectations)

    if not vals:
        vals = [None]
    df = spark.createDataFrame([(v,) for v in vals], "x int")
    rep = {r["rule"]: r for r in validate_expectations(
        df, [("not_null", "x"), ("range", "x", -3, 3),
             ("unique", "x")]).collect()}
    assert rep["not_null"]["n_violations"] == sum(v is None for v in vals)
    assert rep["range"]["n_violations"] == sum(
        v is not None and (v < -3 or v > 3) for v in vals)
    from collections import Counter

    c = Counter(v for v in vals if v is not None)
    assert rep["unique"]["n_violations"] == sum(
        n for n in c.values() if n > 1)


# --- DSIR ---------------------------------------------------------------

@settings(**_SETTINGS)
@given(docs=st.lists(
    st.tuples(st.booleans(),
              st.lists(st.sampled_from(["cat", "dog", "sun", "sky"]),
                       min_size=0, max_size=6)),
    min_size=2, max_size=12))
def test_dsir_pool_partition_and_determinism(spark, docs):
    """For any corpus: every pool doc appears exactly once in the
    logweight table, no target doc does, and the weights are identical
    across partition counts (decimal-sum order independence)."""
    from steel_datafusion_spark.pipeline.selection import dsir_logweights

    rows = [(i, " ".join(words), bool(tgt))
            for i, (tgt, words) in enumerate(docs)]
    if not any(not t for _, _, t in rows):
        rows.append((len(rows), "sun sky", False))
    df = spark.createDataFrame(rows, "doc_id long, text string, "
                                     "tgt boolean")
    lw1 = {r["doc_id"]: r["logweight"] for r in dsir_logweights(
        df.coalesce(1), F.col("tgt"), n_buckets=64).collect()}
    lw8 = {r["doc_id"]: r["logweight"] for r in dsir_logweights(
        df.repartition(8), F.col("tgt"), n_buckets=64).collect()}
    pool_ids = {i for i, _, t in rows if not t}
    assert set(lw1) == pool_ids == set(lw8)
    assert lw1 == lw8
