"""Range join (operators/range_join.py): point-in-interval matching via
bucketized equi-join — correctness on inclusive bounds, multi-bucket
spans, key isolation, left semantics, and the no-cartesian plan claim."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from steel_datafusion_spark.operators.range_join import range_join


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture()
def data(spark):
    points = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "p1"),   # == start (inclusive)
         (1, _ts("2024-01-01T11:00:00"), "p2"),   # == end (inclusive)
         (1, _ts("2024-01-01T11:00:01"), "p3"),   # just past end
         (2, _ts("2024-01-01T10:30:00"), "p4")],  # other key
        "k long, ts timestamp, pv string")
    intervals = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), _ts("2024-01-01T11:00:00"), "i1"),
         (2, _ts("2024-01-01T00:00:00"), _ts("2024-01-01T23:00:00"), "i2")],
        "k long, s timestamp, e timestamp, iv string")
    return points, intervals


def test_inclusive_bounds_and_key_isolation(spark, data):
    points, intervals = data
    got = {(r.pv, r.iv) for r in range_join(
        points, intervals, "ts", "s", "e", on=["k"]).collect()}
    # i2 spans 23 buckets at width 3600 — multi-bucket explode exercised
    assert got == {("p1", "i1"), ("p2", "i1"), ("p4", "i2")}


def test_left_join_nulls_unmatched(spark, data):
    points, intervals = data
    rows = {r.pv: r.iv for r in range_join(
        points, intervals, "ts", "s", "e", on=["k"], how="left").collect()}
    assert rows == {"p1": "i1", "p2": "i1", "p3": None, "p4": "i2"}


def test_numeric_columns_and_overlapping_intervals(spark):
    points = spark.createDataFrame([(5.0, "a"), (15.0, "b"), (25.0, "c")],
                                   "x double, pv string")
    intervals = spark.createDataFrame(
        [(0.0, 20.0, "wide"), (10.0, 16.0, "narrow")],
        "lo double, hi double, iv string")
    got = sorted((r.pv, r.iv) for r in range_join(
        points, intervals, "x", "lo", "hi", bucket_width=8.0).collect())
    assert got == [("a", "wide"), ("b", "narrow"), ("b", "wide")]


def test_no_cartesian_in_plan(spark, data):
    points, intervals = data
    df = range_join(points, intervals, "ts", "s", "e", on=["k"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_validation(spark, data):
    points, intervals = data
    with pytest.raises(ValueError, match="how"):
        range_join(points, intervals, "ts", "s", "e", how="outer")
    with pytest.raises(ValueError, match="overlap"):
        range_join(points, intervals.withColumnRenamed("iv", "pv"),
                   "ts", "s", "e")


def test_matches_naive_theta_join_property(spark):
    """Differential property: bucketized range_join == brute-force python
    containment on random numeric points/intervals (random bucket width)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(st.tuples(st.integers(0, 3), st.floats(0, 100)),
                 min_size=1, max_size=15),
        st.lists(st.tuples(st.integers(0, 3), st.floats(0, 100),
                           st.floats(0, 50)), min_size=1, max_size=10),
        st.floats(1.0, 40.0),
    )
    def prop(pts, ivs, width):
        points = spark.createDataFrame(
            [(k, float(x), i) for i, (k, x) in enumerate(pts)],
            "k long, x double, pid long")
        intervals = spark.createDataFrame(
            [(k, float(lo), float(lo + span), i)
             for i, (k, lo, span) in enumerate(ivs)],
            "k long, lo double, hi double, iid long")
        got = {(r.pid, r.iid) for r in range_join(
            points, intervals, "x", "lo", "hi", on=["k"],
            bucket_width=width).collect()}
        want = {(pi, ii)
                for pi, (pk, px) in enumerate(pts)
                for ii, (ik, lo, span) in enumerate(ivs)
                if pk == ik and lo <= px <= lo + span}
        assert got == want

    prop()
