"""Funnel analysis (operators/funnel.py): ordering anchors, NULL
propagation, horizon bound."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from steel_datafusion_spark.operators.funnel import (
    funnel_counts, funnel_steps,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, datetime(2024, 1, 1, h, m)) for u, t, h, m in rows],
        "user_id long, event_type string, ts timestamp")


def test_funnel_orders_steps_and_keeps_nulls(spark):
    rows = [
        # user 1 completes in order
        (1, "view", 9, 0), (1, "click", 9, 30), (1, "buy", 10, 0),
        # user 2: click BEFORE the first view — step 2 must not count it
        (2, "click", 8, 0), (2, "view", 9, 0),
        # user 3: view only
        (3, "view", 9, 0),
        # user 4: never views — not in the funnel at all
        (4, "click", 9, 0), (4, "buy", 9, 30),
    ]
    per_user = {r.user_id: r for r in funnel_steps(
        _ev(spark, rows), ["view", "click", "buy"]).collect()}
    assert set(per_user) == {1, 2, 3}
    assert per_user[1].t2 is not None and per_user[1].t3 is not None
    assert per_user[2].t2 is None          # pre-entry click rejected
    assert per_user[3].t2 is None and per_user[3].t3 is None

    counts = {r.step_idx: r for r in funnel_counts(
        _ev(spark, rows), ["view", "click", "buy"]).collect()}
    assert counts[1].n_users == 3
    assert counts[2].n_users == 1 and counts[3].n_users == 1
    assert counts[2].conversion_from_first == round(1 / 3, 6)


def test_funnel_within_horizon(spark):
    rows = [
        (1, "view", 9, 0), (1, "click", 9, 20),          # inside 30 min
        (2, "view", 9, 0), (2, "click", 11, 0),          # outside
    ]
    got = {r.user_id: r for r in funnel_steps(
        _ev(spark, rows), ["view", "click"],
        within="30 minutes").collect()}
    assert got[1].t2 is not None
    assert got[2].t2 is None


def test_funnel_rejects_empty_steps(spark):
    with pytest.raises(ValueError):
        funnel_steps(_ev(spark, [(1, "view", 9, 0)]), [])


def test_cohort_retention_triangle(spark):
    from steel_datafusion_spark.operators.funnel import cohort_retention

    rows = [
        (1, "view", 9, 0),                 # cohort week w: users 1,2
        (2, "view", 9, 30),
        (1, "view", 9, 0),                 # duplicate activity same week
    ]
    ev = _ev(spark, rows)
    # shift user 2's second activity one week later
    ev = ev.union(spark.createDataFrame(
        [(2, "view", datetime(2024, 1, 10, 9, 0))],
        "user_id long, event_type string, ts timestamp"))
    got = {(r.cohort, r.period_offset): r for r in
           cohort_retention(ev, granularity="week", max_offset=4).collect()}
    c0 = next(k[0] for k in got if k[1] == 0)
    assert got[(c0, 0)].cohort_size == 2 and got[(c0, 0)].retention == 1.0
    assert got[(c0, 1)].n_active == 1 and got[(c0, 1)].retention == 0.5
