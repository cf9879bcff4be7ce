"""as-of join semantics: inclusive backward match, NULL when no prior row,
deterministic tie-breaking."""

from datetime import datetime

from steel_datafusion_spark.operators.asof import asof_join

import pytest


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture()
def sides(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "l1"),
         (1, _ts("2024-01-01T12:00:00"), "l2"),
         (2, _ts("2024-01-01T09:00:00"), "l3")],
        "k long, lts timestamp, lval string")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:30:00"), "r1"),
         (1, _ts("2024-01-01T12:00:00"), "r2"),   # equal ts: inclusive
         (2, _ts("2024-01-01T11:00:00"), "r3")],  # after l3: no match
        "k long, rts timestamp, rval string")
    return left, right


def test_backward_inclusive_and_null(spark, sides):
    left, right = sides
    out = {r.lval: (r.rval, r.rts) for r in
           asof_join(left, right, ["k"], "lts", "rts").collect()}
    assert out["l1"][0] == "r1"          # latest ≤ 10:00 is 09:30
    assert out["l2"][0] == "r2"          # equal timestamp matches (inclusive)
    assert out["l3"] == (None, None)     # nothing at or before 09:00


def test_equal_ts_right_tiebreak(spark):
    t = _ts("2024-01-01T10:00:00")
    left = spark.createDataFrame([(1, t, "l")], "k long, lts timestamp, lval string")
    right = spark.createDataFrame(
        [(1, t, 5, "first"), (1, t, 9, "last")],
        "k long, rts timestamp, seq long, rval string")
    got = asof_join(left, right, ["k"], "lts", "rts",
                    right_tiebreak="seq").collect()[0]
    assert got.rval == "last"            # highest tiebreak wins


def test_forward_inclusive_and_null(spark, sides):
    left, right = sides
    out = {r.lval: (r.rval, r.rts) for r in
           asof_join(left, right, ["k"], "lts", "rts",
                     direction="forward").collect()}
    assert out["l1"][0] == "r2"          # earliest ≥ 10:00 is 12:00
    assert out["l2"][0] == "r2"          # equal timestamp matches (inclusive)
    assert out["l3"][0] == "r3"          # 11:00 is after 09:00
    # and a left row after every right row gets NULL
    extra = spark.createDataFrame(
        [(1, _ts("2024-01-01T23:00:00"), "l9")],
        "k long, lts timestamp, lval string")
    got = asof_join(extra, right, ["k"], "lts", "rts",
                    direction="forward").collect()[0]
    assert got.rval is None


def test_forward_equal_ts_tiebreak_earliest_wins(spark):
    t = _ts("2024-01-01T10:00:00")
    left = spark.createDataFrame([(1, t, "l")],
                                 "k long, lts timestamp, lval string")
    right = spark.createDataFrame(
        [(1, t, 5, "first"), (1, t, 9, "last")],
        "k long, rts timestamp, seq long, rval string")
    got = asof_join(left, right, ["k"], "lts", "rts",
                    right_tiebreak="seq", direction="forward").collect()[0]
    assert got.rval == "first"           # lowest tiebreak wins forward


def test_null_tiebreak_loses_in_both_directions(spark):
    t = _ts("2024-01-01T10:00:00")
    left = spark.createDataFrame([(1, t, "l")],
                                 "k long, lts timestamp, lval string")
    right = spark.createDataFrame(
        [(1, t, None, "anon"), (1, t, 5, "named")],
        "k long, rts timestamp, seq long, rval string")
    back = asof_join(left, right, ["k"], "lts", "rts",
                     right_tiebreak="seq").collect()[0]
    fwd = asof_join(left, right, ["k"], "lts", "rts",
                    right_tiebreak="seq", direction="forward").collect()[0]
    assert back.rval == "named" and fwd.rval == "named"


def test_overlapping_names_rejected(spark, sides):
    left, right = sides
    with pytest.raises(ValueError, match="overlap"):
        asof_join(left, right.withColumnRenamed("rval", "lval"),
                  ["k"], "lts", "rts")


def test_tolerance_bounds_matches(spark, sides):
    """merge_asof-style tolerance: a nearest match farther than the bound
    is nulled; in-range matches are untouched (both directions, interval
    and numeric forms)."""
    left, right = sides
    # backward, 30-minute bound: l1 matched r1 at 30 min exactly (kept),
    # l2 matched r2 at 0 (kept) — with 10 minutes, l1's match is dropped
    keep = {r.lval: r.rval for r in asof_join(
        left, right, ["k"], "lts", "rts", tolerance="30 minutes").collect()}
    assert keep == {"l1": "r1", "l2": "r2", "l3": None}
    tight = {r.lval: r.rval for r in asof_join(
        left, right, ["k"], "lts", "rts", tolerance="10 minutes").collect()}
    assert tight == {"l1": None, "l2": "r2", "l3": None}

    # forward + numeric ts columns
    ln = spark.createDataFrame([(1, 100.0, "a")], "k long, lts double, v string")
    rn = spark.createDataFrame([(1, 150.0, "far")],
                               "k long, rts double, rv string")
    fwd = asof_join(ln, rn, ["k"], "lts", "rts", direction="forward",
                    tolerance=60).collect()[0]
    assert fwd.rv == "far"
    fwd2 = asof_join(ln, rn, ["k"], "lts", "rts", direction="forward",
                     tolerance=40).collect()[0]
    assert fwd2.rv is None
