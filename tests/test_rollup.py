"""Continuous aggregates (pipeline/rollup.py): the refresh identity and
the lossless cascade, exactly — counts/sums in decimal, min/max."""

import pytest
from pyspark.sql import functions as F

from steel_datafusion_spark.pipeline.rollup import (
    cascade_rollup, rollup_refresh, time_rollup,
)
from steel_datafusion_spark.sources.readers import load_tables

from conftest import SF_DIR


@pytest.fixture(scope="module")
def events(spark):
    return load_tables(spark, SF_DIR)["events"]


def _canon(df):
    return sorted(map(tuple, df.select(
        "bucket", "event_type", "n",
        F.col("sum_value").cast("double"),
        "min_value", "max_value").collect()))


def test_refresh_identity(spark, events):
    """refresh(rollup(A), B) == rollup(A ∪ B) — bit-exact (decimal sums)."""
    a = events.filter(F.col("event_id") % 3 == 0)
    b = events.filter(F.col("event_id") % 3 != 0)
    incremental = rollup_refresh(time_rollup(a, "hour"), b, "hour")
    full = time_rollup(events, "hour")
    assert _canon(incremental) == _canon(full)
    # repeated refresh in two steps also converges to the same table
    b1 = events.filter(F.col("event_id") % 3 == 1)
    b2 = events.filter(F.col("event_id") % 3 == 2)
    two_step = rollup_refresh(
        rollup_refresh(time_rollup(a, "hour"), b1, "hour"), b2, "hour")
    assert _canon(two_step) == _canon(full)


def test_cascade_lossless(spark, events):
    """day/month from the hourly table == day/month from raw."""
    hourly = time_rollup(events, "hour")
    assert _canon(cascade_rollup(hourly, "day")) == \
        _canon(time_rollup(events, "day"))
    assert _canon(cascade_rollup(cascade_rollup(hourly, "day"), "month")) \
        == _canon(time_rollup(events, "month"))


def test_level_validation(spark, events):
    with pytest.raises(ValueError, match="level"):
        time_rollup(events, "minute")
    with pytest.raises(ValueError, match="level"):
        cascade_rollup(time_rollup(events, "hour"), "week")
