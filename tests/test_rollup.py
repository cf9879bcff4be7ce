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


class TestGapfill:
    def _series(self, spark):
        # key A: observed at buckets 0, 3600*3 (gap of 2); key B: single
        rows = [("A", 0, 10.0), ("A", 10, 20.0),        # bucket 0, mean 15
                ("A", 3 * 3600 + 5, 45.0),              # bucket 3
                ("B", 7200, 7.0)]
        import datetime

        base = datetime.datetime(2024, 1, 1)
        data = [(k, base + datetime.timedelta(seconds=s), v)
                for k, s, v in rows]
        return spark.createDataFrame(data, "event_type string, ts timestamp, "
                                           "value double")

    def test_locf_carries_forward(self, spark):
        from steel_datafusion_spark.pipeline.rollup import gapfill

        out = {(r["event_type"], r["bucket_ts"]): r for r in
               gapfill(self._series(spark), method="locf").collect()}
        a = [v for (k, _), v in sorted(out.items()) if k == "A"]
        assert len(a) == 4                      # buckets 0..3 inclusive
        assert [r["value"] for r in a] == [15.0, 15.0, 15.0, 45.0]
        assert [r["filled"] for r in a] == [False, True, True, False]
        b = [v for (k, _), v in sorted(out.items()) if k == "B"]
        assert len(b) == 1 and b[0]["value"] == 7.0 and not b[0]["filled"]

    def test_linear_interpolates(self, spark):
        from steel_datafusion_spark.pipeline.rollup import gapfill

        out = [r for r in gapfill(self._series(spark),
                                  method="linear").collect()
               if r["event_type"] == "A"]
        vals = [r["value"] for r in sorted(out, key=lambda r: r["bucket_ts"])]
        assert vals == [15.0, 25.0, 35.0, 45.0]  # straight line 15 -> 45

    def test_leading_gap_null_under_both(self, spark):
        """A key whose FIRST grid bucket is observed never has a leading
        gap by construction (grid starts at min observed bucket) — pin
        that contract: no NULL values under locf, and under linear only
        strictly-interior gaps interpolate."""
        from steel_datafusion_spark.pipeline.rollup import gapfill

        locf = gapfill(self._series(spark), method="locf").collect()
        assert all(r["value"] is not None for r in locf)

    def test_validation(self, spark):
        import pytest

        from steel_datafusion_spark.pipeline.rollup import gapfill

        with pytest.raises(ValueError):
            gapfill(self._series(spark), method="cubic")
        with pytest.raises(ValueError):
            gapfill(self._series(spark), interval_s=0)

    def test_gate_matches_oracle(self, spark, duck):
        from conftest import SF_DIR, assert_df_matches_duck
        from steel_datafusion_spark.pipeline.queries import (
            _sql_gapfill_resample, q_gapfill_resample)

        assert_df_matches_duck(q_gapfill_resample(spark, SF_DIR), duck,
                               _sql_gapfill_resample())
