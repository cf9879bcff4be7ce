"""Grouped-map robust stats (pipeline/robust.py): exact median/MAD via
applyInPandas, outlier resistance, DuckDB parity."""

from steel_datafusion_spark.pipeline.robust import (
    grouped_median_mad, sql_grouped_median_mad,
)


def test_median_mad_exact_and_outlier_resistant(spark):
    rows = ([("a", float(v)) for v in [1, 2, 3, 4, 100]]      # odd n + outlier
            + [("b", float(v)) for v in [10, 20, 30, 40]])    # even n
    df = spark.createDataFrame(rows, "g string, value double")
    got = {r.g: r for r in grouped_median_mad(df, ["g"]).collect()}
    a = got["a"]
    assert (a.n, a.median) == (5, 3.0)          # outlier does not move it
    assert a.mad == 1.0                          # |1,2,3,4,100 - 3| -> med 1
    b = got["b"]
    assert (b.n, b.median) == (4, 25.0)          # mean of middle two
    assert b.mad == 10.0


def test_matches_duckdb_oracle(spark, duck):
    import os

    from steel_datafusion_spark import load_tables
    from tests.conftest import assert_df_matches_duck

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    ev = load_tables(spark, sf)["events"]
    assert_df_matches_duck(
        grouped_median_mad(ev, ["event_type"], "value"), duck,
        sql_grouped_median_mad("events", ["event_type"], "value"))
