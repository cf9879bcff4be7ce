"""Z-order layout (sources/layout.py): Morton-key correctness, pruning
report semantics + oracle parity, and the physical write — per-file
min/max envelopes must be narrow in BOTH clustered dimensions."""

import os
import tempfile

import pyspark.sql.functions as F
import pytest

from conftest import SF_DIR, assert_df_matches_duck

from steel_datafusion_spark.pipeline.queries import (
    _sql_zorder_skipping, q_zorder_skipping)
from steel_datafusion_spark.sources.layout import (
    write_zordered, zorder_key, zorder_skipping_stats)


def test_interleave_known_values(spark):
    # 2 bits, 2 dims over the corners of a 4x4 grid: z(x=3,y=0) interleaves
    # to 0b0101 = 5, z(0,3) -> 0b1010 = 10, z(3,3) -> 15.
    df = spark.createDataFrame(
        [(0.0, 0.0), (3.0, 0.0), (0.0, 3.0), (3.0, 3.0)], "x double, y double")
    keyed = {(r["x"], r["y"]): r["zkey"]
             for r in zorder_key(df, ["x", "y"], bits=2).collect()}
    assert keyed[(0.0, 0.0)] == 0
    assert keyed[(3.0, 0.0)] == 5
    assert keyed[(0.0, 3.0)] == 10
    assert keyed[(3.0, 3.0)] == 15


def test_degenerate_span_buckets_to_zero(spark):
    df = spark.createDataFrame([(1.0, 7.0), (2.0, 7.0)], "x double, y double")
    rows = zorder_key(df, ["x", "y"], bits=4).collect()
    assert all(r["_b_y"] == 0 for r in rows)  # mn == mx -> bucket 0


def test_zorder_beats_linear_on_2d_box(spark):
    from steel_datafusion_spark.sources.readers import load_tables

    ev = load_tables(spark, SF_DIR)["events"]
    rep = {(r["pred_name"], r["layout"]): r for r in zorder_skipping_stats(
        ev, ["user_id", "value"],
        [("box", {"user_id": (0.4, 0.6), "value": (0.4, 0.6)})]).collect()}
    z = rep[("box", "zorder")]
    lu = rep[("box", "linear_user_id")]
    lv = rep[("box", "linear_value")]
    # the 2-D predicate must touch a smaller cell fraction under z-order
    # than under either single-column clustering
    assert z["hit_frac"] < lu["hit_frac"]
    assert z["hit_frac"] < lv["hit_frac"]


def test_gate_matches_oracle(spark, duck):
    assert_df_matches_duck(q_zorder_skipping(spark, SF_DIR), duck,
                           _sql_zorder_skipping())


def test_write_zordered_physical_envelopes(spark):
    """After write_zordered, each FILE's (user_id, value) min/max envelope
    must cover far less area than the global domain — the physical
    evidence that footer-stat pruning would skip most files for a 2-D
    box.  An unsorted write has near-full-domain envelopes in every
    file."""
    from steel_datafusion_spark.sources.readers import load_tables

    ev = load_tables(spark, SF_DIR)["events"].select("user_id", "value")
    with tempfile.TemporaryDirectory() as d:
        zp = os.path.join(d, "z")
        write_zordered(ev, zp, ["user_id", "value"], n_files=8, bits=8)
        back = spark.read.parquet(zp).withColumn(
            "f", F.input_file_name())
        stats = (back.groupBy("f")
                 .agg((F.max("user_id") - F.min("user_id")).alias("du"),
                      (F.max("value") - F.min("value")).alias("dv"))
                 .agg(F.avg("du").alias("du"), F.avg("dv").alias("dv"),
                      F.count(F.lit(1)).alias("nf"))
                 .collect()[0])
        dom = ev.agg(
            (F.max("user_id") - F.min("user_id")).cast("double").alias("du"),
            (F.max("value") - F.min("value")).alias("dv")).collect()[0]
        assert stats["nf"] >= 4  # range partitioner actually split
        # each file's average envelope is a strict minority of the domain
        # in BOTH dimensions (a single-column sort fails the other one)
        assert stats["du"] < 0.8 * dom["du"]
        assert stats["dv"] < 0.8 * dom["dv"]


def test_validation(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError):
        zorder_key(df, [], bits=8)
    with pytest.raises(ValueError):
        zorder_key(df, ["x"], bits=63)
