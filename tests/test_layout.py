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


# ---------------------------------------------------------------------------
# Compaction planning
# ---------------------------------------------------------------------------

def _listing(spark, rows):
    return spark.createDataFrame(
        rows, "part string, path string, size_bytes long")


def test_plan_compaction_greedy_bins_and_keeps(spark):
    from steel_datafusion_spark.sources.layout import plan_compaction

    rows = [("p", "big", 900), ("p", "a", 400), ("p", "b", 300),
            ("p", "c", 200), ("p", "d", 100)]
    plan = {r["path"]: r.asDict() for r in plan_compaction(
        _listing(spark, rows), target_bytes=600, min_file_bytes=500,
        partition_col="part").collect()}
    assert plan["big"]["action"] == "keep" and plan["big"]["bin_id"] is None
    # largest-first cumsum: a(400)->bin0, b(300) starts at 400 -> bin0,
    # c(200) starts at 700 -> bin1, d(100) starts at 900 -> bin1
    assert [plan[p]["bin_id"] for p in "abcd"] == [0, 0, 1, 1]
    assert all(plan[p]["action"] == "compact" for p in "abcd")


def test_plan_compaction_partitions_never_mix(spark):
    from steel_datafusion_spark.sources.layout import plan_compaction

    rows = [(f"p{i}", f"f{i}_{j}", 100) for i in range(3) for j in range(4)]
    plan = plan_compaction(_listing(spark, rows), target_bytes=250,
                           min_file_bytes=250, partition_col="part")
    per = (plan.groupBy("part", "bin_id").count().collect())
    # each partition packs independently: bins restart at 0 per partition
    parts = {}
    for r in per:
        parts.setdefault(r["part"], set()).add(r["bin_id"])
    assert all(bins == {0, 1} for bins in parts.values())


def test_compaction_summary_counts(spark):
    from steel_datafusion_spark.sources.layout import compaction_summary

    rows = [("p", "big", 900), ("p", "a", 400), ("p", "b", 300),
            ("p", "c", 200), ("p", "d", 100)]
    out = compaction_summary(_listing(spark, rows), target_bytes=600,
                             min_file_bytes=500,
                             partition_col="part").collect()
    assert len(out) == 1
    r = out[0].asDict()
    assert (r["n_files"], r["n_small"], r["n_bins"]) == (5, 4, 2)
    assert r["small_bytes"] == 1000
    assert r["n_files_after"] == 3     # 1 kept + 2 bins


def test_plan_compaction_matches_duckdb(spark, duck):
    import random

    from steel_datafusion_spark.sources.layout import (
        plan_compaction, sql_plan_compaction,
    )
    from tests.conftest import assert_df_matches_duck

    rng = random.Random(7)
    rows = [(f"p{i % 4}", f"file_{i}", rng.randrange(10, 2000))
            for i in range(200)]
    duck.execute("CREATE OR REPLACE TABLE cp(part VARCHAR, path VARCHAR, "
                 "size_bytes BIGINT)")
    duck.executemany("INSERT INTO cp VALUES (?, ?, ?)", rows)
    assert_df_matches_duck(
        plan_compaction(_listing(spark, rows), target_bytes=3000,
                        partition_col="part"),
        duck,
        sql_plan_compaction("cp", target_bytes=3000,
                            partition_col="part"))


def test_list_data_files_real_fs(spark, tmp_path):
    from steel_datafusion_spark.sources.layout import list_data_files

    out = str(tmp_path / "t")
    spark.range(1000).repartition(4).write.parquet(out)
    files = list_data_files(spark, out).collect()
    assert len(files) == 4
    assert all(r["size_bytes"] > 0 and r["path"].endswith(".parquet")
               for r in files)
