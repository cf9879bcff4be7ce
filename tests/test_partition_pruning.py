"""Partitioned layout + partition pruning: a date-partitioned write must let
Catalyst prune the scan to matching partitions (PartitionFilters in the plan,
not a full-table read)."""

from pyspark.sql import functions as F

from steel_datafusion_spark.sources.readers import load_tables, write_parquet

from conftest import SF_DIR


def test_partition_pruning_on_date_layout(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_part"))
    ev = load_tables(spark, SF_DIR)["events"] \
        .withColumn("day", F.to_date("ts"))
    write_parquet(ev, out, partition_by=["day"])

    back = spark.read.parquet(out)
    one_day = back.filter(F.col("day") == "2024-01-05")

    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "isnotnull(day" in plan or \
           "PartitionFilters: [isnotnull(day" in plan or "day#" in plan
    # the pruned count must match the predicate applied to the full table
    want = ev.filter(F.to_date("ts") == "2024-01-05").count()
    assert one_day.count() == want and want > 0

    # pruning really skipped partitions: scanning a non-existent day is empty
    # without error and fast
    assert back.filter(F.col("day") == "1999-01-01").count() == 0


def test_write_roundtrip_gate_prunes_lang_partitions(spark):
    """The write_partitioned_roundtrip gate's read-back must scan only the
    filtered lang partitions and agree with the source aggregation."""
    from steel_datafusion_spark.queries import q_write_partitioned_roundtrip

    out = q_write_partitioned_roundtrip(spark, SF_DIR)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan

    d = load_tables(spark, SF_DIR)["documents"]
    want = (d.filter(F.col("lang").isin("en", "de"))
            .groupBy("lang", "source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("sum_chars"),
                 F.min("doc_id").alias("min_doc_id"),
                 F.max("doc_id").alias("max_doc_id")))
    got = {tuple(r) for r in out.collect()}
    assert got == {tuple(r) for r in want.collect()} and got


def test_part_pruning_keeps_double_domain_collisions():
    """Pinned falsifying example from the hypothesis sweep (round 12):
    an integral partition-dir value and a DIFFERENT int literal that
    collide as float64 (past 2^53) must keep the dir — the column could
    be double-typed, where Spark compares both sides as doubles and the
    row matches.  Exact-int interpretation alone would falsely prune."""
    from steel_datafusion_spark.sources.manifest import _part_may_match

    assert _part_may_match("14117575344953599", "=",
                           14117575344953600) is True
    assert _part_may_match("14117575344953599.0", "=",
                           14117575344953601) is True
    # and the exact interpretation still prunes clean misses
    assert _part_may_match("7", "=", 9) is False
    assert _part_may_match("7", ">", 9.5) is False
