"""Snapshot diff + SCD2 merge (pipeline/cdc.py)."""

import pytest
from pyspark.sql import functions as F

from steel_datafusion_spark.pipeline.cdc import (
    scd2_apply, scd2_init, snapshot_diff,
)

SCHEMA = "id long, name string, score long"


def _snap(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_snapshot_diff_classifies_all_four(spark):
    old = _snap(spark, [(1, "a", 10), (2, "b", 20), (3, "c", 30)])
    new = _snap(spark, [(2, "b", 20), (3, "c", 99), (4, "d", 40)])
    out = {r.id: r.change_type
           for r in snapshot_diff(old, new, ["id"]).collect()}
    assert out == {1: "delete", 2: "unchanged", 3: "update", 4: "insert"}


def test_snapshot_diff_null_vs_empty_not_confused(spark):
    old = _snap(spark, [(1, None, 1), (2, "", 1)])
    new = _snap(spark, [(1, "", 1), (2, "", 1)])
    out = {r.id: r.change_type
           for r in snapshot_diff(old, new, ["id"]).collect()}
    assert out == {1: "update", 2: "unchanged"}


def test_snapshot_diff_respects_compare_cols(spark):
    old = _snap(spark, [(1, "a", 10)])
    new = _snap(spark, [(1, "a", 999)])
    only_name = snapshot_diff(old, new, ["id"], ["name"]).collect()
    assert only_name[0].change_type == "unchanged"


def test_scd2_apply_versions_and_closes(spark):
    dim = scd2_init(_snap(spark, [(1, "a", 10), (2, "b", 20), (3, "c", 30)]))
    batch = _snap(spark, [(1, "a", 10), (2, "b", 25), (4, "d", 40)])
    out = scd2_apply(dim, batch, ["id"], batch_id=1).collect()
    rows = {(r.id, r.valid_from): r for r in out}
    # unchanged key 1: single open version from batch 0
    assert rows[(1, 0)].valid_to is None
    # updated key 2: closed v0 + open v1 with the new value
    assert rows[(2, 0)].valid_to == 1
    assert rows[(2, 1)].valid_to is None and rows[(2, 1)].score == 25
    # deleted key 3: closed, no new version
    assert rows[(3, 0)].valid_to == 1
    assert (3, 1) not in rows
    # inserted key 4: open at batch 1
    assert rows[(4, 1)].valid_to is None
    assert len(out) == 5


def test_scd2_reapply_same_batch_is_noop(spark):
    dim = scd2_init(_snap(spark, [(1, "a", 10), (2, "b", 20)]))
    batch = _snap(spark, [(1, "a", 11), (2, "b", 20)])
    once = scd2_apply(dim, batch, ["id"], 1)
    twice = scd2_apply(once, batch, ["id"], 2)
    assert sorted(map(tuple, once.collect())) == \
        sorted(map(tuple, twice.collect()))


def test_scd2_history_is_immutable_across_batches(spark):
    dim = scd2_init(_snap(spark, [(1, "a", 10)]))
    dim = scd2_apply(dim, _snap(spark, [(1, "a", 20)]), ["id"], 1)
    dim = scd2_apply(dim, _snap(spark, [(1, "a", 30)]), ["id"], 2)
    rows = sorted(dim.collect(), key=lambda r: r.valid_from)
    assert [(r.valid_from, r.valid_to, r.score) for r in rows] == \
        [(0, 1, 10), (1, 2, 20), (2, None, 30)]


def test_scd2_missing_batch_column_raises(spark):
    dim = scd2_init(_snap(spark, [(1, "a", 10)]))
    batch = spark.createDataFrame([(1, "a")], "id long, name string")
    with pytest.raises(ValueError, match="missing dimension columns"):
        scd2_apply(dim, batch, ["id"], 1)
