"""Data-quality expectations (operators/expectations.py): per-kind
semantics on planted violations, NULL handling, single-scan plan shape,
and gate oracle parity."""

import pyspark.sql.functions as F
import pytest

from conftest import SF_DIR, assert_df_matches_duck

from steel_datafusion_spark.operators.expectations import (
    validate_expectations)
from steel_datafusion_spark.pipeline.queries import (
    _sql_validate_expectations, q_validate_expectations)
from steel_datafusion_spark.plans.explain import explain_string


def _dirty(spark):
    rows = [
        (1, 5.0, "A", "ok"),
        (2, 5.0, "A", "ok"),
        (1, 99.0, "Z", "ok"),       # dup id, out-of-range, bad category
        (None, 5.0, "A", "bad!"),   # null id, regex violation
        (3, None, "A", "ok"),       # null value (range must pass it)
    ]
    return spark.createDataFrame(rows, "id int, v double, cat string, "
                                       "s string")


def test_per_kind_counts(spark):
    rep = {(r["rule"], r["col_name"]): r for r in validate_expectations(
        _dirty(spark),
        [("not_null", "id"), ("range", "v", 0.0, 10.0),
         ("in_set", "cat", ["A", "B"]), ("matches", "s", "^ok$"),
         ("unique", "id")]).collect()}
    assert rep[("not_null", "id")]["n_violations"] == 1
    assert rep[("range", "v")]["n_violations"] == 1     # NULL v passes
    assert rep[("in_set", "cat")]["n_violations"] == 1
    assert rep[("matches", "s")]["n_violations"] == 1
    u = rep[("unique", "id")]
    assert u["n_rows"] == 4          # NULL ids ignored
    assert u["n_violations"] == 2    # both rows of the duplicated id=1
    assert not u["ok"]


def test_fk_semantics(spark):
    df = spark.createDataFrame([(1,), (2,), (None,), (9,)], "k int")
    ref = spark.createDataFrame([(1,), (2,), (3,)], "rk int")
    rep = validate_expectations(df, [("fk", "k", ref, "rk")]).collect()[0]
    assert rep["n_rows"] == 3        # NULL k passes (SQL FK semantics)
    assert rep["n_violations"] == 1  # k=9 unmatched
    assert not rep["ok"]


def test_row_rules_fold_into_one_scan(spark):
    """Four row-level rules must produce exactly one scan of the input —
    adding a rule adds a conditional-count column, not a pass."""
    df = _dirty(spark)
    df.createOrReplaceTempView("exp_one_scan")
    rep = validate_expectations(
        df, [("not_null", "id"), ("range", "v", 0.0, 10.0),
             ("in_set", "cat", ["A", "B"]), ("matches", "s", "^ok$")])
    import re

    plan = explain_string(rep)
    # formatted plans print each node in the tree AND the detail section;
    # count numbered scan NODES
    assert len(re.findall(r"\(\d+\) Scan", plan)) == 1


def test_rejects_unknown_and_empty(spark):
    df = _dirty(spark)
    with pytest.raises(ValueError):
        validate_expectations(df, [("frobnicate", "id")])
    with pytest.raises(ValueError):
        validate_expectations(df, [])


def test_gate_matches_oracle(spark, duck):
    assert_df_matches_duck(q_validate_expectations(spark, SF_DIR), duck,
                           _sql_validate_expectations())
