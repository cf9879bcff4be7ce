"""Logistic-regression training (pipeline/classifier.py): convergence on
separable data, exact-gradient determinism across partition counts,
oracle parity of the full weight trajectory, and the gate."""

import duckdb
import pyspark.sql.functions as F
import pytest

from conftest import SF_DIR, assert_df_matches_duck

from steel_datafusion_spark.pipeline.classifier import (
    FEATURE_COLS, logreg_predict, logreg_train, quality_features,
    sql_logreg_train)
from steel_datafusion_spark.pipeline.queries import (
    _sql_logreg_quality, q_logreg_quality)


def _separable(spark, n=200):
    # y = 1 iff x1 > 0.5; x2 is noise fixed by row index (deterministic)
    rows = [(i, (i % 100) / 100.0, ((i * 37) % 100) / 100.0,
             1.0 if (i % 100) / 100.0 > 0.5 else 0.0) for i in range(n)]
    return spark.createDataFrame(
        rows, "id long, x1 double, x2 double, y double")


def test_converges_on_separable_data(spark):
    df = _separable(spark)
    w, b = logreg_train(df, ["x1", "x2"], "y", iterations=60, lr=8.0)
    acc = (logreg_predict(df, w, b, ["x1", "x2"])
           .agg(F.avg((F.col("pred") == (F.col("y") == 1.0))
                      .cast("double"))).collect()[0][0])
    assert acc >= 0.95
    assert w[0] > abs(w[1])  # the signal feature dominates the noise one


def test_weights_partition_count_invariant(spark):
    """Decimal-exact gradient sums ⇒ the trajectory is identical at any
    parallelism — the property that makes the oracle unroll possible."""
    df = _separable(spark)
    w1, b1 = logreg_train(df.coalesce(1), ["x1", "x2"], "y",
                          iterations=10, lr=4.0)
    w32, b32 = logreg_train(df.repartition(32), ["x1", "x2"], "y",
                            iterations=10, lr=4.0)
    assert w1 == w32 and b1 == b32


def test_trajectory_matches_duck_mirror(spark):
    """Spark-side collect-per-round training vs the chained-CTE unroll:
    same weights to 6 dp after 10 rounds on a hand table."""
    df = _separable(spark, n=120)
    w, b = logreg_train(df, ["x1", "x2"], "y", iterations=10, lr=4.0)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, x1 DOUBLE, x2 DOUBLE, y DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)",
                    [tuple(r) for r in df.collect()])
    got = con.execute(sql_logreg_train(
        "t", [("x1", "x1"), ("x2", "x2")], "y = 1.0",
        iterations=10, lr=4.0)).fetchdf().iloc[0]
    assert got["w_x1"] == round(w[0], 6)
    assert got["w_x2"] == round(w[1], 6)
    assert got["bias"] == round(b, 6)


def test_zero_iterations_and_empty_input(spark):
    df = _separable(spark, n=10)
    w, b = logreg_train(df, ["x1"], "y", iterations=0)
    assert w == [0.0] and b == 0.0
    with pytest.raises(ValueError):
        logreg_train(df.filter(F.lit(False)), ["x1"], "y")
    with pytest.raises(ValueError):
        logreg_train(df, ["x1"], "y", iterations=-1)


def test_quality_features_bounded(spark):
    from steel_datafusion_spark.sources.readers import load_tables

    d = load_tables(spark, SF_DIR)["documents"]
    stats = quality_features(d).agg(
        *[f for c in FEATURE_COLS
          for f in (F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}"))]
    ).collect()[0]
    for c in FEATURE_COLS:
        assert 0.0 <= stats[f"mn_{c}"] <= stats[f"mx_{c}"] <= 1.0


def test_gate_matches_oracle_and_learns(spark, duck):
    df = q_logreg_quality(spark, SF_DIR)
    row = df.collect()[0]
    assert row["train_accuracy"] >= 0.9  # convergence, not just parity
    assert_df_matches_duck(q_logreg_quality(spark, SF_DIR), duck,
                           _sql_logreg_quality())
