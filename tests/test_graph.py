"""Weighted PageRank (pipeline/graph.py)."""

import pytest
from pyspark.sql import functions as F

from steel_datafusion_spark.pipeline.graph import pagerank


def _edges(spark, rows, with_weight=False):
    schema = "src string, dst string" + (", w long" if with_weight else "")
    return spark.createDataFrame(rows, schema)


def test_pagerank_matches_dense_power_iteration(spark):
    import numpy as np

    # deterministic digraph incl. a dangling node "e" and parallel edges
    rows = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"),
            ("a", "b"), ("c", "e")]
    names = ["a", "b", "c", "d", "e"]
    idx = {n: i for i, n in enumerate(names)}
    n, d, iters = len(names), 0.85, 10

    w = np.zeros((n, n))
    for s, t in rows:
        w[idx[s]][idx[t]] += 1.0
    out = w.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        dangling = 0.0
        for i in range(n):
            if out[i] == 0:
                dangling += r[i]
            else:
                contrib += r[i] * w[i] / out[i]
        r = (1 - d) / n + d * (contrib + dangling / n)

    got = {row.node: row.rank
           for row in pagerank(_edges(spark, rows), damping=d,
                               iterations=iters).collect()}
    assert set(got) == set(names)
    for name in names:
        assert got[name] == pytest.approx(r[idx[name]], rel=1e-9)
    # mass conservation (dangling handled): ranks sum to 1
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_uniform_on_ring(spark):
    rows = [("a", "b"), ("b", "c"), ("c", "a")]
    got = {r.node: r.rank
           for r in pagerank(_edges(spark, rows), iterations=5).collect()}
    assert all(v == pytest.approx(1.0 / 3, abs=1e-9) for v in got.values())


def test_pagerank_weights_shift_mass(spark):
    # a sends 9x more weight to b than to c
    rows = [("a", "b", 9), ("a", "c", 1), ("b", "a", 1), ("c", "a", 1)]
    got = {r.node: r.rank
           for r in pagerank(_edges(spark, rows, True), weight="w",
                             iterations=20).collect()}
    assert got["b"] > got["c"]
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
