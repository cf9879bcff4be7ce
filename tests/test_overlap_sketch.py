"""source_overlap_sketch (pipeline/dedup.py): sketch estimate tracks the
exact per-pair Jaccard and covers ALL pairs including disjoint ones."""

from pyspark.sql import functions as F

from steel_datafusion_spark.pipeline.dedup import (
    source_overlap_matrix, source_overlap_sketch,
)


def _corpus(spark):
    rows = []
    for i in range(60):
        rows.append((f"g{i % 3}", f"doc {i} body words segment {i*7%11} "
                                  f"alpha beta gamma delta {i} epsilon"))
    # g_mirror duplicates g0's docs exactly -> jaccard(g0, g_mirror) high
    for i in range(0, 60, 3):
        rows.append(("g_mirror", rows[i][1]))
    return spark.createDataFrame(rows, "source string, text string")


def test_sketch_tracks_exact_and_is_dense(spark):
    c = _corpus(spark)
    exact = {(r.group_a, r.group_b): r.jaccard
             for r in source_overlap_matrix(c, "source").collect()}
    est = {(r.group_a, r.group_b): r.est_jaccard
           for r in source_overlap_sketch(c, "source", k=64).collect()}
    # dense: every pair of the 4 groups present (6 pairs)
    assert len(est) == 6
    # the planted duplicate pair is (g0, g_mirror): exact == 1.0
    assert exact[("g0", "g_mirror")] == 1.0
    assert est[("g0", "g_mirror")] == 1.0
    # estimates within 3*sqrt(J(1-J)/64) + slack of exact on shared pairs
    for pair, j in exact.items():
        sigma = (j * (1 - j) / 64) ** 0.5
        assert abs(est[pair] - j) <= 3 * sigma + 0.06, (pair, j, est[pair])
    # disjoint-ish pairs absent from exact must still appear in est
    for pair, e in est.items():
        if pair not in exact:
            assert e <= 0.15


def test_sketch_k_validation(spark):
    import pytest
    c = _corpus(spark)
    with pytest.raises(ValueError):
        source_overlap_sketch(c, "source", k=65)
