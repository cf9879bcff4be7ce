"""Product-quantization ANN (pipeline/similarity.py pq_*)."""

import pytest
from pyspark.sql import functions as F

from steel_datafusion_spark.pipeline.similarity import (
    cosine_topk, pq_codebooks, pq_encode, pq_topk,
)
from steel_datafusion_spark.sources.readers import load_tables

from conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return load_tables(spark, SF_DIR)["embeddings"]


def test_pq_codebook_shape_and_determinism(emb):
    b1 = pq_codebooks(emb, m=4, ks=16)
    b2 = pq_codebooks(emb, m=4, ks=16)
    assert len(b1) == 4 and all(len(s) == 16 for s in b1)
    assert all(len(c) == 16 for s in b1 for c in s)  # dim 64 / m 4
    assert b1 == b2


def test_pq_codebook_validates_inputs(emb):
    with pytest.raises(ValueError):
        pq_codebooks(emb, m=7, ks=16)       # 64 % 7 != 0
    with pytest.raises(ValueError):
        pq_codebooks(emb.limit(3), m=4, ks=16)  # fewer rows than ks


def test_pq_encode_codes_in_range(emb):
    books = pq_codebooks(emb, m=4, ks=16)
    codes = pq_encode(emb, books).collect()
    assert len(codes) == emb.count()
    for r in codes:
        assert len(r.codes) == 4
        assert all(0 <= c < 16 for c in r.codes)


def test_pq_topk_recall_vs_exact(spark, emb):
    q = emb.filter(F.col("vec_id") < 5)
    exact = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(q, emb, k=10).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in pq_topk(q, emb, k=10, shortlist=64).collect()}
    per_q = {}
    for qid, nid in exact:
        per_q.setdefault(qid, [0, 0])[1] += 1
        if (qid, nid) in approx:
            per_q[qid][0] += 1
    recalls = {qid: hit / tot for qid, (hit, tot) in per_q.items()}
    assert len(recalls) == 5
    # deterministic plan -> stable recall; static codebooks + 64-shortlist
    # re-rank comfortably clears 0.5 on this corpus
    assert min(recalls.values()) >= 0.5, recalls
    # scores inside the result are the EXACT cosine (re-ranked), so any
    # neighbor shared with the exact top-k carries the identical score
    exact_scores = {(r.query_id, r.neighbor_id): r.score
                    for r in cosine_topk(q, emb, k=10).collect()}
    for r in pq_topk(q, emb, k=10, shortlist=64).collect():
        key = (r.query_id, r.neighbor_id)
        if key in exact_scores:
            assert r.score == exact_scores[key]


def test_pq_trained_codebooks_refine_static(spark, emb):
    static = pq_codebooks(emb, m=4, ks=16, train_iters=0)
    trained = pq_codebooks(emb, m=4, ks=16, train_iters=1)
    assert len(trained) == 4 and all(len(s) == 16 for s in trained)
    assert trained != static  # Lloyd step moved at least one centroid
    # trained books plug into the same topk path
    q = emb.filter(F.col("vec_id") < 2)
    out = pq_topk(q, emb, k=5, shortlist=32, codebooks=trained).collect()
    assert {r.query_id for r in out} == {0, 1}
    assert all(r.rank <= 5 for r in out)


def test_pq_table_path_parity_with_literal(spark, emb):
    """VERDICT r6 #5: the join-based ADC path (codebook as a DataFrame —
    the scale path for ks=256/1024 books) must return the IDENTICAL top-k
    to the literal-matrix path: same per-subspace 9dp rounding and same
    subspace-order summation means adist — and hence shortlist, re-rank,
    and ranks — agree exactly."""
    q = emb.filter(F.col("vec_id") < 5)
    lit = sorted((r.query_id, r.neighbor_id, r.score, r.rank)
                 for r in pq_topk(q, emb, k=10, shortlist=48,
                                  path="literal").collect())
    tab = sorted((r.query_id, r.neighbor_id, r.score, r.rank)
                 for r in pq_topk(q, emb, k=10, shortlist=48,
                                  path="table").collect())
    assert lit == tab and len(lit) == 50


def test_pq_auto_path_threshold(spark, emb):
    """auto picks literal for small books and table beyond the threshold;
    both produce rows with the contract schema."""
    q = emb.filter(F.col("vec_id") < 2)
    # m*ks = 64 <= threshold 2048 → literal; force tiny threshold → table
    small = pq_topk(q, emb, k=3, shortlist=16, path="auto")
    big = pq_topk(q, emb, k=3, shortlist=16, path="auto", table_threshold=8)
    a = sorted((r.query_id, r.neighbor_id, r.rank) for r in small.collect())
    b = sorted((r.query_id, r.neighbor_id, r.rank) for r in big.collect())
    assert a == b
    with pytest.raises(ValueError):
        pq_topk(q, emb, k=3, path="nope")


def test_normalize_l2_unit_norm_and_zero_safe(spark):
    from steel_datafusion_spark.pipeline.similarity import (
        norm2, normalize_l2,
    )
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [1.0, 0.0])],
        "vec_id long, embedding array<double>")
    out = df.select(
        "vec_id",
        F.round(norm2(normalize_l2(F.col("embedding"))), 9).alias("unit"),
        normalize_l2(F.col("embedding")).alias("nv")).collect()
    rows = {r.vec_id: r for r in out}
    assert rows[1].unit == 1.0 and rows[1].nv == [0.6, 0.8]
    assert rows[2].unit == 0.0 and rows[2].nv == [0.0, 0.0]  # no NaN
    assert rows[3].unit == 1.0


def test_sq8_error_bounded_by_half_step(spark):
    from pyspark.sql import functions as F

    from steel_datafusion_spark.pipeline.similarity import (
        sq8_error_stats, sq8_stats,
    )
    import random
    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(50)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    stats = {r.d: (r.mn, r.mx) for r in sq8_stats(emb).collect()}
    assert len(stats) == 16
    # worst per-dim quantization error is half a step: (mx-mn)/510
    max_half_step = max((mx - mn) / 510.0 for mn, mx in stats.values())
    got = sq8_error_stats(emb).collect()
    assert len(got) == 50
    assert all(r.dim == 16 for r in got)
    assert all(r.rmse <= max_half_step + 1e-9 for r in got)
    # constant dimension quantizes exactly
    const = spark.createDataFrame([(1, [3.0, 5.0]), (2, [3.0, 9.0])],
                                  "vec_id long, embedding array<double>")
    g2 = {r.vec_id: r.rmse for r in sq8_error_stats(const).collect()}
    assert g2[1] == 0.0 and g2[2] == 0.0  # dim0 constant, dim1 endpoints


def test_ann_recall_gate_and_nprobe_knob(spark, duck):
    """The recall report matches its composed oracle, and raising nprobe
    strictly improves mean recall on the same index — the knob the gate
    exists to inform."""
    import pyspark.sql.functions as F

    from conftest import SF_DIR, assert_df_matches_duck
    from steel_datafusion_spark.pipeline.queries import (
        _sql_ann_recall, q_ann_recall)
    from steel_datafusion_spark.pipeline.similarity import (
        cosine_topk, ivf_topk)
    from steel_datafusion_spark.sources.readers import load_tables

    assert_df_matches_duck(q_ann_recall(spark, SF_DIR), duck,
                           _sql_ann_recall())

    e = load_tables(spark, SF_DIR)["embeddings"]
    q = e.filter(F.col("vec_id") < 5)
    bf = cosine_topk(q, e, k=10).select("query_id", "neighbor_id")

    def mean_recall(nprobe):
        approx = ivf_topk(q, e, k=10, nprobe=nprobe, centroid_mod=50) \
            .select("query_id", "neighbor_id")
        hit = approx.join(bf, ["query_id", "neighbor_id"]).count()
        return hit / bf.count()

    r2, r8 = mean_recall(2), mean_recall(8)
    assert 0.0 <= r2 <= r8 <= 1.0
    assert r8 > r2  # more probes -> strictly better on this corpus


# ---------------------------------------------------------------------------
# Covariance + PCA
# ---------------------------------------------------------------------------

def _vec_df(spark, mat):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<float>")


def test_embedding_covariance_matches_numpy(spark):
    import numpy as np

    from steel_datafusion_spark.pipeline.similarity import (
        embedding_covariance,
    )

    rng = np.random.RandomState(3)
    mat = rng.randn(80, 6).astype("float32")
    got = embedding_covariance(_vec_df(spark, mat), dims=6).collect()
    assert len(got) == 6 * 7 // 2
    exp = np.cov(mat.astype("float64"), rowvar=False, ddof=1)
    for r in got:
        assert r["n"] == 80
        assert abs(r["cov"] - exp[r["i"]][r["j"]]) < 1e-6


def test_pca_components_match_numpy_eigh(spark):
    import numpy as np

    from steel_datafusion_spark.pipeline.similarity import (
        embedding_covariance, pca_components,
    )

    rng = np.random.RandomState(11)
    base = rng.randn(200, 2)
    # embed a rank-2 signal in 5 dims + small noise: top-2 dominate
    lift = rng.randn(2, 5)
    mat = (base @ lift + 0.01 * rng.randn(200, 5)).astype("float32")
    cov = embedding_covariance(_vec_df(spark, mat), dims=5)
    vals, vecs, ratio = pca_components(cov)
    assert list(vals) == sorted(vals, reverse=True)
    assert ratio[:2].sum() > 0.99
    # components are orthonormal
    assert np.allclose(vecs @ vecs.T, np.eye(5), atol=1e-9)
    # sign convention: the largest-|coeff| entry of each component is +
    for c in vecs:
        assert c[np.argmax(np.abs(c))] > 0


def test_pca_project_variance_equals_eigenvalue(spark):
    import numpy as np

    from steel_datafusion_spark.pipeline.similarity import (
        embedding_covariance, pca_components, pca_project,
    )

    rng = np.random.RandomState(5)
    mat = (rng.randn(300, 4) * np.array([5.0, 2.0, 0.5, 0.1])) \
        .astype("float32")
    df = _vec_df(spark, mat)
    cov = embedding_covariance(df, dims=4)
    vals, vecs, _ = pca_components(cov, k=2)
    proj = np.array([r["pca"] for r in
                     pca_project(df, vecs).select("pca").collect()])
    got_var = proj.var(axis=0, ddof=1)
    assert np.allclose(got_var, vals[:2], rtol=0.01)
