"""Operator-level pipeline tests (beyond the driver-gate queries)."""

from pyspark.sql import functions as F

from steel_datafusion_spark.pipeline.dedup import (
    minhash_candidate_pairs, winnow_fingerprints,
)
from steel_datafusion_spark.pipeline.similarity import cosine_topk, ivf_topk, kmeans
from steel_datafusion_spark.pipeline.text import bpe_ish_token_count
from steel_datafusion_spark.sources.readers import load_tables

from conftest import SF_DIR


def test_minhash_finds_planted_near_dup(spark, tables):
    d = tables["documents"].select("doc_id", "text").limit(50)
    # plant an extreme near-dup of doc 0
    dup = d.filter(F.col("doc_id") == 0).select(
        F.lit(999999).alias("doc_id"), F.concat("text", F.lit(" x")).alias("text"))
    pairs = minhash_candidate_pairs(d.union(dup)).collect()
    assert any((r.doc_a, r.doc_b) == (0, 999999) for r in pairs)


def test_winnowing_shares_fingerprints_on_shared_runs(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [(1, base + " uniqueone tail piece here"),
         (2, "prefix words differ " + base),
         (3, "completely different text with other words entirely now")],
        "doc_id long, text string")
    rows = {r.doc_id: set(r.fps) for r in winnow_fingerprints(df).collect()}
    assert rows[1] & rows[2]          # long shared run ⇒ shared fingerprint
    assert not (rows[1] & rows[3])    # disjoint text ⇒ disjoint sketch


def test_ivf_recall_vs_brute_force(spark, tables):
    e = tables["embeddings"]
    q = e.filter(F.col("vec_id") < 5)
    brute = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(q, e, k=5).collect()}
    ivf = {(r.query_id, r.neighbor_id)
           for r in ivf_topk(q, e, k=5, nprobe=4, centroid_mod=50).collect()}
    # nprobe=4 of ~10 buckets: expect meaningful overlap, not exactness
    assert len(brute & ivf) >= len(brute) * 0.3


def test_kmeans_inertia_decreases(spark, tables):
    e = tables["embeddings"]
    from steel_datafusion_spark.pipeline.similarity import dot

    def inertia(iters):
        assign, cent = kmeans(e, k=4, iters=iters)
        vecs = e.select(F.col("vec_id").alias("vid"),
                        F.transform("embedding", lambda x: x.cast("double")).alias("v"))
        j = assign.join(vecs, "vid").join(cent, "cluster")
        d2 = F.aggregate(F.zip_with("v", "centroid", lambda x, y: (x - y) * (x - y)),
                         F.lit(0.0), lambda a, x: a + x)
        return j.agg(F.sum(d2)).collect()[0][0]

    assert inertia(3) <= inertia(1) + 1e-6


def test_bpe_ish_counts_punctuation(spark):
    df = spark.createDataFrame([("Hello, world! 42.5",)], "t string")
    n = df.select(bpe_ish_token_count(F.col("t")).alias("n")).collect()[0].n
    assert n == 7  # Hello , world ! 42 . 5


def test_minhash_dedup_against_matches_only_real_neardups(spark, tables):
    from steel_datafusion_spark.cache import pipeline_cache_scope
    from steel_datafusion_spark.pipeline.dedup import minhash_dedup_against

    corpus = tables["documents"].select("doc_id", "text").limit(100)
    # batch: one near-copy of doc 3, one unrelated doc
    dup = corpus.filter(F.col("doc_id") == 3).select(
        F.lit(900001).alias("doc_id"),
        F.concat("text", F.lit(" tail")).alias("text"))
    fresh = spark.createDataFrame(
        [(900002, "entirely novel words nowhere else present whatsoever")],
        "doc_id long, text string")
    with pipeline_cache_scope(spark):
        got = minhash_dedup_against(dup.union(fresh), corpus,
                                    threshold=0.5).collect()
    assert [(r.batch_id, r.corpus_id) for r in got] == [(900001, 3)]
    assert got[0].jaccard > 0.8


def test_lsh_neardup_recall_vs_exact_all_pairs(spark, tables):
    """Semantic recall gate for cosine_neardup_pairs (ADVICE r2 #3).

    The driver gate's DuckDB oracle mirrors the LSH candidate generation,
    so it checks implementation consistency, not the "all near-dup pairs"
    semantic.  Here the oracle is exact all-pairs cosine in numpy, and the
    probe set is 50 perturbed copies at an exact 0.995 angle to their
    source vector — a NONZERO angle, so bucket codes genuinely differ and
    the hamming-1 multiprobe is what recovers them (exact duplicates share
    a bucket under ANY hash and cannot catch a recall bug).  Expected
    recall at 8 planes ≈ 1 - C(8,2)p², p = θ/π ≈ 0.032 → ~0.975; without
    multiprobe it collapses to (1-p)^8 ≈ 0.77, below the assertion."""
    import numpy as np

    from steel_datafusion_spark.pipeline.similarity import cosine_neardup_pairs

    e = tables["embeddings"].select("vec_id", "embedding", "label")
    rows = e.collect()
    rng = np.random.RandomState(7)
    theta = np.arccos(0.995)
    pert = []
    for r in sorted(rows, key=lambda r: r.vec_id)[:50]:
        v = np.array(r.embedding, dtype=np.float64)
        u = rng.standard_normal(v.shape)
        u -= (u @ v) / (v @ v) * v                    # orthogonal to v
        u *= np.linalg.norm(v) / np.linalg.norm(u)
        w = v + np.tan(theta) * u                     # cos(v, w) == 0.995
        pert.append((r.vec_id + 2_000_000, [float(x) for x in w], r.label))
    aug = e.union(spark.createDataFrame(pert, e.schema))

    # exact all-pairs oracle (numpy), same-label blocks, same 6dp rounding
    arows = aug.collect()
    ids = [r.vec_id for r in arows]
    labs = [r.label for r in arows]
    V = np.array([r.embedding for r in arows], dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = Vn @ Vn.T
    exact = {(ids[i], ids[j]) if ids[i] < ids[j] else (ids[j], ids[i])
             for i in range(len(ids)) for j in range(i + 1, len(ids))
             if labs[i] == labs[j] and round(S[i, j], 6) >= 0.99}

    got = {(min(r.vec_a, r.vec_b), max(r.vec_a, r.vec_b))
           for r in cosine_neardup_pairs(aug, threshold=0.99,
                                         n_planes=8, multiprobe=True).collect()}
    assert len(exact) >= 50                 # probe set actually landed
    assert got <= exact                     # exact-cosine verify ⇒ no false pairs
    recall = len(got & exact) / len(exact)
    assert recall >= 0.85, f"LSH recall {recall:.3f} < 0.85 vs exact all-pairs"


def test_banded_neardup_recall_at_wider_angle(spark, tables):
    """The banding recall knob (VERDICT r3 item 6): at cosine 0.97 —
    θ/π ≈ 0.079, wide enough that codes routinely differ in ≥2 bits —
    hamming-1 multiprobe's analytic recall is ~0.92, while 8 planes × 4
    bands gives 1 - (1 - q²)⁴ ≈ 0.999 (q = per-bit agreement ≈ 0.921).
    Assert ≥0.95 banded recall vs an exact all-pairs numpy oracle at
    threshold 0.95, and that banding beats-or-ties multiprobe here."""
    import numpy as np

    from steel_datafusion_spark.pipeline.similarity import cosine_neardup_pairs

    e = tables["embeddings"].select("vec_id", "embedding", "label")
    rows = sorted(e.collect(), key=lambda r: r.vec_id)[:80]
    rng = np.random.RandomState(11)
    theta = np.arccos(0.97)
    pert = []
    for r in rows:
        v = np.array(r.embedding, dtype=np.float64)
        u = rng.standard_normal(v.shape)
        u -= (u @ v) / (v @ v) * v
        u *= np.linalg.norm(v) / np.linalg.norm(u)
        w = v + np.tan(theta) * u                     # cos(v, w) == 0.97
        pert.append((r.vec_id + 3_000_000, [float(x) for x in w], r.label))
    aug = e.union(spark.createDataFrame(pert, e.schema))

    arows = aug.collect()
    ids = [r.vec_id for r in arows]
    labs = [r.label for r in arows]
    V = np.array([r.embedding for r in arows], dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = Vn @ Vn.T
    exact = {(ids[i], ids[j]) if ids[i] < ids[j] else (ids[j], ids[i])
             for i in range(len(ids)) for j in range(i + 1, len(ids))
             if labs[i] == labs[j] and round(S[i, j], 6) >= 0.95}
    assert len(exact) >= 80

    def run(**kw):
        return {(min(r.vec_a, r.vec_b), max(r.vec_a, r.vec_b))
                for r in cosine_neardup_pairs(
                    aug, threshold=0.95, n_planes=8, **kw).collect()}

    banded = run(bands=4)
    probed = run(multiprobe=True)
    assert banded <= exact and probed <= exact
    recall_banded = len(banded & exact) / len(exact)
    recall_probed = len(probed & exact) / len(exact)
    assert recall_banded >= 0.95, \
        f"banded recall {recall_banded:.3f} < 0.95 (multiprobe {recall_probed:.3f})"
    assert recall_banded >= recall_probed


def test_ngram_jaccard_max_df_bounds_hot_shingle_candidates(spark):
    """100 TB cost knob: a stop-shingle shared by every document drives
    Sigma df^2 candidate blowup; max_df must drop it before the posting-list
    join while keeping pairs supported by non-hot shingles."""
    from steel_datafusion_spark.cache import pipeline_cache_scope
    from steel_datafusion_spark.pipeline.dedup import ngram_jaccard_pairs

    rows = [(i, f"alpha{i} beta{i} gamma{i} zeta{i} common common common", "en")
            for i in range(30)]
    # one true near-dup pair: doc 100 duplicates doc 0's text
    rows.append((100, rows[0][1], "en"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    with pipeline_cache_scope(spark):
        uncapped = ngram_jaccard_pairs(df, threshold=0.05).collect()
        capped = ngram_jaccard_pairs(df, threshold=0.05, max_df=5).collect()
    # every doc shares the 'common common common' shingle -> all pairs appear
    assert len(uncapped) == 31 * 30 // 2
    # capped: only the planted duplicate survives (other pairs shared ONLY
    # the hot shingle), and its jaccard is a lower bound but above threshold
    assert [(r.doc_a, r.doc_b) for r in capped] == [(0, 100)]
    assert capped[0].jaccard >= 0.5


def test_kmeans_reliable_checkpoint(spark, tables, tmp_path):
    """kmeans(reliable=True) routes each iteration through a durable
    checkpoint dir (executor-loss-safe); assignments must equal the
    localCheckpoint path exactly (the trajectory is deterministic)."""
    from steel_datafusion_spark.pipeline.similarity import kmeans

    emb = tables["embeddings"].select("vec_id", "embedding")
    a, _ = kmeans(emb, k=4, iters=2)
    b, _ = kmeans(emb, k=4, iters=2, reliable=True,
                  checkpoint_dir=str(tmp_path / "kckpt"))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    import os
    assert any(os.scandir(str(tmp_path / "kckpt")))


def test_neardup_auto_plane_sizing(spark, tables):
    """n_planes='auto' applies the documented sizing rule (width =
    clamp(ceil(log2(N/target_bucket)), 2, 12) bits per code/band) and
    returns the same verified pairs as the explicitly-sized call."""
    import pytest as _pytest

    from steel_datafusion_spark.pipeline.similarity import (
        cosine_neardup_pairs)

    from pyspark.sql import functions as F

    base = tables["embeddings"].select("vec_id", "embedding", "label")
    dups = base.filter(F.col("vec_id") < 20).withColumn(
        "vec_id", F.col("vec_id") + 3_000_000)  # exact copies → cos 1.0
    e = base.unionByName(dups)
    n = e.count()
    import math
    width = min(12, max(2, math.ceil(math.log2(max(n, 2) / 250))))

    auto = sorted(map(tuple, cosine_neardup_pairs(
        e, threshold=0.99, n_planes="auto", bands=4).collect()))
    explicit = sorted(map(tuple, cosine_neardup_pairs(
        e, threshold=0.99, n_planes=width * 4, bands=4).collect()))
    assert auto == explicit and len(auto) > 0

    with _pytest.raises(ValueError, match="auto"):
        cosine_neardup_pairs(e, n_planes="many")


def test_keep_representatives_and_dedup_corpus(spark):
    """dedup application: clusters → representative filter keeps exactly
    one doc per near-dup class plus all singletons, original schema."""
    from steel_datafusion_spark.pipeline.dedup import (
        connected_components, dedup_corpus, keep_representatives)

    rows = [
        (1, "alpha beta gamma delta epsilon zeta", "en"),
        (2, "alpha beta gamma delta epsilon zeta", "en"),    # dup of 1
        (3, "alpha beta gamma delta epsilon zeta eta", "en"),  # near-dup
        (10, "one two three four five six seven", "en"),
        (20, "totally different words entirely here now", "de"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    cc = connected_components(pairs)
    kept = keep_representatives(corpus, cc)
    assert sorted(r.doc_id for r in kept.collect()) == [1, 10, 20]
    assert kept.columns == corpus.columns

    # end-to-end: simhash finds the identical/near-identical texts
    out = dedup_corpus(corpus, max_hamming=10)
    ids = sorted(r.doc_id for r in out.collect())
    assert 1 in ids and 10 in ids and 20 in ids
    assert 2 not in ids                      # exact dup dropped
    assert out.columns == corpus.columns

    import pytest as _pytest
    with _pytest.raises(ValueError, match="method"):
        dedup_corpus(corpus, method="nope")


def test_semdedup_drops_planted_duplicates(spark):
    from steel_datafusion_spark.pipeline.similarity import semdedup

    # 3 well-separated base vectors, each duplicated with a higher id;
    # plus one singleton.  keep-first must drop exactly the higher-id copies.
    base = [
        (0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 1.0, 0.0]), (3, [0.5, 0.5, 0.5, 0.5]),
        (100, [1.0, 0.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0, 0.0]),
        (102, [0.0, 0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(base, "vec_id long, embedding array<double>")
    out = semdedup(df, k=3, iters=2, threshold=0.99)
    verdict = {r["vid"]: r["is_kept"] for r in out.collect()}
    assert len(verdict) == 7
    assert all(verdict[i] for i in (0, 1, 2, 3))
    assert not any(verdict[i] for i in (100, 101, 102))
    # duplicates land in the same cluster as their originals
    cl = {r["vid"]: r["cluster"] for r in out.collect()}
    assert cl[0] == cl[100] and cl[1] == cl[101] and cl[2] == cl[102]
