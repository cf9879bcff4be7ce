"""Pipeline-operator query catalog (dedup / similarity / text / multimodal).

Same contract as steel_datafusion_spark.queries: name -> (fn, oracle_sql).
The synthetic corpus has no natural duplicates (500/500 distinct texts at
sf0.01), so the dedup queries run on a deterministic augmented corpus —
docs with id<20 get a near-copy (id+1000000, ' steel spark dedup' appended)
— built identically in the Spark plan and the oracle CTE, so the operators
demonstrably find the planted near-dups.

Embeddings likewise get exact copies (id+1000000) of vec_id<10 for the
near-dup query.  All scoring is rounded to 6dp before ranking on both
engines (see pipeline/similarity.py determinism notes).
"""

from __future__ import annotations

import os as _os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.windows import window_spec
from ..sources.readers import load_tables
from . import text as TX
from .dedup import (
    SQL as DSQL, build_dedup_index, connected_components, dedup_against_index,
    exact_dedup, md5_int60, minhash_dedup_against, minhash_dedup_pairs,
    ngram_jaccard_pairs, shingles, simhash_from_hashes, simhash_pairs,
)
from .dedup import winnow_fingerprints
from .curation import decontaminate, mixture_resample, repetition_stats
from .multimodal import extract_features, frame_sample, make_media_table
from .similarity import (
    cosine_neardup_pairs, cosine_topk, hyperplanes, ivf_topk, kmeans, lsh_topk,
)
from .text import bpe_ish_token_count, sql_bpe_ish_token_count

_COS = ("(list_dot_product({a}, {b}) / "
        "sqrt(list_dot_product({a}, {a}) * list_dot_product({b}, {b})))")

_AUG_DOCS_SQL = """
corpus AS (
  SELECT doc_id, text, lang FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text || ' steel spark dedup', lang
  FROM documents WHERE doc_id < 20
)"""

_AUG_EMB_SQL = """
corpus AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, embedding::DOUBLE[], label
  FROM embeddings WHERE vec_id < 10
)"""


def _aug_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "text", "lang")
    var = d.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" steel spark dedup")).alias("text"),
        F.col("lang"),
    )
    return d.union(var)


def _aug_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["embeddings"]
    base = e.select("vec_id", F.col("embedding"), "label")
    var = e.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), F.col("embedding"), "label")
    return base.union(var)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

def q_text_stats(spark, sf_dir):
    """Per-doc text stats: tokens, punct/stopword ratios, langid, quality,
    fingerprint — one codegen'd projection, no shuffle."""
    d = load_tables(spark, sf_dir)["documents"]
    t = F.col("text")
    return d.select(
        "doc_id",
        TX.token_count(t).alias("n_tokens"),
        F.round(TX.punct_ratio(t), 6).alias("punct_ratio"),
        F.round(TX.stopword_ratio(t), 6).alias("stopword_ratio"),
        TX.lang_id(t).alias("lang_pred"),
        F.round(TX.quality_score(t), 6).alias("quality"),
        TX.fingerprint(t).alias("fingerprint"),
    )


_SQL_TEXT_STATS = f"""
SELECT doc_id,
  {TX.sql_token_count('text')} AS n_tokens,
  round({TX.sql_punct_ratio('text')}, 6) AS punct_ratio,
  round({TX.sql_stopword_ratio('text')}, 6) AS stopword_ratio,
  {TX.sql_lang_id('text')} AS lang_pred,
  round({TX.sql_quality_score('text')}, 6) AS quality,
  {TX.sql_fingerprint('text')} AS fingerprint
FROM documents
"""


def q_text_quality_by_source(spark, sf_dir):
    """Quality rollup per source: count, avg token count, english share."""
    d = load_tables(spark, sf_dir)["documents"]
    t = F.col("text")
    stats = d.select(
        "source",
        TX.token_count(t).alias("n_tokens"),
        TX.lang_id(t).alias("lang_pred"),
        TX.quality_score(t).alias("quality"),
    )
    return stats.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("n_tokens").alias("avg_tokens"),
        F.round(F.min("quality"), 6).alias("min_quality"),
        F.round(F.max("quality"), 6).alias("max_quality"),
        (F.sum(F.when(F.col("lang_pred") == "en", 1).otherwise(0)).cast("double")
         / F.count(F.lit(1))).alias("en_share"),
    )


_SQL_TEXT_QUALITY = f"""
WITH s AS (
  SELECT source, {TX.sql_token_count('text')} AS n_tokens,
         {TX.sql_lang_id('text')} AS lang_pred,
         {TX.sql_quality_score('text')} AS quality
  FROM documents)
SELECT source, COUNT(*) AS n_docs, AVG(n_tokens) AS avg_tokens,
  round(MIN(quality), 6) AS min_quality, round(MAX(quality), 6) AS max_quality,
  CAST(SUM(CASE WHEN lang_pred = 'en' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS en_share
FROM s GROUP BY source
"""


def q_pii_redact(spark, sf_dir):
    """PII scrub over a deterministically PII-planted corpus (the synthetic
    documents contain no natural PII): every 7th doc gets an email, a phone
    and an IPv4 appended; output = per-doc PII class counts + redacted
    length.  One codegen'd regexp projection, map-side, no shuffle."""
    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    planted = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" contact user"),
                     F.col("doc_id").cast("string"),
                     F.lit("@example.com or 555-123-4567 at 10.0.0.1"))
        ).otherwise(F.col("text")))
    t = F.col("text")
    return planted.select(
        "doc_id", *TX.pii_counts(t),
        F.length(TX.redact_pii(t)).alias("redacted_len"))


def _sql_pii_redact() -> str:
    counts = ", ".join(
        f"{TX.sql_pii_count('text', i)} AS n_{name}"
        for i, (name, _p, _r) in enumerate(TX.PII_PATTERNS))
    return f"""
WITH planted AS (
  SELECT doc_id,
    CASE WHEN doc_id % 7 = 0
      THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
           || '@example.com or 555-123-4567 at 10.0.0.1'
      ELSE text END AS text
  FROM documents)
SELECT doc_id, {counts},
  length({TX.sql_redact_pii('text')}) AS redacted_len
FROM planted
"""


def q_stratified_sample(spark, sf_dir):
    """Exactly 20 docs per lang stratum, selected by md5 order — the
    deterministic, engine-independent sample (pipeline/sampling.py).
    WindowGroupLimit prunes to 20 per partition before the one exchange."""
    from .sampling import stratified_sample_n
    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "lang")
    return stratified_sample_n(d, ["lang"], 20)


def _sql_stratified_sample() -> str:
    from .sampling import sql_hash_unit
    h = sql_hash_unit("doc_id", "strat")
    return f"""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY {h}, doc_id) AS rn
  FROM documents) t
WHERE rn <= 20
"""


def q_hash_split(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test assignment — a pure projection
    on md5 thresholds: a doc's split never changes when the corpus grows
    (the anti-leak property rand() splits lack).  No shuffle."""
    from .sampling import hash_split
    d = load_tables(spark, sf_dir)["documents"].select("doc_id")
    return hash_split(d, {"train": 0.8, "val": 0.1, "test": 0.1})


def q_domain_cap(spark, sf_dir):
    """C4-style per-domain cap: at most 15 docs per source, kept by md5
    preference with doc_id tiebreak (pipeline/sampling.py domain_cap) —
    deterministic under corpus growth, WindowGroupLimit-pruned shuffle."""
    from .sampling import domain_cap
    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "source")
    return domain_cap(d, 15)


def _sql_domain_cap() -> str:
    from .sampling import sql_hash_unit
    h = sql_hash_unit("doc_id", "domcap")
    return f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY {h}, doc_id) AS rn
  FROM documents) t
WHERE rn <= 15
"""


def q_shard_assignment(spark, sf_dir):
    """Deterministic training-order sharding (pipeline/sampling.py
    shard_assignment): shard = md5 mod 8 (map-side), pos = md5-order rank
    within the shard — byte-identical epochs across reruns, salt swap for
    fresh epochs, no global sort."""
    from .sampling import shard_assignment
    d = load_tables(spark, sf_dir)["documents"].select("doc_id")
    return shard_assignment(d, 8)


def _sql_shard_assignment() -> str:
    from .sampling import sql_hash_unit
    h = sql_hash_unit("doc_id", "shard")
    return f"""
SELECT doc_id, shard,
       row_number() OVER (PARTITION BY shard ORDER BY hu, doc_id) AS pos
FROM (SELECT doc_id, {h} AS hu, ({h} % 8)::INT AS shard FROM documents) t
"""


def _sql_hash_split() -> str:
    # identical integer thresholds via the same float accumulation
    from .sampling import _MOD, sql_hash_unit
    h = sql_hash_unit("doc_id", "split")
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    acc, whens = 0.0, []
    for name, wt in weights.items():
        acc += wt
        whens.append(f"WHEN {h} < {int(acc * _MOD)} THEN '{name}'")
    return f"""
SELECT doc_id, CASE {' '.join(whens)} ELSE 'test' END AS split
FROM documents
"""


def q_weighted_sample(spark, sf_dir):
    """Quality-weighted curation sample: each doc survives with probability
    = its (6dp-rounded — cross-engine pinned) quality score.  Deterministic
    md5 thresholding, map-side, zero shuffle."""
    from .sampling import weighted_sample
    d = load_tables(spark, sf_dir)["documents"]
    scored = d.select(
        "doc_id",
        F.round(TX.quality_score(F.col("text")), 6).alias("quality"))
    return weighted_sample(scored, "quality")


def _sql_weighted_sample() -> str:
    from .sampling import _MOD, sql_hash_unit
    h = sql_hash_unit("doc_id", "wsample")
    q = TX.sql_quality_score("text")
    return f"""
WITH scored AS (
  SELECT doc_id, round({q}, 6) AS quality FROM documents)
SELECT doc_id, quality FROM scored
WHERE {h} < CAST(floor(least(greatest(quality, 0.0), 1.0) * {float(_MOD)})
               AS BIGINT)
"""


def q_sequence_packing(spark, sf_dir):
    """Concat-then-chunk sequence packing (pipeline/packing.py): documents
    ordered by doc_id within lang, cut every 2048 BPE-ish tokens; per-bin
    doc count, tokens and straddle count.  One window + one agg — a single
    hash shuffle on lang."""
    from .packing import pack_bins_summary
    d = load_tables(spark, sf_dir)["documents"].select(
        "doc_id", "lang", TX.bpe_ish_token_count(F.col("text")).alias("n_tok"))
    return pack_bins_summary(d, ["lang"], "doc_id", "n_tok", budget=2048)


def _sql_sequence_packing(budget: int = 2048) -> str:
    ntok = TX.sql_bpe_ish_token_count("text")
    return f"""
WITH toks AS (
  SELECT doc_id, lang, greatest({ntok}, 1) AS t FROM documents),
cum AS (
  SELECT doc_id, lang, t,
    COALESCE(SUM(t) OVER (PARTITION BY lang ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
  FROM toks)
SELECT lang, CAST(floor(tokens_before / {budget}) AS BIGINT) AS bin_id,
  COUNT(*) AS n_docs,
  CAST(SUM(t) AS BIGINT) AS bin_tokens,
  CAST(SUM(CASE WHEN floor((tokens_before + t - 1) / {budget})
                 > floor(tokens_before / {budget}) THEN 1 ELSE 0 END) AS BIGINT)
    AS n_straddle
FROM cum GROUP BY lang, bin_id
"""


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    """Exact dedup over the augmented corpus: every doc → its keeper."""
    return exact_dedup(_aug_docs(spark, sf_dir))


_SQL_DEDUP_EXACT = f"""
WITH {_AUG_DOCS_SQL},
fp AS (SELECT doc_id, {TX.sql_fingerprint('text')} AS f FROM corpus),
keep AS (SELECT f, MIN(doc_id) AS keeper, COUNT(*) AS n_copies FROM fp GROUP BY f)
SELECT fp.doc_id, keep.keeper, keep.n_copies,
       fp.doc_id <> keep.keeper AS is_dup
FROM fp JOIN keep ON fp.f = keep.f
"""


def q_dedup_minhash(spark, sf_dir):
    """MinHash(32) + LSH(8×4) candidates, verified with exact shingle
    Jaccard ≥ 0.5 — finds the 20 planted near-copies."""
    return minhash_dedup_pairs(_aug_docs(spark, sf_dir), threshold=0.5)


def _sql_dedup_minhash(max_bucket: int = 1000) -> str:
    """Mirrors minhash_dedup_pairs INCLUDING the band-bucket occupancy cap:
    buckets with > max_bucket members contribute star edges (bucket-min,
    member) instead of all pairs (pipeline/dedup.py _candidates)."""
    hs = DSQL.hashed_shingles("text")
    sig_items = ",\n    ".join(DSQL.minhash_sig_items("hs", 32))
    return f"""
WITH {_AUG_DOCS_SQL},
shing AS (SELECT doc_id, {hs} AS hs FROM corpus),
sigs AS (SELECT doc_id, [{sig_items}] AS sig FROM shing),
bands AS (
  SELECT doc_id, b.band_idx,
         md5(array_to_string(list_slice(sig, b.band_idx*4+1, b.band_idx*4+4), ',')) AS band_hash
  FROM sigs, (SELECT unnest(generate_series(0, 7)) AS band_idx) b),
hot AS (
  SELECT band_idx, band_hash, MIN(doc_id) AS rep
  FROM bands GROUP BY band_idx, band_hash
  HAVING COUNT(*) > {max_bucket}),
normal AS (
  SELECT b.* FROM bands b ANTI JOIN hot h
    ON b.band_idx = h.band_idx AND b.band_hash = h.band_hash),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM normal a JOIN normal b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
  UNION
  SELECT DISTINCT h.rep AS doc_a, b.doc_id AS doc_b
  FROM bands b JOIN hot h
    ON b.band_idx = h.band_idx AND b.band_hash = h.band_hash
  WHERE b.doc_id <> h.rep),
j AS (
  SELECT p.doc_a, p.doc_b,
    round(CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE) /
          (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))), 6) AS jaccard
  FROM pairs p
  JOIN shing sa ON sa.doc_id = p.doc_a
  JOIN shing sb ON sb.doc_id = p.doc_b)
SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.5
"""


def q_dedup_incremental(spark, sf_dir):
    """Continuous-ingest dedup: the planted near-copy batch (docs <20,
    ' steel spark dedup' appended, ids +1000000) checked against the full
    corpus via the asymmetric band-bucket join (pipeline/dedup.py
    minhash_dedup_against) — the corpus banding is the reusable index."""
    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    batch = d.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" steel spark dedup")).alias("text"))
    return minhash_dedup_against(batch, d, threshold=0.5)


def _sql_dedup_incremental(max_bucket: int = 1000) -> str:
    """Mirrors minhash_dedup_against INCLUDING the corpus hot-bucket guard:
    batch bands hitting a corpus bucket with > max_bucket members probe
    only the bucket representative (pipeline/dedup.py
    _match_batch_to_corpus)."""
    hs = DSQL.hashed_shingles("text")
    sig_items = ",\n    ".join(DSQL.minhash_sig_items("hs", 32))
    return f"""
WITH batch AS (
  SELECT doc_id + 1000000 AS doc_id, text || ' steel spark dedup' AS text
  FROM documents WHERE doc_id < 20),
shb AS (SELECT doc_id, {hs} AS hs FROM batch),
shc AS (SELECT doc_id, {hs} AS hs FROM documents),
sigb AS (SELECT doc_id, [{sig_items}] AS sig FROM shb),
sigc AS (SELECT doc_id, [{sig_items}] AS sig FROM shc),
bandsb AS (
  SELECT doc_id, b.band_idx,
         md5(array_to_string(list_slice(sig, b.band_idx*4+1, b.band_idx*4+4), ',')) AS band_hash
  FROM sigb, (SELECT unnest(generate_series(0, 7)) AS band_idx) b),
bandsc AS (
  SELECT doc_id, b.band_idx,
         md5(array_to_string(list_slice(sig, b.band_idx*4+1, b.band_idx*4+4), ',')) AS band_hash
  FROM sigc, (SELECT unnest(generate_series(0, 7)) AS band_idx) b),
hotc AS (
  SELECT band_idx, band_hash, MIN(doc_id) AS rep
  FROM bandsc GROUP BY band_idx, band_hash
  HAVING COUNT(*) > {max_bucket}),
cand AS (
  SELECT DISTINCT a.doc_id AS batch_id, c.doc_id AS corpus_id
  FROM (SELECT b.* FROM bandsb b ANTI JOIN hotc h
          ON b.band_idx = h.band_idx AND b.band_hash = h.band_hash) a
  JOIN bandsc c
    ON a.band_idx = c.band_idx AND a.band_hash = c.band_hash
  UNION
  SELECT DISTINCT b.doc_id AS batch_id, h.rep AS corpus_id
  FROM bandsb b JOIN hotc h
    ON b.band_idx = h.band_idx AND b.band_hash = h.band_hash),
j AS (
  SELECT p.batch_id, p.corpus_id,
    round(CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE) /
          (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))), 6) AS jaccard
  FROM cand p
  JOIN shb sa ON sa.doc_id = p.batch_id
  JOIN shc sb ON sb.doc_id = p.corpus_id)
SELECT batch_id, corpus_id, jaccard FROM j WHERE jaccard >= 0.5
"""


def q_dedup_simhash_fingerprints(spark, sf_dir):
    """48-bit shingle-SimHash fingerprints for docs with id<100 — validates
    the full bit-derivation pipeline value-for-value across engines."""
    d = load_tables(spark, sf_dir)["documents"].filter(F.col("doc_id") < 100)
    hs = d.select("doc_id",
                  F.transform(shingles(F.col("text")), md5_int60).alias("hs"))
    return hs.select("doc_id", simhash_from_hashes("hs").alias("simhash"))


def _sql_simhash_fps() -> str:
    return f"""
WITH hsrc AS (SELECT doc_id, {DSQL.hashed_shingles('text')} AS hs
              FROM documents WHERE doc_id < 100)
SELECT doc_id, {DSQL.simhash_terms('hs')} AS simhash FROM hsrc
"""


def q_dedup_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs (hamming ≤ 10) via 4×12-bit chunk blocking on
    the augmented corpus."""
    return simhash_pairs(_aug_docs(spark, sf_dir), max_hamming=10)


def _sql_simhash_pairs() -> str:
    return f"""
WITH {_AUG_DOCS_SQL},
hsrc AS (SELECT doc_id, {DSQL.hashed_shingles('text')} AS hs FROM corpus),
sh AS (SELECT doc_id, {DSQL.simhash_terms('hs')} AS sh FROM hsrc),
chunks AS (
  SELECT doc_id, sh, c.chunk_idx, (sh >> (12 * c.chunk_idx)) & 4095 AS chunk_val
  FROM sh, (SELECT unnest(generate_series(0, 3)) AS chunk_idx) c),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         bit_count(xor(a.sh, b.sh)) AS hamming
  FROM chunks a JOIN chunks b
    ON a.chunk_idx = b.chunk_idx AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 10
"""


def q_dedup_clusters(spark, sf_dir):
    """Cluster resolution over SimHash near-dup pairs: connected components
    (iterative min-label propagation, pipeline/dedup.py) turn the pair list
    into per-doc (cluster_id = min doc_id of component, cluster_size) — the
    keeper-selection step between pair generation and the actual drop."""
    pairs = simhash_pairs(_aug_docs(spark, sf_dir), max_hamming=10)
    cc = connected_components(pairs)
    sizes = cc.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    return cc.join(sizes, "cluster_id").select(
        "doc_id", "cluster_id", "cluster_size")


def _sql_dedup_clusters() -> str:
    """Transitive closure via recursive CTE (exact fixpoint — the oracle for
    the Spark loop's converged labels), over the same simhash pair CTEs."""
    return f"""
WITH RECURSIVE {_AUG_DOCS_SQL},
hsrc AS (SELECT doc_id, {DSQL.hashed_shingles('text')} AS hs FROM corpus),
sh AS (SELECT doc_id, {DSQL.simhash_terms('hs')} AS sh FROM hsrc),
chunks AS (
  SELECT doc_id, sh, c.chunk_idx, (sh >> (12 * c.chunk_idx)) & 4095 AS chunk_val
  FROM sh, (SELECT unnest(generate_series(0, 3)) AS chunk_idx) c),
p AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM chunks a JOIN chunks b
    ON a.chunk_idx = b.chunk_idx AND a.chunk_val = b.chunk_val
   AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.sh, b.sh)) <= 10),
edges AS (SELECT doc_a AS a, doc_b AS b FROM p
          UNION SELECT doc_b, doc_a FROM p),
reach AS (SELECT a, b FROM edges
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
lab AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
        FROM reach GROUP BY a),
sizes AS (SELECT cluster_id, count(*) AS cluster_size
          FROM lab GROUP BY cluster_id)
SELECT l.doc_id, l.cluster_id, s.cluster_size
FROM lab l JOIN sizes s USING (cluster_id)
"""


def q_dedup_apply(spark, sf_dir):
    """End-to-end dedup application (pipeline/dedup.py dedup_corpus):
    simhash pairs → two-phase connected components → representative
    filter.  The output is the actually-deduplicated corpus — one doc per
    near-dup class plus all singletons — closing the loop the pair/cluster
    gates leave open.  The drop list is broadcast; the corpus never
    shuffles."""
    from .dedup import dedup_corpus

    return dedup_corpus(_aug_docs(spark, sf_dir),
                        max_hamming=10).select("doc_id", "lang")


def _sql_dedup_apply() -> str:
    """Recursive-CTE transitive closure (as _sql_dedup_clusters) + anti-join:
    survivors are docs that are their own component minimum (or in no
    pair)."""
    return f"""
WITH RECURSIVE {_AUG_DOCS_SQL},
hsrc AS (SELECT doc_id, {DSQL.hashed_shingles('text')} AS hs FROM corpus),
sh AS (SELECT doc_id, {DSQL.simhash_terms('hs')} AS sh FROM hsrc),
chunks AS (
  SELECT doc_id, sh, c.chunk_idx, (sh >> (12 * c.chunk_idx)) & 4095 AS chunk_val
  FROM sh, (SELECT unnest(generate_series(0, 3)) AS chunk_idx) c),
p AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM chunks a JOIN chunks b
    ON a.chunk_idx = b.chunk_idx AND a.chunk_val = b.chunk_val
   AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.sh, b.sh)) <= 10),
edges AS (SELECT doc_a AS a, doc_b AS b FROM p
          UNION SELECT doc_b, doc_a FROM p),
reach AS (SELECT a, b FROM edges
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
lab AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
        FROM reach GROUP BY a),
dropped AS (SELECT doc_id FROM lab WHERE doc_id <> cluster_id)
SELECT c.doc_id, c.lang FROM corpus c
WHERE c.doc_id NOT IN (SELECT doc_id FROM dropped)
"""


def q_dedup_keep_best(spark, sf_dir):
    """Curation-grade dedup application (pipeline/dedup.py
    keep_best_representatives): same simhash pairs → two-phase CC as
    dedup_apply, but each cluster keeps its LONGEST member (char length,
    id tie-break) instead of the min id — the real canonical-document
    choice (near-dup classes hold one full doc and several truncated
    variants).  Clusters are duplicate-proportional, so scoring, the
    per-cluster argmax window, and the drop list all ride broadcasts;
    the corpus never shuffles."""
    from .dedup import (connected_components, keep_best_representatives,
                        simhash_pairs)

    docs = _aug_docs(spark, sf_dir)
    pairs = simhash_pairs(docs, max_hamming=10)
    cc = connected_components(pairs, algorithm="two-phase")
    return keep_best_representatives(docs, cc, F.length("text")) \
        .select("doc_id", F.length("text").alias("n_chars"))


def _sql_dedup_keep_best() -> str:
    """The _sql_dedup_apply transitive closure with an argmax-by-length
    keep rule instead of min-id."""
    return f"""
WITH RECURSIVE {_AUG_DOCS_SQL},
hsrc AS (SELECT doc_id, {DSQL.hashed_shingles('text')} AS hs FROM corpus),
sh AS (SELECT doc_id, {DSQL.simhash_terms('hs')} AS sh FROM hsrc),
chunks AS (
  SELECT doc_id, sh, c.chunk_idx, (sh >> (12 * c.chunk_idx)) & 4095 AS chunk_val
  FROM sh, (SELECT unnest(generate_series(0, 3)) AS chunk_idx) c),
p AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM chunks a JOIN chunks b
    ON a.chunk_idx = b.chunk_idx AND a.chunk_val = b.chunk_val
   AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.sh, b.sh)) <= 10),
edges AS (SELECT doc_a AS a, doc_b AS b FROM p
          UNION SELECT doc_b, doc_a FROM p),
reach AS (SELECT a, b FROM edges
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
lab AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
        FROM reach GROUP BY a),
scored AS (
  SELECT l.doc_id, l.cluster_id, length(c.text) AS n_chars
  FROM lab l JOIN corpus c USING (doc_id)),
keep1 AS (
  SELECT doc_id FROM (
    SELECT doc_id, row_number() OVER (PARTITION BY cluster_id
      ORDER BY n_chars DESC, doc_id ASC) AS rn FROM scored)
  WHERE rn = 1),
dropped AS (
  SELECT doc_id FROM lab
  WHERE doc_id NOT IN (SELECT doc_id FROM keep1))
SELECT c.doc_id, length(c.text)::INT AS n_chars FROM corpus c
WHERE c.doc_id NOT IN (SELECT doc_id FROM dropped)
"""


def q_dedup_clusters_twophase(spark, sf_dir):
    """Same cluster resolution as dedup_clusters, but via the alternating
    large-star/small-star algorithm (pipeline/dedup.py, O(log n) rounds
    regardless of component diameter — the 100 TB choice for long-chain
    graphs).  Shares dedup_clusters' recursive-CTE transitive-closure
    oracle: both algorithms must reach the identical fixpoint labels."""
    pairs = simhash_pairs(_aug_docs(spark, sf_dir), max_hamming=10)
    cc = connected_components(pairs, algorithm="two-phase")
    sizes = cc.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    return cc.join(sizes, "cluster_id").select(
        "doc_id", "cluster_id", "cluster_size")


# Session-scoped index builds, keyed by (applicationId, sf_dir): the index is
# a one-time materialization that real pipelines amortize across increments,
# so the gate should time the PROBE, not rebuild two managed tables per bench
# rep (which also races concurrent sessions on the shared warehouse dir).
_DEDUP_INDEX_BUILT: set = set()


def _ensure_dedup_index(spark, sf_dir, name="gate_dedup_idx"):
    # the table NAME is app-scoped too: two concurrent Spark applications
    # (e.g. the test suite and a bench run) share the warehouse directory,
    # and an un-scoped name lets one app's rebuild delete parquet parts out
    # from under the other's scan mid-query (observed as FAILED_READ_FILE)
    app = spark.sparkContext.applicationId.replace("-", "_").replace(".", "_")
    scoped = f"{name}_{app[-12:]}"
    key = (spark.sparkContext.applicationId, _os.path.abspath(sf_dir), scoped)
    if key not in _DEDUP_INDEX_BUILT:
        d = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
        build_dedup_index(d, scoped)
        _DEDUP_INDEX_BUILT.add(key)
    return scoped


def q_dedup_index_probe(spark, sf_dir):
    """Incremental dedup through the PERSISTED index: build_dedup_index
    materializes the corpus banding + shingles as bucketed managed tables
    ONCE per (session, sf_dir) — the amortized shape — and
    dedup_against_index bands only the batch and broadcast-probes them.
    Same results contract (and oracle) as dedup_incremental, but the probe
    plan must never rescan the raw corpus (tests/test_dedup_index.py asserts
    it; this gate hash-checks the values end-to-end)."""
    scoped = _ensure_dedup_index(spark, sf_dir)
    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    batch = d.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" steel spark dedup")).alias("text"))
    return dedup_against_index(batch, scoped, threshold=0.5)


def q_dedup_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard ≥ 0.5 within lang blocks (augmented corpus)."""
    return ngram_jaccard_pairs(_aug_docs(spark, sf_dir), block_cols=["lang"],
                               threshold=0.5)


def _sql_ngram_jaccard() -> str:
    hs = DSQL.hashed_shingles("text")
    return f"""
WITH {_AUG_DOCS_SQL},
shing AS (SELECT doc_id, lang, {hs} AS hs FROM corpus),
j AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
    round(CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE) /
          (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))), 6) AS jaccard
  FROM shing a JOIN shing b ON a.lang = b.lang AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.5
"""


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

def q_similarity_topk(spark, sf_dir):
    """Exact brute-force cosine top-10 for query vectors (vec_id < 5)."""
    e = load_tables(spark, sf_dir)["embeddings"]
    q = e.filter(F.col("vec_id") < 5)
    return cosine_topk(q, e, k=10)


_SQL_SIM_TOPK = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round({_COS.format(a='q.qv', b='e.v')}, 6) AS score
  FROM q, e WHERE q.query_id <> e.vec_id)
SELECT query_id, neighbor_id, score, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY score DESC, neighbor_id) AS rank
  FROM scored) t WHERE rank <= 10
"""


def q_similarity_ivf(spark, sf_dir):
    """IVF-bucketed ANN top-10 (nlist=10 centroids — a FIXED count
    independent of corpus size, stride ceil(N/10) from one cheap count;
    nprobe=2).  The oracle derives the same stride from count(*)."""
    e = load_tables(spark, sf_dir)["embeddings"]
    q = e.filter(F.col("vec_id") < 5)
    return ivf_topk(q, e, k=10, nprobe=2, nlist=10)


def q_ann_recall(spark, sf_dir):
    """ANN QUALITY measurement (recall@10 of the IVF path against exact
    brute force, per query vector): the report every approximate index
    owes its operator — IVF/LSH trade recall for the bucketed plan, and
    this gate makes the trade a hash-checked NUMBER instead of a claim.
    Both paths share one scan lineage; the compare is a tiny
    (queries × k) join.  At 100 TB you run this on a sampled query set:
    cost = one brute-force pass over the sample, amortized across every
    future index deployment."""
    e = load_tables(spark, sf_dir)["embeddings"]
    q = e.filter(F.col("vec_id") < 5)
    bf = cosine_topk(q, e, k=10).select("query_id", "neighbor_id")
    approx = ivf_topk(q, e, k=10, nprobe=2, nlist=10) \
        .select("query_id", "neighbor_id")
    n_exact = bf.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"))
    n_hit = (approx.join(bf, ["query_id", "neighbor_id"])
             .groupBy("query_id")
             .agg(F.count(F.lit(1)).cast("long").alias("n_hit")))
    return (n_exact.join(n_hit, "query_id", "left")
            .select("query_id", "n_exact",
                    F.coalesce("n_hit", F.lit(0)).cast("long")
                    .alias("n_hit"))
            .withColumn("recall",
                        F.round(F.col("n_hit") / F.col("n_exact"), 6))
            .orderBy("query_id"))


_SQL_SIM_IVF = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS centroid_id, v AS centv FROM e
         WHERE vec_id % (SELECT (count(*) + 9) // 10 FROM e) = 0),
assign AS (
  SELECT vid, v, centroid_id FROM (
    SELECT e.vec_id AS vid, e.v, c.centroid_id,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY round({_COS.format(a='e.v', b='c.centv')}, 6) DESC, c.centroid_id) AS r
    FROM e, cent c) t WHERE r = 1),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
probes AS (
  SELECT query_id, qv, centroid_id FROM (
    SELECT q.query_id, q.qv, c.centroid_id,
      row_number() OVER (PARTITION BY q.query_id
        ORDER BY round({_COS.format(a='q.qv', b='c.centv')}, 6) DESC, c.centroid_id) AS r
    FROM q, cent c) t WHERE r <= 2),
scored AS (
  SELECT p.query_id, a.vid AS neighbor_id,
         round({_COS.format(a='p.qv', b='a.v')}, 6) AS score
  FROM probes p JOIN assign a USING (centroid_id)
  WHERE p.query_id <> a.vid)
SELECT query_id, neighbor_id, score, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY score DESC, neighbor_id) AS rank
  FROM scored) t WHERE rank <= 10
"""


def q_ann_index_probe(spark, sf_dir):
    """PERSISTED dense-vector index probe (pipeline/similarity.py
    build_ann_index + ivf_topk_index): the index — nlist=10 centroids +
    the corpus assignment stored BUCKETED on centroid_id — is built once
    as managed tables, then the query batch probes it WITHOUT
    re-assigning or re-scanning the corpus source (the build-once /
    probe-many path build_dedup_index gives MinHash, now for the dense
    family).  The probe plan shuffles only the query side: the bucketed
    assignment scan has no Exchange above it (plan-asserted in
    tests/test_round11_ops.py).  Same nlist/nprobe as similarity_ivf, so
    the stored-index path must reproduce the inline path bit-for-bit —
    that is exactly what this gate hashes."""
    from .similarity import build_ann_index, ivf_topk_index

    e = load_tables(spark, sf_dir)["embeddings"]
    build_ann_index(e, "ann_gate_idx", nlist=10)
    q = e.filter(F.col("vec_id") < 5)
    return ivf_topk_index(q, "ann_gate_idx", k=10, nprobe=2)


def q_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs (≥0.99) on the duplicate-augmented
    corpus: LSH-bucketed candidates (8 planes + hamming-1 multiprobe,
    same-label conjunct) verified with exact cosine — the hash-partitioned
    bucket join that replaced r1's blocked all-pairs scale-killer."""
    return cosine_neardup_pairs(_aug_emb(spark, sf_dir), threshold=0.99,
                                n_planes=8, multiprobe=True)


def _sql_emb_neardup(n_planes: int = 8, threshold: float = 0.99) -> str:
    """Oracle mirrors the LSH candidate generation exactly (same md5-derived
    hyperplane literals, same one-sided hamming-1 probes), then the same
    exact-cosine verify — so the comparison checks the bucketed algorithm,
    not just the planted duplicates."""
    planes = hyperplanes(n_planes)
    terms = []
    for p, row in enumerate(planes):
        arr = "[" + ", ".join(repr(x) for x in row) + "]::DOUBLE[]"
        terms.append(
            f"CASE WHEN list_dot_product(v, {arr}) > 0 "
            f"THEN {1 << p}::BIGINT ELSE 0::BIGINT END")
    bucket = " + ".join(terms)
    shifts = "[" + ", ".join(str(s)
                             for s in [0] + [1 << i for i in range(n_planes)]) + "]"
    return f"""
WITH {_AUG_EMB_SQL},
b AS (SELECT vec_id, v, label, {bucket} AS bucket FROM corpus),
probes AS (SELECT vec_id, v, label, xor(bucket, sh.s) AS probe
           FROM b, (SELECT unnest({shifts}) AS s) sh)
SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
       round({_COS.format(a='a.v', b='c.v')}, 6) AS cos_sim
FROM probes a JOIN b c
  ON a.probe = c.bucket AND a.label = c.label AND a.vec_id < c.vec_id
WHERE round({_COS.format(a='a.v', b='c.v')}, 6) >= {threshold}
"""


def q_embedding_dedup(spark, sf_dir):
    """End-to-end SEMANTIC dedup over embeddings: LSH near-dup pairs
    (cosine >= 0.99, same plan as embedding_neardup) -> connected
    components -> per-vector cluster id/size plus keeper flag (min vec_id
    per component).  The composition every curation pipeline runs between
    pair generation and the drop; the oracle closes the same pair set with
    a recursive CTE."""
    pairs = cosine_neardup_pairs(_aug_emb(spark, sf_dir), threshold=0.99,
                                 n_planes=8, multiprobe=True)
    cc = connected_components(pairs, src="vec_a", dst="vec_b")
    sizes = cc.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    return (cc.join(sizes, "cluster_id")
            .select(F.col("doc_id").alias("vec_id"), "cluster_id",
                    "cluster_size",
                    (F.col("doc_id") == F.col("cluster_id"))
                    .alias("is_keeper")))


def _sql_embedding_dedup() -> str:
    """Recursive-CTE transitive closure over the LSH-verified pair set
    (the same candidate+verify SQL as _sql_emb_neardup)."""
    inner = _sql_emb_neardup(n_planes=8, threshold=0.99)
    # reuse the pair query as a CTE body: strip its WITH and wrap
    body = inner.strip()
    assert body.startswith("WITH")
    return f"""
WITH RECURSIVE {body[len('WITH '):].rsplit('SELECT a.vec_id', 1)[0].rstrip()},
p AS (SELECT a.vec_id{body.rsplit('SELECT a.vec_id', 1)[1]}),
edges AS (SELECT vec_a AS a, vec_b AS b FROM p
          UNION SELECT vec_b, vec_a FROM p),
reach AS (SELECT a, b FROM edges
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
lab AS (SELECT a AS vec_id, least(a, min(b)) AS cluster_id
        FROM reach GROUP BY a),
sizes AS (SELECT cluster_id, count(*) AS cluster_size
          FROM lab GROUP BY cluster_id)
SELECT l.vec_id, l.cluster_id, s.cluster_size,
       l.vec_id = l.cluster_id AS is_keeper
FROM lab l JOIN sizes s USING (cluster_id)
"""


def q_embedding_neardup_banded(spark, sf_dir):
    """Banded variant of embedding_neardup (8 planes × 4 bands): a pair is
    a candidate if ANY 2-bit band code matches — the high-recall knob for
    wider-angle near-dups (recall ≈ 0.999 at cosine 0.97 vs ~0.92 for
    hamming-1 multiprobe; see pipeline/similarity.py)."""
    return cosine_neardup_pairs(_aug_emb(spark, sf_dir), threshold=0.99,
                                n_planes=8, bands=4)


def _sql_emb_neardup_banded(n_planes: int = 8, bands: int = 4,
                            threshold: float = 0.99) -> str:
    """Oracle mirrors the banded candidate generation: same hyperplane
    bucket code, band codes = bit slices, candidates deduped on ids before
    the exact-cosine verify."""
    planes = hyperplanes(n_planes)
    terms = []
    for p, row in enumerate(planes):
        arr = "[" + ", ".join(repr(x) for x in row) + "]::DOUBLE[]"
        terms.append(
            f"CASE WHEN list_dot_product(v, {arr}) > 0 "
            f"THEN {1 << p}::BIGINT ELSE 0::BIGINT END")
    bucket = " + ".join(terms)
    width = n_planes // bands
    mask = (1 << width) - 1
    return f"""
WITH {_AUG_EMB_SQL},
b AS (SELECT vec_id, v, label, {bucket} AS bucket FROM corpus),
banded AS (
  SELECT vec_id, label, s.bi, (bucket >> (s.bi * {width})) & {mask} AS bc
  FROM b, (SELECT unnest(generate_series(0, {bands - 1})) AS bi) s),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, c.vec_id AS vec_b
  FROM banded a JOIN banded c
    ON a.bi = c.bi AND a.bc = c.bc AND a.label = c.label
   AND a.vec_id < c.vec_id)
SELECT p.vec_a, p.vec_b,
       round({_COS.format(a='va.v', b='vb.v')}, 6) AS cos_sim
FROM cand p
JOIN b va ON va.vec_id = p.vec_a
JOIN b vb ON vb.vec_id = p.vec_b
WHERE round({_COS.format(a='va.v', b='vb.v')}, 6) >= {threshold}
"""


def q_fuzzy_match(spark, sf_dir):
    """Typo-tolerant record linkage (pipeline/fuzzy.py): 40-char document
    prefixes form the catalog; the probes are those prefixes for docs
    id<30 with character 11 replaced by 'z' (ids +4000000).  Char-3-gram
    blocked candidates verified with levenshtein ≤ 2 — each probe must
    link back to its source row (dist ≤ 1), plus any natural near-misses.
    Blocking is pigeonhole-exact here: 38 grams ≫ max_dist·n = 6."""
    from .fuzzy import fuzzy_match

    d = load_tables(spark, sf_dir)["documents"]
    catalog = d.select(F.col("doc_id").alias("cat_id"),
                       F.substring("text", 1, 40).alias("title"))
    p = F.substring("text", 1, 40)
    probes = d.filter(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 4000000).alias("probe_id"),
        F.concat(F.substring(p, 1, 10), F.lit("z"),
                 F.substring(p, 12, 29)).alias("q"))
    return fuzzy_match(probes, catalog, "probe_id", "q", "cat_id", "title",
                       max_dist=2)


def _sql_fuzzy_match(n: int = 3, max_dist: int = 2) -> str:
    from .fuzzy import SQL_CHAR_NGRAM_HASHES

    def grams(expr: str) -> str:
        return SQL_CHAR_NGRAM_HASHES.format(s=expr, n=n, nm1=n - 1)

    return f"""
WITH catalog AS (
  SELECT doc_id AS cat_id, substr(text, 1, 40) AS title FROM documents),
probes AS (
  SELECT doc_id + 4000000 AS probe_id,
         substr(substr(text, 1, 40), 1, 10) || 'z' ||
         substr(substr(text, 1, 40), 12, 29) AS q
  FROM documents WHERE doc_id < 30),
lx AS (SELECT probe_id, q, unnest({grams('q')}) AS h FROM probes),
rx AS (SELECT cat_id, title, unnest({grams('title')}) AS h FROM catalog),
cand AS (SELECT DISTINCT probe_id, q, cat_id, title
         FROM lx JOIN rx USING (h))
SELECT probe_id AS left_id, cat_id AS right_id,
       levenshtein(q, title) AS dist
FROM cand WHERE levenshtein(q, title) <= {max_dist}
"""


# ---------------------------------------------------------------------------
# Curation (repetition quality / decontamination / mixture)
# ---------------------------------------------------------------------------

def q_repetition_quality(spark, sf_dir):
    """Gopher-style repetition filter over documents plus 10 planted
    boilerplate docs (one 2-gram repeated 30×, ids +2000000): per-doc
    top-2-gram coverage and duplicate-5-gram fraction with keep flags —
    the planted docs must fail both thresholds."""
    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    planted = d.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.expr("repeat('spark steel ', 30)").alias("text"))
    return repetition_stats(d.unionByName(planted))


def _sql_repetition_quality(top_n: int = 2, dup_n: int = 5) -> str:
    toks = DSQL.tokens("text")

    def pos_grams(n: int) -> str:
        return (f"CASE WHEN len(toks) < {n} THEN []::VARCHAR[] "
                f"ELSE list_transform(generate_series(1, len(toks) - {n - 1}),"
                f" i -> array_to_string(list_slice(toks, i, i + {n - 1}), ' '))"
                f" END")

    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000, repeat('spark steel ', 30)
  FROM documents WHERE doc_id < 10),
tk AS (SELECT doc_id, {toks} AS toks FROM corpus),
stats AS (SELECT doc_id, len(toks) AS n_tokens FROM tk),
tg AS (
  SELECT doc_id, max(c) AS top_c FROM (
    SELECT doc_id, g, count(*) AS c
    FROM (SELECT doc_id, unnest({pos_grams(top_n)}) AS g FROM tk)
    GROUP BY doc_id, g)
  GROUP BY doc_id),
dg AS (
  SELECT doc_id, count(*) AS tot, count(DISTINCT g) AS dis
  FROM (SELECT doc_id, unnest({pos_grams(dup_n)}) AS g FROM tk)
  GROUP BY doc_id)
SELECT s.doc_id, s.n_tokens,
  round(coalesce(top_c * {top_n} / s.n_tokens, 0.0), 6) AS top{top_n}gram_frac,
  round(coalesce((tot - dis) * 1.0 / tot, 0.0), 6) AS dup{dup_n}gram_frac,
  (round(coalesce(top_c * {top_n} / s.n_tokens, 0.0), 6) <= 0.20
   AND round(coalesce((tot - dis) * 1.0 / tot, 0.0), 6) <= 0.30) AS keep
FROM stats s LEFT JOIN tg USING (doc_id) LEFT JOIN dg USING (doc_id)
"""


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: eval set = docs with doc_id % 50 == 3
    (which ARE in the corpus, so each is fully self-contaminated); every
    corpus doc gets its shared-5-gram count and a contaminated flag at
    min_hits=3."""
    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    ev = d.filter(F.col("doc_id") % 50 == 3)
    return decontaminate(d, ev, n=5, min_hits=3)


def _sql_decontaminate(n: int = 5, min_hits: int = 3) -> str:
    hs = DSQL.hashed_shingles("text", n)
    return f"""
WITH ev AS (
  SELECT DISTINCT unnest({hs}) AS h
  FROM documents WHERE doc_id % 50 = 3),
ex AS (SELECT doc_id, unnest({hs}) AS h FROM documents),
hits AS (SELECT ex.doc_id, count(*) AS n_hits
         FROM ex JOIN ev USING (h) GROUP BY ex.doc_id)
SELECT d.doc_id, coalesce(n_hits, 0) AS n_hits,
       coalesce(n_hits, 0) >= {min_hits} AS contaminated
FROM documents d LEFT JOIN hits USING (doc_id)
"""


_MIX_TARGETS = {"src0": 0.4, "src1": 0.3, "src2": 0.2,
                "src3": 0.05, "src4": 0.05}


def q_mixture_resample(spark, sf_dir):
    """Domain-mixture resampling toward a skewed 5-source target (sources
    outside the target get rate 0): deterministic md5 coin, rates derived
    from observed counts inside the plan.  Returns the surviving
    (doc_id, source) rows — hash-checked, so the oracle must pick the
    exact same rows."""
    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "source")
    return mixture_resample(d, _MIX_TARGETS).select("doc_id", "source")


def q_funnel(spark, sf_dir):
    """Ordered conversion funnel (operators/funnel.py): users entering
    view -> click -> purchase, each step anchored at the user's earliest
    qualifying time (an event can't satisfy step i before the user's
    step i-1 entry).  One filtered min-aggregate per step on the user
    key — no per-user event sorting, no windows over the raw stream."""
    from ..operators.funnel import funnel_counts

    ev = load_tables(spark, sf_dir)["events"]
    return funnel_counts(ev, ["view", "click", "purchase"],
                         within="2 hours")


_SQL_FUNNEL = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id),
s2 AS (
  SELECT s1.user_id, t1,
         min(CASE WHEN e.ts >= t1
                   AND e.ts <= t1 + INTERVAL 2 HOUR THEN e.ts END) AS t2
  FROM s1 LEFT JOIN events e
    ON e.user_id = s1.user_id AND e.event_type = 'click'
  GROUP BY s1.user_id, t1),
s3 AS (
  SELECT s2.user_id, t1, t2,
         min(CASE WHEN e.ts >= t2
                   AND e.ts <= t1 + INTERVAL 2 HOUR THEN e.ts END) AS t3
  FROM s2 LEFT JOIN events e
    ON e.user_id = s2.user_id AND e.event_type = 'purchase'
  GROUP BY s2.user_id, t1, t2),
c AS (SELECT count(t1) AS n1, count(t2) AS n2, count(t3) AS n3 FROM s3)
SELECT 1 AS step_idx, 'view' AS step, n1::BIGINT AS n_users,
       round(n1 / CAST(n1 AS DOUBLE), 6) AS conversion_from_first FROM c
UNION ALL
SELECT 2, 'click', n2::BIGINT, round(n2 / CAST(n1 AS DOUBLE), 6) FROM c
UNION ALL
SELECT 3, 'purchase', n3::BIGINT, round(n3 / CAST(n1 AS DOUBLE), 6) FROM c
"""


def q_event_transitions(spark, sf_dir):
    """First-order event-type transition counts (Markov sequence stats):
    per user, each event paired with the next by (ts, event_id) order via
    one lead() window, rolled up to (from_type, to_type, n, share).  The
    sequence-statistics shape behind session modeling; one user-key
    exchange, one rollup."""
    ev = load_tables(spark, sf_dir)["events"]
    w = window_spec(partition_by=["user_id"],
                    order_by=[F.col("ts").asc(), F.col("event_id").asc()])
    nxt = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"))
    pairs = nxt.filter(F.col("to_type").isNotNull())
    totals = pairs.groupBy("from_type").agg(
        F.count(F.lit(1)).alias("_tot"))
    return (pairs.groupBy("from_type", "to_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .join(F.broadcast(totals), "from_type")
            .select("from_type", "to_type", "n",
                    F.round(F.col("n") / F.col("_tot"), 6).alias("share")))


_SQL_TRANSITIONS = """
WITH nxt AS (
  SELECT event_type AS from_type,
    lead(event_type) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS to_type
  FROM events),
pairs AS (SELECT * FROM nxt WHERE to_type IS NOT NULL),
tot AS (SELECT from_type, count(*) AS t FROM pairs GROUP BY from_type)
SELECT p.from_type, p.to_type, count(*) AS n,
       round(count(*) / CAST(t AS DOUBLE), 6) AS share
FROM pairs p JOIN tot USING (from_type)
GROUP BY p.from_type, p.to_type, t
"""


def q_cohort_retention(spark, sf_dir):
    """Weekly cohort retention triangle (operators/funnel.py
    cohort_retention): users bucketed by first-activity week, retention =
    share active in each later week.  Two aggregations on the user key +
    one (cohort, offset) rollup; the DuckDB oracle mirrors the integer
    week arithmetic exactly."""
    from ..operators.funnel import cohort_retention

    ev = load_tables(spark, sf_dir)["events"]
    return cohort_retention(ev, granularity="week", max_offset=8)


_SQL_COHORT = """
WITH act AS (
  SELECT DISTINCT user_id,
    CAST(floor(date_diff('day', DATE '2020-01-06', ts::DATE) / 7.0)
         AS BIGINT) AS p
  FROM events),
first AS (SELECT user_id, min(p) AS cohort FROM act GROUP BY user_id),
sizes AS (SELECT cohort, count(*) AS cohort_size FROM first GROUP BY cohort),
j AS (
  SELECT f.cohort, a.p - f.cohort AS period_offset
  FROM act a JOIN first f USING (user_id)
  WHERE a.p - f.cohort <= 8)
SELECT j.cohort, j.period_offset, count(*) AS n_active, s.cohort_size,
       round(count(*) / CAST(s.cohort_size AS DOUBLE), 6) AS retention
FROM j JOIN sizes s USING (cohort)
GROUP BY j.cohort, j.period_offset, s.cohort_size
"""


def q_corpus_overlap(spark, sf_dir):
    """Corpus-level overlap (pipeline/dedup.py corpus_overlap): exact
    shingle Jaccard between two overlapping document slices plus the
    MinHash corpus-sketch estimate — the sketch is md5-affine
    arithmetic, so the oracle recomputes the ESTIMATE exactly too (a
    hash-checked sketch, not a bound check).  Gate uses k=32 slots
    (sigma ~0.09 — plenty for a diagnostic; production default stays
    64) and 1/8 hash-sampled corpora: the overlap DIAGNOSTIC is the one
    op that may legitimately run on a sample, since Jaccard of uniform
    same-key samples concentrates around the full-corpus value."""
    from .dedup import corpus_overlap
    from .sampling import hash_unit

    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    d = d.filter(hash_unit(F.col("doc_id"), "ovl") % 8 == 0)
    a = d.filter(F.col("doc_id") < 300)
    b = d.filter(F.col("doc_id") >= 200)
    return corpus_overlap(a, b, k=32)


def _sql_corpus_overlap(k: int = 32) -> str:
    from .sampling import sql_hash_unit

    samp = sql_hash_unit("doc_id", "ovl")
    hs = DSQL.hashed_shingles("text")
    mins_a = ", ".join(
        f"min({DSQL.mix(DSQL.mix('h', i), i + k)}) AS m{i}"
        for i in range(k))
    mins_b = mins_a
    eq = " + ".join(
        f"CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END" for i in range(k))
    return f"""
WITH S AS (SELECT doc_id, text FROM documents
           WHERE {samp} % 8 = 0),
A AS (SELECT DISTINCT unnest({hs}) AS h FROM S WHERE doc_id < 300),
B AS (SELECT DISTINCT unnest({hs}) AS h FROM S WHERE doc_id >= 200),
na AS (SELECT count(*) AS n_a FROM A),
nb AS (SELECT count(*) AS n_b FROM B),
nc AS (SELECT count(*) AS n_common FROM A JOIN B USING (h)),
sa AS (SELECT {mins_a} FROM A),
sb AS (SELECT {mins_b} FROM B)
SELECT n_a, n_b, n_common,
  round(n_common / CAST(n_a + n_b - n_common AS DOUBLE), 6) AS jaccard,
  round(({eq}) / {float(k)}, 6) AS est_jaccard
FROM na, nb, nc, sa, sb
"""


def q_token_budget_subset(spark, sf_dir):
    """Exact token-budget corpus cut (pipeline/sampling.py
    token_budget_subset): keep documents in deterministic md5-shuffle
    order until 20k tokens, computed as a distributed two-phase prefix
    sum (per-bucket offsets + within-bucket windows — no global sort).
    The oracle computes the same inclusive running total with one global
    window, exact at oracle scale."""
    from .sampling import token_budget_subset

    d = load_tables(spark, sf_dir)["documents"]
    d = d.withColumn("n_tok", TX.token_count(F.col("text")))
    kept = token_budget_subset(d, "n_tok", budget=20_000)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("sum_tokens"),
        F.max("_cum_tokens").alias("max_cum"))


def _sql_token_budget() -> str:
    from .sampling import sql_hash_unit

    h = sql_hash_unit("doc_id", "budget")
    return f"""
WITH t AS (
  SELECT doc_id, source, {TX.sql_token_count('text')} AS n_tok, {h} AS hu
  FROM documents
),
c AS (
  SELECT *, SUM(n_tok) OVER (ORDER BY hu, doc_id) AS cum FROM t
)
SELECT source, COUNT(*) AS n_docs, SUM(n_tok)::BIGINT AS sum_tokens,
       MAX(cum)::BIGINT AS max_cum
FROM c WHERE cum <= 20000 GROUP BY source
"""


def q_mixture_temperature(spark, sf_dir):
    """Temperature-flattened mixture (pipeline/curation.py
    mixture_resample_temperature, alpha=0.5): output shares proportional
    to sqrt(observed share) — the multilingual rebalancing rule — via the
    same deterministic md5 coin and ppm-quantized threshold as
    mixture_resample."""
    from .curation import mixture_resample_temperature

    d = load_tables(spark, sf_dir)["documents"]
    out = mixture_resample_temperature(d, alpha=0.5)
    return out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"))


def _sql_mixture_temperature() -> str:
    from .sampling import sql_hash_unit

    h = sql_hash_unit("doc_id", "mixT")
    return f"""
WITH counts AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
tot AS (SELECT sum(n) AS t FROM counts),
ratio AS (
  SELECT source,
         pow(CAST(n AS DOUBLE) / CAST(t AS DOUBLE), -0.5) AS ratio
  FROM counts CROSS JOIN tot),
mx AS (SELECT max(ratio) AS m FROM ratio),
rates AS (SELECT source, floor(round(ratio / m, 6) * 1000000)::BIGINT AS ppm
          FROM ratio, mx),
kept AS (
  SELECT d.doc_id, d.source
  FROM documents d JOIN rates USING (source)
  WHERE {h} * 1000000 < ppm * 4294967296)
SELECT source, count(*) AS n_kept, min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id
FROM kept GROUP BY source
"""


def _sql_mixture_resample() -> str:
    from .sampling import sql_hash_unit

    values = ", ".join(f"('{k}', {v})" for k, v in _MIX_TARGETS.items())
    h = sql_hash_unit("doc_id", "mix")
    return f"""
WITH counts AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
tot AS (SELECT sum(n) AS t FROM counts),
tgt(source, target) AS (VALUES {values}),
ratio AS (
  -- all-DOUBLE arithmetic: DuckDB would otherwise fold DECIMAL targets and
  -- HUGEINT sums exactly, disagreeing with Spark's double pipeline by 1 ppm
  -- at half-way rounding boundaries and flipping borderline coin rows.
  SELECT c.source,
         CAST(target AS DOUBLE) * CAST(t AS DOUBLE) / CAST(n AS DOUBLE) AS ratio
  FROM counts c JOIN tgt ON c.source = tgt.source CROSS JOIN tot),
mx AS (SELECT max(ratio) AS m FROM ratio),
rates AS (SELECT source, floor(round(ratio / m, 6) * 1000000)::BIGINT AS ppm
          FROM ratio, mx)
SELECT d.doc_id, d.source
FROM documents d JOIN rates USING (source)
WHERE {h} * 1000000 < ppm * 4294967296
"""


# ---------------------------------------------------------------------------
# Multimodal
# ---------------------------------------------------------------------------

def q_multimodal_features(spark, sf_dir):
    """Binary-payload feature extraction (mapInPandas) → per-kind rollup.
    The Spark path flows through real binary columns + Arrow batches; the
    oracle recomputes the same byte stats from the source text."""
    d = load_tables(spark, sf_dir)["documents"]
    feats = extract_features(make_media_table(d))
    return feats.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum("checksum").alias("total_checksum"),
        F.round(F.avg("aspect"), 6).alias("avg_aspect"),
    )


_SQL_MULTIMODAL = """
WITH media AS (
  SELECT doc_id AS media_id,
    ['image','audio','video'][(doc_id % 3)::INT + 1] AS kind,
    regexp_replace(text, '[^\\x00-\\x7F]', '', 'g') AS atext,
    (n_chars % 1920)::INT AS width, (n_chars % 1080)::INT AS height
  FROM documents),
feats AS (
  SELECT media_id, kind,
    octet_length(encode(atext)) AS n_bytes,
    COALESCE(list_sum(list_transform(string_split(atext, ''), c -> ascii(c))), 0) AS checksum,
    CASE WHEN height = 0 THEN 0.0 ELSE CAST(width AS DOUBLE) / height END AS aspect
  FROM media)
SELECT kind, COUNT(*) AS n_media, SUM(n_bytes)::BIGINT AS total_bytes,
       SUM(checksum)::BIGINT AS total_checksum, round(AVG(aspect), 6) AS avg_aspect
FROM feats GROUP BY kind
"""


def q_audio_features(spark, sf_dir):
    """REAL WAV decode as a hashed gate: per-document square-wave WAV
    payloads are synthesized executor-side (pipeline/codecs.py encode_wav)
    with doc_id-derived parameters, then decoded back through
    extract_audio_features (codecs.decode_wav — RIFF walk, PCM parse,
    normalization, RMS).  Because every encode parameter is a closed-form
    function of doc_id, the DuckDB oracle computes the exact expected
    decode output (a ±a square wave quantized to 16-bit has RMS
    round(a*32768)/32768 exactly) — a wrong chunk walk, byte order,
    normalization, or RMS shows up as a hash mismatch."""
    import pandas as pd_local

    from .codecs import encode_wav
    from .multimodal import extract_audio_features

    d = load_tables(spark, sf_dir)["documents"].filter(
        F.col("doc_id") < 200).select("doc_id")

    def _gen(batches):
        for pdf in batches:
            payloads, metas = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                rate = 8000 + (did % 4) * 4000
                n = 100 + did % 50
                amp = ((did % 9) + 1) / 10.0
                samples = [amp if i % 2 == 0 else -amp for i in range(n)]
                payloads.append(encode_wav(samples, sample_rate=rate,
                                           n_channels=1, bits=16))
                metas.append({"width": 0, "height": 0, "duration_ms": 0})
            yield pd_local.DataFrame({
                "media_id": pdf["doc_id"].astype("int64"),
                "kind": ["audio"] * len(pdf),
                "payload": payloads,
                "meta": metas,
            })

    from .multimodal import MEDIA_SCHEMA
    media = d.mapInPandas(_gen, schema=MEDIA_SCHEMA)
    return extract_audio_features(media).select(
        "media_id", "decoded", "n_channels", "sample_rate", "bits",
        "n_frames", "duration_ms", "rms")


_SQL_AUDIO_FEATURES = """
SELECT doc_id AS media_id, TRUE AS decoded, 1 AS n_channels,
  (8000 + (doc_id % 4) * 4000)::INT AS sample_rate, 16 AS bits,
  (100 + doc_id % 50)::BIGINT AS n_frames,
  ((100 + doc_id % 50) * 1000) // (8000 + (doc_id % 4) * 4000)
    AS duration_ms,
  round(round(((doc_id % 9) + 1) / 10.0 * 32768) / 32768, 6) AS rms
FROM documents WHERE doc_id < 200
"""


def q_video_features(spark, sf_dir):
    """REAL AVI video decode as a hashed gate: per-document AVI payloads
    (pipeline/codecs.py encode_avi — RIFF hdrl/strh/strf/movi, raw-DIB
    bottom-up BGR frames) are synthesized executor-side with doc_id-derived
    parameters, then decoded back through extract_video_features
    (codecs.decode_avi — chunk-tree walk, DIB row flip + BGR swizzle, fps
    from strh rate/scale).  Every encode parameter is a closed-form
    function of doc_id, so the DuckDB oracle recomputes the exact decode
    output — solid-color frames make the mean pixel value (r+g+b)/3
    exactly; a wrong chunk walk, stride, row order, or channel swizzle
    shows up as a hash mismatch.  MJPEG-stream decode shares the same
    walker and is round-trip-tested in tests/test_codecs.py (lossy, so
    not hash-oracled)."""
    import pandas as pd_local

    from .codecs import DecodedImage, encode_avi
    from .multimodal import MEDIA_SCHEMA, extract_video_features

    d = load_tables(spark, sf_dir)["documents"].filter(
        F.col("doc_id") < 120).select("doc_id")

    def _gen(batches):
        for pdf in batches:
            payloads, metas = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 3 + did % 5
                w = 8 + (did % 3) * 4
                h = 6 + (did % 2) * 2
                rate = 5 + did % 3
                frames = [DecodedImage(w, h, "RGB", bytes((
                    (did * 7 + f * 13) % 256,
                    (did * 11 + f * 17) % 256,
                    (did * 3 + f * 29) % 256)) * (w * h))
                    for f in range(n)]
                payloads.append(encode_avi(frames, rate=rate, scale=1))
                metas.append({"width": w, "height": h, "duration_ms": 0})
            yield pd_local.DataFrame({
                "media_id": pdf["doc_id"].astype("int64"),
                "kind": ["video"] * len(pdf),
                "payload": payloads,
                "meta": metas,
            })

    media = d.mapInPandas(_gen, schema=MEDIA_SCHEMA)
    return extract_video_features(media).select(
        "media_id", "decoded", "width", "height", "fps", "n_frames",
        "duration_ms", "mean_luma")


_SQL_VIDEO_FEATURES = """
WITH params AS (
  SELECT doc_id,
    (3 + doc_id % 5)::BIGINT AS n_frames,
    (8 + (doc_id % 3) * 4)::INT AS w,
    (6 + (doc_id % 2) * 2)::INT AS h,
    (5 + doc_id % 3)::INT AS fps
  FROM documents WHERE doc_id < 120),
per_frame AS (
  SELECT doc_id, n_frames, w, h, fps,
    unnest(range(n_frames)) AS f
  FROM params),
lumas AS (
  SELECT doc_id,
    avg((((doc_id * 7 + f * 13) % 256)
       + ((doc_id * 11 + f * 17) % 256)
       + ((doc_id * 3 + f * 29) % 256)) / 3.0) AS ml
  FROM per_frame GROUP BY doc_id)
SELECT p.doc_id AS media_id, TRUE AS decoded, p.w AS width, p.h AS height,
  p.fps::DOUBLE AS fps, p.n_frames AS n_frames,
  ((p.n_frames * 1000) // p.fps)::BIGINT AS duration_ms,
  round(l.ml, 6) AS mean_luma
FROM params p JOIN lumas l USING (doc_id)
"""


def q_mp4_metadata(spark, sf_dir):
    """MP4/ISO-BMFF container metadata walk as a hashed gate
    (pipeline/codecs.py probe_mp4 + multimodal.extract_container_metadata):
    per-document MP4 containers (codecs.encode_mp4 — ftyp + a full moov
    box tree: mvhd, per-trak tkhd/mdhd/hdlr/stsd) are synthesized
    executor-side with doc_id-derived parameters, then probed back
    through the Arrow-batched container walker.  Every parameter
    (duration, track layout, codec fourccs, 16.16 fixed-point
    dimensions) is a closed-form function of doc_id, so the DuckDB
    oracle recomputes the exact probe output — a wrong box-size walk,
    fixed-point shift, or fullbox version offset shows up as a hash
    mismatch.  Coded samples are never touched (the honest envelope:
    container metadata IS what a crawl-curation keep/drop pass needs)."""
    import pandas as pd_local

    from .codecs import encode_mp4
    from .multimodal import MEDIA_SCHEMA, extract_container_metadata

    d = load_tables(spark, sf_dir)["documents"].filter(
        F.col("doc_id") < 150).select("doc_id")

    def _gen(batches):
        for pdf in batches:
            payloads, metas = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                dur = 30000 + (did % 97) * 250
                vcodec = ("avc1", "hev1", "vp09")[did % 3]
                w = 640 + (did % 4) * 320
                h = 360 + (did % 3) * 180
                tracks = [{"kind": "video", "codec": vcodec,
                           "width": w, "height": h, "duration_ms": dur}]
                if did % 5 != 0:
                    tracks.append({"kind": "audio", "codec": "mp4a",
                                   "width": 0, "height": 0,
                                   "duration_ms": dur - 40})
                payloads.append(encode_mp4(dur, tracks))
                metas.append({"width": 0, "height": 0, "duration_ms": 0})
            yield pd_local.DataFrame({
                "media_id": pdf["doc_id"].astype("int64"),
                "kind": ["video"] * len(pdf),
                "payload": payloads,
                "meta": metas,
            })

    media = d.mapInPandas(_gen, schema=MEDIA_SCHEMA)
    return extract_container_metadata(media).select(
        "media_id", "container", "probed", "duration_ms", "n_tracks",
        "video_codec", "width", "height", "audio_codec")


def q_media_curation(spark, sf_dir):
    """End-to-end multimodal keep/drop pass — what the container probes
    exist FOR: a mixed corpus (each doc becomes an MP4, WebM, or MP3 by
    doc_id mod 3, parameters doc_id-derived) flows through
    extract_container_metadata once, then a pure-JVM filter applies the
    curation policy (video: duration 20-240 s AND height >= 480 AND
    codec allowlisted; audio: duration 60-600 s) and the gate returns
    per-container keep/drop counts with average kept duration.  One
    Arrow map stage + one 3-group aggregate; the oracle recomputes the
    whole policy closed-form."""
    import pandas as pd_local

    from .codecs import encode_mp3, encode_mp4, encode_webm
    from .multimodal import MEDIA_SCHEMA, extract_container_metadata

    d = load_tables(spark, sf_dir)["documents"].filter(
        F.col("doc_id") < 300).select("doc_id")

    def _gen(batches):
        for pdf in batches:
            payloads, kinds, metas = [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                m = did % 3
                if m == 0:
                    dur = 5000 + (did % 71) * 4000
                    h = 240 + (did % 5) * 120
                    codec = ("avc1", "mpg2")[did % 2]
                    payloads.append(encode_mp4(dur, [
                        {"kind": "video", "codec": codec, "width": h * 16 // 9,
                         "height": h, "duration_ms": dur}]))
                    kinds.append("video")
                elif m == 1:
                    dur = 5000 + (did % 67) * 4500
                    h = 240 + (did % 4) * 240
                    codec = ("V_VP9", "V_MS/VFW")[did % 2]
                    payloads.append(encode_webm(dur, [
                        {"kind": "video", "codec": codec,
                         "width": h * 16 // 9, "height": h}]))
                    kinds.append("video")
                else:
                    n = 500 + (did % 97) * 250
                    payloads.append(encode_mp3(
                        n, bitrate_kbps=128, sample_rate=44100))
                    kinds.append("audio")
                metas.append({"width": 0, "height": 0, "duration_ms": 0})
            yield pd_local.DataFrame({
                "media_id": pdf["doc_id"].astype("int64"),
                "kind": kinds,
                "payload": payloads,
                "meta": metas,
            })

    media = d.mapInPandas(_gen, schema=MEDIA_SCHEMA)
    probed = extract_container_metadata(media)
    video_ok = ((F.col("duration_ms").between(20_000, 240_000))
                & (F.col("height") >= 480)
                & (F.col("video_codec").isin("avc1", "V_VP8", "V_VP9",
                                             "V_AV1")))
    audio_ok = F.col("duration_ms").between(60_000, 600_000)
    keep = F.when(F.col("container").isin("mp4", "webm"), video_ok) \
        .otherwise(audio_ok)
    return (probed.withColumn("keep", keep)
            .groupBy("container")
            .agg(F.count(F.lit(1)).cast("long").alias("n_assets"),
                 F.sum(F.col("keep").cast("long")).cast("long")
                 .alias("n_kept"),
                 F.round(F.avg(F.when(F.col("keep"),
                                      F.col("duration_ms") / 1000.0)), 6)
                 .alias("avg_kept_s")))


_SQL_MEDIA_CURATION = """
WITH assets AS (
  SELECT doc_id,
    CASE doc_id % 3 WHEN 0 THEN 'mp4' WHEN 1 THEN 'webm'
         ELSE 'mp3' END AS container,
    CASE doc_id % 3
      WHEN 0 THEN (5000 + (doc_id % 71) * 4000)::BIGINT
      WHEN 1 THEN (5000 + (doc_id % 67) * 4500)::BIGINT
      ELSE ((500 + (doc_id % 97) * 250) * 1152 * 1000 // 44100)::BIGINT
    END AS duration_ms,
    CASE doc_id % 3
      WHEN 0 THEN 240 + (doc_id % 5) * 120
      WHEN 1 THEN 240 + (doc_id % 4) * 240
      ELSE 0 END AS height,
    CASE doc_id % 3
      WHEN 0 THEN (CASE WHEN doc_id % 2 = 0 THEN 'avc1' ELSE 'mpg2' END)
      WHEN 1 THEN (CASE WHEN doc_id % 2 = 0 THEN 'V_VP9'
                        ELSE 'V_MS/VFW' END)
      ELSE '' END AS video_codec
  FROM documents WHERE doc_id < 300),
flagged AS (
  SELECT container, duration_ms,
    CASE WHEN container IN ('mp4', 'webm')
         THEN duration_ms BETWEEN 20000 AND 240000
              AND height >= 480
              AND video_codec IN ('avc1', 'V_VP8', 'V_VP9', 'V_AV1')
         ELSE duration_ms BETWEEN 60000 AND 600000 END AS keep
  FROM assets)
SELECT container, COUNT(*)::BIGINT AS n_assets,
  SUM(keep::INT)::BIGINT AS n_kept,
  round(AVG(CASE WHEN keep THEN duration_ms / 1000.0 END), 6)
    AS avg_kept_s
FROM flagged GROUP BY container
"""


def q_webm_metadata(spark, sf_dir):
    """WebM/Matroska EBML walk as a hashed gate (pipeline/codecs.py
    probe_webm + multimodal.extract_container_metadata): per-document
    EBML trees (codecs.encode_webm — header DocType + Segment > Info
    TimestampScale/Duration + Tracks > TrackEntry TrackType/CodecID/
    Video PixelWidth/PixelHeight) synthesized executor-side with
    doc_id-derived parameters and walked back.  A wrong vint length
    decode (marker kept for ids, stripped for sizes), child-bounds
    check, or float-duration scale shows up as a hash mismatch."""
    import pandas as pd_local

    from .codecs import encode_webm
    from .multimodal import MEDIA_SCHEMA, extract_container_metadata

    d = load_tables(spark, sf_dir)["documents"].filter(
        F.col("doc_id") < 150).select("doc_id")

    def _gen(batches):
        for pdf in batches:
            payloads, metas = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                dur = 15000 + (did % 89) * 125
                vcodec = ("V_VP8", "V_VP9", "V_AV1")[did % 3]
                w = 426 + (did % 5) * 213
                h = 240 + (did % 4) * 120
                tracks = [{"kind": "video", "codec": vcodec,
                           "width": w, "height": h}]
                if did % 4 != 0:
                    tracks.append({"kind": "audio", "codec": "A_OPUS",
                                   "width": 0, "height": 0})
                payloads.append(encode_webm(dur, tracks))
                metas.append({"width": 0, "height": 0, "duration_ms": 0})
            yield pd_local.DataFrame({
                "media_id": pdf["doc_id"].astype("int64"),
                "kind": ["video"] * len(pdf),
                "payload": payloads,
                "meta": metas,
            })

    media = d.mapInPandas(_gen, schema=MEDIA_SCHEMA)
    return extract_container_metadata(media).select(
        "media_id", "container", "probed", "duration_ms", "n_tracks",
        "video_codec", "width", "height", "audio_codec")


_SQL_WEBM_METADATA = """
SELECT doc_id AS media_id, 'webm' AS container, TRUE AS probed,
  (15000 + (doc_id % 89) * 125)::BIGINT AS duration_ms,
  (CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 2 END)::INT AS n_tracks,
  CASE doc_id % 3 WHEN 0 THEN 'V_VP8' WHEN 1 THEN 'V_VP9'
       ELSE 'V_AV1' END AS video_codec,
  (426 + (doc_id % 5) * 213)::INT AS width,
  (240 + (doc_id % 4) * 120)::INT AS height,
  CASE WHEN doc_id % 4 = 0 THEN '' ELSE 'A_OPUS' END AS audio_codec
FROM documents WHERE doc_id < 150
"""


def q_mp3_metadata(spark, sf_dir):
    """MPEG-audio header walk as a hashed gate (pipeline/codecs.py
    probe_mp3 + multimodal.extract_container_metadata): per-document CBR
    MP3 streams (codecs.encode_mp3 — optional ID3v2 shell + n correct
    frame headers over zero-filled payloads) are synthesized
    executor-side with doc_id-derived parameters and probed back.  The
    oracle recomputes the closed-form duration (frames x 1152 samples /
    rate) — a wrong ID3 syncsafe skip, frame-sync scan, bitrate/rate
    table lookup, or frame-length formula shifts the frame count or
    duration and hash-mismatches."""
    import pandas as pd_local

    from .codecs import encode_mp3
    from .multimodal import MEDIA_SCHEMA, extract_container_metadata

    d = load_tables(spark, sf_dir)["documents"].filter(
        F.col("doc_id") < 150).select("doc_id")

    def _gen(batches):
        for pdf in batches:
            payloads, metas = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 100 + did % 50
                br = (64, 128, 192)[did % 3]
                sr = (44100, 32000)[did % 2]
                ch = 1 + (did % 2)
                payloads.append(encode_mp3(
                    n, bitrate_kbps=br, sample_rate=sr, channels=ch,
                    id3_bytes=(did % 7) * 16))
                metas.append({"width": 0, "height": 0, "duration_ms": 0})
            yield pd_local.DataFrame({
                "media_id": pdf["doc_id"].astype("int64"),
                "kind": ["audio"] * len(pdf),
                "payload": payloads,
                "meta": metas,
            })

    media = d.mapInPandas(_gen, schema=MEDIA_SCHEMA)
    return extract_container_metadata(media).select(
        "media_id", "container", "probed", "duration_ms", "n_tracks",
        "audio_codec")


_SQL_MP3_METADATA = """
SELECT doc_id AS media_id, 'mp3' AS container, TRUE AS probed,
  ((100 + doc_id % 50) * 1152 * 1000
   // (CASE WHEN doc_id % 2 = 0 THEN 44100 ELSE 32000 END))::BIGINT
    AS duration_ms,
  1::INT AS n_tracks, 'mp3' AS audio_codec
FROM documents WHERE doc_id < 150
"""


def q_flac_metadata(spark, sf_dir):
    """FLAC STREAMINFO walk as a hashed gate (pipeline/codecs.py
    probe_flac + multimodal.extract_container_metadata): per-document
    FLAC stream heads (codecs.encode_flac — fLaC marker + STREAMINFO,
    some with a PADDING block) are synthesized executor-side with
    doc_id-derived rate/channels/bits/total-samples and probed back.
    The oracle recomputes the closed-form duration (total samples /
    rate) — a wrong bit offset in the packed 20/3/5/36-bit STREAMINFO
    layout shifts every field and hash-mismatches.  Same one-map-stage
    footer-read envelope as the MP4/MP3/WebM gates."""
    import pandas as pd_local

    from .codecs import encode_flac
    from .multimodal import MEDIA_SCHEMA, extract_container_metadata

    d = load_tables(spark, sf_dir)["documents"].filter(
        F.col("doc_id") < 150).select("doc_id")

    def _gen(batches):
        for pdf in batches:
            payloads, metas = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                total = (did % 97 + 10) * 4410
                sr = (44100, 22050, 48000)[did % 3]
                payloads.append(encode_flac(
                    total, sample_rate=sr, channels=1 + did % 2,
                    bits_per_sample=(16, 24)[did % 2],
                    padding=(did % 5) * 8))
                metas.append({"width": 0, "height": 0, "duration_ms": 0})
            yield pd_local.DataFrame({
                "media_id": pdf["doc_id"].astype("int64"),
                "kind": ["audio"] * len(pdf),
                "payload": payloads,
                "meta": metas,
            })

    media = d.mapInPandas(_gen, schema=MEDIA_SCHEMA)
    return extract_container_metadata(media).select(
        "media_id", "container", "probed", "duration_ms", "n_tracks",
        "audio_codec")


_SQL_FLAC_METADATA = """
SELECT doc_id AS media_id, 'flac' AS container, TRUE AS probed,
  ((doc_id % 97 + 10) * 4410 * 1000
   // (CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 22050
       ELSE 48000 END))::BIGINT AS duration_ms,
  1::INT AS n_tracks, 'flac' AS audio_codec
FROM documents WHERE doc_id < 150
"""


def q_ogg_metadata(spark, sf_dir):
    """Ogg Vorbis page walk as a hashed gate (pipeline/codecs.py
    probe_ogg + multimodal.extract_container_metadata): per-document Ogg
    shells (codecs.encode_ogg — BOS page carrying the Vorbis id header,
    EOS page carrying the ending granule position) are synthesized
    executor-side and probed back.  The oracle recomputes the
    closed-form duration (ending granule / rate) — a wrong lacing walk,
    granule endianness, or id-header offset hash-mismatches.  Cost is a
    seek to each end of the payload, the same envelope as a parquet
    footer read."""
    import pandas as pd_local

    from .codecs import encode_ogg
    from .multimodal import MEDIA_SCHEMA, extract_container_metadata

    d = load_tables(spark, sf_dir)["documents"].filter(
        F.col("doc_id") < 150).select("doc_id")

    def _gen(batches):
        for pdf in batches:
            payloads, metas = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                total = (did % 89 + 5) * 8820
                sr = (44100, 16000)[did % 2]
                payloads.append(encode_ogg(
                    total, sample_rate=sr, channels=1 + did % 2,
                    serial=did + 1))
                metas.append({"width": 0, "height": 0, "duration_ms": 0})
            yield pd_local.DataFrame({
                "media_id": pdf["doc_id"].astype("int64"),
                "kind": ["audio"] * len(pdf),
                "payload": payloads,
                "meta": metas,
            })

    media = d.mapInPandas(_gen, schema=MEDIA_SCHEMA)
    return extract_container_metadata(media).select(
        "media_id", "container", "probed", "duration_ms", "n_tracks",
        "audio_codec")


_SQL_OGG_METADATA = """
SELECT doc_id AS media_id, 'ogg' AS container, TRUE AS probed,
  ((doc_id % 89 + 5) * 8820 * 1000
   // (CASE WHEN doc_id % 2 = 0 THEN 44100 ELSE 16000 END))::BIGINT
    AS duration_ms,
  1::INT AS n_tracks, 'vorbis' AS audio_codec
FROM documents WHERE doc_id < 150
"""


_SQL_MP4_METADATA = """
SELECT doc_id AS media_id, 'mp4' AS container, TRUE AS probed,
  (30000 + (doc_id % 97) * 250)::BIGINT AS duration_ms,
  (CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 2 END)::INT AS n_tracks,
  CASE doc_id % 3 WHEN 0 THEN 'avc1' WHEN 1 THEN 'hev1'
       ELSE 'vp09' END AS video_codec,
  (640 + (doc_id % 4) * 320)::INT AS width,
  (360 + (doc_id % 3) * 180)::INT AS height,
  CASE WHEN doc_id % 5 = 0 THEN '' ELSE 'mp4a' END AS audio_codec
FROM documents WHERE doc_id < 150
"""


def q_resize_media_stats(spark, sf_dir):
    """Resize plumbing (pipeline/multimodal.py resize_media) as a hashed
    gate: resize every payload toward 640x480, roll up per kind.  The
    deterministic fake scales payload length by the area ratio (floor, min
    1 byte, never upscales); metadata is rewritten to the target frame —
    the oracle recomputes both from the source text."""
    from .multimodal import resize_media

    d = load_tables(spark, sf_dir)["documents"]
    rs = resize_media(make_media_table(d), 640, 480)
    return (rs.groupBy("kind")
            .agg(F.count(F.lit(1)).alias("n_media"),
                 F.sum(F.octet_length("payload")).alias("resized_bytes"),
                 F.sum(F.col("meta.width") + F.col("meta.height"))
                 .alias("dim_sum"))
            .orderBy("kind"))


_SQL_RESIZE_MEDIA = r"""
WITH media AS (
  SELECT doc_id AS media_id,
    ['image','audio','video'][(doc_id % 3)::INT + 1] AS kind,
    octet_length(encode(regexp_replace(text, '[^\x00-\x7F]', '', 'g'))) AS len,
    CASE WHEN (n_chars % 1920) = 0 THEN 1 ELSE (n_chars % 1920) END AS ow,
    CASE WHEN (n_chars % 1080) = 0 THEN 1 ELSE (n_chars % 1080) END AS oh
  FROM documents),
calc AS (
  SELECT media_id, kind,
    greatest(1, floor(len * least(CAST(640 * 480 AS DOUBLE) / (ow * oh),
                                  1.0))::BIGINT) AS new_len
  FROM media)
SELECT kind, COUNT(*) AS n_media, SUM(new_len)::BIGINT AS resized_bytes,
       COUNT(*) * (640 + 480) AS dim_sum
FROM calc GROUP BY kind ORDER BY kind
"""


def q_winnow_fingerprints(spark, sf_dir):
    """Winnowing fingerprints + BPE-ish token counts per doc — scalar
    projections of the sketch (count/min/max) so the driver hash stays
    array-free."""
    d = load_tables(spark, sf_dir)["documents"]
    fps = winnow_fingerprints(d)
    stats = fps.select(
        "doc_id",
        F.size("fps").alias("n_fps"),
        F.array_min("fps").alias("min_fp"),
        F.array_max("fps").alias("max_fp"),
    )
    toks = d.select("doc_id", bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"))
    return stats.join(toks, "doc_id")


_SQL_WINNOW = f"""
WITH hs AS (SELECT doc_id, {DSQL.ordered_shingle_hashes('text')} AS h,
                   {sql_bpe_ish_token_count('text')} AS n_bpe_tokens
            FROM documents),
w AS (SELECT doc_id, n_bpe_tokens, {DSQL.winnow('h')} AS fps FROM hs)
SELECT doc_id, len(fps) AS n_fps, list_min(fps) AS min_fp,
       list_max(fps) AS max_fp, n_bpe_tokens
FROM w
"""


def q_kmeans_clusters(spark, sf_dir):
    """k-means (3 Lloyd iterations, DataFrame-only) cluster summary.

    Fully oracle-checked since r2: init (k lowest ids), tie-breaks
    (round(d2,9), cluster index) and the 6dp-rounded centroid means pin the
    whole trajectory bit-identically, so the 3 Lloyd iterations unroll into
    DuckDB CTEs (see _sql_kmeans)."""
    e = load_tables(spark, sf_dir)["embeddings"]
    assign, _cent = kmeans(e, k=8, iters=3)
    return (assign.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n_vectors"))
            .orderBy("cluster"))


def _sql_kmeans(
    k: int = 8, iters: int = 3, dim: int = 64,
    vecs_sql: str = "SELECT vec_id AS vid, embedding::DOUBLE[] AS v "
                    "FROM embeddings",
    body_only: bool = False,
) -> str:
    """Unrolled Lloyd iterations as DuckDB CTEs — same init, same rounded
    argmin tie-breaks, same 6dp-rounded per-dim centroid means as
    similarity.kmeans (the rounding step absorbs the ~1e-13 cross-engine
    AVG summation-order difference).  ``vecs_sql`` overrides the source
    relation (any query producing (vid, v)); ``body_only`` returns just the
    CTE list (no WITH / final SELECT) so callers can extend the chain —
    the final assignment relation is ``a{iters}`` (vid, v, cluster)."""
    avg_list = "[" + ", ".join(
        f"round(avg(v[{i}]), 6)" for i in range(1, dim + 1)) + "]"
    d2 = ("list_sum(list_transform(list_zip(e.v, c.c), "
          "p -> (p[1]-p[2])*(p[1]-p[2])))")
    ctes = [
        f"vecs AS ({vecs_sql})",
        f"c0 AS (SELECT row_number() OVER (ORDER BY vid) - 1 AS cluster, v AS c\n"
        f"       FROM (SELECT vid, v FROM vecs ORDER BY vid LIMIT {k}) t)",
    ]
    for i in range(1, iters + 1):
        ctes.append(f"""a{i} AS (
  SELECT vid, v, cluster FROM (
    SELECT e.vid, e.v, c.cluster,
      row_number() OVER (PARTITION BY e.vid
        ORDER BY round({d2}, 9) ASC, c.cluster ASC) AS r
    FROM vecs e, c{i - 1} c) t WHERE r = 1)""")
        if i < iters:
            ctes.append(
                f"c{i} AS (SELECT cluster, {avg_list} AS c "
                f"FROM a{i} GROUP BY cluster)")
    body = ",\n".join(ctes)
    if body_only:
        return body
    return ("WITH " + body
            + f"\nSELECT cluster, COUNT(*) AS n_vectors FROM a{iters} "
            f"GROUP BY cluster ORDER BY cluster")


def q_semdedup_prune(spark, sf_dir):
    """SemDeDup-style semantic dedup (similarity.semdedup): k-means blocks
    the corpus, cosine ≥ 0.99 within each cluster marks duplicates,
    higher-id member of each pair is dropped.  Runs on the augmented
    embeddings (10 planted exact copies) so the prune demonstrably fires.
    Output: per-cluster total/kept/removed counts.  The oracle unrolls the
    identical k-means trajectory (``_sql_kmeans`` CTEs) and mirrors the
    intra-cluster pair compare, so the whole cluster→prune pipeline is
    hash-checked."""
    from .similarity import semdedup

    # gate-side corpus cap (vec_id % 1e6 < 800, keeping the planted copies):
    # the pairwise-within-cluster stage is Σ|c|²·dim by design — the
    # OPERATOR keeps that bounded by sizing k to the corpus (see semdedup
    # docstring); the GATE demos it on a fixed k=8, so the demo corpus is
    # capped instead of letting the demo quadratic dominate the bench.
    corpus = _aug_emb(spark, sf_dir).filter(
        (F.col("vec_id") % 1000000) < 800)
    verdict = semdedup(corpus, k=8, iters=3, threshold=0.99)
    return (verdict.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n_vectors"),
                 F.sum(F.when(F.col("is_kept"), 0).otherwise(1))
                 .cast("long").alias("n_removed"),
                 F.sum(F.when(F.col("is_kept"), 1).otherwise(0))
                 .cast("long").alias("n_kept"))
            .orderBy("cluster"))


def _sql_semdedup(k: int = 8, iters: int = 3, threshold: float = 0.99) -> str:
    cos = _COS.format(a="a.v", b="b.v")
    kme = _sql_kmeans(k=k, iters=iters, body_only=True,
                      vecs_sql="SELECT vec_id AS vid, v FROM corpus "
                               "WHERE vec_id % 1000000 < 800")
    return f"""
WITH {_AUG_EMB_SQL},
{kme},
sd_pairs AS (
  SELECT a.vid AS a_id, b.vid AS b_id
  FROM a{iters} a JOIN a{iters} b
    ON a.cluster = b.cluster AND a.vid < b.vid
  WHERE round({cos}, 6) >= {threshold}
),
sd_removed AS (SELECT DISTINCT b_id AS vid FROM sd_pairs)
SELECT t.cluster,
       COUNT(*) AS n_vectors,
       COUNT(r.vid) AS n_removed,
       COUNT(*) - COUNT(r.vid) AS n_kept
FROM a{iters} t LEFT JOIN sd_removed r ON t.vid = r.vid
GROUP BY t.cluster ORDER BY t.cluster
"""


def q_tfidf_top_terms(spark, sf_dir):
    """TF-IDF top-3 terms per doc (doc_id<50): tokens → explode → per-(doc,
    term) tf → per-term document frequency → idf join → rank.

    Scale shape: two shuffles (term-count groupBy, df groupBy) + a broadcast
    of the term→idf table; the classic inverted-index build.  ln() on
    identical int inputs is bit-identical across engines; scores rounded 6dp,
    rank tie-broken by term."""
    from pyspark.sql.window import Window
    d = load_tables(spark, sf_dir)["documents"]
    # n_docs stays inside the plan (1-row agg, broadcast) — a driver-side
    # d.count() here would be an eager extra scan during query *build*
    n_docs = d.agg(F.count(F.lit(1)).cast("double").alias("_n_docs"))
    toks = (d.select("doc_id", F.explode(TX.tokens(F.col("text"))).alias("term")))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = dfreq.crossJoin(F.broadcast(n_docs)).select(
        "term",
        (F.log((F.col("_n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0).alias("idf"))
    scored = (tf.filter(F.col("doc_id") < 50)
              .join(F.broadcast(idf), "term")
              .select("doc_id", "term",
                      F.round(F.col("tf") * F.col("idf"), 6).alias("tfidf")))
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(),
                                             F.col("term").asc())
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 3)
            .select("doc_id", "term", "tfidf", "rnk"))


def _sql_tfidf() -> str:
    toks = TX.sql_tokens("text")
    return f"""
WITH tok AS (SELECT doc_id, unnest({toks}) AS term FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
idf AS (SELECT term, ln((n.n_docs + 1.0) / (COUNT(*) + 1.0)) + 1.0 AS idf
        FROM tf, n GROUP BY term, n.n_docs),
scored AS (
  SELECT tf.doc_id, tf.term, round(tf.tf * idf.idf, 6) AS tfidf
  FROM tf JOIN idf ON tf.term = idf.term WHERE tf.doc_id < 50)
SELECT doc_id, term, tfidf, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY tfidf DESC, term ASC) AS rnk
  FROM scored) t WHERE rnk <= 3
"""


def q_similarity_lsh(spark, sf_dir):
    """Sign-random-projection LSH ANN top-10 (6 planes, hamming-1
    multiprobe) for vec_id<5."""
    e = load_tables(spark, sf_dir)["embeddings"]
    q = e.filter(F.col("vec_id") < 5)
    return lsh_topk(q, e, k=10, n_planes=6, multiprobe=True)


def _sql_similarity_lsh() -> str:
    n_planes = 6
    planes = hyperplanes(n_planes)
    terms = []
    for p, row in enumerate(planes):
        arr = "[" + ", ".join(repr(x) for x in row) + "]::DOUBLE[]"
        terms.append(
            f"CASE WHEN list_dot_product(v, {arr}) > 0 "
            f"THEN {1 << p}::BIGINT ELSE 0::BIGINT END")
    bucket = " + ".join(terms)
    shifts = "[" + ", ".join(str(s) for s in [0] + [1 << i for i in range(n_planes)]) + "]"
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
b AS (SELECT vec_id, v, {bucket} AS bucket FROM e),
q AS (SELECT vec_id AS query_id, v AS qv, bucket AS qbucket FROM b WHERE vec_id < 5),
probes AS (SELECT query_id, qv, xor(qbucket, sh.s) AS bucket
           FROM q, (SELECT unnest({shifts}) AS s) sh),
scored AS (
  SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id,
         round({_COS.format(a='p.qv', b='c.v')}, 6) AS score
  FROM probes p JOIN b c ON p.bucket = c.bucket AND p.query_id <> c.vec_id)
SELECT query_id, neighbor_id, score, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY score DESC, neighbor_id) AS rank
  FROM scored) t WHERE rank <= 10
"""


def q_asof_join(spark, sf_dir):
    """Backward as-of join: each 'error' event gets the latest prior-or-equal
    'purchase' event of the same user (union+window — single key shuffle,
    see operators/asof.py).  Oracle: DuckDB's native ASOF LEFT JOIN."""
    from ..operators.asof import asof_join

    ev = load_tables(spark, sf_dir)["events"]
    errors = (ev.filter(F.col("event_type") == "error")
              .select("user_id", F.col("event_id").alias("err_event_id"),
                      F.col("ts").alias("err_ts")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("user_id", F.col("event_id").alias("purch_event_id"),
                         F.col("ts").alias("purch_ts"),
                         F.round(F.col("value"), 6).alias("purch_value")))
    out = asof_join(errors, purchases, on=["user_id"],
                    left_ts="err_ts", right_ts="purch_ts",
                    right_tiebreak="purch_event_id")
    return out.select("user_id", "err_event_id", "err_ts",
                      "purch_event_id", "purch_value")


def q_sketch_distinct_rollup(spark, sf_dir):
    """Mergeable-sketch rollup (pipeline/sketches.py): per-event-type HLL
    sketches of user_id, merged up to one global estimate without
    rescanning — the pre-aggregation pattern for distinct counts at
    100 TB.  DataSketches estimate bits aren't reproducible in DuckDB, so
    the hashable output is (exact count, estimate-within-published-bound):
    Spark computes the exact distinct AND the sketch estimate in one plan
    and emits ``within_bound`` (|est − exact| ≤ 3·1.04/√2^lg_k · exact);
    the oracle recomputes the exact counts independently and expects TRUE.
    Finer-grained merge-vs-global and HIP-vs-composite assertions stay in
    tests/test_sketches.py."""
    from .sketches import hll_merge_rollup, hll_rollup

    ev = load_tables(spark, sf_dir)["events"]
    per_type = hll_rollup(ev, ["event_type"], "user_id", lg_k=12)
    merged = (hll_merge_rollup(per_type, [], "sketch")
              .withColumn("event_type", F.lit("__all__")))
    est = (per_type.select("event_type", "distinct_est")
           .unionByName(merged.select("event_type", "distinct_est")))
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact"))
    exact_all = (ev.agg(F.countDistinct("user_id").alias("n_exact"))
                 .withColumn("event_type", F.lit("__all__")))
    exact = exact.unionByName(exact_all.select("event_type", "n_exact"))
    bound = 3 * 1.04 / (2 ** 12) ** 0.5  # 3σ of the lg_k=12 RSE ≈ 4.875%
    return (est.join(exact, "event_type")
            .select("event_type", "n_exact",
                    (F.abs(F.col("distinct_est") - F.col("n_exact"))
                     <= F.col("n_exact") * F.lit(bound)).alias("within_bound"))
            .orderBy("event_type"))


_SQL_SKETCH_ROLLUP = """
WITH per AS (
  SELECT event_type, count(DISTINCT user_id) AS n_exact
  FROM events GROUP BY event_type
  UNION ALL
  SELECT '__all__' AS event_type, count(DISTINCT user_id) FROM events)
SELECT event_type, n_exact, TRUE AS within_bound FROM per ORDER BY event_type
"""


def q_sketch_quantile_rollup(spark, sf_dir):
    """KLL quantile rollup through the TWO-LEVEL merge path
    (pipeline/sketches.py, levels=2): per-(event_type, day) sketches salt
    into partial merges, then fold per event_type — no task ever holds a
    group's full sketch list.  Like the HLL gate, the sketch bits aren't
    DuckDB-reproducible, so the hashable output is the exact percentiles
    (computed independently by both engines) plus within-rank-bound
    booleans: the KLL estimate must land between the exact values at ranks
    q ± eps (eps = 2 x 1.65/sqrt(k) — the published normalized rank error
    at 2 sigma)."""
    from .sketches import kll_merge_quantiles, kll_quantile_rollup

    ev = load_tables(spark, sf_dir)["events"]
    fine = kll_quantile_rollup(
        ev.withColumn("day", F.dayofmonth("ts")),
        ["event_type", "day"], "value", k=200)
    est = kll_merge_quantiles(fine, ["event_type"], [0.5, 0.9],
                              levels=2, fanout=8)
    eps = 2 * 1.65 / (200 ** 0.5)  # ≈ 0.233 normalized rank
    exact = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50_exact"),
        F.expr("percentile(value, 0.9)").alias("p90_exact"),
        F.expr(f"percentile(value, {max(0.0, 0.5 - eps)})").alias("_p50_lo"),
        F.expr(f"percentile(value, {min(1.0, 0.5 + eps)})").alias("_p50_hi"),
        F.expr(f"percentile(value, {max(0.0, 0.9 - eps)})").alias("_p90_lo"),
        F.expr(f"percentile(value, {min(1.0, 0.9 + eps)})").alias("_p90_hi"))
    return (est.join(exact, "event_type")
            .select("event_type",
                    F.round("p50_exact", 6).alias("p50_exact"),
                    F.round("p90_exact", 6).alias("p90_exact"),
                    F.col("q_0_5").between(F.col("_p50_lo"), F.col("_p50_hi"))
                    .alias("p50_within"),
                    F.col("q_0_9").between(F.col("_p90_lo"), F.col("_p90_hi"))
                    .alias("p90_within"))
            .orderBy("event_type"))


_SQL_KLL_ROLLUP = """
SELECT event_type,
  round(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS p50_exact,
  round(quantile_cont(CAST(value AS DOUBLE), 0.9), 6) AS p90_exact,
  TRUE AS p50_within, TRUE AS p90_within
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_frame_sample_rollup(spark, sf_dir):
    """Video frame-sampling plumbing (pipeline/multimodal.py frame_sample)
    as a hashed gate: sample ≤8 frames per video payload (1 frame/s of
    deterministic metadata duration), roll up frame counts and payload
    bytes per video.  The oracle recomputes the slicing arithmetic from the
    source text (payload = ASCII bytes, duration = n_chars x 10 ms):
    n = clamp(duration/1000, 1, 8), step = max(1, len/n), every frame
    carries exactly step bytes when len >= n, else 1 byte for the first
    len frames."""
    d = load_tables(spark, sf_dir)["documents"]
    fs = frame_sample(make_media_table(d), every_ms=1000, max_frames=8)
    return (fs.groupBy("media_id")
            .agg(F.count(F.lit(1)).alias("n_frames"),
                 F.sum(F.octet_length("frame_payload")).alias("frame_bytes"),
                 F.max("frame_ts_ms").alias("last_ts_ms"))
            .orderBy("media_id"))


_SQL_FRAME_SAMPLE = r"""
WITH vids AS (
  SELECT doc_id AS media_id,
    octet_length(encode(regexp_replace(text, '[^\x00-\x7F]', '', 'g'))) AS len,
    least(8, greatest(1, (n_chars * 10) // 1000))::INT AS n
  FROM documents WHERE doc_id % 3 = 2),
calc AS (
  SELECT media_id, n,
    CASE WHEN len >= n THEN n * greatest(1, len // n)
         ELSE least(n::BIGINT, len) END AS frame_bytes,
    (n - 1) * 1000 AS last_ts_ms
  FROM vids)
SELECT media_id, n AS n_frames, frame_bytes, last_ts_ms
FROM calc ORDER BY media_id
"""


def q_asof_join_forward(spark, sf_dir):
    """Forward as-of join: each 'error' event gets the EARLIEST
    at-or-after 'purchase' of the same user — "next event after", the
    mirror of the backward gate (same union+window plan, frame reversed).
    Oracle: DuckDB ASOF LEFT JOIN with the inequality flipped."""
    from ..operators.asof import asof_join

    ev = load_tables(spark, sf_dir)["events"]
    errors = (ev.filter(F.col("event_type") == "error")
              .select("user_id", F.col("event_id").alias("err_event_id"),
                      F.col("ts").alias("err_ts")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("user_id", F.col("event_id").alias("purch_event_id"),
                         F.col("ts").alias("purch_ts"),
                         F.round(F.col("value"), 6).alias("purch_value")))
    out = asof_join(errors, purchases, on=["user_id"],
                    left_ts="err_ts", right_ts="purch_ts",
                    right_tiebreak="purch_event_id", direction="forward")
    return out.select("user_id", "err_event_id", "err_ts",
                      "purch_event_id", "purch_value")


_SQL_ASOF_FORWARD = """
SELECT e.user_id, e.event_id AS err_event_id, e.ts AS err_ts,
       p.event_id AS purch_event_id, round(p.value, 6) AS purch_value
FROM (SELECT * FROM events WHERE event_type = 'error') e
ASOF LEFT JOIN (
  -- pre-reduce to one row per (user_id, ts): forward ties break by MIN
  -- event_id on the Spark side (earliest wins looking forward)
  SELECT user_id, ts, arg_min(event_id, event_id) AS event_id,
         arg_min(value, event_id) AS value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts) p
  ON e.user_id = p.user_id AND e.ts <= p.ts
"""


_SQL_ASOF = """
SELECT e.user_id, e.event_id AS err_event_id, e.ts AS err_ts,
       p.event_id AS purch_event_id, round(p.value, 6) AS purch_value
FROM (SELECT * FROM events WHERE event_type = 'error') e
ASOF LEFT JOIN (
  -- pre-reduce to one row per (user_id, ts): DuckDB's ASOF picks an
  -- arbitrary row among equal right timestamps, while the Spark side
  -- tie-breaks deterministically by max event_id — make the oracle match
  SELECT user_id, ts, arg_max(event_id, event_id) AS event_id,
         arg_max(value, event_id) AS value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts) p
  ON e.user_id = p.user_id AND e.ts >= p.ts
"""


def q_hypertable_rollup(spark, sf_dir):
    """Continuous-aggregate cascade (pipeline/rollup.py): hourly rollup
    built INCREMENTALLY (first half of events, refreshed with the second
    half — never re-aggregating the first), then cascaded hour → day by
    re-aggregating the hourly table, never the raw events.  The oracle
    computes the day grain directly from raw in DuckDB, so the hash
    certifies both the refresh identity and the lossless cascade."""
    from .rollup import cascade_rollup, rollup_refresh, time_rollup

    ev = load_tables(spark, sf_dir)["events"]
    half_a = ev.filter(F.col("event_id") % 2 == 0)
    half_b = ev.filter(F.col("event_id") % 2 == 1)
    hourly = rollup_refresh(time_rollup(half_a, "hour"), half_b, "hour")
    daily = cascade_rollup(hourly, "day")
    return daily.select(
        "bucket", "event_type", "n",
        F.round(F.col("sum_value").cast("double"), 6).alias("sum_value"),
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"))


_SQL_HYPERTABLE = """
SELECT date_trunc('day', ts) AS bucket, event_type,
       COUNT(*) AS n,
       round(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 6)
         AS sum_value,
       round(MIN(value), 6) AS min_value,
       round(MAX(value), 6) AS max_value
FROM events GROUP BY 1, 2
"""


def q_range_join(spark, sf_dir):
    """Point-in-interval range join (operators/range_join.py): error events
    matched into the 1-hour windows opened by each purchase of the same
    user, counted per purchase.  The bucketized plan equi-joins on
    (user_id, hour bucket) — a normal hash shuffle — with the exact
    containment residual; the DuckDB oracle is the plain theta join (exact
    at oracle scale; quadratic, which is the point of not shipping it)."""
    from ..operators.range_join import range_join

    ev = load_tables(spark, sf_dir)["events"]
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("err_id"), "ts")
    windows = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purch_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("w_end"))
    rj = range_join(errors, windows, "ts", "w_start", "w_end",
                    on=["user_id"], bucket_width=3600.0)
    return (rj.groupBy("user_id", "purch_id")
            .agg(F.count(F.lit(1)).alias("n_errors_in_window"),
                 F.min("err_id").alias("first_err_id")))


_SQL_RANGE_JOIN = """
SELECT p.user_id, p.event_id AS purch_id,
       COUNT(*) AS n_errors_in_window,
       MIN(e.event_id) AS first_err_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'error') e
  ON e.user_id = p.user_id
 AND e.ts >= p.ts AND e.ts <= p.ts + INTERVAL 1 HOUR
GROUP BY p.user_id, p.event_id
"""


def q_asof_join_tolerance(spark, sf_dir):
    """Bounded as-of join (operators/asof.py tolerance): same backward
    error→purchase match, but matches farther than 2 hours back are
    nulled — pandas merge_asof semantics, exact as a post-hoc map-side
    conditional because the as-of match is already the nearest
    candidate."""
    from ..operators.asof import asof_join

    ev = load_tables(spark, sf_dir)["events"]
    errors = (ev.filter(F.col("event_type") == "error")
              .select("user_id", F.col("event_id").alias("err_event_id"),
                      F.col("ts").alias("err_ts")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("user_id", F.col("event_id").alias("purch_event_id"),
                         F.col("ts").alias("purch_ts"),
                         F.round(F.col("value"), 6).alias("purch_value")))
    out = asof_join(errors, purchases, on=["user_id"],
                    left_ts="err_ts", right_ts="purch_ts",
                    right_tiebreak="purch_event_id",
                    tolerance="2 hours")
    return out.select("user_id", "err_event_id", "err_ts",
                      "purch_event_id", "purch_value")


_SQL_ASOF_TOLERANCE = """
SELECT e.user_id, e.event_id AS err_event_id, e.ts AS err_ts,
       CASE WHEN p.ts >= e.ts - INTERVAL 2 HOUR THEN p.event_id END
         AS purch_event_id,
       CASE WHEN p.ts >= e.ts - INTERVAL 2 HOUR THEN round(p.value, 6) END
         AS purch_value
FROM (SELECT * FROM events WHERE event_type = 'error') e
ASOF LEFT JOIN (
  SELECT user_id, ts, arg_max(event_id, event_id) AS event_id,
         arg_max(value, event_id) AS value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts) p
  ON e.user_id = p.user_id AND e.ts >= p.ts
"""


def q_hard_negatives(spark, sf_dir):
    """Hard-negative mining (pipeline/similarity.py hard_negatives): per
    anchor, the 5 most-cosine-similar OTHER-labeled vectors — the
    contrastive-training pair miner.  Broadcast anchors, map-side cosine,
    WindowGroupLimit top-k before the single anchor-key exchange; the
    oracle brute-forces the same labeled top-k in DuckDB."""
    from .similarity import hard_negatives

    e = load_tables(spark, sf_dir)["embeddings"]
    return hard_negatives(e, k=5, anchors=e.filter(F.col("vec_id") < 20))


def _sql_hard_negatives() -> str:
    from .similarity import SQL_COSINE

    cos = SQL_COSINE.format(a="a.av", b="c.cv")
    return f"""
WITH hn_a AS (
  SELECT vec_id AS anchor_id, embedding AS av, label AS a_label
  FROM embeddings WHERE vec_id < 20),
hn_c AS (
  SELECT vec_id AS neighbor_id, embedding AS cv, label AS n_label
  FROM embeddings),
hn_s AS (
  SELECT a.anchor_id, c.neighbor_id, round({cos}, 6) AS score
  FROM hn_a a JOIN hn_c c ON a.a_label <> c.n_label)
SELECT anchor_id, neighbor_id, score, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY anchor_id
                               ORDER BY score DESC, neighbor_id ASC)::INT
    AS rank
  FROM hn_s) WHERE rank <= 5
"""


def q_hard_negatives_ivf(spark, sf_dir):
    """CORPUS-SCALE hard-negative mining (pipeline/similarity.py
    hard_negatives_ivf — the path the exact scorer's anchor cap points
    at): every vector is an anchor, candidates come from its nprobe=2
    best IVF buckets (nlist=5 centroids — a FIXED count independent of
    corpus size, stride ceil(N/5) from one cheap count), label filter
    rides the candidate join, top-5 per anchor.  No broadcast of
    anything corpus-sized — one shuffle join on centroid_id with
    bucket-bounded fan-out.  The oracle replays the deterministic
    quantizer (same count-derived stride), probing, label filter and
    ranking in SQL, so the hash checks the bucketed ALGORITHM
    (assignment tie-breaks included), not just plausible neighbors."""
    from .similarity import hard_negatives_ivf

    e = load_tables(spark, sf_dir)["embeddings"]
    return hard_negatives_ivf(e, k=5, nprobe=2, nlist=5)


def _sql_hard_negatives_ivf() -> str:
    from .similarity import SQL_COSINE

    cos_ac = SQL_COSINE.format(a="e.v", b="c.centv")
    cos_qc = SQL_COSINE.format(a="q.qv", b="c.centv")
    cos_qa = SQL_COSINE.format(a="p.qv", b="a.v")
    return f"""
WITH hni_e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
hni_cent AS (
  SELECT vec_id AS centroid_id, v AS centv
  FROM hni_e WHERE vec_id % (SELECT (count(*) + 4) // 5 FROM hni_e) = 0),
hni_assign AS (
  SELECT vid, v, label, centroid_id FROM (
    SELECT e.vec_id AS vid, e.v, e.label, c.centroid_id,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY round({cos_ac}, 6) DESC, c.centroid_id) AS r
    FROM hni_e e, hni_cent c) t WHERE r = 1),
hni_q AS (SELECT vec_id AS anchor_id, v AS qv, label AS a_label FROM hni_e),
hni_probes AS (
  SELECT anchor_id, qv, a_label, centroid_id FROM (
    SELECT q.anchor_id, q.qv, q.a_label, c.centroid_id,
      row_number() OVER (PARTITION BY q.anchor_id
        ORDER BY round({cos_qc}, 6) DESC, c.centroid_id) AS r
    FROM hni_q q, hni_cent c) t WHERE r <= 2),
hni_scored AS (
  SELECT p.anchor_id, a.vid AS neighbor_id,
         round({cos_qa}, 6) AS score
  FROM hni_probes p JOIN hni_assign a USING (centroid_id)
  WHERE p.anchor_id <> a.vid AND p.a_label <> a.label)
SELECT anchor_id, neighbor_id, score, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY anchor_id
            ORDER BY score DESC, neighbor_id)::INT AS rank
  FROM hni_scored) t WHERE rank <= 5
"""


def q_embedding_covariance(spark, sf_dir):
    """Distributed covariance of the leading 16 embedding dimensions
    (pipeline/similarity.py embedding_covariance) — the map-reduce half
    of PCA: per-row upper-triangular products explode map-side, partial
    aggregation combines per partition, and only |pairs| x partitions
    skinny rows cross the wire; 9dp-decimal rounded sums make the matrix
    hash-exact against the DuckDB mirror.  The driver-side eigenstep
    (pca_components) and the no-shuffle projection map (pca_project) are
    verified against numpy in tests/test_pq.py."""
    from .similarity import embedding_covariance

    e = load_tables(spark, sf_dir)["embeddings"]
    return embedding_covariance(e, dims=16)


def _sql_embedding_covariance() -> str:
    from .similarity import sql_embedding_covariance

    return sql_embedding_covariance("embeddings", dims=16)


def q_embedding_sq8(spark, sf_dir):
    """Scalar 8-bit quantization round-trip (pipeline/similarity.py
    sq8_error_stats): per-dimension corpus min/max calibration, 255-level
    codes, dequantize, per-vector RMSE — the 4x-compression sanity
    report before an ANN index switches to SQ8 codes.  Per-dim squared
    errors are rounded then summed as exact decimals, so the RMSE hash
    matches DuckDB at any partitioning."""
    from .similarity import sq8_error_stats

    e = load_tables(spark, sf_dir)["embeddings"]
    return sq8_error_stats(e)


def _sql_embedding_sq8() -> str:
    from .similarity import sql_sq8_error_stats

    return sql_sq8_error_stats("embeddings")


def q_embedding_normalize(spark, sf_dir):
    """L2 normalization at ingest (pipeline/similarity.py normalize_l2):
    per-vector norm, the first normalized component, and a unit check
    (sum of squares of the normalized vector) — all left-to-right folds
    with exact DuckDB mirrors.  Map-only; at scale this is the one-time
    projection that lets every downstream cosine scan skip both norm
    folds."""
    from .similarity import dot, norm2, normalize_l2

    e = load_tables(spark, sf_dir)["embeddings"]
    # spread the single parquet split: the three 64-slot folds per row are
    # CPU-bound and would otherwise evaluate on one core
    e = e.repartition(spark.sparkContext.defaultParallelism * 2)
    nv = normalize_l2(F.col("embedding"))
    return e.select(
        "vec_id",
        F.round(F.sqrt(norm2(F.col("embedding"))), 6).alias("l2_norm"),
        F.round(F.element_at(nv, 1), 6).alias("comp1"),
        F.round(dot(nv, nv), 6).alias("unit_check"))


_SQL_EMB_NORMALIZE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
n AS (
  SELECT vec_id, v,
    sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm
  FROM e
),
u AS (
  SELECT vec_id, nrm,
    CASE WHEN nrm = 0 THEN v
         ELSE list_transform(v, x -> x / nrm) END AS nv
  FROM n
)
SELECT vec_id, round(nrm, 6) AS l2_norm,
  round(nv[1], 6) AS comp1,
  round(list_sum(list_transform(nv, x -> x*x)), 6) AS unit_check
FROM u
"""


def q_iqr_outlier_filter(spark, sf_dir):
    """Tukey-fence outlier stats per event type (pipeline/curation.py
    iqr_outlier_stats): GK quantile summaries with accuracy above the
    group size, so the fences equal DuckDB's quantile_disc exactly —
    the curation filter that drops pathological values before training
    (at 100 TB drop accuracy to the default for O(accuracy) state)."""
    from .curation import iqr_outlier_stats

    ev = load_tables(spark, sf_dir)["events"]
    return iqr_outlier_stats(ev, "event_type", "value", k=1.5,
                             accuracy=10_000_000)


_SQL_IQR_OUTLIER = """
WITH fences AS (
  SELECT event_type,
    quantile_disc(value, 0.25) AS p25,
    quantile_disc(value, 0.75) AS p75
  FROM events GROUP BY event_type
),
b AS (
  SELECT event_type, p25 - 1.5 * (p75 - p25) AS lo,
         p75 + 1.5 * (p75 - p25) AS hi
  FROM fences
)
SELECT e.event_type, COUNT(*) AS n,
  SUM(CASE WHEN e.value < b.lo OR e.value > b.hi THEN 1 ELSE 0 END)::BIGINT
    AS n_outliers,
  round(MIN(b.lo), 6) AS lo_fence,
  round(MAX(b.hi), 6) AS hi_fence
FROM events e JOIN b USING (event_type)
GROUP BY e.event_type
"""


def q_similarity_pq(spark, sf_dir):
    """Product-quantization ANN top-10 (pipeline/similarity.py pq_topk):
    4 subspaces × 16 centroids (static codebooks = sub-vectors of the 16
    lowest-id corpus vectors — the SQL-expressible rule), ADC scan over
    m-byte codes, shortlist-64 exact cosine re-rank.  The oracle re-derives
    the entire PQ pipeline — codebooks, argmin encode, distance tables,
    ADC, shortlist, re-rank — so the hash certifies the compressed index
    end-to-end, not just a recall bound."""
    from .similarity import pq_topk

    e = load_tables(spark, sf_dir)["embeddings"]
    q = e.filter(F.col("vec_id") < 5)
    return pq_topk(q, e, k=10, m=4, ks=16, shortlist=64)


def _sql_similarity_pq(m: int = 4, ks: int = 16, sub: int = 16,
                       shortlist: int = 64, k: int = 10) -> str:
    d2 = ("list_sum(list_transform(list_zip({a}, b.cent), "
          "p -> (p[1]-p[2])*(p[1]-p[2])))")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
init AS (
  SELECT v, row_number() OVER (ORDER BY vec_id) - 1 AS c
  FROM (SELECT * FROM e ORDER BY vec_id LIMIT {ks})
),
books AS (
  SELECT j, c, v[j*{sub}+1 : (j+1)*{sub}] AS cent
  FROM init, (SELECT unnest(generate_series(0, {m - 1})) AS j)
),
enc0 AS (
  SELECT e.vec_id, b.j, b.c,
    {d2.format(a=f'e.v[b.j*{sub}+1 : (b.j+1)*{sub}]')} AS d2
  FROM e, books b
),
codes AS (
  SELECT vec_id, j, c FROM (
    SELECT vec_id, j, c,
      row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, c) AS r
    FROM enc0) WHERE r = 1
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
dt AS (
  SELECT q.query_id, b.j, b.c,
    round({d2.format(a=f'q.qv[b.j*{sub}+1 : (b.j+1)*{sub}]')}, 9) AS d
  FROM q, books b
),
adc AS (
  SELECT dt.query_id, c.vec_id AS neighbor_id, round(sum(dt.d), 9) AS adist
  FROM codes c JOIN dt ON dt.j = c.j AND dt.c = c.c
  WHERE c.vec_id != dt.query_id
  GROUP BY dt.query_id, c.vec_id
),
sl AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
      row_number() OVER (PARTITION BY query_id
                         ORDER BY adist, neighbor_id) AS r
    FROM adc) WHERE r <= {shortlist}
),
rr AS (
  SELECT s.query_id, s.neighbor_id,
    round({_COS.format(a='q.qv', b='c.v')}, 6) AS score
  FROM sl s
  JOIN q ON q.query_id = s.query_id
  JOIN e c ON c.vec_id = s.neighbor_id
)
SELECT query_id, neighbor_id, score, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, neighbor_id) AS rank
  FROM rr) WHERE rank <= {k}
"""


def q_doc_chunking(spark, sf_dir):
    """Token-window chunking (pipeline/chunking.py): every document split
    into 32-token windows with 8-token overlap — the map-only fan-out that
    feeds context packing and embedding jobs.  Chunk text is hashed so the
    gate rows stay narrow; the oracle re-derives the identical windows with
    generate_series + list slices."""
    from .chunking import chunk_by_tokens

    d = load_tables(spark, sf_dir)["documents"]
    ch = chunk_by_tokens(d, size=32, overlap=8)
    return ch.select(
        "doc_id", "chunk_id", "chunk_start", "n_chunk_tokens",
        F.md5(F.col("chunk_text")).alias("chunk_hash"))


def _sql_doc_chunking() -> str:
    from .chunking import sql_chunk_by_tokens

    return ("WITH " + sql_chunk_by_tokens("documents", size=32, overlap=8)[1:]
            + """
SELECT doc_id, chunk_id, chunk_start, n_chunk_tokens,
       md5(chunk_text) AS chunk_hash
FROM chunked_documents
""")


def q_dedup_substring_spans(spark, sf_dir):
    """Exact-substring dedup spans (pipeline/chunking.py, Lee et al. 2022
    shape): maximal runs of 8-gram positions duplicated across >= 2 docs of
    the augmented corpus — the token extents a cleaner would excise.  Plan:
    gram inverted index (60-bit hash shuffle key) -> df filter -> position
    semi-join -> per-doc gaps-and-islands window.  No all-pairs join."""
    from .chunking import duplicated_span_extents

    corpus = _aug_docs(spark, sf_dir)
    return duplicated_span_extents(corpus, n=8, min_df=2)


def _sql_dedup_substring_spans() -> str:
    from .chunking import sql_duplicated_span_extents

    return (f"WITH {_AUG_DOCS_SQL},"
            + sql_duplicated_span_extents("corpus", n=8, min_df=2)[1:]
            + "\nSELECT doc_id, span_start, span_end, span_tokens FROM sp_extents")


def q_heavy_hitters(spark, sf_dir):
    """Exact corpus heavy hitters (pipeline/terms.py): every token above
    1/64 frequency — per-partition *bucket*-count pigeonhole pruning
    (first exchange bounded by n_buckets x partitions, vocabulary-size
    independent) + exact recount of tokens in heavy buckets."""
    from .terms import heavy_hitters

    d = load_tables(spark, sf_dir)["documents"]
    return heavy_hitters(d, "text", threshold_inv=64)


def _sql_heavy_hitters_gate() -> str:
    from .terms import sql_heavy_hitters

    return sql_heavy_hitters("documents", "text", threshold_inv=64)


_GOPHER_PLANTS = [
    (3000000, "tiny doc"),                                   # ok_words
    (3000001, "\n".join(["- bullet item one"] * 10)),        # ok_bullets
    (3000002, "\n".join(["we will continue this later..."] * 5)),  # ellipsis
    (3000003, "data # value # table # row # part # key # item # batch "
              "# scan # merge # join # sort"),               # ok_symbols
    (3000004, "111 222 333 444 555 666 777 888 999 000 123 456"),  # alpha
    (3000005, " ".join(["incomprehensibility justification throughout "
                        "extraordinary happenings categorically"] * 2)),
]                                                            # mean_len


def q_gopher_rules(spark, sf_dir):
    """Gopher/MassiveText structural quality battery (curation.py
    gopher_rules): per-doc word-count / mean-word-length / symbol-ratio /
    bullet-line / ellipsis-line / alpha-word / stopword flags + keep, over
    documents plus 6 planted docs each violating exactly one rule family.
    One codegen'd projection — map-only at any scale; every ratio rounds
    to 6dp before its threshold so the flags hash identically."""
    from .curation import gopher_rules

    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    planted = spark.createDataFrame(_GOPHER_PLANTS,
                                    "doc_id long, text string")
    return gopher_rules(d.unionByName(planted), min_stopword_hits=1)


def _sql_gopher_rules_gate() -> str:
    from .curation import sql_gopher_rules

    ex = sql_gopher_rules(min_stopword_hits=1)
    base_cols = ["n_words", "mean_len", "sym_ratio", "bullet_frac",
                 "ellip_frac", "alpha_frac", "sw_hits"]
    flag_cols = ["ok_words", "ok_mean_len", "ok_symbols", "ok_bullets",
                 "ok_ellipsis", "ok_alpha", "ok_stopwords", "keep"]
    plants = ", ".join(
        "(" + str(i) + ", " + "'" + t.replace("'", "''").replace("\n", "' || chr(10) || '") + "')"
        for i, t in _GOPHER_PLANTS)
    base_sel = ",\n    ".join(f"{ex[c]} AS {c}" for c in base_cols)
    flag_sel = ",\n    ".join(f"{ex[c]} AS {c}" for c in flag_cols)
    return f"""
WITH gr_corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT * FROM (VALUES {plants}) v(doc_id, text)
),
gr_base AS (
  SELECT doc_id,
    {base_sel}
  FROM gr_corpus
)
SELECT doc_id, n_words, mean_len, sym_ratio, bullet_frac, ellip_frac,
       alpha_frac, sw_hits,
    {flag_sel}
FROM gr_base
"""


def q_bpe_learn(spark, sf_dir):
    """Distributed BPE vocabulary learning (pipeline/bpe.py): 10 merges
    learned over the word-frequency table — the corpus is scanned once;
    every merge round touches only the vocab relation (corpus-size-
    independent).  The oracle unrolls the identical 10 rounds (same
    separator/EOW representation, same left-to-right replace, same
    (count desc, left, right) tie-break) as MATERIALIZED CTEs."""
    from .bpe import bpe_learn

    d = load_tables(spark, sf_dir)["documents"]
    return bpe_learn(d, n_merges=10, vocab_partitions=1)


def q_bpe_segment_tokens(spark, sf_dir):
    """BPE APPLY path (pipeline/bpe.py bpe_segment): learn 10 merges, then
    tokenize every document with them and report per-doc word and
    BPE-token counts — the unit that matters for training-data budgeting
    under a real learned vocabulary (whitespace counts undercount; see
    text.bpe_ish_token_count for the regex approximation this replaces).

    Scale: learning is vocab-bounded (see bpe_learn); application is
    MAP-ONLY — the merge list is a constant-size model baked into the
    plan as literals (broadcast-by-construction), so segmentation costs
    one pass over the corpus with no shuffle before the per-doc count.
    The driver holds only the 10-row merge table (model fetch, not data
    collect).  Oracle: re-learns the same 10 merges as materialized CTEs
    and applies them as nested replaces — end-to-end hash-checked."""
    from .bpe import bpe_learn, bpe_segment

    d = load_tables(spark, sf_dir)["documents"]
    merges_df = bpe_learn(d, n_merges=10, vocab_partitions=1)
    merges = [(r["left"], r["right"])
              for r in merges_df.orderBy("rank").collect()]
    seg = bpe_segment(d.select("doc_id", "text"), merges)
    per_doc = seg.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_bpe_tokens").alias("n_bpe_tokens"))
    return (d.select("doc_id").distinct()
            .join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_words", F.lit(0)).cast("long")
                    .alias("n_words"),
                    F.coalesce("n_bpe_tokens", F.lit(0)).cast("long")
                    .alias("n_bpe_tokens"))
            .orderBy("doc_id"))


def _sql_bpe_segment_gate() -> str:
    from .bpe import sql_bpe_segment_tokens

    return sql_bpe_segment_tokens(n_merges=10) + " ORDER BY doc_id"


def _sql_bpe_learn_gate() -> str:
    from .bpe import sql_bpe_learn

    return sql_bpe_learn(n_merges=10)


def q_quality_classifier(spark, sf_dir):
    """Hashed linear quality classifier (pipeline/terms.py): per-document
    score from an integer weight fold over tokens (the label decides on the
    exact integer sum, so it can never flip on float rounding) — the shape
    of fasttext-style quality-filter inference: one codegen'd projection,
    no shuffle, no Python.  Per-doc output keeps the gate
    order-of-summation-free across engines (each score is a single
    deterministic fold + one division)."""
    from .terms import with_classifier

    d = load_tables(spark, sf_dir)["documents"]
    return (with_classifier(d.select("doc_id", "source", "text"))
            .select("doc_id", "source", "clf_score", "clf_label"))


def _sql_quality_classifier() -> str:
    from .terms import sql_classifier_score

    score, label = sql_classifier_score("text")
    return f"""
SELECT doc_id, source, {score} AS clf_score, {label} AS clf_label
FROM documents
"""


def q_unigram_logprob(spark, sf_dir):
    """Unigram-LM quality scoring (pipeline/scoring.py): add-0.5-smoothed
    unigram model fit on the corpus, every document scored by mean
    -ln p(token) — the cheapest perplexity-shaped quality signal.  Per-row
    logs rounded to 9dp then summed as exact decimals, so the per-doc mean
    is order-independent across engines and partitionings."""
    from .scoring import unigram_logprob_score

    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    return unigram_logprob_score(d)


def _sql_unigram_logprob() -> str:
    from .scoring import sql_unigram_logprob_score

    return sql_unigram_logprob_score("documents")


def q_bigram_logprob(spark, sf_dir):
    """Bigram-LM quality scoring (pipeline/scoring.py): one conditioning
    step deeper than unigram_logprob — word-salad with plausible words but
    implausible sequences lands in the tail.  The bigram stream is built
    map-side (token array zipped with its own tail, no positional join);
    prefix counts derive from the bigram table itself, so the model is one
    fine-grained aggregation."""
    from .scoring import bigram_logprob_score

    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    return bigram_logprob_score(d)


def _sql_bigram_logprob() -> str:
    from .scoring import sql_bigram_logprob_score

    return sql_bigram_logprob_score("documents")


def q_tfidf_doc_topk(spark, sf_dir):
    """Sparse document similarity (pipeline/terms.py tfidf_doc_topk):
    per-doc top-5 peers by TF-IDF-weighted cosine over 3-token shingle
    phrases — the inverted-index (model-free) half of the similarity
    family.  Stop-phrase df cap bounds every shingle's pair fan-out at
    C(max_df, 2) — max_df=30 keeps the pair stream ~10x smaller than a
    df-100 cap at sf0.1's tiny shared vocabulary (measured 24 s -> ~3 s)
    while still admitting any phrase rarer than 6% of the sf0.01 corpus;
    decimal dot sums keep the score hash-exact."""
    from .terms import tfidf_doc_topk

    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    return tfidf_doc_topk(d, k=5, max_df=30)


def _sql_tfidf_doc_topk() -> str:
    from .terms import sql_tfidf_doc_topk

    return sql_tfidf_doc_topk("documents", k=5, max_df=30)


def q_source_kl(spark, sf_dir):
    """Source-mixture divergence (pipeline/terms.py source_kl_divergence):
    per-source KL of the smoothed unigram distribution from the corpus
    blend, in bits — the data-mixing diagnostic that feeds mixture-weight
    decisions.  One token explode, all aggregates term- or group-keyed,
    corpus counts derived from the group table (one scan)."""
    from .terms import source_kl_divergence

    d = load_tables(spark, sf_dir)["documents"] \
        .select("doc_id", "source", "text")
    return source_kl_divergence(d)


def _sql_source_kl() -> str:
    from .terms import sql_source_kl_divergence

    return sql_source_kl_divergence("documents")


def q_perplexity_buckets(spark, sf_dir):
    """CCNet-style perplexity bucketing (pipeline/scoring.py
    perplexity_buckets): every document scored by a Jelinek-Mercer
    interpolated bigram+unigram LM fit on the corpus itself, then cut
    into 3 equal-count head/middle/tail buckets.  The gate uses the exact
    ntile path (total (score, doc_id) order → hash-stable); the
    broadcast-cuts path — no global sort, the 100 TB filter shape — is
    asserted equivalent-up-to-boundaries in tests/test_scoring.py."""
    from .scoring import perplexity_buckets

    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    return perplexity_buckets(d, n_buckets=3)


def _sql_perplexity_buckets() -> str:
    from .scoring import sql_perplexity_buckets

    return sql_perplexity_buckets("documents", n_buckets=3)


_BM25_QUERY = ["spark", "window", "join", "stream"]


def q_bm25_rank(spark, sf_dir):
    """BM25 top-20 retrieval (pipeline/scoring.py) for a fixed query over
    the documents corpus — query-anchored curation/subsetting.  The token
    stream filters to the 4 query terms before any aggregation (the
    inverted-index seek shape), per-term scores sum as exact decimals,
    ties broken by doc_id."""
    from .scoring import bm25_score

    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    return bm25_score(d, _BM25_QUERY, k=20)


def _sql_bm25_rank() -> str:
    from .scoring import sql_bm25_score

    return sql_bm25_score("documents", _BM25_QUERY, k=20)


def q_bloom_decontaminate(spark, sf_dir):
    """Bloom-screen decontamination (pipeline/scoring.py): benchmark =
    doc_id % 50 == 3 folded into a 4096-bit / 4-hash Bloom filter
    (broadcast as its set-bit positions, O(bits) regardless of benchmark
    size); every corpus doc reports its 5-gram count, Bloom-hit count, and
    flagged bit.  The 100 TB screen-then-verify front half of the exact
    `decontaminate` gate — no false negatives, bounded false positives."""
    from .scoring import bloom_decontaminate

    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    ev = d.filter(F.col("doc_id") % 50 == 3)
    return bloom_decontaminate(d, ev, n=5, bits=4096, k_hashes=4)


def _sql_bloom_decontaminate() -> str:
    from .scoring import sql_bloom_decontaminate

    body = sql_bloom_decontaminate("bd_corpus", "bd_bench", n=5,
                                   bits=4096, k_hashes=4)
    return f"""
WITH bd_corpus AS (SELECT doc_id, text FROM documents),
bd_bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 = 3),
{body[1:]}
SELECT * FROM bl_out
"""


# ---------------------------------------------------------------------------
# CDC / SCD2 (pipeline/cdc.py)
# ---------------------------------------------------------------------------

# Deterministic "next crawl" of the documents snapshot, identical in the
# Spark plan and the oracle CTE: doc_id % 11 == 3 dropped, doc_id % 7 == 0
# re-crawled with changed text, doc_id % 13 == 5 re-landed as new ids.
_CDC_COMPARE = ["text", "lang", "source", "n_chars"]

_CDC_NEW_SQL = """
cdc_new AS (
  SELECT doc_id,
    CASE WHEN doc_id % 7 = 0 THEN text || ' [recrawled v2]' ELSE text END
      AS text,
    lang, source,
    CASE WHEN doc_id % 7 = 0 THEN n_chars + 17 ELSE n_chars END AS n_chars
  FROM documents WHERE doc_id % 11 <> 3
  UNION ALL
  SELECT doc_id + 5000000, text || ' newly crawled', lang, source,
    n_chars + 14
  FROM documents WHERE doc_id % 13 = 5
)"""


def _cdc_new_crawl(d):
    survived = d.filter(F.col("doc_id") % 11 != 3)
    mutated = survived.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.col("text"), F.lit(" [recrawled v2]")))
        .otherwise(F.col("text")).alias("text"),
        "lang", "source",
        F.when(F.col("doc_id") % 7 == 0, F.col("n_chars") + 17)
        .otherwise(F.col("n_chars")).alias("n_chars"))
    inserted = d.filter(F.col("doc_id") % 13 == 5).select(
        (F.col("doc_id") + 5000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" newly crawled")).alias("text"),
        "lang", "source", (F.col("n_chars") + 14).alias("n_chars"))
    return mutated.unionByName(inserted)


def q_cdc_snapshot_diff(spark, sf_dir):
    """Snapshot-diff changelog (pipeline/cdc.py): documents vs a
    deterministic next crawl; every changed key classified
    insert/update/delete with its old/new row fingerprints.  One
    key-partitioned full-outer join — the MERGE-source shape."""
    from .cdc import snapshot_diff

    d = load_tables(spark, sf_dir)["documents"]
    diff = snapshot_diff(d, _cdc_new_crawl(d), ["doc_id"], _CDC_COMPARE)
    return diff.filter(F.col("change_type") != "unchanged")


def _sql_cdc_snapshot_diff() -> str:
    from .cdc import sql_snapshot_diff

    body = sql_snapshot_diff("documents", "cdc_new", ["doc_id"],
                             _CDC_COMPARE)
    return f"""
WITH {_CDC_NEW_SQL[1:]},
{body[1:]}
SELECT doc_id, change_type, old_fp, new_fp FROM cdc_diff
WHERE change_type <> 'unchanged'
"""


def q_scd2_merge(spark, sf_dir):
    """SCD2 merge (pipeline/cdc.py): bootstrap the dimension from the
    documents snapshot at batch 0, apply the next crawl at batch 1 —
    updated/deleted keys close (valid_to=1), inserted/updated keys open a
    new current version.  History never rejoins any shuffle."""
    from .cdc import scd2_apply, scd2_init

    d = load_tables(spark, sf_dir)["documents"]
    dim = scd2_init(d, batch_id=0)
    merged = scd2_apply(dim, _cdc_new_crawl(d), ["doc_id"], 1,
                        _CDC_COMPARE)
    return merged.select("doc_id", "source", "n_chars",
                         F.md5(F.col("text")).alias("text_fp"),
                         "valid_from", "valid_to",
                         F.col("valid_to").isNull().alias("is_current"))


def _sql_scd2_merge() -> str:
    from .cdc import sql_snapshot_diff

    body = sql_snapshot_diff("documents", "cdc_new", ["doc_id"],
                             _CDC_COMPARE)
    return f"""
WITH {_CDC_NEW_SQL[1:]},
{body[1:]}
SELECT d.doc_id, d.source, d.n_chars, md5(d.text) AS text_fp,
  0::BIGINT AS valid_from,
  CASE WHEN f.change_type IN ('update', 'delete') THEN 1::BIGINT END
    AS valid_to,
  f.change_type NOT IN ('update', 'delete') AS is_current
FROM documents d JOIN cdc_diff f USING (doc_id)
UNION ALL
SELECT n.doc_id, n.source, n.n_chars, md5(n.text) AS text_fp,
  1::BIGINT AS valid_from, NULL::BIGINT AS valid_to, true AS is_current
FROM cdc_new n JOIN cdc_diff f USING (doc_id)
WHERE f.change_type IN ('insert', 'update')
"""


# ---------------------------------------------------------------------------
# Count-min sketch (pipeline/sketches.py)
# ---------------------------------------------------------------------------

def q_countmin_term_counts(spark, sf_dir):
    """Count-min point estimates (pipeline/sketches.py) for the corpus's
    top-20 terms: depth-4 × width-512 sketch — shuffle cardinality capped
    at depth·width regardless of vocabulary — vs the exact counts.  The
    sketch is md5-affine integer arithmetic, so the DuckDB oracle
    reproduces every estimate bit-for-bit (overshoot included)."""
    from .sketches import countmin_estimate, countmin_table

    d = load_tables(spark, sf_dir)["documents"]
    # spread the single parquet split so tokenization + the 4-cell md5
    # explode run on all cores (see scoring._spread)
    parts = spark.sparkContext.defaultParallelism * 2
    toks = d.repartition(parts).select(
        F.explode(TX.tokens(F.col("text"))).alias("term"))
    exact = toks.groupBy("term").agg(F.count(F.lit(1)).alias("exact_c"))
    probes = exact.orderBy(F.desc("exact_c"), F.asc("term")).limit(20)
    sketch = countmin_table(toks, [], "term", depth=4, width=512)
    est = countmin_estimate(sketch, probes.select("term"), [], "term",
                            depth=4, width=512)
    return (probes.join(est, "term")
            .select("term", "exact_c", "est_c",
                    (F.col("est_c") - F.col("exact_c")).alias("overshoot")))


def _sql_countmin_term_counts() -> str:
    from .sketches import sql_countmin_estimate
    from .text import sql_tokens

    body = sql_countmin_estimate("cm_toks", "cm_probes", depth=4, width=512)
    return f"""
WITH cm_toks AS (
  SELECT unnest({sql_tokens('text')}) AS term FROM documents
),
cm_exact AS (SELECT term, COUNT(*) AS exact_c FROM cm_toks GROUP BY term),
cm_probes AS (SELECT term, exact_c FROM cm_exact
              ORDER BY exact_c DESC, term ASC LIMIT 20),
{body[1:]}
SELECT p.term, p.exact_c, e.est_c, e.est_c - p.exact_c AS overshoot
FROM cm_probes p JOIN cm_est e USING (term)
"""


# ---------------------------------------------------------------------------
# n-gram novelty + source overlap matrix
# ---------------------------------------------------------------------------

def q_ngram_novelty(spark, sf_dir):
    """Cross-document n-gram novelty (pipeline/scoring.py) on the augmented
    corpus (planted near-dups share most of their trigrams): per doc, the
    fraction of its distinct trigrams appearing in no other document.
    Inverted-index shape — gram-hash shuffle, no pair join."""
    from .scoring import ngram_novelty_score

    return ngram_novelty_score(_aug_docs(spark, sf_dir))


def _sql_ngram_novelty() -> str:
    from .scoring import sql_ngram_novelty_score

    inner = sql_ngram_novelty_score("corpus")
    # splice the augmented-corpus CTE ahead of the scorer's own WITH
    return f"WITH {_AUG_DOCS_SQL[1:]}, " + inner.lstrip()[len("WITH "):]


def q_source_overlap_matrix(spark, sf_dir):
    """Pairwise source-level shingle overlap (pipeline/dedup.py
    source_overlap_matrix): exact shared-shingle counts + Jaccard for every
    source pair.  A mirror source (every doc_id % 9 == 2 re-landed under
    'mirror:<source>') plants known overlap, as the synthetic sources are
    otherwise near-disjoint."""
    from .dedup import source_overlap_matrix

    d = load_tables(spark, sf_dir)["documents"]
    mirr = d.filter(F.col("doc_id") % 9 == 2).select(
        F.concat(F.lit("mirror:"), F.col("source")).alias("source"), "text")
    corpus = d.select("source", "text").unionByName(mirr)
    return source_overlap_matrix(corpus, "source", text_col="text")


def _sql_source_overlap_matrix() -> str:
    hs = DSQL.hashed_shingles("text", 3)
    return f"""
WITH som_corpus AS (
  SELECT source, text FROM documents
  UNION ALL
  SELECT 'mirror:' || source, text FROM documents WHERE doc_id % 9 = 2
),
som_gs AS (
  SELECT DISTINCT source AS g, unnest({hs}) AS h FROM som_corpus
),
som_sizes AS (SELECT g, COUNT(*) AS n_set FROM som_gs GROUP BY g),
som_pairs AS (
  SELECT a.g AS group_a, b.g AS group_b, COUNT(*) AS n_common
  FROM som_gs a JOIN som_gs b ON a.h = b.h AND a.g < b.g
  GROUP BY a.g, b.g
)
SELECT group_a, group_b, sa.n_set AS n_a, sb.n_set AS n_b, n_common,
  round(n_common / (sa.n_set + sb.n_set - n_common), 6) AS jaccard
FROM som_pairs
JOIN som_sizes sa ON sa.g = group_a
JOIN som_sizes sb ON sb.g = group_b
"""


def q_source_overlap_sketch(spark, sf_dir):
    """Sketch-mode source overlap (pipeline/dedup.py source_overlap_sketch
    — the documented scale fallback for thousands of groups): per-group
    K=64-slot MinHash corpus signatures from ONE mergeable aggregation,
    compared pairwise at group level.  Same mirrored-source fixture as the
    exact matrix so known overlap is planted; the estimate itself is
    hash-checked (same double affine mix as corpus_overlap; K=32 keeps
    the min-aggregate expression inside whole-stage codegen limits —
    estimate std ~ 0.09 at J=0.5, plenty for a contamination screen)."""
    from .dedup import source_overlap_sketch

    d = load_tables(spark, sf_dir)["documents"]
    mirr = d.filter(F.col("doc_id") % 9 == 2).select(
        F.concat(F.lit("mirror:"), F.col("source")).alias("source"), "text")
    corpus = d.select("source", "text").unionByName(mirr)
    return source_overlap_sketch(corpus, "source", text_col="text", k=32)


def _sql_source_overlap_sketch(k: int = 32) -> str:
    hs = DSQL.hashed_shingles("text", 3)
    mins = ", ".join(
        f"min({DSQL.mix(DSQL.mix('h', i), i + k)}) AS m{i}"
        for i in range(k))
    eq = " + ".join(
        f"CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END" for i in range(k))
    return f"""
WITH sos_corpus AS (
  SELECT source, text FROM documents
  UNION ALL
  SELECT 'mirror:' || source, text FROM documents WHERE doc_id % 9 = 2
),
sos_gs AS (
  SELECT DISTINCT source AS g, unnest({hs}) AS h FROM sos_corpus
),
sos_sig AS (
  SELECT g, COUNT(*) AS n_set, {mins} FROM sos_gs GROUP BY g
)
SELECT sa.g AS group_a, sb.g AS group_b, sa.n_set AS n_a, sb.n_set AS n_b,
  round(({eq}) / {float(k)}, 6) AS est_jaccard
FROM sos_sig sa JOIN sos_sig sb ON sa.g < sb.g
"""


def q_pagerank_event_graph(spark, sf_dir):
    """Weighted PageRank (pipeline/graph.py) over the event-type transition
    graph (the same lead()-window edges as `event_transitions`): 10 power
    steps, damping 0.85, exact-decimal contribution sums.  The graph here
    is small; the operator's per-iteration cost is two node-key shuffles
    regardless of |V| (see module docstring), and the oracle unrolls all
    10 iterations."""
    from .graph import pagerank

    ev = load_tables(spark, sf_dir)["events"]
    w = window_spec(partition_by=["user_id"],
                    order_by=[F.col("ts").asc(), F.col("event_id").asc()])
    edges = (ev.select(F.col("event_type").alias("src"),
                       F.lead("event_type").over(w).alias("dst"))
             .filter(F.col("dst").isNotNull())
             .groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n")))
    return pagerank(edges, weight="n", damping=0.85, iterations=10) \
        .withColumnRenamed("node", "event_type")


def _sql_pagerank_event_graph() -> str:
    from .graph import sql_pagerank

    body = sql_pagerank("pr_edges", weight="n", damping=0.85, iterations=10)
    return f"""
WITH pr_nxt AS (
  SELECT event_type AS src,
    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS dst
  FROM events
),
pr_edges AS (
  SELECT src, dst, COUNT(*) AS n FROM pr_nxt WHERE dst IS NOT NULL
  GROUP BY src, dst
),{body}
SELECT node AS event_type, rank FROM pr_out
"""


def q_incremental_agg(spark, sf_dir):
    """Incremental materialized-view maintenance (pipeline/cdc.py
    agg_state/merge_agg_state): a standing per-key aggregate state built
    from pre-1997 orders merges with the 1997+ delta batch — and the
    oracle recomputes the aggregate FROM SCRATCH over all orders, so the
    hash proves the merge is indistinguishable from a full rescan
    (count/sum/min/max/avg; decimal sums make the split point
    irrelevant).  Refresh cost is O(delta + touched keys); history is
    never rescanned."""
    from .cdc import agg_state, merge_agg_state

    o = load_tables(spark, sf_dir)["orders"].select(
        (F.col("o_custkey") % 500).alias("kg"), "o_orderdate",
        "o_totalprice")
    state = agg_state(o.filter(F.col("o_orderdate") < "1997-01-01"),
                      ["kg"], "o_totalprice")
    delta = agg_state(o.filter(F.col("o_orderdate") >= "1997-01-01"),
                      ["kg"], "o_totalprice")
    merged = merge_agg_state(state, delta, ["kg"])
    return merged.select(
        "kg", "n", F.col("s").cast("double").alias("total"),
        "mn", "mx",
        F.round(F.col("s").cast("double") / F.col("n"), 6).alias("avg"))


def _sql_incremental_agg() -> str:
    from .cdc import sql_agg_state

    body = sql_agg_state(
        "(SELECT o_custkey % 500 AS kg, o_totalprice FROM orders)",
        ["kg"], "o_totalprice")
    return f"""
WITH full_state AS ({body})
SELECT kg, n, s::DOUBLE AS total, mn, mx,
  round(s::DOUBLE / n, 6) AS avg
FROM full_state
"""


def q_association_rules(spark, sf_dir):
    """Market-basket association rules (pipeline/basket.py): co-purchased
    part groups per order with support / confidence / lift from exact
    counts.  The pair join keys on the BASKET, so fan-out is bounded by
    basket size (the max_basket occupancy cap guards pathological
    baskets); items never key a join before counting."""
    from .basket import association_rules

    li = (load_tables(spark, sf_dir)["lineitem"]
          .select("l_orderkey", (F.col("l_partkey") % 97).alias("pg")))
    return association_rules(li, "l_orderkey", "pg",
                             min_pair_count=30, max_basket=50)


def _sql_association_rules() -> str:
    from .basket import sql_association_rules

    return sql_association_rules(
        "(SELECT l_orderkey, l_partkey % 97 AS pg FROM lineitem)",
        "l_orderkey", "pg", min_pair_count=30, max_basket=50)


def q_label_propagation(spark, sf_dir):
    """Deterministic label-propagation communities (pipeline/graph.py
    label_propagation: synchronous steps, mode-of-neighbors with min-label
    tie-break) over the bipartite customer—supplier trade graph
    (orders ⋈ lineitem over the 1998 order tail, node ids prefixed
    'c'/'s').  All-integer/string
    arithmetic, so the unrolled DuckDB oracle matches hash-exactly; the
    operator's per-iteration cost is two node-key shuffles regardless of
    |V| (see module docstring)."""
    from .graph import label_propagation

    t = load_tables(spark, sf_dir)
    edges = (t["lineitem"].select("l_orderkey", "l_suppkey")
             .join(t["orders"]
                   .filter(F.col("o_orderdate") >= "1998-01-01")
                   .select("o_orderkey", "o_custkey"),
                   F.col("l_orderkey") == F.col("o_orderkey"))
             .select(
                 F.concat(F.lit("c"),
                          F.col("o_custkey").cast("string")).alias("src"),
                 F.concat(F.lit("s"),
                          F.col("l_suppkey").cast("string")).alias("dst")))
    return label_propagation(edges, iterations=4)


def _sql_label_propagation_gate() -> str:
    from .graph import sql_label_propagation

    body = sql_label_propagation("lp_edges", iterations=4)
    return f"""
WITH lp_edges AS (
  SELECT 'c' || o_custkey::VARCHAR AS src,
         's' || l_suppkey::VARCHAR AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderdate >= DATE '1998-01-01'
),{body}
SELECT node, label FROM lp_out
"""


_STREAM_SRC_BUILT: set = set()


def q_streaming_sessions(spark, sf_dir):
    """Structured Streaming session rollup as a HASH gate (the streaming
    surface previously had only batch-parity tests): events re-land once
    per (session, sf_dir) as a µs-timestamp parquet stream source, a REAL
    streaming query (``F.session_window`` + 2 h watermark,
    trigger=availableNow) runs to completion through ``foreachBatch`` into
    parquet (streaming/operators.py run_stream_to_parquet), and the
    WRITTEN files read back are the result.  Append mode emits exactly
    the sessions finalized by the end-of-stream watermark (session_end ≤
    max(ts) − 2 h); the oracle is an independent DuckDB sessionization
    with the same strict-gap semantics and cutoff.  sum_value routes
    through exact decimals inside the streaming aggregate, so the hash is
    partition- and trigger-order-independent."""
    import shutil
    import tempfile
    import uuid

    from ..streaming.operators import (
        read_stream_parquet, run_stream_to_parquet, session_rollup,
    )

    from ..queries import scratch_dir
    base = scratch_dir(spark, sf_dir, "stream_gate")
    src = _os.path.join(base, "src")
    key = (spark.sparkContext.applicationId, _os.path.abspath(sf_dir))
    if key not in _STREAM_SRC_BUILT or not _os.path.exists(src):
        shutil.rmtree(base, ignore_errors=True)
        load_tables(spark, sf_dir)["events"].write.mode(
            "overwrite").parquet(src)
        _STREAM_SRC_BUILT.add(key)
    run_id = uuid.uuid4().hex[:8]
    out = _os.path.join(base, f"out-{run_id}")
    ckpt = _os.path.join(base, f"ckpt-{run_id}")
    batch = spark.read.parquet(src)
    stream = read_stream_parquet(spark, src, batch.schema)
    got = run_stream_to_parquet(
        session_rollup(stream, gap="30 minutes"), out, ckpt)
    return got.select("user_id", "session_start", "session_end",
                      "n_events", F.round("sum_value", 6).alias("sum_value"))


_SQL_STREAMING_SESSIONS = """
WITH g AS (
  SELECT user_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR date_diff('microsecond', lag(ts) OVER w, ts)
              >= 1800 * 1000000 THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, ts, value,
    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM g),
sess AS (
  SELECT user_id, MIN(ts) AS session_start,
         MAX(ts) + INTERVAL 30 MINUTE AS session_end,
         COUNT(*) AS n_events,
         round(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 6)
           AS sum_value
  FROM s GROUP BY user_id, sid)
SELECT user_id, session_start, session_end, n_events, sum_value
FROM sess
WHERE session_end <= (SELECT MAX(ts) - INTERVAL 2 HOUR FROM events)
"""


def q_dsir_select(spark, sf_dir):
    """DSIR importance resampling (pipeline/selection.py, Xie et al.
    arXiv:2302.03169): select the 100 non-English documents whose hashed
    unigram+bigram feature distribution is most English-like, by Gumbel
    top-k over importance log-weights (target model: lang='en' docs;
    pool model: the rest; 2048 hashed buckets, add-0.5 smoothing).

    Scale: both models are bucket-bounded aggregations (2048 rows max
    regardless of corpus size); the LLR table broadcasts to the scoring
    join; the only doc-keyed shuffle is the per-doc weight sum; the
    Gumbel draw is a pure function of (doc_id, seed), so the weighted
    sample is reproducible — and hash-checked — in the oracle."""
    from .selection import dsir_select

    d = load_tables(spark, sf_dir)["documents"]
    return dsir_select(d, F.col("lang") == "en", k=100,
                       n_buckets=2048, seed=7)


def _sql_dsir_select() -> str:
    from .selection import sql_dsir_select

    return sql_dsir_select("documents", "lang = 'en'", 100,
                           n_buckets=2048, seed=7)


def q_logreg_quality(spark, sf_dir):
    """Quality-classifier TRAINING (pipeline/classifier.py): logistic
    regression by 20 full-batch GD iterations over bounded text features
    (stopword/punct ratios, capped token/char counts), label = long-doc
    (n_chars ≥ 300 — learnable through the capped char feature, so the
    gate demonstrates CONVERGENCE: ~0.99 train accuracy vs a 0.51 base
    rate, not just a weight trajectory).  This is the training half of
    the fastText-style filter whose inference half is the
    quality_classifier gate.  Each iteration is ONE map-side-combinable
    aggregation over the persisted featurized corpus; the driver holds
    only the 5-float model.  The oracle unrolls the exact weight
    trajectory as chained 1-row CTEs (same 9dp-rounded decimal gradient
    sums), so the learned weights AND training accuracy are hash-checked,
    not eyeballed."""
    from .classifier import (
        FEATURE_COLS, logreg_predict, logreg_train, quality_features)

    d = load_tables(spark, sf_dir)["documents"]
    base = quality_features(d.select("text", "n_chars")).withColumn(
        "y", (F.col("n_chars") >= 300).cast("double"))
    w, b = logreg_train(base, FEATURE_COLS, "y", iterations=20, lr=8.0)
    pred = logreg_predict(base, w, b, FEATURE_COLS)
    return pred.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg((F.col("pred") == (F.col("y") == 1.0))
                      .cast("double")), 6).alias("train_accuracy"),
    ).select(
        "n", F.lit(20).cast("long").alias("iterations"),
        *[F.round(F.lit(w[j]), 6).alias(f"w_{c}")
          for j, c in enumerate(FEATURE_COLS)],
        F.round(F.lit(b), 6).alias("bias"),
        "train_accuracy")


def _sql_logreg_quality() -> str:
    from .classifier import sql_logreg_train, sql_quality_features

    return sql_logreg_train("documents", sql_quality_features("text"),
                            "n_chars >= 300", iterations=20, lr=8.0)


def q_skew_diagnose(spark, sf_dir):
    """Shuffle-key skew report (operators/skew.py skew_diagnose) for the
    three fact-table keys a real deployment would shuffle on: per key,
    the count distribution, skew factor (hottest key vs mean), top-1 row
    share, and the recommended salt for salted_agg/salted_join.  Each
    diagnosis costs exactly one groupBy on the candidate key; the
    summaries are 1-row — the union is 3 rows, fully oracle-exact."""
    from ..operators.skew import skew_diagnose

    t = load_tables(spark, sf_dir)
    parts = [
        skew_diagnose(t["events"], ["user_id"], "events.user_id"),
        skew_diagnose(t["orders"], ["o_custkey"], "orders.o_custkey"),
        skew_diagnose(t["lineitem"], ["l_suppkey"], "lineitem.l_suppkey"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("key")


def _sql_skew_diagnose() -> str:
    from ..operators.skew import sql_skew_diagnose

    parts = [
        sql_skew_diagnose("events", ["user_id"], "events.user_id"),
        sql_skew_diagnose("orders", ["o_custkey"], "orders.o_custkey"),
        sql_skew_diagnose("lineitem", ["l_suppkey"],
                          "lineitem.l_suppkey"),
    ]
    return ("SELECT * FROM (" + " UNION ALL ".join(
        f"({p})" for p in parts) + ") u ORDER BY key")


def _sql_ann_recall() -> str:
    """Composes the committed brute-force and IVF mirrors (identical
    query set and k) into a per-query recall report."""
    return f"""
SELECT b.query_id, b.n_exact,
  coalesce(h.n_hit, 0)::BIGINT AS n_hit,
  round(coalesce(h.n_hit, 0)::DOUBLE / b.n_exact, 6) AS recall
FROM (SELECT query_id, COUNT(*)::BIGINT AS n_exact
      FROM ({_SQL_SIM_TOPK}) bf GROUP BY 1) b
LEFT JOIN (
  SELECT query_id, COUNT(*) AS n_hit
  FROM ({_SQL_SIM_IVF}) i
  JOIN (SELECT query_id AS bq, neighbor_id AS bn
        FROM ({_SQL_SIM_TOPK}) bf2) b2
    ON i.query_id = b2.bq AND i.neighbor_id = b2.bn
  GROUP BY 1) h USING (query_id)
ORDER BY query_id
"""


def q_gapfill_resample(spark, sf_dir):
    """Time-bucket gap filling (pipeline/rollup.py gapfill — the
    TimescaleDB time_bucket_gapfill shape): regularize each event type's
    series onto an hourly grid and fill the empty buckets, LOCF and
    linear interpolation unioned under a method label.  Per key the grid
    is bounded by time span, not row count (dense keys collapse into
    buckets first); the fill is two window passes over (key, bucket)."""
    from .rollup import gapfill

    ev = load_tables(spark, sf_dir)["events"]
    locf = gapfill(ev, method="locf").select(
        F.lit("locf").alias("method"), "*")
    lin = gapfill(ev, method="linear").select(
        F.lit("linear").alias("method"), "*")
    return locf.unionByName(lin).orderBy("method", "event_type",
                                         "bucket_ts")


def _sql_gapfill_resample() -> str:
    from .rollup import sql_gapfill

    locf = sql_gapfill(method="locf")
    lin = sql_gapfill(method="linear")
    return (f"SELECT * FROM (SELECT 'locf' AS method, * FROM ({locf}) a "
            f"UNION ALL SELECT 'linear' AS method, * FROM ({lin}) b) u "
            f"ORDER BY method, event_type, bucket_ts")


_EXPECT_RULES = [
    ("not_null", "l_orderkey"),
    ("not_null", "l_shipdate"),
    ("range", "l_discount", 0.0, 0.1),
    ("range", "l_quantity", 1.0, 50.0),
    ("in_set", "l_returnflag", ["A", "N", "R"]),
    ("matches", "l_linestatus", "^[FO]$"),
    ("unique", "l_orderkey_l_linenumber"),
]


def q_validate_expectations(spark, sf_dir):
    """Declarative data-quality gate (operators/expectations.py): the
    dbt-test / Great-Expectations shape over lineitem — null checks,
    value ranges, categorical membership, regex, composite-key
    uniqueness, and orderkey referential containment against orders.
    All row-level rules fold into ONE scan (a single aggregate of
    conditional counts); uniqueness costs one key-count aggregate; the
    FK check is one broadcast anti-probe against distinct orderkeys."""
    from ..operators.expectations import validate_expectations

    t = load_tables(spark, sf_dir)
    li = t["lineitem"].withColumn(
        "l_orderkey_l_linenumber",
        F.concat_ws("#", F.col("l_orderkey"), F.col("l_linenumber")))
    rules = list(_EXPECT_RULES) + [
        ("fk", "l_orderkey", t["orders"], "o_orderkey")]
    return validate_expectations(li, rules)


def _sql_validate_expectations() -> str:
    from ..operators.expectations import sql_validate_expectations

    rules = list(_EXPECT_RULES) + [
        ("fk", "l_orderkey", "orders", "o_orderkey")]
    return sql_validate_expectations(
        "(SELECT *, l_orderkey || '#' || l_linenumber AS "
        "l_orderkey_l_linenumber FROM lineitem)", rules)


def q_join_size_estimate(spark, sf_dir):
    """Exact join-cardinality pre-flight (operators/skew.py
    join_size_estimate): for two prospective equi-joins, the output row
    count, matched-key count, hottest key-pair output, and amplification
    factor — computed from per-key COUNT tables (|distinct keys| rows)
    instead of paying the join.  The companion to skew_diagnose: together
    they answer "how big is this shuffle's output and does one task own
    it" before the job runs."""
    from ..operators.skew import join_size_estimate

    t = load_tables(spark, sf_dir)
    a = join_size_estimate(t["orders"], "o_orderkey",
                           t["lineitem"], "l_orderkey",
                           "orders*lineitem")
    b = join_size_estimate(t["customer"], "c_custkey",
                           t["orders"], "o_custkey",
                           "customer*orders")
    return a.unionByName(b).orderBy("join_name")


def _sql_join_size_estimate() -> str:
    from ..operators.skew import sql_join_size_estimate

    a = sql_join_size_estimate("orders", "o_orderkey",
                               "lineitem", "l_orderkey",
                               "orders*lineitem")
    b = sql_join_size_estimate("customer", "c_custkey",
                               "orders", "o_custkey", "customer*orders")
    return (f"SELECT * FROM (({a}) UNION ALL ({b})) u ORDER BY join_name")


_ZORDER_PREDS = [
    ("mid_box", {"user_id": (0.4, 0.6), "value": (0.4, 0.6)}),
    ("user_slice", {"user_id": (0.45, 0.55)}),
    ("value_slice", {"value": (0.45, 0.55)}),
]


def q_zorder_skipping(spark, sf_dir):
    """Z-order layout pruning report (sources/layout.py): bucket events on
    (user_id, value), Morton-interleave, and for three rectangle
    predicates count the cells a min/max-pruning scan must touch under
    the Z-order layout vs each single-column sort — the analytic,
    oracle-exact form of the file-skipping decision that dominates scan
    cost at 100 TB.  One 1-row min/max broadcast + one bounded-domain
    cell aggregation per (predicate, layout)."""
    from ..sources.layout import zorder_skipping_stats

    ev = load_tables(spark, sf_dir)["events"]
    return zorder_skipping_stats(ev, ["user_id", "value"], _ZORDER_PREDS)


def _sql_zorder_skipping() -> str:
    from ..sources.layout import sql_zorder_skipping_stats

    return sql_zorder_skipping_stats("events", ["user_id", "value"],
                                     _ZORDER_PREDS)


def q_schema_evolution(spark, sf_dir):
    """Schema-evolution read (mergeSchema): two parquet generations land
    in one table directory — v1 rows lack the o_orderpriority column that
    v2 adds — and a mergeSchema read unions them by NAME, nulling the
    missing column (the lakehouse schema-drift contract; bare
    positional/strict readers would refuse or misalign).  The gate
    aggregates over the merged frame with the null group made explicit;
    the oracle recomputes the expected merge closed-form from the source
    table, so a wrong union (dropped column, misaligned rows, non-null
    backfill) hash-mismatches.  Scale note: mergeSchema's cost is footer
    reads at PLANNING time — schema merge never touches row data."""
    import shutil

    from ..queries import scratch_dir
    base = scratch_dir(spark, sf_dir, "schema_evo")
    key = (spark.sparkContext.applicationId, _os.path.abspath(sf_dir),
           "schema_evo")
    if key not in _STREAM_SRC_BUILT or not _os.path.exists(base):
        shutil.rmtree(base, ignore_errors=True)
        o = load_tables(spark, sf_dir)["orders"]
        v1 = (o.filter(F.col("o_orderkey") % 2 == 0)
              .select("o_orderkey", "o_totalprice"))
        v2 = (o.filter(F.col("o_orderkey") % 2 == 1)
              .select("o_orderkey", "o_totalprice", "o_orderpriority"))
        v1.write.mode("append").parquet(base)
        v2.write.mode("append").parquet(base)
        _STREAM_SRC_BUILT.add(key)
    merged = spark.read.option("mergeSchema", "true").parquet(base)
    return (merged
            .groupBy(F.coalesce("o_orderpriority", F.lit("MISSING"))
                     .alias("pri"))
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.sum(F.round(F.col("o_totalprice"), 9)
                       .cast("decimal(20,9)")).cast("double")
                 .alias("total"))
            .orderBy("pri"))


_SQL_SCHEMA_EVOLUTION = """
SELECT CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority
            ELSE 'MISSING' END AS pri,
  COUNT(*)::BIGINT AS n,
  SUM(round(o_totalprice, 9)::DECIMAL(20,9))::DOUBLE AS total
FROM orders GROUP BY 1 ORDER BY pri
"""


def q_csv_dirty_read(spark, sf_dir):
    """Dirty-CSV ingestion (sources/readers.py read_csv_permissive): a
    deterministic CSV derived from documents (every 7th row's int column
    is the unparseable token 'oops') reads back in PERMISSIVE mode —
    malformed rows null out and land in the quarantine column instead of
    failing the load.  The gate rolls up good vs corrupt; the oracle
    recomputes the expected split closed-form, so a reader that drops,
    misparses, or mis-quarantines rows hash-mismatches."""
    import shutil

    from ..queries import scratch_dir
    base = scratch_dir(spark, sf_dir, "dirty_csv")
    key = (spark.sparkContext.applicationId, _os.path.abspath(sf_dir),
           "dirty_csv")
    if key not in _STREAM_SRC_BUILT or not _os.path.exists(base):
        shutil.rmtree(base, ignore_errors=True)
        d = load_tables(spark, sf_dir)["documents"] \
            .filter(F.col("doc_id") < 100)
        lines = d.select(F.concat(
            F.col("doc_id").cast("string"), F.lit(","),
            F.when(F.col("doc_id") % 7 == 0, F.lit("oops"))
            .otherwise((F.col("doc_id") * 3).cast("string"))
        ).alias("value"))
        lines.coalesce(2).write.mode("overwrite").text(base)
        _STREAM_SRC_BUILT.add(key)
    from ..sources.readers import read_csv_permissive

    df = read_csv_permissive(spark, base, "id int, val int")
    return (df.groupBy(F.col("_corrupt_record").isNotNull()
                       .alias("is_corrupt"))
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.sum("val").cast("long").alias("sum_val"),
                 F.sum("id").cast("long").alias("sum_id"))
            .orderBy("is_corrupt"))


_SQL_CSV_DIRTY = """
SELECT (doc_id % 7 = 0) AS is_corrupt, COUNT(*)::BIGINT AS n,
  CASE WHEN doc_id % 7 = 0 THEN NULL
       ELSE SUM(doc_id * 3) END::BIGINT AS sum_val,
  SUM(doc_id)::BIGINT AS sum_id
FROM documents WHERE doc_id < 100
GROUP BY doc_id % 7 = 0 ORDER BY is_corrupt
"""


def q_debounce_events(spark, sf_dir):
    """Burst-collapse debounce (pipeline/rollup.py debounce_events): per
    (user_id, event_type), events closer than 5 minutes collapse to their
    first occurrence (+ burst_size audit column).  One key exchange, two
    window passes over a total (ts, event_id) order — hash-exact against
    the identical DuckDB window chain."""
    from .rollup import debounce_events

    ev = load_tables(spark, sf_dir)["events"]
    out = debounce_events(ev, ["user_id", "event_type"], gap="5 minutes")
    return out.select("event_id", "user_id", "event_type", "burst_size")


def _sql_debounce_events() -> str:
    from .rollup import sql_debounce_events

    return sql_debounce_events(
        "events", ["user_id", "event_type"], gap="5 minutes",
        select_cols="event_id, user_id, event_type")


def q_compaction_plan(spark, sf_dir):
    """Small-file compaction planning (sources/layout.py plan_compaction —
    the OPTIMIZE bin-packing half): a deterministic file listing derived
    from lineitem (one 'file' per (l_returnflag, l_suppkey mod 211)
    group, size = exact quantity cents) plans into ~1 MB rewrite bins per
    returnflag partition; files >= the 250 kB floor are kept untouched.
    Largest-first + path tie-break is a total order, so the whole plan —
    keep/compact action AND bin assignment — is integer-exact against the
    DuckDB window mirror.  The operator itself is one window over
    |files| metadata rows; it never touches data files."""
    from ..sources.layout import plan_compaction

    li = load_tables(spark, sf_dir)["lineitem"]
    files = (li.groupBy("l_returnflag",
                        (F.col("l_suppkey") % 211).alias("g"))
             .agg(F.sum((F.col("l_quantity") * 100).cast("long"))
                  .alias("size_bytes"))
             .select(F.col("l_returnflag").alias("part"),
                     F.concat(F.lit("f"), F.col("g").cast("string"),
                              F.lit("_"), F.col("l_returnflag"))
                     .alias("path"),
                     "size_bytes"))
    return plan_compaction(files, target_bytes=1_000_000,
                           min_file_bytes=250_000, partition_col="part")


def _sql_compaction_plan() -> str:
    from ..sources.layout import sql_plan_compaction

    body = sql_plan_compaction("cp_files", target_bytes=1_000_000,
                               min_file_bytes=250_000,
                               partition_col="part")
    return f"""
WITH cp_files AS (
  SELECT l_returnflag AS part,
    'f' || (l_suppkey % 211)::VARCHAR || '_' || l_returnflag AS path,
    SUM((l_quantity * 100)::BIGINT)::BIGINT AS size_bytes
  FROM lineitem GROUP BY l_returnflag, l_suppkey % 211
){body}
"""


def q_robust_stats(spark, sf_dir):
    """Exact per-group robust statistics (pipeline/robust.py
    grouped_median_mad): median / MAD / p10 / p90 of event values per
    event_type, computed in a GROUPED-MAP pandas worker (applyInPandas) —
    the Python boundary Spark reserves for semantics JVM aggregates can't
    express (exact order statistics).  One shuffle on the group key; the
    oracle recomputes with DuckDB's median/quantile_cont, which match
    numpy's interpolating definitions bit-for-bit on doubles."""
    from .robust import grouped_median_mad

    ev = load_tables(spark, sf_dir)["events"]
    return grouped_median_mad(ev, ["event_type"], "value")


def _sql_robust_stats() -> str:
    from .robust import sql_grouped_median_mad

    return sql_grouped_median_mad("events", ["event_type"], "value")


def _append_watermark_sentinels(spark, src, max_ts) -> None:
    """Append TWO sentinel parquet files (one view + one purchase row
    each, user_id = -1) timestamped 10 h and 12 h past the last real
    event.  With ``maxFilesPerTrigger=1`` the first sentinel batch
    advances the watermark beyond every real row's join horizon and the
    second's batch evicts-and-emits the unmatched state — the finite-drive
    recipe that makes outer stream-stream joins flush.

    FileStreamSource orders files by MODIFICATION TIME, so the sentinels
    must sort after every real data file; on a coarse-mtime filesystem a
    same-second write could sort first (watermark races ahead, real joins
    drop).  Explicit strictly-increasing mtimes on each sentinel's part
    files remove that race."""
    from datetime import timedelta

    def _parts(d):
        return {_os.path.join(d, f) for f in _os.listdir(d)
                if f.startswith("part-")}

    seen = _parts(src)
    base_mtime = max(_os.path.getmtime(p) for p in seen)
    for i, hours in enumerate((10, 12)):
        sent = spark.createDataFrame(
            [(-1 - i, max_ts + timedelta(hours=hours), -1, t, 0.0)
             for t in ("view", "purchase")],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double")
        sent.coalesce(1).write.mode("append").parquet(src)
        cur = _parts(src)
        t_sent = base_mtime + 10.0 * (i + 1)
        for p in cur - seen:
            _os.utime(p, (t_sent, t_sent))
        seen = cur


def q_streaming_join_outer(spark, sf_dir):
    """Stream↔stream LEFT OUTER interval join (streaming/operators.py
    stream_stream_join(how='left_outer')): view→purchase attribution
    where unconverted views ALSO emit (null purchase) — the semantics the
    inner-join gate can't cover, and the one that needs real watermark
    machinery: Spark finalizes a non-match only once the watermark passes
    the row's join horizon.  The finite drive therefore appends TWO
    sentinel files past the last real event and triggers per-file — the
    first advances the watermark beyond every real horizon, the second's
    batch evicts-and-emits the unmatched state (sentinels filter out of
    the result).  Oracle: the equivalent batch left range-join; matching
    hashes prove every unmatched view flushed exactly once."""
    import shutil
    import uuid
    from datetime import timedelta

    from ..streaming.operators import (
        read_stream_parquet, run_stream_to_parquet, stream_stream_join,
    )

    from ..queries import scratch_dir
    base = scratch_dir(spark, sf_dir, "stream_outer_gate")
    src = _os.path.join(base, "src")
    key = (spark.sparkContext.applicationId, _os.path.abspath(sf_dir),
           "outer")
    if key not in _STREAM_SRC_BUILT or not _os.path.exists(src):
        shutil.rmtree(base, ignore_errors=True)
        ev = (load_tables(spark, sf_dir)["events"]
              .filter(F.col("event_type").isin("view", "purchase"))
              .filter(F.col("user_id") % 5 == 0)
              .select("event_id", "ts", "user_id", "event_type", "value"))
        ev.coalesce(3).write.mode("overwrite").parquet(src)
        max_ts = ev.agg(F.max("ts")).first()[0]
        _append_watermark_sentinels(spark, src, max_ts)
        _STREAM_SRC_BUILT.add(key)
    run_id = uuid.uuid4().hex[:8]
    out = _os.path.join(base, f"oout-{run_id}")
    ckpt = _os.path.join(base, f"ockpt-{run_id}")
    batch = spark.read.parquet(src)
    stream = (spark.readStream.schema(batch.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    views = stream.filter(F.col("event_type") == "view") \
        .select("user_id", "ts", "event_id")
    buys = stream.filter(F.col("event_type") == "purchase") \
        .select("user_id", "ts", "event_id", "value")
    joined = stream_stream_join(views, buys, key_col="user_id",
                                ts_col="ts", within="30 minutes",
                                how="left_outer")
    got = run_stream_to_parquet(joined, out, ckpt)
    return (got.filter(F.col("user_id") >= 0)
            .select("user_id",
                    F.col("event_id").alias("view_id"),
                    F.col("r_event_id").alias("purchase_id"),
                    F.col("r_event_id").isNotNull().alias("converted")))


_SQL_STREAMING_JOIN_OUTER = """
WITH src AS (
  SELECT * FROM events
  WHERE event_type IN ('view', 'purchase') AND user_id % 5 = 0),
v AS (SELECT user_id, ts, event_id FROM src WHERE event_type = 'view'),
b AS (SELECT user_id, ts, event_id FROM src WHERE event_type = 'purchase')
SELECT v.user_id, v.event_id AS view_id, b.event_id AS purchase_id,
  b.event_id IS NOT NULL AS converted
FROM v LEFT JOIN b
  ON v.user_id = b.user_id
 AND b.ts >= v.ts AND b.ts <= v.ts + INTERVAL 30 MINUTE
"""


def q_streaming_ingest(spark, sf_dir):
    """Stream → lakehouse table (streaming/operators.py
    streaming_append_table): the events stream appends into a
    manifest-committed table, one version per micro-batch (batch rows +
    hardlinks to the previous version's files, batch_id in the commit
    meta for replay-skip exactly-once).  The oracle aggregates the
    source directly, so the hash proves NO batch was lost, duplicated,
    or torn on its way through the commit log — the ingest guarantee a
    lakehouse sink owes."""
    import shutil
    import uuid

    from ..streaming.operators import streaming_append_table

    from ..queries import scratch_dir
    base = scratch_dir(spark, sf_dir, "stream_ingest_gate")
    src = _os.path.join(base, "src")
    key = (spark.sparkContext.applicationId, _os.path.abspath(sf_dir),
           "ingest")
    if key not in _STREAM_SRC_BUILT or not _os.path.exists(src):
        shutil.rmtree(base, ignore_errors=True)
        (load_tables(spark, sf_dir)["events"]
         .select("event_id", "user_id", "event_type", "value")
         .coalesce(6).write.mode("overwrite").parquet(src))
        _STREAM_SRC_BUILT.add(key)
    run_id = uuid.uuid4().hex[:8]
    batch = spark.read.parquet(src)
    table = streaming_append_table(
        spark, src, batch.schema,
        _os.path.join(base, f"tbl-{run_id}"),
        _os.path.join(base, f"ickpt-{run_id}"),
        max_files_per_trigger=2)
    return table.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("value"), 9).cast("decimal(20,9)"))
        .cast("double").alias("total"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"))


_SQL_STREAMING_INGEST = """
SELECT event_type, COUNT(*)::BIGINT AS n,
  SUM(round(value, 9)::DECIMAL(20,9))::DOUBLE AS total,
  MIN(event_id) AS min_id, MAX(event_id) AS max_id
FROM events GROUP BY event_type
"""


def q_compact_roundtrip(spark, sf_dir):
    """Small-file compaction EXECUTED, not just planned
    (sources/manifest.py compact_table — the OPTIMIZE verb the
    compaction_plan gate only plans): a deliberately fragmented
    manifest table (orders slice repartitioned into 24 shards) compacts
    into ~target-size files as one committed version, and the gate
    aggregates the COMPACTED table — the hash proves the rewrite
    preserved every row and value while the file count collapsed
    (asserted in tests/test_manifest.py; here the data identity is the
    oracle's job)."""
    import uuid

    from ..sources.manifest import compact_table, manifest_upsert, read_table

    from ..queries import scratch_dir
    base = scratch_dir(spark, sf_dir, "compact_gate")
    run_id = uuid.uuid4().hex[:8]
    root = _os.path.join(base, f"tbl-{run_id}")
    o = (load_tables(spark, sf_dir)["orders"]
         .filter(F.col("o_orderkey") % 3 == 0)
         .select("o_orderkey", "o_custkey", "o_totalprice",
                 "o_orderpriority"))
    manifest_upsert(spark, root, o.repartition(24), ["o_orderkey"])
    compact_table(spark, root, target_bytes=256 * 1024 * 1024)
    t = read_table(spark, root)
    return t.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("o_totalprice"), 9).cast("decimal(20,9)"))
        .cast("double").alias("total"),
        F.max("o_orderkey").alias("max_key"))


_SQL_COMPACT_ROUNDTRIP = """
SELECT o_orderpriority, COUNT(*)::BIGINT AS n,
  SUM(round(o_totalprice, 9)::DECIMAL(20,9))::DOUBLE AS total,
  MAX(o_orderkey) AS max_key
FROM orders WHERE o_orderkey % 3 = 0
GROUP BY o_orderpriority
"""


def q_manifest_merge_apply(spark, sf_dir):
    """Conditional MERGE applying a CDC changelog end-to-end
    (sources/manifest.py manifest_merge — WHEN MATCHED [AND cond] THEN
    UPDATE/DELETE, WHEN NOT MATCHED THEN INSERT — fed by pipeline/cdc.py
    snapshot_diff, the exact consumer shape the replace-by-key upsert and
    delete-by-key verbs can't express): the customer slice <=800 is
    committed as a manifest table, a new snapshot (keys <=1000, every 7th
    dropped, every 3rd rebalanced +100) is diffed against it, and the
    changelog routes through the merge's three conditional clauses.  The
    oracle recomputes the NEW snapshot closed-form, so the hash proves
    delete/update/insert each landed exactly — and the merge is
    idempotent (re-applying the same changelog is a no-op, asserted in
    tests/test_manifest.py).

    Plan: ONE full-outer equi-join on the key per merge (each side
    shuffles once), map-only clause CASE, atomic O_EXCL commit."""
    import uuid

    from ..sources.manifest import (
        manifest_merge, manifest_upsert, read_table,
    )

    from ..queries import scratch_dir
    from .cdc import snapshot_diff

    c = load_tables(spark, sf_dir)["customer"] \
        .select("c_custkey", "c_name", "c_acctbal")
    old = c.filter(F.col("c_custkey") <= 800)
    new = (c.filter((F.col("c_custkey") <= 1000)
                    & (F.col("c_custkey") % 7 != 0))
           .withColumn("c_acctbal",
                       F.when(F.col("c_custkey") % 3 == 0,
                              F.col("c_acctbal") + 100)
                       .otherwise(F.col("c_acctbal"))))
    changes = snapshot_diff(old, new, ["c_custkey"]) \
        .filter(F.col("change_type") != "unchanged")
    source = (changes.select("c_custkey", "change_type")
              .join(new, "c_custkey", "left")
              .select("c_custkey", "c_name", "c_acctbal", "change_type"))
    base = scratch_dir(spark, sf_dir, "merge_gate")
    root = _os.path.join(base, f"tbl-{uuid.uuid4().hex[:8]}")
    manifest_upsert(spark, root, old, ["c_custkey"])
    manifest_merge(spark, root, source, ["c_custkey"],
                   when_matched_update="src.change_type = 'update'",
                   when_matched_delete="src.change_type = 'delete'",
                   when_not_matched_insert="src.change_type = 'insert'")
    return read_table(spark, root).select(
        "c_custkey", "c_name",
        F.round(F.col("c_acctbal"), 2).alias("c_acctbal"))


_SQL_MANIFEST_MERGE_APPLY = """
SELECT c_custkey, c_name,
  round(CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 100
        ELSE c_acctbal END, 2) AS c_acctbal
FROM customer WHERE c_custkey <= 1000 AND c_custkey % 7 <> 0
"""


def q_streaming_join_full_outer(spark, sf_dir):
    """Stream↔stream FULL OUTER interval join (streaming/operators.py
    stream_stream_join(how='full_outer')): the last cell of the outer
    matrix — unconverted views AND orphan purchases (no view in the
    preceding 30 minutes) both emit with nulls on the other side.  Both
    sides' unmatched state needs watermark-driven finalization, so the
    same two-sentinel recipe as the left-outer gate drives BOTH flushes
    (the sentinel files carry a view and a purchase row each).  Oracle:
    the equivalent batch FULL range-join; matching hashes prove every
    unmatched row on either side flushed exactly once."""
    import shutil
    import uuid

    from ..streaming.operators import (
        run_stream_to_parquet, stream_stream_join,
    )

    from ..queries import scratch_dir
    base = scratch_dir(spark, sf_dir, "stream_fullouter_gate")
    src = _os.path.join(base, "src")
    key = (spark.sparkContext.applicationId, _os.path.abspath(sf_dir),
           "fullouter")
    if key not in _STREAM_SRC_BUILT or not _os.path.exists(src):
        shutil.rmtree(base, ignore_errors=True)
        ev = (load_tables(spark, sf_dir)["events"]
              .filter(F.col("event_type").isin("view", "purchase"))
              .filter(F.col("user_id") % 7 == 0)
              .select("event_id", "ts", "user_id", "event_type", "value"))
        ev.coalesce(3).write.mode("overwrite").parquet(src)
        max_ts = ev.agg(F.max("ts")).first()[0]
        _append_watermark_sentinels(spark, src, max_ts)
        _STREAM_SRC_BUILT.add(key)
    run_id = uuid.uuid4().hex[:8]
    out = _os.path.join(base, f"foout-{run_id}")
    ckpt = _os.path.join(base, f"fockpt-{run_id}")
    batch = spark.read.parquet(src)
    stream = (spark.readStream.schema(batch.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    views = stream.filter(F.col("event_type") == "view") \
        .select("user_id", "ts", "event_id")
    buys = stream.filter(F.col("event_type") == "purchase") \
        .select("user_id", "ts", "event_id", "value")
    joined = stream_stream_join(views, buys, key_col="user_id",
                                ts_col="ts", within="30 minutes",
                                how="full_outer")
    got = run_stream_to_parquet(joined, out, ckpt)
    uid = F.coalesce(F.col("user_id"), F.col("r_user_id"))
    return (got.filter(uid >= 0)
            .select(uid.alias("user_id"),
                    F.col("event_id").alias("view_id"),
                    F.col("r_event_id").alias("purchase_id"),
                    F.when(F.col("event_id").isNull(),
                           F.lit("purchase_only"))
                    .when(F.col("r_event_id").isNull(),
                          F.lit("view_only"))
                    .otherwise(F.lit("matched")).alias("side")))


_SQL_STREAMING_JOIN_FULL_OUTER = """
WITH src AS (
  SELECT * FROM events
  WHERE event_type IN ('view', 'purchase') AND user_id % 7 = 0),
v AS (SELECT user_id, ts, event_id FROM src WHERE event_type = 'view'),
b AS (SELECT user_id, ts, event_id FROM src WHERE event_type = 'purchase')
SELECT COALESCE(v.user_id, b.user_id) AS user_id,
  v.event_id AS view_id, b.event_id AS purchase_id,
  CASE WHEN v.event_id IS NULL THEN 'purchase_only'
       WHEN b.event_id IS NULL THEN 'view_only'
       ELSE 'matched' END AS side
FROM v FULL JOIN b
  ON v.user_id = b.user_id
 AND b.ts >= v.ts AND b.ts <= v.ts + INTERVAL 30 MINUTE
"""


def q_streaming_view_maintenance(spark, sf_dir):
    """Streaming incremental view maintenance (streaming/operators.py
    streaming_view_maintenance): the events stream drives, 8 files per
    trigger, a per-event-type count/sum/min/max state table through
    cdc.agg_state + merge_agg_state — one versioned parquet state per
    micro-batch, history never rescanned.  The oracle recomputes the
    aggregate FROM SCRATCH over all events, so the hash proves the
    batch-chopped merge chain is bit-identical to a full rescan
    (mergeable state + exact decimal sums = trigger-count-invariant)."""
    import shutil
    import uuid

    from ..streaming.operators import streaming_view_maintenance

    from ..queries import scratch_dir
    base = scratch_dir(spark, sf_dir, "stream_gate")
    src = _os.path.join(base, "src")
    key = (spark.sparkContext.applicationId, _os.path.abspath(sf_dir))
    if key not in _STREAM_SRC_BUILT or not _os.path.exists(src):
        shutil.rmtree(base, ignore_errors=True)
        load_tables(spark, sf_dir)["events"].write.mode(
            "overwrite").parquet(src)
        _STREAM_SRC_BUILT.add(key)
    run_id = uuid.uuid4().hex[:8]
    work = _os.path.join(base, f"ivm-{run_id}")
    batch = spark.read.parquet(src)
    state = streaming_view_maintenance(
        spark, src, batch.schema, ["event_type"], "value", work,
        max_files_per_trigger=8)
    return state.select(
        "event_type", "n", F.col("s").cast("double").alias("total"),
        F.round("mn", 6).alias("mn"), F.round("mx", 6).alias("mx"))


_SQL_STREAMING_IVM = """
SELECT event_type, COUNT(*)::BIGINT AS n,
  SUM(round(value, 9)::DECIMAL(20,9))::DOUBLE AS total,
  round(MIN(value), 6) AS mn, round(MAX(value), 6) AS mx
FROM events GROUP BY event_type
"""


def q_streaming_windowed(spark, sf_dir):
    """Tumbling-window streaming rollup as a HASH gate (companion to
    streaming_sessions — covers the windowed-aggregate operator): 1-hour
    event-time windows with a 2 h watermark run availableNow through
    foreachBatch into parquet; append mode emits exactly the windows whose
    end the final watermark passed.  The oracle is a DuckDB date_trunc
    rollup with the same cutoff; sum_value routes through exact decimals
    so the hash is trigger-order-independent."""
    import shutil
    import tempfile
    import uuid

    from ..streaming.operators import (
        read_stream_parquet, run_stream_to_parquet, windowed_rollup,
    )

    from ..queries import scratch_dir
    base = scratch_dir(spark, sf_dir, "stream_gate")
    src = _os.path.join(base, "src")
    key = (spark.sparkContext.applicationId, _os.path.abspath(sf_dir))
    if key not in _STREAM_SRC_BUILT or not _os.path.exists(src):
        shutil.rmtree(base, ignore_errors=True)
        load_tables(spark, sf_dir)["events"].write.mode(
            "overwrite").parquet(src)
        _STREAM_SRC_BUILT.add(key)
    run_id = uuid.uuid4().hex[:8]
    out = _os.path.join(base, f"wout-{run_id}")
    ckpt = _os.path.join(base, f"wckpt-{run_id}")
    batch = spark.read.parquet(src)
    stream = read_stream_parquet(spark, src, batch.schema)
    got = run_stream_to_parquet(
        windowed_rollup(stream, window="1 hour"), out, ckpt)
    return got.select(
        "window_start", "event_type", "n",
        F.round("sum_value", 6).alias("sum_value"),
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"))


_SQL_STREAMING_WINDOWED = """
WITH w AS (
  SELECT date_trunc('hour', ts) AS window_start, event_type,
         COUNT(*) AS n,
         round(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 6)
           AS sum_value,
         round(MIN(value), 6) AS min_value,
         round(MAX(value), 6) AS max_value
  FROM events GROUP BY 1, 2)
SELECT window_start, event_type, n, sum_value, min_value, max_value
FROM w
WHERE window_start + INTERVAL 1 HOUR
      <= (SELECT MAX(ts) - INTERVAL 2 HOUR FROM events)
"""


def q_streaming_dedup(spark, sf_dir):
    """Streaming dedup as a HASH gate (streaming/operators.py
    streaming_dedup — previously batch-parity-tested only): the source
    re-lands events WITH planted full-row duplicates (every third
    event_id, appended as exact copies), then a real two-stateful-operator
    streaming query — dropDuplicatesWithinWatermark(event_id) feeding a
    1 h tumbling watermarked rollup — runs availableNow through
    foreachBatch into parquet.  Because the planted copies are
    bit-identical rows, the post-dedup stream is deterministic whichever
    copy survives, and the oracle is the DISTINCT-collapsed rollup with
    the same final-watermark cutoff — an undeduplicated run inflates n/
    sum and hash-fails, so the gate passing PROVES the dedup operator
    fired.  State is bounded by the watermark horizon on both operators."""
    import shutil
    import uuid

    from ..streaming.operators import (
        read_stream_parquet, run_stream_to_parquet, streaming_dedup,
        windowed_rollup,
    )

    from ..queries import scratch_dir
    base = scratch_dir(spark, sf_dir, "stream_dup_gate")
    src = _os.path.join(base, "src")
    key = (spark.sparkContext.applicationId, _os.path.abspath(sf_dir),
           "dup")
    if key not in _STREAM_SRC_BUILT or not _os.path.exists(src):
        shutil.rmtree(base, ignore_errors=True)
        ev = load_tables(spark, sf_dir)["events"]
        dups = ev.filter(F.col("event_id") % 3 == 0)
        ev.unionByName(dups).write.mode("overwrite").parquet(src)
        _STREAM_SRC_BUILT.add(key)
    run_id = uuid.uuid4().hex[:8]
    out = _os.path.join(base, f"dout-{run_id}")
    ckpt = _os.path.join(base, f"dckpt-{run_id}")
    batch = spark.read.parquet(src)
    stream = read_stream_parquet(spark, src, batch.schema)
    deduped = streaming_dedup(stream, ["event_id"])
    got = run_stream_to_parquet(
        windowed_rollup(deduped, window="1 hour", watermark=None), out,
        ckpt)
    return got.select(
        "window_start", "event_type", "n",
        F.round("sum_value", 6).alias("sum_value"),
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"))


_SQL_STREAMING_DEDUP = """
WITH w AS (
  SELECT date_trunc('hour', ts) AS window_start, event_type,
         COUNT(*) AS n,
         round(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 6)
           AS sum_value,
         round(MIN(value), 6) AS min_value,
         round(MAX(value), 6) AS max_value
  FROM events GROUP BY 1, 2)
SELECT window_start, event_type, n, sum_value, min_value, max_value
FROM w
WHERE window_start + INTERVAL 1 HOUR
      <= (SELECT MAX(ts) - INTERVAL 2 HOUR FROM events)
"""


def q_streaming_hopping(spark, sf_dir):
    """HOPPING-window streaming rollup (windowed_rollup with slide <
    window): 1-hour windows every 30 min, 2 h watermark, availableNow
    through foreachBatch — each event contributes to exactly 2 overlapping
    windows, so state and output carry the documented 2× overlap factor.
    The oracle expands each event to its two slide-grid windows and
    applies the same final-watermark cutoff as the tumbling gate."""
    import shutil
    import uuid

    from ..queries import scratch_dir
    from ..streaming.operators import (
        read_stream_parquet, run_stream_to_parquet, windowed_rollup,
    )

    base = scratch_dir(spark, sf_dir, "stream_gate")
    src = _os.path.join(base, "src")
    key = (spark.sparkContext.applicationId, _os.path.abspath(sf_dir))
    if key not in _STREAM_SRC_BUILT or not _os.path.exists(src):
        shutil.rmtree(base, ignore_errors=True)
        load_tables(spark, sf_dir)["events"].write.mode(
            "overwrite").parquet(src)
        _STREAM_SRC_BUILT.add(key)
    run_id = uuid.uuid4().hex[:8]
    out = _os.path.join(base, f"hout-{run_id}")
    ckpt = _os.path.join(base, f"hckpt-{run_id}")
    batch = spark.read.parquet(src)
    stream = read_stream_parquet(spark, src, batch.schema)
    got = run_stream_to_parquet(
        windowed_rollup(stream, window="1 hour", slide="30 minutes"),
        out, ckpt)
    return got.select(
        "window_start", "event_type", "n",
        F.round("sum_value", 6).alias("sum_value"),
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"))


_SQL_STREAMING_HOPPING = """
WITH expanded AS (
  SELECT date_trunc('hour', ts)
           + CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE
                  ELSE INTERVAL 0 MINUTE END
           - i.o * INTERVAL 30 MINUTE AS window_start,
         event_type, value, ts
  FROM events, (SELECT unnest([0, 1]) AS o) i),
w AS (
  SELECT window_start, event_type,
         COUNT(*) AS n,
         round(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 6)
           AS sum_value,
         round(MIN(value), 6) AS min_value,
         round(MAX(value), 6) AS max_value
  FROM expanded GROUP BY 1, 2)
SELECT window_start, event_type, n, sum_value, min_value, max_value
FROM w
WHERE window_start + INTERVAL 1 HOUR
      <= (SELECT MAX(ts) - INTERVAL 2 HOUR FROM events)
"""


def q_streaming_enrich(spark, sf_dir):
    """Stream-static enrichment join: the events STREAM joins the static
    nation dimension (broadcast — stream-static joins are stateless, the
    static side is just a lookup each micro-batch) and rolls up 1-hour
    windows per nation with the usual 2 h watermark.  The third streaming
    join mode next to stream↔stream (streaming_join) and the batch gates.

    Scale: no join state at all — the dim broadcast is re-resolved per
    batch (picking up dim updates between batches, the documented
    stream-static semantic); state is only the windowed aggregate, bounded
    by the watermark."""
    import shutil
    import uuid

    from ..queries import scratch_dir
    from ..streaming.operators import (
        read_stream_parquet, run_stream_to_parquet,
    )

    base = scratch_dir(spark, sf_dir, "stream_gate")
    src = _os.path.join(base, "src")
    key = (spark.sparkContext.applicationId, _os.path.abspath(sf_dir))
    if key not in _STREAM_SRC_BUILT or not _os.path.exists(src):
        shutil.rmtree(base, ignore_errors=True)
        load_tables(spark, sf_dir)["events"].write.mode(
            "overwrite").parquet(src)
        _STREAM_SRC_BUILT.add(key)
    run_id = uuid.uuid4().hex[:8]
    out = _os.path.join(base, f"eout-{run_id}")
    ckpt = _os.path.join(base, f"eckpt-{run_id}")
    batch = spark.read.parquet(src)
    stream = read_stream_parquet(spark, src, batch.schema) \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    dim = load_tables(spark, sf_dir)["nation"].select(
        F.col("n_nationkey").alias("seg_key"),
        F.col("n_name").alias("segment"))
    enriched = stream.withColumn(
        "seg_key", (F.col("user_id") % 25).cast("int")) \
        .join(F.broadcast(dim), "seg_key")
    agg = (enriched.withWatermark("ts", "2 hours")
           .groupBy(F.window("ts", "1 hour").alias("w"), F.col("segment"))
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(28,10)")).cast("double")
                .alias("sum_value"))
           .select(F.col("w.start").alias("window_start"), "segment",
                   "n", "sum_value"))
    got = run_stream_to_parquet(agg, out, ckpt)
    return got.select("window_start", "segment", "n",
                      F.round("sum_value", 6).alias("sum_value"))


_SQL_STREAMING_ENRICH = """
WITH e AS (
  SELECT date_trunc('hour', ts) AS window_start, n_name AS segment, value
  FROM events JOIN nation ON n_nationkey = CAST(user_id % 25 AS INT)),
w AS (
  SELECT window_start, segment, COUNT(*) AS n,
         round(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 6)
           AS sum_value
  FROM e GROUP BY 1, 2)
SELECT window_start, segment, n, sum_value
FROM w
WHERE window_start + INTERVAL 1 HOUR
      <= (SELECT MAX(ts) - INTERVAL 2 HOUR FROM events)
"""


def q_streaming_join(spark, sf_dir):
    """Stream↔stream interval join (streaming/operators.py
    stream_stream_join): view→purchase attribution — every (view,
    purchase) pair of the same user within 30 min, both sides real
    streams with 2 h watermarks, driven availableNow through foreachBatch
    into parquet.

    The time-range join condition is what bounds each side's state to the
    watermark+30 min horizon (without it, inner-join state grows without
    bound and outer variants are rejected), so this runs forever on
    unbounded streams; an inner interval join emits each pair exactly
    once, making the finite-source drive hash-comparable to the
    batch/DuckDB range join."""
    import shutil
    import tempfile
    import uuid

    from ..streaming.operators import (
        read_stream_parquet, run_stream_to_parquet, stream_stream_join,
    )

    from ..queries import scratch_dir
    base = scratch_dir(spark, sf_dir, "stream_gate")
    src = _os.path.join(base, "src")
    key = (spark.sparkContext.applicationId, _os.path.abspath(sf_dir))
    if key not in _STREAM_SRC_BUILT or not _os.path.exists(src):
        shutil.rmtree(base, ignore_errors=True)
        load_tables(spark, sf_dir)["events"].write.mode(
            "overwrite").parquet(src)
        _STREAM_SRC_BUILT.add(key)
    run_id = uuid.uuid4().hex[:8]
    out = _os.path.join(base, f"jout-{run_id}")
    ckpt = _os.path.join(base, f"jckpt-{run_id}")
    batch = spark.read.parquet(src)
    stream = read_stream_parquet(spark, src, batch.schema)
    views = stream.filter(F.col("event_type") == "view") \
        .select("user_id", "ts", "event_id")
    buys = stream.filter(F.col("event_type") == "purchase") \
        .select("user_id", "ts", "event_id", "value")
    joined = stream_stream_join(views, buys, key_col="user_id",
                                ts_col="ts", within="30 minutes")
    got = run_stream_to_parquet(joined, out, ckpt)
    return got.select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("r_event_id").alias("purchase_id"),
        ((F.col("r_ts").cast("long") - F.col("ts").cast("long")))
        .alias("gap_sec"),
        F.round("r_value", 6).alias("purchase_value"))


_SQL_STREAMING_JOIN = """
SELECT v.user_id,
       v.event_id AS view_id,
       p.event_id AS purchase_id,
       date_diff('second', v.ts, p.ts) AS gap_sec,
       round(p.value, 6) AS purchase_value
FROM events v JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
"""


_HTML_HEAD = ('<html><head><title>Doc</title><style>p {margin:0}</style>'
              '</head><body><nav>Home &amp;&nbsp;About</nav><p>')
_HTML_TAIL = ('</p><script type="text/javascript">var x = 1 < 2;</script>'
              '<footer>Footer Corp</footer></body></html>')


def q_html_strip(spark, sf_dir):
    """HTML extraction front door (pipeline/text.py strip_html): every
    document wraps in a deterministic page template (nav boilerplate,
    entities, an inline script whose body contains a bare '<', a styled
    head, a footer), then strips back to text through the JVM regexp
    chain.  The oracle applies the identical wrap + strip in DuckDB —
    block-drop order, single-level entity decode (&amp; last), and
    whitespace collapse all hash-checked.  Map-side only; no shuffle at
    all until the driver's own collect."""
    from .text import strip_html, token_count

    d = load_tables(spark, sf_dir)["documents"]
    page = F.concat(F.lit(_HTML_HEAD), F.col("text"), F.lit(_HTML_TAIL))
    clean = strip_html(page)
    return d.select(
        "doc_id",
        F.length(clean).alias("clean_len"),
        token_count(clean).alias("n_tokens"),
        F.substring(clean, 1, 16).alias("head"))


def _sql_html_strip() -> str:
    from .text import sql_strip_html, sql_token_count

    head = _HTML_HEAD.replace("'", "''")
    tail = _HTML_TAIL.replace("'", "''")
    page = f"('{head}' || text || '{tail}')"
    clean = sql_strip_html(page)
    return f"""
WITH hs AS (SELECT doc_id, {clean} AS clean FROM documents)
SELECT doc_id, length(clean)::INT AS clean_len,
  {sql_token_count('clean')}::INT AS n_tokens,
  substring(clean, 1, 16) AS head
FROM hs
"""


def q_url_canonicalize(spark, sf_dir):
    """URL canonicalization + registrable-domain extraction
    (pipeline/urls.py): four deterministic URL spellings per doc_id —
    messy uppercase host with default port, tracking params and fragment;
    https with :443; bare host; non-URL passthrough — canonicalized
    per-row.  The oracle rebuilds the same raw URLs and applies the
    mirrored SQL expressions, so scheme/host/port/path/query/fragment
    handling is value-checked string-for-string."""
    from .urls import canonicalize_url, registrable_domain

    d = load_tables(spark, sf_dir)["documents"].filter(
        F.col("doc_id") < 400).select("doc_id")
    k7 = (F.col("doc_id") % 7).cast("string")
    k10 = (F.col("doc_id") % 10).cast("string")
    m = F.col("doc_id") % 4
    url = (F.when(m == 0, F.concat(
        F.lit("HTTP://WWW.Site"), k7, F.lit(".CO.UK:80/Path"), k10,
        F.lit("/?utm_source=x&b=2&a=1#frag")))
        .when(m == 1, F.concat(
            F.lit("https://Sub.site"), k7, F.lit(".com:443/a/b?z=1&y=2")))
        .when(m == 2, F.concat(F.lit("http://site"), k7, F.lit(".org")))
        .otherwise(F.concat(F.lit("Not A Url "), k7)))
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id", "url",
        canonicalize_url(F.col("url")).alias("canonical_url"),
        registrable_domain(F.col("url")).alias("domain"))


def _sql_url_canonicalize() -> str:
    from .urls import sql_canonicalize_url, sql_registrable_domain

    return f"""
WITH u_raw AS (
  SELECT doc_id,
    CASE doc_id % 4
      WHEN 0 THEN 'HTTP://WWW.Site' || CAST(doc_id % 7 AS VARCHAR)
                  || '.CO.UK:80/Path' || CAST(doc_id % 10 AS VARCHAR)
                  || '/?utm_source=x&b=2&a=1#frag'
      WHEN 1 THEN 'https://Sub.site' || CAST(doc_id % 7 AS VARCHAR)
                  || '.com:443/a/b?z=1&y=2'
      WHEN 2 THEN 'http://site' || CAST(doc_id % 7 AS VARCHAR) || '.org'
      ELSE 'Not A Url ' || CAST(doc_id % 7 AS VARCHAR)
    END AS url
  FROM documents WHERE doc_id < 400
)
SELECT doc_id, url,
  {sql_canonicalize_url('url')} AS canonical_url,
  {sql_registrable_domain('url')} AS domain
FROM u_raw
"""


_LD_B1 = "this site uses cookies accept our terms to continue"
_LD_B2 = "all rights reserved contact the webmaster for details"


def q_line_dedup(spark, sf_dir):
    """Cross-document line dedup (pipeline/lines.py — the C4/RefinedWeb
    boilerplate-stripping step): documents are reshaped into '#'-joined
    lines (leading planted cookie-banner line on every 3rd doc, first-8
    -tokens line, remainder line, trailing rights-reserved line on every
    5th doc) and line_dedup(max_df=1) must drop exactly the recurring
    lines — the planted boilerplate plus any organically colliding
    prefix — while reassembling the survivors in original order.  The
    hash covers the rebuilt text, so ordering and trim/empty semantics
    are value-checked end-to-end."""
    from .lines import line_dedup

    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    first = F.array_join(F.slice(toks, 1, 8), " ")
    rest = F.array_join(
        F.slice(toks, 9, 1_000_000), " ")
    lined = d.select(
        "doc_id",
        F.concat_ws(
            "#",
            F.when(F.col("doc_id") % 3 == 0, F.lit(_LD_B1)),
            first,
            rest,
            F.when(F.col("doc_id") % 5 == 0, F.lit(_LD_B2)),
        ).alias("text"))
    return line_dedup(lined, delim="#", max_df=1)


def _sql_line_dedup() -> str:
    from .lines import sql_line_dedup

    body = sql_line_dedup("ld_docs", delim="#", max_df=1)
    # splice the fixture CTE ahead of the operator's own WITH chain
    return body.replace(
        "WITH ld_split AS (",
        f"""WITH ld_docs AS (
  SELECT doc_id,
    concat_ws('#',
      CASE WHEN doc_id % 3 = 0 THEN '{_LD_B1}' END,
      array_to_string(list_slice(string_split(text, ' '), 1, 8), ' '),
      array_to_string(list_slice(string_split(text, ' '), 9, 1000000), ' '),
      CASE WHEN doc_id % 5 = 0 THEN '{_LD_B2}' END) AS text
  FROM documents
),
ld_split AS (""", 1)


def q_pagerank_bucketed_bipartite(spark, sf_dir):
    """PageRank through the BUCKETED path (pipeline/graph.py
    pagerank_bucketed): transitions/nodes/has-out persisted as
    bucket-sorted managed tables so the rank-onto-edges join plans with no
    Exchange above the edge scan (plan-asserted in tests/test_graph.py;
    this gate hash-checks the VALUES).  Graph: bipartite user↔event-type
    (rank flows both ways), a few thousand nodes at sf0.01 — large enough
    that the bucketed layout is exercised across many buckets, small
    enough that the oracle's 6-iteration materialized-CTE unroll stays
    cheap.  Identical arithmetic to plain pagerank (shared
    _pr_iteration), so the same sql_pagerank oracle applies."""
    from .graph import pagerank_bucketed

    ev = load_tables(spark, sf_dir)["events"]
    pairs = (ev.select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("u"),
        F.col("event_type").alias("t"))
        .groupBy("u", "t").agg(F.count(F.lit(1)).alias("n")))
    edges = (pairs.select(F.col("u").alias("src"), F.col("t").alias("dst"),
                          "n")
             .unionByName(pairs.select(F.col("t").alias("src"),
                                       F.col("u").alias("dst"), "n")))
    return pagerank_bucketed(edges, "gate_pr_buck", weight="n",
                             damping=0.85, iterations=6)


def _sql_pagerank_bucketed_bipartite() -> str:
    from .graph import sql_pagerank

    body = sql_pagerank("prb_edges", weight="n", damping=0.85,
                        iterations=6, prefix="prb")
    return f"""
WITH prb_pairs AS (
  SELECT 'u' || CAST(user_id AS VARCHAR) AS u, event_type AS t,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
prb_edges AS (
  SELECT u AS src, t AS dst, n FROM prb_pairs
  UNION ALL
  SELECT t AS src, u AS dst, n FROM prb_pairs
),{body}
SELECT node, rank FROM prb_out
"""


def q_triangle_count(spark, sf_dir):
    """Per-node triangle counts (pipeline/graph.py triangle_count) on the
    part co-purchase graph: parts are adjacent iff some order contains both.

    Scale: the co-purchase edge build self-joins lineitem on l_orderkey —
    per-order fan-out is C(lines_per_order, 2), a small constant in any
    order-lines schema, so edge count is linear in the fact table.  The
    2-year shipdate window is pushed to both parquet scans (the gate's cost
    knob — the operator itself has no input cap).  The
    triangle operator then bounds wedge generation by degree-ordered
    orientation (O(|E|^1.5) worst case, hub-proof — see graph.py).  Output
    is clamped to the top 100 by (triangles desc, node asc) under a total
    order."""
    from .graph import triangle_count

    li = load_tables(spark, sf_dir)["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_partkey")
    b = li.select(F.col("l_orderkey").alias("o2"),
                  F.col("l_partkey").alias("p2"))
    edges = (li.join(b, (F.col("l_orderkey") == F.col("o2"))
                     & (F.col("l_partkey") < F.col("p2")))
             .select(F.col("l_partkey").alias("src"), F.col("p2").alias("dst"))
             .distinct())
    out = triangle_count(edges).withColumnRenamed("node", "part")
    return out.orderBy(F.col("triangles").desc(), F.col("part").asc()) \
        .limit(100)


def _sql_triangle_count_gate() -> str:
    from .graph import sql_triangle_count

    body = sql_triangle_count("tcg_edges", prefix="tcg")
    return f"""
WITH tcg_li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
),
tcg_edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM tcg_li a JOIN tcg_li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),{body}
SELECT node AS part, triangles FROM tcg_out
ORDER BY triangles DESC, part ASC LIMIT 100
"""


PIPELINE_QUERIES = {
    "triangle_count": (q_triangle_count, _sql_triangle_count_gate()),
    "text_stats": (q_text_stats, _SQL_TEXT_STATS),
    "text_quality_by_source": (q_text_quality_by_source, _SQL_TEXT_QUALITY),
    "pii_redact": (q_pii_redact, _sql_pii_redact()),
    "stratified_sample": (q_stratified_sample, _sql_stratified_sample()),
    "hash_split": (q_hash_split, _sql_hash_split()),
    "domain_cap": (q_domain_cap, _sql_domain_cap()),
    "shard_assignment": (q_shard_assignment, _sql_shard_assignment()),
    "weighted_sample": (q_weighted_sample, _sql_weighted_sample()),
    "sequence_packing": (q_sequence_packing, _sql_sequence_packing()),
    "fuzzy_match": (q_fuzzy_match, _sql_fuzzy_match()),
    "repetition_quality": (q_repetition_quality, _sql_repetition_quality()),
    "decontaminate": (q_decontaminate, _sql_decontaminate()),
    "mixture_resample": (q_mixture_resample, _sql_mixture_resample()),
    "mixture_temperature": (q_mixture_temperature, _sql_mixture_temperature()),
    "token_budget_subset": (q_token_budget_subset, _sql_token_budget()),
    "corpus_overlap": (q_corpus_overlap, _sql_corpus_overlap()),
    "funnel_conversion": (q_funnel, _SQL_FUNNEL),
    "cohort_retention": (q_cohort_retention, _SQL_COHORT),
    "event_transitions": (q_event_transitions, _SQL_TRANSITIONS),
    "dedup_exact": (q_dedup_exact, _SQL_DEDUP_EXACT),
    "dedup_minhash_lsh": (q_dedup_minhash, _sql_dedup_minhash()),
    "dedup_incremental": (q_dedup_incremental, _sql_dedup_incremental()),
    "dedup_index_probe": (q_dedup_index_probe, _sql_dedup_incremental()),
    "dedup_simhash_fingerprints": (q_dedup_simhash_fingerprints, _sql_simhash_fps()),
    "dedup_simhash_pairs": (q_dedup_simhash_pairs, _sql_simhash_pairs()),
    "dedup_clusters": (q_dedup_clusters, _sql_dedup_clusters()),
    "dedup_clusters_twophase": (q_dedup_clusters_twophase, _sql_dedup_clusters()),
    "dedup_apply": (q_dedup_apply, _sql_dedup_apply()),
    "dedup_keep_best": (q_dedup_keep_best, _sql_dedup_keep_best()),
    "dedup_ngram_jaccard": (q_dedup_ngram_jaccard, _sql_ngram_jaccard()),
    "similarity_topk": (q_similarity_topk, _SQL_SIM_TOPK),
    "similarity_ivf": (q_similarity_ivf, _SQL_SIM_IVF),
    "ann_recall": (q_ann_recall, _sql_ann_recall()),
    "ann_index_probe": (q_ann_index_probe, _SQL_SIM_IVF),
    "embedding_neardup": (q_embedding_neardup, _sql_emb_neardup()),
    "embedding_dedup": (q_embedding_dedup, _sql_embedding_dedup()),
    "embedding_neardup_banded": (q_embedding_neardup_banded,
                                 _sql_emb_neardup_banded()),
    "multimodal_features": (q_multimodal_features, _SQL_MULTIMODAL),
    "audio_features": (q_audio_features, _SQL_AUDIO_FEATURES),
    "video_features": (q_video_features, _SQL_VIDEO_FEATURES),
    "mp4_metadata": (q_mp4_metadata, _SQL_MP4_METADATA),
    "mp3_metadata": (q_mp3_metadata, _SQL_MP3_METADATA),
    "flac_metadata": (q_flac_metadata, _SQL_FLAC_METADATA),
    "ogg_metadata": (q_ogg_metadata, _SQL_OGG_METADATA),
    "webm_metadata": (q_webm_metadata, _SQL_WEBM_METADATA),
    "media_curation": (q_media_curation, _SQL_MEDIA_CURATION),
    "winnow_fingerprints": (q_winnow_fingerprints, _SQL_WINNOW),
    "kmeans_clusters": (q_kmeans_clusters, _sql_kmeans()),
    "semdedup_prune": (q_semdedup_prune, _sql_semdedup()),
    "tfidf_top_terms": (q_tfidf_top_terms, _sql_tfidf()),
    "similarity_lsh": (q_similarity_lsh, _sql_similarity_lsh()),
    "asof_join": (q_asof_join, _SQL_ASOF),
    "asof_join_forward": (q_asof_join_forward, _SQL_ASOF_FORWARD),
    "asof_join_tolerance": (q_asof_join_tolerance, _SQL_ASOF_TOLERANCE),
    "range_join": (q_range_join, _SQL_RANGE_JOIN),
    "hypertable_rollup": (q_hypertable_rollup, _SQL_HYPERTABLE),
    # DataSketches estimate bits aren't DuckDB-reproducible; the gate hashes
    # exact counts + a within-published-bound boolean (semantics in
    # tests/test_sketches.py)
    "sketch_distinct_rollup": (q_sketch_distinct_rollup, _SQL_SKETCH_ROLLUP),
    # KLL estimate bits likewise aren't DuckDB-reproducible: hash the exact
    # percentiles + within-rank-bound booleans (two-level merge path)
    "sketch_quantile_rollup": (q_sketch_quantile_rollup, _SQL_KLL_ROLLUP),
    "frame_sample_rollup": (q_frame_sample_rollup, _SQL_FRAME_SAMPLE),
    "resize_media_stats": (q_resize_media_stats, _SQL_RESIZE_MEDIA),
    "similarity_pq": (q_similarity_pq, _sql_similarity_pq()),
    "embedding_normalize": (q_embedding_normalize, _SQL_EMB_NORMALIZE),
    "embedding_sq8": (q_embedding_sq8, _sql_embedding_sq8()),
    "embedding_covariance": (q_embedding_covariance,
                             _sql_embedding_covariance()),
    "hard_negatives": (q_hard_negatives, _sql_hard_negatives()),
    "hard_negatives_ivf": (q_hard_negatives_ivf, _sql_hard_negatives_ivf()),
    "iqr_outlier_filter": (q_iqr_outlier_filter, _SQL_IQR_OUTLIER),
    "doc_chunking": (q_doc_chunking, _sql_doc_chunking()),
    "dedup_substring_spans": (q_dedup_substring_spans,
                              _sql_dedup_substring_spans()),
    "heavy_hitters": (q_heavy_hitters, _sql_heavy_hitters_gate()),
    "quality_classifier": (q_quality_classifier, _sql_quality_classifier()),
    "gopher_rules": (q_gopher_rules, _sql_gopher_rules_gate()),
    "bpe_learn": (q_bpe_learn, _sql_bpe_learn_gate()),
    "unigram_logprob": (q_unigram_logprob, _sql_unigram_logprob()),
    "bigram_logprob": (q_bigram_logprob, _sql_bigram_logprob()),
    "perplexity_buckets": (q_perplexity_buckets, _sql_perplexity_buckets()),
    "tfidf_doc_topk": (q_tfidf_doc_topk, _sql_tfidf_doc_topk()),
    "source_kl": (q_source_kl, _sql_source_kl()),
    "bm25_rank": (q_bm25_rank, _sql_bm25_rank()),
    "bloom_decontaminate": (q_bloom_decontaminate,
                            _sql_bloom_decontaminate()),
    "cdc_snapshot_diff": (q_cdc_snapshot_diff, _sql_cdc_snapshot_diff()),
    "scd2_merge": (q_scd2_merge, _sql_scd2_merge()),
    "countmin_term_counts": (q_countmin_term_counts,
                             _sql_countmin_term_counts()),
    "ngram_novelty": (q_ngram_novelty, _sql_ngram_novelty()),
    "source_overlap_matrix": (q_source_overlap_matrix,
                              _sql_source_overlap_matrix()),
    "source_overlap_sketch": (q_source_overlap_sketch,
                              _sql_source_overlap_sketch()),
    "association_rules": (q_association_rules, _sql_association_rules()),
    "incremental_agg": (q_incremental_agg, _sql_incremental_agg()),
    "label_propagation": (q_label_propagation,
                          _sql_label_propagation_gate()),
    "pagerank_event_graph": (q_pagerank_event_graph,
                             _sql_pagerank_event_graph()),
    "pagerank_bucketed": (q_pagerank_bucketed_bipartite,
                          _sql_pagerank_bucketed_bipartite()),
    "line_dedup": (q_line_dedup, _sql_line_dedup()),
    "url_canonicalize": (q_url_canonicalize, _sql_url_canonicalize()),
    "html_strip": (q_html_strip, _sql_html_strip()),
    "streaming_sessions": (q_streaming_sessions, _SQL_STREAMING_SESSIONS),
    "streaming_windowed": (q_streaming_windowed, _SQL_STREAMING_WINDOWED),
    "streaming_view_maintenance": (q_streaming_view_maintenance,
                                   _SQL_STREAMING_IVM),
    "streaming_join_outer": (q_streaming_join_outer,
                             _SQL_STREAMING_JOIN_OUTER),
    "streaming_join_full_outer": (q_streaming_join_full_outer,
                                  _SQL_STREAMING_JOIN_FULL_OUTER),
    "streaming_ingest": (q_streaming_ingest, _SQL_STREAMING_INGEST),
    "compact_roundtrip": (q_compact_roundtrip, _SQL_COMPACT_ROUNDTRIP),
    "manifest_merge_apply": (q_manifest_merge_apply,
                             _SQL_MANIFEST_MERGE_APPLY),
    "streaming_join": (q_streaming_join, _SQL_STREAMING_JOIN),
    "streaming_hopping": (q_streaming_hopping, _SQL_STREAMING_HOPPING),
    "streaming_enrich": (q_streaming_enrich, _SQL_STREAMING_ENRICH),
    "streaming_dedup": (q_streaming_dedup, _SQL_STREAMING_DEDUP),
    "robust_stats": (q_robust_stats, _sql_robust_stats()),
    "dsir_select": (q_dsir_select, _sql_dsir_select()),
    "zorder_skipping": (q_zorder_skipping, _sql_zorder_skipping()),
    "compaction_plan": (q_compaction_plan, _sql_compaction_plan()),
    "debounce_events": (q_debounce_events, _sql_debounce_events()),
    "schema_evolution": (q_schema_evolution, _SQL_SCHEMA_EVOLUTION),
    "csv_dirty_read": (q_csv_dirty_read, _SQL_CSV_DIRTY),
    "bpe_segment_tokens": (q_bpe_segment_tokens, _sql_bpe_segment_gate()),
    "skew_diagnose": (q_skew_diagnose, _sql_skew_diagnose()),
    "logreg_quality": (q_logreg_quality, _sql_logreg_quality()),
    "join_size_estimate": (q_join_size_estimate,
                           _sql_join_size_estimate()),
    "validate_expectations": (q_validate_expectations,
                              _sql_validate_expectations()),
    "gapfill_resample": (q_gapfill_resample, _sql_gapfill_resample()),
}
