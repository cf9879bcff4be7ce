"""Pipeline gate registry, part 3/5 (see pipeline/queries.py for the catalog contract)."""

from .gates_common import *  # noqa: F401,F403
from .gates_01 import *  # noqa: F401,F403
from .gates_02 import *  # noqa: F401,F403



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
    best IVF buckets (nlist=20 centroids — a FIXED count independent of
    corpus size, stride ceil(N/20) from one cheap count — 20 matches the
    r10 fixed-stride centroid count at bench SF, so plan cost is
    unchanged there while the growth law is fixed), label filter
    rides the candidate join, top-5 per anchor.  No broadcast of
    anything corpus-sized — one shuffle join on centroid_id with
    bucket-bounded fan-out.  The oracle replays the deterministic
    quantizer (same count-derived stride), probing, label filter and
    ranking in SQL, so the hash checks the bucketed ALGORITHM
    (assignment tie-breaks included), not just plausible neighbors."""
    from .similarity import hard_negatives_ivf

    e = load_tables(spark, sf_dir)["embeddings"]
    return hard_negatives_ivf(e, k=5, nprobe=2, nlist=20)


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
  FROM hni_e WHERE vec_id % (SELECT (count(*) + 19) // 20 FROM hni_e) = 0),
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

    Scale: learning is vocab-bounded (see bpe_learn); application AND the
    per-doc counts are MAP-ONLY — the merge list is a constant-size model
    baked into the plan as literals (broadcast-by-construction), and
    bpe_token_counts folds the per-word symbol counts inside each row
    with array HOFs, so the whole apply half is one shuffle-free pass
    over the corpus (r15: previously explode + groupBy + distinct + left
    join, three exchanges).  The driver holds only the 10-row merge
    table (model fetch, not data collect).  Oracle: re-learns the same
    10 merges as materialized CTEs and applies them as nested replaces —
    end-to-end hash-checked."""
    from .bpe import bpe_learn, bpe_token_counts
    from .scoring import _spread

    d = load_tables(spark, sf_dir)["documents"]
    merges_df = bpe_learn(d, n_merges=10, vocab_partitions=1)
    merges = [(r["left"], r["right"])
              for r in merges_df.orderBy("rank").collect()]
    return (bpe_token_counts(_spread(d.select("doc_id", "text")), merges)
            .select("doc_id", "n_words", "n_bpe_tokens")
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
    from ..cache import track
    from .sketches import countmin_estimate, countmin_table

    d = load_tables(spark, sf_dir)["documents"]
    # spread the single parquet split so tokenization + the 4-cell md5
    # explode run on all cores (see scoring._spread)
    parts = spark.sparkContext.defaultParallelism * 2
    toks = d.repartition(parts).select(
        F.explode(TX.tokens(F.col("text"))).alias("term"))
    # ONE tokenize pass (r15): the exact term counts are persisted and the
    # sketch builds FROM them via weight_col — cell-for-cell identical to
    # sketching the raw token stream (the sketch is linear in term counts)
    # while the second corpus scan disappears at every scale.
    exact = track(
        toks.groupBy("term").agg(F.count(F.lit(1)).alias("exact_c"))
        .persist())
    probes = exact.orderBy(F.desc("exact_c"), F.asc("term")).limit(20)
    sketch = countmin_table(exact, [], "term", depth=4, width=512,
                            weight_col="exact_c")
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


__all__ = [
    'q_asof_join_forward',
    '_SQL_ASOF_FORWARD',
    '_SQL_ASOF',
    'q_hypertable_rollup',
    '_SQL_HYPERTABLE',
    'q_range_join',
    '_SQL_RANGE_JOIN',
    'q_asof_join_tolerance',
    '_SQL_ASOF_TOLERANCE',
    'q_hard_negatives',
    '_sql_hard_negatives',
    'q_hard_negatives_ivf',
    '_sql_hard_negatives_ivf',
    'q_embedding_covariance',
    '_sql_embedding_covariance',
    'q_embedding_sq8',
    '_sql_embedding_sq8',
    'q_embedding_normalize',
    '_SQL_EMB_NORMALIZE',
    'q_iqr_outlier_filter',
    '_SQL_IQR_OUTLIER',
    'q_similarity_pq',
    '_sql_similarity_pq',
    'q_doc_chunking',
    '_sql_doc_chunking',
    'q_dedup_substring_spans',
    '_sql_dedup_substring_spans',
    'q_heavy_hitters',
    '_sql_heavy_hitters_gate',
    '_GOPHER_PLANTS',
    'q_gopher_rules',
    '_sql_gopher_rules_gate',
    'q_bpe_learn',
    'q_bpe_segment_tokens',
    '_sql_bpe_segment_gate',
    '_sql_bpe_learn_gate',
    'q_quality_classifier',
    '_sql_quality_classifier',
    'q_unigram_logprob',
    '_sql_unigram_logprob',
    'q_bigram_logprob',
    '_sql_bigram_logprob',
    'q_tfidf_doc_topk',
    '_sql_tfidf_doc_topk',
    'q_source_kl',
    '_sql_source_kl',
    'q_perplexity_buckets',
    '_sql_perplexity_buckets',
    '_BM25_QUERY',
    'q_bm25_rank',
    '_sql_bm25_rank',
    'q_bloom_decontaminate',
    '_sql_bloom_decontaminate',
    '_CDC_COMPARE',
    '_CDC_NEW_SQL',
    '_cdc_new_crawl',
    'q_cdc_snapshot_diff',
    '_sql_cdc_snapshot_diff',
    'q_scd2_merge',
    '_sql_scd2_merge',
    'q_countmin_term_counts',
    '_sql_countmin_term_counts',
    'q_ngram_novelty',
    '_sql_ngram_novelty',
    'q_source_overlap_matrix',
    '_sql_source_overlap_matrix',
    'q_source_overlap_sketch',
    '_sql_source_overlap_sketch',
    'q_pagerank_event_graph',
    '_sql_pagerank_event_graph',
    'q_incremental_agg',
]
