"""Corpus term statistics: exact heavy hitters and a hashed linear
quality classifier.

**Heavy hitters** finds every term with global frequency > N/T (threshold
``1/T`` of the token stream) *exactly*, with no vocabulary-sized shuffle:

1. per-partition counts of *hash buckets* (``groupBy(pid, bucket)``,
   pid = spark_partition_id) — the exchange is bounded by
   ``n_buckets × #partitions`` rows regardless of vocabulary size;
2. local pruning by the pigeonhole bound: if ``count(t) * T > N`` globally,
   then some partition has ``count_p(t) * T > n_p`` (else summing the
   per-partition inequalities contradicts the global one); a bucket's
   count upper-bounds its member terms' counts, so the locally-heavy
   buckets are a candidate superset of every true heavy hitter;
3. exact recount of tokens in heavy buckets only (broadcast semi-join on
   bucket id), filtered by the exact global threshold.

This is the distributed count-min/SpaceSaving shape with an exact answer
(the recount pass removes both collision and pigeonhole slack) — the op
behind "most frequent domains / boilerplate n-grams / stop phrases"
corpus reports.

**Quality classifier** is a fasttext-shaped linear scorer over hashed
token features with a deterministic weight table: weight(t) =
(md5_60(t) mod 1001) - 500, summed as *integers* (exact, no float
associativity drift) and normalized at the end.  It is a stand-in for a
trained model's inference plan — the Spark shape (pure expression fold,
no shuffle, no Python) is what matters; swap the hash-derived weight for a
broadcast learned table to productionize.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_int60
from .text import sql_tokens, tokens

__all__ = [
    "heavy_hitters", "classifier_score", "with_classifier",
    "sql_heavy_hitters", "sql_classifier_score",
    "tfidf_doc_topk", "sql_tfidf_doc_topk",
    "source_kl_divergence", "sql_source_kl_divergence",
]


def heavy_hitters(df: DataFrame, text_col: str = "text",
                  threshold_inv: int = 256,
                  n_buckets: int = 1 << 16) -> DataFrame:
    """All terms with global count * threshold_inv > total tokens, exact.

    Returns (term, cnt) for every term above frequency 1/threshold_inv.

    The pruning pass counts *hash buckets*, not terms: the first exchange
    carries at most ``n_buckets × #partitions`` rows no matter how large
    the vocabulary is (a plain ``groupBy(term)`` pre-filter would shuffle
    every per-partition distinct term — vocabulary-sized — which defeats
    the purpose; this was visible in the audited plan of the first cut).
    A bucket's count upper-bounds every member term's count, so any bucket
    that clears the local pigeonhole threshold in some partition yields a
    candidate superset; the recount pass then aggregates ONLY tokens
    falling in heavy buckets (a broadcast semi-join — vocab-fraction
    ~ heavy_buckets/n_buckets plus collisions) and applies the exact
    global threshold.  Both passes are map-only scans plus bounded
    aggregations; nothing vocabulary-sized ever crosses the wire.
    """
    from ..cache import track

    bucket = (md5_int60(F.col("term")) % n_buckets).alias("bucket")
    ex = df.select(F.explode(tokens(F.col(text_col))).alias("term"))
    bucketed = ex.select(bucket).withColumn("pid", F.spark_partition_id())
    # track()ed like every other pipeline persist so release_all()/
    # pipeline_cache_scope can free it in long-lived sessions
    local = track(bucketed.groupBy("pid", "bucket")
                  .agg(F.count(F.lit(1)).alias("cnt"))
                  .persist())
    part_totals = local.groupBy("pid").agg(F.sum("cnt").alias("n_pid"))
    heavy_buckets = (local.join(part_totals, "pid")
                     .filter(F.col("cnt") * threshold_inv > F.col("n_pid"))
                     .select("bucket").distinct())
    total = part_totals.agg(F.sum("n_pid").alias("n_total"))
    exact = (ex.select("term", bucket)
             .join(F.broadcast(heavy_buckets), "bucket")
             .groupBy("term").agg(F.count(F.lit(1)).alias("cnt")))
    return (exact.crossJoin(F.broadcast(total))
            .filter(F.col("cnt") * threshold_inv > F.col("n_total"))
            .select("term", "cnt"))


def sql_heavy_hitters(table: str, text_col: str = "text",
                      threshold_inv: int = 256) -> str:
    """DuckDB mirror: exact threshold frequency over the token stream."""
    return f"""
WITH hh_ex AS (
  SELECT unnest({sql_tokens(text_col)}) AS term FROM {table}
)
SELECT term, count(*) AS cnt
FROM hh_ex
GROUP BY term
HAVING count(*) * {threshold_inv} > (SELECT count(*) FROM hh_ex)
"""


def classifier_score(text: Column) -> tuple[Column, Column]:
    """(score, label) of the hashed linear classifier.

    Integer weight per token: (md5_60(token) mod 1001) - 500, in
    [-500, 500].  score = sum(weights) / (500 * n_tokens) in [-1.0, 1.0],
    rounded to 6dp; label = integer weight sum > 0 (decided on exact
    integers, so the boolean can never flip on float rounding).  Empty
    documents score 0.0 / false.
    """
    tk = tokens(F.coalesce(text, F.lit("")))  # NULL text = empty document
    wsum = F.aggregate(
        F.transform(tk, lambda t: md5_int60(t) % 1001 - 500),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    n = F.size(tk)
    score = F.when(n == 0, F.lit(0.0)).otherwise(
        F.round(wsum / (500.0 * n), 6))
    return score, wsum > 0


def with_classifier(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append clf_score / clf_label columns — one codegen'd projection."""
    score, label = classifier_score(F.col(text_col))
    return df.withColumn("clf_score", score).withColumn("clf_label", label)


def sql_classifier_score(col: str) -> tuple[str, str]:
    """DuckDB mirror of classifier_score: (score_sql, label_sql)."""
    wsum = (f"list_sum(list_transform({sql_tokens(col)}, "
            f"t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 1001 - 500))")
    n = f"len({sql_tokens(col)})"
    score = (f"CASE WHEN {n} = 0 THEN 0.0 "
             f"ELSE round({wsum} / (500.0 * {n}), 6) END")
    label = f"coalesce({wsum} > 0, false)"
    return score, label


# ---------------------------------------------------------------------------
# Sparse TF-IDF document similarity (inverted-index top-k)
# ---------------------------------------------------------------------------

def tfidf_doc_topk(
    df: DataFrame, k: int = 5, id_col: str = "doc_id",
    text_col: str = "text", ngram: int = 3, max_df: int = 100,
) -> DataFrame:
    """(doc_id, neighbor_id, sim, rank): each document's k most similar
    peers by TF-IDF-weighted cosine over ``ngram``-token shingle phrases —
    the SPARSE half of the similarity family (embedding_neardup/
    cosine_topk are the dense half): no model, exact phrase evidence,
    and the inverted index IS the candidate structure.

    Plan: tokens → shingle stream (map-side slice window, no join) →
    per-(doc, shingle) tf → shingle df; shingles with df > ``max_df``
    drop BEFORE pair generation (stop-phrase guard — df caps every
    shingle's pair fan-out at C(max_df, 2), the same occupancy bound as
    ngram_jaccard's); idf = ln((N+1)/(df+1)) + 1; ONE doc-keyed aggregate
    both computes the L2 norm and normalizes the doc's postings in-row
    (over the post-cap space — similarity lives in the capped space on
    both engines); pair dots come from ONE shingle-keyed aggregation
    collecting each posting list sorted by doc id and expanding its
    C(m, 2) ordered pairs map-side (no postings self-join), summing
    9dp-rounded weight products as exact decimals (order-independent);
    one doc-keyed window takes top-k over both pair orientations.

    At 100 TB: every key in every shuffle is a shingle or a doc id —
    fine-grained; quadratic exposure is bounded by max_df; and the heavy
    stream (postings) carries 3 columns."""
    from pyspark.sql import Window

    from ..cache import track

    n_docs = df.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    # Tokenize ONCE per doc below the exchange, shingle above it: the
    # repartition both spreads the work (a small parquet source arrives
    # as ONE input split — scoring._spread rationale) and materializes
    # the token array, so each element_at reads the shuffled array
    # instead of re-running the tokenizer per position (which is
    # O(len^2) regex work; measured 20 s -> ~1 s for the shingle stream
    # at sf0.1).
    parts = df.sparkSession.sparkContext.defaultParallelism * 2
    tok = (df.repartition(parts)
           .select(F.col(id_col), tokens(F.col(text_col)).alias("_t"))
           .repartition(parts, F.col(id_col)))
    t = F.col("_t")
    sh_arr = F.when(F.size(t) < ngram, F.array(
        F.array_join(t, " "))).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (ngram - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, i + off)
                       for off in range(ngram)])))
    sh = tok.select(F.col(id_col), F.explode(sh_arr).alias("s"))
    tf = track(sh.groupBy(id_col, "s")
               .agg(F.count(F.lit(1)).alias("tf")).persist())
    dfreq = (tf.groupBy("s").agg(F.count(F.lit(1)).alias("df_"))
             .filter(F.col("df_") <= max_df))
    w = (tf.join(dfreq, "s")
         .crossJoin(F.broadcast(n_docs))
         .select(F.col(id_col), "s",
                 (F.col("tf") * (F.log((F.col("_n") + 1.0)
                                       / (F.col("df_") + 1.0)) + 1.0))
                 .alias("w")))
    # L2-normalize in ONE doc-keyed aggregation (r16): collect the doc's
    # posting list and its norm together, normalize in-row on the way
    # back out — the previous norms-groupBy + join-back re-exchanged the
    # whole weight table on the doc key a second time.  Row width is the
    # per-doc distinct-shingle list — document-bounded, the same envelope
    # as the per-doc shingle arrays the minhash family holds in-row.
    per_doc = (w.groupBy(id_col)
               .agg(F.collect_list(F.struct("s", "w")).alias("_ps"),
                    F.sqrt(F.sum(F.round(F.col("w") * F.col("w"), 9)
                                 .cast("decimal(30,9)")).cast("double"))
                    .alias("_nrm")))
    wn = track(
        per_doc.select(F.col(id_col), F.explode("_ps").alias("_p"),
                       F.col("_nrm"))
        .select(F.col(id_col), F.col("_p.s").alias("s"),
                (F.col("_p.w") / F.col("_nrm")).alias("wn"))
        .persist())
    # pair dots via ONE partially-aggregated groupBy on the shingle key
    # collecting each posting list SORTED by doc id, expanded map-side
    # into its C(m, 2) ordered pairs (r16 — the association_rules /
    # _candidates shape): the banded self-join paid two posting-table
    # exchanges plus the join; the bucket fan-out is bounded by the
    # max_df cap (dfreq filtered above), so a bucket row holds ≤ max_df
    # (id, weight) structs and expands to ≤ C(max_df, 2) pair structs.
    buckets = (wn.groupBy("s")
               .agg(F.sort_array(F.collect_list(
                   F.struct(F.col(id_col).alias("a"),
                            F.col("wn").alias("wa")))).alias("m")))
    pair_expr = F.expr("""
      flatten(transform(m, (x, i) ->
        transform(slice(m, i + 2, greatest(size(m) - i - 1, 0)), y ->
          named_struct('a', x.a, 'b', y.a,
                       'd', CAST(round(x.wa * y.wa, 9) AS DECIMAL(30,9))))))
    """)
    dots = (buckets.select(F.explode(pair_expr).alias("_q"))
            .select("_q.a", "_q.b", "_q.d")
            .groupBy("a", "b")
            .agg(F.sum("d").alias("d")))
    # both orientations of each pair, expanded map-side in ONE pass over
    # the aggregated pair table — a union of two projections would re-run
    # the postings join + pair aggregation once per branch (only exchanges
    # are reused across union arms, not the joins/aggregates above them)
    both = (dots.select(F.explode(F.array(
        F.struct(F.col("a").alias("i"), F.col("b").alias("nb"),
                 F.col("d").alias("d")),
        F.struct(F.col("b").alias("i"), F.col("a").alias("nb"),
                 F.col("d").alias("d")))).alias("p"))
        .select(F.col("p.i").alias(id_col),
                F.col("p.nb").alias("neighbor_id"), F.col("p.d").alias("d")))
    win = Window.partitionBy(id_col).orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc())
    return (both.select(id_col, "neighbor_id",
                        F.round(F.col("d").cast("double"), 6).alias("sim"))
            .withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= k))


def sql_tfidf_doc_topk(table: str, k: int = 5, id_col: str = "doc_id",
                       text_col: str = "text", ngram: int = 3,
                       max_df: int = 100) -> str:
    """DuckDB mirror of ``tfidf_doc_topk``."""
    toks = sql_tokens(text_col)
    return f"""
WITH td_tok AS (SELECT {id_col}, {toks} AS t FROM {table}),
td_sh AS (
  SELECT {id_col},
    unnest(CASE WHEN len(t) < {ngram} THEN [array_to_string(t, ' ')]
      ELSE list_transform(generate_series(1, len(t) - {ngram - 1}),
        i -> array_to_string(list_slice(t, i, i + {ngram - 1}), ' ')) END)
      AS s
  FROM td_tok),
td_tf AS (SELECT {id_col}, s, COUNT(*) AS tf FROM td_sh
          GROUP BY {id_col}, s),
td_n AS (SELECT COUNT(*)::DOUBLE AS n FROM {table}),
td_df AS (SELECT s, COUNT(*) AS df_ FROM td_tf GROUP BY s
          HAVING COUNT(*) <= {max_df}),
td_w AS (
  SELECT {id_col}, s, tf * (ln((n.n + 1.0) / (df_ + 1.0)) + 1.0) AS w
  FROM td_tf JOIN td_df USING (s), td_n n),
td_nrm AS (
  SELECT {id_col},
    sqrt(SUM(round(w * w, 9)::DECIMAL(30,9))::DOUBLE) AS nrm
  FROM td_w GROUP BY {id_col}),
td_wn AS (
  SELECT {id_col}, s, w / nrm AS wn FROM td_w JOIN td_nrm USING ({id_col})),
td_dots AS (
  SELECT a.{id_col} AS a, b.{id_col} AS b,
    SUM(round(a.wn * b.wn, 9)::DECIMAL(30,9)) AS d
  FROM td_wn a JOIN td_wn b ON a.s = b.s AND a.{id_col} < b.{id_col}
  GROUP BY a.{id_col}, b.{id_col}),
td_both AS (
  SELECT a AS {id_col}, b AS neighbor_id, d FROM td_dots
  UNION ALL
  SELECT b, a, d FROM td_dots)
SELECT {id_col}, neighbor_id, sim, rank FROM (
  SELECT {id_col}, neighbor_id, round(d::DOUBLE, 6) AS sim,
    row_number() OVER (PARTITION BY {id_col}
                       ORDER BY round(d::DOUBLE, 6) DESC,
                                neighbor_id ASC)::INT AS rank
  FROM td_both) WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# Source-mixture divergence (data-mixing diagnostic)
# ---------------------------------------------------------------------------

def source_kl_divergence(
    df: DataFrame, group_col: str = "source", id_col: str = "doc_id",
    text_col: str = "text", alpha: float = 0.5,
) -> DataFrame:
    """(group, n_tokens, vocab, kl_bits): per-source KL divergence of the
    source's add-alpha-smoothed unigram distribution from the whole
    corpus's — the data-mixing diagnostic (which sources are
    distributionally far from the blend they'll be mixed into; feeds
    mixture-weight and curriculum decisions).

    KL(P_src || P_corpus) = Σ_t P_src(t) · log2(P_src(t) / P_corpus(t)),
    summed over the CORPUS vocabulary with both estimators add-alpha
    smoothed over that same vocabulary (so every term has mass on both
    sides and the sum is finite).  Per-term contributions round to 9dp
    and sum as exact decimals — order-independent, hash-oracle safe.

    Plan: one token explode → (group, term) counts (fine-grained keys);
    corpus counts derive FROM the group table (never a second corpus
    scan); the join is (group-vocab × 1) on the term key; totals are
    1-row broadcasts.  Nothing is ever keyed coarser than a term."""
    from ..cache import track

    parts = df.sparkSession.sparkContext.defaultParallelism * 2
    tok = (df.repartition(parts)
           .select(F.col(group_col).alias("g"),
                   F.explode(tokens(F.col(text_col))).alias("t")))
    gc = track(tok.groupBy("g", "t").agg(F.count(F.lit(1)).alias("c"))
               .persist())
    cc = gc.groupBy("t").agg(F.sum("c").alias("cc"))
    vocab = cc.agg(F.count(F.lit(1)).cast("double").alias("_v"),
                   F.sum("cc").cast("double").alias("_nc"))
    gtot = gc.groupBy("g").agg(F.sum("c").cast("double").alias("ng"))
    # every (group, corpus-term) pair needs mass: right-join group counts
    # onto the corpus vocabulary per group
    grid = (gtot.crossJoin(cc)
            .join(gc, ["g", "t"], "left")
            .crossJoin(F.broadcast(vocab)))
    p_src = (F.coalesce(F.col("c"), F.lit(0)) + F.lit(alpha)) \
        / (F.col("ng") + F.lit(alpha) * F.col("_v"))
    p_cor = (F.col("cc") + F.lit(alpha)) \
        / (F.col("_nc") + F.lit(alpha) * F.col("_v"))
    contrib = F.round(p_src * F.log2(p_src / p_cor), 9) \
        .cast("decimal(20,9)")
    return (grid.groupBy("g")
            .agg(F.max("ng").alias("_ng"),
                 F.count(F.lit(1)).cast("long").alias("vocab"),
                 F.sum(contrib).alias("_kl"))
            .select(F.col("g").alias(group_col),
                    F.col("_ng").cast("long").alias("n_tokens"),
                    "vocab",
                    F.round(F.col("_kl").cast("double"), 6)
                    .alias("kl_bits")))


def sql_source_kl_divergence(
    table: str, group_col: str = "source", text_col: str = "text",
    alpha: float = 0.5,
) -> str:
    """DuckDB mirror of ``source_kl_divergence``."""
    toks = sql_tokens(text_col)
    return f"""
WITH kl_tok AS (
  SELECT {group_col} AS g, unnest({toks}) AS t FROM {table}
),
kl_gc AS (SELECT g, t, COUNT(*) AS c FROM kl_tok GROUP BY g, t),
kl_cc AS (SELECT t, SUM(c)::BIGINT AS cc FROM kl_gc GROUP BY t),
kl_v AS (SELECT COUNT(*)::DOUBLE AS v, SUM(cc)::DOUBLE AS nc FROM kl_cc),
kl_gt AS (SELECT g, SUM(c)::DOUBLE AS ng FROM kl_gc GROUP BY g),
kl_grid AS (
  SELECT gt.g, gt.ng, c.t, c.cc, coalesce(gc.c, 0) AS c
  FROM kl_gt gt CROSS JOIN kl_cc c
  LEFT JOIN kl_gc gc ON gc.g = gt.g AND gc.t = c.t
)
SELECT g AS {group_col}, MAX(ng)::BIGINT AS n_tokens,
  COUNT(*)::BIGINT AS vocab,
  round(SUM(round(((c + {alpha}) / (ng + {alpha} * v.v))
        * log2(((c + {alpha}) / (ng + {alpha} * v.v))
               / ((cc + {alpha}) / (v.nc + {alpha} * v.v))),
        9)::DECIMAL(20,9))::DOUBLE, 6) AS kl_bits
FROM kl_grid, kl_v v GROUP BY g
"""
