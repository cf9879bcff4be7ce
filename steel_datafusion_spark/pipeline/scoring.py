"""Corpus-statistical scoring & screening: unigram language-model scores,
BM25 retrieval, Bloom-filter decontamination.

Beyond-reference surface for the LLM-training-data north star:

- **unigram_logprob_score** — the cheapest useful "perplexity-ish" quality
  signal: fit an add-alpha-smoothed unigram model on the corpus itself, then
  score every document by its mean negative log-probability.  Gibberish and
  boilerplate-heavy documents land in the tails; quality filters threshold
  on it (the shape of the fastText/KenLM scoring stage, with the model
  reduced to a term table).
- **bm25_score** — classic probabilistic retrieval over the inverted index:
  rank documents against a query term set.  Curation uses it for
  query-anchored subsetting ("pull the docs most relevant to X") and for
  benchmark-leakage triage beyond exact n-gram hits.
- **bloom_decontaminate** — the 100 TB decontamination shape: instead of
  joining the corpus against the full benchmark n-gram set (pipeline/
  curation.py ``decontaminate`` — exact, but the benchmark set rides every
  task), fold the benchmark into a ``bits``-wide Bloom filter (k affine
  hash positions per gram, the same md5+Mersenne mixes as MinHash), and
  screen corpus grams against the O(bits) broadcast set.  False positives
  are possible (bounded by the classic (1-e^{-kn/m})^k), false negatives are
  not — exactly the right direction for a screen-then-verify pipeline: the
  exact join only runs over the flagged survivors.

Determinism / oracle parity: ln() on identical double inputs agrees across
engines to the last bit in practice; every per-row score is rounded before
any cross-row aggregation, and cross-row sums route through exact decimals,
so aggregates are order-independent (the repo-wide convention).

Scale notes: the unigram model and BM25 document-frequency tables shuffle
on the term hash (fine-grained keys); the Bloom bit-set is a broadcast of
at most ``bits`` longs regardless of benchmark size; nothing collects to
the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import PERM_CONSTS, SQL, _mix, md5_int60, shingles
from .text import sql_tokens, tokens

__all__ = [
    "unigram_logprob_score", "bigram_logprob_score", "bm25_score",
    "bloom_bit_positions", "bloom_decontaminate",
    "sql_unigram_logprob_score", "sql_bigram_logprob_score", "sql_bm25_score",
    "sql_bloom_decontaminate", "ngram_novelty_score", "sql_ngram_novelty_score",
    "interpolated_logprob_score", "perplexity_buckets",
    "sql_interpolated_logprob_score", "sql_perplexity_buckets",
]




def _spread(df: DataFrame) -> DataFrame:
    """Repartition before a CPU-heavy tokenize/hash explode: a small
    parquet source arrives as ONE input split, which would serialize the
    per-row stage onto a single core (measured 3-4x gate slowdowns at
    sf0.1 — same rationale as dedup._hashed_shingles).

    No-op when the frame already has at least that many partitions (a
    multi-split scan at cluster scale) — the round-robin exchange exists
    to fix under-parallelism, not to re-shuffle data that is already
    spread."""
    parts = df.sparkSession.sparkContext.defaultParallelism * 2
    try:
        if df.rdd.getNumPartitions() >= parts:
            return df
    except Exception:
        pass  # un-plannable edge (e.g. no active context) — just spread
    return df.repartition(parts)


# ---------------------------------------------------------------------------
# Unigram LM scoring
# ---------------------------------------------------------------------------

def unigram_logprob_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """(id, n_tokens, mean_neg_logprob): add-alpha unigram model fit on the
    corpus, documents scored by mean -ln p(token).

    p(t) = (count(t) + alpha) / (total_tokens + alpha * vocab_size); each
    token's -ln p is rounded to 9dp and summed as an exact decimal, so the
    per-document mean is order-independent (hash-oracle safe).  Empty
    documents score 0.0 (they carry no evidence either way; a length filter
    owns that axis).

    Plan: explode → VOCAB-sized term-count table (map-side-combined
    groupBy, persisted — totals and the logprob table both read it) →
    1-row totals broadcast → logprob term table joined back to the token
    stream on the term key → per-doc decimal sum.  The scoring join
    re-evaluates the tokenize lineage (two map-only CPU passes over the
    corpus in total) rather than persisting a per-(doc, term) count
    table: r16 measured the position-scale cache costing MORE than the
    tokenize pass it saves at sf0.1, 10x and 30x (bench_runs/
    lm_sweep_r16.json — 30x: 8.7 s stream vs 18.8 s cached; on this
    corpus distinct (doc, term) ≈ positions, so the cache dedups nothing
    and its materialization is pure overhead).  A corpus with heavy
    within-doc term repetition shifts the trade back toward a persisted
    count table; the vocab-sized model persist below is shape-invariant.
    """
    from ..cache import track
    toks = _spread(df).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
    # two consumers (totals + logp) — persist so neither re-aggregates
    counts = track(
        toks.groupBy("term").agg(F.count(F.lit(1)).alias("c")).persist())
    totals = counts.agg(
        F.sum("c").cast("double").alias("_total"),
        F.count(F.lit(1)).cast("double").alias("_vocab"))
    logp = (counts.crossJoin(F.broadcast(totals))
            .select("term",
                    F.round(-F.log((F.col("c") + F.lit(alpha))
                                   / (F.col("_total")
                                      + F.lit(alpha) * F.col("_vocab"))), 9)
                    .cast("decimal(20,9)").alias("nlp")))
    scored = (toks.join(logp, "term")
              .groupBy(id_col)
              .agg(F.count(F.lit(1)).alias("n_tokens"),
                   F.sum("nlp").alias("s")))
    return (df.select(F.col(id_col)).distinct()
            .join(scored, id_col, "left")
            .select(
                F.col(id_col),
                F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long")
                .alias("n_tokens"),
                F.when(F.col("n_tokens").isNull(), F.lit(0.0))
                .otherwise(F.round(F.col("s").cast("double")
                                   / F.col("n_tokens"), 6))
                .alias("mean_neg_logprob")))


def sql_unigram_logprob_score(table: str, id_col: str = "doc_id",
                              text_col: str = "text",
                              alpha: float = 0.5) -> str:
    toks = sql_tokens(text_col)
    return f"""
WITH ulp_tok AS (
  SELECT {id_col}, unnest({toks}) AS term FROM {table}
),
ulp_counts AS (SELECT term, COUNT(*) AS c FROM ulp_tok GROUP BY term),
ulp_tot AS (SELECT SUM(c)::DOUBLE AS total, COUNT(*)::DOUBLE AS vocab
            FROM ulp_counts),
ulp_logp AS (
  SELECT term,
    round(-ln((c + {alpha}) / (t.total + {alpha} * t.vocab)),
          9)::DECIMAL(20,9) AS nlp
  FROM ulp_counts, ulp_tot t
),
ulp_scored AS (
  SELECT {id_col}, COUNT(*) AS n_tokens, SUM(nlp) AS s
  FROM ulp_tok JOIN ulp_logp USING (term) GROUP BY {id_col}
)
SELECT d.{id_col},
  coalesce(s.n_tokens, 0)::BIGINT AS n_tokens,
  CASE WHEN s.n_tokens IS NULL THEN 0.0
       ELSE round(s.s::DOUBLE / s.n_tokens, 6) END AS mean_neg_logprob
FROM (SELECT DISTINCT {id_col} FROM {table}) d
LEFT JOIN ulp_scored s USING ({id_col})
"""


def bigram_logprob_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """(id, n_bigrams, mean_neg_logprob): add-alpha BIGRAM model fit on the
    corpus itself — one conditioning step deeper than
    ``unigram_logprob_score``, so word-salad that passes a unigram filter
    (plausible words, implausible sequences) lands in the tail.

    p(w_i | w_{i-1}) = (c(w_{i-1} w_i) + alpha) / (c_prefix(w_{i-1}) +
    alpha * V_bigram), with c_prefix counting the word's occurrences AS A
    BIGRAM PREFIX and V_bigram the distinct-bigram count — every quantity
    comes from one bigram-count table, keeping the model a single
    fine-grained aggregation.  Documents with < 2 tokens score 0 over 0
    bigrams.  Per-position -ln p is rounded to 9dp and summed as an exact
    decimal (order-independent, hash-oracle safe).

    Plan: posexplode tokens → self-join-free bigram stream via lead()
    ... actually a positional self-join is avoided entirely by zipping
    the token array with its own tail (arrays_zip + slice) map-side →
    bigram counts groupBy (fine-grained key) → prefix counts as a second
    groupBy OVER THE BIGRAM TABLE (|vocab| keys, not corpus-sized) →
    1-row totals broadcast → logprob table joined back to the bigram
    stream (shuffle on the bigram key) → per-doc decimal sum."""
    toks = tokens(F.col(text_col))
    bigram_arr = F.when(
        F.size(toks) < 2, F.array().cast("array<string>")
    ).otherwise(F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.concat_ws(" ", a, b)))
    # VOCAB-sized model-count table persisted (three consumers:
    # prefix/totals/logp); the scoring join runs over the per-position
    # stream, re-evaluating the tokenize lineage — r16 reverted the
    # per-(doc, bigram) cached-count shape after measuring the
    # position-scale cache costing more than the tokenize pass it saves
    # at sf0.1 / 10x / 30x (see unigram_logprob_score's plan note and
    # bench_runs/lm_sweep_r16.json).
    from ..cache import track
    bg = _spread(df).select(F.col(id_col), F.explode(bigram_arr).alias("bg"))
    counts = track(
        bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c")).persist())
    prefix = (counts.select(
        F.element_at(F.split(F.col("bg"), " "), 1).alias("w1"), "c")
        .groupBy("w1").agg(F.sum("c").alias("cp")))
    totals = counts.agg(F.count(F.lit(1)).cast("double").alias("_vocab"))
    logp = (counts
            .withColumn("w1", F.element_at(F.split(F.col("bg"), " "), 1))
            .join(prefix, "w1")
            .crossJoin(F.broadcast(totals))
            .select("bg",
                    F.round(-F.log((F.col("c") + F.lit(alpha))
                                   / (F.col("cp")
                                      + F.lit(alpha) * F.col("_vocab"))), 9)
                    .cast("decimal(20,9)").alias("nlp")))
    scored = (bg.join(logp, "bg")
              .groupBy(id_col)
              .agg(F.count(F.lit(1)).alias("n_bigrams"),
                   F.sum("nlp").alias("s")))
    return (df.select(F.col(id_col)).distinct()
            .join(scored, id_col, "left")
            .select(
                F.col(id_col),
                F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long")
                .alias("n_bigrams"),
                F.when(F.col("n_bigrams").isNull(), F.lit(0.0))
                .otherwise(F.round(F.col("s").cast("double")
                                   / F.col("n_bigrams"), 6))
                .alias("mean_neg_logprob")))


def sql_bigram_logprob_score(table: str, id_col: str = "doc_id",
                             text_col: str = "text",
                             alpha: float = 0.5) -> str:
    toks = sql_tokens(text_col)
    return f"""
WITH bg_tok AS (
  SELECT {id_col}, {toks} AS t FROM {table}
),
bg_stream AS (
  SELECT {id_col},
    unnest(list_transform(generate_series(1, len(t) - 1),
                          i -> t[i] || ' ' || t[i + 1])) AS bg
  FROM bg_tok WHERE len(t) >= 2
),
bg_counts AS (SELECT bg, COUNT(*) AS c FROM bg_stream GROUP BY bg),
bg_prefix AS (
  SELECT list_extract(string_split(bg, ' '), 1) AS w1, SUM(c) AS cp
  FROM bg_counts GROUP BY 1
),
bg_tot AS (SELECT COUNT(*)::DOUBLE AS vocab FROM bg_counts),
bg_logp AS (
  SELECT bg,
    round(-ln((c + {alpha}) / (p.cp + {alpha} * t.vocab)),
          9)::DECIMAL(20,9) AS nlp
  FROM bg_counts
  JOIN bg_prefix p ON list_extract(string_split(bg, ' '), 1) = p.w1,
  bg_tot t
),
bg_scored AS (
  SELECT {id_col}, COUNT(*) AS n_bigrams, SUM(nlp) AS s
  FROM bg_stream JOIN bg_logp USING (bg) GROUP BY {id_col}
)
SELECT d.{id_col},
  coalesce(s.n_bigrams, 0)::BIGINT AS n_bigrams,
  CASE WHEN s.n_bigrams IS NULL THEN 0.0
       ELSE round(s.s::DOUBLE / s.n_bigrams, 6) END AS mean_neg_logprob
FROM (SELECT DISTINCT {id_col} FROM {table}) d
LEFT JOIN bg_scored s USING ({id_col})
"""


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------

def bm25_score(
    df: DataFrame, query_terms: list[str],
    id_col: str = "doc_id", text_col: str = "text",
    k1: float = 1.2, b: float = 0.75, k: int = 20,
) -> DataFrame:
    """Top-``k`` documents for ``query_terms`` under BM25
    (Robertson/Sparck-Jones idf: ln(1 + (N - df + 0.5)/(df + 0.5))).

    Per-term partial scores are rounded to 9dp and summed as exact
    decimals (order-independent); final score rounded to 6dp, ties broken
    by id.  Only documents containing at least one query term appear.

    Plan: the token stream filters to the query terms FIRST (a tiny
    broadcast literal array — at scale this is the inverted-index seek,
    not a corpus scan), then per-(doc, term) tf, per-term df, document
    lengths, and a 1-row (N, avgdl) broadcast fold into the score.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    qlit = F.array(*[F.lit(t) for t in query_terms])
    toks = df.select(F.col(id_col),
                     F.explode(tokens(F.col(text_col))).alias("term"))
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = df.select(
        F.count(F.lit(1)).cast("double").alias("_n")).crossJoin(
        dl.agg(F.avg("dl").alias("_avgdl")))
    qtoks = toks.filter(F.array_contains(qlit, F.col("term")))
    tf = qtoks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    part = (tf.join(F.broadcast(dfreq), "term")
            .join(dl, id_col)
            .crossJoin(F.broadcast(stats))
            .select(
                F.col(id_col),
                F.round(
                    F.log(1.0 + (F.col("_n") - F.col("df") + 0.5)
                          / (F.col("df") + 0.5))
                    * (F.col("tf") * (k1 + 1))
                    / (F.col("tf") + k1 * (1 - b + b * F.col("dl")
                                           / F.col("_avgdl"))), 9)
                .cast("decimal(20,9)").alias("part")))
    scored = part.groupBy(id_col).agg(
        F.round(F.sum("part").cast("double"), 6).alias("bm25"))
    from pyspark.sql.window import Window
    w = Window.orderBy(F.col("bm25").desc(), F.col(id_col).asc())
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select(id_col, "bm25", "rnk"))


def sql_bm25_score(table: str, query_terms: list[str],
                   id_col: str = "doc_id", text_col: str = "text",
                   k1: float = 1.2, b: float = 0.75, k: int = 20) -> str:
    toks = sql_tokens(text_col)
    qlist = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    return f"""
WITH bm_tok AS (
  SELECT {id_col}, unnest({toks}) AS term FROM {table}
),
bm_dl AS (SELECT {id_col}, COUNT(*) AS dl FROM bm_tok GROUP BY {id_col}),
bm_stats AS (
  SELECT (SELECT COUNT(*) FROM {table})::DOUBLE AS n,
         (SELECT AVG(dl) FROM bm_dl) AS avgdl
),
bm_tf AS (
  SELECT {id_col}, term, COUNT(*) AS tf FROM bm_tok
  WHERE term IN ({qlist}) GROUP BY {id_col}, term
),
bm_df AS (SELECT term, COUNT(*) AS df FROM bm_tf GROUP BY term),
bm_part AS (
  SELECT t.{id_col},
    round(ln(1.0 + (s.n - f.df + 0.5) / (f.df + 0.5))
          * (t.tf * ({k1} + 1))
          / (t.tf + {k1} * (1 - {b} + {b} * d.dl / s.avgdl)),
          9)::DECIMAL(20,9) AS part
  FROM bm_tf t JOIN bm_df f USING (term)
  JOIN bm_dl d USING ({id_col}), bm_stats s
),
bm_scored AS (
  SELECT {id_col}, round(SUM(part)::DOUBLE, 6) AS bm25
  FROM bm_part GROUP BY {id_col}
)
SELECT {id_col}, bm25, rnk FROM (
  SELECT *, row_number() OVER (ORDER BY bm25 DESC, {id_col} ASC) AS rnk
  FROM bm_scored) t WHERE rnk <= {k}
"""


# ---------------------------------------------------------------------------
# Bloom-filter decontamination
# ---------------------------------------------------------------------------

def _gram_hashes(df: DataFrame, id_col: str, text_col: str,
                 n: int) -> DataFrame:
    """(id, g): distinct 60-bit word-n-gram hashes (whole-doc gram for
    short docs — dedup.shingles semantics)."""
    return _spread(df).select(
        F.col(id_col),
        F.explode(F.transform(shingles(F.col(text_col), n), md5_int60))
        .alias("g"))


def bloom_bit_positions(benchmark: DataFrame, text_col: str = "text",
                        n: int = 3, bits: int = 4096,
                        k_hashes: int = 4) -> DataFrame:
    """The Bloom filter as its SET BIT POSITIONS: one row per distinct set
    bit (``pos``), at most ``bits`` rows.  Equivalent to the bit array but
    join-friendly, mergeable by trivial union, and broadcastable.

    Positions: ``mix_i(md5_60(gram)) % bits`` for i in 0..k_hashes-1 — the
    same Mersenne affine mixes as the MinHash family, bit-reproducible in
    the DuckDB oracle."""
    if not 1 <= k_hashes <= len(PERM_CONSTS):
        raise ValueError(f"k_hashes must be in [1, {len(PERM_CONSTS)}]")
    grams = benchmark.select(
        F.explode(F.transform(shingles(F.col(text_col), n),
                              md5_int60)).alias("g")).distinct()
    pos = grams.select(
        F.explode(F.array(*[(_mix(F.col("g"), i) % bits).cast("int")
                            for i in range(k_hashes)])).alias("pos"))
    return pos.distinct()


def bloom_decontaminate(
    corpus: DataFrame, benchmark: DataFrame,
    id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, bits: int = 4096, k_hashes: int = 4,
) -> DataFrame:
    """Per-corpus-document Bloom screen against the benchmark n-gram set:
    (id, n_grams, n_hits, flagged) where a gram "hits" when ALL
    ``k_hashes`` of its bit positions are set in the benchmark filter and
    ``flagged`` = any gram hit.

    No false negatives (every true benchmark gram hits); false positives
    at the classic Bloom rate — callers route flagged docs into the exact
    ``decontaminate`` join, giving the screen-then-verify plan whose first
    pass broadcasts O(bits) instead of O(|benchmark grams|).

    Plan: the k-position explode runs over the DISTINCT gram-hash
    vocabulary (|vocab| rows), not the per-(doc, gram) stream — the
    screening work is corpus-vocabulary-sized instead of corpus-sized
    (a k_hashes× explode of every doc-gram occurrence was the
    second-heaviest gate in the r7 bench).  Surviving "hit grams" then
    semi-join back to the per-doc stream on the fine-grained 60-bit key.

    Sizing: ``bits=4096`` is a TOY default for oracle-checkable tests.  A
    real benchmark with n distinct grams needs ``bits ≈ 10·n`` (k=4 →
    ~1.2% false positives at that load); an undersized filter saturates
    and flags every document, silently degrading the screen to a no-op.
    """
    from ..cache import track
    bloom = bloom_bit_positions(benchmark, text_col, n, bits, k_hashes)
    grams = track(_gram_hashes(corpus, id_col, text_col, n).persist())
    vocab = grams.select("g").distinct()
    vpos = vocab.select(
        F.col("g"),
        F.explode(F.array(*[(_mix(F.col("g"), i) % bits).cast("int")
                            for i in range(k_hashes)])).alias("pos"))
    hit_grams = (vpos.join(F.broadcast(bloom), "pos")
                 .groupBy("g")
                 .agg(F.count(F.lit(1)).alias("nset"))
                 .filter(F.col("nset") >= k_hashes)
                 .select("g"))
    hits_per_gram = (grams.join(hit_grams, "g")
                     .groupBy(id_col)
                     .agg(F.count(F.lit(1)).alias("n_hits")))
    n_grams = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    return (corpus.select(F.col(id_col)).distinct()
            .join(n_grams, id_col, "left")
            .join(hits_per_gram, id_col, "left")
            .select(
                F.col(id_col),
                F.coalesce(F.col("n_grams"), F.lit(0)).cast("long")
                .alias("n_grams"),
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("long")
                .alias("n_hits"),
                (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("flagged")))


def sql_bloom_decontaminate(
    corpus_cte: str, benchmark_cte: str,
    id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, bits: int = 4096, k_hashes: int = 4,
) -> str:
    """DuckDB mirror over CTEs named ``corpus_cte``/``benchmark_cte`` with
    (id_col, text_col).  Same md5 + Mersenne mixes, same k-of-k hit rule."""
    hs = SQL.hashed_shingles(text_col, n)
    mixes = ", ".join(f"({SQL.mix('g', i)}) % {bits}"
                      for i in range(k_hashes))
    return f"""
bl_bits AS (
  SELECT DISTINCT unnest([{mixes}]) AS pos FROM (
    SELECT DISTINCT unnest({hs}) AS g FROM {benchmark_cte})
),
bl_grams AS (
  SELECT {id_col}, unnest({hs}) AS g FROM {corpus_cte}
),
bl_vpos AS (
  SELECT g, unnest([{mixes}]) AS pos
  FROM (SELECT DISTINCT g FROM bl_grams)
),
bl_hitg AS (
  SELECT g FROM bl_vpos JOIN bl_bits USING (pos)
  GROUP BY g HAVING COUNT(*) >= {k_hashes}
),
bl_hits AS (
  SELECT {id_col}, COUNT(*) AS n_hits
  FROM bl_grams JOIN bl_hitg USING (g)
  GROUP BY {id_col}
),
bl_ngrams AS (
  SELECT {id_col}, COUNT(*) AS n_grams FROM bl_grams GROUP BY {id_col}
),
bl_out AS (
  SELECT d.{id_col},
    coalesce(ng.n_grams, 0)::BIGINT AS n_grams,
    coalesce(h.n_hits, 0)::BIGINT AS n_hits,
    coalesce(h.n_hits, 0) > 0 AS flagged
  FROM (SELECT DISTINCT {id_col} FROM {corpus_cte}) d
  LEFT JOIN bl_ngrams ng USING ({id_col})
  LEFT JOIN bl_hits h USING ({id_col})
)"""


# ---------------------------------------------------------------------------
# n-gram novelty (cross-document uniqueness)
# ---------------------------------------------------------------------------

def ngram_novelty_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(id, n_grams, shared_grams, novelty): per-document fraction of its
    DISTINCT word n-grams that appear in no other document.

    The cross-document complement of ``curation.repetition_stats`` (which
    is within-document): boilerplate, mirrored pages, and template text
    score low; genuinely novel prose scores near 1.  Curation pipelines
    threshold on it where near-dup removal is too blunt (a doc can be 40%
    boilerplate yet not be anyone's near-duplicate).

    Plan: distinct (doc, gram-hash) explode (persisted — the fan-out point
    both aggregates read) → ``n_grams`` as a PLAIN per-doc groupBy (no join
    needed) → gram document-frequency groupBy (fine-grained 60-bit key,
    map-side partials) → only the ``df_count > 1`` SUBSET joins back to the
    gram stream to count shared grams.  In a real corpus most distinct
    grams are unique, so the join input is a fraction of the stream — vs
    the naive "join the full df table onto every gram" plan this roughly
    halves the shuffled volume (it was the heaviest gate in the r7 bench).
    Same inverted-index shape and shuffle profile as
    ``dedup.ngram_jaccard_pairs`` minus the pair join, so it rides the
    same 100 TB argument.  Exact integer arithmetic until the final 6dp
    division — fully oracle-checkable.
    """
    from ..cache import track
    grams = track(
        _spread(df)
        .select(F.col(id_col),
                F.explode(shingles(F.col(text_col), n)).alias("s"))
        .select(id_col, md5_int60(F.col("s")).alias("h")).persist())
    n_grams = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    shared_h = (grams.groupBy("h").agg(F.count(F.lit(1)).alias("df_count"))
                .filter(F.col("df_count") > 1).select("h"))
    shared = (grams.join(shared_h, "h")
              .groupBy(id_col)
              .agg(F.count(F.lit(1)).alias("shared_grams")))
    return (n_grams.join(shared, id_col, "left")
            .select(
                id_col, "n_grams",
                F.coalesce(F.col("shared_grams"), F.lit(0)).cast("long")
                .alias("shared_grams"),
                F.round(1.0 - F.coalesce(F.col("shared_grams"), F.lit(0))
                        / F.col("n_grams"), 6).alias("novelty")))


def sql_ngram_novelty_score(table: str, id_col: str = "doc_id",
                            text_col: str = "text", n: int = 3) -> str:
    hs = SQL.hashed_shingles(text_col, n)
    return f"""
WITH nv_grams AS (
  SELECT {id_col}, unnest({hs}) AS h FROM {table}
),
nv_n AS (SELECT {id_col}, COUNT(*) AS n_grams FROM nv_grams
         GROUP BY {id_col}),
nv_sharedh AS (SELECT h FROM nv_grams GROUP BY h HAVING COUNT(*) > 1),
nv_shared AS (
  SELECT {id_col}, COUNT(*) AS shared_grams
  FROM nv_grams JOIN nv_sharedh USING (h) GROUP BY {id_col}
)
SELECT n.{id_col}, n.n_grams,
  coalesce(s.shared_grams, 0)::BIGINT AS shared_grams,
  round(1.0 - coalesce(s.shared_grams, 0) / n.n_grams, 6) AS novelty
FROM nv_n n LEFT JOIN nv_shared s USING ({id_col})
"""


# ---------------------------------------------------------------------------
# Interpolated LM perplexity + CCNet-style quality buckets
# ---------------------------------------------------------------------------

def interpolated_logprob_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    alpha: float = 0.5, lam: float = 0.7,
) -> DataFrame:
    """(id, n_grams, mean_neg_logprob): Jelinek-Mercer interpolated LM fit
    on the corpus itself — per position,

        p(w_i | w_{i-1}) = lam * p_bigram + (1 - lam) * p_unigram

    with both components add-alpha smoothed (the same estimators as
    ``bigram_logprob_score`` / ``unigram_logprob_score``).  Interpolation
    is what real perplexity filters (CCNet's KenLM) do: an unseen bigram
    backs off to the unigram instead of flooring at the smoothing
    constant, separating rare-but-plausible text from genuine word salad.
    Documents with < 2 tokens score 0 over 0 grams.

    Determinism: per-position -ln p rounds to 9dp and sums as an exact
    decimal (order-independent, hash-oracle safe; repo convention).

    Plan: the bigram stream builds map-side (zip_with of the token array
    with its own tail — no positional self-join); bigram counts, prefix
    counts, and unigram counts are three fine-grained aggregations whose
    keys are vocab-sized, never corpus-sized; totals are a 1-row
    broadcast; the per-bigram logprob table joins back to the stream on
    the bigram key (one corpus-sized shuffle) and sums per doc.  Nothing
    here is quadratic and no key exceeds vocabulary cardinality."""
    toks = tokens(F.col(text_col))
    bigram_arr = F.when(
        F.size(toks) < 2, F.array().cast("array<string>")
    ).otherwise(F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.concat_ws(" ", a, b)))
    bg = _spread(df).select(F.col(id_col), F.explode(bigram_arr).alias("bg"))

    # VOCAB-sized model-count table persisted (FOUR consumers:
    # prefix/uni/totals/logp); the scoring join runs over the
    # per-position stream — r16 reverted the per-(doc, bigram)
    # cached-count shape after measuring the position-scale cache
    # costing more than the tokenize pass it saves at sf0.1 / 10x / 30x
    # (bench_runs/lm_sweep_r16.json; see unigram_logprob_score).
    from ..cache import track
    counts = track(
        bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c")).persist())
    prefix = (counts.select(
        F.element_at(F.split(F.col("bg"), " "), 1).alias("w1"), "c")
        .groupBy("w1").agg(F.sum("c").alias("cp")))
    # unigram counts of the SECOND word of each position = counts over the
    # bigram table weighted by c (vocab-sized, never rescans the corpus)
    uni = (counts.select(
        F.element_at(F.split(F.col("bg"), " "), 2).alias("w2"), "c")
        .groupBy("w2").agg(F.sum("c").alias("cu")))
    totals = counts.agg(
        F.count(F.lit(1)).cast("double").alias("_vocab_bi"),
        F.sum("c").cast("double").alias("_n_pos"))
    vocab_uni = uni.agg(F.count(F.lit(1)).cast("double").alias("_vocab_uni"))

    logp = (counts
            .withColumn("w1", F.element_at(F.split(F.col("bg"), " "), 1))
            .withColumn("w2", F.element_at(F.split(F.col("bg"), " "), 2))
            .join(prefix, "w1").join(uni, "w2")
            .crossJoin(F.broadcast(totals))
            .crossJoin(F.broadcast(vocab_uni))
            .select("bg", F.round(-F.log(
                F.lit(lam) * ((F.col("c") + F.lit(alpha))
                              / (F.col("cp")
                                 + F.lit(alpha) * F.col("_vocab_bi")))
                + F.lit(1.0 - lam) * ((F.col("cu") + F.lit(alpha))
                                      / (F.col("_n_pos")
                                         + F.lit(alpha)
                                         * F.col("_vocab_uni")))), 9)
                .cast("decimal(20,9)").alias("nlp")))
    scored = (bg.join(logp, "bg")
              .groupBy(id_col)
              .agg(F.count(F.lit(1)).alias("n_grams"),
                   F.sum("nlp").alias("s")))
    return (df.select(F.col(id_col)).distinct()
            .join(scored, id_col, "left")
            .select(
                F.col(id_col),
                F.coalesce(F.col("n_grams"), F.lit(0)).cast("long")
                .alias("n_grams"),
                F.when(F.col("n_grams").isNull(), F.lit(0.0))
                .otherwise(F.round(F.col("s").cast("double")
                                   / F.col("n_grams"), 6))
                .alias("mean_neg_logprob")))


def perplexity_buckets(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n_buckets: int = 3, alpha: float = 0.5, lam: float = 0.7,
    mode: str = "ntile",
) -> DataFrame:
    """(id, n_grams, mean_neg_logprob, bucket): CCNet-style quality
    bucketing — score every document with the interpolated-LM perplexity
    proxy above, then cut the corpus into ``n_buckets`` equal-count
    buckets (bucket 1 = lowest perplexity = 'head', the CCNet keep set).

    Two cut strategies:

    - ``mode='ntile'`` (default): exact equal-count buckets via one
      ``ntile`` window over (score, id) — a TOTAL order, so ties break
      deterministically and the DuckDB oracle matches hash-exactly.  The
      window's global sort is the scale cost; fine to a few hundred
      million score rows (they're 2 columns), and the semantics the
      hash gate needs.
    - ``mode='cuts'``: the 100 TB path — bucket boundaries come from one
      ``approx_percentile`` aggregate (a 1-row broadcast), then every doc
      buckets map-side by comparing its score to the cuts.  No global
      sort, no single-partition window; boundary docs may land one bucket
      off versus exact ntile (the approx trade), which is irrelevant to a
      keep/drop quality filter.
    """
    scored = interpolated_logprob_score(df, id_col, text_col, alpha, lam)
    if mode == "cuts":
        qs = [i / n_buckets for i in range(1, n_buckets)]
        cuts = scored.agg(F.approx_percentile(
            "mean_neg_logprob", qs, 10_000).alias("cuts"))
        bucket = F.lit(1)
        for i in range(n_buckets - 1):
            bucket = bucket + F.when(
                F.col("mean_neg_logprob") > F.element_at("cuts", i + 1),
                1).otherwise(0)
        return (scored.crossJoin(F.broadcast(cuts))
                .select(id_col, "n_grams", "mean_neg_logprob",
                        bucket.alias("bucket")))
    if mode != "ntile":
        raise ValueError(f"unknown mode {mode!r} (ntile|cuts)")
    from pyspark.sql import Window

    win = Window.orderBy(F.col("mean_neg_logprob").asc(),
                         F.col(id_col).asc())
    return scored.select(id_col, "n_grams", "mean_neg_logprob",
                         F.ntile(n_buckets).over(win).alias("bucket"))


def sql_interpolated_logprob_score(table: str, id_col: str = "doc_id",
                                   text_col: str = "text",
                                   alpha: float = 0.5,
                                   lam: float = 0.7) -> str:
    """DuckDB CTE chain mirroring ``interpolated_logprob_score``; exposes
    ``il_scored_out`` with (id, n_grams, mean_neg_logprob)."""
    toks = sql_tokens(text_col)
    one_minus_lam = repr(1.0 - lam)
    return f"""
il_tok AS (
  SELECT {id_col}, {toks} AS t FROM {table}
),
il_stream AS (
  SELECT {id_col},
    unnest(list_transform(generate_series(1, len(t) - 1),
                          i -> t[i] || ' ' || t[i + 1])) AS bg
  FROM il_tok WHERE len(t) >= 2
),
il_counts AS MATERIALIZED (
  SELECT bg, COUNT(*) AS c FROM il_stream GROUP BY bg
),
il_prefix AS (
  SELECT list_extract(string_split(bg, ' '), 1) AS w1, SUM(c) AS cp
  FROM il_counts GROUP BY 1
),
il_uni AS MATERIALIZED (
  SELECT list_extract(string_split(bg, ' '), 2) AS w2, SUM(c) AS cu
  FROM il_counts GROUP BY 1
),
il_tot AS (
  SELECT COUNT(*)::DOUBLE AS vocab_bi, SUM(c)::DOUBLE AS n_pos
  FROM il_counts
),
il_vu AS (SELECT COUNT(*)::DOUBLE AS vocab_uni FROM il_uni),
il_logp AS (
  SELECT bg,
    round(-ln({lam} * ((c + {alpha}) / (p.cp + {alpha} * t.vocab_bi))
              + {one_minus_lam} * ((u.cu + {alpha})
                                   / (t.n_pos + {alpha} * v.vocab_uni))),
          9)::DECIMAL(20,9) AS nlp
  FROM il_counts
  JOIN il_prefix p ON list_extract(string_split(bg, ' '), 1) = p.w1
  JOIN il_uni u ON list_extract(string_split(bg, ' '), 2) = u.w2,
  il_tot t, il_vu v
),
il_agg AS (
  SELECT {id_col}, COUNT(*) AS n_grams, SUM(nlp) AS s
  FROM il_stream JOIN il_logp USING (bg) GROUP BY {id_col}
),
il_scored_out AS (
  SELECT d.{id_col},
    coalesce(a.n_grams, 0)::BIGINT AS n_grams,
    CASE WHEN a.n_grams IS NULL THEN 0.0
         ELSE round(a.s::DOUBLE / a.n_grams, 6) END AS mean_neg_logprob
  FROM (SELECT DISTINCT {id_col} FROM {table}) d
  LEFT JOIN il_agg a USING ({id_col})
)"""


def sql_perplexity_buckets(table: str, id_col: str = "doc_id",
                           text_col: str = "text", n_buckets: int = 3,
                           alpha: float = 0.5, lam: float = 0.7) -> str:
    """Full DuckDB mirror of ``perplexity_buckets(mode='ntile')``."""
    body = sql_interpolated_logprob_score(table, id_col, text_col,
                                          alpha, lam)
    return f"""
WITH {body.lstrip()}
SELECT {id_col}, n_grams, mean_neg_logprob,
  ntile({n_buckets}) OVER (ORDER BY mean_neg_logprob ASC, {id_col} ASC)
    AS bucket
FROM il_scored_out
"""
