"""DSIR-style data selection: hashed n-gram importance resampling.

Beyond-reference surface for the LLM-training-data north star (the
reference engine, mattwparas/steel-datafusion src/main.rs, stops at the
relational operators — corpus *selection* is part of what this repo adds
on top, like dedup.py and scoring.py).

Method (public: Xie et al., "Data Selection for Language Models via
Importance Resampling", arXiv:2302.03169): pick documents from a large raw
pool whose FEATURE distribution looks like a small target corpus.

1. Features: unigrams + bigrams of the normalized token stream, hashed
   into ``n_buckets`` buckets (the paper's "hashed n-gram" feature space —
   collisions are part of the estimator, not an error).
2. Fit two add-alpha bag-of-buckets models: p (target corpus) and q (raw
   pool).  Both are ``n_buckets``-bounded count tables — NOT vocabularies —
   so model size is a constant independent of corpus size.
3. Per pool document, the importance log-weight is
   sum over feature occurrences of  ln p(b) - ln q(b).
4. Select top-k either greedily (deterministic by weight) or by Gumbel
   resampling (the paper's sampling-without-replacement trick:
   argtop-k(logweight + Gumbel noise) IS a weighted sample) — the noise
   here derives from an affine mix of the doc-id hash, so the "random"
   draw is reproducible row-for-row in the DuckDB oracle.

Scale design (100 TB):
- The feature stream explodes ~2 tokens-worth of features per token; it
  shuffles once per model fit on the BUCKET key (fine-grained, bounded
  domain) and once for per-doc scoring on the doc id.  No joins between
  documents, no pair blow-up anywhere.
- Both models aggregate map-side into at most ``n_buckets`` partial rows
  per partition; the log-likelihood-ratio table is at most ``n_buckets``
  rows and BROADCASTS to the scoring join — the pool never reshuffles on
  the feature key for scoring.
- Top-k select is sort+limit = TakeOrderedAndProject (no global sort).

Determinism / oracle parity (repo convention): per-bucket LLR is rounded
to 9 dp and cast to decimal(20,9) BEFORE the per-doc sum, so document
scores are order-independent at any partition count; ln() on identical
double inputs agrees across engines bit-for-bit in practice; the Gumbel
draw is a pure function of (doc id, seed) via the shared PERM_CONSTS
affine mixes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..cache import track
from .dedup import MERSENNE61, PERM_CONSTS, _LO_MASK, _mix, md5_int60
from .text import sql_tokens, tokens

__all__ = [
    "dsir_logweights", "dsir_select",
    "sql_dsir_logweights", "sql_dsir_select",
]

_GUMBEL_M = 1 << 20  # uniform-grid resolution for the hashed Gumbel draw


def _features(text: Column) -> Column:
    """Unigram + bigram feature array of the normalized token stream."""
    toks = tokens(text)
    bigrams = F.when(F.size(toks) < 2, F.array().cast("array<string>")) \
        .otherwise(F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.concat(a, F.lit(" "), b)))
    return F.concat(toks, bigrams)


def _sql_features(text_col: str) -> str:
    toks = sql_tokens(text_col)
    return (f"list_concat({toks}, "
            f"list_transform(range(1, len({toks})), "
            f"i -> list_extract({toks}, i) || ' ' "
            f"|| list_extract({toks}, i + 1)))")


def dsir_logweights(
    df: DataFrame, target: Column, id_col: str = "doc_id",
    text_col: str = "text", n_buckets: int = 4096, alpha: float = 0.5,
) -> DataFrame:
    """(id, n_feats, logweight) for every POOL document (rows where
    ``target`` is false): the DSIR importance log-weight
    sum_b c_b · (ln p_target(b) − ln q_pool(b)) over hashed n-gram buckets.

    Higher = more target-like.  Pool documents with zero features weigh
    0.0 over 0 features (no evidence).  Buckets never seen in the pool
    cannot appear in a pool document, so the LLR table only materializes
    pool-occupied buckets (≤ n_buckets rows, broadcast)."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    parts = df.sparkSession.sparkContext.defaultParallelism * 2
    # explode_outer + ONE persisted feature stream (r15): the plain-explode
    # form re-ran the CPU-heavy tokenize+hash explode once per consumer
    # (pool persist, target counts) and needed a separate pool-id scan +
    # doc-key join to restore zero-feature pool docs; the outer explode
    # keeps every document present (null bucket = no features), so both
    # count tables AND the per-doc scoring read the same cache and the
    # zero-feature rows fall out of the same groupBy.
    base = df.repartition(parts).select(
        F.col(id_col), target.alias("_tgt"),
        F.explode_outer(_features(F.col(text_col))).alias("feat"))
    feats = track(base.select(
        id_col, "_tgt",
        F.pmod(md5_int60(F.col("feat")), F.lit(n_buckets)).alias("b"))
        .persist())
    pool_feats = feats.filter(~F.col("_tgt"))
    real = F.col("b").isNotNull()
    tgt_counts = track(feats.filter(F.col("_tgt") & real).groupBy("b")
                       .agg(F.count(F.lit(1)).alias("ct")).persist())
    pool_counts = track(pool_feats.filter(real).groupBy("b")
                        .agg(F.count(F.lit(1)).alias("cq")).persist())
    tgt_total = tgt_counts.agg(
        F.coalesce(F.sum("ct"), F.lit(0)).cast("double").alias("_tt"))
    pool_total = pool_counts.agg(
        F.coalesce(F.sum("cq"), F.lit(0)).cast("double").alias("_tq"))
    ab = float(alpha) * n_buckets
    llr = (pool_counts.join(tgt_counts, "b", "left")
           .crossJoin(F.broadcast(tgt_total))
           .crossJoin(F.broadcast(pool_total))
           .select(
               "b",
               F.round(
                   F.log((F.coalesce(F.col("ct"), F.lit(0)) + F.lit(alpha))
                         / (F.col("_tt") + F.lit(ab)))
                   - F.log((F.col("cq") + F.lit(alpha))
                           / (F.col("_tq") + F.lit(ab))), 9)
               .cast("decimal(20,9)").alias("llr")))
    # left join: every NON-NULL pool bucket is in llr by construction (llr
    # is built FROM pool_counts), so "left" only admits the null-bucket
    # (zero-feature) rows — count("b") skips them and sum(llr) nulls out,
    # giving the same (0, 0.0) rows the old pool-id left join restored
    # with one fewer corpus scan and two fewer doc-key exchanges.
    scored = (pool_feats.join(F.broadcast(llr), "b", "left")
              .groupBy(id_col)
              .agg(F.count(F.col("b")).alias("n_feats"),
                   F.sum("llr").alias("_s")))
    return scored.select(
        F.col(id_col),
        F.col("n_feats").cast("long").alias("n_feats"),
        F.coalesce(F.round(F.col("_s").cast("double"), 6),
                   F.lit(0.0)).alias("logweight"))


def sql_dsir_logweights(
    table: str, target_where: str, id_col: str = "doc_id",
    text_col: str = "text", n_buckets: int = 4096, alpha: float = 0.5,
) -> str:
    """DuckDB mirror of :func:`dsir_logweights` (same literals, same
    rounding discipline — hash-oracle exact)."""
    feats = _sql_features(text_col)
    ab = float(alpha) * n_buckets
    return f"""
WITH dsir_feat AS (
  SELECT {id_col}, _tgt,
         ('0x' || substr(md5(f), 1, 15))::BIGINT % {n_buckets} AS b
  FROM (SELECT {id_col}, ({target_where}) AS _tgt, unnest({feats}) AS f
        FROM {table}) u
),
dsir_tgt AS (SELECT b, COUNT(*) AS ct FROM dsir_feat WHERE _tgt GROUP BY b),
dsir_pool AS (SELECT b, COUNT(*) AS cq FROM dsir_feat WHERE NOT _tgt
              GROUP BY b),
dsir_tt AS (SELECT coalesce(SUM(ct), 0)::DOUBLE AS tt FROM dsir_tgt),
dsir_tq AS (SELECT coalesce(SUM(cq), 0)::DOUBLE AS tq FROM dsir_pool),
dsir_llr AS (
  SELECT p.b,
    round(ln((coalesce(t.ct, 0) + {alpha}) / (tt + {ab}))
          - ln((p.cq + {alpha}) / (tq + {ab})), 9)::DECIMAL(20,9) AS llr
  FROM dsir_pool p LEFT JOIN dsir_tgt t USING (b), dsir_tt, dsir_tq
),
dsir_scored AS (
  SELECT {id_col}, COUNT(*) AS n_feats, SUM(llr) AS s
  FROM dsir_feat JOIN dsir_llr USING (b)
  WHERE NOT _tgt GROUP BY {id_col}
)
SELECT d.{id_col},
  coalesce(s.n_feats, 0)::BIGINT AS n_feats,
  coalesce(round(s.s::DOUBLE, 6), 0.0) AS logweight
FROM (SELECT DISTINCT {id_col} FROM {table} WHERE NOT ({target_where})) d
LEFT JOIN dsir_scored s USING ({id_col})
"""


def _gumbel_key(id_hash: Column, seed: int) -> Column:
    """Deterministic Gumbel(0,1) draw from an affine mix of the id hash:
    u = (mix(h) mod M + 0.5) / M strictly inside (0,1), g = -ln(-ln u).
    A pure function of (id, seed) — reproducible in the oracle."""
    u = ((_mix(id_hash, seed % 64) % F.lit(_GUMBEL_M) + F.lit(0.5))
         / F.lit(float(_GUMBEL_M)))
    return -F.log(-F.log(u))


def _sql_gumbel_key(h: str, seed: int) -> str:
    A, B, C = PERM_CONSTS[seed % 64]
    mix = (f"(((({h}) & {_LO_MASK}) * {A} + (({h}) >> 30) * {B} + {C}) "
           f"% {MERSENNE61})")
    return (f"-ln(-ln(({mix} % {_GUMBEL_M} + 0.5) / {float(_GUMBEL_M)}))")


def dsir_select(
    df: DataFrame, target: Column, k: int, id_col: str = "doc_id",
    text_col: str = "text", n_buckets: int = 4096, alpha: float = 0.5,
    seed: int | None = 0,
) -> DataFrame:
    """Top-k pool documents by DSIR importance weight.

    ``seed=None`` selects greedily (pure argmax of logweight — the
    deterministic variant); an integer seed draws the paper's Gumbel
    top-k weighted sample without replacement, with the noise a hashed
    function of the doc id so the sample is reproducible.

    Returns (id, n_feats, logweight, sel_key) ordered sel_key desc with
    the id as tie-break; the sort+limit compiles to
    TakeOrderedAndProject — no global sort materializes."""
    lw = dsir_logweights(df, target, id_col, text_col, n_buckets, alpha)
    if seed is None:
        key = F.col("logweight")
    else:
        key = F.col("logweight") + _gumbel_key(
            md5_int60(F.col(id_col).cast("string")), seed)
    out = lw.select("*", F.round(key, 6).alias("sel_key"))
    return (out.orderBy(F.col("sel_key").desc(), F.col(id_col).asc())
            .limit(k))


def sql_dsir_select(
    table: str, target_where: str, k: int, id_col: str = "doc_id",
    text_col: str = "text", n_buckets: int = 4096, alpha: float = 0.5,
    seed: int | None = 0,
) -> str:
    base = sql_dsir_logweights(
        table, target_where, id_col, text_col, n_buckets, alpha)
    if seed is None:
        key = "logweight"
    else:
        h = f"('0x' || substr(md5({id_col}::VARCHAR), 1, 15))::BIGINT"
        key = f"logweight + {_sql_gumbel_key(h, seed)}"
    return f"""
SELECT {id_col}, n_feats, logweight, round({key}, 6) AS sel_key
FROM ({base}) lw
ORDER BY sel_key DESC, {id_col} ASC
LIMIT {k}
"""
