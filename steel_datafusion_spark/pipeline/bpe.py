"""Distributed BPE vocabulary learning (Sennrich et al. 2016, public).

Beyond-reference surface for the LLM-training-data north star: the byte-pair
tokenizer every pipeline trains before token counting / packing.  The key
scalability property of the published algorithm is that merges are learned
over the WORD-FREQUENCY TABLE, not the raw corpus — one corpus-sized shuffle
builds (word, freq), and every merge iteration after that touches only the
vocabulary relation (millions of rows at web scale, independent of corpus
token count).  At 100 TB: corpus pass is map + one groupBy-word shuffle with
map-side combine; each of the n_merges iterations is a pair-explode +
pair-key shuffle over the vocab table plus a map-only merge application —
all bounded by |vocab|, never by |corpus|.

Representation: a word's symbol sequence is a single STRING with a sentinel
separator (U+241F) between symbols and an explicit ``</w>`` end-of-word
symbol — so applying a merge is one literal ``replace`` (left-to-right,
non-overlapping — exactly the greedy BPE application order) instead of an
array fold, and the DuckDB oracle mirrors it with the identical ``replace``.

Determinism: pair counts are exact integer sums of word frequencies; the
winning pair breaks ties by (count desc, left asc, right asc); each
iteration's winner is materialized (1-row collect — the same driver-holds-
k-scalars envelope as k-means centroids) so the learned merge table is
bit-identical across engines and partition counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cache import iteration_barrier
from .text import tokens

__all__ = ["bpe_learn", "bpe_segment", "bpe_token_counts", "sql_bpe_learn",
           "sql_bpe_segment_tokens", "SEP", "EOW"]

SEP = "␟"   # symbol separator inside a word's symbol string
EOW = "</w>"     # end-of-word symbol (distinguishes "st</w>" from "st")
# Caveat: a corpus word containing the sentinel characters themselves
# (U+241F, or a literal "</w>") would fold into adjacent symbols; real
# tokenizers byte-escape first.  Both engines apply the identical string
# transforms, so even then Spark and the oracle stay in lockstep.


def _word_freq(df: DataFrame, text_col: str) -> DataFrame:
    from .scoring import _spread

    # _spread: a small parquet corpus arrives as ONE split; without it the
    # tokenize+explode pass — the only corpus-sized work in BPE learning —
    # runs on a single core (r15: 4.5 s of the gate's 6 s).  No-op when
    # the scan already has enough splits (cluster scale).
    return (_spread(df).select(F.explode(tokens(F.col(text_col))).alias("w"))
            .filter(F.length("w") > 0)
            .groupBy("w").agg(F.count(F.lit(1)).alias("freq")))


def _init_symbols(vocab: DataFrame) -> DataFrame:
    # "abc" -> "a␟b␟c␟</w>"
    return vocab.withColumn(
        "s", F.concat(F.regexp_replace(F.col("w"), "(.)", "$1" + SEP),
                      F.lit(EOW)))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    syms = F.split(F.col("s"), SEP)
    n = F.size(syms)
    pairs = F.arrays_zip(F.slice(syms, 1, n - 1).alias("l"),
                         F.slice(syms, 2, n - 1).alias("r"))
    return (vocab.select("freq", F.explode(pairs).alias("p"))
            .select("freq", F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .groupBy("l", "r").agg(F.sum("freq").alias("pair_freq")))


def bpe_learn(
    df: DataFrame, text_col: str = "text", n_merges: int = 12,
    reliable: bool = False, vocab_partitions: int | None = None,
    barrier_every: int = 64,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the merge table
    (rank, left, right, merged, pair_freq) in learned order.

    Stops early if no pair remains (every word fully merged).  The corpus
    is touched exactly once (word-frequency build), then the vocab
    relation is materialized behind ONE ``iteration_barrier``.  Unlike the
    k-means/CC loops (whose per-round lineage includes joins and
    shuffles), a BPE round only APPENDS one string ``replace`` to the
    symbol column, so between barriers lineage is a linear map-only
    expression chain over the checkpointed vocab — cheap to re-evaluate,
    with no I/O.  But the chain cannot grow unboundedly: a realistic
    vocabulary run (3x10^4 merges) would stack 30k nested ``replace``
    calls, and Catalyst analysis/codegen cost per round grows with the
    chain, blowing up long before the O(n_merges^2 * |vocab|) string cost
    matters.  ``barrier_every`` re-materializes the vocab every K merges
    (default 64): plan depth stays <= K replaces while a demo-scale learn
    (n_merges <= K) still pays exactly ONE barrier — the r15 halved job
    count is preserved locally and the plan is bounded at scale.

    ``vocab_partitions`` sizes the loop relation: a web-scale vocabulary
    (~10⁷ words) wants a handful of partitions; a demo-scale vocab wants
    exactly 1 so each of the n_merges rounds doesn't pay a
    default-parallelism shuffle+barrier for a kilobyte of state."""
    spark = df.sparkSession
    barrier_every = max(1, int(barrier_every))
    vocab = _init_symbols(_word_freq(df, text_col)).select("w", "freq", "s")
    if vocab_partitions:
        vocab = vocab.repartition(vocab_partitions)
    vocab = iteration_barrier(vocab, reliable=reliable)
    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        top = (_pair_counts(vocab)
               .orderBy(F.col("pair_freq").desc(), F.col("l").asc(),
                        F.col("r").asc())
               .limit(1).collect())
        if not top:
            break
        l, r, freq = top[0]["l"], top[0]["r"], top[0]["pair_freq"]
        merges.append((rank, l, r, l + r, freq))
        vocab = vocab.withColumn(
            "s", F.replace(F.col("s"), F.lit(l + SEP + r), F.lit(l + r)))
        if rank % barrier_every == 0 and rank < n_merges:
            vocab = iteration_barrier(vocab, reliable=reliable)
    schema = ("rank int, left string, right string, merged string, "
              "pair_freq bigint")
    return spark.createDataFrame(merges, schema)


def _apply_merges(word, merges: list[tuple[str, str]]):
    """Symbol string for one word after every merge in rank order:
    characters + ``</w>``, then one literal replace per merge (the
    standard greedy left-to-right application).  ``word`` may be a
    Column or an HOF lambda variable."""
    s = F.concat(F.regexp_replace(word, "(.)", "$1" + SEP), F.lit(EOW))
    for l, r in merges:
        s = F.replace(s, F.lit(l + SEP + r), F.lit(l + r))
    return s


def bpe_segment(df: DataFrame, merges: list[tuple[str, str]],
                text_col: str = "text") -> DataFrame:
    """Apply a learned merge list to tokenize: per word, start from
    characters + ``</w>`` and apply every merge in rank order (the
    standard greedy application).  Adds ``bpe_tokens`` (array of symbol
    strings) and ``n_bpe_tokens``.  Map-only — merges are literals baked
    into the plan (broadcast-by-construction), no shuffle at any scale."""
    words = F.explode(tokens(F.col(text_col))).alias("w")
    out = df.select("*", words).filter(F.length("w") > 0)
    s = _apply_merges(F.col("w"), merges)
    return (out.withColumn("bpe_tokens", F.split(s, SEP))
            .withColumn("n_bpe_tokens", F.size("bpe_tokens")))


def bpe_token_counts(df: DataFrame, merges: list[tuple[str, str]],
                     text_col: str = "text") -> DataFrame:
    """Per-ROW token budget under a learned vocabulary: appends
    ``n_words`` (non-empty words) and ``n_bpe_tokens`` (total BPE symbols
    across those words), both long, computed ENTIRELY MAP-SIDE with
    array higher-order functions — no per-word explode, no groupBy
    shuffle, and no re-join to recover zero-word rows (they never leave
    the frame; both counts coalesce to 0 on null/empty text).  Same
    numbers as exploding :func:`bpe_segment` output and re-aggregating
    per row — the r15 rewrite of the bpe_segment_tokens gate's count
    path (explode + groupBy + distinct + left join → one projection)."""
    words = F.filter(tokens(F.col(text_col)), lambda w: F.length(w) > 0)
    n_bpe = F.aggregate(
        F.transform(words,
                    lambda w: F.size(F.split(_apply_merges(w, merges),
                                             SEP)).cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    return df.select(
        "*",
        F.coalesce(F.size(words), F.lit(0)).cast("long").alias("n_words"),
        F.coalesce(n_bpe, F.lit(0)).cast("long").alias("n_bpe_tokens"))


def _sql_learn_ctes(n_merges: int, corpus_rel: str, text_col: str,
                    prefix: str) -> list[str]:
    """The shared CTE chain of the learning unroll: word frequencies,
    initial symbol strings, then per-round (pairs → top-1 → replace)
    MATERIALIZED CTEs.  ``{prefix}_v{i}_t`` holds round i's merge row."""
    from .text import sql_tokens

    toks = sql_tokens(text_col)
    ctes = [f"""{prefix}_wf AS MATERIALIZED (
  SELECT w, COUNT(*) AS freq
  FROM (SELECT unnest({toks}) AS w FROM {corpus_rel}) t
  WHERE length(w) > 0 GROUP BY w
),
{prefix}_v0 AS MATERIALIZED (
  SELECT w, freq,
         regexp_replace(w, '(.)', '\\1{SEP}', 'g') || '{EOW}' AS s
  FROM {prefix}_wf
)"""]
    for i in range(1, n_merges + 1):
        prev, cur = f"{prefix}_v{i - 1}", f"{prefix}_v{i}"
        ctes.append(f"""{cur}_p AS MATERIALIZED (
  SELECT p['a'] AS l, p['b'] AS r, SUM(freq)::BIGINT AS pair_freq FROM (
    SELECT freq, unnest(list_transform(
      list_zip(list_slice(sy, 1, len(sy) - 1), list_slice(sy, 2, len(sy))),
      z -> {{'a': z[1], 'b': z[2]}})) AS p
    FROM (SELECT freq, string_split(s, '{SEP}') AS sy FROM {prev}) t
  ) q GROUP BY 1, 2
),
{cur}_t AS MATERIALIZED (
  SELECT {i} AS rank, l, r, l || r AS merged, pair_freq
  FROM {cur}_p ORDER BY pair_freq DESC, l ASC, r ASC LIMIT 1
),
{cur} AS MATERIALIZED (
  SELECT w, freq, replace(s, t.l || '{SEP}' || t.r, t.l || t.r) AS s
  FROM {prev}, {cur}_t t
)""")
    return ctes


def sql_bpe_learn(n_merges: int = 12, corpus_rel: str = "documents",
                  text_col: str = "text", prefix: str = "bpe") -> str:
    """DuckDB mirror of :func:`bpe_learn`: the word-frequency build, then
    ``n_merges`` unrolled (pairs → top-1 → replace) rounds as MATERIALIZED
    CTEs.  Uses the identical separator/EOW representation and the
    identical left-to-right ``replace`` application."""
    ctes = _sql_learn_ctes(n_merges, corpus_rel, text_col, prefix)
    tops = "\nUNION ALL\n".join(
        f"SELECT rank, l AS left, r AS right, merged, pair_freq "
        f"FROM {prefix}_v{i}_t" for i in range(1, n_merges + 1))
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT * FROM ({tops}) u ORDER BY rank")


def sql_bpe_segment_tokens(
    n_merges: int = 12, corpus_rel: str = "documents",
    text_col: str = "text", id_col: str = "doc_id",
    prefix: str = "bpe",
) -> str:
    """DuckDB mirror of learn-then-:func:`bpe_segment`: re-learns the
    merge list with the shared CTE chain, then applies every merge in
    rank order to each word occurrence as nested ``replace`` calls whose
    search/replacement strings come from scalar subqueries over the
    per-round merge CTEs — the exact greedy application
    :func:`bpe_segment` bakes in as literals.  Early-stopped rounds
    (empty merge CTE) substitute an impossible search string
    ('{SEP}{SEP}' can never occur: symbols are non-empty), making the
    extra replaces no-ops instead of NULL-poisoning the string.

    Returns (id, n_words, n_bpe_tokens) per document; documents with no
    words report 0/0."""
    ctes = _sql_learn_ctes(n_merges, corpus_rel, text_col, prefix)
    from .text import sql_tokens

    toks = sql_tokens(text_col)
    s = f"regexp_replace(w, '(.)', '\\1{SEP}', 'g') || '{EOW}'"
    for i in range(1, n_merges + 1):
        t = f"{prefix}_v{i}_t"
        s = (f"replace({s}, "
             f"coalesce((SELECT l || '{SEP}' || r FROM {t}), "
             f"'{SEP}{SEP}'), "
             f"coalesce((SELECT merged FROM {t}), ''))")
    return ("WITH " + ",\n".join(ctes) + f""",
{prefix}_words AS (
  SELECT {id_col}, unnest({toks}) AS w FROM {corpus_rel}
),
{prefix}_seg AS (
  SELECT {id_col},
         len(string_split({s}, '{SEP}')) AS n_sym
  FROM {prefix}_words WHERE length(w) > 0
),
{prefix}_per_doc AS (
  SELECT {id_col}, COUNT(*) AS n_words, SUM(n_sym) AS n_bpe_tokens
  FROM {prefix}_seg GROUP BY {id_col}
)
SELECT d.{id_col},
  coalesce(p.n_words, 0)::BIGINT AS n_words,
  coalesce(p.n_bpe_tokens, 0)::BIGINT AS n_bpe_tokens
FROM (SELECT DISTINCT {id_col} FROM {corpus_rel}) d
LEFT JOIN {prefix}_per_doc p USING ({id_col})
""")
