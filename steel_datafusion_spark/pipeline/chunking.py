"""Document chunking and duplicated-span detection.

Training pipelines cut documents into token-bounded windows (context-length
packing inputs, embedding inputs) and excise byte/token spans that repeat
across the corpus (exact-substring dedup a la "Deduplicating Training Data
Makes Language Models Better", Lee et al. 2022).  Both are pure
expression/shuffle plans here:

- **Chunking** is an ``explode(sequence(...))`` over integer window starts
  plus ``slice``: one codegen'd projection, no shuffle, output rows ~
  ``total_tokens / stride`` regardless of document skew (a 1 GB document
  becomes many rows, not one straggler task).
- **Duplicated spans** build an inverted index of word-n-gram hashes
  (fine-grained shuffle key = the 60-bit gram hash), keep grams whose
  document frequency is >= min_df, then merge hit positions per document
  into maximal ``[start, end]`` runs with a gaps-and-islands window — the
  spans a cleaner would cut.  No all-pairs comparison anywhere; the
  quadratic term is bounded exactly like the shingle-posting join in
  pipeline/dedup.py (hot grams can be capped by ``max_df``).

Determinism / oracle parity: gram hashing reuses md5_int60 (dedup.py) and
whitespace tokenization reuses pipeline/text.py `tokens`, both of which have
exact DuckDB SQL mirrors; window starts and span extents are integer
arithmetic only.

At 100 TB: chunking is map-only (scales with input splits); span detection
is two hash-partitioned shuffles (gram count, position merge) + one window
partitioned by doc_id — the same shape as the n-gram Jaccard join that
measured near-linear in PLANS.md's scale sweep.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import md5_int60
from .text import sql_tokens, tokens

__all__ = [
    "chunk_by_tokens", "duplicated_span_extents", "duplicated_span_stats",
    "sql_chunk_by_tokens", "sql_duplicated_span_extents",
]


def chunk_by_tokens(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    size: int = 64, overlap: int = 16,
) -> DataFrame:
    """Split each document into token windows of ``size`` tokens advancing
    by ``size - overlap`` (so consecutive chunks share ``overlap`` tokens).

    Returns (id, chunk_id, chunk_start [1-based token index],
    n_chunk_tokens, chunk_text).  A document with <= ``size`` tokens yields
    exactly one (possibly short, possibly empty) chunk — every input row
    survives, so downstream joins on id never silently drop documents.

    Map-only: explode + slice, no shuffle; Catalyst keeps it inside one
    WholeStageCodegen span.
    """
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap=} {size=}")
    stride = size - overlap
    # NULL text = empty document (otherwise explode over a NULL sequence
    # silently drops the row, violating the every-row-survives contract)
    tk = tokens(F.coalesce(F.col(text_col), F.lit("")))
    n = F.size(tk)
    # integer ceil((n - size) / stride); sequence(0, -1) would DESCEND in
    # Spark, so the <=size case is pinned to a single chunk explicitly.
    last = F.when(n <= size, F.lit(0)).otherwise(
        F.floor((n - F.lit(size) + F.lit(stride - 1)) / F.lit(stride)).cast("long"))
    start = F.col("ci") * stride + 1
    chunk = F.slice(F.col("tk"), start, size)
    return (
        df.select(F.col(id_col), tk.alias("tk"),
                  F.explode(F.sequence(F.lit(0).cast("long"), last)).alias("ci"))
        .select(
            F.col(id_col),
            F.col("ci").alias("chunk_id"),
            start.cast("long").alias("chunk_start"),
            F.size(chunk).cast("long").alias("n_chunk_tokens"),
            F.concat_ws(" ", chunk).alias("chunk_text"),
        )
    )


def sql_chunk_by_tokens(table: str, id_col: str = "doc_id",
                        text_col: str = "text",
                        size: int = 64, overlap: int = 16) -> str:
    """DuckDB mirror of chunk_by_tokens (list slices are 1-based inclusive,
    so ``tk[s : s+size-1]`` matches Spark's ``slice(tk, s, size)``)."""
    stride = size - overlap
    return f"""
tok_{table} AS (
  SELECT {id_col}, {sql_tokens(text_col)} AS tk FROM {table}
),
chunks_{table} AS (
  SELECT {id_col}, tk,
    unnest(generate_series(0, CASE WHEN len(tk) <= {size} THEN 0
      ELSE (len(tk) - {size} + {stride - 1}) // {stride} END)) AS ci
  FROM tok_{table}
),
chunked_{table} AS (
  SELECT {id_col},
    ci AS chunk_id,
    (ci * {stride} + 1)::BIGINT AS chunk_start,
    len(tk[ci * {stride} + 1 : ci * {stride} + {size}])::BIGINT
      AS n_chunk_tokens,
    coalesce(array_to_string(tk[ci * {stride} + 1 : ci * {stride} + {size}],
                             ' '), '') AS chunk_text
  FROM chunks_{table}
)"""


def _grams(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, pos, g): 60-bit hash of the word n-gram starting at 1-based
    token position pos.  Documents with < n tokens emit no grams.

    The tokenized array is MATERIALIZED (repartition + persist) before the
    position explode: Catalyst otherwise collapses the projection and
    re-inlines the full tokenize expression into the per-position slice —
    O(doc_len²) re-tokenization per document, measured 8× wall-time at
    sf0.1 in the scale sweep (the same projection-collapse trap documented
    at pipeline/dedup.py:_hashed_shingles).  The repartition also spreads
    a few-input-split parquet source across cores before the CPU-heavy
    hash stage."""
    from ..cache import track

    spark = df.sparkSession
    parts = spark.sparkContext.defaultParallelism * 2
    tk = tokens(F.coalesce(F.col(text_col), F.lit("")))
    toks = track(df.repartition(parts, F.col(id_col))
                 .select(F.col(id_col), tk.alias("tk")).persist())
    positions = F.when(
        F.size("tk") >= n, F.sequence(F.lit(1), F.size("tk") - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return (
        toks.select(F.col(id_col), F.col("tk"),
                    F.explode(positions).alias("pos"))
        .select(F.col(id_col), F.col("pos").cast("long").alias("pos"),
                md5_int60(F.concat_ws(" ", F.slice(F.col("tk"), F.col("pos"),
                                                   n))).alias("g"))
    )


def duplicated_span_extents(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 8, min_df: int = 2, max_df: int | None = None,
) -> DataFrame:
    """Maximal duplicated token runs per document.

    A token position is *duplicated* when the word n-gram starting there
    occurs in >= ``min_df`` distinct documents; duplicated positions whose
    n-token extents overlap or touch (gap <= n) merge into one span
    (gaps-and-islands on the lag-gap, not on consecutive positions — two
    hit positions p1 < p2 cover overlapping token ranges whenever
    p2 - p1 < n and contiguous ones when p2 - p1 == n, so only a gap > n
    starts a new maximal run).  Each span's extent covers through the last
    gram's final token.  Returns (id, span_start, span_end, span_tokens) —
    1-based inclusive token indices, exactly the slices an exact-substring
    cleaner would drop.  Spans are DISJOINT and non-adjacent by
    construction, so summing span_tokens per document never exceeds the
    document's token count.

    ``max_df`` (optional) drops grams above a document-frequency cap before
    the position join — the same hot-key bound as ngram_jaccard_pairs: a
    boilerplate gram appearing in every document otherwise fans out to
    |corpus| positions.

    Plan: grams (map-only) -> groupBy(g) doc-frequency (partial-agg'd,
    fine-grained 60-bit key) -> semi-join positions against duplicated
    grams (hash join on g) -> per-doc window merge.  Three shuffles total,
    none keyed coarser than the gram hash.
    """
    from ..cache import track

    # persisted: the gram table feeds BOTH the doc-frequency count and the
    # position join — without the barrier every md5 is computed twice
    grams = track(_grams(df, id_col, text_col, n).persist())
    dup = grams.groupBy("g").agg(
        F.countDistinct(id_col).alias("gram_df"))
    dup = dup.filter(F.col("gram_df") >= min_df)
    if max_df is not None:
        dup = dup.filter(F.col("gram_df") <= max_df)
    hits = grams.join(dup.select("g"), "g").select(id_col, "pos").distinct()
    w = Window.partitionBy(id_col).orderBy("pos")
    # new island only when the gap to the previous hit exceeds n (extents
    # [p1, p1+n-1] and [p2, p2+n-1] overlap/touch iff p2 - p1 <= n); the
    # NULL lag of each partition's first row falls through to the ELSE 1.
    brk = F.when(F.col("pos") - F.lag("pos").over(w) <= n, F.lit(0)) \
        .otherwise(F.lit(1))
    runs = (
        hits.withColumn("brk", brk)
        .withColumn("island", F.sum("brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    )
    return (
        runs.groupBy(id_col, "island")
        .agg(F.min("pos").alias("span_start"),
             (F.max("pos") + (n - 1)).alias("span_end"))
        .select(
            F.col(id_col),
            F.col("span_start"),
            F.col("span_end"),
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
    )


def duplicated_span_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 8, min_df: int = 2,
) -> DataFrame:
    """Per-document rollup of duplicated_span_extents: span count and total
    duplicated tokens, left-joined so clean documents report zeros (the
    fraction a curation filter would threshold on)."""
    spans = duplicated_span_extents(df, id_col, text_col, n=n, min_df=min_df)
    per_doc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_tokens").alias("dup_tokens"))
    base = df.select(
        F.col(id_col),
        F.size(tokens(F.coalesce(F.col(text_col), F.lit("")))).cast("long")
        .alias("n_tokens"))
    return (
        base.join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long").alias("dup_tokens"),
        )
    )


def sql_duplicated_span_extents(corpus_cte: str, id_col: str = "doc_id",
                                text_col: str = "text",
                                n: int = 8, min_df: int = 2) -> str:
    """DuckDB mirror of duplicated_span_extents over a CTE named
    ``corpus_cte`` with (id_col, text_col)."""
    return f"""
sp_tok AS (
  SELECT {id_col}, {sql_tokens(text_col)} AS tk FROM {corpus_cte}
),
sp_grams AS (
  SELECT {id_col}, pos::BIGINT AS pos,
    ('0x' || substr(md5(array_to_string(tk[pos : pos + {n - 1}], ' ')),
                    1, 15))::BIGINT AS g
  FROM (SELECT {id_col}, tk,
          unnest(generate_series(1, len(tk) - {n - 1})) AS pos
        FROM sp_tok WHERE len(tk) >= {n})
),
sp_dup AS (
  SELECT g FROM sp_grams GROUP BY g
  HAVING count(DISTINCT {id_col}) >= {min_df}
),
sp_hits AS (
  SELECT DISTINCT {id_col}, pos FROM sp_grams JOIN sp_dup USING (g)
),
sp_runs AS (
  SELECT {id_col}, pos,
    CASE WHEN pos - lag(pos) OVER (PARTITION BY {id_col} ORDER BY pos)
              <= {n} THEN 0 ELSE 1 END AS brk
  FROM sp_hits
),
sp_islands AS (
  SELECT {id_col}, pos,
    sum(brk) OVER (PARTITION BY {id_col} ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM sp_runs
),
sp_extents AS (
  SELECT {id_col}, min(pos) AS span_start,
    max(pos) + {n - 1} AS span_end,
    max(pos) + {n - 1} - min(pos) + 1 AS span_tokens
  FROM sp_islands GROUP BY {id_col}, island
)"""
