"""Cross-document line-level deduplication (C4 / RefinedWeb style).

Beyond-reference surface: the curation step between document-level dedup
and n-gram filtering — strip every LINE whose exact (trimmed) content
recurs across the corpus more than ``max_df`` times (cookie banners,
navigation chrome, license boilerplate), while keeping each document's
unique prose in original order.  Document-level near-dup cannot catch
this (a page that is 20% shared chrome is nobody's near-duplicate);
within-document repetition stats cannot either (the chrome appears once
per page).

Scale design:

- lines explode with their position (posexplode — one map-side pass);
- the line occurrence count groups on the 60-bit md5 hash (fine-grained
  shuffle keys, map-side partials — the same inverted-index shape as the
  n-gram family in pipeline/dedup.py);
- the HOT line set (count > max_df) is tiny by construction (a line must
  recur to qualify), so the drop-join broadcasts and the line stream
  never re-shuffles;
- reassembly is an order-preserving groupBy: collect (pos, line) structs,
  array_sort, join — one shuffle on doc_id.

Determinism / oracle parity: lines are trimmed before hashing and
comparison; empty lines are dropped and never counted (they would always
be "hot"); DuckDB mirrors with string_split + zipped unnest +
string_agg(ORDER BY).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import md5_int60

__all__ = ["line_dedup", "sql_line_dedup"]


def line_dedup(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", delim: str = "\n",
               max_df: int = 1) -> DataFrame:
    """(id, n_lines, n_dropped, text_clean): documents with every line
    whose trimmed content occurs more than ``max_df`` times across the
    corpus removed (count is total occurrences, the C4 rule; a line
    repeated inside ONE document counts each time).  ``n_lines`` counts
    the document's non-empty lines; ``text_clean`` preserves original
    line order joined by ``delim``.  Documents whose every line drops
    return an empty string."""
    from ..cache import track

    split = F.split(F.col(text_col), F.lit(delim), -1)
    lines = track(
        df.select(F.col(id_col),
                  F.posexplode(split).alias("pos", "raw"))
        .select(id_col, "pos", F.trim(F.col("raw")).alias("line"))
        .filter(F.col("line") != "")
        .withColumn("h", md5_int60(F.col("line")))
        .persist())
    hot = F.broadcast(
        lines.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > max_df).select("h"))
    kept = lines.join(hot, "h", "left_anti")
    rebuilt = (kept.groupBy(id_col)
               .agg(F.array_join(
                   F.transform(
                       F.array_sort(F.collect_list(
                           F.struct(F.col("pos"), F.col("line")))),
                       lambda s: s["line"]),
                   delim).alias("text_clean"),
                   F.count(F.lit(1)).alias("n_kept")))
    counts = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_lines"))
    return (df.select(F.col(id_col)).distinct()
            .join(counts, id_col, "left")
            .join(rebuilt, id_col, "left")
            .select(
                F.col(id_col),
                F.coalesce(F.col("n_lines"), F.lit(0)).cast("long")
                .alias("n_lines"),
                (F.coalesce(F.col("n_lines"), F.lit(0))
                 - F.coalesce(F.col("n_kept"), F.lit(0))).cast("long")
                .alias("n_dropped"),
                F.coalesce(F.col("text_clean"), F.lit(""))
                .alias("text_clean")))


def sql_line_dedup(table: str, id_col: str = "doc_id",
                   text_col: str = "text", delim: str = "\n",
                   max_df: int = 1) -> str:
    """DuckDB mirror of ``line_dedup`` over ``table`` (same trim / empty /
    occurrence-count semantics, order-preserving string_agg)."""
    d = delim.replace("'", "''")
    h = "('0x' || substr(md5(line), 1, 15))::BIGINT"
    return f"""
WITH ld_split AS (
  SELECT {id_col}, string_split({text_col}, '{d}') AS ls FROM {table}
),
ld_lines AS (
  SELECT {id_col}, pos, line FROM (
    SELECT {id_col},
           unnest(generate_series(1, len(ls))) AS pos,
           trim(unnest(ls)) AS line
    FROM ld_split)
  WHERE line <> ''
),
ld_hot AS (
  SELECT {h} AS h FROM ld_lines GROUP BY {h} HAVING COUNT(*) > {max_df}
),
ld_kept AS (
  SELECT * FROM ld_lines WHERE {h} NOT IN (SELECT h FROM ld_hot)
),
ld_rebuilt AS (
  SELECT {id_col}, string_agg(line, '{d}' ORDER BY pos) AS text_clean,
         COUNT(*) AS n_kept
  FROM ld_kept GROUP BY {id_col}
),
ld_counts AS (
  SELECT {id_col}, COUNT(*) AS n_lines FROM ld_lines GROUP BY {id_col}
)
SELECT d.{id_col},
  coalesce(c.n_lines, 0)::BIGINT AS n_lines,
  (coalesce(c.n_lines, 0) - coalesce(r.n_kept, 0))::BIGINT AS n_dropped,
  coalesce(r.text_clean, '') AS text_clean
FROM (SELECT DISTINCT {id_col} FROM {table}) d
LEFT JOIN ld_counts c USING ({id_col})
LEFT JOIN ld_rebuilt r USING ({id_col})
"""
