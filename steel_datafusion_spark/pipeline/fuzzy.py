"""Typo-tolerant fuzzy matching (record linkage) — edit-distance join.

A naive fuzzy join is the cartesian product with a levenshtein filter —
never acceptable at scale.  This is the standard two-stage shape:

1. **Candidate generation by character-n-gram blocking**: both sides
   explode their distinct char n-gram hashes and join on the hash —
   fine-grained shuffle keys, like every other candidate generator here.
   Pigeonhole exactness bound: one edit destroys at most ``n`` of a
   string's n-grams, so ``k`` edits destroy at most ``k·n``; any string
   with MORE than ``k·n`` n-grams (length > k·n + n - 1) must still
   share at least one with its within-distance partner — the blocking
   is lossless for strings longer than that, and only degrades to
   best-effort below it (documented, testable).
2. **Verify with exact levenshtein ≤ max_dist** — Spark's three-arg
   ``levenshtein(l, r, threshold)`` bails out early past the threshold
   (O(len·k) instead of O(len²)); the DuckDB oracle uses the plain
   two-arg form, which agrees wherever dist ≤ threshold.

Output: (left id, right id, dist).  Works for deduplicating titles,
linking user-typed queries to a catalog, matching near-miss URLs, etc.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_int60

__all__ = ["char_ngram_hashes", "fuzzy_match", "SQL_CHAR_NGRAM_HASHES"]


def char_ngram_hashes(s: Column, n: int = 3) -> Column:
    """Distinct md5-60 hashes of the character n-grams of ``s``; strings
    shorter than ``n`` contribute one whole-string gram."""
    grams = F.transform(
        F.sequence(F.lit(1), F.length(s) - (n - 1)),
        lambda i: s.substr(i, F.lit(n)),
    )
    whole = F.array(s)
    return F.array_distinct(F.transform(
        F.when(F.length(s) < n, whole).otherwise(grams), md5_int60))


# DuckDB mirror of char_ngram_hashes (format with the string expression)
SQL_CHAR_NGRAM_HASHES = (
    "list_distinct(list_transform("
    "CASE WHEN length({s}) < {n} THEN [{s}] "
    "ELSE list_transform(generate_series(1, length({s}) - {nm1}), "
    "i -> substr({s}, i::INT, {n})) END, "
    "g -> ('0x' || substr(md5(g), 1, 15))::BIGINT))"
)


def fuzzy_match(
    left: DataFrame, right: DataFrame,
    left_id: str, left_col: str,
    right_id: str, right_col: str,
    max_dist: int = 2, n: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """Edit-distance join; output columns are fixed: (left_id, right_id,
    dist ≤ max_dist).

    Blocking is exact for strings with more than ``max_dist·n`` char
    n-grams (see module docstring); the levenshtein verify is exact
    always, so false positives never survive.  Both explodes repartition
    first so a single-split source doesn't serialize the hash stage.

    **``max_df`` is the hot-gram cost cap** (same knob as
    ngram_jaccard_pairs): a stop-gram appearing in d_L left and d_R right
    strings contributes d_L·d_R candidate rows — at corpus scale a gram
    present in 30% of both sides IS the cartesian product.  ``max_df``
    drops grams whose combined document frequency exceeds it (broadcast
    anti-join — the hot set is tiny by definition) BEFORE the candidate
    join, bounding any gram's contribution at max_df².  Exactness then
    weakens only for pairs ALL of whose shared grams are hot: the
    pigeonhole guarantee becomes "strings with more than max_dist·n
    non-hot grams" — set max_df ≫ the duplicate-cluster size you expect
    and only true stop-grams are affected."""
    def _side(df: DataFrame, id_col: str, s_col: str, pid: str) -> DataFrame:
        parts = df.sparkSession.sparkContext.defaultParallelism * 2
        return (df.repartition(parts, F.col(id_col))
                .select(F.col(id_col).alias(pid),
                        F.col(s_col).alias(f"{pid}_s"))
                .withColumn("h", F.explode(
                    char_ngram_hashes(F.col(f"{pid}_s"), n))))

    lx = _side(left, left_id, left_col, "lid")
    rx = _side(right, right_id, right_col, "rid")
    if max_df is not None:
        hot = (lx.select("h").unionAll(rx.select("h"))
               .groupBy("h").agg(F.count(F.lit(1)).alias("df_h"))
               .filter(F.col("df_h") > max_df).select("h"))
        lx = lx.join(F.broadcast(hot), "h", "left_anti")
        rx = rx.join(F.broadcast(hot), "h", "left_anti")
    cand = (lx.join(rx, "h")
            .select("lid", "lid_s", "rid", "rid_s").distinct())
    dist = F.levenshtein(F.col("lid_s"), F.col("rid_s"), max_dist)
    return (cand.withColumn("dist", dist)
            .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
            .select(F.col("lid").alias("left_id"),
                    F.col("rid").alias("right_id"),
                    "dist"))
