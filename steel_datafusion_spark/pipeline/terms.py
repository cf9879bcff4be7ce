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
