"""Sequence packing: assign documents to fixed token-budget training bins.

Implements concat-then-chunk packing (the standard LM-pretraining shape:
concatenate the ordered document stream, cut every ``budget`` tokens):
a document's bin is ``floor(tokens_before / budget)`` where
``tokens_before`` is the running token total of all earlier documents in
its group.  A document whose span crosses a cut boundary is flagged
``straddle`` (it contributes to two+ chunks — the packing loss knob).

Semantics are a pure window expression — deterministic given
(group, order), identical in ANSI SQL, and the scalable shape: one hash
shuffle on the group key, in-partition sort, single pass.  Exact
first-fit bin packing is inherently sequential per group (not
window-expressible, and not what large pretraining pipelines run);
concat-then-chunk wastes no capacity at all — every bin except the last
holds exactly ``budget`` tokens, at the cost of straddled documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["pack_chunks", "pack_bins_summary"]


def pack_chunks(df: DataFrame, group_cols: list[str], order_col: str,
                token_col: str, budget: int) -> DataFrame:
    """Adds ``bin_id`` (the chunk holding the document's first token),
    ``tokens_before`` and ``straddle`` to ``df``.  Zero-token documents
    count as 1 token so every document owns at least one position."""
    t = F.greatest(F.col(token_col), F.lit(1))
    w = (Window.partitionBy(*group_cols).orderBy(F.col(order_col).asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    before = F.coalesce(F.sum(t).over(w), F.lit(0)).cast("long")
    return (df.withColumn("tokens_before", before)
            .withColumn("bin_id",
                        F.floor(F.col("tokens_before") / budget).cast("long"))
            .withColumn("straddle",
                        F.floor((F.col("tokens_before") + t - 1) / budget)
                        > F.col("bin_id")))


def pack_bins_summary(df: DataFrame, group_cols: list[str], order_col: str,
                      token_col: str, budget: int) -> DataFrame:
    """Per-(group, bin) packing stats: document count, tokens starting in
    the bin, and how many documents straddle out of it."""
    packed = pack_chunks(df, group_cols, order_col, token_col, budget)
    t = F.greatest(F.col(token_col), F.lit(1))
    return (packed.groupBy(*group_cols, "bin_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(t).cast("long").alias("bin_tokens"),
                 F.sum(F.col("straddle").cast("long")).alias("n_straddle")))
