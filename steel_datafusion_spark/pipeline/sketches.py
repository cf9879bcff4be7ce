"""Mergeable sketch rollups — HLL distinct counts, KLL quantiles.

The 100 TB pre-aggregation pattern: build per-segment sketches ONCE (one
linear pass, one small binary per group), persist them, and answer any
coarser-grained question later by MERGING sketches instead of rescanning
raw data.  Distinct counts and quantiles are the two aggregates that
normally don't pre-aggregate (count_distinct(day) values can't be summed
into a month) — sketches make them mergeable:

- HLL union is register-wise max — lossless at the register level, so a
  merged estimate carries the same ~1.04/sqrt(2^lg_k) error bound as a
  global single-pass sketch.  (The two estimates are near- but not
  bit-identical: an incrementally-built sketch uses the HIP estimator,
  a union result the composite one — tests pin both the gap and the
  bound.)
- KLL merge keeps the same rank-error guarantee (~1.65/sqrt(k)) as a
  single-pass sketch.

Spark exposes Apache DataSketches natively (``hll_sketch_agg`` /
``hll_union_agg`` / ``kll_sketch_*`` — JVM-side, partial→final mergeable
aggregates like any sum).  Deterministic for fixed input (no RNG), but not
reproducible in other engines, so the driver gate is rows-only; the
semantic checks (merge-vs-global equality, error bounds vs exact) live in
tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hll_rollup", "hll_merge_rollup", "kll_quantile_rollup",
           "kll_merge_quantiles"]


def hll_rollup(df: DataFrame, group_cols: list[str], value_col: str,
               lg_k: int = 12) -> DataFrame:
    """Per-group HLL sketch + its distinct estimate.  Keep the ``sketch``
    column (binary, ~2^lg_k bytes) — it is the reusable artifact; the
    estimate is derived.  lg_k 12 ⇒ ~1.6% relative standard error."""
    return (df.groupBy(*group_cols)
            .agg(F.hll_sketch_agg(F.col(value_col), F.lit(lg_k))
                 .alias("sketch"))
            .withColumn("distinct_est",
                        F.hll_sketch_estimate("sketch").cast("long")))


def hll_merge_rollup(sketches: DataFrame, group_cols: list[str],
                     sketch_col: str = "sketch") -> DataFrame:
    """Re-aggregate fine-grained sketches to a coarser grain (e.g. per
    (day, source) → per source) by HLL union — no raw-data rescan.
    ``group_cols=[]`` gives the global rollup (one row)."""
    agg = F.hll_union_agg(F.col(sketch_col)).alias("sketch")
    g = sketches.groupBy(*group_cols) if group_cols else sketches.groupBy()
    return (g.agg(agg)
            .withColumn("distinct_est",
                        F.hll_sketch_estimate("sketch").cast("long")))


def kll_quantile_rollup(df: DataFrame, group_cols: list[str],
                        value_col: str, k: int = 200) -> DataFrame:
    """Per-group KLL(double) quantile sketch — the mergeable alternative to
    exact ``F.median``/percentile at scale (rank error ~1.65/sqrt(k))."""
    return (df.groupBy(*group_cols)
            .agg(F.kll_sketch_agg_double(
                F.col(value_col).cast("double"), F.lit(k)).alias("kll")))


def _fold_kll(sketches: DataFrame, keys: list[str],
              sketch_col: str) -> DataFrame:
    """One per-group KLL merge pass: collect_list + pairwise fold, yielding
    one merged sketch per key combination (column name = ``sketch_col``)."""
    g = sketches.groupBy(*keys) if keys else sketches.groupBy()
    lst = g.agg(F.collect_list(F.col(sketch_col)).alias("_ks"))
    # guard the empty-group case (global groupBy over zero rows yields one
    # row with _ks = []): element_at([], 1) throws under ANSI — emit a NULL
    # sketch instead, so downstream quantiles come back NULL, not an error
    fold = F.aggregate(
        F.slice(F.col("_ks"), 2, F.greatest(F.size("_ks") - 1, F.lit(0))),
        F.element_at(F.col("_ks"), 1),
        lambda acc, x: F.kll_sketch_merge_double(acc, x),
    )
    return lst.select(
        *keys, F.when(F.size("_ks") > 0, fold).alias(sketch_col))


def kll_merge_quantiles(sketches: DataFrame, group_cols: list[str],
                        quantiles: list[float],
                        sketch_col: str = "kll",
                        levels: int = 1, fanout: int = 64) -> DataFrame:
    """Merge KLL sketches to a coarser grain and extract quantiles.
    Output: group cols + ``q_<pct>`` per requested quantile.

    Spark's ``kll_sketch_merge_double`` is a pairwise scalar (no merge
    AGGREGATE exists as of 4.1), so the per-group merge folds a
    ``collect_list`` of sketches — fine for realistic fan-ins (days into a
    month, partitions into a table: each sketch is ~KB and the fold is one
    group's worth, not the raw data).

    For huge fan-ins (a million per-partition sketches into one group) pass
    ``levels=2``: sketches are first salted into ``fanout`` subgroups per
    group and merged there (distributed partial merges, each folding
    ~fan_in/fanout sketches), then the ``fanout`` partials merge in a second
    pass — no single task ever collect_lists the full fan-in.  KLL merge
    keeps the same rank-error guarantee regardless of merge tree shape, so
    ``levels`` changes cost, not the error bound.  Size ``fanout`` ≈
    sqrt(max fan-in) to balance the two passes."""
    if levels not in (1, 2):
        raise ValueError(f"levels must be 1 or 2, got {levels}")
    if levels == 2:
        # deterministic salt from the sketch bytes: spreads a group's
        # sketches uniformly without needing any natural subgrouping key
        salted = sketches.withColumn(
            "_salt", F.pmod(F.hash(F.col(sketch_col)), F.lit(fanout)))
        sketches = _fold_kll(salted, [*group_cols, "_salt"], sketch_col) \
            .drop("_salt")
    merged = _fold_kll(sketches, group_cols, sketch_col)
    cols = [
        F.kll_sketch_get_quantile_double(F.col(sketch_col), F.lit(q))
        .alias(f"q_{str(q).replace('.', '_')}")
        for q in quantiles
    ]
    return merged.select(*group_cols, *cols)
