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

from .dedup import MERSENNE61, _perm_consts, md5_int60

__all__ = ["hll_rollup", "hll_merge_rollup", "kll_quantile_rollup",
           "kll_merge_quantiles", "countmin_table", "countmin_estimate",
           "sql_countmin_estimate"]


# ---------------------------------------------------------------------------
# Count-min sketch (deterministic — fully reproducible in the DuckDB oracle)
# ---------------------------------------------------------------------------

# Affine-mix constants for the count-min hash rows.  _perm_consts is a fixed
# LCG emitting constants sequentially, so extending the table to 136 leaves
# dedup's 128 MinHash/corpus-sketch slots bit-identical; count-min owns
# slots [128, 136) — depth ≤ 8.
_CM_CONSTS = _perm_consts(136)[128:136]
_LO_MASK = (1 << 30) - 1


def _cm_cell(h: Column, d: int, width: int) -> Column:
    """Row-d count-min cell of a 60-bit hash (pure int64 arithmetic, ANSI
    overflow-safe; identical expression mirrored in SQL)."""
    A, B, C = _CM_CONSTS[d]
    lo = h.bitwiseAND(F.lit(_LO_MASK))
    hi = F.shiftright(h, 30)
    mixed = (lo * F.lit(A) + hi * F.lit(B) + F.lit(C)) % F.lit(MERSENNE61)
    return mixed % F.lit(width)


def _sql_cm_cell(h: str, d: int, width: int) -> str:
    A, B, C = _CM_CONSTS[d]
    return (f"(((({h}) & {_LO_MASK}) * {A} + (({h}) >> 30) * {B} + {C}) "
            f"% {MERSENNE61}) % {width}")


def countmin_table(df: DataFrame, group_cols: list[str], term_col: str,
                   depth: int = 4, width: int = 512,
                   weight_col: str | None = None) -> DataFrame:
    """Per-group count-min sketch as a tall table
    ``(*group_cols, d, cell, c)`` — ``depth * width`` cells per group,
    regardless of term cardinality.

    Unlike HLL/KLL this sketch is plain integer arithmetic over md5, so the
    DuckDB oracle reproduces every cell (and every estimate) bit-for-bit —
    the gate hashes estimates, not just bounds.  Mergeable by construction:
    summing cells across sketches IS the union sketch (tests pin
    per-group-sum ≡ global).  Point-estimate guarantee: est ≥ true count,
    est ≤ true + e/width · N with prob ≥ 1 − e^−depth.

    Plan: explode terms → explode ``depth`` (row, cell) pairs →
    groupBy-count with map-side partials; shuffle key cardinality is capped
    at |groups| · depth · width, independent of vocabulary — the reason to
    choose it over exact term counts at 100 TB.

    ``weight_col``: build the sketch from PRE-AGGREGATED term counts
    (each input row contributes ``weight`` to its cells instead of 1) —
    the sketch is a linear function of term counts, so
    ``countmin_table(counts, ..., weight_col="c")`` is cell-for-cell
    identical to ``countmin_table(raw_terms, ...)`` while touching
    |vocab| rows instead of rescanning the token stream (r15: the gate
    reuses its exact-count pass this way)."""
    if not 1 <= depth <= len(_CM_CONSTS):
        raise ValueError(f"depth must be in [1, {len(_CM_CONSTS)}]")
    if width < 1:
        raise ValueError(f"width must be >= 1, got {width}")
    h = md5_int60(F.col(term_col))
    pairs = F.array(*[
        F.struct(F.lit(d).alias("d"), _cm_cell(h, d, width).alias("cell"))
        for d in range(depth)
    ])
    w_cols = [F.col(weight_col).alias("_w")] if weight_col else []
    exploded = df.select(*group_cols, *w_cols, F.explode(pairs).alias("p")) \
                 .select(*group_cols, *(["_w"] if weight_col else []),
                         "p.d", "p.cell")
    agg = (F.sum("_w").cast("long") if weight_col
           else F.count(F.lit(1))).alias("c")
    return exploded.groupBy(*group_cols, "d", "cell").agg(agg)


def countmin_estimate(sketch: DataFrame, probes: DataFrame,
                      group_cols: list[str], term_col: str,
                      depth: int = 4, width: int = 512) -> DataFrame:
    """Point-estimate each probe term against a count-min sketch table:
    ``(*group_cols, term, est_c)`` with est = min over rows of the term's
    cell (a missing cell is 0).

    Plan: the probe side fans out to ``depth`` (d, cell) keys and joins the
    sketch on (group, d, cell) — broadcast-sized when probes are a term
    list; the sketch itself never moves to the driver."""
    if width < 1:
        raise ValueError(f"width must be >= 1, got {width}")
    cells = probes.select(
        *group_cols, F.col(term_col).alias("term"),
        F.explode(F.array(*[
            F.struct(F.lit(d).alias("d"),
                     _cm_cell(md5_int60(F.col(term_col)), d, width)
                     .alias("cell"))
            for d in range(depth)
        ])).alias("p")).select(*group_cols, "term", "p.d", "p.cell")
    joined = cells.join(sketch, [*group_cols, "d", "cell"], "left")
    return (joined.groupBy(*group_cols, "term")
            .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est_c")))


def sql_countmin_estimate(tokens_rel: str, probes_rel: str,
                          depth: int = 4, width: int = 512,
                          prefix: str = "cm") -> str:
    """DuckDB CTE body mirroring countmin_table + countmin_estimate for the
    ungrouped (global) case.  ``tokens_rel``/``probes_rel`` expose a
    ``term`` column; result relation ``{prefix}_est`` has (term, est_c)."""
    h = "('0x' || substr(md5(term), 1, 15))::BIGINT"
    cell_rows = " UNION ALL ".join(
        f"SELECT term, {d} AS d, {_sql_cm_cell(h, d, width)} AS cell "
        f"FROM {tokens_rel}" for d in range(depth))
    probe_rows = " UNION ALL ".join(
        f"SELECT term, {d} AS d, {_sql_cm_cell(h, d, width)} AS cell "
        f"FROM {probes_rel}" for d in range(depth))
    return f"""
{prefix}_cells AS ({cell_rows}),
{prefix}_sketch AS (
  SELECT d, cell, COUNT(*) AS c FROM {prefix}_cells GROUP BY d, cell
),
{prefix}_probe_cells AS ({probe_rows}),
{prefix}_est AS (
  SELECT p.term, MIN(coalesce(s.c, 0)) AS est_c
  FROM {prefix}_probe_cells p
  LEFT JOIN {prefix}_sketch s ON p.d = s.d AND p.cell = s.cell
  GROUP BY p.term
)"""


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
