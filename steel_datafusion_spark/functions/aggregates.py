"""Aggregate-function constructors.

The reference's ``df/aggregate`` (main.rs:183-195) takes agg expressions, but
no aggregate constructors are registered in-tree — they live in the inherited
``datafusion-functions-aggregate`` crate (Cargo.lock:1151) with no Steel
binding (SURVEY.md §2.5 gap).  This module exposes the intended surface over
``pyspark.sql.functions`` — all JVM-side, partial→final hash-agg capable.

``sum_exact`` is a scale/determinism extension: double-sum order varies with
partitioning, so cross-engine (and cross-run) comparisons of big float sums
are unstable.  Summing an exact decimal is associative ⇒ deterministic at any
partition count, then cast back to double.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "agg_sum", "agg_count", "agg_count_star", "agg_avg", "agg_min", "agg_max",
    "agg_count_distinct", "agg_approx_count_distinct", "agg_stddev",
    "agg_variance", "agg_corr", "agg_median", "agg_first", "agg_last",
    "sum_exact", "avg_exact", "agg_approx_median", "agg_approx_percentile",
]


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


def agg_sum(e) -> Column: return F.sum(_c(e))
def agg_count(e) -> Column: return F.count(_c(e))
def agg_count_star() -> Column: return F.count(F.lit(1))
def agg_avg(e) -> Column: return F.avg(_c(e))
def agg_min(e) -> Column: return F.min(_c(e))
def agg_max(e) -> Column: return F.max(_c(e))
def agg_count_distinct(*es) -> Column: return F.count_distinct(*[_c(e) for e in es])
def agg_approx_count_distinct(e, rsd: float = 0.05) -> Column:
    return F.approx_count_distinct(_c(e), rsd)
def agg_stddev(e) -> Column: return F.stddev_samp(_c(e))
def agg_variance(e) -> Column: return F.var_samp(_c(e))
def agg_corr(a, b) -> Column: return F.corr(_c(a), _c(b))
def agg_median(e) -> Column: return F.median(_c(e))
def agg_first(e, ignorenulls: bool = False) -> Column: return F.first(_c(e), ignorenulls)
def agg_last(e, ignorenulls: bool = False) -> Column: return F.last(_c(e), ignorenulls)


def sum_exact(e, scale: int = 10) -> Column:
    """Order-independent (deterministic) sum of a double column: route through
    an exact decimal.  precision 38 leaves 38-scale integer digits of headroom,
    far beyond any realistic 100 TB sum."""
    return F.sum(_c(e).cast(f"decimal(28,{scale})")).cast("double")


def avg_exact(e, scale: int = 10) -> Column:
    """Deterministic mean: exact decimal sum / count, divided in double."""
    c = _c(e)
    return (F.sum(c.cast(f"decimal(28,{scale})")).cast("double") /
            F.count(c)).cast("double")


def agg_approx_percentile(e, p: float, accuracy: int = 10000) -> Column:
    """Greenwald-Khanna approximate percentile — the 100 TB scale path for
    rank statistics.  ``F.median``/``F.percentile`` are exact but require a
    full per-group sort+materialization, which at cluster scale means
    spilling every group to disk; GK keeps an O(accuracy) mergeable summary
    per partition (rank error ≤ n/accuracy) and composes with partial→final
    aggregation like any other agg.

    Returns an actual data value (no interpolation) — with accuracy ≥ the
    group row count the result is exact and equals DuckDB's
    ``quantile_disc`` (gate ``approx_percentile`` in queries.py checks
    exactly this at sf0.01; tests/test_relational.py covers the
    ``df_describe(approx_median=True)`` path)."""
    return F.percentile_approx(_c(e), p, accuracy)


def agg_approx_median(e, accuracy: int = 10000) -> Column:
    """Approximate median via :func:`agg_approx_percentile` at p=0.5."""
    return agg_approx_percentile(e, 0.5, accuracy)
