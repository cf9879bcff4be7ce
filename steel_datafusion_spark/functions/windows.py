"""Window-function constructors for ``df/window``.

The reference's ``df/window`` (main.rs:197-202, reg :485) appends computed
window expressions, but no window-expression constructors are registered
in-tree (``datafusion-functions-window``, Cargo.lock:1209, unreachable from
Steel — SURVEY.md §2.6 gap).  This exposes the intended surface: ranking +
analytic functions and partition/order/frame spec builders over
``pyspark.sql.window.Window``.

Scale note: a window with ``partitionBy`` is one hash shuffle on the partition
key and sorts within partitions — same cost shape as DataFusion's
BoundedWindowAggExec.  A window with NO partitionBy collapses to a single
partition (global sort); avoid it on large inputs (flagged in docstrings).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.window import Window, WindowSpec

from ..expressions import SortExpr

__all__ = [
    "window_spec", "rows_between", "range_between",
    "w_row_number", "w_rank", "w_dense_rank", "w_percent_rank", "w_ntile",
    "w_lag", "w_lead", "w_first_value", "w_last_value", "w_nth_value",
    "UNBOUNDED_PRECEDING", "UNBOUNDED_FOLLOWING", "CURRENT_ROW",
]

UNBOUNDED_PRECEDING = Window.unboundedPreceding
UNBOUNDED_FOLLOWING = Window.unboundedFollowing
CURRENT_ROW = Window.currentRow


def window_spec(
    partition_by: Sequence[Column | str] = (),
    order_by: Sequence[SortExpr | Column | str] = (),
) -> WindowSpec:
    """Build a partition/order spec.  Empty partition_by ⇒ single-partition
    execution (global window) — correct but non-scalable; prefer a key."""
    spec = Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    if order_by:
        cols = [o.to_column() if isinstance(o, SortExpr) else o for o in order_by]
        spec = spec.orderBy(*cols)
    return spec


def rows_between(spec: WindowSpec, start: int, end: int) -> WindowSpec:
    """ROWS frame (physical offsets)."""
    return spec.rowsBetween(start, end)


def range_between(spec: WindowSpec, start: int, end: int) -> WindowSpec:
    """RANGE frame (logical value offsets)."""
    return spec.rangeBetween(start, end)


def w_row_number(spec: WindowSpec) -> Column: return F.row_number().over(spec)
def w_rank(spec: WindowSpec) -> Column: return F.rank().over(spec)
def w_dense_rank(spec: WindowSpec) -> Column: return F.dense_rank().over(spec)
def w_percent_rank(spec: WindowSpec) -> Column: return F.percent_rank().over(spec)
def w_ntile(n: int, spec: WindowSpec) -> Column: return F.ntile(n).over(spec)
def w_lag(e, offset: int = 1, default=None, spec: WindowSpec = None) -> Column:
    return F.lag(e, offset, default).over(spec)
def w_lead(e, offset: int = 1, default=None, spec: WindowSpec = None) -> Column:
    return F.lead(e, offset, default).over(spec)
def w_first_value(e, spec: WindowSpec, ignorenulls: bool = False) -> Column:
    return F.first(e, ignorenulls).over(spec)
def w_last_value(e, spec: WindowSpec, ignorenulls: bool = False) -> Column:
    return F.last(e, ignorenulls).over(spec)
def w_nth_value(e, n: int, spec: WindowSpec) -> Column:
    return F.nth_value(e, n).over(spec)
