"""Relational operators — the ``df/*`` surface over native PySpark DataFrames.

Maps every DataFrame-level Steel callable from the reference
(/root/reference/src/main.rs:145-304, registration main.rs:478-496) onto the
PySpark DataFrame API.  All functions take and return plain
``pyspark.sql.DataFrame`` — the lazy logical-plan model is identical to
DataFusion's, so this layer is declaration-only; Catalyst + AQE choose the
physical strategy (SURVEY.md §4: every optimization the inherited engine has,
Catalyst already does).

Join-type values: the reference wraps DataFusion's ``JoinType`` enum
(main.rs:99-101) but never registers a constructor — the intended surface
(SURVEY.md §2.4) is exposed here as strings.  ``right_semi``/``right_anti``
have no Spark ``how=``; they are expressed by swapping sides, which yields
identical semantics (output columns come from the preserved side only).
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..expressions import SortExpr

__all__ = [
    "JOIN_TYPES",
    "df_select", "df_filter", "df_with_column", "df_with_column_renamed",
    "df_limit", "df_sort_by", "df_sort",
    "df_union", "df_union_distinct", "df_intersect", "df_except",
    "df_distinct", "df_distinct_on", "df_aggregate", "df_window",
    "df_join", "df_join_on",
    "df_count", "df_collect", "df_show", "df_show_limit",
]

# DataFusion 42 JoinType enum → Spark `how=` (SURVEY.md §2.4).  LeftMark is an
# internal decorrelation artifact with no user-facing Spark analogue — omitted.
JOIN_TYPES = {
    "inner": "inner",
    "left": "left",
    "right": "right",
    "full": "full",
    "left_semi": "semi",
    "left_anti": "anti",
    "right_semi": "right_semi",   # handled by side swap in df_join/df_join_on
    "right_anti": "right_anti",   # handled by side swap
}


def df_select(df: DataFrame, exprs: Sequence[Column | str]) -> DataFrame:
    """Projection over expressions (main.rs:225-230, reg :489)."""
    return df.select(*exprs)


def df_filter(df: DataFrame, predicate: Column) -> DataFrame:
    """Keep rows where predicate is TRUE; NULL ⇒ dropped (SQL 3VL)
    (main.rs:176-181, reg :483).  Spark filter has identical 3VL."""
    return df.filter(predicate)


def df_with_column(df: DataFrame, name: str, expr: Column) -> DataFrame:
    """Add or replace a column (main.rs:288-293, reg :495)."""
    return df.withColumn(name, expr)


def df_with_column_renamed(df: DataFrame, old: str, new: str) -> DataFrame:
    """Rename a column (main.rs:295-304, reg :496)."""
    return df.withColumnRenamed(old, new)


def df_limit(df: DataFrame, skip: int, fetch: int | None = None) -> DataFrame:
    """OFFSET skip (+ optional LIMIT fetch) (main.rs:204-209, reg :486).

    Scale note: OFFSET forces a single-partition gather of skip+fetch rows —
    same cost model as DataFusion's GlobalLimitExec; fine for top-k patterns,
    pathological for deep paging (document, don't "fix")."""
    out = df.offset(skip) if skip else df
    return out.limit(fetch) if fetch is not None else out


def df_sort_by(df: DataFrame, exprs: Sequence[Column | str]) -> DataFrame:
    """Sort ascending with **NULLS LAST** — DataFusion's ``sort_by`` default
    (main.rs:211-216, reg :487).  Spark's default for asc is nulls-FIRST, so
    the order is set explicitly for parity."""
    cols = [(F.col(e) if isinstance(e, str) else e).asc_nulls_last() for e in exprs]
    return df.orderBy(*cols)


def df_sort(df: DataFrame, sort_exprs: Sequence[SortExpr]) -> DataFrame:
    """Sort with explicit per-key asc/desc + nulls placement
    (main.rs:218-223, reg :488)."""
    return df.orderBy(*[s.to_column() for s in sort_exprs])


def df_union(a: DataFrame, b: DataFrame) -> DataFrame:
    """UNION ALL, by position, schemas coercion-compatible
    (main.rs:145-147, reg :479).  Spark union is also positional."""
    return a.union(b)


def df_union_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    """SQL UNION (dedup) (main.rs:149-154, reg :480)."""
    return a.union(b).distinct()


def df_intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    """INTERSECT — set (distinct) semantics (main.rs:274-279, reg :493)."""
    return a.intersect(b)


def df_except(a: DataFrame, b: DataFrame) -> DataFrame:
    """EXCEPT — set (distinct) semantics (main.rs:281-286, reg :494).
    ``subtract`` is Spark's set-semantics EXCEPT; ``exceptAll`` (bag) would
    diverge from DataFusion."""
    return a.subtract(b)


def df_distinct(df: DataFrame) -> DataFrame:
    """SELECT DISTINCT * (main.rs:156-158, reg :481)."""
    return df.distinct()


def df_distinct_on(
    df: DataFrame,
    on_exprs: Sequence[Column | str],
    select_exprs: Sequence[Column | str],
    sort_exprs: Sequence[SortExpr] | None = None,
) -> DataFrame:
    """Postgres-style DISTINCT ON (main.rs:160-174, reg :482): one row per
    on-expr key — the first under the sort order — projecting select-exprs.

    No native Catalyst op; implemented as the row_number window pattern
    (SURVEY.md §2.5).  Scale note: this is one hash-partition shuffle on the
    DISTINCT ON key — the same distribution DataFusion's first_value agg needs;
    no extra exchange, and AQE handles key skew."""
    on_cols = [F.col(e) if isinstance(e, str) else e for e in on_exprs]
    from pyspark.sql.window import Window

    order_cols = [s.to_column() for s in (sort_exprs or [])] or [F.lit(1)]
    w = Window.partitionBy(*on_cols).orderBy(*order_cols)
    rn = "_sdf_rn"
    out = df.withColumn(rn, F.row_number().over(w)).filter(F.col(rn) == 1)
    return out.select(*select_exprs)


def df_aggregate(
    df: DataFrame,
    group_exprs: Sequence[Column | str],
    agg_exprs: Sequence[Column],
) -> DataFrame:
    """GROUP BY group-exprs computing agg-exprs (main.rs:183-195, reg :484).

    Spark plans this as partial→final hash aggregation with map-side combine —
    the same two-phase shape DataFusion uses; one shuffle on the group key."""
    if group_exprs:
        return df.groupBy(*group_exprs).agg(*agg_exprs)
    return df.agg(*agg_exprs)


def df_window(df: DataFrame, window_exprs: Sequence[Column]) -> DataFrame:
    """Append computed window expressions to the projection
    (main.rs:197-202, reg :485).  Pass fully-formed ``expr.over(spec)``
    columns built with :mod:`steel_datafusion_spark.functions.windows`."""
    return df.select("*", *window_exprs)


def _swap_for_right_variant(join_type: str) -> tuple[str, bool]:
    if join_type == "right_semi":
        return "semi", True
    if join_type == "right_anti":
        return "anti", True
    return JOIN_TYPES[join_type], False


def df_join(
    left: DataFrame,
    right: DataFrame,
    join_type: str,
    left_cols: Sequence[str],
    right_cols: Sequence[str],
    filter: Column | None = None,
) -> DataFrame:
    """Equi-join on parallel column-name lists + optional residual predicate
    (main.rs:232-253, reg :490).

    Scale notes: expressed as an equi-condition so Catalyst can pick
    broadcast-hash / shuffled-hash / sort-merge (the analogue of DataFusion's
    JoinSelection); the residual ``filter`` stays in the join condition so it
    is evaluated during the join, not as a post-filter on a wider result.
    """
    if len(left_cols) != len(right_cols):
        raise ValueError("left_cols and right_cols must have equal length")
    how, swap = _swap_for_right_variant(join_type)
    if swap:
        left, right = right, left
        left_cols, right_cols = right_cols, left_cols
    cond = reduce(
        lambda a, b: a & b,
        [left[lc] == right[rc] for lc, rc in zip(left_cols, right_cols)],
    )
    if filter is not None:
        cond = cond & filter
    return left.join(right, on=cond, how=how)


def df_join_on(
    left: DataFrame,
    right: DataFrame,
    join_type: str,
    on_exprs: Sequence[Column],
) -> DataFrame:
    """General theta-join: arbitrary predicate conjunction, incl. non-equi
    (main.rs:255-265, reg :491).  Catalyst extracts equi-conjuncts for
    hash/SMJ and falls back to broadcast-nested-loop for pure non-equi —
    the same adaptivity as DataFusion's JoinSelection."""
    how, swap = _swap_for_right_variant(join_type)
    if swap:
        left, right = right, left
    cond = reduce(lambda a, b: a & b, list(on_exprs))
    return left.join(right, on=cond, how=how)


# ---- actions (execute the plan) -------------------------------------------

def df_count(df: DataFrame) -> int:
    """Row count — executes the plan (main.rs:543-550, reg :541)."""
    return df.count()


def df_collect(df: DataFrame):
    """Execute and materialize as Arrow — the same columnar format the
    reference returns (RecordBatches, main.rs:524-531).  Returns a
    ``pyarrow.Table``."""
    return df.toArrow()


def _render_rows(names: list, rows: list) -> str:
    """Driver-side grid renderer in Spark's ``show(truncate=False)`` shape.
    Purely local: no second JVM round-trip, and works for schemas
    ``createDataFrame`` rejects (e.g. a ``lit(None)`` NullType projection)."""
    def cell(v) -> str:
        return "NULL" if v is None else str(v)
    grid = [[cell(v) for v in row] for row in rows]
    widths = [max([len(n)] + [len(r[i]) for r in grid])
              for i, n in enumerate(names)]
    sep = "+" + "+".join("-" * w for w in widths) + "+"
    def line(vals) -> str:
        return "|" + "|".join(v.ljust(w) for v, w in zip(vals, widths)) + "|"
    return "\n".join([sep, line(names), sep] + [line(r) for r in grid] + [sep])


def df_show(df: DataFrame) -> None:
    """Print the ENTIRE result — the reference's show prints all rows
    (main.rs:552-559), unlike Spark's default 20.

    Executes the plan exactly once (collect), then formats the already-local
    rows on the driver — ``df.show(df.count())`` would run the whole plan
    twice, and re-uploading rows via ``createDataFrame`` costs a second JVM
    round-trip and fails on NullType columns."""
    rows = df.collect()
    print(_render_rows(list(df.columns), rows))


def df_show_limit(df: DataFrame, n: int) -> None:
    """Print first n rows (main.rs:561-568, reg :567)."""
    df.show(n)
