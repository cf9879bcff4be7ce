"""Expression surface — ``col``/``col+``/``col/and``/``case``/sort constructors.

Maps the reference's Steel-callable expression builders
(/root/reference/src/main.rs:38-141, registered main.rs:497-519) onto native
``pyspark.sql.Column``.  Expressions here stay 100% JVM-side (whole-stage
codegen) — no Python in the hot path.

Divergences from the reference, on purpose (SURVEY.md §4.1):
- ``col_lt`` computes a real ``<`` (reference's ``col<`` body calls ``.gt``,
  main.rs:66-68 — a bug we do not reproduce).
- ``lit`` is an extension: the reference registers no literal constructor
  (nothing in main.rs:478-521 produces one), which makes constant comparison
  impossible there; any usable engine needs it.
- ``col_div`` follows Spark semantics (``/`` always yields double).  DataFusion
  int/int is integer division; use ``col_idiv`` for that behavior explicitly.
"""

from __future__ import annotations

from functools import reduce


from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "col", "lit", "alias",
    "col_add", "col_sub", "col_mul", "col_div", "col_idiv",
    "col_and", "col_or", "col_not",
    "col_ge", "col_le", "col_gt", "col_lt", "col_eq", "col_ne",
    "col_like", "col_ilike", "col_not_like", "col_not_ilike",
    "CaseBuilder", "case", "when", "case_with_when", "case_otherwise", "case_end",
    "SortExpr", "sort_asc", "sort_desc",
]


def _c(x) -> Column:
    """Accept a Column or a Python literal (int/float/str/bool)."""
    return x if isinstance(x, Column) else F.lit(x)


def col(name: str) -> Column:
    """Column reference (main.rs:38-40, reg :497)."""
    return F.col(name)


def lit(value) -> Column:
    """Literal constructor — extension; absent from the reference surface."""
    return F.lit(value)


def alias(expr: Column, name: str) -> Column:
    """Rename an output expression (main.rs:42-44, reg :519)."""
    return expr.alias(name)


def _fold(op, exprs) -> Column:
    exprs = [_c(e) for e in exprs]
    if not exprs:
        raise ValueError("variadic column op requires at least one expression")
    return reduce(op, exprs)


def col_add(*exprs) -> Column:
    """Variadic left-fold ``+`` (main.rs:307-323, reg :498)."""
    return _fold(lambda a, b: a + b, exprs)


def col_sub(*exprs) -> Column:
    """Variadic left-fold ``-`` (main.rs:325-341, reg :499)."""
    return _fold(lambda a, b: a - b, exprs)


def col_mul(*exprs) -> Column:
    """Variadic left-fold ``*`` (main.rs:343-359, reg :500)."""
    return _fold(lambda a, b: a * b, exprs)


def col_div(*exprs) -> Column:
    """Variadic left-fold ``/`` — Spark semantics: always double
    (main.rs:361-377, reg :501).  DataFusion would do integer division for
    int/int; that divergence is documented, use :func:`col_idiv` to match it.
    """
    return _fold(lambda a, b: a / b, exprs)


def col_idiv(*exprs) -> Column:
    """Variadic integer division — DataFusion int/int division parity
    (truncates toward zero, like Arrow/Java)."""
    exprs = [_c(e) for e in exprs]
    if not exprs:
        raise ValueError("col_idiv requires at least one expression")
    out = exprs[0]
    for e in exprs[1:]:
        # a % b carries the sign of a (Java semantics), so (a - a%b)/b
        # truncates toward zero; the division is exact by construction.
        out = ((out - (out % e)) / e).cast("long")
    return out


def col_and(left, right) -> Column:
    """Boolean AND, SQL 3VL (main.rs:46-48, reg :502)."""
    return _c(left) & _c(right)


def col_or(left, right) -> Column:
    """Boolean OR, SQL 3VL (main.rs:50-52, reg :503)."""
    return _c(left) | _c(right)


def col_not(expr) -> Column:
    """Boolean NOT — extension (no in-tree binding; completes 3VL algebra)."""
    return ~_c(expr)


def col_ge(l, r) -> Column:
    """``>=`` (main.rs:58-60, reg :504)."""
    return _c(l) >= _c(r)


def col_le(l, r) -> Column:
    """``<=`` (main.rs:54-56, reg :505)."""
    return _c(l) <= _c(r)


def col_gt(l, r) -> Column:
    """``>`` (main.rs:62-64, reg :506)."""
    return _c(l) > _c(r)


def col_lt(l, r) -> Column:
    """``<`` — CORRECT, unlike the reference whose ``col<`` body calls ``.gt``
    (main.rs:66-68).  Divergence recorded in SURVEY.md §4.1."""
    return _c(l) < _c(r)


def col_eq(l, r) -> Column:
    """``=`` with SQL NULL semantics: NULL = NULL ⇒ NULL (main.rs:70-72)."""
    return _c(l) == _c(r)


def col_ne(l, r) -> Column:
    """``!=`` (main.rs:74-76, reg :509)."""
    return _c(l) != _c(r)


def col_like(l, pattern) -> Column:
    """SQL LIKE, case-sensitive, ``%``/``_`` wildcards (main.rs:78-80)."""
    return _like_impl(l, pattern, negate=False, ci=False)


def col_ilike(l, pattern) -> Column:
    """Case-insensitive LIKE (main.rs:82-84)."""
    return _like_impl(l, pattern, negate=False, ci=True)


def col_not_like(l, pattern) -> Column:
    """NOT LIKE (main.rs:86-88)."""
    return _like_impl(l, pattern, negate=True, ci=False)


def col_not_ilike(l, pattern) -> Column:
    """NOT ILIKE (main.rs:90-92)."""
    return _like_impl(l, pattern, negate=True, ci=True)


def _like_impl(l, pattern, negate: bool, ci: bool) -> Column:
    lc = _c(l)
    # Column.like requires a str literal; the reference accepts any expr
    # (main.rs:78: Expr::like).  For column patterns use the SQL operator.
    if isinstance(pattern, str):
        out = lc.ilike(pattern) if ci else lc.like(pattern)
    else:
        pc = _c(pattern)
        if ci:
            out = F.lower(lc).like(F.lower(pc))  # column-pattern ilike
        else:
            out = lc.like(pc)
    return ~out if negate else out


class CaseBuilder:
    """CASE-expression builder (main.rs:110-135, reg :514-518).

    Two forms, as in DataFusion:
      - simple case:   ``case(base).with_when(v, t)...``  → CASE base WHEN v THEN t
      - searched case: ``when(cond, t).with_when(c2, t2)`` → CASE WHEN cond THEN t
    ``end()`` closes without ELSE (missing arm ⇒ NULL — identical in Spark);
    ``otherwise(e)`` closes with ELSE.
    """

    def __init__(self, base: Column | None, arms: list[tuple[Column, Column]]):
        self._base = base
        self._arms = arms

    def with_when(self, when_expr, then_expr) -> "CaseBuilder":
        return CaseBuilder(self._base, self._arms + [(_c(when_expr), _c(then_expr))])

    def _build(self) -> Column:
        if not self._arms:
            raise ValueError("CASE requires at least one WHEN arm")
        out: Column | None = None
        for when_expr, then_expr in self._arms:
            cond = (self._base == when_expr) if self._base is not None else when_expr
            out = F.when(cond, then_expr) if out is None else out.when(cond, then_expr)
        return out

    def otherwise(self, else_expr) -> Column:
        return self._build().otherwise(_c(else_expr))

    def end(self) -> Column:
        return self._build()  # Spark defaults missing ELSE to NULL — parity


def case(base_expr) -> CaseBuilder:
    """Start a simple CASE on a base expression (main.rs:114-116, reg :514)."""
    return CaseBuilder(_c(base_expr), [])


def when(when_expr, then_expr) -> CaseBuilder:
    """Start a searched CASE (main.rs:118-120, reg :515)."""
    return CaseBuilder(None, [(_c(when_expr), _c(then_expr))])


def case_with_when(builder: CaseBuilder, when_expr, then_expr) -> CaseBuilder:
    """Append a WHEN arm (main.rs:122-124, reg :517)."""
    return builder.with_when(when_expr, then_expr)


def case_otherwise(builder: CaseBuilder, else_expr) -> Column:
    """Close with ELSE (main.rs:126-131, reg :518)."""
    return builder.otherwise(else_expr)


def case_end(builder: CaseBuilder) -> Column:
    """Close without ELSE ⇒ NULL for unmatched rows (main.rs:133-135)."""
    return builder.end()


class SortExpr:
    """Sort expression: expr + asc/desc + nulls-first/last
    (reference ``SSortExpr``, main.rs:95-97; constructor never registered —
    we expose the intended surface per SURVEY.md §4.1)."""

    def __init__(self, expr: Column, asc: bool = True, nulls_first: bool | None = None):
        self.expr = _c(expr)
        self.asc = asc
        # DataFusion defaults: ASC ⇒ NULLS LAST, DESC ⇒ NULLS FIRST
        self.nulls_first = (not asc) if nulls_first is None else nulls_first

    def to_column(self) -> Column:
        if self.asc:
            return self.expr.asc_nulls_first() if self.nulls_first else self.expr.asc_nulls_last()
        return self.expr.desc_nulls_first() if self.nulls_first else self.expr.desc_nulls_last()


def sort_asc(expr, nulls_first: bool | None = None) -> SortExpr:
    """Ascending sort key; DataFusion default NULLS LAST for asc."""
    return SortExpr(expr, asc=True, nulls_first=nulls_first)


def sort_desc(expr, nulls_first: bool | None = None) -> SortExpr:
    """Descending sort key; DataFusion default NULLS FIRST for desc."""
    return SortExpr(expr, asc=False, nulls_first=nulls_first)
