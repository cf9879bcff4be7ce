"""Data-quality expectations: declarative table checks as one scan.

Beyond-reference surface (the dbt-test / Great-Expectations shape): a
pipeline writing 100 TB of curated training data needs machine-checkable
gates between stages — null fractions, value ranges, key uniqueness,
referential containment — and it needs them CHEAP: every check below
compiles into either the same single pass over the table (one
partial→final aggregate evaluating all row-level rules at once) or one
key-count aggregate (uniqueness) / one broadcast anti-join probe
(foreign-key containment).

Rule kinds:
- ``("not_null", col)`` — count of NULLs.
- ``("unique", col)`` — rows carrying a duplicated value (NULLs ignored).
- ``("range", col, lo, hi)`` — values outside [lo, hi] (NULL passes;
  pair with not_null to forbid).
- ``("in_set", col, [v, ...])`` — values outside the allowed set.
- ``("matches", col, regex)`` — non-matching strings.
- ``("fk", col, other_df/other_table, other_col)`` — values with no match
  in the referenced column (NULLs pass, SQL FK semantics).

Returns one row per rule: (rule, col_name, n_rows, n_violations 0 ⇒ ok,
ok boolean) — exact integers, fully oracle-checkable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["validate_expectations", "sql_validate_expectations"]


def _violation(df: DataFrame, rule: tuple) -> tuple[str, str, Column]:
    kind, col = rule[0], rule[1]
    c = F.col(col)
    if kind == "not_null":
        return kind, col, c.isNull()
    if kind == "range":
        lo, hi = rule[2], rule[3]
        return kind, col, c.isNotNull() & ((c < lo) | (c > hi))
    if kind == "in_set":
        return kind, col, c.isNotNull() & ~c.isin(list(rule[2]))
    if kind == "matches":
        return kind, col, c.isNotNull() & ~c.rlike(rule[2])
    raise ValueError(f"unknown row-level rule kind {kind!r}")


def validate_expectations(df: DataFrame,
                          rules: Sequence[tuple]) -> DataFrame:
    """Evaluate ``rules`` against ``df``; see module docstring for kinds.

    Plan: all row-level rules fold into ONE pass (a single aggregate of
    conditional counts — adding a rule adds a column, not a scan); each
    ``unique`` rule costs one count-aggregate on its key (the groupBy a
    real uniqueness check cannot avoid); each ``fk`` rule is one
    left-anti probe against the DISTINCT referenced keys (broadcast when
    small).  Nothing collects."""
    row_rules = [r for r in rules if r[0] in
                 ("not_null", "range", "in_set", "matches")]
    out = None
    if row_rules:
        aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
        for i, r in enumerate(row_rules):
            _, _, viol = _violation(df, r)
            aggs.append(F.sum(F.when(viol, 1).otherwise(0))
                        .cast("long").alias(f"v{i}"))
        wide = df.agg(*aggs)
        structs = [F.struct(
            F.lit(r[0]).alias("rule"), F.lit(r[1]).alias("col_name"),
            F.col("n_rows"), F.col(f"v{i}").alias("n_violations"))
            for i, r in enumerate(row_rules)]
        out = (wide.select(F.explode(F.array(*structs)).alias("s"))
               .select("s.*"))
    for r in rules:
        if r[0] == "unique":
            col = r[1]
            dup = (df.filter(F.col(col).isNotNull())
                   .groupBy(col).agg(F.count(F.lit(1)).alias("_c")))
            rep = dup.agg(
                F.coalesce(F.sum("_c"), F.lit(0)).cast("long")
                .alias("n_rows"),
                F.coalesce(F.sum(F.when(F.col("_c") > 1, F.col("_c"))
                                 .otherwise(0)), F.lit(0)).cast("long")
                .alias("n_violations"),
            ).select(F.lit("unique").alias("rule"),
                     F.lit(col).alias("col_name"), "n_rows", "n_violations")
            out = rep if out is None else out.unionByName(rep)
        elif r[0] == "fk":
            from ..cache import track

            col, other, other_col = r[1], r[2], r[3]
            keys = other.select(F.col(other_col).alias("_k")).distinct()
            # `present` feeds both the row count and the anti-probe —
            # persisted, the fact table is scanned once for the fk rule
            present = track(df.filter(F.col(col).isNotNull())
                            .select(col).persist())
            miss = present.join(F.broadcast(keys),
                                present[col] == F.col("_k"), "left_anti")
            rep = (present.agg(F.count(F.lit(1)).cast("long")
                               .alias("n_rows"))
                   .crossJoin(miss.agg(F.count(F.lit(1)).cast("long")
                                       .alias("n_violations")))
                   .select(F.lit("fk").alias("rule"),
                           F.lit(col).alias("col_name"),
                           "n_rows", "n_violations"))
            out = rep if out is None else out.unionByName(rep)
        elif r[0] not in ("not_null", "range", "in_set", "matches"):
            raise ValueError(f"unknown rule kind {r[0]!r}")
    if out is None:
        raise ValueError("rules must be non-empty")
    return out.select("rule", "col_name", "n_rows", "n_violations",
                      (F.col("n_violations") == 0).alias("ok")) \
        .orderBy("rule", "col_name")


def _sql_lit(v) -> str:
    return f"'{v}'" if isinstance(v, str) else repr(v)


def sql_validate_expectations(table: str, rules: Sequence[tuple]) -> str:
    """DuckDB mirror of :func:`validate_expectations`.  ``fk`` rules name
    the referenced table as a string in slot 2."""
    parts = []
    for r in rules:
        kind, col = r[0], r[1]
        if kind == "not_null":
            viol = f"{col} IS NULL"
        elif kind == "range":
            viol = (f"{col} IS NOT NULL AND ({col} < {_sql_lit(r[2])} "
                    f"OR {col} > {_sql_lit(r[3])})")
        elif kind == "in_set":
            vals = ", ".join(_sql_lit(v) for v in r[2])
            viol = f"{col} IS NOT NULL AND {col} NOT IN ({vals})"
        elif kind == "matches":
            viol = (f"{col} IS NOT NULL AND "
                    f"NOT regexp_matches({col}, '{r[2]}')")
        elif kind == "unique":
            parts.append(f"""
SELECT 'unique' AS rule, '{col}' AS col_name,
  coalesce(SUM(c), 0)::BIGINT AS n_rows,
  coalesce(SUM(CASE WHEN c > 1 THEN c ELSE 0 END), 0)::BIGINT
    AS n_violations
FROM (SELECT COUNT(*) AS c FROM {table}
      WHERE {col} IS NOT NULL GROUP BY {col}) t""")
            continue
        elif kind == "fk":
            other, other_col = r[2], r[3]
            parts.append(f"""
SELECT 'fk' AS rule, '{col}' AS col_name,
  COUNT(*)::BIGINT AS n_rows,
  CAST(SUM(CASE WHEN {other_col}_m IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_violations
FROM (SELECT l.{col}, r.{other_col} AS {other_col}_m
      FROM {table} l LEFT JOIN
        (SELECT DISTINCT {other_col} FROM {other}) r
        ON l.{col} = r.{other_col}
      WHERE l.{col} IS NOT NULL) j""")
            continue
        else:
            raise ValueError(f"unknown rule kind {kind!r}")
        parts.append(f"""
SELECT '{kind}' AS rule, '{col}' AS col_name,
  COUNT(*)::BIGINT AS n_rows,
  CAST(SUM(CASE WHEN {viol} THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
FROM {table}""")
    union = "\nUNION ALL\n".join(parts)
    return (f"SELECT rule, col_name, n_rows, n_violations, "
            f"n_violations = 0 AS ok FROM ({union}) u "
            f"ORDER BY rule, col_name")
