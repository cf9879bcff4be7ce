"""Change-data-capture over corpus snapshots: snapshot diff + SCD2 merge.

Beyond-reference surface for the LLM-training-data north star.  A crawl
pipeline re-lands the corpus periodically; the questions downstream are
"what changed since the last snapshot?" (incremental re-processing: only
diff rows re-enter dedup/scoring) and "what did the corpus look like at
batch N?" (reproducible training sets).  Two operators:

- **snapshot_diff** — full-outer key join of two snapshots with a row
  fingerprint over the compared columns; every key is classified
  ``insert`` / ``delete`` / ``update`` / ``unchanged``.  This is the
  MERGE-source shape: the changelog is exactly what a writer needs to
  upsert (and what ``sources.readers.merge_upsert`` consumes).
- **scd2_init / scd2_apply** — slowly-changing-dimension type 2 over
  integer batch ids: applying a new snapshot closes the current version of
  updated/deleted keys (``valid_to = batch_id``) and opens new versions for
  inserted/updated keys (``valid_from = batch_id``, ``valid_to = NULL``).
  Batch ids, not wall-clock timestamps, keep the operator deterministic
  and the oracle reproducible.

Determinism / oracle parity: the fingerprint is md5 over a unit-separator
join of the compared columns cast to string (NULL → a distinct sentinel),
identical in DuckDB as md5(concat_ws(chr(31), coalesce(c::VARCHAR,
chr(0)), ...)).  Keep float columns out of ``compare_cols`` (string
renderings differ across engines); ints/strings/dates are stable.

Scale notes: both operators are a single key-partitioned join — the plan
at 100 TB is a sort-merge join on the snapshot key, shuffle-free when both
snapshots are bucketed by key (``sources.bucketing``).  Nothing collects,
nothing broadcasts except Catalyst's own choice when one side is small;
the SCD2 history table only ever grows by the changelog, never rewrites
unchanged rows' columns.

No counterpart in the reference (src/main.rs has no mutation surface);
this extends the upsert sink (readers.py merge_upsert) with the read-side
machinery a snapshot pipeline needs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "row_fingerprint", "snapshot_diff", "scd2_init", "scd2_apply",
    "sql_row_fingerprint", "sql_snapshot_diff",
    "agg_state", "merge_agg_state", "sql_agg_state",
]

_US = "\x1f"   # unit separator between fields
_NULL = "\x00" # NULL sentinel (distinct from empty string)


def row_fingerprint(cols: Sequence[str]) -> Column:
    """md5 fingerprint over the given columns; NULL-safe and
    concatenation-unambiguous (fields joined by 0x1F, NULL → 0x00)."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols]
    return F.md5(F.concat_ws(_US, *parts))


def sql_row_fingerprint(cols: Sequence[str]) -> str:
    parts = ", ".join(f"coalesce(({c})::VARCHAR, chr(0))" for c in cols)
    return f"md5(concat_ws(chr(31), {parts}))"


def snapshot_diff(
    old: DataFrame, new: DataFrame, key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Changelog between two snapshots of a keyed table.

    Returns one row per key present in either side:
    ``(*key_cols, change_type, old_fp, new_fp)`` with change_type in
    {'insert','delete','update','unchanged'}.  ``compare_cols`` defaults to
    every shared non-key column.

    Plan: project-to-fingerprint on each side (map-only, column-pruned
    scan) → one full-outer equi-join on the key.  No other shuffle.
    """
    keys = list(key_cols)
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in keys]
    o = old.select(*keys, row_fingerprint(compare_cols).alias("old_fp"))
    n = new.select(*keys, row_fingerprint(compare_cols).alias("new_fp"))
    joined = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("old_fp").isNull(), F.lit("insert"))
        .when(F.col("new_fp").isNull(), F.lit("delete"))
        .when(F.col("old_fp") == F.col("new_fp"), F.lit("unchanged"))
        .otherwise(F.lit("update"))
    )
    return joined.select(*keys, change.alias("change_type"),
                         "old_fp", "new_fp")


def sql_snapshot_diff(old_rel: str, new_rel: str, key_cols: Sequence[str],
                      compare_cols: Sequence[str],
                      prefix: str = "cdc") -> str:
    """DuckDB CTE body mirroring snapshot_diff; exposes ``{prefix}_diff``
    with the same columns.  ``old_rel``/``new_rel`` are existing relation
    names."""
    keys = list(key_cols)
    fp = sql_row_fingerprint(compare_cols)
    key_sel = ", ".join(f"coalesce(o.{k}, n.{k}) AS {k}" for k in keys)
    on = " AND ".join(f"o.{k} = n.{k}" for k in keys)
    return f"""
{prefix}_o AS (SELECT {', '.join(keys)}, {fp} AS old_fp FROM {old_rel}),
{prefix}_n AS (SELECT {', '.join(keys)}, {fp} AS new_fp FROM {new_rel}),
{prefix}_diff AS (
  SELECT {key_sel},
    CASE WHEN o.old_fp IS NULL THEN 'insert'
         WHEN n.new_fp IS NULL THEN 'delete'
         WHEN o.old_fp = n.new_fp THEN 'unchanged'
         ELSE 'update' END AS change_type,
    o.old_fp, n.new_fp
  FROM {prefix}_o o FULL OUTER JOIN {prefix}_n n ON {on}
)"""


def scd2_init(df: DataFrame, batch_id: int = 0) -> DataFrame:
    """Bootstrap an SCD2 dimension from an initial snapshot: every row is
    the current version, valid from ``batch_id``."""
    return df.withColumn("valid_from", F.lit(batch_id).cast("long")) \
             .withColumn("valid_to", F.lit(None).cast("long"))


def scd2_apply(
    dim: DataFrame, batch: DataFrame, key_cols: Sequence[str],
    batch_id: int, compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Apply snapshot ``batch`` to an SCD2 dimension at ``batch_id``.

    ``dim`` carries the batch's columns plus ``valid_from``/``valid_to``
    (NULL valid_to = current).  Updated and deleted keys get their current
    version closed (``valid_to = batch_id``); inserted and updated keys get
    a new open version.  Unchanged keys and already-closed history pass
    through untouched — re-applying the same batch is a no-op (idempotent).

    Plan: one snapshot_diff join (key-partitioned) + one broadcast-or-SMJ
    join of the changelog back onto the current slice + a union with the
    immutable history.  The history slice is never joined at all — at
    100 TB only the current partitions participate in any shuffle, which is
    what makes periodic re-snapshots affordable.
    """
    keys = list(key_cols)
    attr_cols = [c for c in dim.columns
                 if c not in ("valid_from", "valid_to")]
    if compare_cols is None:
        compare_cols = [c for c in attr_cols
                        if c not in keys and c in set(batch.columns)]
    current = dim.filter(F.col("valid_to").isNull())
    history = dim.filter(F.col("valid_to").isNotNull())

    diff = snapshot_diff(current.select(*[c for c in attr_cols]),
                         batch, keys, compare_cols)
    changes = diff.select(*keys, "change_type")

    cur = current.join(changes, keys, "left")
    closed_or_kept = cur.select(
        *attr_cols, "valid_from",
        F.when(F.col("change_type").isin("update", "delete"),
               F.lit(batch_id).cast("long"))
        .otherwise(F.lit(None).cast("long")).alias("valid_to"))

    missing = [c for c in attr_cols if c not in set(batch.columns)]
    if missing:
        raise ValueError(f"batch is missing dimension columns: {missing}")
    opened = (batch.join(
        changes.filter(F.col("change_type").isin("insert", "update")),
        keys, "inner")
        .select(*attr_cols,
                F.lit(batch_id).cast("long").alias("valid_from"),
                F.lit(None).cast("long").alias("valid_to")))

    out_cols = attr_cols + ["valid_from", "valid_to"]
    return (history.select(*out_cols)
            .unionByName(closed_or_kept.select(*out_cols))
            .unionByName(opened.select(*out_cols)))


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance (materialized-view merge)
# ---------------------------------------------------------------------------

def agg_state(df: DataFrame, key_cols: Sequence[str],
              value_col: str) -> DataFrame:
    """Mergeable per-key aggregate state over ``value_col``: (keys..., n,
    s, mn, mx) with the sum carried as an exact DECIMAL(30,9) of
    9dp-rounded inputs (each input fits (20,9); the sum gets 10 more
    integer digits, so a standing view absorbs ~10^21 worth of 9dp values
    before overflow — wide enough for a 100 TB view under ANSI mode) —
    order-independent, so states built from any partitioning of the data
    merge to identical bits.  This is the partial half of every
    distributive aggregate (count/sum/min/max, avg derives as s/n) — the
    representation a materialized view stores so a snapshot delta can
    refresh it WITHOUT rescanning history."""
    return df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col(value_col), 9).cast("decimal(20,9)"))
        .cast("decimal(30,9)").alias("s"),
        F.min(F.col(value_col).cast("double")).alias("mn"),
        F.max(F.col(value_col).cast("double")).alias("mx"))


def merge_agg_state(state: DataFrame, delta: DataFrame,
                    key_cols: Sequence[str]) -> DataFrame:
    """Merge two ``agg_state`` frames (the standing view + a delta batch)
    into the state the full rescan would have produced: counts and sums
    add, min/max fold — one full-outer join keyed on the view key, which
    is shuffle-free when both sides are bucketed on it (the view IS a
    managed table in practice; sources/bucketing.py layout).  History is
    never rescanned: refresh cost is O(|delta| + |touched keys|), the
    whole point of maintaining state instead of recomputing."""
    s, d = state.alias("s"), delta.alias("d")
    cond = [s[k].eqNullSafe(d[k]) for k in key_cols]
    keys = [F.coalesce(s[k], d[k]).alias(k) for k in key_cols]
    return s.join(d, cond, "full_outer").select(
        *keys,
        (F.coalesce(s["n"], F.lit(0)) + F.coalesce(d["n"], F.lit(0)))
        .cast("long").alias("n"),
        (F.coalesce(s["s"], F.lit(0).cast("decimal(30,9)"))
         + F.coalesce(d["s"], F.lit(0).cast("decimal(30,9)")))
        .cast("decimal(30,9)").alias("s"),
        F.least(F.coalesce(s["mn"], d["mn"]),
                F.coalesce(d["mn"], s["mn"])).alias("mn"),
        F.greatest(F.coalesce(s["mx"], d["mx"]),
                   F.coalesce(d["mx"], s["mx"])).alias("mx"))


def sql_agg_state(table: str, key_cols: Sequence[str],
                  value_col: str) -> str:
    """DuckDB mirror of ``agg_state`` (same decimal convention)."""
    keys = ", ".join(key_cols)
    return f"""
SELECT {keys}, COUNT(*)::BIGINT AS n,
  SUM(round({value_col}, 9)::DECIMAL(20,9))::DECIMAL(30,9) AS s,
  MIN({value_col}::DOUBLE) AS mn, MAX({value_col}::DOUBLE) AS mx
FROM {table} GROUP BY {keys}
"""
