"""Z-order (Morton-curve) data layout — multi-dimensional data skipping.

At 100 TB a point/range query's cost is decided before the first task
runs, by which FILES the scan can skip.  Sorting by one column gives
perfect min/max pruning on that column and none on any other; interleaving
the bits of several columns' bucket ranks (the Z-order / Morton curve)
gives every interleaved column *partial* locality, so a file's min/max
envelope is narrow in ALL of them — the layout trick behind Delta Lake's
``OPTIMIZE ZORDER BY`` and ClickHouse/Databricks multi-dim clustering,
re-expressed as plain DataFrame arithmetic:

1. ``zorder_key``: equi-width bucket each column from its global min/max
   (one 1-row aggregation, broadcast — bucketing is a pure map after
   that), then bit-interleave the buckets into a single long.
2. ``write_zordered``: repartitionByRange on the key + sortWithinPartitions
   → each output file owns a contiguous Z-range = a small axis-aligned
   cell stack in value space.  No global sort materializes; the range
   exchange samples the key like any ORDER BY write.
3. ``zorder_skipping_stats``: the analytic counterpart — group rows into
   Z-cells (key >> shift ≡ a file's worth of curve) vs one-column cells,
   compute each cell's min/max envelope per dimension, and report how many
   cells a rectangle predicate MUST touch under each layout.  Pure exact
   arithmetic → fully DuckDB-oracle-checkable, and the honest way to show
   the pruning win without depending on local parquet file sizes.

Equi-width bucketing is deliberate: it needs only min/max (exact,
reproducible, one broadcast row) where equi-depth needs approximate
quantiles (engine-specific).  Heavily skewed columns should be
pre-transformed (ln, rank) by the caller — documented, not hidden.

Scale: every step is a map over the rows plus one 1-row stats aggregation;
the stats report shuffles on the cell id (bounded domain ≤ 2^(bits·dims) /
2^shift).  Nothing collects to the driver.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "zorder_key", "write_zordered", "zorder_skipping_stats",
    "sql_zorder_skipping_stats",
    "list_data_files", "plan_compaction", "compaction_summary",
    "sql_plan_compaction",
]


def _interleave(buckets: list[Column], bits: int) -> Column:
    """Morton interleave: bit j of bucket i lands at position j*dims + i."""
    dims = len(buckets)
    parts = []
    for i, b in enumerate(buckets):
        for j in range(bits):
            parts.append(
                F.shiftleft(F.shiftright(b, j).bitwiseAND(F.lit(1)),
                            j * dims + i))
    return functools.reduce(operator.add, parts).cast("long")


def _sql_interleave(buckets: list[str], bits: int) -> str:
    dims = len(buckets)
    parts = []
    for i, b in enumerate(buckets):
        for j in range(bits):
            parts.append(f"(((({b}) >> {j}) & 1) << {j * dims + i})")
    return "(" + " + ".join(parts) + ")"


def _bucket(x: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Equi-width bucket in [0, 2^bits): floor((x-mn)/(mx-mn) · 2^bits),
    clamped; degenerate span (mn = mx) buckets to 0."""
    n = 1 << bits
    raw = F.floor((x.cast("double") - mn) / (mx - mn) * F.lit(float(n)))
    return F.when(mx == mn, F.lit(0)) \
        .otherwise(F.least(F.lit(n - 1), F.greatest(F.lit(0), raw))) \
        .cast("long")


def _sql_bucket(x: str, mn: str, mx: str, bits: int) -> str:
    n = 1 << bits
    raw = f"floor(({x}::DOUBLE - {mn}) / ({mx} - {mn}) * {float(n)})"
    return (f"CASE WHEN {mx} = {mn} THEN 0 "
            f"ELSE least({n - 1}, greatest(0, {raw})) END::BIGINT")


def zorder_key(df: DataFrame, cols: list[str], bits: int = 8) -> DataFrame:
    """Append ``zkey`` (Morton-interleaved equi-width bucket ranks) and the
    per-column ``_b_<col>`` buckets.  One 1-row min/max aggregation joins
    back as a broadcast; the key itself is a pure projection."""
    if not cols:
        raise ValueError("cols must be non-empty")
    if not 1 <= bits * len(cols) <= 62:
        raise ValueError(f"bits*dims must fit a long, got {bits}*{len(cols)}")
    stats = df.agg(*[f for c in cols for f in (
        F.min(F.col(c).cast("double")).alias(f"_mn_{c}"),
        F.max(F.col(c).cast("double")).alias(f"_mx_{c}"))])
    out = df.crossJoin(F.broadcast(stats))
    buckets = []
    for c in cols:
        b = _bucket(F.col(c), F.col(f"_mn_{c}"), F.col(f"_mx_{c}"), bits)
        out = out.withColumn(f"_b_{c}", b)
        buckets.append(F.col(f"_b_{c}"))
    out = out.withColumn("zkey", _interleave(buckets, bits))
    return out.drop(*[f"_mn_{c}" for c in cols], *[f"_mx_{c}" for c in cols])


def write_zordered(
    df: DataFrame, path: str, cols: list[str], n_files: int = 8,
    bits: int = 8,
) -> None:
    """Write ``df`` parquet clustered on the Z-curve of ``cols``:
    repartitionByRange(zkey) → contiguous Z-ranges per file (the exchange
    SAMPLES the key — no global sort) + sortWithinPartitions so row-group
    stats are tight inside each file too."""
    keyed = zorder_key(df, cols, bits).drop(*[f"_b_{c}" for c in cols])
    (keyed.repartitionByRange(n_files, "zkey")
     .sortWithinPartitions("zkey")
     .drop("zkey")
     .write.mode("overwrite").parquet(path))


def zorder_skipping_stats(
    df: DataFrame, cols: list[str], predicates: list[tuple[str, dict]],
    bits: int = 8, shift: int | None = None,
) -> DataFrame:
    """Analytic pruning report: for each named rectangle predicate
    ``(pred_name, {col: (lo_frac, hi_frac)})`` (bounds as fractions of each
    column's global span), and for each candidate layout — ``zorder`` (cells
    = zkey >> shift) plus one single-column layout per clustered column
    (cells = that column's bucket) — count how many cells the predicate's
    rectangle intersects, i.e. how many files a min/max-pruning scan MUST
    read.  Returns (pred_name, layout, n_cells, cells_hit, rows_hit,
    hit_frac) — exact integers + a 6dp ratio, ordered, hash-checkable.

    A cell "intersects" when its per-dimension [min,max] bucket envelope
    overlaps the predicate's bucket rectangle — precisely the file-skipping
    decision parquet/iceberg make from footer stats."""
    from ..cache import track

    dims = len(cols)
    if shift is None:
        # coarse cells: keep ~2^(bits) cells for the z layout
        shift = max(0, bits * dims - bits)
    # every (predicate, layout) report re-reads the bucketed relation —
    # persisted, the input is scanned and bucketed ONCE instead of
    # |predicates|·(dims+1) times
    keyed = track(zorder_key(df, cols, bits).persist())
    layouts = [("zorder", F.shiftright(F.col("zkey"), shift))]
    for c in cols:
        layouts.append((f"linear_{c}", F.col(f"_b_{c}")))
    n = 1 << bits
    out = None
    for pred_name, rect in predicates:
        conds = []
        for c, (lo, hi) in rect.items():
            lo_b, hi_b = int(lo * n), min(n - 1, int(hi * n))
            conds.append((c, lo_b, hi_b))
        for layout_name, cell in layouts:
            cells = keyed.groupBy(cell.alias("cell")).agg(
                F.count(F.lit(1)).alias("n_rows"),
                *[f for c, _, _ in conds for f in (
                    F.min(f"_b_{c}").alias(f"_cmn_{c}"),
                    F.max(f"_b_{c}").alias(f"_cmx_{c}"))])
            hit = functools.reduce(
                operator.and_,
                [(F.col(f"_cmx_{c}") >= lo_b) & (F.col(f"_cmn_{c}") <= hi_b)
                 for c, lo_b, hi_b in conds])
            rep = cells.agg(
                F.count(F.lit(1)).alias("n_cells"),
                F.sum(F.when(hit, 1).otherwise(0)).alias("cells_hit"),
                F.sum(F.when(hit, F.col("n_rows")).otherwise(0))
                .alias("rows_hit"),
            ).select(
                F.lit(pred_name).alias("pred_name"),
                F.lit(layout_name).alias("layout"),
                "n_cells", "cells_hit", "rows_hit",
                F.round(F.col("cells_hit") / F.col("n_cells"), 6)
                .alias("hit_frac"))
            out = rep if out is None else out.unionByName(rep)
    return out.orderBy("pred_name", "layout")


def sql_zorder_skipping_stats(
    table: str, cols: list[str], predicates: list[tuple[str, dict]],
    bits: int = 8, shift: int | None = None,
) -> str:
    """DuckDB mirror of :func:`zorder_skipping_stats` (same bucket and
    interleave arithmetic, same clamps — hash-oracle exact)."""
    dims = len(cols)
    if shift is None:
        shift = max(0, bits * dims - bits)
    n = 1 << bits
    mnmx = ", ".join(
        f"min({c}::DOUBLE) AS mn_{c}, max({c}::DOUBLE) AS mx_{c}"
        for c in cols)
    bexprs = ", ".join(
        f"{_sql_bucket(c, f'mn_{c}', f'mx_{c}', bits)} AS b_{c}"
        for c in cols)
    z = _sql_interleave([f"b_{c}" for c in cols], bits)
    selects = []
    for pred_name, rect in predicates:
        conds = []
        for c, (lo, hi) in rect.items():
            conds.append((c, int(lo * n), min(n - 1, int(hi * n))))
        layouts = [("zorder", f"(zkey >> {shift})")]
        layouts += [(f"linear_{c}", f"b_{c}") for c in cols]
        for layout_name, cell in layouts:
            hit = " AND ".join(
                f"(cmx_{c} >= {lo_b} AND cmn_{c} <= {hi_b})"
                for c, lo_b, hi_b in conds)
            env = ", ".join(
                f"min(b_{c}) AS cmn_{c}, max(b_{c}) AS cmx_{c}"
                for c, _, _ in conds)
            selects.append(f"""
SELECT '{pred_name}' AS pred_name, '{layout_name}' AS layout,
  COUNT(*)::BIGINT AS n_cells,
  CAST(SUM(CASE WHEN {hit} THEN 1 ELSE 0 END) AS BIGINT) AS cells_hit,
  CAST(SUM(CASE WHEN {hit} THEN n_rows ELSE 0 END) AS BIGINT) AS rows_hit,
  round(SUM(CASE WHEN {hit} THEN 1 ELSE 0 END)::DOUBLE / COUNT(*), 6)
    AS hit_frac
FROM (SELECT {cell} AS cell, COUNT(*) AS n_rows, {env}
      FROM zo_keyed GROUP BY 1) cells""")
    union = "\nUNION ALL\n".join(selects)
    return f"""
WITH zo_stats AS (SELECT {mnmx} FROM {table}),
zo_buckets AS (SELECT {bexprs} FROM {table}, zo_stats),
zo_keyed AS (SELECT *, {z} AS zkey FROM zo_buckets)
{union}
ORDER BY pred_name, layout
"""


# ---------------------------------------------------------------------------
# Small-file compaction planning (OPTIMIZE / bin-packing shape)
# ---------------------------------------------------------------------------

def list_data_files(spark, path: str, suffix: str = ".parquet"):
    """(path, size_bytes) listing of a table directory through the JVM
    Hadoop FileSystem API — the same interface Spark's own scans use, so
    it works unchanged for local paths, HDFS, and object stores.  Driver-
    side by design: a table's FILE listing is metadata (thousands of
    rows), not data; at real scale you'd read the same facts from a
    manifest/metastore, and this returns a DataFrame so the planner below
    is agnostic to where the listing came from."""
    sc = spark.sparkContext
    jvm = sc._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
    out = []
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath().toString()
        if p.endswith(suffix):
            out.append((p, int(st.getLen())))
    return spark.createDataFrame(out, "path string, size_bytes long")


def plan_compaction(
    files: DataFrame, target_bytes: int,
    min_file_bytes: int | None = None,
    partition_col: str | None = None,
    path_col: str = "path", size_col: str = "size_bytes",
) -> DataFrame:
    """Compaction plan over a file listing — the small-file half of Delta
    Lake's ``OPTIMIZE`` as a pure DataFrame op: files already at least
    ``min_file_bytes`` (default ``target_bytes // 2``) are kept as-is;
    the rest greedily pack into bins of ~``target_bytes`` within their
    partition (largest-first, path tie-break — a total order, so the
    plan is a pure function of the listing).

    Output: (partition?, path, size_bytes, action, bin_id) where action
    is 'keep' | 'compact' and bin_id numbers the rewrite groups within
    each partition (NULL for kept files).  A bin overshoots the target by
    at most one file — the classic streaming bin-pack bound.

    Plan / scale: one window over (partition, size desc, path) — a
    listing is metadata (|files| rows, not |rows|), so even a million-file
    lake is a few MB through one exchange keyed on the partition column;
    nothing touches the data files themselves.  The rewrite executor is
    ``spark.read.parquet(bin_files).repartition(1).write`` per bin —
    embarrassingly parallel across bins."""
    from pyspark.sql import Window

    if min_file_bytes is None:
        min_file_bytes = target_bytes // 2
    part = [partition_col] if partition_col else []
    small = F.col(size_col) < F.lit(min_file_bytes)
    w = (Window.partitionBy(*part)
         .orderBy(F.col(size_col).desc(), F.col(path_col).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum(F.when(small, F.col(size_col)).otherwise(0)).over(w)
    # integer `div`, not double-divide-then-floor: past 2^53 cumulative
    # bytes the double mantissa rounds and the DuckDB mirror's exact `//`
    # would assign a different bin
    staged = files.select(*part, path_col, size_col,
                          cum.cast("long").alias("_cum"))
    bin_id = F.expr(f"(_cum - {size_col}) div {int(target_bytes)}")
    return staged.select(
        *part, path_col, size_col,
        F.when(small, F.lit("compact")).otherwise(F.lit("keep"))
        .alias("action"),
        F.when(small, bin_id).cast("long").alias("bin_id"))


def compaction_summary(
    files: DataFrame, target_bytes: int,
    min_file_bytes: int | None = None,
    partition_col: str | None = None,
    path_col: str = "path", size_col: str = "size_bytes",
) -> DataFrame:
    """Per-partition rollup of ``plan_compaction``: file counts before
    and after, small-file count and bytes, and the number of rewrite
    bins — the report a table-maintenance job logs before rewriting."""
    plan = plan_compaction(files, target_bytes, min_file_bytes,
                           partition_col, path_col, size_col)
    part = [partition_col] if partition_col else [F.lit(1).alias("_all")]
    is_small = F.col("action") == "compact"
    out = (plan.groupBy(*part).agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(F.when(is_small, 1).otherwise(0)).cast("long")
        .alias("n_small"),
        F.sum(F.when(is_small, F.col(size_col)).otherwise(0)).cast("long")
        .alias("small_bytes"),
        F.countDistinct(F.when(is_small, F.col("bin_id"))).cast("long")
        .alias("n_bins")))
    out = out.withColumn(
        "n_files_after",
        (F.col("n_files") - F.col("n_small") + F.col("n_bins"))
        .cast("long"))
    return out if partition_col else out.drop("_all")


def sql_plan_compaction(
    files_rel: str, target_bytes: int,
    min_file_bytes: int | None = None,
    partition_col: str | None = None,
    path_col: str = "path", size_col: str = "size_bytes",
) -> str:
    """DuckDB mirror of ``plan_compaction`` over an existing relation."""
    if min_file_bytes is None:
        min_file_bytes = target_bytes // 2
    part = f"PARTITION BY {partition_col} " if partition_col else ""
    sel_part = f"{partition_col}, " if partition_col else ""
    return f"""
SELECT {sel_part}{path_col}, {size_col},
  CASE WHEN {size_col} < {min_file_bytes}
       THEN 'compact' ELSE 'keep' END AS action,
  CASE WHEN {size_col} < {min_file_bytes} THEN
    ((SUM(CASE WHEN {size_col} < {min_file_bytes}
               THEN {size_col} ELSE 0 END)
        OVER ({part}ORDER BY {size_col} DESC, {path_col} ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      - {size_col}) // {target_bytes})::BIGINT
  END AS bin_id
FROM {files_rel}
"""
