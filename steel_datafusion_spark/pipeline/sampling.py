"""Deterministic sampling / splitting for training-data pipelines.

Every op here is keyed on ``md5(salt || key)`` — no RNG, no
``rand()``: the sample is a pure function of (row key, salt), so it is

- **reproducible** across runs, engines, partitionings and cluster sizes
  (the property training pipelines need for resumable jobs and for
  train/test splits that never leak when data is re-ingested);
- **oracle-checkable** — DuckDB computes the identical md5, so the gate
  compares the actual sampled rows, not just counts;
- **shuffle-free** for Bernoulli-style sampling (`hash_sample`,
  `hash_split` are pure map-side filters/projections — at 100 TB they
  read and keep nothing but the survivors), and one bounded shuffle for
  exact per-stratum sampling (`stratified_sample_n` — see its scale
  note).

The 8-hex-digit md5 prefix is used as a uniform 32-bit integer; rates
are applied as integer thresholds on it (exact in both engines — no
float rounding at the boundary).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "hash_unit", "hash_sample", "weighted_sample", "stratified_sample_n",
    "hash_split", "sql_hash_unit", "domain_cap", "shard_assignment",
    "token_budget_subset",
]

_MOD = 1 << 32


def hash_unit(key: Column, salt: str) -> Column:
    """Uniform integer in [0, 2^32) from md5(salt || key) — the shared
    randomness primitive (JVM expression; identical hex in DuckDB)."""
    hx = F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8)
    return F.conv(hx, 16, 10).cast("long")


def sql_hash_unit(key: str, salt: str) -> str:
    """DuckDB mirror of :func:`hash_unit`."""
    return (f"('0x' || substr(md5('{salt}' || CAST({key} AS VARCHAR)), 1, 8))"
            f"::BIGINT")


def hash_sample(df: DataFrame, rate: float, key_col: str = "doc_id",
                salt: str = "sample") -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows with
    hash_unit < rate * 2^32.  Map-side filter — no shuffle, no state;
    rerunning (or running on a different cluster) keeps the same rows."""
    threshold = int(rate * _MOD)
    return df.filter(hash_unit(F.col(key_col), salt) < F.lit(threshold))


def weighted_sample(df: DataFrame, weight_col: str, key_col: str = "doc_id",
                    salt: str = "wsample") -> DataFrame:
    """Importance sampling: keep each row with probability = its weight
    column (clamped to [0,1]) — e.g. a quality score, so high-quality
    documents survive curation proportionally.  Same determinism contract
    as hash_sample (pure function of key+salt), same map-side zero-shuffle
    plan; the threshold is floor(weight * 2^32) so both engines make the
    identical integer comparison."""
    w = F.least(F.greatest(F.col(weight_col), F.lit(0.0)), F.lit(1.0))
    threshold = F.floor(w * F.lit(float(_MOD))).cast("long")
    return df.filter(hash_unit(F.col(key_col), salt) < threshold)


def stratified_sample_n(df: DataFrame, strata_cols: list[str], n: int,
                        key_col: str = "doc_id",
                        salt: str = "strat") -> DataFrame:
    """Exactly ``n`` rows per stratum, chosen by md5 order (key tiebreak).

    Scale: one hash shuffle on the strata key + an in-partition sort —
    but WindowGroupLimit prunes to the top-n per partition *before* the
    exchange (same plan shape as top-k), so only ~n rows per input
    partition shuffle, not the stratum.  For mega-strata at 100 TB,
    pre-filter with ``hash_sample`` at a few× the target rate first, then
    take exact n from the survivors — same ordering key, same result."""
    h = hash_unit(F.col(key_col), salt).alias("_hu")
    w = Window.partitionBy(*strata_cols).orderBy(F.col("_hu").asc(),
                                                 F.col(key_col).asc())
    return (df.withColumn("_hu", h)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n)
            .drop("_hu", "_rn"))


def hash_split(df: DataFrame, weights: dict[str, float],
               key_col: str = "doc_id", salt: str = "split") -> DataFrame:
    """Deterministic train/val/test split: adds a ``split`` column chosen
    by integer thresholds on hash_unit.  Weights must sum to 1.  A row's
    split never changes when other rows come or go — the anti-leak
    property rand()-based splits do not have.  Pure projection: no
    shuffle."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    h = hash_unit(F.col(key_col), salt)
    expr = None
    acc = 0.0
    for name, wt in weights.items():
        acc += wt
        bound = F.lit(int(acc * _MOD))
        expr = (F.when(h < bound, F.lit(name)) if expr is None
                else expr.when(h < bound, F.lit(name)))
    # float-sum guard: anything at the very top edge lands in the last split
    last = list(weights)[-1]
    return df.withColumn("split", expr.otherwise(F.lit(last)))


def domain_cap(df: DataFrame, cap: int, domain_col: str = "source",
               key_col: str = "doc_id", salt: str = "domcap") -> DataFrame:
    """Per-domain document cap (the C4/Gopher curation move: no single
    domain may dominate the corpus).  Keeps at most ``cap`` rows per
    ``domain_col`` value, chosen by md5 order with key tiebreak — a
    deterministic preference, so re-ingesting the corpus (or growing a
    domain) never swaps previously-kept documents for hash-later ones.

    Scale: same plan as ``stratified_sample_n`` — one shuffle on the
    domain key with WindowGroupLimit pruning to ~cap rows per input
    partition before the exchange, so a billion-page domain ships only
    cap × n_partitions candidate rows.  For caps in the millions,
    pre-thin hot domains with ``hash_sample`` at a few× the implied rate
    first (same ordering key → same final set)."""
    h = hash_unit(F.col(key_col), salt).alias("_hu")
    w = Window.partitionBy(domain_col).orderBy(F.col("_hu").asc(),
                                               F.col(key_col).asc())
    return (df.withColumn("_hu", h)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cap)
            .drop("_hu", "_rn"))


def shard_assignment(df: DataFrame, n_shards: int,
                     key_col: str = "doc_id",
                     salt: str = "shard") -> DataFrame:
    """Deterministic global shuffle + sharding for training order: adds
    ``shard`` (which output file/loader stream the row belongs to) and
    ``pos`` (its position within that shard).  Both are pure functions of
    (key, salt): a resumed or re-run job produces byte-identical epochs,
    and changing ``salt`` gives an independent reshuffle per epoch.

    shard = hash_unit mod n_shards — map-side, uniform, no coordination;
    pos   = md5-order rank within the shard (key tiebreak).

    Scale: the only shuffle is on the shard id.  A global ORDER BY would
    funnel the corpus through one sort; per-shard ranking shuffles each
    row once to its shard's partitions and sorts locally — with n_shards
    sized to the training fan-in (hundreds to thousands), partitions stay
    executor-sized at 100 TB.  Writers then emit one file per shard
    (partitionBy('shard')), which data loaders read sequentially by
    ``pos``."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = hash_unit(F.col(key_col), salt)
    w = Window.partitionBy("shard").orderBy(F.col("_hu").asc(),
                                            F.col(key_col).asc())
    return (df.withColumn("_hu", h)
            .withColumn("shard", F.pmod(F.col("_hu"), F.lit(n_shards))
                        .cast("int"))
            .withColumn("pos", F.row_number().over(w).cast("long"))
            .drop("_hu"))


def token_budget_subset(
    df: DataFrame, token_col: str, budget: int,
    key_col: str = "doc_id", salt: str = "budget",
    n_buckets: int = 256,
) -> DataFrame:
    """Deterministically take documents until an exact token budget: order
    the corpus by the md5 coin (reproducible, growth-stable shuffle order),
    keep every document whose INCLUSIVE running token total is <= budget.

    The running total is a distributed prefix sum — NO global sort:

    1. bucket = top bits of the order hash, so bucket order IS hash order;
    2. per-bucket token totals (one tiny aggregate), cumulated EXCLUSIVE
       over the <= n_buckets ordered buckets (a window over a tiny frame)
       = each bucket's starting offset;
    3. within-bucket running sum (window partitioned BY BUCKET — sorts
       only bucket-sized slices, in parallel) + broadcast offset = the
       exact global running total.

    The classic two-phase scan pattern: wall-clock scales with the largest
    bucket, not the corpus.  Rows keep their columns plus ``_cum_tokens``
    (the inclusive global running total) — filter is `_cum_tokens <=
    budget`, already applied.
    """
    bits = (n_buckets - 1).bit_length()
    if n_buckets != 1 << bits:
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    h = hash_unit(F.col(key_col), salt)
    with_h = df.withColumn("_hu", h) \
               .withColumn("_bkt", F.shiftright("_hu", 32 - bits))
    totals = with_h.groupBy("_bkt").agg(F.sum(token_col).alias("_btot"))
    w_off = Window.orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_boff", F.coalesce(F.sum("_btot").over(w_off), F.lit(0)))
    w_in = Window.partitionBy("_bkt").orderBy("_hu", key_col)
    return (with_h.join(F.broadcast(offsets.select("_bkt", "_boff")), "_bkt")
            .withColumn("_cum_tokens",
                        (F.col("_boff")
                         + F.sum(token_col).over(w_in)).cast("long"))
            .filter(F.col("_cum_tokens") <= budget)
            .drop("_hu", "_bkt", "_boff"))
