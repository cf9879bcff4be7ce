"""Persist lifecycle tracking for pipeline intermediates.

The dedup / similarity operators persist() intermediates as *materialization
barriers* — load-bearing against Catalyst re-inlining (a measured 30× blowup
without them, see pipeline/dedup.py).  Those barriers must outlive the
returned lazy DataFrame until the caller materializes it, so the library
cannot unpersist eagerly.  Instead every persist is registered here and the
caller (or a scope guard) releases them:

    from steel_datafusion_spark.cache import pipeline_cache_scope
    with pipeline_cache_scope(spark):
        pairs = minhash_dedup_pairs(docs).collect()   # barriers live
    # scope exit → all tracked intermediates unpersisted

Long-lived sessions that build many catalog queries call
``release_all(spark)`` between queries (bench.py does the equivalent with
``spark.catalog.clearCache()``; this API releases only what this library
persisted, leaving user-cached relations alone).

Registry is keyed by SparkContext applicationId — session-lifetime-unique,
unlike ``id(spark)`` which can be reused after GC.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

__all__ = ["track", "release_all", "pipeline_cache_scope", "tracked_count",
           "release_local_checkpoint", "iteration_barrier"]

_TRACKED: dict[str, list[DataFrame]] = {}


def _app_id(session_or_df) -> str:
    spark = (session_or_df.sparkSession
             if isinstance(session_or_df, DataFrame) else session_or_df)
    return spark.sparkContext.applicationId


def track(df: DataFrame) -> DataFrame:
    """Register an already-persisted DataFrame for later release; returns it
    unchanged so call sites read ``track(df.persist())``."""
    _TRACKED.setdefault(_app_id(df), []).append(df)
    return df


def untrack_and_unpersist(df: DataFrame) -> None:
    """Release one intermediate immediately (safe to call twice)."""
    try:
        df.unpersist(blocking=False)
    except Exception:
        pass  # session already stopped
    lst = _TRACKED.get(_app_id(df))
    if lst is not None:
        _TRACKED[_app_id(df)] = [d for d in lst if d is not df]


def release_all(spark: SparkSession) -> int:
    """Unpersist every intermediate this library persisted on ``spark``.
    Returns the number released.  Only call after materializing results you
    need — a still-lazy result DataFrame would silently recompute without its
    barriers (the re-inlining blowup the persists exist to prevent)."""
    dfs = _TRACKED.pop(_app_id(spark), [])
    for df in dfs:
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped: the cache died with the JVM
    return len(dfs)


def tracked_count(spark: SparkSession) -> int:
    return len(_TRACKED.get(_app_id(spark), []))


def iteration_barrier(df: DataFrame, reliable: bool = False,
                      checkpoint_dir: str | None = None) -> DataFrame:
    """Eager lineage-truncation barrier for iterative loops (CC, k-means).

    ``reliable=False`` → ``localCheckpoint(eager=True)``: blocks live on
    executors with NO lineage to recompute them — fastest, and fine on
    local[*] — but on a real cluster a single lost executor kills the job
    mid-loop (the blocks are unrecoverable).  ``reliable=True`` →
    ``checkpoint(eager=True)`` to the SparkContext checkpoint directory
    (HDFS/object store): survives executor loss at the cost of one write +
    read per iteration — the right default for multi-hour 100 TB loops.
    ``checkpoint_dir`` sets the SparkContext directory only when none is
    configured yet; if one is already set and a *different* directory is
    passed, this raises rather than silently redirecting other callers'
    checkpoints (the context directory is shared process state — a
    per-DataFrame helper must not flip it out from under concurrent loops).
    Raises if ``reliable=True`` and no directory was ever configured (Spark
    would throw a cryptic SparkException mid-job otherwise)."""
    if not reliable:
        return df.localCheckpoint(eager=True)
    sc = df.sparkSession.sparkContext
    existing = sc._jsc.sc().getCheckpointDir()
    current = existing.get() if not existing.isEmpty() else None
    if checkpoint_dir is not None:
        if current is None:
            sc.setCheckpointDir(checkpoint_dir)
        elif not _same_checkpoint_dir(current, checkpoint_dir):
            raise ValueError(
                f"SparkContext checkpoint dir is already {current!r}; "
                f"refusing to redirect it to {checkpoint_dir!r} — other "
                "iterative loops on this context would silently start "
                "checkpointing there too. Use the configured directory or "
                "a fresh context.")
    elif current is None:
        raise ValueError(
            "reliable=True needs a checkpoint_dir (or a prior "
            "SparkContext.setCheckpointDir) — a durable location that "
            "survives executor loss")
    return df.checkpoint(eager=True)


def _same_checkpoint_dir(configured: str, requested: str) -> bool:
    """The configured value is a resolved Hadoop URI with a per-context UUID
    subdirectory appended (file:/tmp/x/<uuid>); compare against the raw user
    path loosely enough to accept the same location."""
    strip = lambda s: s.split(":", 1)[-1].strip("/")  # noqa: E731
    conf, req = strip(configured), strip(requested)
    return conf == req or conf.rsplit("/", 1)[0] == req


def release_local_checkpoint(df: DataFrame) -> int:
    """Eagerly free the blocks of a ``localCheckpoint()``-ed DataFrame
    (df.unpersist() is a no-op for checkpoints — there is no SQL-cache
    entry; the data lives in the LogicalRDD leaves' RDD blocks, which the
    ContextCleaner only reclaims on GC).  Walks the analyzed plan's leaves
    and unpersists each LogicalRDD's backing RDD; returns how many it
    released.  Only call once the checkpointed data is no longer needed —
    the lineage is truncated, so nothing can recompute it."""
    released = 0
    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            if leaf.getClass().getName().endswith("LogicalRDD"):
                leaf.rdd().unpersist(False)
                released += 1
    except Exception:
        pass  # best-effort: session stopped or internal API shifted
    return released


@contextmanager
def pipeline_cache_scope(spark: SparkSession):
    """Scope guard: releases every barrier tracked during the block."""
    before = list(_TRACKED.get(_app_id(spark), []))
    try:
        yield
    finally:
        try:
            app = _app_id(spark)
        except Exception:
            app = None  # session stopped inside the scope: nothing to release
        if app is not None:
            current = _TRACKED.get(app, [])
            new = [d for d in current if all(d is not b for b in before)]
            for df in new:
                try:
                    df.unpersist(blocking=False)
                except Exception:
                    pass  # session already stopped: nothing left to free
            # keep only pre-scope entries still tracked — don't resurrect
            # frames released inside the scope via release_all/untrack
            _TRACKED[app] = [b for b in before
                             if any(b is c for c in current)]
