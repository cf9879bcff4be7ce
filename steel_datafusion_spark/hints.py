"""Size-guarded join hints.

``F.broadcast`` is a *forced* hint: it bypasses
``spark.sql.autoBroadcastJoinThreshold`` entirely, so a frame the author
believed small ("the drop list is duplicate-proportional") becomes an
executor OOM the day the data stops cooperating — at web-crawl duplicate
rates (30-50%) a dedup drop list is corpus-order.  Every pipeline operator
that wants broadcast-join performance on a *data-dependent* frame goes
through :func:`broadcast_if_small` instead: broadcast iff a bounded count
proves the frame small, otherwise return it unhinted and let the join plan
as an ordinary shuffled hash join (still linear, one exchange — slower,
never fatal).

The bounded count is cheap by construction: the frame is persisted first
(it is about to be joined anyway, so the persist is not extra work — it is
the materialization barrier these operators already need), and the probe is
``limit(max_rows + 1).count()`` — Spark executes a limit incrementally
(one partition, then geometrically more), so a huge frame answers "too
big" after scanning a handful of partitions rather than all of them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cache import track

__all__ = ["broadcast_if_small", "DEFAULT_BROADCAST_ROWS"]

# ~5M rows of a narrow key frame (one long id ≈ 16 B serialized) is ~80 MB
# broadcast — comfortably inside a production executor's memory while far
# above any fixture.  Operators expose their own ``broadcast_limit`` knob
# that defaults to this; pass 0 to force the shuffle path, None to force
# the broadcast (the caller asserts smallness some other way).
DEFAULT_BROADCAST_ROWS = 5_000_000


def broadcast_if_small(
    df: DataFrame, max_rows: int | None = DEFAULT_BROADCAST_ROWS,
) -> DataFrame:
    """Return ``df`` hinted for broadcast iff a bounded count shows it has
    at most ``max_rows`` rows; otherwise return it persisted-but-unhinted
    so the consuming join plans as a shuffle join.

    ``max_rows=None`` skips the probe and force-broadcasts (caller-asserted
    smallness, e.g. a frame already bounded by construction);
    ``max_rows=0`` forces the shuffle path (useful in tests and when the
    caller knows the frame is large).  Either way the join RESULT is
    identical — this is purely a physical-plan hint."""
    if max_rows is None:
        return F.broadcast(df)
    if max_rows <= 0:
        return df
    df = track(df.persist())
    n = df.limit(max_rows + 1).count()
    return F.broadcast(df) if n <= max_rows else df
