"""As-of join — an operator Spark lacks natively, built scalably.

For each left row, attach the right row with the greatest timestamp ≤ the
left timestamp within the same key (backward as-of; the time-series "latest
value as of then" join) — or, with ``direction="forward"``, the right row
with the smallest timestamp ≥ the left timestamp ("next event after").

Implementation is the shuffle-parallel union trick, NOT a range self-join:
tag both inputs, union them, and run one window per key ordered by
(ts, side) taking ``last(right_payload, ignorenulls=True)`` up to the
current row.  Cost: a single hash exchange on the key + an in-partition
sort — the same shape as any windowed aggregate, linear in |L|+|R|.  A
naive ``L ⋈ R ON key AND r.ts <= l.ts`` + argmax explodes quadratically per
key and is never acceptable at scale.

Ties: the match is inclusive in both directions (right rows at the exact
left timestamp match); equal-ts right rows among themselves are broken by
``right_tiebreak`` — latest wins looking backward, earliest wins looking
forward — to keep results deterministic.

DuckDB's native ``ASOF LEFT JOIN`` is the oracle for the gate query.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_tiebreak: str | None = None,
    direction: str = "backward",
    tolerance: str | int | float | None = None,
) -> DataFrame:
    """As-of left join.  Output: all left columns + every right column
    (nulled when no right row is ≤ — forward: ≥ — the left timestamp).

    ``tolerance`` bounds the match distance (pandas ``merge_asof``
    semantics): a matched right row farther than the tolerance from the
    left timestamp is nulled out.  Pass an interval string for timestamp
    columns ("30 minutes") or a number for numeric ts columns.  Post-hoc
    filtering is exact here: the as-of match is the nearest candidate in
    the direction, so if IT is out of range, every other candidate is
    too — no extra shuffle, just a map-side conditional."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    l_payload = [c for c in left.columns if c not in on and c != left_ts]
    r_payload = [c for c in right.columns if c not in on]
    overlap = set(l_payload) & set(r_payload)
    if overlap:
        raise ValueError(f"column name overlap between sides: {sorted(overlap)}")

    l_tag = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*l_payload).alias("_l"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"`{f.name}`:{f.dataType.simpleString()}"
                for f in right.select(*r_payload).schema.fields) + ">"
        ).alias("_r"),
    )
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"`{f.name}`:{f.dataType.simpleString()}"
                for f in left.select(*l_payload).schema.fields) + ">"
        ).alias("_l"),
        F.struct(*r_payload).alias("_r"),
    )

    # Backward: right rows (side 0) sort before left (side 1) at equal ts
    # and last() looks over (unboundedPreceding, current) — the latest
    # right row ≤ ts wins (tiebreak asc + last ⇒ max tiebreak).  Forward is
    # the mirror: left gets side 0, first() looks over (current,
    # unboundedFollowing) — the earliest right row ≥ ts wins (tiebreak asc
    # + first ⇒ min tiebreak).  Same single shuffle either way.
    order = [F.col("_ts").asc(), F.col("_side").asc()]
    # right_tiebreak lives inside _r for right rows; order on the struct
    # field.  NULL tiebreaks must LOSE ties in both directions: backward
    # picks the LAST row in order (nulls first ⇒ nulls lose), forward picks
    # the FIRST (nulls last ⇒ nulls lose) — keeping the two directions
    # mirror-symmetric on null tiebreak values.
    if right_tiebreak:
        tb = F.col(f"_r.{right_tiebreak}")
        order.append(tb.asc_nulls_first() if direction == "backward"
                     else tb.asc_nulls_last())
    if direction == "backward":
        w = (Window.partitionBy(*on).orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        pick = F.last("_r", ignorenulls=True).over(w)
        left_side = 1
    else:
        l_tag = l_tag.withColumn("_side", F.lit(0))
        r_tag = r_tag.withColumn("_side", F.lit(1))
        w = (Window.partitionBy(*on).orderBy(*order)
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))
        pick = F.first("_r", ignorenulls=True).over(w)
        left_side = 0

    matched = (l_tag.unionByName(r_tag)
               .withColumn("_match", pick)
               .filter(F.col("_side") == left_side))
    if tolerance is not None:
        mts = F.col(f"_match.{right_ts}")
        tol = (F.lit(tolerance) if isinstance(tolerance, (int, float))
               else F.expr(f"INTERVAL {tolerance}"))
        in_range = (mts >= F.col("_ts") - tol if direction == "backward"
                    else mts <= F.col("_ts") + tol)
        matched = matched.withColumn("_match", F.when(in_range,
                                                      F.col("_match")))
    return matched.select(
        *on,
        F.col("_ts").alias(left_ts),
        *[F.col(f"_l.{c}").alias(c) for c in l_payload],
        *[F.col(f"_match.{c}").alias(c) for c in r_payload],
    )
