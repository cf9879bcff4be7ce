"""Market-basket co-occurrence: frequent item pairs and association rules.

Beyond-reference surface.  Co-occurrence mining is the same shape whether
the 'basket' is a retail order, a user session, or a document and the
'item' is a product, an event type, or a vocabulary term — and at corpus
scale it powers related-term discovery, topic co-occurrence matrices, and
recommendation priors over training data.

Plan, end to end:

1. one partially-aggregated groupBy(basket) collects each basket's sorted
   distinct item set (≡ a (basket, item) distinct, but map-side merged and
   shared by every downstream consumer);
2. ``max_basket`` drops pathological baskets (a crawler cart with 10⁴
   items) by set size — the same occupancy-cap pattern as the MinHash
   band guard — BEFORE anything quadratic happens;
3. pair counts expand map-side from the sorted set (all i < j positions →
   ``item_a < item_b``), C(k,2) per basket, then one pair-keyed count —
   no basket-keyed self-join;
4. rules assemble from broadcast item counts + a 1-row total — support,
   confidence (both directions), lift; all ratios from exact counts.

Nothing is ever keyed on an item pair before counting, and no key's
fan-out exceeds the capped basket size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..hints import DEFAULT_BROADCAST_ROWS, broadcast_if_small

__all__ = ["association_rules", "sql_association_rules"]


def association_rules(
    df: DataFrame, basket_col: str, item_col: str,
    min_pair_count: int = 2, max_basket: int | None = None,
    broadcast_limit: int | None = DEFAULT_BROADCAST_ROWS,
) -> DataFrame:
    """(item_a, item_b, pair_count, support, conf_a_b, conf_b_a, lift)
    for every unordered item pair co-occurring in at least
    ``min_pair_count`` baskets.  ``lift > 1`` means the pair co-occurs
    more than independence predicts — the association worth surfacing.

    Scale: the per-item count frame is VOCABULARY-proportional — 10⁷-10⁸
    items in real retail/co-occurrence corpora — so attaching counts to
    the pair table is size-guarded: vocabularies under
    ``broadcast_limit`` rows broadcast (map-side join); larger ones fall
    through to plain shuffled hash joins on ``item_a``/``item_b`` (the
    pair table is already item-keyed, so each costs one exchange)."""
    # One partially-aggregated shuffle builds each basket's sorted distinct
    # item set (collect_set ≡ the old (basket, item) distinct, merged
    # map-side); the size cap, the basket count, the per-item counts and
    # the C(k,2) pair expansion are all derived from that single persisted
    # frame — no basket-keyed self-join (two exchanges saved) and no
    # separate size-count join for the cap.  The expansion materializes one
    # basket's pair array per row, so ``max_basket`` (applied BEFORE the
    # expansion) remains the quadratic knob — set it at corpus scale.
    baskets = (df.groupBy(F.col(basket_col).alias("basket"))
               .agg(F.sort_array(F.collect_set(F.col(item_col)))
                    .alias("items")))
    if max_basket is not None:
        baskets = baskets.filter(F.size("items") <= max_basket)
    baskets = baskets.persist()
    from ..cache import track
    track(baskets)

    n_baskets = baskets.agg(F.count(F.lit(1)).cast("double").alias("n"))
    item_counts = (baskets.select(F.explode("items").alias("item"))
                   .groupBy("item").agg(F.count(F.lit(1)).alias("c_item")))

    arr = F.col("items")
    pair_arr = F.flatten(F.transform(
        arr,
        lambda x, i: F.transform(
            F.slice(arr, i + F.lit(2), F.size(arr)),
            lambda y: F.struct(x.alias("item_a"), y.alias("item_b")))))
    pairs = (baskets.select(F.explode(pair_arr).alias("p"))
             .select("p.item_a", "p.item_b")
             .groupBy("item_a", "item_b")
             .agg(F.count(F.lit(1)).alias("pair_count"))
             .filter(F.col("pair_count") >= min_pair_count))

    ca = item_counts.select(F.col("item").alias("item_a"),
                            F.col("c_item").alias("c_a"))
    cb = item_counts.select(F.col("item").alias("item_b"),
                            F.col("c_item").alias("c_b"))
    return (pairs.join(broadcast_if_small(ca, broadcast_limit), "item_a")
            .join(broadcast_if_small(cb, broadcast_limit), "item_b")
            .crossJoin(F.broadcast(n_baskets))
            .select(
                "item_a", "item_b", "pair_count",
                F.round(F.col("pair_count") / F.col("n"), 6)
                .alias("support"),
                F.round(F.col("pair_count") / F.col("c_a"), 6)
                .alias("conf_a_b"),
                F.round(F.col("pair_count") / F.col("c_b"), 6)
                .alias("conf_b_a"),
                F.round(F.col("pair_count") * F.col("n")
                        / (F.col("c_a") * F.col("c_b")), 6).alias("lift")))


def sql_association_rules(
    table: str, basket_col: str, item_col: str,
    min_pair_count: int = 2, max_basket: int | None = None,
) -> str:
    """DuckDB mirror of ``association_rules``."""
    cap = (f",\nar_sz AS (SELECT basket FROM ar_bi GROUP BY basket "
           f"HAVING COUNT(*) <= {max_basket})"
           if max_basket is not None else "")
    src = ("ar_bi JOIN ar_sz USING (basket)" if max_basket is not None
           else "ar_bi")
    return f"""
WITH ar_bi0 AS (
  SELECT DISTINCT {basket_col} AS basket, {item_col} AS item FROM {table}
),
ar_bi AS (SELECT * FROM ar_bi0){cap},
ar_src AS (SELECT basket, item FROM {src}),
ar_n AS (SELECT COUNT(DISTINCT basket)::DOUBLE AS n FROM ar_src),
ar_ic AS (SELECT item, COUNT(*)::BIGINT AS c_item FROM ar_src GROUP BY item),
ar_p AS (
  SELECT a.item AS item_a, b.item AS item_b, COUNT(*)::BIGINT AS pair_count
  FROM ar_src a JOIN ar_src b
    ON a.basket = b.basket AND a.item < b.item
  GROUP BY a.item, b.item
  HAVING COUNT(*) >= {min_pair_count}
)
SELECT p.item_a, p.item_b, p.pair_count,
  round(p.pair_count / n.n, 6) AS support,
  round(p.pair_count / ca.c_item, 6) AS conf_a_b,
  round(p.pair_count / cb.c_item, 6) AS conf_b_a,
  round(p.pair_count * n.n / (ca.c_item * cb.c_item), 6) AS lift
FROM ar_p p
JOIN ar_ic ca ON p.item_a = ca.item
JOIN ar_ic cb ON p.item_b = cb.item, ar_n n
"""
