"""Distributed quality-classifier TRAINING: logistic regression by batch
gradient descent, DataFrame-only.

Beyond-reference surface for the LLM-training-data north star: the
fastText/CCNet-style quality filter has two halves — INFERENCE (a linear
fold over tokens; ``pipeline/terms.py with_classifier`` and the
``quality_classifier`` gate) and TRAINING, which this module adds.  The
training shape matters at 100 TB because the gradient of logistic loss is
an AGGREGATION: each iteration is one map-side-combinable sum over the
featurized corpus, so a 5-iteration fit costs five partial→final
aggregations and the driver only ever holds the (k+1)-float weight vector
— the k-means "model fetch, not data collect" pattern
(pipeline/similarity.py) applied to supervised training.

Determinism / oracle parity (repo convention): features are rounded to
6 dp; each row's per-feature gradient contribution
(sigmoid(z) − y) · x_j is rounded to 9 dp and summed as an exact
decimal(20,9), so gradients — and therefore every weight trajectory — are
order-independent at any partition count and reproducible in DuckDB,
which unrolls the same iterations as chained 1-row weight CTEs.  The
logistic sigmoid's exp() is evaluated on identical doubles in both
engines; the 9 dp rounding absorbs any last-ulp libm divergence.

Scale notes: the featurized relation persists once (one corpus scan);
each iteration's only exchange is the 1-row gradient merge; weights ride
into the next iteration's expression as literals (broadcast-by-
construction, like bpe_segment's merge list).  Nothing corpus-sized ever
reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..cache import track
from .text import punct_ratio, stopword_ratio, token_count

__all__ = [
    "quality_features", "logreg_train", "logreg_predict",
    "sql_quality_features", "sql_logreg_train",
]

FEATURE_COLS = ["x_stopword", "x_punct", "x_tokens", "x_chars"]


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Bounded O(1) quality features (all rounded to 6 dp): stopword
    ratio, punctuation ratio, capped token count / 100, capped char count
    / 500.  Constant scaling instead of data-dependent standardization —
    no stats pass, and gradient descent stays well-conditioned because
    every feature lives in [0, 1]."""
    t = F.col(text_col)
    return df.select(
        "*",
        F.round(stopword_ratio(t), 6).alias("x_stopword"),
        F.round(punct_ratio(t), 6).alias("x_punct"),
        F.round(F.least(F.lit(1.0), token_count(t) / F.lit(100.0)), 6)
        .alias("x_tokens"),
        F.round(F.least(F.lit(1.0), F.length(t) / F.lit(500.0)), 6)
        .alias("x_chars"))


def sql_quality_features(text_col: str = "text") -> list[tuple[str, str]]:
    """[(name, expr)] DuckDB mirrors of :func:`quality_features`."""
    from .text import sql_punct_ratio, sql_stopword_ratio, sql_token_count

    return [
        ("x_stopword", f"round({sql_stopword_ratio(text_col)}, 6)"),
        ("x_punct", f"round({sql_punct_ratio(text_col)}, 6)"),
        ("x_tokens",
         f"round(least(1.0, {sql_token_count(text_col)} / 100.0), 6)"),
        ("x_chars",
         f"round(least(1.0, length({text_col}) / 500.0), 6)"),
    ]


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logreg_train(
    df: DataFrame, feature_cols: list[str], label_col: str,
    iterations: int = 8, lr: float = 2.0, *, return_features: bool = False,
) -> tuple[list[float], float] | tuple[list[float], float, DataFrame]:
    """Fit logistic regression by full-batch gradient descent; returns
    (weights, bias) with weights aligned to ``feature_cols``.

    Each iteration: z = w·x + b with the current weights as literals,
    per-row gradient contributions rounded to 9 dp, decimal-exact sums,
    w_j ← w_j − lr · g_j / n.  The relation persists once; iteration i+1
    re-reads the cache.

    ``return_features=True`` additionally returns the persisted
    featurized frame (feature columns as doubles plus ``_y``) so a
    post-training accuracy/scoring pass can reuse the cache instead of
    re-running the featurization expressions over the raw corpus."""
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")
    feats = track(df.select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("double").alias("_y")).persist())
    n = feats.count()
    if n == 0:
        raise ValueError("cannot train on an empty relation")
    k = len(feature_cols)
    w = [0.0] * k
    b = 0.0
    for _ in range(iterations):
        z = F.lit(b)
        for j, c in enumerate(feature_cols):
            z = z + F.lit(w[j]) * F.col(c)
        err = _sigmoid(z) - F.col("_y")
        aggs = [F.sum(F.round(err * F.col(c), 9).cast("decimal(20,9)"))
                .alias(f"g{j}") for j, c in enumerate(feature_cols)]
        aggs.append(F.sum(F.round(err, 9).cast("decimal(20,9)"))
                    .alias("gb"))
        row = feats.agg(*aggs).collect()[0]
        w = [w[j] - lr * (float(row[f"g{j}"]) / n) for j in range(k)]
        b = b - lr * (float(row["gb"]) / n)
    if return_features:
        return w, b, feats
    return w, b


def logreg_predict(df: DataFrame, weights: list[float], bias: float,
                   feature_cols: list[str]) -> DataFrame:
    """Append ``score`` (6 dp sigmoid) and ``pred`` (z > 0) — a pure
    projection, the inference mirror of the trained model."""
    z = F.lit(bias)
    for wj, c in zip(weights, feature_cols):
        z = z + F.lit(wj) * F.col(c).cast("double")
    return df.select("*", F.round(_sigmoid(z), 6).alias("score"),
                     (z > 0).cast("boolean").alias("pred"))


def sql_logreg_train(
    table: str, feature_exprs: list[tuple[str, str]], label_expr: str,
    iterations: int = 8, lr: float = 2.0, prefix: str = "lr",
) -> str:
    """DuckDB mirror of featurize + :func:`logreg_train` + a final
    accuracy pass: the weight trajectory unrolls as chained 1-row CTEs
    ({prefix}_w0 … {prefix}_w{iterations}), each computing the identical
    9 dp-rounded decimal gradient sums against the previous weights.
    Returns one row: n, iterations, each weight (6 dp), bias (6 dp),
    train_accuracy (6 dp, decided by z > 0 — no float threshold)."""
    names = [n for n, _ in feature_exprs]
    k = len(names)
    feat_sel = ", ".join(f"{e} AS {n}" for n, e in feature_exprs)
    ctes = [f"""{prefix}_f AS MATERIALIZED (
  SELECT {feat_sel}, ({label_expr})::DOUBLE AS y FROM {table}
),
{prefix}_n AS MATERIALIZED (SELECT COUNT(*)::BIGINT AS n FROM {prefix}_f),
{prefix}_w0 AS MATERIALIZED (
  SELECT {', '.join(f'0.0::DOUBLE AS w{j}' for j in range(k))},
         0.0::DOUBLE AS wb)"""]
    for i in range(1, iterations + 1):
        prev = f"{prefix}_w{i - 1}"
        z = " + ".join([f"w.wb"] + [f"w.w{j} * f.{names[j]}"
                                    for j in range(k)])
        err = f"(1.0 / (1.0 + exp(-({z}))) - f.y)"
        gsum = ", ".join(
            f"SUM(round({err} * f.{names[j]}, 9)::DECIMAL(20,9)) AS g{j}"
            for j in range(k))
        # MATERIALIZED is load-bearing: w_{i} is referenced twice (by
        # g_{i+1} and w_{i+1}), so an inline CTE chain re-evaluates
        # recursively — 2^iterations expansions (observed: the 20-round
        # oracle never finished un-materialized; materialized it is
        # 20 linear passes over the feature CTE).
        ctes.append(f"""{prefix}_g{i} AS MATERIALIZED (
  SELECT {gsum},
         SUM(round({err}, 9)::DECIMAL(20,9)) AS gb
  FROM {prefix}_f f, {prev} w
),
{prefix}_w{i} AS MATERIALIZED (
  SELECT {', '.join(
      f'w.w{j} - {lr} * (g.g{j}::DOUBLE / n.n) AS w{j}' for j in range(k))},
         w.wb - {lr} * (g.gb::DOUBLE / n.n) AS wb
  FROM {prev} w, {prefix}_g{i} g, {prefix}_n n
)""")
    wk = f"{prefix}_w{iterations}"
    z_final = " + ".join([f"w.wb"] + [f"w.w{j} * f.{names[j]}"
                                      for j in range(k)])
    return ("WITH " + ",\n".join(ctes) + f""",
{prefix}_acc AS (
  SELECT round(AVG(CASE WHEN (({z_final}) > 0) = (f.y = 1.0)
               THEN 1.0 ELSE 0.0 END), 6) AS train_accuracy
  FROM {prefix}_f f, {wk} w
)
SELECT n.n, {iterations}::BIGINT AS iterations,
  {', '.join(f'round(w.w{j}, 6) AS w_{names[j]}' for j in range(k))},
  round(w.wb, 6) AS bias,
  a.train_accuracy
FROM {prefix}_n n, {wk} w, {prefix}_acc a
""")
