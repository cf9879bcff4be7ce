"""Robust per-group statistics via grouped-map Pandas (applyInPandas).

Beyond-reference surface: median/MAD (median absolute deviation) are the
robust location/scale pair quality pipelines prefer over mean/stddev when
the value distribution has heavy tails (latency, doc length, spam
scores) — one extreme value moves a mean arbitrarily but a median not at
all.  Exact medians are not expressible as a streaming aggregate, which
makes this the textbook case for Spark's GROUPED-MAP Python path:
``groupBy(...).applyInPandas`` ships each group to a pandas worker as one
Arrow batch, the worker computes exact order statistics in vectorized
numpy, and only the tiny per-group summary returns.

This rounds out the repo's Python-boundary coverage: scalar
``pandas_udf`` (udf.py), ``mapInPandas`` (multimodal.py),
``applyInPandasWithState`` (streaming/stateful.py), and now the grouped
map — each used only where JVM expressions genuinely cannot express the
semantics (exact medians here; approximate quantiles stay JVM-side in
functions/aggregates.py).

Scale: one shuffle on the group key; per-group memory is the group size
(use ``approx_percentile`` instead when single groups exceed executor
memory — the docstring trade every robust pipeline knows).  Determinism:
numpy's median (mean of the two middle order statistics) matches DuckDB's
``median`` on doubles; outputs round to 6dp before the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["grouped_median_mad", "sql_grouped_median_mad"]


def grouped_median_mad(df: DataFrame, group_cols: list[str],
                       value_col: str = "value") -> DataFrame:
    """(group_cols..., n, median, mad, p10, p90): exact per-group robust
    stats computed in a grouped-map pandas worker.  ``mad`` is the raw
    median absolute deviation (multiply by 1.4826 for a normal-consistent
    sigma estimate); p10/p90 use numpy's linear interpolation, mirrored
    exactly by DuckDB's continuous ``quantile_cont``."""
    import pandas as pd

    schema = T.StructType(
        [f for f in df.select(*group_cols).schema.fields]
        + [T.StructField("n", T.LongType()),
           T.StructField("median", T.DoubleType()),
           T.StructField("mad", T.DoubleType()),
           T.StructField("p10", T.DoubleType()),
           T.StructField("p90", T.DoubleType())])

    def _stats(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        v = pdf[value_col].to_numpy(dtype="float64")
        med = float(np.median(v))
        out = {c: [pdf[c].iloc[0]] for c in group_cols}
        out.update({
            "n": [len(v)],
            "median": [round(med, 6)],
            "mad": [round(float(np.median(np.abs(v - med))), 6)],
            "p10": [round(float(np.percentile(v, 10)), 6)],
            "p90": [round(float(np.percentile(v, 90)), 6)],
        })
        return pd.DataFrame(out)

    return (df.select(*group_cols, value_col)
            .groupBy(*group_cols).applyInPandas(_stats, schema=schema))


def sql_grouped_median_mad(table: str, group_cols: list[str],
                           value_col: str = "value") -> str:
    """DuckDB mirror: median / median-of-absolute-deviations /
    quantile_cont agree with numpy's interpolating definitions on
    doubles."""
    g = ", ".join(group_cols)
    return f"""
WITH rb_med AS (
  SELECT {g}, COUNT(*) AS n,
         median({value_col}) AS med,
         quantile_cont({value_col}, 0.10) AS p10,
         quantile_cont({value_col}, 0.90) AS p90
  FROM {table} GROUP BY {g}
)
SELECT m.{g.replace(', ', ', m.')}, m.n,
  round(m.med, 6) AS median,
  round(median(abs(t.{value_col} - m.med)), 6) AS mad,
  round(m.p10, 6) AS p10,
  round(m.p90, 6) AS p90
FROM {table} t JOIN rb_med m USING ({g})
GROUP BY m.{g.replace(', ', ', m.')}, m.n, m.med, m.p10, m.p90
"""
