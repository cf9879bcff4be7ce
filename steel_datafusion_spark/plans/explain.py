"""``df/explain`` — plans as a DataFrame, matching the reference shape.

The reference (main.rs:267-272, reg :492) returns the logical+physical plan as
a two-column DataFrame ``(plan_type, plan)``; ``analyze=true`` executes and
embeds runtime metrics.  Spark's ``df.explain`` only prints, so this rebuilds
the df-shaped result from ``QueryExecution``.  ``analyze=True`` maps to
Spark's cost mode plus the formatted physical plan (closest public analogue;
exact runtime metrics live in the Spark UI — documented divergence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["df_explain", "explain_string"]

_SCHEMA = T.StructType([
    T.StructField("plan_type", T.StringType()),
    T.StructField("plan", T.StringType()),
])


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan string for a given explain mode (no printing)."""
    qe = df._jdf.queryExecution()
    if mode == "formatted":
        return qe.explainString(
            df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    return qe.toString()


def df_explain(df: DataFrame, verbose: bool = False, analyze: bool = False) -> DataFrame:
    """Return plans as a DataFrame ``(plan_type, plan)``, like DataFusion."""
    spark = df.sparkSession
    qe = df._jdf.queryExecution()
    rows = []
    if verbose:
        rows.append(("logical_plan", str(qe.logical())))
        rows.append(("analyzed_logical_plan", str(qe.analyzed())))
        rows.append(("optimized_logical_plan", str(qe.optimizedPlan())))
    else:
        rows.append(("logical_plan", str(qe.optimizedPlan())))
    mode = "cost" if analyze else "formatted"
    jvm = spark._jvm
    plan_str = qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )
    rows.append(("physical_plan", plan_str))
    return spark.createDataFrame(rows, schema=_SCHEMA)
