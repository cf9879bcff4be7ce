"""``df/explain`` — plans as a DataFrame, matching the reference shape.

The reference (main.rs:267-272, reg :492) returns the logical+physical plan as
a two-column DataFrame ``(plan_type, plan)``; ``analyze=true`` executes the
plan and embeds runtime metrics (DataFusion's "Plan with Metrics").  Spark's
``df.explain`` only prints, so this rebuilds the df-shaped result from
``QueryExecution``; ``analyze=True`` executes the query's own physical plan
(RDD count — full distributed execution, nothing materialized on the driver)
and walks the executed-plan tree collecting each operator's SQLMetrics.
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


def _walk_plan(node):
    """Depth-first over a JVM SparkPlan tree, descending through AQE's
    current physical plan when present."""
    yield node
    cls = node.getClass().getSimpleName()
    try:  # AdaptiveSparkPlanExec: the real operators live under executedPlan
        if "AdaptiveSparkPlan" in cls:
            yield from _walk_plan(node.executedPlan())
            return
        if "QueryStage" in cls:  # AQE stage wrappers are leaves; descend
            yield from _walk_plan(node.plan())
            return
    except Exception:
        # Tolerated failure: the AQE accessor names (executedPlan / plan)
        # are internal Catalyst API and can shift between Spark versions;
        # falling through to children() still walks the pre-AQE tree.
        pass
    it = node.children().iterator()
    while it.hasNext():
        yield from _walk_plan(it.next())


def _node_metrics(node) -> str | None:
    """``name=value`` pairs from one operator's SQLMetric map, or None."""
    pairs = []
    try:
        mit = node.metrics().iterator()
        while mit.hasNext():
            kv = mit.next()
            metric = kv._2()
            label = metric.name().get() if metric.name().isDefined() else kv._1()
            pairs.append(f"{label}={metric.value()}")
    except Exception:
        return None
    return ", ".join(pairs) if pairs else None


def df_explain(df: DataFrame, verbose: bool = False, analyze: bool = False) -> DataFrame:
    """Return plans as a DataFrame ``(plan_type, plan)``, like DataFusion.

    ``analyze=True``: execute, then append one ``Plan with Metrics`` row —
    per-operator runtime metrics (output rows, spill, shuffle bytes, wall
    times) exactly as accumulated by the run (main.rs:267-272 parity)."""
    spark = df.sparkSession
    qe = df._jdf.queryExecution()
    rows = []
    if verbose:
        rows.append(("logical_plan", str(qe.logical())))
        rows.append(("analyzed_logical_plan", str(qe.analyzed())))
        rows.append(("optimized_logical_plan", str(qe.optimizedPlan())))
    else:
        rows.append(("logical_plan", str(qe.optimizedPlan())))
    jvm = spark._jvm
    plan_str = qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    rows.append(("physical_plan", plan_str))
    if analyze:
        # Execute THIS query's physical plan (not a derived count() plan, whose
        # metrics would attach elsewhere).  RDD count = full execution, no
        # driver-side materialization of the result.
        qe.executedPlan().execute().count()
        lines = []
        for node in _walk_plan(qe.executedPlan()):
            m = _node_metrics(node)
            name = node.nodeName()
            lines.append(f"{name}: {m}" if m else f"{name}: -")
        rows.append(("Plan with Metrics", "\n".join(lines)))
    return spark.createDataFrame(rows, schema=_SCHEMA)
