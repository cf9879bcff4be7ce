"""SQL entry point — optional surface (SURVEY.md §3.3).

The reference exposes no SQL string entry (DataFusion's
``SessionContext::sql`` exists but is unregistered from Steel); Spark gives
it for free once tables are registered as temp views.  Exposed as the
natural extension: ``register_tables`` + ``sql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sources.readers import load_tables

__all__ = ["register_tables", "sql"]


def register_tables(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every test table in ``sf_dir`` as a temp view; returns the
    registered names."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return sorted(tables)


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Run a SQL query against the registered views (Spark SQL dialect —
    ANSI mode on by default in Spark 4)."""
    return spark.sql(query)
