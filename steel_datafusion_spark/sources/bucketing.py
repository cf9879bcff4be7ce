"""Bucketed tables — co-located joins without a shuffle.

At 100 TB the dominant cost of a fact⋈fact join is the exchange of both
sides.  Writing both tables bucketed (and sorted) by the join key makes the
join key distribution a property of the STORAGE, so Catalyst plans a
sort-merge join with **no Exchange on either side** — the Spark analogue of
a co-partitioned warehouse layout.  ``tests/test_bucketing.py`` asserts the
Exchange-free plan.

Use when a join key is stable and reused across many queries (orderkey,
user_id, doc_id); the write cost is paid once.  Bucket count should be a
multiple of cluster parallelism at the target scale — at 100 TB think
thousands, not the 8 used in the local test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_table", "drop_managed_table"]


def drop_managed_table(spark: SparkSession, table_name: str) -> None:
    """DROP TABLE + best-effort warehouse-dir cleanup: a fresh session can
    find a stale warehouse directory with no catalog entry
    (LOCATION_ALREADY_EXISTS), so the directory is removed too."""
    spark.sql(f"DROP TABLE IF EXISTS `{table_name}`")
    try:
        jvm = spark._jvm
        path = jvm.org.apache.hadoop.fs.Path(
            spark.conf.get("spark.sql.warehouse.dir"), table_name.lower())
        fs = path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        if fs.exists(path):
            fs.delete(path, True)
    except Exception:
        pass  # best-effort; saveAsTable raises a clear error if stuck


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (+ optionally sorted) managed table.  Sorting
    within buckets lets the SMJ skip its sort as well."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a managed (bucketed) table — bucket metadata flows into planning."""
    return spark.table(table_name)
