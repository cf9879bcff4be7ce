"""``df/describe`` — DataFusion-shaped summary statistics.

The reference's describe (main.rs:533-541) delegates to DataFusion
``DataFrame::describe``, which emits one row per statistic with a leading
``describe`` column and the stats ``count, null_count, mean, std, min, max,
median`` for every column (strings get NULL for numeric-only stats).

Spark's ``df.describe()`` lacks null_count and median, so this builds the
exact DataFusion column set from one aggregation pass (single job, one
partial→final agg — no per-column jobs, which matters when describing a
wide 100 TB table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["df_describe"]

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)

_STATS = ["count", "null_count", "mean", "std", "min", "max", "median"]


def df_describe(df: DataFrame, approx_median: bool = False,
                accuracy: int = 10000) -> DataFrame:
    """One row per statistic, one column per input column, all stringly-typed
    (DataFusion renders everything as Utf8 in the describe frame).

    ``approx_median=True`` is the 100 TB scale path: exact ``F.median`` needs
    a full per-group sort/materialization per column, while percentile_approx
    keeps an O(accuracy) mergeable GK summary (rank error ≤ n/accuracy) —
    the only describe statistic whose exact form doesn't stream."""
    spark = df.sparkSession
    med = ((lambda c: F.percentile_approx(c, 0.5, accuracy)) if approx_median
           else F.median)
    aggs = []
    for f in df.schema.fields:
        c = F.col(f.name)
        numeric = isinstance(f.dataType, _NUMERIC)
        orderable = not isinstance(f.dataType, (T.MapType, T.ArrayType, T.StructType,
                                                T.BinaryType, T.NullType))
        aggs.append(F.count(c).alias(f"{f.name}__count"))
        aggs.append(F.sum(c.isNull().cast("long")).alias(f"{f.name}__null_count"))
        aggs.append((F.avg(c) if numeric else F.lit(None)).alias(f"{f.name}__mean"))
        aggs.append((F.stddev_samp(c) if numeric else F.lit(None)).alias(f"{f.name}__std"))
        aggs.append((F.min(c) if orderable else F.lit(None)).alias(f"{f.name}__min"))
        aggs.append((F.max(c) if orderable else F.lit(None)).alias(f"{f.name}__max"))
        aggs.append((med(c) if numeric else F.lit(None)).alias(f"{f.name}__median"))
    row = df.agg(*aggs).collect()[0].asDict()

    names = [f.name for f in df.schema.fields]
    data = []
    for stat in _STATS:
        rec = {"describe": stat}
        for n in names:
            v = row[f"{n}__{stat}"]
            rec[n] = None if v is None else str(v)
        data.append(rec)
    schema = T.StructType(
        [T.StructField("describe", T.StringType())]
        + [T.StructField(n, T.StringType()) for n in names]
    )
    return spark.createDataFrame(data, schema=schema)
