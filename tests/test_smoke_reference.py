"""t1 smoke: 1:1 port of the reference demo script /root/reference/test.scm.

Expected behavior against example.csv (a,b,c = 1,2,3 / 20,10,50):
the result contains the row (a=20, b=10) and excludes (a=1, b=2)
(test.scm:11-14).  Our UDF column carries real values (the reference's UDF
kernel is a NULL-returning stub, main.rs:622-629 — divergence documented in
SURVEY.md §4.1; here the udf is the identity so behavior is observable).
"""

import os

from steel_datafusion_spark import (
    col, col_ge, define_udf, df_filter, df_select, read_csv, udf_call,
)
from steel_datafusion_spark.datatypes import Int64


def test_smoke_port(spark, tmp_path):
    csv = tmp_path / "example.csv"
    csv.write_text("a,b,c\n1,2,3\n20,10,50\n")

    df = read_csv(spark, str(csv))

    my_udf = define_udf(
        spark, "smoke-identity", [Int64], Int64, lambda s: s, vectorized=True
    )

    out = df_filter(
        df_select(df, [col("a"), col("b"), udf_call(my_udf, [col("a")]).alias("u")]),
        col_ge(col("a"), col("b")),
    )
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["a"] == 20 and rows[0]["b"] == 10 and rows[0]["u"] == 20


def test_udf_declared_arg_types_enforced(spark):
    """DataFusion coerces inputs to the declared signature (main.rs:617-630).
    A long column declared double must reach the kernel as float64, and an
    incoercible argument (array -> double) must fail analysis eagerly."""
    import pandas as pd
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from pyspark.sql.utils import AnalysisException

    from steel_datafusion_spark import define_udf, udf_call

    seen_dtypes = []

    def kernel(s: pd.Series) -> pd.Series:
        seen_dtypes.append(str(s.dtype))
        return s * 2.0

    u = define_udf(spark, "dbl_it", [T.DoubleType()], T.DoubleType(), kernel)
    df = spark.range(5)  # id is long, declared double
    out = df.select(udf_call(u, [F.col("id")]).alias("v")).collect()
    assert [r.v for r in out] == [0.0, 2.0, 4.0, 6.0, 8.0]

    arr = df.select(F.array(F.col("id")).alias("a"))
    with pytest.raises(AnalysisException):
        arr.select(udf_call(u, [F.col("a")]))
