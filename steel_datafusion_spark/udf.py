"""UDF surface — ``define-udf`` / ``udf/call`` done right.

Reference: ``define-udf`` (main.rs:598-636, thread bridge main.rs:585-596,
reg :580) creates+registers a scalar UDF with declared Arrow arg/return types
and Immutable volatility; ``udf/call`` (main.rs:139-141, reg :521) applies the
returned handle to argument expressions.

The reference's kernel is a stub: it ignores the input batch and always
returns NULL (main.rs:622-629, "TODO: How to do zero copy").  We implement the
*declared intent* — real vectorized evaluation honoring the return type —
via ``pandas_udf`` (Arrow-batched: the moral equivalent of the zero-copy
kernel the reference TODO'd; ~10-100× faster than row-at-a-time Python UDFs
and the only sane Python path at 100 TB).  Divergence recorded (SURVEY.md
§4.1).

Like the reference, definition both registers the name in the session catalog
(SQL use) and returns a first-class handle (DataFrame use).
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DataType

__all__ = ["define_udf", "udf_call", "ScalarUDF"]


class ScalarUDF:
    """First-class UDF handle (reference ``SteelScalarUDF``, main.rs:107-108)."""

    def __init__(self, name: str, arg_types: Sequence[DataType],
                 return_type: DataType, fn: Callable, wrapped):
        self.name = name
        self.arg_types = list(arg_types)
        self.return_type = return_type
        self.fn = fn
        self._wrapped = wrapped

    def __call__(self, *cols: Column) -> Column:
        if len(cols) != len(self.arg_types):
            raise TypeError(
                f"UDF {self.name!r} expects {len(self.arg_types)} args, got {len(cols)}"
            )
        # DataFusion enforces the declared signature by coercing each input
        # (main.rs:617-630 declares the types; the engine casts).  Mirror it:
        # cast every argument to its declared type, so the kernel always sees
        # the batch dtype it was written for, and an incoercible argument
        # (array → double, etc.) fails analysis eagerly instead of feeding
        # the kernel mistyped data.
        coerced = [
            (c if isinstance(c, Column) else F.col(c)).cast(t)
            for c, t in zip(cols, self.arg_types)
        ]
        return self._wrapped(*coerced)


def define_udf(
    spark: SparkSession,
    name: str,
    arg_types: Sequence[DataType],
    return_type: DataType,
    fn: Callable,
    vectorized: bool = True,
) -> ScalarUDF:
    """Create + register a scalar UDF (main.rs:598-636).

    ``vectorized=True`` wraps ``fn`` as a pandas_udf: ``fn`` receives
    ``pandas.Series`` batches (one per declared arg) and must return a Series —
    Arrow transfer end-to-end.  ``vectorized=False`` falls back to a
    row-at-a-time Python UDF (slow path; only for non-vectorizable logic).

    Declared ``arg_types`` are enforced at call time: every argument is cast
    to its declared type before the kernel runs (DataFusion's signature
    coercion, main.rs:617-630), so the kernel always receives the batch
    dtype it declared; an incoercible argument surfaces as an eager
    AnalysisException, not mistyped batches at execution.
    """
    if vectorized:
        wrapped = F.pandas_udf(fn, returnType=return_type)
    else:
        wrapped = F.udf(fn, returnType=return_type)
    spark.udf.register(name, wrapped)  # catalog path, for spark.sql queries
    return ScalarUDF(name, arg_types, return_type, fn, wrapped)


def udf_call(udf: ScalarUDF, args: Sequence[Column]) -> Column:
    """Apply a UDF handle to argument expressions (main.rs:139-141, reg :521)."""
    return udf(*args)
