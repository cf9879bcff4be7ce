"""Arrow↔Spark type tokens — the ``steel/datafusion/datatypes`` module.

The reference registers exactly 17 Arrow type tokens
(/root/reference/src/main.rs:392-469).  Spark has no unsigned or half-float
types, so those widen per the same convention Spark's own Parquet reader uses
(u8→short, u16→int, u32→long, u64→decimal(20,0), f16→float).
"""

from __future__ import annotations

from pyspark.sql import types as T

__all__ = [
    "Null", "Boolean", "Int8", "Int16", "Int32", "Int64",
    "UInt8", "UInt16", "UInt32", "UInt64",
    "Float16", "Float32", "Float64",
    "Binary", "LargeBinary", "Utf8", "LargeUtf8",
    "DATATYPES",
]

Null = T.NullType()                  # main.rs:397-400
Boolean = T.BooleanType()            # main.rs:401-404
Int8 = T.ByteType()                  # main.rs:405-408
Int16 = T.ShortType()                # main.rs:409-412
Int32 = T.IntegerType()              # main.rs:413-416
Int64 = T.LongType()                 # main.rs:417-420
UInt8 = T.ShortType()                # main.rs:421-424 (widened: Spark has no unsigned)
UInt16 = T.IntegerType()             # main.rs:425-428 (widened)
UInt32 = T.LongType()                # main.rs:429-432 (widened)
UInt64 = T.DecimalType(20, 0)        # main.rs:433-436 (only lossless container)
Float16 = T.FloatType()              # main.rs:437-440 (widened: no half-float)
Float32 = T.FloatType()              # main.rs:441-444
Float64 = T.DoubleType()             # main.rs:445-448
Binary = T.BinaryType()              # main.rs:449-452
LargeBinary = T.BinaryType()         # main.rs:453-458 (offset width is physical detail)
Utf8 = T.StringType()                # main.rs:459-462
LargeUtf8 = T.StringType()           # main.rs:463-466

DATATYPES: dict[str, T.DataType] = {
    "Null": Null, "Boolean": Boolean,
    "Int8": Int8, "Int16": Int16, "Int32": Int32, "Int64": Int64,
    "UInt8": UInt8, "UInt16": UInt16, "UInt32": UInt32, "UInt64": UInt64,
    "Float16": Float16, "Float32": Float32, "Float64": Float64,
    "Binary": Binary, "LargeBinary": LargeBinary,
    "Utf8": Utf8, "LargeUtf8": LargeUtf8,
}
