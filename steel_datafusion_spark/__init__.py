"""steel_datafusion_spark — a PySpark-native analytics engine with the
capability surface of mattwparas/steel-datafusion.

The reference is a Steel(Scheme) REPL binding over Apache DataFusion 42: a
thin embedding language over an industrial OLAP engine.  This package is the
idiomatic Spark analogue — a thin Python API over Spark SQL/Catalyst — plus
the large-scale data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) a 100 TB training-data pipeline needs.

Layers
------
- ``session``      — session_context (SparkSession config: AQE, Arrow, UTC)
- ``datatypes``    — the 17 Arrow type tokens (main.rs:392-469)
- ``expressions``  — col/lit/arithmetic/boolean/LIKE/CASE/sort constructors
- ``operators``    — the df/* relational surface + distinct_on + describe
- ``sources``      — read_csv (reference parity), read_parquet, test tables
- ``functions``    — aggregate + window constructors (intended surface of the
                     unregistered DataFusion bindings, SURVEY.md §2.5-2.6)
- ``plans``        — df_explain returning plans as a DataFrame
- ``udf``          — define_udf/udf_call over pandas_udf (vectorized)
- ``pipeline``     — beyond-reference: dedup, similarity, text, multimodal
- ``streaming``    — beyond-reference: Structured Streaming surface
"""

from .session import session_context
from .datatypes import DATATYPES
from .expressions import (
    col, lit, alias,
    col_add, col_sub, col_mul, col_div, col_idiv,
    col_and, col_or, col_not,
    col_ge, col_le, col_gt, col_lt, col_eq, col_ne,
    col_like, col_ilike, col_not_like, col_not_ilike,
    CaseBuilder, case, when, case_with_when, case_otherwise, case_end,
    SortExpr, sort_asc, sort_desc,
)
from .operators.relational import (
    JOIN_TYPES,
    df_select, df_filter, df_with_column, df_with_column_renamed,
    df_limit, df_sort_by, df_sort,
    df_union, df_union_distinct, df_intersect, df_except,
    df_distinct, df_distinct_on, df_aggregate, df_window,
    df_join, df_join_on,
    df_count, df_collect, df_show, df_show_limit,
)
from .operators.describe import df_describe
from .plans.explain import df_explain, explain_string
from .sources.readers import read_csv, read_parquet, load_tables, write_parquet
from .functions.aggregates import (
    agg_sum, agg_count, agg_count_star, agg_avg, agg_min, agg_max,
    agg_count_distinct, agg_approx_count_distinct, agg_stddev, agg_variance,
    agg_corr, agg_median, agg_first, agg_last, sum_exact, avg_exact,
)
from .functions.windows import (
    window_spec, rows_between, range_between,
    w_row_number, w_rank, w_dense_rank, w_percent_rank, w_ntile,
    w_lag, w_lead, w_first_value, w_last_value, w_nth_value,
)
from .udf import define_udf, udf_call, ScalarUDF

__version__ = "0.1.0"
