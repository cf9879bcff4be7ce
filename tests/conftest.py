import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from steel_datafusion_spark import session_context

    spark = session_context(app_name="sdf-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def tables(spark):
    from steel_datafusion_spark import load_tables

    return load_tables(spark, SF_DIR)


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for name in ["region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    return con


def assert_df_matches_duck(df, duck, sql, float_tol=1e-9):
    """Order-insensitive comparison of a Spark DataFrame vs a DuckDB query,
    mimicking the driver's canonicalization (sort columns by name, sort rows,
    tolerant float compare)."""
    import math

    sdf = df.toPandas()
    ddf = duck.execute(sql).fetchdf()
    assert sorted(sdf.columns.str.lower()) == sorted(ddf.columns.str.lower()), (
        f"columns differ: {sorted(sdf.columns)} vs {sorted(ddf.columns)}"
    )
    sdf = sdf[sorted(sdf.columns)]
    ddf = ddf[sorted(ddf.columns, key=str.lower)]
    ddf.columns = sorted(sdf.columns)
    assert len(sdf) == len(ddf), f"row counts differ: {len(sdf)} vs {len(ddf)}"

    def canon(frame):
        rows = []
        for rec in frame.itertuples(index=False):
            row = []
            for v in rec:
                if v is None or (isinstance(v, float) and math.isnan(v)):
                    row.append(None)
                elif isinstance(v, float):
                    row.append(round(v, 6))
                else:
                    row.append(v)
            rows.append(tuple(row))
        return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))

    srows, drows = canon(sdf), canon(ddf)
    for i, (a, b) in enumerate(zip(srows, drows)):
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                assert math.isclose(x, y, rel_tol=float_tol, abs_tol=1e-6), (
                    f"row {i}: {a} vs {b}"
                )
            else:
                assert str(x) == str(y), f"row {i}: {a} vs {b}"
