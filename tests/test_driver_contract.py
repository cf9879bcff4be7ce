"""Mimic the driver's t2 gate: run every ``queries()`` entry at sf0.01 and
hash-compare against its ``oracle_sql()`` in DuckDB, order-insensitively.
This must stay green — it IS what CORRECTNESS_r{N}.json measures."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

from conftest import assert_df_matches_duck

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def duck_oracle():
    con = duckdb.connect()
    for name in ["region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    return con


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None


ALL = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", ALL)
def test_query_vs_oracle(name, spark, duck_oracle):
    q = entrymod.queries()[name]
    sqls = entrymod.oracle_sql()
    df = q(spark, SF_DIR)
    if name in sqls:
        assert_df_matches_duck(df, duck_oracle, sqls[name])
    else:
        # rows-only check (non-SQL-expressible op)
        assert df.count() >= 0


def test_last_verified_round_rules(tmp_path):
    """Rotation rule (queries._last_verified_round): a gate counts as
    verified only when err is null, rows matched, AND the value hash
    didn't fail — a rows-match-but-hash-fail row must sort to the front
    for re-checking.  hash_match absent (rows-only gates) counts."""
    import json

    from steel_datafusion_spark.queries import _last_verified_round

    (tmp_path / "CORRECTNESS_r07.json").write_text(json.dumps({
        "clean": {"err": None, "rows_match": True, "hash_match": True},
        "hash_fail": {"err": None, "rows_match": True, "hash_match": False},
        "rows_only": {"err": None, "rows_match": True},
        "errored": {"err": "boom", "rows_match": False},
    }))
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({
        "clean": {"err": None, "rows_match": True, "hash_match": True},
        "hash_fail": {"err": None, "rows_match": True, "hash_match": True},
    }))
    got = _last_verified_round(root=str(tmp_path))
    assert got["clean"] == 7
    assert got["rows_only"] == 7
    assert got["hash_fail"] == 3      # r7's hash failure doesn't count
    assert "errored" not in got
