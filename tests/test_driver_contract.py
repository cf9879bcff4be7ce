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


def test_rows_only_driver_rows_sort_ahead_of_hash_green_peers(tmp_path):
    """A gate whose newest driver row was rows-only (err='no_oracle')
    counts as round - 0.5, so it re-enters the 50-cap rotation BEFORE
    same-round hash-green gates — this is how sketch_distinct_rollup got
    its first hash row after its r05 no_oracle row."""
    import json

    from steel_datafusion_spark.queries import _last_verified_round

    (tmp_path / "CORRECTNESS_r05.json").write_text(json.dumps({
        "hash_green": {"err": None, "rows_match": True, "hash_match": True},
        "rows_only_drive": {"err": "no_oracle", "rows_match": None,
                            "spark_rows": 12},
    }))
    got = _last_verified_round(root=str(tmp_path))
    assert got["hash_green"] == 5
    assert got["rows_only_drive"] == 4.5


def test_no_gate_driver_evidence_older_than_rotation_window():
    """Staleness invariant (VERDICT r6 #2): with a 50-entry driver cap and
    least-recently-verified-first rotation, a gate waits at most
    ceil(catalog / 50) rounds between driver rows, so every gate that has
    EVER had a committed driver row must have one no older than
    max_round - ceil(catalog / 50).  (The original fixed 2-round window
    held while the catalog fit in 3 driver files; it scales with catalog
    size now.)  Gates never seen by the driver (added this round) are
    exempt — they sort first and get their row next round; their count
    must fit the cap."""
    import math

    from steel_datafusion_spark.queries import all_queries, _last_verified_round

    verified = _last_verified_round()
    if not verified:
        pytest.skip("no committed CORRECTNESS artifacts")
    max_round = int(max(verified.values()))
    gates = list(all_queries())
    window = math.ceil(len(gates) / 50)
    stale = {n: verified[n] for n in gates
             if n in verified and verified[n] < max_round - window}
    assert not stale, (
        f"gates with driver evidence older than r{max_round - window}: "
        f"{stale} — the rotation should have resurfaced these; check the "
        f"50-cap math (catalog size {len(gates)})")
    never = [n for n in gates if n not in verified]
    assert len(never) <= 50, (
        f"{len(never)} gates have never had a driver row — more than one "
        f"round's cap can absorb")


def test_catalog_generator_classifies_every_gate(tmp_path):
    """tools/gen_catalog.py must classify every registry gate into a
    family (exit 0) so the README staleness table stays complete as the
    catalog grows."""
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # run against a scratch copy of README so the test never mutates it
    import shutil
    shutil.copy(os.path.join(root, "README.md"), tmp_path / "README.md")
    r = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "gen_catalog.py")],
        capture_output=True, text=True, cwd=root)
    assert r.returncode == 0, r.stderr
    shutil.copy(tmp_path / "README.md", os.path.join(root, "README.md"))


def test_committed_local_oracle_covers_full_catalog():
    """The committed same-round local-oracle artifact (ORACLE_LOCAL_r*.json,
    tools/oracle_check.py --json) must cover EXACTLY the current catalog
    (VERDICT r7 item 4: r7's artifact predated the final gate and read
    106/107) — so the rotation math and the judge read one file."""
    import glob
    import json as _json

    from steel_datafusion_spark.queries import all_queries

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(root, "ORACLE_LOCAL_r*.json")))
    if not files:
        pytest.skip("no committed local-oracle artifacts")
    latest = files[-1]
    data = _json.loads(open(latest).read())
    entries = data.get("results", data)
    assert set(entries) == set(all_queries()), (
        f"{os.path.basename(latest)} covers {len(entries)} gates but the "
        f"catalog has {len(all_queries())} — regenerate it with "
        f"tools/oracle_check.py --json in the same commit as the last "
        f"catalog change")
