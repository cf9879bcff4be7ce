"""Local replica of the driver's correctness gate.

Runs named queries from ``__spark_entry__.queries()`` at a given sf dir and
compares each against its ``oracle_sql()`` entry executed in DuckDB over the
same parquet tables: row count, column-name set, and an order-insensitive
value comparison (columns sorted by name, rows sorted, floats rounded).

Usage:
    python tools/oracle_check.py [--sf /root/testdata/sf0.01] \
        [--json ORACLE_LOCAL_rN.json] [names...]

With no names, checks every query that has an oracle.  Exit code = number of
failures.  This exists so a round can verify a changed operator BEFORE the
driver's 50-entry-capped artifact does (VERDICT r3 "What's wrong" #1), and —
with ``--json`` — to commit a full-catalog per-round correctness artifact
(ORACLE_LOCAL_r{N}.json) so every oracled gate has same-round evidence
regardless of the driver cap (VERDICT r5 item 1)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _canon(df):
    """pandas frame -> sorted list of rounded tuples, order-insensitive."""
    import pandas as pd

    df = df[sorted(df.columns)]

    def _f(x: float):
        # 12 significant digits ≈ the driver's 1e-9 RELATIVE tolerance;
        # absolute decimal rounding would spuriously fail large-magnitude
        # sums (5e9-scale decimals vs double differ at the 1e-15 rel level)
        return float(f"{x:.12g}")

    rows = []
    for tup in df.itertuples(index=False, name=None):
        out = []
        for v in tup:
            if v is None or (isinstance(v, float) and v != v):
                out.append(None)
            elif isinstance(v, float):
                out.append(_f(v))
            elif hasattr(v, "item"):  # numpy scalars
                iv = v.item()
                out.append(_f(iv) if isinstance(iv, float) else iv)
            elif isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
                out.append(str(v.tolist() if hasattr(v, "tolist") else v))
            else:
                out.append(v)
        rows.append(tuple(str(x) for x in out))
    rows.sort()
    return rows


def main() -> int:
    import duckdb

    import __spark_entry__ as entry
    from steel_datafusion_spark import session_context

    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i:i + 2]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        del args[i:i + 2]
    results: dict[str, dict] = {}

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = args or [n for n in qs if n in oracles]

    spark = session_context(app_name="oracle-check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = 0
    for name in names:
        if name not in qs:
            print(f"{name}: NOT IN REGISTRY")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name}: rows-only (no oracle)")
            try:
                n = qs[name](spark, sf_dir).count()
                print(f"  spark rows={n}")
                results[name] = {"rows_match": None, "vals_match": None,
                                 "spark_rows": n, "oracle_rows": None,
                                 "err": "no_oracle"}
            except Exception as e:
                print(f"  SPARK ERROR: {e}")
                failures += 1
                results[name] = {"rows_match": None, "vals_match": None,
                                 "spark_rows": None, "oracle_rows": None,
                                 "err": f"spark: {e}"[:300]}
            continue
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as e:
            print(f"{name}: SPARK ERROR: {e}")
            failures += 1
            results[name] = {"rows_match": None, "vals_match": None,
                             "spark_rows": None, "oracle_rows": None,
                             "err": f"spark: {e}"[:300]}
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"{name}: ORACLE ERROR: {e}")
            failures += 1
            results[name] = {"rows_match": None, "vals_match": None,
                             "spark_rows": len(sdf), "oracle_rows": None,
                             "err": f"oracle: {e}"[:300]}
            continue
        rows_ok = len(sdf) == len(odf)
        cols_ok = sorted(sdf.columns) == sorted(odf.columns)
        vals_ok = cols_ok and _canon(sdf) == _canon(odf)
        status = "OK" if (rows_ok and cols_ok and vals_ok) else "FAIL"
        if status == "FAIL":
            failures += 1
        results[name] = {"rows_match": rows_ok, "cols_match": cols_ok,
                         "vals_match": vals_ok, "spark_rows": len(sdf),
                         "oracle_rows": len(odf), "err": None}
        print(f"{name}: {status} (rows {len(sdf)}/{len(odf)}, "
              f"cols_match={cols_ok}, vals_match={vals_ok})")
        if not cols_ok:
            print(f"  spark cols: {sorted(sdf.columns)}")
            print(f"  oracle cols: {sorted(odf.columns)}")
        elif not vals_ok:
            a, b = _canon(sdf), _canon(odf)
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"  first diffs: {diff}")
    print(f"\n{len(names) - failures}/{len(names)} passed")
    if json_path:
        import json
        import subprocess

        try:  # provenance: prove the artifact postdates the code it checks
            head = subprocess.run(
                ["git", "rev-parse", "HEAD"], capture_output=True,
                text=True, cwd=os.path.dirname(os.path.abspath(__file__)),
                timeout=10).stdout.strip()
        except Exception:
            head = None
        with open(json_path, "w") as f:
            json.dump({"sf_dir": sf_dir, "head_commit": head,
                       "n_checked": len(names),
                       "n_failed": failures, "results": results}, f, indent=1)
        print(f"wrote {json_path}")
    return failures


if __name__ == "__main__":
    sys.exit(main())
