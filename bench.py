#!/usr/bin/env python
"""Driver bench harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is timed end-to-end (plan build + execution + row materialization
via a count-style action that forces full evaluation without driver-side
collection of wide results).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from steel_datafusion_spark import session_context
    from steel_datafusion_spark.queries import all_queries

    spark = session_context(app_name="sdf-bench")
    spark.sparkContext.setLogLevel("ERROR")

    registry = all_queries()

    # warm the JVM (scan + join + agg codegen paths) so the first timed
    # query measures the engine, not first-touch compilation
    from steel_datafusion_spark.sources.readers import load_tables
    warm = load_tables(spark, sf_dir)
    if "nation" in warm and "region" in warm:
        (warm["nation"].join(warm["region"],
                             warm["nation"]["n_regionkey"] == warm["region"]["r_regionkey"])
         .groupBy("r_name").count().collect())

    timings: dict[str, float] = {}
    for name, (fn, _sql) in sorted(registry.items()):
        spark.catalog.clearCache()  # drop persisted intermediates between queries
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            # Force full execution and materialization of every output row.
            n = df.toArrow().num_rows
        except Exception as e:  # keep benching; report failure as null
            print(f"bench: {name} FAILED: {e}", file=sys.stderr)
            timings[name] = None
            continue
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"bench: {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    ok = [v for v in timings.values() if v is not None]
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(json.dumps({
        "metric": "total wall time, all catalog queries",
        "value": round(sum(ok), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf else None,
        "n_queries": len(timings),
        "n_failed": len(timings) - len(ok),
    }))


if __name__ == "__main__":
    main()
