#!/usr/bin/env python
"""Round-16 long-tail profiler: split each catalog query's wall time into
DataFrame CONSTRUCTION (fn(spark, sf_dir) — driver-side py4j traffic +
eager analysis, no job) and EXECUTION (toArrow materialization), exactly
the bench.py methodology otherwise (cache cleared per query, same warmup).

Usage:
    python tools/build_split_r16.py [out.json] [query ...]   # default: all
    SPARK_GRAFT_PROFILE_REPS=N   (default 2; per-phase best-of reported)

Queries whose BUILD phase launches jobs (eager index builds, collects
inside fn) charge that to build — that is the point: build time is the
part a cluster cannot parallelize away.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "2")))

    from steel_datafusion_spark import session_context
    from steel_datafusion_spark.queries import all_queries

    spark = session_context(app_name="sdf-build-split-r16")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    if not names:
        names = sorted(registry)

    from steel_datafusion_spark.sources.readers import load_tables
    warm = load_tables(spark, sf_dir)
    if "nation" in warm and "region" in warm:
        (warm["nation"].join(warm["region"],
                             warm["nation"]["n_regionkey"] == warm["region"]["r_regionkey"])
         .groupBy("r_name").count().collect())
    from pyspark.sql import functions as _F
    from pyspark.sql.functions import pandas_udf as _pudf
    _warm_udf = _pudf(lambda s: s + 1, "long")
    spark.range(32 * 4).repartition(32).select(
        _warm_udf(_F.col("id"))).collect()

    build: dict[str, list[float]] = {n: [] for n in names}
    execu: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(reps):
        for name in names:
            fn = registry[name][0]
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name} [split r{rep}]")
            t0 = time.perf_counter()
            try:
                df = fn(spark, sf_dir)
                t1 = time.perf_counter()
                df.toArrow().num_rows
                t2 = time.perf_counter()
            except Exception as e:
                print(f"split[{rep + 1}] {name} FAILED: {e}",
                      file=sys.stderr)
                continue
            build[name].append(round(t1 - t0, 4))
            execu[name].append(round(t2 - t1, 4))
            print(f"split[{rep + 1}/{reps}] {name}: build "
                  f"{t1 - t0:.3f}s exec {t2 - t1:.3f}s", file=sys.stderr)
            spark.sparkContext.setJobDescription(None)

    rows = []
    for n in names:
        if not build[n]:
            continue
        rows.append({"query": n, "build_best": min(build[n]),
                     "exec_best": min(execu[n]),
                     "build_samples": build[n], "exec_samples": execu[n]})
    rows.sort(key=lambda r: -r["build_best"])
    out = {"sf_dir": sf_dir, "reps": reps,
           "total_build_best": round(sum(r["build_best"] for r in rows), 3),
           "total_exec_best": round(sum(r["exec_best"] for r in rows), 3),
           "rows": rows}
    text = json.dumps(out, indent=1)
    if out_path:
        with open(out_path, "w") as f:
            f.write(text)
    print(json.dumps({k: out[k] for k in
                      ("total_build_best", "total_exec_best")}))
    for r in rows[:25]:
        print(f"{r['build_best']:8.3f}  {r['exec_best']:8.3f}  {r['query']}")


if __name__ == "__main__":
    main()
