#!/usr/bin/env python
"""Round-16 optimization profiler.

Times selected catalog queries exactly the way bench.py does (build fn +
toArrow materialization, catalog cache cleared between queries), captures
``.explain("formatted")`` for each into plans/r16/<name>_<tag>.txt, and
prints a JSON line of per-query seconds.

Usage:
    python tools/profile_r16.py <tag> [query ...]        # default: top set
    SPARK_GRAFT_PROFILE_REPS=N  (default 2; per-query best-of is reported
    alongside all samples)

The plan dump happens AFTER the timed runs (explain triggers its own
planning; never inside the timed region).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLANS_DIR = os.path.join(REPO, "plans", "r16")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "2")))
    dump_plans = os.environ.get("SPARK_GRAFT_PROFILE_PLANS", "1") == "1"

    from steel_datafusion_spark import session_context
    from steel_datafusion_spark.queries import all_queries

    spark = session_context(app_name=f"sdf-profile-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    if not names:
        names = sorted(registry)
    unknown = [n for n in names if n not in registry]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    # identical warmup to bench.py
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

    samples: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(reps):
        for name in names:
            fn = registry[name][0]
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name} [{tag} r{rep}]")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n_rows = df.toArrow().num_rows
            dt = round(time.perf_counter() - t0, 4)
            samples[name].append(dt)
            print(f"profile[{rep + 1}/{reps}] {name}: {dt}s ({n_rows} rows)",
                  file=sys.stderr)
            spark.sparkContext.setJobDescription(None)

    if dump_plans:
        os.makedirs(PLANS_DIR, exist_ok=True)
        for name in names:
            fn = registry[name][0]
            spark.catalog.clearCache()
            try:
                df = fn(spark, sf_dir)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
            except Exception as e:  # plan capture must never block timing
                plan = f"explain failed: {e}"
            with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"),
                      "w") as f:
                f.write(plan)
            print(f"plan: {name}_{tag}.txt", file=sys.stderr)

    out = {
        "tag": tag,
        "sf_dir": sf_dir,
        "reps": reps,
        "best": {n: min(ss) for n, ss in samples.items()},
        "samples": samples,
        "total_best": round(sum(min(ss) for ss in samples.values()), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
