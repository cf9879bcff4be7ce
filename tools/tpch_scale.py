#!/usr/bin/env python
"""TPC-H-shaped relational gates across THREE fact decades (VERDICT r11
item 7): the document-op sweeps cover sf10x, but the relational gates'
last measured decade was sf0.1.  This tool synthesizes an sf1-equivalent
fact volume — orders+lineitem unioned 10x with disjoint orderkey spaces
(offset by a clean stride; custkey/partkey/suppkey untouched, so the
dim side and every join's fan-out per fact row are preserved, making
linear wall growth the ground truth) — and runs the Q3/Q9/Q18-shaped
gates (shipping_priority, product_profit, big_orders) at
sf0.01 / sf0.1 / sf1x, recording wall + per-op shuffle-write bytes and
the decade-over-decade exponents.

Usage: python tools/tpch_scale.py [--out bench_runs/tpch_scale.json]
                                  [--rebuild] [--deep]

--deep adds an sf10x decade (100x sf0.1 = 60M lineitem rows, built as
10 disjoint-key copies of the sf1x build).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF1X_DIR = "/tmp/sdf_scale_tpch_sf1x"
SF10X_DIR = "/tmp/sdf_scale_tpch_sf10x"
# pricing_summary is the flagship Q1 shape (lineitem-only scan + 4-key
# agg — pure map-side partial aggregation, the cleanest linear decade);
# added r14 so the pipeline flagship has a measured sf10x row, not just
# the join shapes (VERDICT r13 item 5)
OPS = ["pricing_summary", "shipping_priority", "product_profit",
       "big_orders"]
REPS = 2
STRIDE = 10_000_000  # > max o_orderkey at sf0.1 (600k*4); keeps keys int64


def build_sf1x(spark, src_dir: str, out_dir: str, copies: int = 10,
               stride: int = STRIDE) -> None:
    from steel_datafusion_spark.sources.readers import load_tables

    os.makedirs(out_dir, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part",
              "partsupp", "documents", "embeddings", "events"):
        src = os.path.join(src_dir, f"{t}.parquet")
        if os.path.exists(src):
            shutil.copy(src, os.path.join(out_dir, f"{t}.parquet"))
    tabs = load_tables(spark, src_dir)
    for t, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        base = tabs[t]
        out = None
        for i in range(copies):
            c = base.withColumn(key, F.col(key) + F.lit(i * stride))
            out = c if out is None else out.unionByName(c)
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{t}.parquet"))
        print(f"  built {t}: {copies}x", flush=True)


def main() -> int:
    out_path = "bench_runs/tpch_scale.json"
    args = sys.argv[1:]
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i:i + 2]

    import __spark_entry__ as entry
    from steel_datafusion_spark import session_context
    from tools.scale_sweep import total_shuffle_write_bytes

    spark = session_context(app_name="tpch-scale")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    deep = "--deep" in args
    if "--rebuild" in args:
        shutil.rmtree(SF1X_DIR, ignore_errors=True)
        shutil.rmtree(SF10X_DIR, ignore_errors=True)
    if not os.path.exists(os.path.join(SF1X_DIR, "lineitem.parquet")):
        print("building synthetic sf1x (10x sf0.1 facts) ...", flush=True)
        build_sf1x(spark, "/root/testdata/sf0.1", SF1X_DIR)
    if deep and not os.path.exists(
            os.path.join(SF10X_DIR, "lineitem.parquet")):
        # one more decade from the sf1x build (10x again, disjoint key
        # spaces via a 10x stride): 60M lineitem rows — the decade that
        # makes the linear-shuffle claim load-bearing (VERDICT r12
        # item 6: at sf1 fixed overhead still dominated the exponents)
        print("building synthetic sf10x (100x sf0.1 facts) ...", flush=True)
        build_sf1x(spark, SF1X_DIR, SF10X_DIR, stride=STRIDE * 10)

    scales = [("sf0.01", "/root/testdata/sf0.01"),
              ("sf0.1", "/root/testdata/sf0.1"),
              ("sf1x", SF1X_DIR)]
    if deep:
        scales.append(("sf10x", SF10X_DIR))
    results: dict[str, dict] = {}
    for sc_name, sc_dir in scales:
        from steel_datafusion_spark.sources.readers import load_tables

        n_li = load_tables(spark, sc_dir)["lineitem"].count()
        row: dict = {"n_lineitem": n_li, "ops": {}}
        print(f"\n== {sc_name}: {n_li} lineitem rows", flush=True)
        for op in OPS:
            times, n_out, shuffle_mb = [], None, []
            for _ in range(REPS):
                sh0 = total_shuffle_write_bytes(spark)
                t0 = time.perf_counter()
                n_out = qs[op](spark, sc_dir).toArrow().num_rows
                times.append(round(time.perf_counter() - t0, 3))
                sh1 = total_shuffle_write_bytes(spark)
                shuffle_mb.append(
                    round((sh1 - sh0) / 1e6, 2) if sh0 >= 0 and sh1 >= 0
                    else None)
                spark.catalog.clearCache()
            row["ops"][op] = {"times_s": times, "best_s": min(times),
                              "n_out": n_out,
                              "shuffle_write_mb": shuffle_mb}
            print(f"   {op}: {times} s, {n_out} rows, "
                  f"shuffle {shuffle_mb} MB", flush=True)
        results[sc_name] = row

    # decade exponents: log10(t_next/t_prev) per adjacent scale pair
    exps: dict[str, list] = {}
    names = [s for s, _ in scales]
    for op in OPS:
        es = []
        for a, b in zip(names, names[1:]):
            ta = results[a]["ops"][op]["best_s"]
            tb = results[b]["ops"][op]["best_s"]
            na = results[a]["n_lineitem"]
            nb = results[b]["n_lineitem"]
            if ta > 0 and tb > 0 and nb > na:
                es.append(round(math.log(tb / ta) / math.log(nb / na), 2))
        exps[op] = es
    results["_exponents"] = exps
    print(f"\nexponents (wall vs lineitem rows): {exps}", flush=True)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
