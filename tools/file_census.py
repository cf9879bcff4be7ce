#!/usr/bin/env python
"""File-census sweep for the data-skipping layer (VERDICT r11 item 5).

The pruned read (`sources/manifest.py _read_pruned`) claims a DRIVER-SIDE
O(files) walk — dict lookups per file, no Spark job — and the earlier
sweeps top out at ~500 files.  This tool defends the claim at 10^2..10^5
files: a synthetic manifest version with N tiny parquet files (pyarrow
direct writes, so data volume stays ~fixed while the FILE COUNT scales a
decade per step), stats backfilled over the clustered key (+ a bloom
column at <=10^4 files, where the build's one column scan over N files
is still reasonable locally), then measured:

- stats_build_s: write_table_stats wall (footer metadata reads, O(files))
- bloom_build_s: write_table_bloom wall (one column scan)
- prune_s: read_table(where=point) DataFrame CONSTRUCTION wall — this IS
  the driver-side pruning (sidecar parse + per-file verdicts + the
  survivor-only Spark relation); no job has run yet
- read_s: collect wall for the pruned read (opens only admitted files)
- files_opened, rows, and the driver's maxrss high-water (MB)

Usage:
    python tools/file_census.py [--out bench_runs/file_census.json]
                                [--counts 100,1000,10000] [--deep]

--deep appends 100000 to the counts (stats-only; ~5 min of tiny writes).
"""

from __future__ import annotations

import json
import os
import resource
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _maxrss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def build_table(root: str, n_files: int, rows_per_file: int = 20) -> None:
    """N tiny files under one committed manifest version: file i holds
    k in [i*rpf, (i+1)*rpf) — range-clustered, so a point lookup on k is
    answerable from min/max stats alone and admits exactly one file."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from steel_datafusion_spark.sources.manifest import (
        commit_version, new_version_dir,
    )

    data_dir = new_version_dir(root, 1)
    schema = pa.schema([("k", pa.int64()), ("uid", pa.string())])
    for i in range(n_files):
        lo = i * rows_per_file
        ks = list(range(lo, lo + rows_per_file))
        uids = [hashlib.md5(str(k).encode()).hexdigest() for k in ks]
        pq.write_table(
            pa.table({"k": ks, "uid": uids}, schema=schema),
            os.path.join(data_dir, f"part-{i:06d}.parquet"),
            compression="none")
    commit_version(root, 1, data_dir)


def main() -> int:
    out_path = "bench_runs/file_census.json"
    args = sys.argv[1:]
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i:i + 2]
    counts = [100, 1000, 10000]
    if "--counts" in args:
        i = args.index("--counts")
        counts = [int(x) for x in args[i + 1].split(",")]
        del args[i:i + 2]
    if "--deep" in args:
        counts.append(100000)

    from steel_datafusion_spark import session_context
    from steel_datafusion_spark.sources.manifest import (
        read_table, write_table_bloom, write_table_stats,
    )

    spark = session_context(app_name="file-census")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    base = f"/tmp/sdf_file_census/{uuid.uuid4().hex[:8]}"
    for n in counts:
        root = os.path.join(base, f"n{n}")
        t0 = time.perf_counter()
        build_table(root, n)
        gen_s = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        covered = write_table_stats(root, ["k"])
        stats_s = round(time.perf_counter() - t0, 3)
        assert covered == n
        bloom_s = None
        if n <= 10000:
            t0 = time.perf_counter()
            write_table_bloom(spark, root, ["uid"], bits=1 << 8)
            bloom_s = round(time.perf_counter() - t0, 3)
        mid = (n * 20) // 2 + 3
        t0 = time.perf_counter()
        df = read_table(spark, root, where=[("k", "=", mid)])
        prune_s = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        rows = df.collect()
        read_s = round(time.perf_counter() - t0, 3)
        opened = len(df.inputFiles())
        row = {"n_files": n, "gen_s": gen_s, "stats_build_s": stats_s,
               "bloom_build_s": bloom_s, "prune_s": prune_s,
               "read_s": read_s, "files_opened": opened,
               "rows": len(rows), "driver_maxrss_mb": round(_maxrss_mb(), 1)}
        if bloom_s is not None:
            target = read_table(spark, root).filter(
                f"k = {mid}").head().uid
            t0 = time.perf_counter()
            bdf = read_table(spark, root, where=[("uid", "=", target)])
            row["bloom_prune_s"] = round(time.perf_counter() - t0, 3)
            row["bloom_files_opened"] = len(bdf.inputFiles())
            row["bloom_rows"] = bdf.count()
        results[f"n{n}"] = row
        print(f"n={n}: gen {gen_s}s, stats {stats_s}s, bloom {bloom_s}s, "
              f"prune {prune_s}s, read {read_s}s, opened {opened}, "
              f"maxrss {row['driver_maxrss_mb']} MB"
              + (f", bloom prune {row.get('bloom_prune_s')}s opened "
                 f"{row.get('bloom_files_opened')}"
                 if bloom_s is not None else ""), flush=True)
        shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
