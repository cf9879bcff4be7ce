#!/usr/bin/env python
"""Runnable tour of the manifest-commit table protocol (sources/manifest.py).

The minimal in-repo commit log under merge_upsert and streaming view
maintenance: immutable version dirs, atomic O_EXCL commit files, snapshot
readers, optimistic writers.  This demo drives one table through the full
lifecycle:

    seed        -> version 1
    upsert      -> version 2   (edits + inserts; keyed merge)
    delete      -> version 3   (keyed tombstones)
    time travel -> read versions 1..3 side by side
    vacuum      -> reclaim old data dirs, bound the commit log

Run: python examples/lakehouse_demo.py   (local[*], ~20 s)
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from steel_datafusion_spark import session_context
from steel_datafusion_spark.sources.manifest import (
    alter_table_constraints, latest_commit_info, manifest_delete,
    manifest_upsert, read_table, table_detail, vacuum, write_table_bloom,
)
from steel_datafusion_spark.sources.readers import read_parquet
from steel_datafusion_spark.streaming.operators import (
    streaming_table_changes,
)


def main() -> None:
    spark = session_context(app_name="lakehouse-demo")
    spark.sparkContext.setLogLevel("ERROR")
    root = os.path.join(tempfile.gettempdir(), "sdf_lakehouse_demo")
    for d in (root, root + "_changes", root + "_feedwork"):
        shutil.rmtree(d, ignore_errors=True)

    def show(tag):
        info = latest_commit_info(root)
        rows = sorted((r.k, r.s, r.v)
                      for r in read_parquet(spark, root).collect())
        print(f"{tag}: version {info['version']}, rows {rows}")

    # keep_versions widens the per-write retention so the time-travel
    # section below can still reach version 1 (merge_upsert defaults
    # to a 2-version window)
    seed = spark.createDataFrame(
        [(1, "alpha", 10), (2, "beta", 20), (3, "gamma", 30)],
        "k long, s string, v long")
    manifest_upsert(spark, root, seed, ["k"], keep_versions=10)   # v1
    show("seed   ")

    upd = spark.createDataFrame(
        [(2, "beta-v2", 99), (4, "delta", 40)], "k long, s string, v long")
    manifest_upsert(spark, root, upd, ["k"], keep_versions=10)    # v2
    show("upsert ")

    manifest_delete(spark, root,
                    spark.createDataFrame([(1,)], "k long"), ["k"],
                    keep_versions=10)                             # v3
    show("delete ")

    # time travel: every committed version reads exactly as it was
    for ver in (1, 2, 3):
        rows = sorted((r.k, r.s) for r in
                      read_table(spark, root, version=ver).collect())
        print(f"  as of v{ver}: {rows}")

    # CHECK constraints: registered once, enforced on every later write
    alter_table_constraints(spark, root, add={"v_pos": "v > 0"})  # v4
    try:
        manifest_upsert(spark, root, spark.createDataFrame(
            [(9, "bad", -1)], "k long, s string, v long"), ["k"],
            keep_versions=10)
    except ValueError as e:
        print(f"constraint: rejected bad write -> {str(e)[:70]}…")

    # data skipping: stats sidecar + bloom, then a pruned point lookup
    big = spark.range(5000).selectExpr(
        "id + 100 AS k", "concat('row-', id) AS s", "id + 1 AS v")
    manifest_upsert(spark, root, big, ["k"], keep_versions=10,
                    stats_cols=["k", "v"])                        # v5
    write_table_bloom(spark, root, ["s"])
    hit = read_table(spark, root, where=[("s", "=", "row-4242")])
    print(f"skipping: point lookup opened {len(hit.inputFiles())} of "
          f"{len(read_table(spark, root).inputFiles())} files, "
          f"rows={hit.count()}")

    # change-data-feed: tail the commit log as a stream into a changelog
    feed = streaming_table_changes(
        spark, root, ["k"], root + "_changes", root + "_feedwork",
        starting_version=5)
    print(f"cdf    : {feed.count()} change rows from v5 on "
          f"(schema {feed.columns})")

    # DESCRIBE DETAIL: one metadata-only summary row
    d = table_detail(spark, root).head()
    print(f"detail : v{d.version}, {d.num_files} files, {d.num_rows} rows, "
          f"stats={d.stats_cols}, bloom={d.bloom_cols}, "
          f"constraints={d.constraints}")

    # retention: keep the newest 2 data dirs, bound the audit log to 3
    removed = vacuum(root, keep=2, keep_log=3)
    print(f"vacuum : {removed} old version dir(s) reclaimed; "
          f"log entries left: "
          f"{len(os.listdir(os.path.join(root, '_commits')))}")
    try:
        read_table(spark, root, version=1)
    except FileNotFoundError as e:
        print(f"  v1 after vacuum -> {e}")

    spark.stop()


if __name__ == "__main__":
    main()
