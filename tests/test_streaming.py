"""Streaming extension: finite-stream runs must match the batch results
(batch parity is the correctness oracle for streaming operators, which are
not SQL-expressible for the driver gate)."""

import pytest
from pyspark.sql import functions as F

from steel_datafusion_spark.sources.readers import load_tables
from steel_datafusion_spark.streaming.operators import (
    read_stream_parquet, run_stream_to_memory, session_rollup,
    streaming_dedup, windowed_rollup,
)

from conftest import SF_DIR


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    # re-write events as a clean µs-timestamp parquet dir (a stream source
    # needs a directory + explicit schema; the raw testdata is ns-typed)
    out = str(tmp_path_factory.mktemp("events_stream"))
    ev = load_tables(spark, SF_DIR)["events"]
    ev.write.mode("overwrite").parquet(out)
    return out


def test_windowed_rollup_matches_batch(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    stream = read_stream_parquet(spark, events_dir, batch.schema)

    got = run_stream_to_memory(
        windowed_rollup(stream, window="1 hour", watermark="2 hours"),
        "rollup_test",
    ).orderBy("window_start", "event_type").collect()

    # append mode emits a window only once the watermark passes its end:
    # at end-of-stream the watermark is max(ts) - 2h, so trailing windows
    # (end > cutoff) legitimately stay in state.  Model that cutoff exactly.
    cutoff = batch.agg(
        (F.max("ts") - F.expr("INTERVAL 2 HOURS")).alias("c")).collect()[0].c
    want = (
        batch.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("value").cast("decimal(28,10)")).cast("double").alias("sum_value"),
             F.min("value").alias("min_value"),
             F.max("value").alias("max_value"))
        .filter(F.col("w.end") <= F.lit(cutoff))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n", "sum_value", "min_value", "max_value")
        .orderBy("window_start", "event_type").collect()
    )
    assert len(got) == len(want) and len(got) > 0
    for g, w in zip(got, want):
        assert g == w


def test_session_rollup_matches_batch(spark, events_dir):
    """session_window parity: the identical expression runs in batch mode,
    so the finalized sessions of a finite stream must equal the batch
    sessions exactly (same gap, same keys, same decimal-sum values)."""
    batch = spark.read.parquet(events_dir)
    stream = read_stream_parquet(spark, events_dir, batch.schema)
    got = run_stream_to_memory(
        session_rollup(stream, gap="30 minutes"), "sess_rollup",
    ).orderBy("session_start", "user_id").collect()

    # append mode finalizes a session only once the watermark (max ts - 2h
    # at end-of-stream) passes its end — trailing sessions stay in state
    cutoff = batch.agg(
        (F.max("ts") - F.expr("INTERVAL 2 HOURS")).alias("c")).collect()[0].c
    want = (session_rollup(batch, gap="30 minutes")
            .filter(F.col("session_end") <= F.lit(cutoff))
            .orderBy("session_start", "user_id").collect())
    assert len(got) == len(want) > 0
    assert got == want
    # sessions are genuinely gap-merged: at least one session holds >1 event
    assert any(r.n_events > 1 for r in want)


def test_streaming_dedup_bounded(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    stream = read_stream_parquet(spark, events_dir, batch.schema)
    got = run_stream_to_memory(
        streaming_dedup(stream, ["user_id"], watermark="365 days"),
        "dedup_test",
    )
    n_users = batch.select("user_id").distinct().count()
    # each user exactly once (finite input, watermark wider than the data)
    assert got.count() == n_users
    assert got.select("user_id").distinct().count() == n_users


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("docs_stream"))
    load_tables(spark, SF_DIR)["documents"].select("doc_id", "text") \
        .write.mode("overwrite").parquet(out)
    return out


def test_streaming_curation_pipeline_matches_batch(spark, docs_dir):
    """The stateless curation ops (PII redaction, deterministic split) are
    streaming-safe by construction — pure projections with no
    order/partition dependence.  Prove it: the same composition over a
    stream equals the batch result row-for-row."""
    from steel_datafusion_spark.pipeline.sampling import hash_split
    from steel_datafusion_spark.pipeline.text import redact_pii

    batch = spark.read.parquet(docs_dir)
    stream = read_stream_parquet(spark, docs_dir, batch.schema)

    def curate(df):
        scrubbed = df.select(
            "doc_id", F.length(redact_pii(F.col("text"))).alias("redacted_len"))
        return hash_split(scrubbed, {"train": 0.8, "val": 0.1, "test": 0.1})

    got = run_stream_to_memory(curate(stream), "curation_test").collect()
    want = curate(batch).collect()
    assert len(got) == len(want) > 0
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_session_rollup_foreachbatch_parquet_vs_duckdb_oracle(
        spark, events_dir, tmp_path):
    """End-to-end durable-sink correctness (VERDICT r5 item 7): the
    streaming session_rollup runs to completion through foreachBatch into
    parquet on disk, and the written files are diffed against an
    INDEPENDENT DuckDB sessionization of the same source parquet — not
    against another in-process Spark plan.

    session_window semantics in SQL: a new session starts when the gap is
    >= 30 min (strict-overlap merge), and session_end = last_ts + gap."""
    import duckdb

    from steel_datafusion_spark.streaming.operators import (
        run_stream_to_parquet)

    batch = spark.read.parquet(events_dir)
    stream = read_stream_parquet(spark, events_dir, batch.schema)
    out = str(tmp_path / "sessions_parquet")
    got_df = run_stream_to_parquet(
        session_rollup(stream, gap="30 minutes"), out,
        str(tmp_path / "ckpt"))

    cutoff = batch.agg(
        (F.max("ts") - F.expr("INTERVAL 2 HOURS")).alias("c")).collect()[0].c
    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events,
         round(r.sum_value, 6))
        for r in got_df.collect())

    oracle = duckdb.sql(f"""
        WITH ev AS (
          SELECT user_id, event_id, ts, value
          FROM read_parquet('{events_dir}/*.parquet')),
        g AS (
          SELECT user_id, ts, value,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR date_diff('microsecond', lag(ts) OVER w, ts)
                      >= 1800 * 1000000 THEN 1 ELSE 0 END AS new_sess
          FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (
          SELECT user_id, ts, value,
            SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
          FROM g),
        sess AS (
          SELECT user_id, MIN(ts) AS session_start,
                 MAX(ts) + INTERVAL 30 MINUTE AS session_end,
                 COUNT(*) AS n_events,
                 round(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 6)
                   AS sum_value
          FROM s GROUP BY user_id, sid)
        SELECT user_id, session_start, session_end, n_events, sum_value
        FROM sess WHERE session_end <= TIMESTAMP '{cutoff}'
        ORDER BY user_id, session_start
    """).fetchall()
    want = sorted((u, ss, se, int(n), round(sv, 6))
                  for (u, ss, se, n, sv) in oracle)

    assert len(got) == len(want) > 0
    assert got == want
    # the durable artifact is real parquet on disk
    import glob as _glob
    # one overwrite-idempotent subdir per micro-batch (replay-safe sink)
    assert _glob.glob(f"{out}/batch-*/*.parquet")


def test_streaming_chunking_and_classifier_match_batch(spark, docs_dir):
    """chunk_by_tokens and the quality classifier are stateless projections
    (explode + expression folds, no order/partition dependence), so they
    compose onto a stream unchanged and must equal the batch result
    row-for-row — the ingest-time shape: chunk + score documents as they
    arrive."""
    from steel_datafusion_spark.pipeline.chunking import chunk_by_tokens
    from steel_datafusion_spark.pipeline.terms import with_classifier

    batch = spark.read.parquet(docs_dir)
    stream = read_stream_parquet(spark, docs_dir, batch.schema)

    def stage(df):
        scored = with_classifier(df)
        return chunk_by_tokens(
            scored.filter(F.col("clf_score") > -0.9), size=48, overlap=16
        ).select("doc_id", "chunk_id", "chunk_start", "n_chunk_tokens",
                 F.md5(F.col("chunk_text")).alias("h"))

    got = run_stream_to_memory(stage(stream), "chunk_stream_test").collect()
    want = stage(batch).collect()
    assert len(got) == len(want) > 0
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_restart_from_checkpoint_no_duplicates_no_loss(spark, tmp_path):
    """VERDICT r6 #7: kill-and-restart-from-checkpoint.  A query processes
    tranche 1 and terminates (the query object is gone — the process-death
    equivalent for a checkpointed stream); a NEW query over the same
    checkpoint picks up only tranche 2.  Exactly-once across the restart:
    every source row lands in the sink exactly once, committed batches are
    never re-fired (a third run with no new data changes nothing)."""
    from steel_datafusion_spark.streaming.operators import (
        run_stream_to_parquet)

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ev = load_tables(spark, SF_DIR)["events"] \
        .select("event_id", "user_id", "value")
    t1 = ev.filter(F.col("event_id") % 2 == 0)
    t2 = ev.filter(F.col("event_id") % 2 == 1)
    t1.write.mode("append").parquet(str(src))

    schema = spark.read.parquet(str(src)).schema
    # stateless projection: row identity in == row identity out, so
    # duplicates/loss across the restart are directly countable
    def stage(df):
        return df.select("event_id", "user_id",
                         (F.col("value") * 2).alias("v2"))

    # run 1: tranche 1 only
    got1 = run_stream_to_parquet(
        stage(read_stream_parquet(spark, str(src), schema)), out, ckpt)
    n1 = t1.count()
    assert got1.count() == n1

    # "crash": the first query is terminated; new files arrive while down
    t2.write.mode("append").parquet(str(src))

    # run 2: NEW query, same checkpoint — must process ONLY tranche 2
    got2 = run_stream_to_parquet(
        stage(read_stream_parquet(spark, str(src), schema)), out, ckpt)
    n_all = n1 + t2.count()
    assert got2.count() == n_all          # no loss
    ids = [r.event_id for r in got2.select("event_id").collect()]
    assert len(ids) == len(set(ids))      # no duplicates
    want = {r.event_id: r for r in
            stage(ev).collect()}
    for r in got2.collect():
        w = want[r.event_id]
        assert (r.user_id, r.v2) == (w.user_id, w.v2)

    # run 3: no new data — committed batches must not re-fire
    got3 = run_stream_to_parquet(
        stage(read_stream_parquet(spark, str(src), schema)), out, ckpt)
    assert got3.count() == n_all


def test_stream_stream_join_matches_batch(spark, events_dir):
    from steel_datafusion_spark.streaming.operators import stream_stream_join

    batch = spark.read.parquet(events_dir)
    stream = read_stream_parquet(spark, events_dir, batch.schema)

    def split(df):
        v = df.filter(F.col("event_type") == "view") \
            .select("user_id", "ts", "event_id")
        p = df.filter(F.col("event_type") == "purchase") \
            .select("user_id", "ts", "event_id")
        return v, p

    sv, sp = split(stream)
    got = run_stream_to_memory(
        stream_stream_join(sv, sp, within="30 minutes"), "ssj_pairs")
    bv, bp = split(batch)
    want = stream_stream_join(bv, bp, within="30 minutes")
    key = lambda r: (r["user_id"], r["event_id"], r["r_event_id"])
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))
    assert want.count() > 0


def test_stream_stream_outer_join_requires_time_bound(spark, events_dir):
    # inner stream-stream joins merely grow state without a time bound, but
    # OUTER joins are rejected outright without watermark + range condition
    # — Spark cannot decide when a non-match is final.  This pins why
    # stream_stream_join always carries both.
    batch = spark.read.parquet(events_dir)
    stream = read_stream_parquet(spark, events_dir, batch.schema)
    ev = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    v = ev.filter(F.col("event_type") == "view") \
        .select("user_id", "ts").withWatermark("ts", "2 hours")
    p = ev.filter(F.col("event_type") == "purchase") \
        .select(F.col("user_id").alias("r_user_id"),
                F.col("ts").alias("r_ts")).withWatermark("r_ts", "2 hours")
    unbounded = v.join(p, F.col("user_id") == F.col("r_user_id"),
                       "left_outer")
    with pytest.raises(Exception) as ei:
        q = (unbounded.writeStream.format("memory").queryName("ssj_bad")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(60)
    msg = str(ei.value).lower()
    assert "watermark" in msg or "join" in msg


def test_hopping_rollup_matches_batch(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    stream = read_stream_parquet(spark, events_dir, batch.schema)
    got = run_stream_to_memory(
        windowed_rollup(stream, window="1 hour", slide="30 minutes"),
        "hop_rollup")
    want = windowed_rollup(batch, window="1 hour", slide="30 minutes")
    # append mode only emits windows the final watermark closed
    cutoff = batch.agg(
        F.max(F.col("ts").cast("timestamp"))).first()[0]
    import datetime
    closed = want.filter(
        F.col("window_start") + F.expr("INTERVAL 1 HOUR")
        <= F.lit(cutoff - datetime.timedelta(hours=2)))
    key = lambda r: (str(r["window_start"]), r["event_type"], r["n"])
    assert sorted(map(key, got.collect())) == sorted(map(key, closed.collect()))
    # each event lands in exactly window/slide = 2 windows
    n_events = batch.count()
    assert want.agg(F.sum("n")).first()[0] == 2 * n_events


def test_streaming_dedup_gate_proves_dedup(spark, duck):
    """The streaming_dedup gate's oracle is the distinct-collapsed
    rollup: run the same source WITHOUT the dedup stage and assert the
    counts inflate — i.e. the gate can only pass because the stateful
    dedup actually fired."""
    import pyspark.sql.functions as F

    from conftest import SF_DIR, assert_df_matches_duck
    from steel_datafusion_spark.pipeline.queries import (
        _SQL_STREAMING_DEDUP, q_streaming_dedup)

    deduped = q_streaming_dedup(spark, SF_DIR)
    assert_df_matches_duck(deduped, duck, _SQL_STREAMING_DEDUP)

    # undeduplicated control: same planted-duplicate source, rollup only
    import os

    from steel_datafusion_spark.queries import scratch_dir
    from steel_datafusion_spark.streaming.operators import windowed_rollup

    src = os.path.join(scratch_dir(spark, SF_DIR, "stream_dup_gate"), "src")
    raw = spark.read.parquet(src)
    control = windowed_rollup(
        raw.withColumn("ts", F.col("ts").cast("timestamp")),
        window="1 hour", watermark=None)
    n_dup = control.agg(F.sum("n")).collect()[0][0]
    n_clean = deduped.agg(F.sum("n")).collect()[0][0]
    assert n_dup > n_clean  # the planted copies really inflate the rollup


def test_streaming_view_maintenance_matches_batch_agg(spark, tmp_path):
    from pyspark.sql import functions as F

    from steel_datafusion_spark.pipeline.cdc import agg_state
    from steel_datafusion_spark.streaming.operators import (
        streaming_view_maintenance,
    )

    src = str(tmp_path / "src")
    rows = [(i % 3, float((i * 37) % 100) - 50.0) for i in range(300)]
    df = spark.createDataFrame(rows, "k int, v double")
    # several files -> several micro-batches at max_files_per_trigger=1
    df.repartition(5).write.parquet(src)
    import glob
    n_files = len(glob.glob(src + "/*.parquet"))
    assert n_files >= 4

    got = streaming_view_maintenance(
        spark, src, df.schema, ["k"], "v", str(tmp_path / "work"),
        max_files_per_trigger=1)
    want = {r["k"]: r.asDict() for r in agg_state(df, ["k"], "v").collect()}
    got_d = {r["k"]: r.asDict() for r in got.collect()}
    assert got_d == want
    # the manifest commit log proves the chain really ran multiple merges
    # (one commit file per micro-batch; old DATA dirs are vacuumed but
    # commit files are the audit trail and stay)
    commits = glob.glob(str(tmp_path / "work" / "view" / "_commits" /
                            "v*.json"))
    assert len(commits) >= 4
    # and vacuum kept the data footprint bounded: at most 2 version dirs
    versions = glob.glob(str(tmp_path / "work" / "view" / "_versions" /
                             "v*"))
    assert 1 <= len(versions) <= 2


def test_streaming_append_table_versions_and_replay_skip(spark, tmp_path):
    import glob
    import os

    from steel_datafusion_spark.sources.manifest import (
        commit_version, latest_commit_info, new_version_dir,
    )
    from steel_datafusion_spark.streaming.operators import (
        streaming_append_table,
    )

    src = str(tmp_path / "src")
    rows = [(i, i % 4, float(i)) for i in range(200)]
    df = spark.createDataFrame(rows, "event_id long, k int, v double")
    df.repartition(5).write.parquet(src)

    root = str(tmp_path / "tbl")
    got = streaming_append_table(spark, src, df.schema, root,
                                 str(tmp_path / "work"),
                                 max_files_per_trigger=1)
    assert sorted((r.event_id, r.k, r.v) for r in got.collect()) == \
        sorted(rows)
    commits = glob.glob(os.path.join(root, "_commits", "v*.json"))
    assert len(commits) >= 5  # one committed version per micro-batch
    info = latest_commit_info(root)
    last_batch = info["meta"]["batch_id"]
    # a replayed batch (same or older batch_id) must skip itself:
    # simulate by asserting the guard path — write a rival version
    # with a NEWER batch_id, then confirm an older-id apply is a no-op
    # (drive through the public machinery: re-running the whole finite
    # stream with the SAME checkpoint reprocesses nothing)
    got2 = streaming_append_table(spark, src, df.schema, root,
                                  str(tmp_path / "work"),
                                  max_files_per_trigger=1)
    assert got2.count() == len(rows)          # no duplicates
    assert latest_commit_info(root)["meta"]["batch_id"] == last_batch


def test_streaming_table_changes_feed(spark, tmp_path):
    """Commit-log CDF: the feed emits exactly the insert/update/delete
    rows of each committed version, consumes NEW versions incrementally
    on the same checkpoint, and a fresh checkpoint against the existing
    downstream table raises instead of silently dropping batches."""
    import pytest
    from pyspark.sql import functions as F

    from steel_datafusion_spark.sources.manifest import (
        manifest_delete, manifest_upsert,
    )
    from steel_datafusion_spark.streaming.operators import (
        streaming_table_changes,
    )

    def mk(rows):
        return spark.createDataFrame(rows, "k long, s string, v long")

    root = str(tmp_path / "src")
    out = str(tmp_path / "out")
    work = str(tmp_path / "work")
    manifest_upsert(spark, root, mk([(1, "a", 10), (2, "b", 20),
                                     (3, "c", 30)]), ["k"],
                    keep_versions=100)
    manifest_upsert(spark, root, mk([(2, "b2", 99), (4, "d", 40)]), ["k"],
                    keep_versions=100)
    manifest_delete(spark, root, spark.createDataFrame([(1,)], "k long"),
                    ["k"], keep_versions=100)
    feed = streaming_table_changes(spark, root, ["k"], out, work)
    got = sorted((r.k, r.change_type, r.commit_version)
                 for r in feed.collect())
    assert got == sorted([(1, "insert", 1), (2, "insert", 1),
                          (3, "insert", 1), (2, "update", 2),
                          (4, "insert", 2), (1, "delete", 3)])
    # fresh checkpoint + existing downstream table: identity guard fires
    with pytest.raises(Exception, match="checkpoint|batch"):
        streaming_table_changes(spark, root, ["k"], out,
                                str(tmp_path / "work2"))
    # incremental consumption on the SAME checkpoint: only the new version
    manifest_upsert(spark, root, mk([(5, "e", 50)]), ["k"],
                    keep_versions=100)
    feed2 = streaming_table_changes(spark, root, ["k"], out, work)
    got2 = sorted((r.k, r.change_type, r.commit_version)
                  for r in feed2.collect())
    assert (5, "insert", 4) in got2 and len(got2) == len(got) + 1


def test_streaming_table_changes_starting_version_and_retention(
        spark, tmp_path):
    """starting_version skips history (Delta startingVersion semantics);
    a feed attached past the vacuum retention raises a pointed error,
    not a bare missing-dir."""
    import pytest

    from steel_datafusion_spark.sources.manifest import (
        manifest_upsert,
    )
    from steel_datafusion_spark.streaming.operators import (
        streaming_table_changes,
    )

    def mk(rows):
        return spark.createDataFrame(rows, "k long, v long")

    root = str(tmp_path / "src")
    manifest_upsert(spark, root, mk([(1, 10), (2, 20)]), ["k"],
                    keep_versions=100)
    manifest_upsert(spark, root, mk([(2, 99), (3, 30)]), ["k"],
                    keep_versions=100)
    manifest_upsert(spark, root, mk([(4, 40)]), ["k"], keep_versions=100)
    feed = streaming_table_changes(
        spark, root, ["k"], str(tmp_path / "out"),
        str(tmp_path / "work"), starting_version=3)
    got = sorted((r.k, r.change_type, r.commit_version)
                 for r in feed.collect())
    assert got == [(4, "insert", 3)]
    # retention miss: vacuum the early versions, then attach a NEW feed
    root2 = str(tmp_path / "src2")
    manifest_upsert(spark, root2, mk([(1, 10)]), ["k"], keep_versions=1)
    manifest_upsert(spark, root2, mk([(2, 20)]), ["k"], keep_versions=1)
    manifest_upsert(spark, root2, mk([(3, 30)]), ["k"], keep_versions=1)
    with pytest.raises(Exception, match="keep_versions|retention"):
        streaming_table_changes(spark, root2, ["k"],
                                str(tmp_path / "out2"),
                                str(tmp_path / "work2"))


def test_run_stream_to_parquet_zero_batches_returns_empty(spark, tmp_path):
    """A drive whose source yields ZERO batches must return an empty frame
    with the stream's schema, not raise PATH_NOT_FOUND from the batch-*
    glob (ADVICE r11)."""
    from steel_datafusion_spark.streaming.operators import (
        run_stream_to_parquet,
    )

    src = tmp_path / "empty_src"
    src.mkdir()
    stream = (spark.readStream
              .schema("k long, v string")
              .parquet(str(src)))
    got = run_stream_to_parquet(
        stream, str(tmp_path / "out"), str(tmp_path / "ckpt"))
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["k", "v"]


def test_streaming_append_maintains_bloom_index(spark, tmp_path):
    """A bloom-indexed table stays indexed under streaming ingest: each
    micro-batch commit carries hardlinked files' filters by relpath and
    scans only the batch's new files, so point-lookup skipping never
    degrades to stats-only after the first appended batch."""
    import os

    from pyspark.sql import functions as F

    from steel_datafusion_spark.sources.filestats import (
        bloom_parquet_path,
    )
    from steel_datafusion_spark.sources.manifest import (
        latest_commit_info, manifest_upsert, read_table,
        write_table_bloom,
    )
    from steel_datafusion_spark.streaming.operators import (
        streaming_append_table,
    )

    tbl = str(tmp_path / "btbl")
    seed = spark.range(2000).select(
        F.md5(F.col("id").cast("string")).alias("uid"),
        F.col("id").alias("k"))
    manifest_upsert(spark, tbl, seed.repartition(4, "uid"), ["uid"])
    write_table_bloom(spark, tbl, ["uid"], bits=1 << 14)
    src = str(tmp_path / "bsrc")
    batch = spark.range(2000, 3000).select(
        F.md5(F.col("id").cast("string")).alias("uid"),
        F.col("id").alias("k"))
    batch.coalesce(2).write.mode("overwrite").parquet(src)
    streaming_append_table(spark, src, batch.schema, tbl,
                           str(tmp_path / "bwork"),
                           max_files_per_trigger=1)
    info = latest_commit_info(tbl)
    assert info["meta"]["bloom"] == {"uid": {"bits": 1 << 14, "k": 5}}
    assert os.path.exists(bloom_parquet_path(info["data_dir"], "uid"))
    total = len(read_table(spark, tbl).inputFiles())
    # a streamed-in key and a seed key both prune and both hit
    for probe_k in (42, 2500):
        uid = (read_table(spark, tbl).filter(F.col("k") == probe_k)
               .head().uid)
        got = read_table(spark, tbl, where=[("uid", "=", uid)])
        assert len(got.inputFiles()) < total
        assert got.count() == 1
    assert read_table(spark, tbl,
                      where=[("uid", "=", "nope")]).count() == 0


def test_streaming_ann_index_maintenance_exactly_once(spark, tmp_path):
    """Streaming ANN-index maintenance: batches land in the manifest
    delta exactly-once (re-driving the same checkpoint commits nothing
    new), base ∪ delta equals a one-shot index over the full corpus
    with the same frozen quantizer, and the delta carries the
    assignment schema."""
    from pyspark.sql import functions as F

    from conftest import SF_DIR
    from steel_datafusion_spark.pipeline.similarity import (
        build_ann_index, ivf_topk_index, ivf_topk_index_delta,
    )
    from steel_datafusion_spark.sources.bucketing import drop_managed_table
    from steel_datafusion_spark.sources.manifest import latest_commit_info
    from steel_datafusion_spark.streaming.operators import (
        streaming_ann_index_maintenance,
    )

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cut = e.count() * 3 // 5
    for t in ("sann_b", "sann_f"):
        for s in ("centroids", "assign", "meta"):
            drop_managed_table(spark, f"{t}_{s}")
    try:
        build_ann_index(e.filter(F.col("vec_id") < cut), "sann_b",
                        nlist=8, n_buckets=4)
        src = str(tmp_path / "src")
        delta = str(tmp_path / "delta")
        work = str(tmp_path / "work")
        tail = e.filter(F.col("vec_id") >= cut)
        tail.repartition(3).write.mode("overwrite").parquet(src)
        got = streaming_ann_index_maintenance(
            spark, src, tail.schema, "sann_b", delta, work,
            max_files_per_trigger=1)
        assert got.count() == tail.count()
        v1 = latest_commit_info(delta)["version"]
        assert v1 >= 3  # one commit per micro-batch
        # replay safety: same checkpoint, no new files -> no new commits
        streaming_ann_index_maintenance(
            spark, src, tail.schema, "sann_b", delta, work,
            max_files_per_trigger=1)
        assert latest_commit_info(delta)["version"] == v1
        q = e.filter(F.col("vec_id") < 5)
        grown = ivf_topk_index_delta(q, "sann_b", delta, k=10, nprobe=2)
        build_ann_index(e, "sann_f", nlist=8, n_buckets=4,
                        centroids=spark.table("sann_b_centroids"))
        full = ivf_topk_index(q, "sann_f", k=10, nprobe=2)
        assert sorted(map(tuple, grown.collect())) == \
            sorted(map(tuple, full.collect()))
    finally:
        for t in ("sann_b", "sann_f"):
            for s in ("centroids", "assign", "meta"):
                drop_managed_table(spark, f"{t}_{s}")


def test_ann_index_compact_absorbs_delta_and_stays_replay_safe(
        spark, tmp_path):
    """Compaction completes the index lifecycle: delta rows land in the
    bucketed base (deduplicated on vid, so a crashed-and-retried
    compaction converges instead of doubling), the delta resets to an
    EMPTY version that CARRIES the txn watermarks (replayed micro-batches
    still skip), and probes return the same rows before and after."""
    from pyspark.sql import functions as F

    from conftest import SF_DIR
    from steel_datafusion_spark.pipeline.similarity import (
        ann_index_compact, build_ann_index, ivf_topk_index,
        ivf_topk_index_delta,
    )
    from steel_datafusion_spark.sources.bucketing import drop_managed_table
    from steel_datafusion_spark.sources.manifest import latest_commit_info
    from steel_datafusion_spark.streaming.operators import (
        streaming_ann_index_maintenance,
    )

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cut = e.count() * 3 // 5
    for s in ("centroids", "assign", "meta"):
        drop_managed_table(spark, f"cann_b_{s}")
    try:
        build_ann_index(e.filter(F.col("vec_id") < cut), "cann_b",
                        nlist=8, n_buckets=4)
        src = str(tmp_path / "src")
        delta = str(tmp_path / "delta")
        tail = e.filter(F.col("vec_id") >= cut)
        tail.repartition(2).write.mode("overwrite").parquet(src)
        streaming_ann_index_maintenance(
            spark, src, tail.schema, "cann_b", delta,
            str(tmp_path / "work"), max_files_per_trigger=1)
        q = e.filter(F.col("vec_id") < 5)
        before = sorted(map(tuple, ivf_topk_index_delta(
            q, "cann_b", delta, k=10, nprobe=2).collect()))
        st = ann_index_compact(spark, "cann_b", delta)
        assert st["delta_rows"] == tail.count()
        assert st["base_rows"] == e.count()
        # delta is now empty but its commit carries the txn watermarks
        info = latest_commit_info(delta)
        assert info["meta"].get("txns")
        # pure-base probe == pre-compaction base∪delta probe
        after = sorted(map(tuple, ivf_topk_index(
            q, "cann_b", k=10, nprobe=2).collect()))
        assert before == after
        # idempotence: a retried compaction (delta already absorbed,
        # or crash between rewrite and reset) converges, never doubles
        st2 = ann_index_compact(spark, "cann_b", delta)
        assert st2["base_rows"] == e.count()
        # replay safety survived the reset: re-driving the same
        # checkpoint with no new files commits nothing
        v = latest_commit_info(delta)["version"]
        streaming_ann_index_maintenance(
            spark, src, tail.schema, "cann_b", delta,
            str(tmp_path / "work"), max_files_per_trigger=1)
        assert latest_commit_info(delta)["version"] == v
        # and the delta path still answers identically on an empty delta
        again = sorted(map(tuple, ivf_topk_index_delta(
            q, "cann_b", delta, k=10, nprobe=2).collect()))
        assert again == after
    finally:
        for s in ("centroids", "assign", "meta"):
            drop_managed_table(spark, f"cann_b_{s}")


def test_streaming_dedup_ingest_matches_one_shot(spark, tmp_path):
    """Dedup-the-crawl-as-it-lands: the streamed matches table must
    equal a one-shot minhash pair computation over base ∪ stream
    restricted to pairs touching the stream — regardless of batch
    chopping (stream-vs-base AND stream-vs-stream pairs across
    different batches), and re-driving the same checkpoint changes
    nothing."""
    from pyspark.sql import functions as F

    from conftest import SF_DIR
    from steel_datafusion_spark.pipeline.dedup import (
        build_dedup_index, minhash_dedup_pairs,
    )
    from steel_datafusion_spark.sources.bucketing import drop_managed_table
    from steel_datafusion_spark.sources.manifest import latest_commit_info
    from steel_datafusion_spark.streaming.operators import (
        streaming_dedup_ingest,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    base = docs.filter((F.col("doc_id") < 400) & (F.col("doc_id") % 2 == 0))
    s1 = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" crawl dup marker")).alias("text"))
    s2 = docs.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" crawl dup marker")).alias("text"))
    for s in ("bands", "shingles", "meta", "hot"):
        drop_managed_table(spark, f"sdd_idx_{s}")
    try:
        build_dedup_index(base, "sdd_idx", n_buckets=4)
        src = str(tmp_path / "src")
        s1.coalesce(1).write.mode("append").parquet(src)
        s2.coalesce(1).write.mode("append").parquet(src)
        work = str(tmp_path / "work")
        got = streaming_dedup_ingest(spark, src, s1.schema, "sdd_idx",
                                     work, threshold=0.5,
                                     max_files_per_trigger=1)
        want = (minhash_dedup_pairs(
                    base.unionByName(s1).unionByName(s2), threshold=0.5)
                .filter(F.col("doc_b") >= 1000000))
        gs = sorted(map(tuple, got.collect()))
        ws = sorted(map(tuple, want.collect()))
        assert gs == ws
        # the fixture exercises both pair kinds
        assert any(a >= 1000000 for a, _b, _j in gs)  # stream-stream
        assert any(a < 1000000 for a, _b, _j in gs)   # stream-base
        # replay safety: same checkpoint, no new files -> no new commits
        v = latest_commit_info(str(tmp_path / "work" / "matches"))["version"]
        streaming_dedup_ingest(spark, src, s1.schema, "sdd_idx", work,
                               threshold=0.5, max_files_per_trigger=1)
        assert latest_commit_info(
            str(tmp_path / "work" / "matches"))["version"] == v
    finally:
        for s in ("bands", "shingles", "meta", "hot"):
            drop_managed_table(spark, f"sdd_idx_{s}")


def test_streaming_dedup_ingest_crash_between_delta_and_upsert(
        spark, tmp_path, monkeypatch):
    """FAILURE INJECTION (VERDICT r12 item 7): the worst crash window
    for streaming_dedup_ingest is after a batch's band/shingle deltas
    COMMIT but before the matches upsert — the delta watermark says
    "batch done" while its matches are missing.  Inject exactly that
    (manifest_upsert raises once), restart the stream on the same
    checkpoint, and the matches table must still converge to the
    one-shot oracle: the replayed batch skips its delta appends (txn
    guard) but re-probes and upserts its pairs."""
    from pyspark.sql import functions as F

    from conftest import SF_DIR
    from steel_datafusion_spark.pipeline.dedup import (
        build_dedup_index, minhash_dedup_pairs,
    )
    from steel_datafusion_spark.sources import manifest as mf
    from steel_datafusion_spark.sources.bucketing import drop_managed_table
    from steel_datafusion_spark.sources.manifest import read_table
    from steel_datafusion_spark.streaming.operators import (
        streaming_dedup_ingest,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    base = docs.filter((F.col("doc_id") < 400) & (F.col("doc_id") % 2 == 0))
    s1 = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" crash dup marker")).alias("text"))
    s2 = docs.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" crash dup marker")).alias("text"))
    for s in ("bands", "shingles", "meta", "hot"):
        drop_managed_table(spark, f"sddc_idx_{s}")
    try:
        build_dedup_index(base, "sddc_idx", n_buckets=4)
        src = str(tmp_path / "src")
        s1.coalesce(1).write.mode("append").parquet(src)
        s2.coalesce(1).write.mode("append").parquet(src)
        work = str(tmp_path / "work")

        real_upsert = mf.manifest_upsert
        fired = {"n": 0}

        def _dying_upsert(*a, **kw):
            if fired["n"] == 0:
                fired["n"] += 1
                raise RuntimeError("injected crash: die between the "
                                   "delta commit and the matches upsert")
            return real_upsert(*a, **kw)

        monkeypatch.setattr(mf, "manifest_upsert", _dying_upsert)
        with pytest.raises(Exception):
            streaming_dedup_ingest(spark, src, s1.schema, "sddc_idx",
                                   work, threshold=0.5,
                                   max_files_per_trigger=1)
        assert fired["n"] == 1  # the injected window actually fired
        # crash state: at least one batch's deltas are committed with
        # its watermark, but its matches never landed
        import os

        bands_root = os.path.join(work, "delta_bands")
        assert read_table(spark, bands_root).count() > 0
        monkeypatch.setattr(mf, "manifest_upsert", real_upsert)
        got = streaming_dedup_ingest(spark, src, s1.schema, "sddc_idx",
                                     work, threshold=0.5,
                                     max_files_per_trigger=1)
        want = (minhash_dedup_pairs(
                    base.unionByName(s1).unionByName(s2), threshold=0.5)
                .filter(F.col("doc_b") >= 1000000))
        assert sorted(map(tuple, got.collect())) == \
            sorted(map(tuple, want.collect()))
        # the delta holds each streamed doc's bands exactly once (the
        # replayed batch did NOT re-append)
        per_doc = (read_table(spark, bands_root)
                   .groupBy("corpus_id", "band_idx").count()
                   .filter(F.col("count") > 1).count())
        assert per_doc == 0
    finally:
        for s in ("bands", "shingles", "meta", "hot"):
            drop_managed_table(spark, f"sddc_idx_{s}")


def test_streaming_ann_maintenance_crash_after_commit(
        spark, tmp_path, monkeypatch):
    """FAILURE INJECTION for streaming_ann_index_maintenance: crash
    right AFTER a batch's delta commit (vacuum raises once), before the
    checkpoint advances.  On restart the replayed batch must recognize
    its watermark and skip — the delta ends with each vector assigned
    exactly once and probes equal a one-shot index."""
    from pyspark.sql import functions as F

    from conftest import SF_DIR
    from steel_datafusion_spark.pipeline.similarity import (
        build_ann_index, ivf_topk_index, ivf_topk_index_delta,
    )
    from steel_datafusion_spark.sources import manifest as mf
    from steel_datafusion_spark.sources.bucketing import drop_managed_table
    from steel_datafusion_spark.sources.manifest import read_table
    from steel_datafusion_spark.streaming.operators import (
        streaming_ann_index_maintenance,
    )

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cut = e.count() * 3 // 5
    for t in ("sannc_b", "sannc_f"):
        for s in ("centroids", "assign", "meta"):
            drop_managed_table(spark, f"{t}_{s}")
    try:
        build_ann_index(e.filter(F.col("vec_id") < cut), "sannc_b",
                        nlist=8, n_buckets=4)
        src = str(tmp_path / "src")
        delta = str(tmp_path / "delta")
        work = str(tmp_path / "work")
        tail = e.filter(F.col("vec_id") >= cut)
        tail.repartition(3).write.mode("overwrite").parquet(src)

        real_vacuum = mf.vacuum
        fired = {"n": 0}

        def _dying_vacuum(root, *a, **kw):
            if fired["n"] == 0 and "delta" in root:
                fired["n"] += 1
                raise RuntimeError("injected crash: die after the delta "
                                   "commit, before checkpoint advance")
            return real_vacuum(root, *a, **kw)

        monkeypatch.setattr(mf, "vacuum", _dying_vacuum)
        with pytest.raises(Exception):
            streaming_ann_index_maintenance(
                spark, src, tail.schema, "sannc_b", delta, work,
                max_files_per_trigger=1)
        assert fired["n"] == 1
        assert read_table(spark, delta).count() > 0  # commit survived
        monkeypatch.setattr(mf, "vacuum", real_vacuum)
        got = streaming_ann_index_maintenance(
            spark, src, tail.schema, "sannc_b", delta, work,
            max_files_per_trigger=1)
        assert got.count() == tail.count()  # exactly once, no re-append
        assert got.groupBy("vid").count() \
            .filter(F.col("count") > 1).count() == 0
        q = e.filter(F.col("vec_id") < 5)
        grown = ivf_topk_index_delta(q, "sannc_b", delta, k=10, nprobe=2)
        build_ann_index(e, "sannc_f", nlist=8, n_buckets=4,
                        centroids=spark.table("sannc_b_centroids"))
        full = ivf_topk_index(q, "sannc_f", k=10, nprobe=2)
        assert sorted(map(tuple, grown.collect())) == \
            sorted(map(tuple, full.collect()))
    finally:
        for t in ("sannc_b", "sannc_f"):
            for s in ("centroids", "assign", "meta"):
                drop_managed_table(spark, f"{t}_{s}")


def test_stream_state_partitions_unknown_source_uses_session_cap(spark):
    """A source the driver cannot stat (object-store URI, glob) must fall
    back to the session shuffle-partition cap, never collapse to 1: a 1 TB
    s3 backlog on one state partition would serialize all state commits."""
    from steel_datafusion_spark.streaming.operators import (
        stream_state_partitions)
    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # non-local path: cannot be os.walk'd
    assert stream_state_partitions(
        spark, "s3a://bucket/events/") == cap
    assert stream_state_partitions(spark, None) == cap
    # explicit size still wins over the fallback
    assert stream_state_partitions(
        spark, "s3a://bucket/events/", src_bytes=1) == 1
    assert stream_state_partitions(
        spark, "s3a://bucket/events/",
        src_bytes=cap * 64 * 1024 * 1024) == cap
    # local directory sizing unchanged: tiny dir -> 1 partition
    import tempfile, os as _os
    with tempfile.TemporaryDirectory() as d:
        with open(_os.path.join(d, "x.bin"), "wb") as f:
            f.write(b"\0" * 1024)
        assert stream_state_partitions(spark, d) == 1


def test_files_per_trigger_volume_sizing(tmp_path):
    """r16: micro-batches are sized by VOLUME (~32 MB/trigger), so tiny
    files consolidate and fat files stay one per trigger."""
    from steel_datafusion_spark.streaming.operators import files_per_trigger
    d = tmp_path / "src"
    d.mkdir()
    # unstatable / empty -> conservative 1
    assert files_per_trigger("s3a://bucket/stream/") == 1
    assert files_per_trigger(str(d)) == 1
    # two 1 KB files -> both fit one 32 MB trigger (and more)
    for i in range(2):
        (d / f"f{i}.parquet").write_bytes(b"\0" * 1024)
    assert files_per_trigger(str(d)) >= 2
    # hidden/marker files are not data
    (d / "_SUCCESS").write_bytes(b"")
    assert files_per_trigger(str(d)) >= 2
    # one fat file (pretend 64 MB) -> 1 per trigger
    big = tmp_path / "big"
    big.mkdir()
    with open(big / "huge.parquet", "wb") as f:
        f.truncate(64 * 1024 * 1024)
    assert files_per_trigger(str(big)) == 1
