"""Multimodal resize/frame-sample plumbing + custom stateful streaming op."""

from pyspark.sql import functions as F

from steel_datafusion_spark.pipeline.multimodal import (
    frame_sample, make_media_table, resize_media,
)
from steel_datafusion_spark.sources.readers import load_tables
from steel_datafusion_spark.streaming.operators import (
    read_stream_parquet, run_stream_to_memory,
)
from steel_datafusion_spark.streaming.stateful import running_user_stats

from conftest import SF_DIR


def test_resize_updates_meta_and_payload(spark, tables):
    media = make_media_table(tables["documents"].limit(20))
    out = resize_media(media, 64, 48).collect()
    assert len(out) == 20
    for r in out:
        assert (r.meta.width, r.meta.height) == (64, 48)
        assert len(r.payload) >= 1


def test_frame_sample_only_videos_bounded(spark, tables):
    media = make_media_table(tables["documents"].limit(30))
    n_videos = media.filter(F.col("kind") == "video").count()
    frames = frame_sample(media, every_ms=1000, max_frames=4)
    rows = frames.collect()
    assert {r.media_id % 3 for r in rows} == {2}          # only kind=video ids
    per = frames.groupBy("media_id").count().collect()
    assert len(per) == n_videos
    assert all(1 <= r["count"] <= 4 for r in per)
    assert all(r.frame_ts_ms == r.frame_idx * 1000 for r in rows)


def test_stateful_running_user_stats(spark, tmp_path):
    ev = load_tables(spark, SF_DIR)["events"].select("user_id", "ts", "value")
    src = str(tmp_path / "ev_state")
    ev.write.mode("overwrite").parquet(src)
    batch = spark.read.parquet(src)
    stream = read_stream_parquet(spark, src, batch.schema)
    got = run_stream_to_memory(running_user_stats(stream), "ustats",
                               output_mode="update")
    want = (batch.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .collect())
    got_map = {r.user_id: r.n_events for r in got.collect()}
    for w in want:
        assert got_map[w.user_id] == w.n_events
