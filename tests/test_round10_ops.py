"""Round-10 operators and guards: size-guarded broadcasts in the dedup
apply step / association rules, the hard-negative anchor cap + the IVF
corpus-scale variant, and the compaction planner's integer bin math."""

import pytest
from pyspark.sql import functions as F


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_auto_broadcast(spark):
    """Disable Catalyst's stats-driven broadcasts so any BroadcastExchange
    in a plan must come from an explicit hint — isolates the guard."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _corpus_and_clusters(spark):
    corpus = spark.createDataFrame(
        [(i, f"doc {i}", float(i % 5)) for i in range(30)],
        "doc_id long, text string, quality double")
    # clusters: {0,1,2} -> 0, {10,11} -> 10, rest singletons (absent)
    clusters = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (10, 10), (11, 10)],
        "doc_id long, cluster_id long")
    return corpus, clusters


# ---------------------------------------------------------------------------
# size-guarded broadcast: dedup apply step
# ---------------------------------------------------------------------------

def test_keep_representatives_guard_paths_identical(spark, no_auto_broadcast):
    from steel_datafusion_spark.pipeline.dedup import keep_representatives

    corpus, clusters = _corpus_and_clusters(spark)
    want = sorted([0, 10] + [i for i in range(30) if i not in
                             (0, 1, 2, 10, 11)])
    small = keep_representatives(corpus, clusters)
    assert sorted(r.doc_id for r in small.collect()) == want
    # under the guard threshold: drop list broadcasts (map-side anti-join)
    assert "BroadcastExchange" in _plan(small)
    # clear the guard's persisted intermediates so the forced variant
    # re-plans from scratch instead of replaying a cached broadcast plan
    spark.catalog.clearCache()
    forced_shuffle = keep_representatives(corpus, clusters,
                                          broadcast_limit=0)
    assert sorted(r.doc_id for r in forced_shuffle.collect()) == want
    # over it (limit=0 forces the large branch): plain shuffled anti-join,
    # no broadcast anywhere — the plan that can't OOM at 50% dup rates
    assert "BroadcastExchange" not in _plan(forced_shuffle)


def test_keep_best_representatives_guard_paths_identical(
        spark, no_auto_broadcast):
    from steel_datafusion_spark.pipeline.dedup import (
        keep_best_representatives,
    )

    corpus, clusters = _corpus_and_clusters(spark)
    score = F.col("quality")
    # cluster {0,1,2}: quality = 0,1,2 -> keep 2; {10,11}: 0,1 -> keep 11
    want = sorted([2, 11] + [i for i in range(30) if i not in
                             (0, 1, 2, 10, 11)])
    small = keep_best_representatives(corpus, clusters, score)
    assert sorted(r.doc_id for r in small.collect()) == want
    assert "BroadcastExchange" in _plan(small)
    spark.catalog.clearCache()
    forced = keep_best_representatives(corpus, clusters, score,
                                       broadcast_limit=0)
    assert sorted(r.doc_id for r in forced.collect()) == want
    assert "BroadcastExchange" not in _plan(forced)


# ---------------------------------------------------------------------------
# size-guarded broadcast: association rules item counts
# ---------------------------------------------------------------------------

def test_association_rules_guard_paths_identical(spark, no_auto_broadcast):
    from steel_datafusion_spark.pipeline.basket import association_rules

    rows = [(b, it) for b in range(12)
            for it in (["x", "y"] if b % 2 == 0 else ["x", "z"])]
    df = spark.createDataFrame(rows, "basket long, item string")
    canon = lambda d: sorted(  # noqa: E731
        (r.item_a, r.item_b, r.pair_count, r.support, r.conf_a_b,
         r.conf_b_a, r.lift) for r in d.collect())
    small = association_rules(df, "basket", "item", min_pair_count=1)
    got_small = canon(small)
    plan_small = _plan(small)
    spark.catalog.clearCache()
    forced = association_rules(df, "basket", "item", min_pair_count=1,
                               broadcast_limit=0)
    assert got_small == canon(forced)
    # the guarded path still broadcasts the 1-row n_baskets scalar (a
    # forced, size-safe broadcast) — so assert specifically that the
    # item-count HASH joins lost their BroadcastExchange
    assert "BroadcastHashJoin" in plan_small
    assert "BroadcastHashJoin" not in _plan(forced)


def test_sql_association_rules_max_basket_zero_matches_engine(spark, duck):
    """ADVICE r9: max_basket=0 must cap in BOTH engines (the SQL mirror
    used truthiness and skipped the cap)."""
    from steel_datafusion_spark.pipeline.basket import (
        association_rules, sql_association_rules,
    )

    rows = [(b, it) for b in range(6) for it in ("x", "y")]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = association_rules(df, "basket", "item", min_pair_count=1,
                            max_basket=0)
    assert got.count() == 0  # every basket has 2 items > 0 cap
    duck.execute(
        "CREATE OR REPLACE TABLE ar10 AS SELECT * FROM (VALUES "
        + ", ".join(f"({b}, '{it}')" for b, it in rows)
        + ") t(basket, item)")
    sql = sql_association_rules("ar10", "basket", "item",
                                min_pair_count=1, max_basket=0)
    assert len(duck.execute(sql).fetchall()) == 0


# ---------------------------------------------------------------------------
# hard_negatives anchor cap + IVF variant
# ---------------------------------------------------------------------------

def _vec_df(spark, n=24):
    rows = [(i, [float((i * 7 + d * 3) % 11 - 5) / 5.0 + 0.01
                 for d in range(4)], i % 3) for i in range(n)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")


def test_hard_negatives_anchor_cap_fires(spark):
    from steel_datafusion_spark.pipeline.similarity import hard_negatives

    df = _vec_df(spark)
    with pytest.raises(ValueError, match="hard_negatives_ivf"):
        hard_negatives(df, k=2, max_anchors=3)
    # explicit small anchors under the cap still work
    out = hard_negatives(df, k=2, anchors=df.filter(F.col("vec_id") < 3),
                         max_anchors=3)
    assert out.count() == 6


def test_hard_negatives_ivf_matches_exact_when_probing_everything(spark):
    """centroid_mod=1 makes every vector a centroid (its own bucket);
    probing n buckets covers the whole corpus, so the IVF path must
    reproduce the exact scorer bit-for-bit."""
    from steel_datafusion_spark.pipeline.similarity import (
        hard_negatives, hard_negatives_ivf,
    )

    df = _vec_df(spark, n=12)
    exact = sorted((r.anchor_id, r.neighbor_id, r.score, r.rank)
                   for r in hard_negatives(df, k=3).collect())
    ivf = sorted((r.anchor_id, r.neighbor_id, r.score, r.rank)
                 for r in hard_negatives_ivf(
                     df, k=3, nprobe=12, centroid_mod=1).collect())
    assert ivf == exact


def test_hard_negatives_ivf_no_corpus_broadcast(spark, no_auto_broadcast):
    """The corpus-scale path must not broadcast anything corpus-sized:
    the only BroadcastExchanges are the centroid table (N/centroid_mod
    rows by construction)."""
    from steel_datafusion_spark.pipeline.similarity import hard_negatives_ivf

    df = _vec_df(spark, n=24)
    out = hard_negatives_ivf(df, k=2, nprobe=1, centroid_mod=6)
    plan = _plan(out)
    # the two centroid-table joins ARE broadcast nested loops (build side
    # = N/centroid_mod rows, bounded by construction); the corpus-sized
    # candidate join must key on centroid_id through a shuffle, never a
    # broadcast of assignments or probes
    assert "SortMergeJoin [centroid_id" in plan \
        or "ShuffledHashJoin [centroid_id" in plan, plan
    rows = out.collect()
    assert all(r.rank <= 2 for r in rows)
    labels = {r.vec_id: r.label for r in df.collect()}
    assert all(labels[r.anchor_id] != labels[r.neighbor_id] for r in rows)


# ---------------------------------------------------------------------------
# compaction planner integer bin math (ADVICE r9)
# ---------------------------------------------------------------------------

def test_plan_compaction_integer_bins_past_double_precision(spark):
    """Cumulative small-file bytes past 2^53: double divide-then-floor
    misassigns bins; integer `div` must match exact // arithmetic."""
    from steel_datafusion_spark.sources.layout import plan_compaction

    big = 2 ** 53  # each file is huge but still < min_file_bytes below
    sizes = [(f"f{i}", big + i) for i in range(4)]
    files = spark.createDataFrame(sizes, "path string, size_bytes long")
    target = 3 * big
    plan = {r.path: r.bin_id for r in plan_compaction(
        files, target_bytes=target,
        min_file_bytes=2 * target).collect()}
    # exact python replay (sorted by size desc, path asc)
    order = sorted(sizes, key=lambda t: (-t[1], t[0]))
    cum = 0
    want = {}
    for p, s in order:
        cum += s
        want[p] = (cum - s) // target
    assert plan == want


# ---------------------------------------------------------------------------
# MP4 container metadata walk
# ---------------------------------------------------------------------------

def test_probe_mp4_roundtrip_and_fixed_point():
    from steel_datafusion_spark.pipeline.codecs import (
        encode_mp4, probe_mp4, sniff_format,
    )

    p = encode_mp4(125000, [
        {"kind": "video", "codec": "avc1", "width": 1920, "height": 1080,
         "duration_ms": 125000},
        {"kind": "audio", "codec": "mp4a", "width": 0, "height": 0,
         "duration_ms": 124800},
    ], brand="mp42")
    assert sniff_format(p) == "mp4"
    m = probe_mp4(p)
    assert m.brand == "mp42"
    assert m.duration_ms == 125000
    assert m.n_tracks == 2
    v, a = m.tracks
    assert (v.kind, v.codec, v.width, v.height) == ("video", "avc1",
                                                    1920, 1080)
    assert (a.kind, a.codec, a.duration_ms) == ("audio", "mp4a", 124800)


def test_probe_mp4_largesize_and_to_eof_boxes():
    """64-bit (size==1) and to-end-of-file (size==0) box sizes are part
    of ISO BMFF; real muxers emit both."""
    import struct

    from steel_datafusion_spark.pipeline.codecs import encode_mp4, probe_mp4

    p = encode_mp4(5000, [{"kind": "video", "codec": "hev1", "width": 64,
                           "height": 48, "duration_ms": 5000}])
    # rewrap the trailing mdat as a largesize box, then append a
    # size==0 free box running to EOF
    assert p[-8:-4] == struct.pack(">I", 8) and p[-4:] == b"mdat"
    body = p[:-8]
    large_mdat = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16)
    eof_free = struct.pack(">I", 0) + b"free" + b"\x00" * 4
    m = probe_mp4(body + large_mdat + eof_free)
    assert m.duration_ms == 5000 and m.n_tracks == 1
    assert m.tracks[0].codec == "hev1"


def test_probe_mp4_rejects_malformed():
    import struct

    from steel_datafusion_spark.pipeline.codecs import encode_mp4, probe_mp4

    with pytest.raises(ValueError):
        probe_mp4(b"not an mp4 at all, clearly")
    # ftyp but no moov
    with pytest.raises(ValueError, match="moov"):
        probe_mp4(struct.pack(">I", 16) + b"ftypisom" + b"\x00" * 4)
    # box size larger than the buffer
    p = bytearray(encode_mp4(1000, [{"kind": "video", "codec": "avc1",
                                     "width": 8, "height": 8,
                                     "duration_ms": 1000}]))
    off = len(p[:p.find(b"moov") - 4])
    p[off:off + 4] = struct.pack(">I", len(p) * 10)
    with pytest.raises(ValueError, match="malformed"):
        probe_mp4(bytes(p))


def test_extract_container_metadata_mixed_formats(spark):
    from steel_datafusion_spark.pipeline.codecs import (
        DecodedImage, encode_avi, encode_mp4, encode_wav,
    )
    from steel_datafusion_spark.pipeline.multimodal import (
        MEDIA_SCHEMA, extract_container_metadata,
    )

    mp4 = encode_mp4(9000, [{"kind": "video", "codec": "vp09", "width": 320,
                             "height": 200, "duration_ms": 9000}])
    frames = [DecodedImage(8, 6, "RGB", bytes((10, 20, 30)) * 48)
              for _ in range(4)]
    avi = encode_avi(frames, rate=2, scale=1)
    wav = encode_wav([0.0] * 8000, sample_rate=8000)
    rows = [(1, "video", bytearray(mp4), {"width": 0, "height": 0,
                                          "duration_ms": 0}),
            (2, "video", bytearray(avi), {"width": 0, "height": 0,
                                          "duration_ms": 0}),
            (3, "audio", bytearray(wav), {"width": 0, "height": 0,
                                          "duration_ms": 0}),
            (4, "video", bytearray(b"mystery bytes"),
             {"width": 77, "height": 55, "duration_ms": 1234})]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r.asDict()
           for r in extract_container_metadata(media).collect()}
    assert got[1]["container"] == "mp4" and got[1]["probed"]
    assert (got[1]["video_codec"], got[1]["width"], got[1]["height"],
            got[1]["duration_ms"]) == ("vp09", 320, 200, 9000)
    assert got[2]["container"] == "avi" and got[2]["probed"]
    assert (got[2]["width"], got[2]["height"],
            got[2]["duration_ms"]) == (8, 6, 2000)
    assert got[3]["container"] == "wav" and got[3]["probed"]
    assert (got[3]["duration_ms"], got[3]["audio_codec"]) == (1000, "pcm")
    # honest fallback: unknown container, metadata passthrough
    assert got[4]["container"] == "unknown" and not got[4]["probed"]
    assert (got[4]["width"], got[4]["height"],
            got[4]["duration_ms"]) == (77, 55, 1234)


# ---------------------------------------------------------------------------
# stream-stream outer-join matrix: right/full batch parity
# ---------------------------------------------------------------------------

def test_stream_stream_join_right_and_full_outer_batch_parity(spark):
    """stream_stream_join works identically on batch frames (no
    watermarks applied) — use that to pin the right_outer and full_outer
    SEMANTICS against hand-computed expectations; the streaming
    finalization machinery itself is covered by the hash gates."""
    from datetime import datetime

    from steel_datafusion_spark.streaming.operators import stream_stream_join

    t0 = datetime(2026, 1, 1, 12, 0, 0)

    def ts(minutes):
        return datetime(2026, 1, 1, 12, minutes, 0)

    views = spark.createDataFrame(
        [(1, ts(0), 100), (2, ts(0), 101), (3, ts(50), 102)],
        "user_id long, ts timestamp, event_id long")
    buys = spark.createDataFrame(
        [(1, ts(10), 200), (2, ts(45), 201), (4, ts(5), 202)],
        "user_id long, ts timestamp, event_id long")

    full = stream_stream_join(views, buys, key_col="user_id", ts_col="ts",
                              within="30 minutes", how="full_outer")
    rows = {(r.event_id, r.r_event_id) for r in full.collect()}
    # user 1 matches; user 2's purchase is 45min late (no match, both
    # emit); user 3's view unmatched; user 4's purchase unmatched
    assert rows == {(100, 200), (101, None), (None, 201),
                    (102, None), (None, 202)}

    right = stream_stream_join(views, buys, key_col="user_id", ts_col="ts",
                               within="30 minutes", how="right_outer")
    rrows = {(r.event_id, r.r_event_id) for r in right.collect()}
    assert rrows == {(100, 200), (None, 201), (None, 202)}
    assert t0  # silence linters: t0 anchors the timeline above


# ---------------------------------------------------------------------------
# MP3 header walk
# ---------------------------------------------------------------------------

def test_probe_mp3_cbr_and_id3_skip():
    from steel_datafusion_spark.pipeline.codecs import (
        encode_mp3, probe_mp3, sniff_format,
    )

    p = encode_mp3(200, bitrate_kbps=128, sample_rate=44100, channels=2,
                   id3_bytes=64)
    assert sniff_format(p) == "mp3"
    m = probe_mp3(p)
    assert (m.version, m.layer, m.bitrate_kbps, m.sample_rate,
            m.channels, m.vbr) == ("1", 3, 128, 44100, 2, False)
    assert m.n_frames == 200
    assert m.duration_ms == 200 * 1152 * 1000 // 44100
    mono = probe_mp3(encode_mp3(50, bitrate_kbps=64, sample_rate=32000,
                                channels=1))
    assert (mono.channels, mono.duration_ms) == (1, 1800)
    with pytest.raises(ValueError, match="frame sync"):
        probe_mp3(b"\x00" * 64)


def test_probe_mp3_xing_vbr_frame_count_wins():
    """A Xing tag declares the EXACT frame count — it must override the
    CBR byte-length estimate (here the stream is truncated to 3 physical
    frames but Xing says 1000)."""
    from steel_datafusion_spark.pipeline.codecs import encode_mp3, probe_mp3

    p = bytearray(encode_mp3(3, bitrate_kbps=128, sample_rate=44100,
                             channels=2))
    side = 32  # MPEG-1 stereo side-info bytes
    tag = 4 + side
    p[tag:tag + 4] = b"Xing"
    p[tag + 4:tag + 8] = (1).to_bytes(4, "big")       # flags: frames
    p[tag + 8:tag + 12] = (1000).to_bytes(4, "big")   # frame count
    m = probe_mp3(bytes(p))
    assert m.vbr and m.n_frames == 1000
    assert m.duration_ms == 1000 * 1152 * 1000 // 44100


def test_extract_container_metadata_mp3(spark):
    from steel_datafusion_spark.pipeline.codecs import encode_mp3
    from steel_datafusion_spark.pipeline.multimodal import (
        MEDIA_SCHEMA, extract_container_metadata,
    )

    p = encode_mp3(100, bitrate_kbps=192, sample_rate=44100, channels=2)
    media = spark.createDataFrame(
        [(7, "audio", bytearray(p), {"width": 0, "height": 0,
                                     "duration_ms": 0})], MEDIA_SCHEMA)
    got = extract_container_metadata(media).collect()[0]
    assert (got.container, got.probed, got.audio_codec) == ("mp3", True,
                                                            "mp3")
    assert got.duration_ms == 100 * 1152 * 1000 // 44100


# ---------------------------------------------------------------------------
# WebM / EBML walk
# ---------------------------------------------------------------------------

def test_probe_webm_roundtrip_and_vints():
    from steel_datafusion_spark.pipeline.codecs import (
        encode_webm, probe_webm, sniff_format,
    )

    p = encode_webm(93500, [
        {"kind": "video", "codec": "V_VP9", "width": 1280, "height": 720},
        {"kind": "audio", "codec": "A_OPUS", "width": 0, "height": 0},
    ])
    assert sniff_format(p) == "webm"
    m = probe_webm(p)
    assert (m.doctype, m.duration_ms, m.n_tracks) == ("webm", 93500, 2)
    v, a = m.tracks
    assert (v.kind, v.codec, v.width, v.height) == ("video", "V_VP9",
                                                    1280, 720)
    assert (a.kind, a.codec) == ("audio", "A_OPUS")
    # non-default timestamp scale exercises the duration math
    p2 = encode_webm(4000, [{"kind": "audio", "codec": "A_VORBIS",
                             "width": 0, "height": 0}],
                     doctype="matroska", timestamp_scale=500_000)
    m2 = probe_webm(p2)
    assert (m2.doctype, m2.duration_ms) == ("matroska", 4000)


def test_probe_webm_rejects_malformed():
    from steel_datafusion_spark.pipeline.codecs import encode_webm, probe_webm

    with pytest.raises(ValueError, match="EBML"):
        probe_webm(b"not ebml")
    # child element overrunning its parent
    p = bytearray(encode_webm(1000, [{"kind": "video", "codec": "V_VP8",
                                      "width": 8, "height": 8}]))
    # corrupt the Segment size down so children overrun it
    seg_at = bytes(p).find(b"\x18\x53\x80\x67")
    p[seg_at + 4] = 0x81  # 1-byte size = 1: far too small
    with pytest.raises(ValueError, match="overruns"):
        probe_webm(bytes(p))


def test_extract_container_metadata_webm(spark):
    from steel_datafusion_spark.pipeline.codecs import encode_webm
    from steel_datafusion_spark.pipeline.multimodal import (
        MEDIA_SCHEMA, extract_container_metadata,
    )

    p = encode_webm(9000, [
        {"kind": "video", "codec": "V_AV1", "width": 640, "height": 360},
        {"kind": "audio", "codec": "A_OPUS", "width": 0, "height": 0},
    ])
    media = spark.createDataFrame(
        [(9, "video", bytearray(p), {"width": 0, "height": 0,
                                     "duration_ms": 0})], MEDIA_SCHEMA)
    got = extract_container_metadata(media).collect()[0]
    assert (got.container, got.probed, got.n_tracks) == ("webm", True, 2)
    assert (got.video_codec, got.width, got.height,
            got.audio_codec, got.duration_ms) == ("V_AV1", 640, 360,
                                                  "A_OPUS", 9000)


# ---------------------------------------------------------------------------
# property-based container roundtrips (hypothesis)
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:
    _kinds = st.sampled_from(["video", "audio"])
    _codecs = st.text(alphabet="abcdefghij0123456789", min_size=1,
                      max_size=4)

    @settings(max_examples=40, deadline=None)
    @given(
        dur=st.integers(min_value=0, max_value=10**7),
        tracks=st.lists(st.fixed_dictionaries({
            "kind": _kinds, "codec": _codecs,
            "width": st.integers(min_value=0, max_value=8192),
            "height": st.integers(min_value=0, max_value=8192),
            "duration_ms": st.integers(min_value=0, max_value=10**7),
        }), min_size=0, max_size=4),
    )
    def test_mp4_roundtrip_property(dur, tracks):
        from steel_datafusion_spark.pipeline.codecs import (
            encode_mp4, probe_mp4,
        )

        m = probe_mp4(encode_mp4(dur, tracks))
        assert m.duration_ms == dur
        assert m.n_tracks == len(tracks)
        for got, want in zip(m.tracks, tracks):
            assert got.kind == want["kind"]
            assert got.codec == want["codec"].ljust(4)[:4].strip()
            if want["kind"] == "video":
                assert (got.width, got.height) == (want["width"],
                                                   want["height"])
            assert got.duration_ms == want["duration_ms"]

    @settings(max_examples=40, deadline=None)
    @given(
        dur=st.integers(min_value=0, max_value=10**7),
        ts_scale=st.sampled_from([100_000, 500_000, 1_000_000, 2_000_000]),
        tracks=st.lists(st.fixed_dictionaries({
            "kind": _kinds,
            "codec": st.sampled_from(["V_VP8", "V_VP9", "V_AV1",
                                      "A_OPUS", "A_VORBIS"]),
            "width": st.integers(min_value=0, max_value=8192),
            "height": st.integers(min_value=0, max_value=8192),
        }), min_size=0, max_size=4),
    )
    def test_webm_roundtrip_property(dur, ts_scale, tracks):
        from steel_datafusion_spark.pipeline.codecs import (
            encode_webm, probe_webm,
        )

        m = probe_webm(encode_webm(dur, tracks, timestamp_scale=ts_scale))
        # duration roundtrips through a float64 in TimestampScale units:
        # exact while dur*1e6/scale has <= 53 significant bits (always
        # true for these ranges)
        assert m.duration_ms == dur
        assert m.n_tracks == len(tracks)
        for got, want in zip(m.tracks, tracks):
            assert (got.kind, got.codec) == (want["kind"], want["codec"])
            if want["kind"] == "video":
                assert (got.width, got.height) == (want["width"],
                                                   want["height"])

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=400),
        br=st.sampled_from([32, 64, 96, 128, 192, 256, 320]),
        sr=st.sampled_from([32000, 44100, 48000]),
        ch=st.sampled_from([1, 2]),
        id3=st.integers(min_value=0, max_value=512),
    )
    def test_mp3_roundtrip_property(n, br, sr, ch, id3):
        from steel_datafusion_spark.pipeline.codecs import (
            encode_mp3, probe_mp3,
        )

        m = probe_mp3(encode_mp3(n, bitrate_kbps=br, sample_rate=sr,
                                 channels=ch, id3_bytes=id3))
        assert (m.bitrate_kbps, m.sample_rate, m.channels) == (br, sr, ch)
        assert m.n_frames == n
        assert m.duration_ms == n * 1152 * 1000 // sr
