"""Pipeline gate registry, part 2/5 (see pipeline/queries.py for the catalog contract)."""

from .gates_common import *  # noqa: F401,F403
from .gates_01 import *  # noqa: F401,F403




def _media_ids(spark, sf_dir, n):
    """doc_id slice for the synthetic-media gates, spread across the
    worker pool: the slice arrives as ONE scan partition, and payload
    synthesis is pure Python — a single hostage task serializes the
    whole stage (media_curation measured 13-25 s single-partition vs
    ~2 s spread), and at 100x assets it would be THE bottleneck."""
    parts = spark.sparkContext.defaultParallelism
    return (load_tables(spark, sf_dir)["documents"]
            .filter(F.col("doc_id") < n).select("doc_id")
            .repartition(parts, "doc_id"))

def q_corpus_overlap(spark, sf_dir):
    """Corpus-level overlap (pipeline/dedup.py corpus_overlap): exact
    shingle Jaccard between two overlapping document slices plus the
    MinHash corpus-sketch estimate — the sketch is md5-affine
    arithmetic, so the oracle recomputes the ESTIMATE exactly too (a
    hash-checked sketch, not a bound check).  Gate uses k=32 slots
    (sigma ~0.09 — plenty for a diagnostic; production default stays
    64) and 1/8 hash-sampled corpora: the overlap DIAGNOSTIC is the one
    op that may legitimately run on a sample, since Jaccard of uniform
    same-key samples concentrates around the full-corpus value."""
    from .dedup import corpus_overlap
    from .sampling import hash_unit

    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    d = d.filter(hash_unit(F.col("doc_id"), "ovl") % 8 == 0)
    a = d.filter(F.col("doc_id") < 300)
    b = d.filter(F.col("doc_id") >= 200)
    return corpus_overlap(a, b, k=32)


def _sql_corpus_overlap(k: int = 32) -> str:
    from .sampling import sql_hash_unit

    samp = sql_hash_unit("doc_id", "ovl")
    hs = DSQL.hashed_shingles("text")
    mins_a = ", ".join(
        f"min({DSQL.mix(DSQL.mix('h', i), i + k)}) AS m{i}"
        for i in range(k))
    mins_b = mins_a
    eq = " + ".join(
        f"CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END" for i in range(k))
    return f"""
WITH S AS (SELECT doc_id, text FROM documents
           WHERE {samp} % 8 = 0),
A AS (SELECT DISTINCT unnest({hs}) AS h FROM S WHERE doc_id < 300),
B AS (SELECT DISTINCT unnest({hs}) AS h FROM S WHERE doc_id >= 200),
na AS (SELECT count(*) AS n_a FROM A),
nb AS (SELECT count(*) AS n_b FROM B),
nc AS (SELECT count(*) AS n_common FROM A JOIN B USING (h)),
sa AS (SELECT {mins_a} FROM A),
sb AS (SELECT {mins_b} FROM B)
SELECT n_a, n_b, n_common,
  round(n_common / CAST(n_a + n_b - n_common AS DOUBLE), 6) AS jaccard,
  round(({eq}) / {float(k)}, 6) AS est_jaccard
FROM na, nb, nc, sa, sb
"""


def q_token_budget_subset(spark, sf_dir):
    """Exact token-budget corpus cut (pipeline/sampling.py
    token_budget_subset): keep documents in deterministic md5-shuffle
    order until 20k tokens, computed as a distributed two-phase prefix
    sum (per-bucket offsets + within-bucket windows — no global sort).
    The oracle computes the same inclusive running total with one global
    window, exact at oracle scale."""
    from .sampling import token_budget_subset

    d = load_tables(spark, sf_dir)["documents"]
    d = d.withColumn("n_tok", TX.token_count(F.col("text")))
    kept = token_budget_subset(d, "n_tok", budget=20_000)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("sum_tokens"),
        F.max("_cum_tokens").alias("max_cum"))


def _sql_token_budget() -> str:
    from .sampling import sql_hash_unit

    h = sql_hash_unit("doc_id", "budget")
    return f"""
WITH t AS (
  SELECT doc_id, source, {TX.sql_token_count('text')} AS n_tok, {h} AS hu
  FROM documents
),
c AS (
  SELECT *, SUM(n_tok) OVER (ORDER BY hu, doc_id) AS cum FROM t
)
SELECT source, COUNT(*) AS n_docs, SUM(n_tok)::BIGINT AS sum_tokens,
       MAX(cum)::BIGINT AS max_cum
FROM c WHERE cum <= 20000 GROUP BY source
"""


def q_mixture_temperature(spark, sf_dir):
    """Temperature-flattened mixture (pipeline/curation.py
    mixture_resample_temperature, alpha=0.5): output shares proportional
    to sqrt(observed share) — the multilingual rebalancing rule — via the
    same deterministic md5 coin and ppm-quantized threshold as
    mixture_resample."""
    from .curation import mixture_resample_temperature

    d = load_tables(spark, sf_dir)["documents"]
    out = mixture_resample_temperature(d, alpha=0.5)
    return out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"))


def _sql_mixture_temperature() -> str:
    from .sampling import sql_hash_unit

    h = sql_hash_unit("doc_id", "mixT")
    return f"""
WITH counts AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
tot AS (SELECT sum(n) AS t FROM counts),
ratio AS (
  SELECT source,
         pow(CAST(n AS DOUBLE) / CAST(t AS DOUBLE), -0.5) AS ratio
  FROM counts CROSS JOIN tot),
mx AS (SELECT max(ratio) AS m FROM ratio),
rates AS (SELECT source, floor(round(ratio / m, 6) * 1000000)::BIGINT AS ppm
          FROM ratio, mx),
kept AS (
  SELECT d.doc_id, d.source
  FROM documents d JOIN rates USING (source)
  WHERE {h} * 1000000 < ppm * 4294967296)
SELECT source, count(*) AS n_kept, min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id
FROM kept GROUP BY source
"""


def _sql_mixture_resample() -> str:
    from .sampling import sql_hash_unit

    values = ", ".join(f"('{k}', {v})" for k, v in _MIX_TARGETS.items())
    h = sql_hash_unit("doc_id", "mix")
    return f"""
WITH counts AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
tot AS (SELECT sum(n) AS t FROM counts),
tgt(source, target) AS (VALUES {values}),
ratio AS (
  -- all-DOUBLE arithmetic: DuckDB would otherwise fold DECIMAL targets and
  -- HUGEINT sums exactly, disagreeing with Spark's double pipeline by 1 ppm
  -- at half-way rounding boundaries and flipping borderline coin rows.
  SELECT c.source,
         CAST(target AS DOUBLE) * CAST(t AS DOUBLE) / CAST(n AS DOUBLE) AS ratio
  FROM counts c JOIN tgt ON c.source = tgt.source CROSS JOIN tot),
mx AS (SELECT max(ratio) AS m FROM ratio),
rates AS (SELECT source, floor(round(ratio / m, 6) * 1000000)::BIGINT AS ppm
          FROM ratio, mx)
SELECT d.doc_id, d.source
FROM documents d JOIN rates USING (source)
WHERE {h} * 1000000 < ppm * 4294967296
"""


# ---------------------------------------------------------------------------
# Multimodal
# ---------------------------------------------------------------------------

def q_multimodal_features(spark, sf_dir):
    """Binary-payload feature extraction (mapInPandas) → per-kind rollup.
    The Spark path flows through real binary columns + Arrow batches; the
    oracle recomputes the same byte stats from the source text."""
    d = load_tables(spark, sf_dir)["documents"]
    feats = extract_features(make_media_table(d))
    return feats.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum("checksum").alias("total_checksum"),
        F.round(F.avg("aspect"), 6).alias("avg_aspect"),
    )


_SQL_MULTIMODAL = """
WITH media AS (
  SELECT doc_id AS media_id,
    ['image','audio','video'][(doc_id % 3)::INT + 1] AS kind,
    regexp_replace(text, '[^\\x00-\\x7F]', '', 'g') AS atext,
    (n_chars % 1920)::INT AS width, (n_chars % 1080)::INT AS height
  FROM documents),
feats AS (
  SELECT media_id, kind,
    octet_length(encode(atext)) AS n_bytes,
    COALESCE(list_sum(list_transform(string_split(atext, ''), c -> ascii(c))), 0) AS checksum,
    CASE WHEN height = 0 THEN 0.0 ELSE CAST(width AS DOUBLE) / height END AS aspect
  FROM media)
SELECT kind, COUNT(*) AS n_media, SUM(n_bytes)::BIGINT AS total_bytes,
       SUM(checksum)::BIGINT AS total_checksum, round(AVG(aspect), 6) AS avg_aspect
FROM feats GROUP BY kind
"""


def q_audio_features(spark, sf_dir):
    """REAL WAV decode as a hashed gate: per-document square-wave WAV
    payloads are synthesized executor-side (pipeline/codecs.py encode_wav)
    with doc_id-derived parameters, then decoded back through
    extract_audio_features (codecs.decode_wav — RIFF walk, PCM parse,
    normalization, RMS).  Because every encode parameter is a closed-form
    function of doc_id, the DuckDB oracle computes the exact expected
    decode output (a ±a square wave quantized to 16-bit has RMS
    round(a*32768)/32768 exactly) — a wrong chunk walk, byte order,
    normalization, or RMS shows up as a hash mismatch."""
    import pandas as pd_local

    from .codecs import encode_wav
    from .multimodal import extract_audio_features

    d = _media_ids(spark, sf_dir, 200)

    def _gen(batches):
        for pdf in batches:
            payloads, metas = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                rate = 8000 + (did % 4) * 4000
                n = 100 + did % 50
                amp = ((did % 9) + 1) / 10.0
                samples = [amp if i % 2 == 0 else -amp for i in range(n)]
                payloads.append(encode_wav(samples, sample_rate=rate,
                                           n_channels=1, bits=16))
                metas.append({"width": 0, "height": 0, "duration_ms": 0})
            yield pd_local.DataFrame({
                "media_id": pdf["doc_id"].astype("int64"),
                "kind": ["audio"] * len(pdf),
                "payload": payloads,
                "meta": metas,
            })

    from .multimodal import MEDIA_SCHEMA
    media = d.mapInPandas(_gen, schema=MEDIA_SCHEMA)
    return extract_audio_features(media).select(
        "media_id", "decoded", "n_channels", "sample_rate", "bits",
        "n_frames", "duration_ms", "rms")


_SQL_AUDIO_FEATURES = """
SELECT doc_id AS media_id, TRUE AS decoded, 1 AS n_channels,
  (8000 + (doc_id % 4) * 4000)::INT AS sample_rate, 16 AS bits,
  (100 + doc_id % 50)::BIGINT AS n_frames,
  ((100 + doc_id % 50) * 1000) // (8000 + (doc_id % 4) * 4000)
    AS duration_ms,
  round(round(((doc_id % 9) + 1) / 10.0 * 32768) / 32768, 6) AS rms
FROM documents WHERE doc_id < 200
"""


def q_video_features(spark, sf_dir):
    """REAL AVI video decode as a hashed gate: per-document AVI payloads
    (pipeline/codecs.py encode_avi — RIFF hdrl/strh/strf/movi, raw-DIB
    bottom-up BGR frames) are synthesized executor-side with doc_id-derived
    parameters, then decoded back through extract_video_features
    (codecs.decode_avi — chunk-tree walk, DIB row flip + BGR swizzle, fps
    from strh rate/scale).  Every encode parameter is a closed-form
    function of doc_id, so the DuckDB oracle recomputes the exact decode
    output — solid-color frames make the mean pixel value (r+g+b)/3
    exactly; a wrong chunk walk, stride, row order, or channel swizzle
    shows up as a hash mismatch.  MJPEG-stream decode shares the same
    walker and is round-trip-tested in tests/test_codecs.py (lossy, so
    not hash-oracled)."""
    import pandas as pd_local

    from .codecs import DecodedImage, encode_avi
    from .multimodal import MEDIA_SCHEMA, extract_video_features

    d = _media_ids(spark, sf_dir, 120)

    def _gen(batches):
        for pdf in batches:
            payloads, metas = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 3 + did % 5
                w = 8 + (did % 3) * 4
                h = 6 + (did % 2) * 2
                rate = 5 + did % 3
                frames = [DecodedImage(w, h, "RGB", bytes((
                    (did * 7 + f * 13) % 256,
                    (did * 11 + f * 17) % 256,
                    (did * 3 + f * 29) % 256)) * (w * h))
                    for f in range(n)]
                payloads.append(encode_avi(frames, rate=rate, scale=1))
                metas.append({"width": w, "height": h, "duration_ms": 0})
            yield pd_local.DataFrame({
                "media_id": pdf["doc_id"].astype("int64"),
                "kind": ["video"] * len(pdf),
                "payload": payloads,
                "meta": metas,
            })

    media = d.mapInPandas(_gen, schema=MEDIA_SCHEMA)
    return extract_video_features(media).select(
        "media_id", "decoded", "width", "height", "fps", "n_frames",
        "duration_ms", "mean_luma")


_SQL_VIDEO_FEATURES = """
WITH params AS (
  SELECT doc_id,
    (3 + doc_id % 5)::BIGINT AS n_frames,
    (8 + (doc_id % 3) * 4)::INT AS w,
    (6 + (doc_id % 2) * 2)::INT AS h,
    (5 + doc_id % 3)::INT AS fps
  FROM documents WHERE doc_id < 120),
per_frame AS (
  SELECT doc_id, n_frames, w, h, fps,
    unnest(range(n_frames)) AS f
  FROM params),
lumas AS (
  SELECT doc_id,
    avg((((doc_id * 7 + f * 13) % 256)
       + ((doc_id * 11 + f * 17) % 256)
       + ((doc_id * 3 + f * 29) % 256)) / 3.0) AS ml
  FROM per_frame GROUP BY doc_id)
SELECT p.doc_id AS media_id, TRUE AS decoded, p.w AS width, p.h AS height,
  p.fps::DOUBLE AS fps, p.n_frames AS n_frames,
  ((p.n_frames * 1000) // p.fps)::BIGINT AS duration_ms,
  round(l.ml, 6) AS mean_luma
FROM params p JOIN lumas l USING (doc_id)
"""


def q_mp4_metadata(spark, sf_dir):
    """MP4/ISO-BMFF container metadata walk as a hashed gate
    (pipeline/codecs.py probe_mp4 + multimodal.extract_container_metadata):
    per-document MP4 containers (codecs.encode_mp4 — ftyp + a full moov
    box tree: mvhd, per-trak tkhd/mdhd/hdlr/stsd) are synthesized
    executor-side with doc_id-derived parameters, then probed back
    through the Arrow-batched container walker.  Every parameter
    (duration, track layout, codec fourccs, 16.16 fixed-point
    dimensions) is a closed-form function of doc_id, so the DuckDB
    oracle recomputes the exact probe output — a wrong box-size walk,
    fixed-point shift, or fullbox version offset shows up as a hash
    mismatch.  Coded samples are never touched (the honest envelope:
    container metadata IS what a crawl-curation keep/drop pass needs)."""
    import pandas as pd_local

    from .codecs import encode_mp4
    from .multimodal import MEDIA_SCHEMA, extract_container_metadata

    d = _media_ids(spark, sf_dir, 150)

    def _gen(batches):
        for pdf in batches:
            payloads, metas = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                dur = 30000 + (did % 97) * 250
                vcodec = ("avc1", "hev1", "vp09")[did % 3]
                w = 640 + (did % 4) * 320
                h = 360 + (did % 3) * 180
                tracks = [{"kind": "video", "codec": vcodec,
                           "width": w, "height": h, "duration_ms": dur}]
                if did % 5 != 0:
                    tracks.append({"kind": "audio", "codec": "mp4a",
                                   "width": 0, "height": 0,
                                   "duration_ms": dur - 40})
                payloads.append(encode_mp4(dur, tracks))
                metas.append({"width": 0, "height": 0, "duration_ms": 0})
            yield pd_local.DataFrame({
                "media_id": pdf["doc_id"].astype("int64"),
                "kind": ["video"] * len(pdf),
                "payload": payloads,
                "meta": metas,
            })

    media = d.mapInPandas(_gen, schema=MEDIA_SCHEMA)
    return extract_container_metadata(media).select(
        "media_id", "container", "probed", "duration_ms", "n_tracks",
        "video_codec", "width", "height", "audio_codec")


def q_media_curation(spark, sf_dir):
    """End-to-end multimodal keep/drop pass — what the container probes
    exist FOR: a mixed corpus (each doc becomes an MP4, WebM, or MP3 by
    doc_id mod 3, parameters doc_id-derived) flows through
    extract_container_metadata once, then a pure-JVM filter applies the
    curation policy (video: duration 20-240 s AND height >= 480 AND
    codec allowlisted; audio: duration 60-600 s) and the gate returns
    per-container keep/drop counts with average kept duration.  One
    Arrow map stage + one 3-group aggregate; the oracle recomputes the
    whole policy closed-form."""
    import pandas as pd_local

    from .codecs import encode_mp3, encode_mp4, encode_webm
    from .multimodal import MEDIA_SCHEMA, extract_container_metadata

    d = _media_ids(spark, sf_dir, 300)

    def _gen(batches):
        for pdf in batches:
            payloads, kinds, metas = [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                m = did % 3
                if m == 0:
                    dur = 5000 + (did % 71) * 4000
                    h = 240 + (did % 5) * 120
                    codec = ("avc1", "mpg2")[did % 2]
                    payloads.append(encode_mp4(dur, [
                        {"kind": "video", "codec": codec, "width": h * 16 // 9,
                         "height": h, "duration_ms": dur}]))
                    kinds.append("video")
                elif m == 1:
                    dur = 5000 + (did % 67) * 4500
                    h = 240 + (did % 4) * 240
                    codec = ("V_VP9", "V_MS/VFW")[did % 2]
                    payloads.append(encode_webm(dur, [
                        {"kind": "video", "codec": codec,
                         "width": h * 16 // 9, "height": h}]))
                    kinds.append("video")
                else:
                    n = 500 + (did % 97) * 250
                    payloads.append(encode_mp3(
                        n, bitrate_kbps=128, sample_rate=44100))
                    kinds.append("audio")
                metas.append({"width": 0, "height": 0, "duration_ms": 0})
            yield pd_local.DataFrame({
                "media_id": pdf["doc_id"].astype("int64"),
                "kind": kinds,
                "payload": payloads,
                "meta": metas,
            })

    media = d.mapInPandas(_gen, schema=MEDIA_SCHEMA)
    probed = extract_container_metadata(media)
    video_ok = ((F.col("duration_ms").between(20_000, 240_000))
                & (F.col("height") >= 480)
                & (F.col("video_codec").isin("avc1", "V_VP8", "V_VP9",
                                             "V_AV1")))
    audio_ok = F.col("duration_ms").between(60_000, 600_000)
    keep = F.when(F.col("container").isin("mp4", "webm"), video_ok) \
        .otherwise(audio_ok)
    return (probed.withColumn("keep", keep)
            .groupBy("container")
            .agg(F.count(F.lit(1)).cast("long").alias("n_assets"),
                 F.sum(F.col("keep").cast("long")).cast("long")
                 .alias("n_kept"),
                 F.round(F.avg(F.when(F.col("keep"),
                                      F.col("duration_ms") / 1000.0)), 6)
                 .alias("avg_kept_s")))


_SQL_MEDIA_CURATION = """
WITH assets AS (
  SELECT doc_id,
    CASE doc_id % 3 WHEN 0 THEN 'mp4' WHEN 1 THEN 'webm'
         ELSE 'mp3' END AS container,
    CASE doc_id % 3
      WHEN 0 THEN (5000 + (doc_id % 71) * 4000)::BIGINT
      WHEN 1 THEN (5000 + (doc_id % 67) * 4500)::BIGINT
      ELSE ((500 + (doc_id % 97) * 250) * 1152 * 1000 // 44100)::BIGINT
    END AS duration_ms,
    CASE doc_id % 3
      WHEN 0 THEN 240 + (doc_id % 5) * 120
      WHEN 1 THEN 240 + (doc_id % 4) * 240
      ELSE 0 END AS height,
    CASE doc_id % 3
      WHEN 0 THEN (CASE WHEN doc_id % 2 = 0 THEN 'avc1' ELSE 'mpg2' END)
      WHEN 1 THEN (CASE WHEN doc_id % 2 = 0 THEN 'V_VP9'
                        ELSE 'V_MS/VFW' END)
      ELSE '' END AS video_codec
  FROM documents WHERE doc_id < 300),
flagged AS (
  SELECT container, duration_ms,
    CASE WHEN container IN ('mp4', 'webm')
         THEN duration_ms BETWEEN 20000 AND 240000
              AND height >= 480
              AND video_codec IN ('avc1', 'V_VP8', 'V_VP9', 'V_AV1')
         ELSE duration_ms BETWEEN 60000 AND 600000 END AS keep
  FROM assets)
SELECT container, COUNT(*)::BIGINT AS n_assets,
  SUM(keep::INT)::BIGINT AS n_kept,
  round(AVG(CASE WHEN keep THEN duration_ms / 1000.0 END), 6)
    AS avg_kept_s
FROM flagged GROUP BY container
"""


def q_webm_metadata(spark, sf_dir):
    """WebM/Matroska EBML walk as a hashed gate (pipeline/codecs.py
    probe_webm + multimodal.extract_container_metadata): per-document
    EBML trees (codecs.encode_webm — header DocType + Segment > Info
    TimestampScale/Duration + Tracks > TrackEntry TrackType/CodecID/
    Video PixelWidth/PixelHeight) synthesized executor-side with
    doc_id-derived parameters and walked back.  A wrong vint length
    decode (marker kept for ids, stripped for sizes), child-bounds
    check, or float-duration scale shows up as a hash mismatch."""
    import pandas as pd_local

    from .codecs import encode_webm
    from .multimodal import MEDIA_SCHEMA, extract_container_metadata

    d = _media_ids(spark, sf_dir, 150)

    def _gen(batches):
        for pdf in batches:
            payloads, metas = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                dur = 15000 + (did % 89) * 125
                vcodec = ("V_VP8", "V_VP9", "V_AV1")[did % 3]
                w = 426 + (did % 5) * 213
                h = 240 + (did % 4) * 120
                tracks = [{"kind": "video", "codec": vcodec,
                           "width": w, "height": h}]
                if did % 4 != 0:
                    tracks.append({"kind": "audio", "codec": "A_OPUS",
                                   "width": 0, "height": 0})
                payloads.append(encode_webm(dur, tracks))
                metas.append({"width": 0, "height": 0, "duration_ms": 0})
            yield pd_local.DataFrame({
                "media_id": pdf["doc_id"].astype("int64"),
                "kind": ["video"] * len(pdf),
                "payload": payloads,
                "meta": metas,
            })

    media = d.mapInPandas(_gen, schema=MEDIA_SCHEMA)
    return extract_container_metadata(media).select(
        "media_id", "container", "probed", "duration_ms", "n_tracks",
        "video_codec", "width", "height", "audio_codec")


_SQL_WEBM_METADATA = """
SELECT doc_id AS media_id, 'webm' AS container, TRUE AS probed,
  (15000 + (doc_id % 89) * 125)::BIGINT AS duration_ms,
  (CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 2 END)::INT AS n_tracks,
  CASE doc_id % 3 WHEN 0 THEN 'V_VP8' WHEN 1 THEN 'V_VP9'
       ELSE 'V_AV1' END AS video_codec,
  (426 + (doc_id % 5) * 213)::INT AS width,
  (240 + (doc_id % 4) * 120)::INT AS height,
  CASE WHEN doc_id % 4 = 0 THEN '' ELSE 'A_OPUS' END AS audio_codec
FROM documents WHERE doc_id < 150
"""


def q_mp3_metadata(spark, sf_dir):
    """MPEG-audio header walk as a hashed gate (pipeline/codecs.py
    probe_mp3 + multimodal.extract_container_metadata): per-document CBR
    MP3 streams (codecs.encode_mp3 — optional ID3v2 shell + n correct
    frame headers over zero-filled payloads) are synthesized
    executor-side with doc_id-derived parameters and probed back.  The
    oracle recomputes the closed-form duration (frames x 1152 samples /
    rate) — a wrong ID3 syncsafe skip, frame-sync scan, bitrate/rate
    table lookup, or frame-length formula shifts the frame count or
    duration and hash-mismatches."""
    import pandas as pd_local

    from .codecs import encode_mp3
    from .multimodal import MEDIA_SCHEMA, extract_container_metadata

    d = _media_ids(spark, sf_dir, 150)

    def _gen(batches):
        for pdf in batches:
            payloads, metas = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 100 + did % 50
                br = (64, 128, 192)[did % 3]
                sr = (44100, 32000)[did % 2]
                ch = 1 + (did % 2)
                payloads.append(encode_mp3(
                    n, bitrate_kbps=br, sample_rate=sr, channels=ch,
                    id3_bytes=(did % 7) * 16))
                metas.append({"width": 0, "height": 0, "duration_ms": 0})
            yield pd_local.DataFrame({
                "media_id": pdf["doc_id"].astype("int64"),
                "kind": ["audio"] * len(pdf),
                "payload": payloads,
                "meta": metas,
            })

    media = d.mapInPandas(_gen, schema=MEDIA_SCHEMA)
    return extract_container_metadata(media).select(
        "media_id", "container", "probed", "duration_ms", "n_tracks",
        "audio_codec")


_SQL_MP3_METADATA = """
SELECT doc_id AS media_id, 'mp3' AS container, TRUE AS probed,
  ((100 + doc_id % 50) * 1152 * 1000
   // (CASE WHEN doc_id % 2 = 0 THEN 44100 ELSE 32000 END))::BIGINT
    AS duration_ms,
  1::INT AS n_tracks, 'mp3' AS audio_codec
FROM documents WHERE doc_id < 150
"""


def q_mpegts_metadata(spark, sf_dir):
    """MPEG-TS packet walk as a hashed gate (pipeline/codecs.py
    probe_mpegts + multimodal.extract_container_metadata): per-document
    transport streams (codecs.encode_mpegts — PAT + PMT + two
    PCR-bearing packets) are synthesized executor-side with
    doc_id-derived stream layouts and probed back.  The oracle
    recomputes the closed-form duration (PCR span / 27 MHz) and the
    PMT-declared codecs — a wrong PID mask, adaptation-field offset,
    PCR bit split (33+6+9), or stream-type table hash-mismatches.  Cost
    is O(packets scanned), header-only; PES payloads never touched."""
    import pandas as pd_local

    from .codecs import encode_mpegts
    from .multimodal import MEDIA_SCHEMA, extract_container_metadata

    d = _media_ids(spark, sf_dir, 150)

    def _gen(batches):
        for pdf in batches:
            payloads, metas = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                vid = ("h264", "hevc", "mpeg2")[did % 3]
                streams = [("video", vid)]
                if did % 4 != 0:
                    streams.append(("audio", ("aac", "mp3")[did % 2]))
                payloads.append(encode_mpegts(
                    20000 + (did % 83) * 250, streams,
                    program_number=1 + did % 9))
                metas.append({"width": 0, "height": 0, "duration_ms": 0})
            yield pd_local.DataFrame({
                "media_id": pdf["doc_id"].astype("int64"),
                "kind": ["video"] * len(pdf),
                "payload": payloads,
                "meta": metas,
            })

    media = d.mapInPandas(_gen, schema=MEDIA_SCHEMA)
    return extract_container_metadata(media).select(
        "media_id", "container", "probed", "duration_ms", "n_tracks",
        "video_codec", "audio_codec")


_SQL_MPEGTS_METADATA = """
SELECT doc_id AS media_id, 'mpegts' AS container, TRUE AS probed,
  (20000 + (doc_id % 83) * 250)::BIGINT AS duration_ms,
  (CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 2 END)::INT AS n_tracks,
  CASE doc_id % 3 WHEN 0 THEN 'h264' WHEN 1 THEN 'hevc'
       ELSE 'mpeg2' END AS video_codec,
  CASE WHEN doc_id % 4 = 0 THEN ''
       WHEN doc_id % 2 = 0 THEN 'aac' ELSE 'mp3' END AS audio_codec
FROM documents WHERE doc_id < 150
"""


def q_flac_metadata(spark, sf_dir):
    """FLAC STREAMINFO walk as a hashed gate (pipeline/codecs.py
    probe_flac + multimodal.extract_container_metadata): per-document
    FLAC stream heads (codecs.encode_flac — fLaC marker + STREAMINFO,
    some with a PADDING block) are synthesized executor-side with
    doc_id-derived rate/channels/bits/total-samples and probed back.
    The oracle recomputes the closed-form duration (total samples /
    rate) — a wrong bit offset in the packed 20/3/5/36-bit STREAMINFO
    layout shifts every field and hash-mismatches.  Same one-map-stage
    footer-read envelope as the MP4/MP3/WebM gates."""
    import pandas as pd_local

    from .codecs import encode_flac
    from .multimodal import MEDIA_SCHEMA, extract_container_metadata

    d = _media_ids(spark, sf_dir, 150)

    def _gen(batches):
        for pdf in batches:
            payloads, metas = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                total = (did % 97 + 10) * 4410
                sr = (44100, 22050, 48000)[did % 3]
                payloads.append(encode_flac(
                    total, sample_rate=sr, channels=1 + did % 2,
                    bits_per_sample=(16, 24)[did % 2],
                    padding=(did % 5) * 8))
                metas.append({"width": 0, "height": 0, "duration_ms": 0})
            yield pd_local.DataFrame({
                "media_id": pdf["doc_id"].astype("int64"),
                "kind": ["audio"] * len(pdf),
                "payload": payloads,
                "meta": metas,
            })

    media = d.mapInPandas(_gen, schema=MEDIA_SCHEMA)
    return extract_container_metadata(media).select(
        "media_id", "container", "probed", "duration_ms", "n_tracks",
        "audio_codec")


_SQL_FLAC_METADATA = """
SELECT doc_id AS media_id, 'flac' AS container, TRUE AS probed,
  ((doc_id % 97 + 10) * 4410 * 1000
   // (CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 22050
       ELSE 48000 END))::BIGINT AS duration_ms,
  1::INT AS n_tracks, 'flac' AS audio_codec
FROM documents WHERE doc_id < 150
"""


def q_ogg_metadata(spark, sf_dir):
    """Ogg Vorbis page walk as a hashed gate (pipeline/codecs.py
    probe_ogg + multimodal.extract_container_metadata): per-document Ogg
    shells (codecs.encode_ogg — BOS page carrying the Vorbis id header,
    EOS page carrying the ending granule position) are synthesized
    executor-side and probed back.  The oracle recomputes the
    closed-form duration (ending granule / rate) — a wrong lacing walk,
    granule endianness, or id-header offset hash-mismatches.  Cost is a
    seek to each end of the payload, the same envelope as a parquet
    footer read."""
    import pandas as pd_local

    from .codecs import encode_ogg
    from .multimodal import MEDIA_SCHEMA, extract_container_metadata

    d = _media_ids(spark, sf_dir, 150)

    def _gen(batches):
        for pdf in batches:
            payloads, metas = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                total = (did % 89 + 5) * 8820
                sr = (44100, 16000)[did % 2]
                payloads.append(encode_ogg(
                    total, sample_rate=sr, channels=1 + did % 2,
                    serial=did + 1))
                metas.append({"width": 0, "height": 0, "duration_ms": 0})
            yield pd_local.DataFrame({
                "media_id": pdf["doc_id"].astype("int64"),
                "kind": ["audio"] * len(pdf),
                "payload": payloads,
                "meta": metas,
            })

    media = d.mapInPandas(_gen, schema=MEDIA_SCHEMA)
    return extract_container_metadata(media).select(
        "media_id", "container", "probed", "duration_ms", "n_tracks",
        "audio_codec")


_SQL_OGG_METADATA = """
SELECT doc_id AS media_id, 'ogg' AS container, TRUE AS probed,
  ((doc_id % 89 + 5) * 8820 * 1000
   // (CASE WHEN doc_id % 2 = 0 THEN 44100 ELSE 16000 END))::BIGINT
    AS duration_ms,
  1::INT AS n_tracks, 'vorbis' AS audio_codec
FROM documents WHERE doc_id < 150
"""


_SQL_MP4_METADATA = """
SELECT doc_id AS media_id, 'mp4' AS container, TRUE AS probed,
  (30000 + (doc_id % 97) * 250)::BIGINT AS duration_ms,
  (CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 2 END)::INT AS n_tracks,
  CASE doc_id % 3 WHEN 0 THEN 'avc1' WHEN 1 THEN 'hev1'
       ELSE 'vp09' END AS video_codec,
  (640 + (doc_id % 4) * 320)::INT AS width,
  (360 + (doc_id % 3) * 180)::INT AS height,
  CASE WHEN doc_id % 5 = 0 THEN '' ELSE 'mp4a' END AS audio_codec
FROM documents WHERE doc_id < 150
"""


def q_resize_media_stats(spark, sf_dir):
    """Resize plumbing (pipeline/multimodal.py resize_media) as a hashed
    gate: resize every payload toward 640x480, roll up per kind.  The
    deterministic fake scales payload length by the area ratio (floor, min
    1 byte, never upscales); metadata is rewritten to the target frame —
    the oracle recomputes both from the source text."""
    from .multimodal import resize_media

    d = load_tables(spark, sf_dir)["documents"]
    rs = resize_media(make_media_table(d), 640, 480)
    return (rs.groupBy("kind")
            .agg(F.count(F.lit(1)).alias("n_media"),
                 F.sum(F.octet_length("payload")).alias("resized_bytes"),
                 F.sum(F.col("meta.width") + F.col("meta.height"))
                 .alias("dim_sum"))
            .orderBy("kind"))


_SQL_RESIZE_MEDIA = r"""
WITH media AS (
  SELECT doc_id AS media_id,
    ['image','audio','video'][(doc_id % 3)::INT + 1] AS kind,
    octet_length(encode(regexp_replace(text, '[^\x00-\x7F]', '', 'g'))) AS len,
    CASE WHEN (n_chars % 1920) = 0 THEN 1 ELSE (n_chars % 1920) END AS ow,
    CASE WHEN (n_chars % 1080) = 0 THEN 1 ELSE (n_chars % 1080) END AS oh
  FROM documents),
calc AS (
  SELECT media_id, kind,
    greatest(1, floor(len * least(CAST(640 * 480 AS DOUBLE) / (ow * oh),
                                  1.0))::BIGINT) AS new_len
  FROM media)
SELECT kind, COUNT(*) AS n_media, SUM(new_len)::BIGINT AS resized_bytes,
       COUNT(*) * (640 + 480) AS dim_sum
FROM calc GROUP BY kind ORDER BY kind
"""


def q_winnow_fingerprints(spark, sf_dir):
    """Winnowing fingerprints + BPE-ish token counts per doc — scalar
    projections of the sketch (count/min/max) so the driver hash stays
    array-free."""
    d = load_tables(spark, sf_dir)["documents"]
    fps = winnow_fingerprints(d)
    stats = fps.select(
        "doc_id",
        F.size("fps").alias("n_fps"),
        F.array_min("fps").alias("min_fp"),
        F.array_max("fps").alias("max_fp"),
    )
    toks = d.select("doc_id", bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"))
    return stats.join(toks, "doc_id")


_SQL_WINNOW = f"""
WITH hs AS (SELECT doc_id, {DSQL.ordered_shingle_hashes('text')} AS h,
                   {sql_bpe_ish_token_count('text')} AS n_bpe_tokens
            FROM documents),
w AS (SELECT doc_id, n_bpe_tokens, {DSQL.winnow('h')} AS fps FROM hs)
SELECT doc_id, len(fps) AS n_fps, list_min(fps) AS min_fp,
       list_max(fps) AS max_fp, n_bpe_tokens
FROM w
"""


def q_kmeans_clusters(spark, sf_dir):
    """k-means (3 Lloyd iterations, DataFrame-only) cluster summary.

    Fully oracle-checked since r2: init (k lowest ids), tie-breaks
    (round(d2,9), cluster index) and the 6dp-rounded centroid means pin the
    whole trajectory bit-identically, so the 3 Lloyd iterations unroll into
    DuckDB CTEs (see _sql_kmeans)."""
    e = load_tables(spark, sf_dir)["embeddings"]
    assign, _cent = kmeans(e, k=8, iters=3)
    return (assign.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n_vectors"))
            .orderBy("cluster"))


def _sql_kmeans(
    k: int = 8, iters: int = 3, dim: int = 64,
    vecs_sql: str = "SELECT vec_id AS vid, embedding::DOUBLE[] AS v "
                    "FROM embeddings",
    body_only: bool = False,
) -> str:
    """Unrolled Lloyd iterations as DuckDB CTEs — same init, same rounded
    argmin tie-breaks, same 6dp-rounded per-dim centroid means as
    similarity.kmeans (the rounding step absorbs the ~1e-13 cross-engine
    AVG summation-order difference).  ``vecs_sql`` overrides the source
    relation (any query producing (vid, v)); ``body_only`` returns just the
    CTE list (no WITH / final SELECT) so callers can extend the chain —
    the final assignment relation is ``a{iters}`` (vid, v, cluster)."""
    avg_list = "[" + ", ".join(
        f"round(avg(v[{i}]), 6)" for i in range(1, dim + 1)) + "]"
    d2 = ("list_sum(list_transform(list_zip(e.v, c.c), "
          "p -> (p[1]-p[2])*(p[1]-p[2])))")
    ctes = [
        f"vecs AS ({vecs_sql})",
        f"c0 AS (SELECT row_number() OVER (ORDER BY vid) - 1 AS cluster, v AS c\n"
        f"       FROM (SELECT vid, v FROM vecs ORDER BY vid LIMIT {k}) t)",
    ]
    for i in range(1, iters + 1):
        ctes.append(f"""a{i} AS (
  SELECT vid, v, cluster FROM (
    SELECT e.vid, e.v, c.cluster,
      row_number() OVER (PARTITION BY e.vid
        ORDER BY round({d2}, 9) ASC, c.cluster ASC) AS r
    FROM vecs e, c{i - 1} c) t WHERE r = 1)""")
        if i < iters:
            ctes.append(
                f"c{i} AS (SELECT cluster, {avg_list} AS c "
                f"FROM a{i} GROUP BY cluster)")
    body = ",\n".join(ctes)
    if body_only:
        return body
    return ("WITH " + body
            + f"\nSELECT cluster, COUNT(*) AS n_vectors FROM a{iters} "
            f"GROUP BY cluster ORDER BY cluster")


def q_semdedup_prune(spark, sf_dir):
    """SemDeDup-style semantic dedup (similarity.semdedup): k-means blocks
    the corpus, cosine ≥ 0.99 within each cluster marks duplicates,
    higher-id member of each pair is dropped.  Runs on the augmented
    embeddings (10 planted exact copies) so the prune demonstrably fires.
    Output: per-cluster total/kept/removed counts.  The oracle unrolls the
    identical k-means trajectory (``_sql_kmeans`` CTEs) and mirrors the
    intra-cluster pair compare, so the whole cluster→prune pipeline is
    hash-checked."""
    from .similarity import semdedup

    # gate-side corpus cap (vec_id % 1e6 < 800, keeping the planted copies):
    # the pairwise-within-cluster stage is Σ|c|²·dim by design — the
    # OPERATOR keeps that bounded by sizing k to the corpus (see semdedup
    # docstring); the GATE demos it on a fixed k=8, so the demo corpus is
    # capped instead of letting the demo quadratic dominate the bench.
    corpus = _aug_emb(spark, sf_dir).filter(
        (F.col("vec_id") % 1000000) < 800)
    verdict = semdedup(corpus, k=8, iters=3, threshold=0.99)
    return (verdict.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n_vectors"),
                 F.sum(F.when(F.col("is_kept"), 0).otherwise(1))
                 .cast("long").alias("n_removed"),
                 F.sum(F.when(F.col("is_kept"), 1).otherwise(0))
                 .cast("long").alias("n_kept"))
            .orderBy("cluster"))


def _sql_semdedup(k: int = 8, iters: int = 3, threshold: float = 0.99) -> str:
    cos = _COS.format(a="a.v", b="b.v")
    kme = _sql_kmeans(k=k, iters=iters, body_only=True,
                      vecs_sql="SELECT vec_id AS vid, v FROM corpus "
                               "WHERE vec_id % 1000000 < 800")
    return f"""
WITH {_AUG_EMB_SQL},
{kme},
sd_pairs AS (
  SELECT a.vid AS a_id, b.vid AS b_id
  FROM a{iters} a JOIN a{iters} b
    ON a.cluster = b.cluster AND a.vid < b.vid
  WHERE round({cos}, 6) >= {threshold}
),
sd_removed AS (SELECT DISTINCT b_id AS vid FROM sd_pairs)
SELECT t.cluster,
       COUNT(*) AS n_vectors,
       COUNT(r.vid) AS n_removed,
       COUNT(*) - COUNT(r.vid) AS n_kept
FROM a{iters} t LEFT JOIN sd_removed r ON t.vid = r.vid
GROUP BY t.cluster ORDER BY t.cluster
"""


def q_tfidf_top_terms(spark, sf_dir):
    """TF-IDF top-3 terms per doc (doc_id<50): tokens → explode → per-(doc,
    term) tf → per-term document frequency → idf join → rank.

    Scale shape: two shuffles (term-count groupBy, df groupBy) + a broadcast
    of the term→idf table; the classic inverted-index build.  ln() on
    identical int inputs is bit-identical across engines; scores rounded 6dp,
    rank tie-broken by term."""
    from pyspark.sql.window import Window
    d = load_tables(spark, sf_dir)["documents"]
    # n_docs stays inside the plan (1-row agg, broadcast) — a driver-side
    # d.count() here would be an eager extra scan during query *build*
    n_docs = d.agg(F.count(F.lit(1)).cast("double").alias("_n_docs"))
    toks = (d.select("doc_id", F.explode(TX.tokens(F.col("text"))).alias("term")))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = dfreq.crossJoin(F.broadcast(n_docs)).select(
        "term",
        (F.log((F.col("_n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0).alias("idf"))
    scored = (tf.filter(F.col("doc_id") < 50)
              .join(F.broadcast(idf), "term")
              .select("doc_id", "term",
                      F.round(F.col("tf") * F.col("idf"), 6).alias("tfidf")))
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(),
                                             F.col("term").asc())
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 3)
            .select("doc_id", "term", "tfidf", "rnk"))


def _sql_tfidf() -> str:
    toks = TX.sql_tokens("text")
    return f"""
WITH tok AS (SELECT doc_id, unnest({toks}) AS term FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
idf AS (SELECT term, ln((n.n_docs + 1.0) / (COUNT(*) + 1.0)) + 1.0 AS idf
        FROM tf, n GROUP BY term, n.n_docs),
scored AS (
  SELECT tf.doc_id, tf.term, round(tf.tf * idf.idf, 6) AS tfidf
  FROM tf JOIN idf ON tf.term = idf.term WHERE tf.doc_id < 50)
SELECT doc_id, term, tfidf, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY tfidf DESC, term ASC) AS rnk
  FROM scored) t WHERE rnk <= 3
"""


def q_similarity_lsh(spark, sf_dir):
    """Sign-random-projection LSH ANN top-10 (6 planes, hamming-1
    multiprobe) for vec_id<5."""
    e = load_tables(spark, sf_dir)["embeddings"]
    q = e.filter(F.col("vec_id") < 5)
    return lsh_topk(q, e, k=10, n_planes=6, multiprobe=True)


def _sql_similarity_lsh() -> str:
    n_planes = 6
    planes = hyperplanes(n_planes)
    terms = []
    for p, row in enumerate(planes):
        arr = "[" + ", ".join(repr(x) for x in row) + "]::DOUBLE[]"
        terms.append(
            f"CASE WHEN list_dot_product(v, {arr}) > 0 "
            f"THEN {1 << p}::BIGINT ELSE 0::BIGINT END")
    bucket = " + ".join(terms)
    shifts = "[" + ", ".join(str(s) for s in [0] + [1 << i for i in range(n_planes)]) + "]"
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
b AS (SELECT vec_id, v, {bucket} AS bucket FROM e),
q AS (SELECT vec_id AS query_id, v AS qv, bucket AS qbucket FROM b WHERE vec_id < 5),
probes AS (SELECT query_id, qv, xor(qbucket, sh.s) AS bucket
           FROM q, (SELECT unnest({shifts}) AS s) sh),
scored AS (
  SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id,
         round({_COS.format(a='p.qv', b='c.v')}, 6) AS score
  FROM probes p JOIN b c ON p.bucket = c.bucket AND p.query_id <> c.vec_id)
SELECT query_id, neighbor_id, score, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY score DESC, neighbor_id) AS rank
  FROM scored) t WHERE rank <= 10
"""


def q_asof_join(spark, sf_dir):
    """Backward as-of join: each 'error' event gets the latest prior-or-equal
    'purchase' event of the same user (union+window — single key shuffle,
    see operators/asof.py).  Oracle: DuckDB's native ASOF LEFT JOIN."""
    from ..operators.asof import asof_join

    ev = load_tables(spark, sf_dir)["events"]
    errors = (ev.filter(F.col("event_type") == "error")
              .select("user_id", F.col("event_id").alias("err_event_id"),
                      F.col("ts").alias("err_ts")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("user_id", F.col("event_id").alias("purch_event_id"),
                         F.col("ts").alias("purch_ts"),
                         F.round(F.col("value"), 6).alias("purch_value")))
    out = asof_join(errors, purchases, on=["user_id"],
                    left_ts="err_ts", right_ts="purch_ts",
                    right_tiebreak="purch_event_id")
    return out.select("user_id", "err_event_id", "err_ts",
                      "purch_event_id", "purch_value")


def q_sketch_distinct_rollup(spark, sf_dir):
    """Mergeable-sketch rollup (pipeline/sketches.py): per-event-type HLL
    sketches of user_id, merged up to one global estimate without
    rescanning — the pre-aggregation pattern for distinct counts at
    100 TB.  DataSketches estimate bits aren't reproducible in DuckDB, so
    the hashable output is (exact count, estimate-within-published-bound):
    Spark computes the exact distinct AND the sketch estimate in one plan
    and emits ``within_bound`` (|est − exact| ≤ 3·1.04/√2^lg_k · exact);
    the oracle recomputes the exact counts independently and expects TRUE.
    Finer-grained merge-vs-global and HIP-vs-composite assertions stay in
    tests/test_sketches.py."""
    from .sketches import hll_merge_rollup, hll_rollup

    ev = load_tables(spark, sf_dir)["events"]
    per_type = hll_rollup(ev, ["event_type"], "user_id", lg_k=12)
    merged = (hll_merge_rollup(per_type, [], "sketch")
              .withColumn("event_type", F.lit("__all__")))
    est = (per_type.select("event_type", "distinct_est")
           .unionByName(merged.select("event_type", "distinct_est")))
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact"))
    exact_all = (ev.agg(F.countDistinct("user_id").alias("n_exact"))
                 .withColumn("event_type", F.lit("__all__")))
    exact = exact.unionByName(exact_all.select("event_type", "n_exact"))
    bound = 3 * 1.04 / (2 ** 12) ** 0.5  # 3σ of the lg_k=12 RSE ≈ 4.875%
    return (est.join(exact, "event_type")
            .select("event_type", "n_exact",
                    (F.abs(F.col("distinct_est") - F.col("n_exact"))
                     <= F.col("n_exact") * F.lit(bound)).alias("within_bound"))
            .orderBy("event_type"))


_SQL_SKETCH_ROLLUP = """
WITH per AS (
  SELECT event_type, count(DISTINCT user_id) AS n_exact
  FROM events GROUP BY event_type
  UNION ALL
  SELECT '__all__' AS event_type, count(DISTINCT user_id) FROM events)
SELECT event_type, n_exact, TRUE AS within_bound FROM per ORDER BY event_type
"""


def q_sketch_quantile_rollup(spark, sf_dir):
    """KLL quantile rollup through the TWO-LEVEL merge path
    (pipeline/sketches.py, levels=2): per-(event_type, day) sketches salt
    into partial merges, then fold per event_type — no task ever holds a
    group's full sketch list.  Like the HLL gate, the sketch bits aren't
    DuckDB-reproducible, so the hashable output is the exact percentiles
    (computed independently by both engines) plus within-rank-bound
    booleans: the KLL estimate must land between the exact values at ranks
    q ± eps (eps = 2 x 1.65/sqrt(k) — the published normalized rank error
    at 2 sigma)."""
    from .sketches import kll_merge_quantiles, kll_quantile_rollup

    ev = load_tables(spark, sf_dir)["events"]
    fine = kll_quantile_rollup(
        ev.withColumn("day", F.dayofmonth("ts")),
        ["event_type", "day"], "value", k=200)
    est = kll_merge_quantiles(fine, ["event_type"], [0.5, 0.9],
                              levels=2, fanout=8)
    eps = 2 * 1.65 / (200 ** 0.5)  # ≈ 0.233 normalized rank
    exact = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50_exact"),
        F.expr("percentile(value, 0.9)").alias("p90_exact"),
        F.expr(f"percentile(value, {max(0.0, 0.5 - eps)})").alias("_p50_lo"),
        F.expr(f"percentile(value, {min(1.0, 0.5 + eps)})").alias("_p50_hi"),
        F.expr(f"percentile(value, {max(0.0, 0.9 - eps)})").alias("_p90_lo"),
        F.expr(f"percentile(value, {min(1.0, 0.9 + eps)})").alias("_p90_hi"))
    return (est.join(exact, "event_type")
            .select("event_type",
                    F.round("p50_exact", 6).alias("p50_exact"),
                    F.round("p90_exact", 6).alias("p90_exact"),
                    F.col("q_0_5").between(F.col("_p50_lo"), F.col("_p50_hi"))
                    .alias("p50_within"),
                    F.col("q_0_9").between(F.col("_p90_lo"), F.col("_p90_hi"))
                    .alias("p90_within"))
            .orderBy("event_type"))


_SQL_KLL_ROLLUP = """
SELECT event_type,
  round(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS p50_exact,
  round(quantile_cont(CAST(value AS DOUBLE), 0.9), 6) AS p90_exact,
  TRUE AS p50_within, TRUE AS p90_within
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_frame_sample_rollup(spark, sf_dir):
    """Video frame-sampling plumbing (pipeline/multimodal.py frame_sample)
    as a hashed gate: sample ≤8 frames per video payload (1 frame/s of
    deterministic metadata duration), roll up frame counts and payload
    bytes per video.  The oracle recomputes the slicing arithmetic from the
    source text (payload = ASCII bytes, duration = n_chars x 10 ms):
    n = clamp(duration/1000, 1, 8), step = max(1, len/n), every frame
    carries exactly step bytes when len >= n, else 1 byte for the first
    len frames."""
    d = load_tables(spark, sf_dir)["documents"]
    fs = frame_sample(make_media_table(d), every_ms=1000, max_frames=8)
    return (fs.groupBy("media_id")
            .agg(F.count(F.lit(1)).alias("n_frames"),
                 F.sum(F.octet_length("frame_payload")).alias("frame_bytes"),
                 F.max("frame_ts_ms").alias("last_ts_ms"))
            .orderBy("media_id"))


_SQL_FRAME_SAMPLE = r"""
WITH vids AS (
  SELECT doc_id AS media_id,
    octet_length(encode(regexp_replace(text, '[^\x00-\x7F]', '', 'g'))) AS len,
    least(8, greatest(1, (n_chars * 10) // 1000))::INT AS n
  FROM documents WHERE doc_id % 3 = 2),
calc AS (
  SELECT media_id, n,
    CASE WHEN len >= n THEN n * greatest(1, len // n)
         ELSE least(n::BIGINT, len) END AS frame_bytes,
    (n - 1) * 1000 AS last_ts_ms
  FROM vids)
SELECT media_id, n AS n_frames, frame_bytes, last_ts_ms
FROM calc ORDER BY media_id
"""


__all__ = [
    'q_corpus_overlap',
    '_sql_corpus_overlap',
    'q_token_budget_subset',
    '_sql_token_budget',
    'q_mixture_temperature',
    '_sql_mixture_temperature',
    '_sql_mixture_resample',
    'q_multimodal_features',
    '_SQL_MULTIMODAL',
    'q_audio_features',
    '_SQL_AUDIO_FEATURES',
    'q_video_features',
    '_SQL_VIDEO_FEATURES',
    'q_mp4_metadata',
    'q_media_curation',
    '_SQL_MEDIA_CURATION',
    'q_webm_metadata',
    '_SQL_WEBM_METADATA',
    'q_mp3_metadata',
    '_SQL_MP3_METADATA',
    'q_mpegts_metadata',
    '_SQL_MPEGTS_METADATA',
    'q_flac_metadata',
    '_SQL_FLAC_METADATA',
    'q_ogg_metadata',
    '_SQL_OGG_METADATA',
    '_SQL_MP4_METADATA',
    'q_resize_media_stats',
    '_SQL_RESIZE_MEDIA',
    'q_winnow_fingerprints',
    '_SQL_WINNOW',
    'q_kmeans_clusters',
    '_sql_kmeans',
    'q_semdedup_prune',
    '_sql_semdedup',
    'q_tfidf_top_terms',
    '_sql_tfidf',
    'q_similarity_lsh',
    '_sql_similarity_lsh',
    'q_asof_join',
    'q_sketch_distinct_rollup',
    '_SQL_SKETCH_ROLLUP',
    'q_sketch_quantile_rollup',
    '_SQL_KLL_ROLLUP',
    'q_frame_sample_rollup',
    '_SQL_FRAME_SAMPLE',
]
