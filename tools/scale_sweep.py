#!/usr/bin/env python
"""Scale-sweep evidence for the headline pipeline operators (VERDICT r5
item 4): run the five heavy gates at sf0.001 / sf0.01 / sf0.1 (the three
driver-shipped scales — a 100x input range) plus a synthetic 10x-of-sf0.1
"sf1x" corpus, and record wall time, input/output rows, and candidate-pair
counts so the documented near-linear claims are measured, not argued.

The synthetic sf1x corpus preserves the duplicate structure of sf0.1
exactly, ten times over, so linear output growth is the *ground truth*:

- documents: copy i in 1..9 suffixes every word with ``_i`` — a vocabulary
  permutation per copy, so within-copy word-shingle Jaccard (and thus the
  near-dup pair set) is IDENTICAL to the original, while cross-copy shingle
  sets are disjoint.  10x docs => exactly 10x true near-dup pairs.
- embeddings: copy i rotates each vector by i positions — an isometry, so
  within-copy cosines are identical and cross-copy pairs are uncorrelated.

Round 7 adds the NEXT decade (VERDICT r6 item 3): ``--sf10x`` builds a
100-copy corpus (~500k docs — 100x sf0.1) with the same structure-preserving
vocabulary permutation, and every op run now records the SHUFFLE WRITE BYTES
attributable to it (delta of the UI REST stage metrics), so both the time
exponent and the shuffle-volume exponent are measured.

Usage:
    python tools/scale_sweep.py [--out bench_runs/scale_sweep.json]
                                [--skip-sf1x] [--sf10x]
                                [--ops op1,op2] [--only-scales sf0.1,sf10x]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

OPS = ["dedup_minhash_lsh", "dedup_index_probe", "dedup_clusters_twophase",
       "embedding_neardup_banded", "fuzzy_match",
       # round-6 continuation headline ops
       "doc_chunking", "dedup_substring_spans", "heavy_hitters",
       "similarity_pq",
       # round-7 text headliners (VERDICT r7 item 7).  Note: the synthetic
       # sf1x/sf10x decades copy the events table AS-IS, so
       # pagerank_event_graph only scales over the real sf0.001-0.1 range.
       "ngram_novelty", "bloom_decontaminate", "source_overlap_matrix",
       "pagerank_event_graph",
       # round-8 graph/embedding headliners.  lineitem is copied AS-IS into
       # the synthetic decades, so triangle_count (co-purchase graph) only
       # scales over the real sf0.001-0.1 range, like pagerank; the
       # semdedup GATE caps its demo corpus — the k-scaled operator run
       # below is the true scale measurement.
       "triangle_count", "semdedup_prune",
       # round-8 continuation: DSIR selection and the BPE apply path scale
       # over the synthetic document decades (the vocab permutation keeps
       # the lang split and word structure); zorder_skipping/skew_diagnose
       # ride the events table (copied AS-IS) so they sweep the real range
       # only and are cheap enough not to need it.
       "dsir_select", "bpe_segment_tokens",
       # round-9 continuation: sparse TF-IDF similarity, perplexity
       # buckets, and best-member dedup scale over the synthetic document
       # decades; label_propagation / association_rules ride
       # lineitem/orders (copied AS-IS) so they sweep the real range only.
       "tfidf_doc_topk", "perplexity_buckets", "dedup_keep_best",
       "label_propagation", "association_rules",
       # round-10: the two heaviest streaming gates (VERDICT r9 item 8)
       # ride the events table, so they sweep the real sf0.001-0.1 range
       # (100x events) plus the synthetic ev10x decade (--ev10x: events
       # copied 10x with disjoint id spaces, timestamps kept, so watermark
       # horizons and per-key state both scale with volume).
       "streaming_view_maintenance", "streaming_join_outer",
       "streaming_join_full_outer",
       # round-12: incremental index maintenance — append a FIXED batch
       # across corpus decades; wall must stay ~flat (O(batch) per cycle)
       "ann_index_append_scaled", "dedup_index_append_scaled"]
SF1X_DIR = "/tmp/sdf_scale_sf1x"
SF10X_DIR = "/tmp/sdf_scale_sf10x"
EV10X_DIR = "/tmp/sdf_scale_ev10x"
REPS = 2


def total_shuffle_write_bytes(spark) -> int:
    """Cumulative shuffle write bytes across all completed stages, via the
    local UI REST API (delta around an op = that op's shuffle volume)."""
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    if not base:
        return -1
    app_id = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
                f"{base}/api/v1/applications/{app_id}/stages?status=complete",
                timeout=10) as r:
            stages = json.load(r)
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:
        return -1


def build_sf1x(spark, src_dir: str, out_dir: str, copies: int = 10) -> None:
    """Materialize the synthetic 10x corpus (documents + embeddings
    transformed per the module docstring; every other table copied as-is so
    load_tables finds the full layout)."""
    from steel_datafusion_spark.sources.readers import load_tables

    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    t = load_tables(spark, src_dir)

    docs = t["documents"]
    doc_parts = []
    for i in range(copies):
        if i == 0:
            doc_parts.append(docs)
            continue
        suffixed = F.array_join(
            F.transform(F.split(F.col("text"), r"\s+"),
                        lambda w: F.concat(w, F.lit(f"_{i}"))), " ")
        doc_parts.append(
            docs.withColumn("doc_id", F.col("doc_id") + i * 10_000_000)
                .withColumn("text", suffixed))
    out = doc_parts[0]
    for p in doc_parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    emb = t["embeddings"]
    dim = len(emb.select("embedding").head()[0])
    emb_parts = []
    for i in range(copies):
        r = i % dim   # rotation amount; copies beyond dim reuse isometries
        if i == 0:
            emb_parts.append(emb)
            continue
        rolled = F.col("embedding") if r == 0 else F.concat(
            F.slice("embedding", r + 1, dim - r),
            F.slice("embedding", 1, r))
        emb_parts.append(
            emb.withColumn("vec_id", F.col("vec_id") + i * 10_000_000)
               .withColumn("embedding", rolled))
    oute = emb_parts[0]
    for p in emb_parts[1:]:
        oute = oute.unionByName(p)
    oute.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")

    for name in ("region nation customer supplier part orders lineitem "
                 "events").split():
        src = os.path.join(src_dir, f"{name}.parquet")
        if os.path.exists(src):
            dst = os.path.join(out_dir, f"{name}.parquet")
            (shutil.copytree if os.path.isdir(src) else shutil.copyfile)(
                src, dst)


def build_ev10x(spark, src_dir: str, out_dir: str, copies: int = 10) -> None:
    """Materialize a 10x EVENTS corpus: copy i shifts event_id/user_id into
    a disjoint id space (+i x 10^9) and keeps timestamps, so the event-time
    span is unchanged while per-trigger batch volume and the number of live
    keys inside any watermark horizon both scale ~10x — exactly the axis
    the streaming state machinery must stay bounded along.  Other tables
    copy as-is so load_tables sees the full layout."""
    from steel_datafusion_spark.sources.readers import load_tables

    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    ev = load_tables(spark, src_dir)["events"]
    parts = []
    for i in range(copies):
        p = ev
        if i:
            p = (p.withColumn("event_id",
                              F.col("event_id") + i * 1_000_000_000)
                 .withColumn("user_id",
                             F.col("user_id") + i * 1_000_000_000))
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")
    for name in ("region nation customer supplier part orders lineitem "
                 "documents embeddings").split():
        src = os.path.join(src_dir, f"{name}.parquet")
        if os.path.exists(src):
            dst = os.path.join(out_dir, f"{name}.parquet")
            (shutil.copytree if os.path.isdir(src) else shutil.copyfile)(
                src, dst)


def minhash_candidate_pairs(spark, sf_dir: str) -> int:
    """Band-bucket candidate pairs BEFORE verification — the quantity whose
    sub-quadratic growth the LSH design claims.  Sum over buckets of
    C(n, 2) on the same banded table the gate builds."""
    from steel_datafusion_spark.cache import release_all
    from steel_datafusion_spark.pipeline.dedup import (
        _banded_table, _hashed_shingles)
    from steel_datafusion_spark.sources.readers import load_tables

    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    hs = _hashed_shingles(d, "doc_id", "text", 3)
    banded = _banded_table(hs, 32, 8, 4)
    n = (banded.groupBy("band_idx", "band_hash")
         .agg(F.count(F.lit(1)).alias("n"))
         .agg(F.sum(F.expr("n * (n - 1) / 2")).alias("c")).head()["c"])
    release_all(spark)
    return int(n or 0)


def main() -> int:
    out_path = "bench_runs/scale_sweep.json"
    args = sys.argv[1:]
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i:i + 2]
    skip_sf1x = "--skip-sf1x" in args
    with_sf10x = "--sf10x" in args
    ops = list(OPS)
    if "--ops" in args:
        i = args.index("--ops")
        ops = args[i + 1].split(",")
        del args[i:i + 2]
    only_scales = None
    if "--only-scales" in args:
        i = args.index("--only-scales")
        only_scales = set(args[i + 1].split(","))
        del args[i:i + 2]

    import __spark_entry__ as entry
    from steel_datafusion_spark import session_context
    from steel_datafusion_spark.cache import release_all
    from steel_datafusion_spark.sources.readers import load_tables

    spark = session_context(app_name="scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    scales = [("sf0.001", "/root/testdata/sf0.001"),
              ("sf0.01", "/root/testdata/sf0.01"),
              ("sf0.1", "/root/testdata/sf0.1")]
    if not skip_sf1x:
        scales.append(("sf1x", SF1X_DIR))
    if with_sf10x:
        scales.append(("sf10x", SF10X_DIR))
    if "--ev10x" in args:
        scales.append(("ev10x", EV10X_DIR))
    if only_scales is not None:
        scales = [s for s in scales if s[0] in only_scales]
    for sc_name, sc_dir, copies in (("sf1x", SF1X_DIR, 10),
                                    ("sf10x", SF10X_DIR, 100)):
        if any(n == sc_name for n, _ in scales) and \
                not os.path.exists(os.path.join(sc_dir, "documents.parquet")):
            print(f"building synthetic {sc_name} ({copies}x sf0.1) ...",
                  flush=True)
            build_sf1x(spark, "/root/testdata/sf0.1", sc_dir, copies=copies)
    if any(n == "ev10x" for n, _ in scales) and \
            not os.path.exists(os.path.join(EV10X_DIR, "events.parquet")):
        print("building synthetic ev10x (10x sf0.1 events) ...", flush=True)
        build_ev10x(spark, "/root/testdata/sf0.1", EV10X_DIR)

    results: dict[str, dict] = {}
    for sc_name, sc_dir in scales:
        n_docs = load_tables(spark, sc_dir)["documents"].count()
        n_vecs = load_tables(spark, sc_dir)["embeddings"].count()
        row: dict = {"n_documents": n_docs, "n_embeddings": n_vecs,
                     "ops": {}}
        print(f"\n== {sc_name}: {n_docs} docs, {n_vecs} vectors", flush=True)
        cand = minhash_candidate_pairs(spark, sc_dir)
        row["minhash_candidate_pairs"] = cand
        print(f"   minhash band-bucket candidate pairs: {cand}", flush=True)
        for op in ops:
            if op not in qs:
                continue  # custom sized-op names (handled in blocks below)
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
                release_all(spark)
                spark.catalog.clearCache()
            row["ops"][op] = {"times_s": times, "best_s": min(times),
                              "n_out": n_out,
                              "shuffle_write_mb": shuffle_mb}
            print(f"   {op}: {times} s, {n_out} rows, "
                  f"shuffle {shuffle_mb} MB", flush=True)

        # the banded-LSH sizing rule applied (similarity.py docstring):
        # band-code width ≈ log2(N / target_bucket) keeps per-band occupancy
        # flat as N grows; the fixed-parameter gate (8 planes / 2-bit bands)
        # deliberately ignores this, so measuring BOTH shows the fixed
        # variant go superlinear while the resized one stays ~linear.
        # semdedup with the documented k-sizing rule (k ≈ N / target
        # occupancy): per-vector pairwise cost stays ~constant as N grows —
        # the measurement that backs the operator docstring's envelope.
        if "semdedup_prune" in ops:
            from steel_datafusion_spark.pipeline.queries import _aug_emb
            from steel_datafusion_spark.pipeline.similarity import semdedup

            k = max(8, n_vecs // 250)
            times, n_removed = [], None
            for _ in range(REPS):
                t0 = time.perf_counter()
                n_removed = (semdedup(_aug_emb(spark, sc_dir), k=k, iters=2)
                             .filter(~F.col("is_kept")).count())
                times.append(round(time.perf_counter() - t0, 3))
                release_all(spark)
                spark.catalog.clearCache()
            row["ops"]["semdedup_scaled"] = {
                "times_s": times, "best_s": min(times),
                "n_removed": n_removed, "k": k}
            print(f"   semdedup_scaled (k={k}): {times} s, "
                  f"{n_removed} removed", flush=True)

        # the IVF sizing rule applied (similarity.ivf_nlist_mod docstring):
        # nlist ≈ √N keeps bucket occupancy ≈ √N, so per-anchor candidate
        # work is √N-bounded and total work ~N^1.5 — the production knob;
        # the fixed-nlist GATE deliberately pins the r10 bench plan instead.
        # n_centroids is recorded to show the count follows nlist, never N.
        if "hard_negatives_ivf_scaled" in ops:
            import math as _math

            from steel_datafusion_spark.pipeline.similarity import (
                hard_negatives_ivf, ivf_assign,
            )

            e = load_tables(spark, sc_dir)["embeddings"]
            nlist = max(8, _math.isqrt(n_vecs))
            n_cent = ivf_assign(e, nlist)[0].count()
            times, n_out = [], None
            for _ in range(REPS):
                t0 = time.perf_counter()
                n_out = hard_negatives_ivf(
                    e, k=5, nprobe=2, nlist=nlist).toArrow().num_rows
                times.append(round(time.perf_counter() - t0, 3))
                release_all(spark)
                spark.catalog.clearCache()
            row["ops"]["hard_negatives_ivf_scaled"] = {
                "times_s": times, "best_s": min(times), "n_out": n_out,
                "nlist": nlist, "n_centroids": n_cent}
            print(f"   hard_negatives_ivf_scaled (nlist={nlist}, "
                  f"centroids={n_cent}): {times} s, {n_out} rows",
                  flush=True)

        # persisted ANN index: build once (timed separately), probe many —
        # the probe must stay ~flat across corpus decades (queries fixed,
        # buckets √N-sized, corpus never re-assigned)
        if "ann_index_scaled" in ops:
            import math as _math

            from steel_datafusion_spark.pipeline.similarity import (
                build_ann_index, ivf_topk_index,
            )

            e = load_tables(spark, sc_dir)["embeddings"]
            nlist = max(8, _math.isqrt(n_vecs))
            t0 = time.perf_counter()
            build_ann_index(e, "sweep_ann_idx", nlist=nlist)
            build_s = round(time.perf_counter() - t0, 3)
            q = e.filter(F.col("vec_id") < 16)
            times, n_out = [], None
            for _ in range(REPS):
                t0 = time.perf_counter()
                n_out = ivf_topk_index(
                    q, "sweep_ann_idx", k=10, nprobe=2).toArrow().num_rows
                times.append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
            row["ops"]["ann_index_scaled"] = {
                "build_s": build_s, "probe_times_s": times,
                "best_probe_s": min(times), "n_out": n_out, "nlist": nlist}
            print(f"   ann_index_scaled (nlist={nlist}): build {build_s} s, "
                  f"probe {times} s", flush=True)
            for t in ("sweep_ann_idx_centroids", "sweep_ann_idx_assign",
                      "sweep_ann_idx_meta"):
                spark.sql(f"DROP TABLE IF EXISTS {t}")

        # data skipping: files OPENED must follow selectivity, not table
        # size — a fixed-fraction range window opens ~that fraction of a
        # range-clustered table's files at every decade, and a bloom point
        # lookup opens O(1) files while total files grow 10x per decade
        if "data_skipping_scaled" in ops:
            import uuid as _uuid

            from steel_datafusion_spark.sources.manifest import (
                manifest_upsert, read_table, write_table_bloom,
            )

            n_rows = n_docs * 200
            df = spark.range(n_rows).select(
                F.col("id").alias("k"),
                (F.col("id").cast("double") * 1.7).alias("v"),
                F.md5(F.col("id").cast("string")).alias("uid"))
            n_files = max(8, n_rows // 20_000)
            base = f"/tmp/sweep_dataskip/{sc_name}-{_uuid.uuid4().hex[:6]}"
            root = os.path.join(base, "tbl")
            t0 = time.perf_counter()
            manifest_upsert(spark, root,
                            df.repartitionByRange(n_files, "v"), ["k"],
                            stats_cols=["v"])
            write_table_bloom(spark, root, ["k"], bits=1 << 18)
            build_s = round(time.perf_counter() - t0, 3)
            total_files = len(read_table(spark, root).inputFiles())
            # bloom/stats CARRY-FORWARD commit cost, measured on a
            # PARTITIONED table with FIXED-SIZE partitions (20k rows
            # each, so the count of partitions grows with the decade
            # but the touched unit stays constant): a 50-row upsert
            # rewrites exactly one partition — every other partition's
            # files hardlink and REUSE their stats/bloom entries — so
            # the wall must stay ~flat across decades iff the sidecar
            # finalize is O(touched), which is the claim.  (An upsert
            # on the non-partitioned table above rewrites the whole
            # table and would measure the rewrite, not the carry.)
            proot = os.path.join(base, "ptbl")
            pdf = df.withColumn("p", (F.col("k") / 20000).cast("int"))
            manifest_upsert(spark, proot, pdf, ["k"],
                            partition_by=["p"], stats_cols=["v"])
            write_table_bloom(spark, proot, ["uid"], bits=1 << 18)
            upd = pdf.filter(F.col("k") < 50).withColumn(
                "uid", F.md5((F.col("k") + 1).cast("string")))
            t0 = time.perf_counter()
            manifest_upsert(spark, proot, upd, ["k"], partition_by=["p"])
            carry_commit_s = round(time.perf_counter() - t0, 3)
            lo, hi = 0.10 * 1.7 * n_rows, 0.11 * 1.7 * n_rows  # 1% slice
            t0 = time.perf_counter()
            w = read_table(spark, root, where=[("v", ">=", lo),
                                               ("v", "<", hi)])
            range_rows = w.toArrow().num_rows
            range_s = round(time.perf_counter() - t0, 3)
            range_files = len(w.inputFiles())
            t0 = time.perf_counter()
            p = read_table(spark, root, where=[("k", "=", n_rows // 2)])
            point_rows = p.toArrow().num_rows
            point_s = round(time.perf_counter() - t0, 3)
            point_files = len(p.inputFiles())
            row["ops"]["data_skipping_scaled"] = {
                "n_rows": n_rows, "total_files": total_files,
                "build_s": build_s, "carry_commit_s": carry_commit_s,
                "range_files": range_files, "range_rows": range_rows,
                "range_s": range_s, "point_files": point_files,
                "point_rows": point_rows, "point_s": point_s}
            print(f"   data_skipping_scaled: {n_rows} rows / {total_files} "
                  f"files (build {build_s} s, carry-commit "
                  f"{carry_commit_s} s); 1% range opens "
                  f"{range_files} ({range_s} s, {range_rows} rows), point "
                  f"opens {point_files} ({point_s} s)", flush=True)
            shutil.rmtree(base, ignore_errors=True)

        # incremental index maintenance: appending a FIXED-SIZE batch to
        # the persisted ANN / dedup indexes must cost O(batch) work per
        # cycle — wall ~flat across corpus decades (ann pays batch×nlist
        # with nlist=√N; dedup pays batch shingling + a broadcast-
        # filtered recount of only the touched band buckets)
        if "ann_index_append_scaled" in ops:
            import math as _math

            from steel_datafusion_spark.pipeline.similarity import (
                ann_index_append, build_ann_index, ivf_topk_index,
            )

            e = load_tables(spark, sc_dir)["embeddings"]
            nlist = max(8, _math.isqrt(n_vecs))
            batch_n = 200
            base_corpus = e.filter(F.col("vec_id") >= batch_n)
            batch = e.filter(F.col("vec_id") < batch_n)
            t0 = time.perf_counter()
            build_ann_index(base_corpus, "sweep_annap_idx", nlist=nlist)
            build_s = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            st = ann_index_append(batch, "sweep_annap_idx")
            append_s = round(time.perf_counter() - t0, 3)
            q = e.filter(F.col("vec_id") < 16)
            t0 = time.perf_counter()
            n_out = ivf_topk_index(q, "sweep_annap_idx", k=10,
                                   nprobe=2).toArrow().num_rows
            probe_s = round(time.perf_counter() - t0, 3)
            row["ops"]["ann_index_append_scaled"] = {
                "build_s": build_s, "append_s": append_s,
                "probe_s": probe_s,
                "batch_n": st["appended"], "nlist": nlist, "n_out": n_out}
            print(f"   ann_index_append_scaled (nlist={nlist}): build "
                  f"{build_s} s, append {append_s} s for "
                  f"{st['appended']} vecs, probe {probe_s} s", flush=True)
            for t in ("sweep_annap_idx_centroids", "sweep_annap_idx_assign",
                      "sweep_annap_idx_meta"):
                spark.sql(f"DROP TABLE IF EXISTS {t}")

        if "dedup_index_append_scaled" in ops:
            from steel_datafusion_spark.pipeline.dedup import (
                build_dedup_index, dedup_against_index, dedup_index_append,
            )

            d = load_tables(spark, sc_dir)["documents"] \
                .select("doc_id", "text")
            batch_n = 100
            build_dedup_index(d.filter(F.col("doc_id") >= batch_n),
                              "sweep_ddap_idx")
            t0 = time.perf_counter()
            st = dedup_index_append(
                d.filter(F.col("doc_id") < batch_n), "sweep_ddap_idx")
            append_s = round(time.perf_counter() - t0, 3)
            probe = d.filter(F.col("doc_id") < 20).select(
                (F.col("doc_id") + 9000000).alias("doc_id"), "text")
            t0 = time.perf_counter()
            n_out = dedup_against_index(
                probe, "sweep_ddap_idx", threshold=0.5).toArrow().num_rows
            probe_s = round(time.perf_counter() - t0, 3)
            row["ops"]["dedup_index_append_scaled"] = {
                "append_s": append_s, "probe_s": probe_s,
                "batch_docs": st["appended_docs"],
                "hot_buckets": st["hot_buckets"], "n_out": n_out}
            print(f"   dedup_index_append_scaled: append {append_s} s for "
                  f"{st['appended_docs']} docs, probe {probe_s} s",
                  flush=True)
            for t in ("sweep_ddap_idx_bands", "sweep_ddap_idx_shingles",
                      "sweep_ddap_idx_meta", "sweep_ddap_idx_hot"):
                spark.sql(f"DROP TABLE IF EXISTS {t}")

        if "embedding_neardup_banded" not in ops:
            results[sc_name] = row
            continue

        import math

        from steel_datafusion_spark.pipeline.queries import _aug_emb
        from steel_datafusion_spark.pipeline.similarity import (
            cosine_neardup_pairs)

        band_bits = min(12, max(2, math.ceil(math.log2(max(n_vecs, 2) / 250))))
        n_planes = 4 * band_bits
        times, n_out = [], None
        for _ in range(REPS):
            t0 = time.perf_counter()
            n_out = cosine_neardup_pairs(
                _aug_emb(spark, sc_dir), threshold=0.99,
                n_planes=n_planes, bands=4).toArrow().num_rows
            times.append(round(time.perf_counter() - t0, 3))
            release_all(spark)
            spark.catalog.clearCache()
        row["ops"]["embedding_neardup_banded_scaled"] = {
            "times_s": times, "best_s": min(times), "n_out": n_out,
            "n_planes": n_planes, "bands": 4, "band_bits": band_bits}
        print(f"   embedding_neardup_banded_scaled (planes={n_planes}): "
              f"{times} s, {n_out} rows", flush=True)
        results[sc_name] = row

    with open(out_path, "w") as f:
        json.dump({"reps": REPS, "ops": OPS, "scales": results}, f, indent=1)
    print(f"\nwrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
