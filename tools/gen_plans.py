#!/usr/bin/env python
"""Regenerate PLANS.md: audited physical plans of headline queries."""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from steel_datafusion_spark import session_context
from steel_datafusion_spark.queries import all_queries

NOTES = {
 "pricing_summary": "Filter pushed into the parquet scan (PushedFilters on l_shipdate); ReadSchema pruned to the 7 referenced columns; partial HashAggregate before the single exchange on the 6-value group key (map-side combine), final HashAggregate after. Decimal sums keep the result partition-order independent.",
 "revenue_by_nation": "nation broadcast explicitly; at this SF AQE also broadcasts customer. count(distinct) expands to the standard two-level aggregate. One exchange total on the agg key.",
 "topk": "sort+limit fused to TakeOrderedAndProject — no global sort, no exchange of the full table (the TopK fusion the reference inherits from DataFusion's physical optimizer).",
 "semi_join": "o_totalprice > 100000 pushed to the orders scan; LeftSemi as BroadcastHashJoin (build side pruned to the join key only).",
 "similarity_topk": "query set broadcast (corpus never shuffles for the join); WindowGroupLimit prunes to top-k per partition BEFORE the exchange — only ~k rows per partition shuffle.",
 "dedup_minhash_lsh": "persisted InMemoryRelation barriers between shingling → signatures → bands (prevents Catalyst from re-inlining the hash pipeline into every slot); candidate self-join keyed on (band_idx, band_hash) — fine-grained bucket keys, shuffle-parallel.",
 "distinct_on": "row_number window = one hash exchange on the DISTINCT ON key, sort within partitions only.",
 "asof_join": "as-of join via union+window: ONE hash exchange on the key for |L|+|R| rows, in-partition sort, last(ignorenulls) — no range join, no per-key quadratic blowup.",
 "dedup_ngram_jaccard": "inverted-index Jaccard: posting-list self-join keyed on shingle hashes (fine-grained keys), pair intersection sizes from groupBy counts — never a blocked all-pairs join. At 100 TB the max_df knob drops stop-shingles before the join (broadcast anti-join), bounding any shingle's candidate contribution at K².",
 "embedding_neardup": "LSH-bucketed candidates: one persisted scan computes the 8-bit sign-projection bucket; the 9-way probe explode joins on (bucket, label) — 2^8 × #labels fine-grained hash keys, AQE-splittable — then the exact-cosine verify filter. Replaces r1's blocked all-pairs join (parallelism = #labels, quadratic per block). Measured verify-input reduction at sf0.1: see Measured evidence below.",
 "surface_misc": "right_semi/right_anti run as a single shuffle on the join key (broadcast under AQE at this SF); the CASE/ilike/idiv projections are all one codegen'd stage — no Python, no extra exchange; sort_by + limit fuses to TakeOrderedAndProject.",
 "skew_salted_join": "the salted path: explode(compact × salt) on the build side, hash(event_id)%salt added to the probe key — the hot key's output spreads over salt sub-keys, so no task owns the quadratic hot-key output. AQE skew-split does NOT rescue the plain plan here (granularity = 256 MB partitions; hot partition is ~1 MB at this SF but one task still owns 100% of hot-key work). Measured before/after below.",
 "approx_percentile": "approx_percentile (Greenwald-Khanna) is a mergeable partial→final aggregate — the plan is the same partial/final HashAggregate pair as any sum, with NO per-group sort. Contrast exact F.median (describe_stats/stats_agg): correct, but the only non-streaming aggregate in the catalog — this gate is its documented 100 TB replacement.",
 "disjunctive_pushdown": "Q19 shape: the OR-of-ANDs predicate stays a BroadcastHashJoin residual (Catalyst extracts the equi-key, keeps the disjunction in the join condition); constraint propagation derives a lineitem scan filter from the OR branches, and the fact side reaches the join with ZERO hash exchanges — asserted in test_tpch_pack.",
 "waiting_supplier": "Q21 shape: EXISTS and NOT-EXISTS on the same fact decorrelate to one LeftSemi and one LeftAnti leg, all three legs keyed on l_orderkey (exchange reuse); supplier broadcasts; the sorted LIMIT fuses to TakeOrderedAndProject.",
 "triangle_count": "degree-ordered orientation: und/oriented persisted (InMemoryRelation) because three joins reference them — unpersisted, Spark re-derives the co-purchase edge build once per reference. Wedge join keyed on the oriented apex; closing probe keyed on the (lo,hi) pair — both fine-grained, AQE-splittable; no vertex's raw degree appears as a join fan-out (hub-proof).",
 "semdedup_prune": "k-means assignment truncated by localCheckpoint barriers (the iterative-loop pattern), then ONE shuffle on the cluster key for the intra-cluster pair compare — the clustering IS the candidate-blocking structure; k is the occupancy knob (measured in scale_sweep_r08b/c).",
 "bpe_learn": "corpus touched once (word-freq groupBy with map-side combine); each merge round is a pair-explode + pair-key aggregate over the VOCAB relation only (31 rows here, ~10⁷ at web scale — never corpus-sized), top-1 via TakeOrdered, merge application a map-only literal replace.",
 "read_csv_surface": "CSV scan with inferSchema feeds the same codegen'd projection pipeline as parquet sources; the fold/comparison expressions (col_add/col_sub/col_mul/col_lt) stay inside one WholeStageCodegen span — expression-surface parity costs nothing at scale.",
 "dedup_clusters": "cluster resolution = simhash pair generation + the converged CC labels, read as flat LogicalRDD scans: every loop iteration (one edge-label hash join + min-agg on fine-grained vertex keys) is eagerly localCheckpoint-ed. The truncation is load-bearing: with persist() the InMemoryRelation child plans nested recursively — plan text grew 4x/iter to 41 MB by iteration 2 and PLANNING dominated at 3-9 s/iter; checkpointed, 0.2 s/iter (24x less loop wall-clock at sf0.1). Iterations = component diameter (<=3 measured); superseded iterations free their blocks via cache.release_local_checkpoint.",
 "dedup_clusters_twophase": "same fixpoint as dedup_clusters via alternating large-star/small-star EDGE rewriting (O(log n) rounds regardless of component diameter — the 100 TB choice for chain-shaped graphs): per round two groupBy-min aggregates + one join, all keyed on fine-grained vertex ids; every round eagerly checkpointed (flat scan), superseded rounds freed. reliable=True swaps localCheckpoint for durable checkpoint at cluster scale.",
 "dedup_index_probe": "incremental dedup through the PERSISTED index: {name}_bands / {name}_shingles are bucketed managed tables built once by build_dedup_index; the probe plan bands ONLY the batch, broadcasts it into the stored band table (corpus side never shuffles, never re-shingles — no scan of the raw corpus source appears in the plan), then broadcast-joins the candidates into the bucketed shingle table for the exact-Jaccard verify.",
 "embedding_neardup_banded": "banded LSH candidates: the 8-bit sign-projection code splits into 4×2-bit band codes; the explode self-join keys on (band_idx, band_code, label) and candidates are id-deduped BEFORE the exact-cosine verify, so multi-band matches never multiply verify work. The recall knob: miss probability (1-q^2)^4 vs multiprobe's >=2-bit-flip loss — measured recall 1.0 vs 0.92 at cosine 0.97 (tests/test_pipeline_ops.py).",
 "asof_join_forward": "forward as-of = the identical union+window single-shuffle plan as asof_join with the frame reversed (currentRow..unboundedFollowing) and first(ignorenulls) instead of last — still ONE hash exchange on the key for |L|+|R| rows, no range join, no per-key quadratic blowup.",
 "sketch_distinct_rollup": "HLL sketches are partial->final mergeable aggregates like any sum: the per-type sketch is ONE exchange on event_type, and the global rollup re-aggregates the (tiny) sketch rows — never the raw data. The pattern that makes distinct-counts pre-aggregable at 100 TB: daily sketches persisted once answer any coarser grain by union.",
 "fuzzy_match": "edit-distance join WITHOUT a cartesian product: both sides explode distinct char-3-gram hashes (repartitioned first so a single-split source doesn't serialize the hash stage) and join on the hash — fine-grained shuffle keys; the levenshtein verify uses Spark's thresholded form (O(len*k) early exit). Blocking is pigeonhole-exact for strings with > max_dist*n grams, so the join equals the cartesian filter on these inputs (tested).",
 "repetition_quality": "Gopher-style repetition metrics: one persisted token projection fans out to two explode + partial->final aggregates keyed on (doc_id[, gram]) — fine-grained keys, map-side combine, per-doc cost O(len). The left-joins back to doc grain broadcast at this SF; at 100 TB they are doc-key hash joins, still linear.",
 "decontaminate": "eval-shingle table is BROADCAST (eval sets are small by nature): the corpus side is a map-side explode + broadcast hash probe + one doc-grain count — zero corpus shuffle; the plan must show no exchange before the final aggregate.",
 "mixture_resample": "rates derive inside the plan: a tiny per-source count aggregate and a 1-row max, both broadcast back into a map-side integer-threshold filter on the md5 coin — the row path is scan + filter, no shuffle of the data being sampled.",
 "stratified_sample": "exact n-per-stratum: WindowGroupLimit prunes to the top-20-by-md5 per input partition BEFORE the single exchange on lang — only ~n rows per partition shuffle, the top-k plan shape. hash_split/hash_sample/pii_redact need no plan audit: zero-exchange codegen'd projections (asserted in tests).",
}

# Measured evidence (VERDICT r2 items 3+4): one JSON line per tool run,
# pasted verbatim after running on an otherwise-idle machine.  Re-run with:
#   python tools/bench_skew.py /root/testdata/sf0.1
#   python tools/bench_neardup_candidates.py /root/testdata/sf0.1
MEASURED = {
    "skew_salted_join (tools/bench_skew.py, 2026-08-13)":
        '{"sf_dir": "/root/testdata/sf0.1", "rep": 100, "salt": 32, '
        '"plain_sec": 2.365, "salted_sec": 0.042, "speedup": 56.31}',
    "embedding_neardup candidates (tools/bench_neardup_candidates.py, 2026-08-13)":
        '{"sf_dir": "/root/testdata/sf0.1", "n_vectors": 2010, "n_planes": 8, '
        '"blocked_candidates": 201680, "lsh_candidates": 8002, '
        '"reduction_x": 25.2, "occupied_buckets": 1304, "max_bucket": 9, '
        '"avg_bucket": 1.5}',
}

MEASURED_NOTES = """\
- **skew_salted_join**: same inputs, same result set (asserted identical in
  the harness), autoBroadcastJoinThreshold=-1 to emulate the
  non-broadcastable 100 TB dimension; hot key owns half the probe rows at
  100× multiplicity.  Plain shuffled join+agg: 2.365 s (one task owns the
  hot key's entire join output); salted (salt=32): 0.042 s — **56.3×**.
  Best-of-3 per variant.
- **embedding_neardup**: verify-stage input pairs at sf0.1 (2 010 vectors,
  4 labels).  Blocked all-pairs (r1 design): 201 680 candidates with
  parallelism collapsed to 4 label blocks.  LSH 8-plane + hamming-1
  multiprobe: 8 002 candidates (**25.2× less verify work**) on 1 304
  occupied (bucket × label) hash keys, max bucket 9 — and the gap widens
  with corpus size: blocked is Σ|block|², LSH with the documented
  n_planes sizing rule (pipeline/similarity.py) holds per-vector work at
  (1+n_planes)·B for target bucket size B.
"""


def main():
    spark = session_context()
    spark.sparkContext.setLogLevel("ERROR")
    reg = all_queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    print("# PLANS — audited physical plans of headline queries")
    print()
    print("Generated by `python tools/gen_plans.py` at sf0.1, local[32], AQE on.")
    print("The point per plan: filters reach the scan, scans are column-pruned,")
    print("aggregation is partial→final, joins broadcast when a side is small,")
    print("and top-k never materializes a global sort.")
    for name, note in NOTES.items():
        df = reg[name][0](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        lines = []
        for ln in plan.splitlines():
            t = ln.strip()
            if re.match(r"^[*+:\-\s]*\(\d+\)", ln) and "Reused" not in ln:
                lines.append(ln)
            elif t.startswith(("PushedFilters", "ReadSchema", "Arguments: ")) and len(lines) < 400:
                lines.append("      " + t[:160])
        print(f"\n## {name}\n")
        print(note)
        print("\n```")
        print("\n".join(lines[:60]))
        print("```")

    print("\n## Measured evidence\n")
    for title, js in MEASURED.items():
        print(f"**{title}**\n\n```json\n{js}\n```\n")
    print(MEASURED_NOTES)


if __name__ == "__main__":
    main()
