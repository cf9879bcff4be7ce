"""Pipeline gate registry, part 5/5 (see pipeline/queries.py for the catalog contract)."""

from .gates_common import *  # noqa: F401,F403
from .gates_01 import *  # noqa: F401,F403
from .gates_02 import *  # noqa: F401,F403
from .gates_03 import *  # noqa: F401,F403
from .gates_04 import *  # noqa: F401,F403



def q_streaming_enrich(spark, sf_dir):
    """Stream-static enrichment join: the events STREAM joins the static
    nation dimension (broadcast — stream-static joins are stateless, the
    static side is just a lookup each micro-batch) and rolls up 1-hour
    windows per nation with the usual 2 h watermark.  The third streaming
    join mode next to stream↔stream (streaming_join) and the batch gates.

    Scale: no join state at all — the dim broadcast is re-resolved per
    batch (picking up dim updates between batches, the documented
    stream-static semantic); state is only the windowed aggregate, bounded
    by the watermark."""
    import shutil
    import uuid

    from ..queries import scratch_dir
    from ..streaming.operators import (
        read_stream_parquet, run_stream_to_parquet, stream_state_partitions,
    )

    base = scratch_dir(spark, sf_dir, "stream_gate")
    src = _os.path.join(base, "src")
    key = (spark.sparkContext.applicationId, _os.path.abspath(sf_dir))
    if key not in _STREAM_SRC_BUILT or not _os.path.exists(src):
        shutil.rmtree(base, ignore_errors=True)
        load_tables(spark, sf_dir)["events"].write.mode(
            "overwrite").parquet(src)
        _STREAM_SRC_BUILT.add(key)
    run_id = uuid.uuid4().hex[:8]
    out = _os.path.join(base, f"eout-{run_id}")
    ckpt = _os.path.join(base, f"eckpt-{run_id}")
    batch = spark.read.parquet(src)
    stream = read_stream_parquet(spark, src, batch.schema) \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    dim = load_tables(spark, sf_dir)["nation"].select(
        F.col("n_nationkey").alias("seg_key"),
        F.col("n_name").alias("segment"))
    enriched = stream.withColumn(
        "seg_key", (F.col("user_id") % 25).cast("int")) \
        .join(F.broadcast(dim), "seg_key")
    agg = (enriched.withWatermark("ts", "2 hours")
           .groupBy(F.window("ts", "1 hour").alias("w"), F.col("segment"))
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(28,10)")).cast("double")
                .alias("sum_value"))
           .select(F.col("w.start").alias("window_start"), "segment",
                   "n", "sum_value"))
    got = run_stream_to_parquet(
        agg, out, ckpt,
        state_partitions=stream_state_partitions(spark, src))
    return got.select("window_start", "segment", "n",
                      F.round("sum_value", 6).alias("sum_value"))


_SQL_STREAMING_ENRICH = """
WITH e AS (
  SELECT date_trunc('hour', ts) AS window_start, n_name AS segment, value
  FROM events JOIN nation ON n_nationkey = CAST(user_id % 25 AS INT)),
w AS (
  SELECT window_start, segment, COUNT(*) AS n,
         round(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 6)
           AS sum_value
  FROM e GROUP BY 1, 2)
SELECT window_start, segment, n, sum_value
FROM w
WHERE window_start + INTERVAL 1 HOUR
      <= (SELECT MAX(ts) - INTERVAL 2 HOUR FROM events)
"""


def q_streaming_join(spark, sf_dir):
    """Stream↔stream interval join (streaming/operators.py
    stream_stream_join): view→purchase attribution — every (view,
    purchase) pair of the same user within 30 min, both sides real
    streams with 2 h watermarks, driven availableNow through foreachBatch
    into parquet.

    The time-range join condition is what bounds each side's state to the
    watermark+30 min horizon (without it, inner-join state grows without
    bound and outer variants are rejected), so this runs forever on
    unbounded streams; an inner interval join emits each pair exactly
    once, making the finite-source drive hash-comparable to the
    batch/DuckDB range join."""
    import shutil
    import tempfile
    import uuid

    from ..streaming.operators import (
        read_stream_parquet, run_stream_to_parquet, stream_state_partitions, stream_stream_join,
    )

    from ..queries import scratch_dir
    base = scratch_dir(spark, sf_dir, "stream_gate")
    src = _os.path.join(base, "src")
    key = (spark.sparkContext.applicationId, _os.path.abspath(sf_dir))
    if key not in _STREAM_SRC_BUILT or not _os.path.exists(src):
        shutil.rmtree(base, ignore_errors=True)
        load_tables(spark, sf_dir)["events"].write.mode(
            "overwrite").parquet(src)
        _STREAM_SRC_BUILT.add(key)
    run_id = uuid.uuid4().hex[:8]
    out = _os.path.join(base, f"jout-{run_id}")
    ckpt = _os.path.join(base, f"jckpt-{run_id}")
    batch = spark.read.parquet(src)
    stream = read_stream_parquet(spark, src, batch.schema)
    views = stream.filter(F.col("event_type") == "view") \
        .select("user_id", "ts", "event_id")
    buys = stream.filter(F.col("event_type") == "purchase") \
        .select("user_id", "ts", "event_id", "value")
    joined = stream_stream_join(views, buys, key_col="user_id",
                                ts_col="ts", within="30 minutes")
    got = run_stream_to_parquet(
        joined, out, ckpt,
        state_partitions=stream_state_partitions(spark, src))
    return got.select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("r_event_id").alias("purchase_id"),
        ((F.col("r_ts").cast("long") - F.col("ts").cast("long")))
        .alias("gap_sec"),
        F.round("r_value", 6).alias("purchase_value"))


_SQL_STREAMING_JOIN = """
SELECT v.user_id,
       v.event_id AS view_id,
       p.event_id AS purchase_id,
       date_diff('second', v.ts, p.ts) AS gap_sec,
       round(p.value, 6) AS purchase_value
FROM events v JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
"""


_HTML_HEAD = ('<html><head><title>Doc</title><style>p {margin:0}</style>'
              '</head><body><nav>Home &amp;&nbsp;About</nav><p>')
_HTML_TAIL = ('</p><script type="text/javascript">var x = 1 < 2;</script>'
              '<footer>Footer Corp</footer></body></html>')


def q_html_strip(spark, sf_dir):
    """HTML extraction front door (pipeline/text.py strip_html): every
    document wraps in a deterministic page template (nav boilerplate,
    entities, an inline script whose body contains a bare '<', a styled
    head, a footer), then strips back to text through the JVM regexp
    chain.  The oracle applies the identical wrap + strip in DuckDB —
    block-drop order, single-level entity decode (&amp; last), and
    whitespace collapse all hash-checked.  Map-side only; no shuffle at
    all until the driver's own collect."""
    from .text import strip_html, token_count

    d = load_tables(spark, sf_dir)["documents"]
    page = F.concat(F.lit(_HTML_HEAD), F.col("text"), F.lit(_HTML_TAIL))
    clean = strip_html(page)
    return d.select(
        "doc_id",
        F.length(clean).alias("clean_len"),
        token_count(clean).alias("n_tokens"),
        F.substring(clean, 1, 16).alias("head"))


def _sql_html_strip() -> str:
    from .text import sql_strip_html, sql_token_count

    head = _HTML_HEAD.replace("'", "''")
    tail = _HTML_TAIL.replace("'", "''")
    page = f"('{head}' || text || '{tail}')"
    clean = sql_strip_html(page)
    return f"""
WITH hs AS (SELECT doc_id, {clean} AS clean FROM documents)
SELECT doc_id, length(clean)::INT AS clean_len,
  {sql_token_count('clean')}::INT AS n_tokens,
  substring(clean, 1, 16) AS head
FROM hs
"""


def q_url_canonicalize(spark, sf_dir):
    """URL canonicalization + registrable-domain extraction
    (pipeline/urls.py): four deterministic URL spellings per doc_id —
    messy uppercase host with default port, tracking params and fragment;
    https with :443; bare host; non-URL passthrough — canonicalized
    per-row.  The oracle rebuilds the same raw URLs and applies the
    mirrored SQL expressions, so scheme/host/port/path/query/fragment
    handling is value-checked string-for-string."""
    from .urls import canonicalize_url, registrable_domain

    d = load_tables(spark, sf_dir)["documents"].filter(
        F.col("doc_id") < 400).select("doc_id")
    k7 = (F.col("doc_id") % 7).cast("string")
    k10 = (F.col("doc_id") % 10).cast("string")
    m = F.col("doc_id") % 4
    url = (F.when(m == 0, F.concat(
        F.lit("HTTP://WWW.Site"), k7, F.lit(".CO.UK:80/Path"), k10,
        F.lit("/?utm_source=x&b=2&a=1#frag")))
        .when(m == 1, F.concat(
            F.lit("https://Sub.site"), k7, F.lit(".com:443/a/b?z=1&y=2")))
        .when(m == 2, F.concat(F.lit("http://site"), k7, F.lit(".org")))
        .otherwise(F.concat(F.lit("Not A Url "), k7)))
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id", "url",
        canonicalize_url(F.col("url")).alias("canonical_url"),
        registrable_domain(F.col("url")).alias("domain"))


def _sql_url_canonicalize() -> str:
    from .urls import sql_canonicalize_url, sql_registrable_domain

    return f"""
WITH u_raw AS (
  SELECT doc_id,
    CASE doc_id % 4
      WHEN 0 THEN 'HTTP://WWW.Site' || CAST(doc_id % 7 AS VARCHAR)
                  || '.CO.UK:80/Path' || CAST(doc_id % 10 AS VARCHAR)
                  || '/?utm_source=x&b=2&a=1#frag'
      WHEN 1 THEN 'https://Sub.site' || CAST(doc_id % 7 AS VARCHAR)
                  || '.com:443/a/b?z=1&y=2'
      WHEN 2 THEN 'http://site' || CAST(doc_id % 7 AS VARCHAR) || '.org'
      ELSE 'Not A Url ' || CAST(doc_id % 7 AS VARCHAR)
    END AS url
  FROM documents WHERE doc_id < 400
)
SELECT doc_id, url,
  {sql_canonicalize_url('url')} AS canonical_url,
  {sql_registrable_domain('url')} AS domain
FROM u_raw
"""


_LD_B1 = "this site uses cookies accept our terms to continue"
_LD_B2 = "all rights reserved contact the webmaster for details"


def q_line_dedup(spark, sf_dir):
    """Cross-document line dedup (pipeline/lines.py — the C4/RefinedWeb
    boilerplate-stripping step): documents are reshaped into '#'-joined
    lines (leading planted cookie-banner line on every 3rd doc, first-8
    -tokens line, remainder line, trailing rights-reserved line on every
    5th doc) and line_dedup(max_df=1) must drop exactly the recurring
    lines — the planted boilerplate plus any organically colliding
    prefix — while reassembling the survivors in original order.  The
    hash covers the rebuilt text, so ordering and trim/empty semantics
    are value-checked end-to-end."""
    from .lines import line_dedup

    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    first = F.array_join(F.slice(toks, 1, 8), " ")
    rest = F.array_join(
        F.slice(toks, 9, 1_000_000), " ")
    lined = d.select(
        "doc_id",
        F.concat_ws(
            "#",
            F.when(F.col("doc_id") % 3 == 0, F.lit(_LD_B1)),
            first,
            rest,
            F.when(F.col("doc_id") % 5 == 0, F.lit(_LD_B2)),
        ).alias("text"))
    return line_dedup(lined, delim="#", max_df=1)


def _sql_line_dedup() -> str:
    from .lines import sql_line_dedup

    body = sql_line_dedup("ld_docs", delim="#", max_df=1)
    # splice the fixture CTE ahead of the operator's own WITH chain
    return body.replace(
        "WITH ld_split AS (",
        f"""WITH ld_docs AS (
  SELECT doc_id,
    concat_ws('#',
      CASE WHEN doc_id % 3 = 0 THEN '{_LD_B1}' END,
      array_to_string(list_slice(string_split(text, ' '), 1, 8), ' '),
      array_to_string(list_slice(string_split(text, ' '), 9, 1000000), ' '),
      CASE WHEN doc_id % 5 = 0 THEN '{_LD_B2}' END) AS text
  FROM documents
),
ld_split AS (""", 1)


def q_pagerank_bucketed_bipartite(spark, sf_dir):
    """PageRank through the BUCKETED path (pipeline/graph.py
    pagerank_bucketed): transitions/nodes/has-out persisted as
    bucket-sorted managed tables so the rank-onto-edges join plans with no
    Exchange above the edge scan (plan-asserted in tests/test_graph.py;
    this gate hash-checks the VALUES).  Graph: bipartite user↔event-type
    (rank flows both ways), a few thousand nodes at sf0.01 — large enough
    that the bucketed layout is exercised across many buckets, small
    enough that the oracle's 6-iteration materialized-CTE unroll stays
    cheap.  Identical arithmetic to plain pagerank (shared
    _pr_iteration), so the same sql_pagerank oracle applies."""
    from .graph import pagerank_bucketed

    ev = load_tables(spark, sf_dir)["events"]
    pairs = (ev.select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("u"),
        F.col("event_type").alias("t"))
        .groupBy("u", "t").agg(F.count(F.lit(1)).alias("n")))
    edges = (pairs.select(F.col("u").alias("src"), F.col("t").alias("dst"),
                          "n")
             .unionByName(pairs.select(F.col("t").alias("src"),
                                       F.col("u").alias("dst"), "n")))
    return pagerank_bucketed(edges, "gate_pr_buck", weight="n",
                             damping=0.85, iterations=6)


def _sql_pagerank_bucketed_bipartite() -> str:
    from .graph import sql_pagerank

    body = sql_pagerank("prb_edges", weight="n", damping=0.85,
                        iterations=6, prefix="prb")
    return f"""
WITH prb_pairs AS (
  SELECT 'u' || CAST(user_id AS VARCHAR) AS u, event_type AS t,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
prb_edges AS (
  SELECT u AS src, t AS dst, n FROM prb_pairs
  UNION ALL
  SELECT t AS src, u AS dst, n FROM prb_pairs
),{body}
SELECT node, rank FROM prb_out
"""


def q_triangle_count(spark, sf_dir):
    """Per-node triangle counts (pipeline/graph.py triangle_count) on the
    part co-purchase graph: parts are adjacent iff some order contains both.

    Scale: the co-purchase edge build groups lineitem by l_orderkey (one
    partially-aggregated shuffle) and expands pairs map-side — per-order
    fan-out is C(lines_per_order, 2), a small constant in any order-lines
    schema, so edge count is linear in the fact table.  The
    2-year shipdate window is pushed to both parquet scans (the gate's cost
    knob — the operator itself has no input cap).  The
    triangle operator then bounds wedge generation by degree-ordered
    orientation (O(|E|^1.5) worst case, hub-proof — see graph.py).  Output
    is clamped to the top 100 by (triangles desc, node asc) under a total
    order."""
    from .graph import triangle_count

    li = load_tables(spark, sf_dir)["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_partkey")
    # per-order sorted part set → all (src < dst) pairs expanded map-side:
    # one partially-aggregated shuffle of the fact rows instead of the
    # self-join's two exchanges + sort; per-order fan-out is the same
    # C(lines_per_order, 2).  The operator's own canonical-edge distinct
    # dedups across orders, so no distinct is needed here.
    ps = F.sort_array(F.collect_set("l_partkey"))
    grouped = li.groupBy("l_orderkey").agg(ps.alias("ps"))
    arr = F.col("ps")
    pair_arr = F.flatten(F.transform(
        arr,
        lambda x, i: F.transform(
            F.slice(arr, i + F.lit(2), F.size(arr)),
            lambda y: F.struct(x.alias("src"), y.alias("dst")))))
    edges = (grouped.select(F.explode(pair_arr).alias("p"))
             .select("p.src", "p.dst"))
    out = triangle_count(edges).withColumnRenamed("node", "part")
    return out.orderBy(F.col("triangles").desc(), F.col("part").asc()) \
        .limit(100)


def _sql_triangle_count_gate() -> str:
    from .graph import sql_triangle_count

    body = sql_triangle_count("tcg_edges", prefix="tcg")
    return f"""
WITH tcg_li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
),
tcg_edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM tcg_li a JOIN tcg_li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),{body}
SELECT node AS part, triangles FROM tcg_out
ORDER BY triangles DESC, part ASC LIMIT 100
"""


def q_data_skipping_read(spark, sf_dir):
    """File-level data skipping EXECUTED through a manifest table
    (sources/manifest.py ``read_table(where=…)`` — the consumer half of
    the per-file min/max stats the writers collect from parquet footers,
    and the payoff ``zorder_skipping_stats`` only *estimates*): an
    orders slice is committed range-clustered on o_totalprice with
    ``stats_cols``, then a price-window read prunes every file whose
    [min,max] can't intersect the window BEFORE Spark opens it, and the
    residual filter re-applies the full predicate on the survivors.  The
    hash proves pruning is invisible to results (the strictly-fewer-
    files assertion lives in tests/test_manifest.py); at 100 TB this is
    a point/range query touching O(matching files), not the table."""
    import uuid

    from ..sources.manifest import manifest_upsert, read_table

    from ..queries import scratch_dir
    base = scratch_dir(spark, sf_dir, "dataskip_gate")
    root = _os.path.join(base, f"tbl-{uuid.uuid4().hex[:8]}")
    o = (load_tables(spark, sf_dir)["orders"]
         .select("o_orderkey", "o_custkey", "o_totalprice",
                 "o_orderpriority"))
    manifest_upsert(spark, root, o.repartitionByRange(16, "o_totalprice"),
                    ["o_orderkey"],
                    stats_cols=["o_totalprice", "o_orderkey"])
    t = read_table(spark, root, where=[("o_totalprice", ">=", 100000.0),
                                       ("o_totalprice", "<", 150000.0)])
    return t.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("o_totalprice"), 9).cast("decimal(20,9)"))
        .cast("double").alias("total"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"))


_SQL_DATA_SKIPPING_READ = """
SELECT o_orderpriority, COUNT(*)::BIGINT AS n,
  SUM(round(o_totalprice, 9)::DECIMAL(20,9))::DOUBLE AS total,
  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
FROM orders
WHERE o_totalprice >= 100000.0 AND o_totalprice < 150000.0
GROUP BY o_orderpriority
"""


def q_data_skipping_bloom(spark, sf_dir):
    """Bloom-filter file skipping EXECUTED (sources/manifest.py
    ``write_table_bloom`` + ``read_table(where=[(col,"=",lit)])`` — the
    Delta bloom-filter-index shape): orders commit hash-scattered on
    o_custkey, so every file's [min,max] spans the whole key domain and
    range stats are useless for a point lookup; the per-file Bloom
    sidecar (built by ONE column scan whose shuffle is bounded by
    files × filter bits, never rows) then drops every file whose filter
    provably lacks the key.  False positives only read extra files —
    the residual filter keeps results exact, which is what the hash
    proves; build/probe hash the same canonical cast, so false negatives
    (lost rows) are impossible, asserted in tests/test_manifest.py."""
    import uuid

    from ..sources.manifest import (
        manifest_upsert, read_table, write_table_bloom,
    )

    from ..queries import scratch_dir
    base = scratch_dir(spark, sf_dir, "bloomskip_gate")
    root = _os.path.join(base, f"tbl-{uuid.uuid4().hex[:8]}")
    o = (load_tables(spark, sf_dir)["orders"]
         .select("o_orderkey", "o_custkey", "o_totalprice",
                 "o_orderpriority"))
    manifest_upsert(spark, root, o.repartition(16, "o_custkey"),
                    ["o_orderkey"])
    write_table_bloom(spark, root, ["o_custkey"], bits=1 << 16)
    t = read_table(spark, root, where=[("o_custkey", "=", 97)])
    return t.select("o_orderkey", "o_custkey",
                    F.round(F.col("o_totalprice"), 2).alias("price"),
                    "o_orderpriority")


_SQL_DATA_SKIPPING_BLOOM = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price,
       o_orderpriority
FROM orders WHERE o_custkey = 97
"""


def q_streaming_cdc_feed(spark, sf_dir):
    """Streaming change-data-feed over a manifest table
    (streaming/operators.py ``streaming_table_changes`` — the Delta
    ``readChangeFeed`` shape): the commit log itself is the stream
    source (each ``_commits/v*.json`` is immutable and appears
    atomically, so Spark's file source tracks versions exactly-once),
    each micro-batch diffs its new versions into row-level change rows
    (version 1 = all inserts), and the changes land in a downstream
    manifest table through the replay-skip commit pattern —
    exactly-once end to end.  Fixture: a customer slice lives through
    insert (v1), conditional update + late inserts (v2), and keyed
    deletes (v3); the oracle recomputes all four change sets closed-form
    so the hash proves no change row is lost, duplicated or
    misattributed to the wrong commit."""
    import uuid

    from ..sources.manifest import manifest_delete, manifest_upsert
    from ..streaming.operators import streaming_table_changes

    from ..queries import scratch_dir
    base = scratch_dir(spark, sf_dir, "cdcfeed_gate")
    run = uuid.uuid4().hex[:8]
    root = _os.path.join(base, f"src-{run}")
    out = _os.path.join(base, f"out-{run}")
    work = _os.path.join(base, f"work-{run}")
    c = load_tables(spark, sf_dir)["customer"].select(
        "c_custkey", "c_name", "c_acctbal")
    v1 = c.filter(F.col("c_custkey") <= 600)
    manifest_upsert(spark, root, v1, ["c_custkey"], keep_versions=100)
    upd = (v1.filter(F.col("c_custkey") % 5 == 0)
           .withColumn("c_acctbal", F.col("c_acctbal") + 10)
           .unionByName(c.filter((F.col("c_custkey") > 600)
                                 & (F.col("c_custkey") <= 650))))
    manifest_upsert(spark, root, upd, ["c_custkey"], keep_versions=100)
    dels = c.filter((F.col("c_custkey") <= 650)
                    & (F.col("c_custkey") % 9 == 0)).select("c_custkey")
    manifest_delete(spark, root, dels, ["c_custkey"], keep_versions=100)
    feed = streaming_table_changes(spark, root, ["c_custkey"], out, work)
    return feed.select("c_custkey", "change_type", "commit_version")


# one BASE index build per (app, sf_dir); each gate call then drives a
# fresh stream (uuid delta) over the corpus tail — the drive IS the op
_ANN_STREAM_BASE_BUILT: set = set()


def _ensure_ann_stream_base(spark, sf_dir, name="gate_ann_smx"):
    app = spark.sparkContext.applicationId.replace("-", "_").replace(".", "_")
    scoped = f"{name}_{app[-12:]}"
    key = (spark.sparkContext.applicationId, _os.path.abspath(sf_dir), scoped)
    if key not in _ANN_STREAM_BASE_BUILT:
        from .similarity import build_ann_index

        e = load_tables(spark, sf_dir)["embeddings"]
        cut = e.count() * 3 // 5
        build_ann_index(e.filter(F.col("vec_id") < cut), scoped, nlist=10)
        _ANN_STREAM_BASE_BUILT.add(key)
    return scoped


def q_streaming_index_maintenance(spark, sf_dir):
    """EXACTLY-ONCE streaming maintenance of the persisted ANN index
    (streaming/operators.py ``streaming_ann_index_maintenance`` —
    VERDICT r11 item 3, composing item 2 with the manifest txn-watermark
    machinery): the corpus tail lands as a file stream, each micro-batch
    is assigned against the STORED centroids only (O(|batch| × nlist))
    and committed into a manifest-backed delta table through the
    replay-skip guard, then the probe unions base + delta
    (``ivf_topk_index_delta``).  Assignment is per-vector deterministic,
    so batch-chopped maintenance ≡ a one-shot index over the full
    corpus with the same quantizer — the oracle computes exactly that
    (the same SQL as ann_index_append), so the hash proves the
    equivalence end to end.  Replay safety is asserted in
    tests/test_streaming.py (re-driving the same checkpoint commits
    nothing new)."""
    import uuid

    from ..queries import scratch_dir
    from ..streaming.operators import streaming_ann_index_maintenance
    from .similarity import ivf_topk_index_delta

    scoped = _ensure_ann_stream_base(spark, sf_dir)
    e = load_tables(spark, sf_dir)["embeddings"]
    cut = e.count() * 3 // 5
    base = scratch_dir(spark, sf_dir, "annstream_gate")
    run = uuid.uuid4().hex[:8]
    src = _os.path.join(base, f"src-{run}")
    delta = _os.path.join(base, f"delta-{run}")
    work = _os.path.join(base, f"work-{run}")
    tail = e.filter(F.col("vec_id") >= cut)
    tail.repartition(2).write.mode("overwrite").parquet(src)
    streaming_ann_index_maintenance(spark, src, tail.schema, scoped,
                                    delta, work, max_files_per_trigger=1)
    q = e.filter(F.col("vec_id") < 5)
    return ivf_topk_index_delta(q, scoped, delta, k=10, nprobe=2)


def q_streaming_dedup_ingest(spark, sf_dir):
    """DEDUP THE CRAWL AS IT LANDS (streaming/operators.py
    streaming_dedup_ingest — the full composition of the incremental
    dedup pieces under the exactly-once machinery): a document stream
    is matched per micro-batch against a build_dedup_index corpus AND
    against everything already streamed, while the index grows with
    each batch through txn-guarded manifest delta tables; verified
    pairs land in a keyed manifest matches table.  Order-independent by
    construction (the later side of every pair finds the earlier one
    in base∪delta; keyed upserts make re-discovery idempotent), so the
    final matches table equals a ONE-SHOT pair computation over
    base ∪ stream restricted to pairs touching the stream — exactly
    what the oracle computes.  The fixture plants stream-vs-base
    near-dups (ids+1000000, suffix appended) and CROSS-BATCH
    stream-vs-stream exact dups (ids+2000000 in a second file, same
    suffix).  Base bucket occupancy sits far under the flood cap at
    gate scale, so the (inert) hot-guard routing needs no oracle
    modelling."""
    import uuid

    from ..queries import scratch_dir
    from ..streaming.operators import streaming_dedup_ingest

    app = spark.sparkContext.applicationId.replace("-", "_").replace(".", "_")
    scoped = f"gate_dd_smx_{app[-12:]}"
    key = (spark.sparkContext.applicationId, _os.path.abspath(sf_dir), scoped)
    if key not in _ANN_STREAM_BASE_BUILT:
        from .dedup import build_dedup_index

        d = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
        build_dedup_index(d.filter(F.col("doc_id") % 2 == 0), scoped)
        _ANN_STREAM_BASE_BUILT.add(key)
    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    s1 = d.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" crawl dup marker")).alias("text"))
    s2 = d.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" crawl dup marker")).alias("text"))
    base = scratch_dir(spark, sf_dir, "dedupingest_gate")
    run = uuid.uuid4().hex[:8]
    src = _os.path.join(base, f"src-{run}")
    work = _os.path.join(base, f"work-{run}")
    s1.coalesce(1).write.mode("append").parquet(src)
    s2.coalesce(1).write.mode("append").parquet(src)
    return streaming_dedup_ingest(spark, src, s1.schema, scoped, work,
                                  threshold=0.5)


def _sql_streaming_dedup_ingest() -> str:
    """One-shot mirror: every unordered pair over base ∪ stream sharing
    a band, with at least one stream side, verified at jaccard ≥ 0.5 —
    the set the order-independent streaming composition must converge
    to.  Stream ids are ≥ 1000000 > every base id, so 'at least one in
    stream' is just doc_b ≥ 1000000 under doc_a < doc_b."""
    hs = DSQL.hashed_shingles("text")
    sig_items = ",\n    ".join(DSQL.minhash_sig_items("hs", 32))
    return f"""
WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
stream AS (
  SELECT doc_id + 1000000 AS doc_id,
         text || ' crawl dup marker' AS text
  FROM documents WHERE doc_id < 20
  UNION ALL
  SELECT doc_id + 2000000, text || ' crawl dup marker'
  FROM documents WHERE doc_id < 10),
alld AS (SELECT * FROM corpus UNION ALL SELECT * FROM stream),
sh AS (SELECT doc_id, {hs} AS hs FROM alld),
sig AS (SELECT doc_id, [{sig_items}] AS sig FROM sh),
bb AS (
  SELECT doc_id, b.band_idx,
         md5(array_to_string(list_slice(sig, b.band_idx*4+1, b.band_idx*4+4), ',')) AS band_hash
  FROM sig, (SELECT unnest(generate_series(0, 7)) AS band_idx) b),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
  FROM bb a JOIN bb c
    ON a.band_idx = c.band_idx AND a.band_hash = c.band_hash
   AND a.doc_id < c.doc_id
  WHERE c.doc_id >= 1000000),
j AS (
  SELECT p.doc_a, p.doc_b,
    round(CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE) /
          (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))), 6) AS jaccard
  FROM cand p
  JOIN sh sa ON sa.doc_id = p.doc_a
  JOIN sh sb ON sb.doc_id = p.doc_b)
SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.5
"""


_SQL_STREAMING_CDC_FEED = """
SELECT c_custkey, 'insert' AS change_type, 1::BIGINT AS commit_version
FROM customer WHERE c_custkey <= 600
UNION ALL
SELECT c_custkey, 'update', 2::BIGINT FROM customer
WHERE c_custkey <= 600 AND c_custkey % 5 = 0
UNION ALL
SELECT c_custkey, 'insert', 2::BIGINT FROM customer
WHERE c_custkey > 600 AND c_custkey <= 650
UNION ALL
SELECT c_custkey, 'delete', 3::BIGINT FROM customer
WHERE c_custkey <= 650 AND c_custkey % 9 = 0
"""


__all__ = [
    'q_streaming_cdc_feed',
    '_ensure_ann_stream_base',
    'q_streaming_index_maintenance',
    'q_streaming_dedup_ingest',
    '_sql_streaming_dedup_ingest',
    '_SQL_STREAMING_CDC_FEED',
    'q_data_skipping_read',
    '_SQL_DATA_SKIPPING_READ',
    'q_data_skipping_bloom',
    '_SQL_DATA_SKIPPING_BLOOM',
    'q_streaming_enrich',
    '_SQL_STREAMING_ENRICH',
    'q_streaming_join',
    '_SQL_STREAMING_JOIN',
    '_HTML_HEAD',
    '_HTML_TAIL',
    'q_html_strip',
    '_sql_html_strip',
    'q_url_canonicalize',
    '_sql_url_canonicalize',
    '_LD_B1',
    '_LD_B2',
    'q_line_dedup',
    '_sql_line_dedup',
    'q_pagerank_bucketed_bipartite',
    '_sql_pagerank_bucketed_bipartite',
    'q_triangle_count',
    '_sql_triangle_count_gate',
]
