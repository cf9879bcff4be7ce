"""Corpus-curation operators: repetition quality, decontamination, mixture.

Beyond-reference surface (BASELINE.json north star) — the three filters
every LLM training-data pipeline runs between dedup and packing:

- **Repetition signals** (Gopher-style, Rae et al. 2021 §A1.1): documents
  dominated by a few repeated n-grams are low-quality (boilerplate, SEO
  spam, scraped menus).  ``repetition_stats`` computes per-doc
  top-n-gram coverage and duplicate-n-gram fractions, all from explode +
  per-(doc, gram) counts — two shuffles on doc-grain keys, linear at
  100 TB, no Python in the row path.
- **Decontamination**: training corpora must not contain eval-benchmark
  text.  ``decontaminate`` marks corpus docs sharing ≥ ``min_hits``
  n-gram shingle hashes with the (small) eval set — eval shingles are
  broadcast, so the corpus is a single map-side explode + broadcast-join
  probe: no corpus shuffle at any scale.
- **Mixture resampling**: ``mixture_resample`` downsamples each source
  domain to hit target mixture weights, deterministically (the
  md5-keyed coin of pipeline/sampling.py — reproducible, anti-leak, and
  oracle-checkable).  Rates derive from observed counts inside the plan
  (two tiny aggregates broadcast back); no driver-side collect.

All scoring is integer/string arithmetic with doubles only in final
ratios, rounded before any threshold compare — every operator has an
exactly-equivalent DuckDB oracle in pipeline/queries.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..cache import track
from .dedup import md5_int60, shingles
from .sampling import hash_unit
from .text import tokens

__all__ = ["repetition_stats", "decontaminate", "mixture_resample",
           "pos_ngrams", "iqr_outlier_stats", "mixture_resample_temperature",
           "gopher_rules", "sql_gopher_rules"]


def pos_ngrams(toks: Column, n: int) -> Column:
    """Positional (non-distinct) word n-grams; < n tokens ⇒ [] (unlike
    dedup.shingles, which backfills a whole-doc shingle — repetition
    metrics must not count a too-short doc as one gram)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(F.size(toks) < n,
                  F.array().cast("array<string>")).otherwise(grams)


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    top_n: int = 2, dup_n: int = 5,
    max_top_frac: float = 0.20, max_dup_frac: float = 0.30,
) -> DataFrame:
    """Per-document repetition quality signals (Gopher §A1.1 shape):

    - ``top{top_n}gram_frac``: tokens covered by the single most frequent
      top_n-gram (count × n / n_tokens) — boilerplate detector;
    - ``dup{dup_n}gram_frac``: fraction of dup_n-gram occurrences that
      are duplicates (1 − distinct/total) — long-range repetition;
    - ``keep``: both fractions under their thresholds (Gopher defaults
      0.20 / 0.30).

    Plan: one base projection (persisted fan-out), then per metric an
    explode + groupBy on (doc_id[, gram]) — fine-grained keys, partial
    aggregation map-side; a doc's cost is O(len), never quadratic.
    Ties in the most-frequent gram don't matter (only the count is
    used).  Docs too short to form a gram get fraction 0 (kept)."""
    parts = df.sparkSession.sparkContext.defaultParallelism * 2
    base = track(df.repartition(parts, F.col(id_col))
                 .select(F.col(id_col).alias("doc_id"),
                         tokens(F.col(text_col)).alias("toks")).persist())
    stats = base.select("doc_id", F.size("toks").alias("n_tokens"))

    tg = (base.select("doc_id", F.explode(pos_ngrams(F.col("toks"), top_n))
                      .alias("g"))
          .groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
          .groupBy("doc_id").agg(F.max("c").alias("top_c")))

    dg = (base.select("doc_id", F.explode(pos_ngrams(F.col("toks"), dup_n))
                      .alias("g"))
          .groupBy("doc_id").agg(
              F.count(F.lit(1)).alias("tot"),
              F.count_distinct(F.col("g")).alias("dis")))

    top_frac = F.round(
        F.coalesce(F.col("top_c") * top_n / F.col("n_tokens"), F.lit(0.0)), 6)
    dup_frac = F.round(
        F.coalesce((F.col("tot") - F.col("dis")) / F.col("tot"), F.lit(0.0)),
        6)
    return (stats.join(tg, "doc_id", "left").join(dg, "doc_id", "left")
            .select(
                "doc_id", "n_tokens",
                top_frac.alias(f"top{top_n}gram_frac"),
                dup_frac.alias(f"dup{dup_n}gram_frac"))
            .withColumn(
                "keep",
                (F.col(f"top{top_n}gram_frac") <= max_top_frac)
                & (F.col(f"dup{dup_n}gram_frac") <= max_dup_frac)))


def decontaminate(
    corpus: DataFrame, eval_docs: DataFrame,
    id_col: str = "doc_id", text_col: str = "text",
    n: int = 5, min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination: per corpus doc, how many distinct
    n-gram shingle hashes it shares with the eval set, and whether that
    reaches ``min_hits`` (⇒ drop before training).

    Eval sets are small (thousands of docs), so the distinct eval-shingle
    table is **broadcast**: the corpus side is a map-side explode +
    broadcast semi-probe + per-doc count — zero corpus shuffle beyond the
    final doc-grain aggregate, which AQE coalesces.  Output: (doc_id,
    n_hits, contaminated) for ALL corpus docs (n_hits 0 when clean), so
    the caller filters or joins as needed."""
    ev = (eval_docs.select(
        F.explode(F.transform(shingles(F.col(text_col), n), md5_int60))
        .alias("h")).distinct())
    # repartition before the CPU-heavy tokenize+shingle+hash explode: a
    # small parquet source arrives as one split, which would serialize the
    # whole scan onto one core (same fix as dedup._hashed_shingles)
    parts = corpus.sparkSession.sparkContext.defaultParallelism * 2
    ex = corpus.repartition(parts, F.col(id_col)).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(
            F.transform(shingles(F.col(text_col), n), md5_int60))).alias("h"))
    hits = (ex.join(F.broadcast(ev), "h")
            .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_hits")))
    return (corpus.select(F.col(id_col).alias("doc_id"))
            .join(hits, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_hits", F.lit(0)).alias("n_hits"))
            .withColumn("contaminated", F.col("n_hits") >= min_hits))


_MOD = 1 << 32
_RATE_SCALE = 1_000_000  # rates quantized to 1e-6 → integer threshold compare


def mixture_resample(
    df: DataFrame, targets: dict[str, float],
    group_col: str = "source", key_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Deterministically downsample each ``group_col`` domain toward the
    target mixture ``targets`` (weights need not sum to 1 — they are
    normalized).  The keep rate per group is

        rate_g = (target_g / observed_share_g) / max_h(target_h / share_h)

    — the largest-deficit domain keeps everything and every other domain
    downsamples proportionally, the downsample-only way to hit a mixture
    without duplicating rows.  Groups absent from ``targets`` get rate 0.

    The per-row coin is ``hash_unit(key, salt)`` (pipeline/sampling.py):
    reproducible across runs/clusters, stable under corpus growth within a
    group's rate.  Rates are quantized to 1e-6 and compared as integers
    (hash · 10⁶ < rate_ppm · 2³²) so Spark and the DuckDB oracle make the
    identical comparison — no float boundary flicker.

    Plan: one tiny groupBy on the domain key for observed counts, a 1-row
    max, both broadcast back; the row path stays a map-side filter."""
    spark = df.sparkSession
    tgt = spark.createDataFrame(
        [(k, float(v)) for k, v in targets.items()],
        f"{group_col} string, _target double")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    total = counts.agg(F.sum("_n").alias("_tot"))
    ratio = (counts.crossJoin(F.broadcast(total))
             .join(F.broadcast(tgt), group_col)
             .select(group_col,
                     (F.col("_target") * F.col("_tot") / F.col("_n"))
                     .alias("_ratio")))
    mx = ratio.agg(F.max("_ratio").alias("_mx"))
    rates = (ratio.crossJoin(F.broadcast(mx))
             .select(group_col,
                     F.floor(F.round(F.col("_ratio") / F.col("_mx"), 6)
                             * _RATE_SCALE).cast("long").alias("_rate_ppm")))
    return (df.join(F.broadcast(rates), group_col, "inner")
            .filter(hash_unit(F.col(key_col), salt) * F.lit(_RATE_SCALE)
                    < F.col("_rate_ppm") * F.lit(_MOD))
            .drop("_rate_ppm"))


def iqr_outlier_stats(
    df, group_col: str, value_col: str, k: float = 1.5,
    accuracy: int = 10_000,
):
    """Per-group Tukey-fence outlier stats: bounds = [p25 - k*IQR,
    p75 + k*IQR], computed with the mergeable Greenwald-Khanna summary
    (``percentile_approx`` — O(accuracy) state per group, composing with
    partial aggregation; crank ``accuracy`` above the group size for exact
    ``quantile_disc`` semantics, the oracle-parity mode).

    Returns one row per group: n, n_outliers, lo/hi fence (6dp).  Two
    aggregations on the group key and one broadcast join back — the fence
    table is |groups|-sized, so the value stream is scanned twice and never
    shuffled on anything finer than the group key.
    """
    from pyspark.sql import functions as F

    v = F.col(value_col)
    fences = (df.groupBy(group_col).agg(
        F.percentile_approx(v, 0.25, accuracy).alias("_p25"),
        F.percentile_approx(v, 0.75, accuracy).alias("_p75"))
        .select(group_col,
                (F.col("_p25") - k * (F.col("_p75") - F.col("_p25")))
                .alias("_lo"),
                (F.col("_p75") + k * (F.col("_p75") - F.col("_p25")))
                .alias("_hi")))
    joined = df.join(F.broadcast(fences), group_col)
    return (joined.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(((v < F.col("_lo")) | (v > F.col("_hi"))).cast("long"))
        .alias("n_outliers"),
        F.round(F.min("_lo"), 6).alias("lo_fence"),
        F.round(F.max("_hi"), 6).alias("hi_fence")))


def mixture_resample_temperature(
    df, alpha: float = 0.5,
    group_col: str = "source", key_col: str = "doc_id",
    salt: str = "mixT",
):
    """Temperature-flattened mixture sampling: keep rates chosen so the
    output mixture is proportional to ``observed_share ** alpha`` — the
    standard multilingual/domain rebalancing rule (alpha=1 keeps the
    corpus as-is, alpha=0 equalizes all groups, alpha~0.3-0.7 flattens
    head domains while keeping tail domains intact).

    Downsample-only: rate_g = share_g^(alpha-1) normalized by its max, so
    the SMALLEST group keeps everything and head groups shed rows — no
    duplication.  Same deterministic md5 coin + ppm-quantized integer
    threshold as :func:`mixture_resample` (no float boundary flicker);
    same plan shape: two tiny broadcast aggregates, map-side filter.
    """
    from pyspark.sql import functions as F

    from .sampling import hash_unit

    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    total = counts.agg(F.sum("_n").alias("_tot"))
    ratio = (counts.crossJoin(F.broadcast(total))
             .select(group_col,
                     F.pow(F.col("_n") / F.col("_tot"), F.lit(alpha - 1.0))
                     .alias("_ratio")))
    mx = ratio.agg(F.max("_ratio").alias("_mx"))
    rates = (ratio.crossJoin(F.broadcast(mx))
             .select(group_col,
                     F.floor(F.round(F.col("_ratio") / F.col("_mx"), 6)
                             * _RATE_SCALE).cast("long").alias("_rate_ppm")))
    return (df.join(F.broadcast(rates), group_col, "inner")
            .filter(hash_unit(F.col(key_col), salt) * F.lit(_RATE_SCALE)
                    < F.col("_rate_ppm") * F.lit(_MOD))
            .drop("_rate_ppm"))


def gopher_rules(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    min_words: int = 10, max_words: int = 100_000,
    min_mean_word_len: float = 3.0, max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1, max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3, min_alpha_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher/MassiveText structural quality battery (Rae et al. 2021
    §A1.1, public; thresholds here adapted to short synthetic docs — the
    defaults in the paper are min_words=50 etc.).  Per document, one flag
    per rule plus the conjunction ``keep``:

    - ``ok_words``: word count in [min_words, max_words]
    - ``ok_mean_len``: mean word length in [min_mean_word_len, max_..]
    - ``ok_symbols``: (# + … occurrences) / words ≤ max_symbol_ratio
    - ``ok_bullets``: fraction of raw lines starting with a bullet
      (-, *, •) ≤ max_bullet_frac
    - ``ok_ellipsis``: fraction of raw lines ending with … or ... ≤
      max_ellipsis_frac
    - ``ok_alpha``: fraction of words containing ≥1 [a-z] ≥ min_alpha_frac
    - ``ok_stopwords``: ≥ min_stopword_hits distinct hits from a small
      function-word set (the "stop word" rule)

    Scale: ONE codegen'd projection — array folds over the token list and
    the raw line list, integer/string arithmetic only, ratios rounded to
    6dp before every threshold compare (cross-engine oracle convention).
    No shuffle, no Python, no UDF: at 100 TB this is a map-only pass that
    fuses with whatever scan precedes it."""
    t = F.col(text_col)
    toks = tokens(t)
    n_words = F.size(toks)
    nw = F.greatest(n_words, F.lit(1)).cast("double")
    mean_len = F.round(
        F.aggregate(toks, F.lit(0),
                    lambda acc, w: acc + F.length(w)).cast("double") / nw, 6)
    n_sym = (F.length(t) - F.length(F.regexp_replace(t, r"[#…]", "")))
    sym_ratio = F.round(n_sym.cast("double") / nw, 6)
    lines = F.split(t, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    n_bullet = F.size(F.filter(
        lines, lambda l: F.trim(l).rlike(r"^[-*•]")))
    n_ellip = F.size(F.filter(
        lines, lambda l: F.trim(l).rlike(r"(\.\.\.|…)$")))
    bullet_frac = F.round(n_bullet.cast("double") / n_lines, 6)
    ellip_frac = F.round(n_ellip.cast("double") / n_lines, 6)
    n_alpha = F.size(F.filter(toks, lambda w: w.rlike("[a-z]")))
    alpha_frac = F.round(n_alpha.cast("double") / nw, 6)
    stop_set = ["the", "be", "to", "of", "and", "that", "have", "with"]
    sw_hits = F.size(F.array_intersect(
        toks, F.array(*[F.lit(s) for s in stop_set])))
    flags = {
        "ok_words": (n_words >= min_words) & (n_words <= max_words),
        "ok_mean_len": (mean_len >= min_mean_word_len)
                       & (mean_len <= max_mean_word_len),
        "ok_symbols": sym_ratio <= max_symbol_ratio,
        "ok_bullets": bullet_frac <= max_bullet_frac,
        "ok_ellipsis": ellip_frac <= max_ellipsis_frac,
        "ok_alpha": alpha_frac >= min_alpha_frac,
        "ok_stopwords": sw_hits >= min_stopword_hits,
    }
    keep = None
    for c in flags.values():
        keep = c if keep is None else (keep & c)
    return df.select(
        F.col(id_col), n_words.alias("n_words"), mean_len.alias("mean_len"),
        sym_ratio.alias("sym_ratio"), bullet_frac.alias("bullet_frac"),
        ellip_frac.alias("ellip_frac"), alpha_frac.alias("alpha_frac"),
        sw_hits.alias("sw_hits"),
        *[v.alias(k) for k, v in flags.items()],
        keep.alias("keep"))


def sql_gopher_rules(
    text_col: str = "text",
    min_words: int = 10, max_words: int = 100_000,
    min_mean_word_len: float = 3.0, max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1, max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3, min_alpha_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> dict[str, str]:
    """DuckDB expression mirror of :func:`gopher_rules` — returns
    column-name → SQL-expression (caller assembles the SELECT)."""
    from .text import sql_tokens

    toks = sql_tokens(text_col)
    exprs: dict[str, str] = {}
    exprs["n_words"] = f"len({toks})"
    nw = f"greatest(len({toks}), 1)::DOUBLE"
    exprs["mean_len"] = (
        f"round(list_sum(list_transform({toks}, w -> len(w)))"
        f"::DOUBLE / {nw}, 6)")
    n_sym = (f"(length({text_col}) - "
             f"length(regexp_replace({text_col}, '[#…]', '', 'g')))")
    exprs["sym_ratio"] = f"round({n_sym}::DOUBLE / {nw}, 6)"
    lines = f"string_split({text_col}, chr(10))"
    n_lines = f"greatest(len({lines}), 1)::DOUBLE"
    exprs["bullet_frac"] = (
        f"round(len(list_filter({lines}, l -> "
        f"regexp_matches(trim(l), '^[-*•]')))::DOUBLE / {n_lines}, 6)")
    exprs["ellip_frac"] = (
        f"round(len(list_filter({lines}, l -> "
        f"regexp_matches(trim(l), '(\\.\\.\\.|…)$')))::DOUBLE "
        f"/ {n_lines}, 6)")
    exprs["alpha_frac"] = (
        f"round(len(list_filter({toks}, w -> "
        f"regexp_matches(w, '[a-z]')))::DOUBLE / {nw}, 6)")
    stop_set = "['the','be','to','of','and','that','have','with']"
    exprs["sw_hits"] = (
        f"len(list_intersect(list_distinct({toks}), {stop_set}))")
    exprs["ok_words"] = (f"(n_words >= {min_words} "
                         f"AND n_words <= {max_words})")
    exprs["ok_mean_len"] = (f"(mean_len >= {min_mean_word_len} "
                            f"AND mean_len <= {max_mean_word_len})")
    exprs["ok_symbols"] = f"(sym_ratio <= {max_symbol_ratio})"
    exprs["ok_bullets"] = f"(bullet_frac <= {max_bullet_frac})"
    exprs["ok_ellipsis"] = f"(ellip_frac <= {max_ellipsis_frac})"
    exprs["ok_alpha"] = f"(alpha_frac >= {min_alpha_frac})"
    exprs["ok_stopwords"] = f"(sw_hits >= {min_stopword_hits})"
    exprs["keep"] = ("(ok_words AND ok_mean_len AND ok_symbols AND "
                     "ok_bullets AND ok_ellipsis AND ok_alpha AND "
                     "ok_stopwords)")
    return exprs
