"""Curation operators: repetition quality, decontamination, mixture
resampling (pipeline/curation.py) — semantic tests complementing the
driver's hash-checked DuckDB gates."""

from pyspark.sql import functions as F

from steel_datafusion_spark.pipeline.curation import (
    decontaminate, mixture_resample, repetition_stats,
)


def test_repetition_stats_flags_boilerplate(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog and runs far away"),
        (2, "spam spam spam spam spam spam spam spam spam spam"),
        (3, "buy now " * 20),
        (4, "tiny"),                     # < n tokens: fractions 0, kept
        (5, ""),                         # empty: fractions 0, kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert got[1].keep
    assert not got[2].keep and got[2].top2gram_frac > 0.5
    assert not got[3].keep and got[3].dup5gram_frac > 0.5
    assert got[4].keep and got[4].top2gram_frac == 0.0 \
        and got[4].dup5gram_frac == 0.0
    assert got[5].keep and got[5].n_tokens == 0


def test_decontaminate_marks_shared_ngrams_only(spark):
    eval_docs = spark.createDataFrame(
        [(100, "the capital of france is paris and it is large")],
        "doc_id long, text string")
    corpus = spark.createDataFrame([
        (1, "we know the capital of france is paris indeed"),  # shares 5-grams
        (2, "completely unrelated text about spark partitions and shuffles"),
        (3, "the capital of france is paris and it is large"),  # exact copy
    ], "doc_id long, text string")
    got = {r.doc_id: r for r in decontaminate(corpus, eval_docs,
                                              n=5, min_hits=1).collect()}
    assert len(got) == 3                      # every corpus doc reported
    assert got[1].contaminated and got[1].n_hits >= 1
    assert not got[2].contaminated and got[2].n_hits == 0
    # the exact copy shares ALL its shingles: 10 tokens → 6 positional
    # 5-grams, all distinct → exactly 6 hits
    assert got[3].contaminated and got[3].n_hits == 6


def test_mixture_resample_hits_target_proportions(spark):
    # 3 sources, 3000 rows each; target 60/30/10 → kept counts must land
    # near 1500/750/250 (source a keeps all: it has the largest deficit)
    rows = [(i, f"s{i % 3}") for i in range(9000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    targets = {"s0": 0.6, "s1": 0.3, "s2": 0.1}
    kept = mixture_resample(df, targets).groupBy("source").count().collect()
    counts = {r.source: r["count"] for r in kept}
    assert counts["s0"] == 3000               # rate exactly 1.0
    assert abs(counts["s1"] - 1500) < 150     # md5 coin, ~±3σ
    assert abs(counts["s2"] - 500) < 100
    # untargeted sources are dropped entirely
    df2 = df.union(spark.createDataFrame([(99990 + i, "junk") for i in range(5)],
                                         "doc_id long, source string"))
    assert mixture_resample(df2, targets).filter(
        F.col("source") == "junk").count() == 0


def test_mixture_resample_is_deterministic(spark):
    rows = [(i, f"s{i % 2}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    targets = {"s0": 0.8, "s1": 0.2}
    a = sorted(r.doc_id for r in mixture_resample(df, targets).collect())
    b = sorted(r.doc_id for r in mixture_resample(df, targets).collect())
    assert a == b and len(a) > 0


def test_iqr_outlier_stats_exact_small(spark):
    from steel_datafusion_spark.pipeline.curation import iqr_outlier_stats

    # group a: values 1..8 plus outliers -100, 100; quantile_disc p25=3,
    # p75=7 over the 10 values (GK with huge accuracy matches) -> IQR 4,
    # fences [-3, 13] -> exactly the two planted outliers
    rows = [("a", float(v)) for v in range(1, 9)] + [("a", -100.0), ("a", 100.0)]
    rows += [("b", 5.0)] * 4
    df = spark.createDataFrame(rows, "grp string, value double")
    out = {r.grp: r for r in iqr_outlier_stats(
        df, "grp", "value", accuracy=1_000_000).collect()}
    assert out["a"].n == 10 and out["a"].n_outliers == 2
    assert out["b"].n == 4 and out["b"].n_outliers == 0
    assert out["b"].lo_fence == 5.0 and out["b"].hi_fence == 5.0


def test_mixture_temperature_flattens_and_keeps_tail(spark):
    from steel_datafusion_spark.pipeline.curation import (
        mixture_resample_temperature,
    )

    rows = ([("head", i) for i in range(900)]
            + [("mid", 1000 + i) for i in range(90)]
            + [("tail", 2000 + i) for i in range(10)])
    df = spark.createDataFrame(rows, "source string, doc_id long")
    out = mixture_resample_temperature(df, alpha=0.5)
    kept = {r.source: r.n for r in
            out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # smallest group keeps everything (rate 1 by construction)
    assert kept["tail"] == 10
    # head is downsampled hardest: expected rate = sqrt(10/900) ~ 0.105
    assert kept["head"] < 900 * 0.2
    # output shares flatten toward sqrt: head/tail ratio drops from 90x
    # toward sqrt(90) ~ 9.5x (coin noise allowed)
    assert kept["head"] / kept["tail"] < 20
    # deterministic: second run identical
    again = {r.source: r.n for r in
             mixture_resample_temperature(df, alpha=0.5)
             .groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert again == kept


def test_gopher_rules_each_rule_fires(spark):
    from steel_datafusion_spark.pipeline.curation import gopher_rules

    rows = [
        (1, "the quick brown fox jumps over the lazy dog and that is "
            "fine to be sure with plenty of ordinary words here"),
        (2, "too short"),                                     # ok_words
        (3, "\n".join(["- bullet one two three four five six seven eight "
                       "nine ten of the and that"] * 10)),    # ok_bullets
        (4, "\n".join(["the and of that keep going here fine..."] * 4)),
        (5, "the of # and # that # words # here # fine # more # pad "
            "# text # stuff"),                                # ok_symbols
        (6, "the of 111 222 333 444 555 666 777 888 999 000"),  # ok_alpha
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_rules(df).collect()}
    assert out[1]["keep"]
    assert not out[2]["ok_words"]
    assert not out[3]["ok_bullets"]
    assert not out[4]["ok_ellipsis"]
    assert not out[5]["ok_symbols"]
    assert not out[6]["ok_alpha"]


def test_gopher_rules_matches_duckdb_mirror(spark, duck):
    from steel_datafusion_spark.pipeline.curation import (
        gopher_rules, sql_gopher_rules,
    )
    from conftest import SF_DIR, assert_df_matches_duck
    from steel_datafusion_spark.sources.readers import load_tables

    d = load_tables(spark, SF_DIR)["documents"].select("doc_id", "text")
    got = gopher_rules(d)
    ex = sql_gopher_rules()
    base_cols = ["n_words", "mean_len", "sym_ratio", "bullet_frac",
                 "ellip_frac", "alpha_frac", "sw_hits"]
    flag_cols = ["ok_words", "ok_mean_len", "ok_symbols", "ok_bullets",
                 "ok_ellipsis", "ok_alpha", "ok_stopwords", "keep"]
    base_sel = ", ".join(f"{ex[c]} AS {c}" for c in base_cols)
    flag_sel = ", ".join(f"{ex[c]} AS {c}" for c in flag_cols)
    sql = (f"SELECT doc_id, n_words, mean_len, sym_ratio, bullet_frac, "
           f"ellip_frac, alpha_frac, sw_hits, {flag_sel} FROM "
           f"(SELECT doc_id, {base_sel} FROM documents) b")
    assert_df_matches_duck(got, duck, sql)
