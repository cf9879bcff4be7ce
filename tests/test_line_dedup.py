"""Cross-document line dedup (pipeline/lines.py): C4 occurrence-count
rule, order-preserving reassembly, trim/empty semantics."""

from steel_datafusion_spark.pipeline.lines import line_dedup, sql_line_dedup


def test_line_dedup_drops_recurring_keeps_order(spark):
    docs = spark.createDataFrame([
        (1, "unique alpha\ncookie banner\nunique beta"),
        (2, "cookie banner\nother prose here"),
        (3, "solo document line"),
    ], "doc_id long, text string")
    got = {r.doc_id: r for r in line_dedup(docs).collect()}
    assert got[1].text_clean == "unique alpha\nunique beta"
    assert (got[1].n_lines, got[1].n_dropped) == (3, 1)
    assert got[2].text_clean == "other prose here"
    assert got[3].text_clean == "solo document line"
    assert got[3].n_dropped == 0


def test_line_dedup_within_doc_repeat_counts_each_occurrence(spark):
    # C4 rule: occurrences, not document frequency — a line repeated
    # twice inside ONE doc already exceeds max_df=1 and drops everywhere
    docs = spark.createDataFrame([
        (1, "repeat me\nmiddle\nrepeat me"),
    ], "doc_id long, text string")
    got = line_dedup(docs).collect()[0]
    assert got.text_clean == "middle"
    assert (got.n_lines, got.n_dropped) == (3, 2)


def test_line_dedup_trim_empty_and_all_dropped(spark):
    docs = spark.createDataFrame([
        (1, "  shared  \n\n   \nkeep one"),
        (2, "shared"),          # trims equal → both drop
        (3, ""),                # empty doc
    ], "doc_id long, text string")
    got = {r.doc_id: r for r in line_dedup(docs).collect()}
    assert got[1].text_clean == "keep one"
    assert got[1].n_lines == 2      # blank lines never counted
    assert got[2].text_clean == "" and got[2].n_dropped == 1
    assert got[3].n_lines == 0 and got[3].text_clean == ""


def test_line_dedup_matches_duckdb_oracle(spark, duck):
    import os
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    from steel_datafusion_spark import load_tables
    from tests.conftest import assert_df_matches_duck

    d = load_tables(spark, sf)["documents"].select("doc_id", "text")
    got = line_dedup(d, delim=" ", max_df=3)   # word-level, aggressive
    sql = sql_line_dedup("t", delim=" ", max_df=3).replace(
        "WITH ld_split",
        "WITH t AS (SELECT doc_id, text FROM documents),\nld_split", 1)
    assert_df_matches_duck(got, duck, sql)
