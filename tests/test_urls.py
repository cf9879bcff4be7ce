"""URL canonicalization & domain extraction (pipeline/urls.py)."""

from pyspark.sql import functions as F

from steel_datafusion_spark.pipeline.urls import (
    canonicalize_url, registrable_domain, sql_canonicalize_url,
    sql_registrable_domain, url_dedup_stats, with_url_parts,
)

CASES = [
    # (raw, canonical, domain)
    ("HTTP://WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag",
     "http://example.com/a/b?a=1&b=2", "example.com"),
    ("https://sub.Site.co.uk:443/path", "https://sub.site.co.uk/path",
     "site.co.uk"),
    ("https://host.org:8443/p", "https://host.org:8443/p", "host.org"),
    ("http://user@host.net/x/", "http://host.net/x", "host.net"),
    ("http://example.com", "http://example.com/", "example.com"),
    ("http://example.com/?fbclid=abc", "http://example.com/",
     "example.com"),
    ("not a url at ALL", "not a url at all", ""),
]


def test_canonicalize_and_domain_cases(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _, _) in enumerate(CASES)],
        "i long, url string")
    got = {r.i: (r.canonical_url, r.domain)
           for r in with_url_parts(df).collect()}
    for i, (_, canon, dom) in enumerate(CASES):
        assert got[i] == (canon, dom), (i, got[i], (canon, dom))


def test_sql_mirror_matches_spark(spark, duck):
    rows = [(i, raw) for i, (raw, _, _) in enumerate(CASES)]
    df = spark.createDataFrame(rows, "i long, url string")
    want = sorted(
        (r.i, r.canonical_url, r.domain)
        for r in df.select(
            "i", canonicalize_url(F.col("url")).alias("canonical_url"),
            registrable_domain(F.col("url")).alias("domain")).collect())
    duck.execute("CREATE OR REPLACE TABLE _urls (i BIGINT, url VARCHAR)")
    duck.executemany("INSERT INTO _urls VALUES (?, ?)", rows)
    got = sorted(map(tuple, duck.execute(
        f"SELECT i, {sql_canonicalize_url('url')} AS c, "
        f"{sql_registrable_domain('url')} AS d FROM _urls").fetchall()))
    assert got == want


def test_url_dedup_stats(spark):
    df = spark.createDataFrame([
        (1, "http://a.com/x?utm_source=1"),
        (2, "HTTP://WWW.A.com:80/x"),          # same canonical as 1
        (3, "http://a.com/y"),
        (4, "https://b.co.uk/z"),
    ], "doc_id long, url string")
    got = {r.domain: (r.n_fetches, r.n_canonical, r.n_dup_fetches)
           for r in url_dedup_stats(df).collect()}
    assert got["a.com"] == (3, 2, 1)
    assert got["b.co.uk"] == (1, 1, 0)


# ---------------------------------------------------------------------------
# HTML stripping
# ---------------------------------------------------------------------------

HTML_FIXTURES = [
    ('<html><head><style>p{a:1}</style></head><body><nav>Home &amp; '
     'About</nav><p>hi   there</p><script>var x = 1 < 2;</script>'
     '</body></html>'),
    'a &amp;lt; b &nbsp; c <!-- note\nmultiline --> d <B>bold</B>',
    '<script\nsrc="x.js">junk</script>keep<style type="a">s</style>',
    'plain text no markup',
    '<p>unclosed tag at end <',
]


def test_strip_html_spark_matches_duckdb(spark):
    import duckdb

    from pyspark.sql import functions as F

    from steel_datafusion_spark.pipeline.text import (
        sql_strip_html, strip_html,
    )

    df = spark.createDataFrame([(i, t) for i, t in enumerate(HTML_FIXTURES)],
                               "i long, t string")
    got = {r["i"]: r["c"] for r in
           df.select("i", strip_html(F.col("t")).alias("c")).collect()}
    expr = sql_strip_html("t")
    for i, t in enumerate(HTML_FIXTURES):
        exp = duckdb.sql(f"SELECT {expr} FROM (SELECT ? AS t)",
                         params=[t]).fetchone()[0]
        assert got[i] == exp, (i, got[i], exp)


def test_strip_html_semantics(spark):
    from pyspark.sql import functions as F

    from steel_datafusion_spark.pipeline.text import strip_html

    df = spark.createDataFrame([(i, t) for i, t in enumerate(HTML_FIXTURES)],
                               "i long, t string")
    got = {r["i"]: r["c"] for r in
           df.select("i", strip_html(F.col("t")).alias("c")).collect()}
    assert got[0] == "Home & About hi there"
    # single-level decode: &amp;lt; -> &lt;, never <
    assert got[1] == "a &lt; b c d bold"
    # script/style bodies drop whole, including attrs spanning newlines
    assert got[2] == "keep"
    assert got[3] == "plain text no markup"
