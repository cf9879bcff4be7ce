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
