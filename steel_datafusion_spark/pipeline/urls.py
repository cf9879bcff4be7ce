"""URL canonicalization & domain extraction for crawl curation.

Beyond-reference surface: web-crawl pipelines dedupe and group by URL
before any content-level pass — the same page is fetched under dozens of
spellings (scheme/host case, default ports, fragments, tracking params,
trailing slashes), and per-domain caps / contamination blocklists key on
the registrable domain.  Everything here is JVM-side string expressions
(regexp_extract / split / sort_array / concat) — a narrow projection that
rides whole-stage codegen with zero Python in the row path, and every
step has an exactly-equivalent DuckDB form for the oracle.

Canonicalization rules (the conservative, loss-minimal subset every
crawler agrees on):

- scheme and host lowercase; ``www.`` prefix dropped from the host;
- default ports stripped (``:80`` for http, ``:443`` for https);
- fragment (``#...``) dropped;
- tracking query parameters dropped (``utm_*``, ``fbclid``, ``gclid``,
  ``ref``), remaining parameters SORTED so param order doesn't split
  identical URLs; empty query dropped;
- trailing ``/`` dropped from non-root paths; empty path → ``/``.

``registrable_domain`` approximates eTLD+1 with an embedded subset of the
public-suffix list covering the common two-level suffixes (``co.uk``,
``com.au``, ...).  The full PSL is a data file a production deployment
would broadcast-join; the expression shape (longest-suffix match over a
literal set) is identical, so swapping the list in changes no plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["canonicalize_url", "registrable_domain", "with_url_parts",
           "url_dedup_stats", "sql_canonicalize_url",
           "sql_registrable_domain", "TRACKING_PARAMS", "TWO_LEVEL_SUFFIXES"]

TRACKING_PARAMS = ["utm_source", "utm_medium", "utm_campaign", "utm_term",
                   "utm_content", "fbclid", "gclid", "ref"]

# common second-level public suffixes (subset; see module docstring)
TWO_LEVEL_SUFFIXES = ["co.uk", "org.uk", "ac.uk", "gov.uk", "com.au",
                      "net.au", "org.au", "co.jp", "or.jp", "ne.jp",
                      "com.br", "com.cn", "com.mx", "co.in", "co.kr",
                      "com.tw", "com.sg", "co.za", "com.ar"]

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*):\/\/"
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*:\/\/([^\/?#]*)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*:\/\/[^\/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def _scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def _hostport(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _HOST_RE, 1))


def _host(url: Column) -> Column:
    """Host without port / userinfo / leading www."""
    hp = _hostport(url)
    no_user = F.element_at(F.split(hp, "@"), -1)
    no_port = F.element_at(F.split(no_user, ":"), 1)
    return F.regexp_replace(no_port, r"^www\.", "")


def _port(url: Column) -> Column:
    hp = F.element_at(F.split(_hostport(url), "@"), -1)
    return F.when(hp.contains(":"),
                  F.element_at(F.split(hp, ":"), -1)).otherwise(F.lit(""))


def _clean_query(url: Column) -> Column:
    """Sorted, tracking-stripped query string ('' if nothing survives)."""
    q = F.regexp_extract(url, _QUERY_RE, 1)
    parts = F.filter(
        F.split(q, "&"),
        lambda kv: (kv != "") & ~F.element_at(F.split(kv, "="), 1)
        .isin(*TRACKING_PARAMS))
    return F.array_join(F.array_sort(parts), "&")


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL (see module docstring).
    Non-URL inputs (no ``scheme://``) pass through lowercased-trimmed, so
    the expression is total."""
    scheme = _scheme(url)
    host = _host(url)
    port = _port(url)
    keep_port = (
        (port != "") & ~((scheme == F.lit("http")) & (port == F.lit("80")))
        & ~((scheme == F.lit("https")) & (port == F.lit("443"))))
    raw_path = F.regexp_extract(url, _PATH_RE, 1)
    path = F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    path = F.when((F.length(path) > 1) & path.endswith("/"),
                  F.substring(path, 1, F.length(path) - 1).cast("string")
                  ).otherwise(path)
    q = _clean_query(url)
    canon = F.concat(
        scheme, F.lit("://"), host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")))
    return F.when(_scheme(url) == "", F.lower(F.trim(url))).otherwise(canon)


def registrable_domain(url: Column) -> Column:
    """Approximate eTLD+1 of the URL's host (two trailing labels, or three
    when the last two form a known two-level suffix)."""
    host = _host(url)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    take3 = last2.isin(*TWO_LEVEL_SUFFIXES) & (n >= 3)
    return (F.when(n <= 2, host)
            .when(take3, F.array_join(F.slice(labels, -3, 3), "."))
            .otherwise(last2))


def with_url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append canonical_url + domain columns — the ingest-time projection
    every downstream group/cap/dedup keys on."""
    u = F.col(url_col)
    return df.withColumn("canonical_url", canonicalize_url(u)) \
             .withColumn("domain", registrable_domain(u))


def url_dedup_stats(df: DataFrame, url_col: str = "url",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-domain URL-level dedup picture: total fetches, distinct
    canonical URLs, and the keeper (min id) count — one hash aggregation
    keyed on the canonical URL, then a per-domain rollup."""
    u = F.col(url_col)
    base = df.select(F.col(id_col).alias("_id"),
                     canonicalize_url(u).alias("cu"),
                     registrable_domain(u).alias("domain"))
    per_url = base.groupBy("domain", "cu").agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.min("_id").alias("keeper_id"))
    return per_url.groupBy("domain").agg(
        F.sum("n_fetches").alias("n_fetches"),
        F.count(F.lit(1)).alias("n_canonical"),
        (F.sum("n_fetches") - F.count(F.lit(1))).alias("n_dup_fetches"))


# ---------------------------------------------------------------------------
# DuckDB mirrors
# ---------------------------------------------------------------------------

def sql_canonicalize_url(col: str) -> str:
    track_list = ", ".join(f"'{p}'" for p in TRACKING_PARAMS)
    scheme = f"lower(regexp_extract({col}, '{_SCHEME_RE}', 1))"
    hostport = f"lower(regexp_extract({col}, '{_HOST_RE}', 1))"
    no_user = f"list_extract(string_split({hostport}, '@'), -1)"
    host = (f"regexp_replace(list_extract(string_split({no_user}, ':'), 1), "
            f"'^www\\.', '')")
    port = (f"CASE WHEN contains({no_user}, ':') "
            f"THEN list_extract(string_split({no_user}, ':'), -1) "
            f"ELSE '' END")
    raw_path = f"regexp_extract({col}, '{_PATH_RE}', 1)"
    path0 = f"CASE WHEN {raw_path} = '' THEN '/' ELSE {raw_path} END"
    path = (f"CASE WHEN length({path0}) > 1 AND {path0} LIKE '%/' "
            f"THEN substr({path0}, 1, length({path0}) - 1) "
            f"ELSE {path0} END")
    q0 = f"regexp_extract({col}, '{_QUERY_RE}', 1)"
    parts = (f"list_sort(list_filter(string_split({q0}, '&'), "
             f"kv -> kv <> '' AND NOT list_contains([{track_list}], "
             f"list_extract(string_split(kv, '='), 1))))")
    q = f"array_to_string({parts}, '&')"
    keep_port = (f"({port} <> '' AND NOT ({scheme} = 'http' AND {port} = '80') "
                 f"AND NOT ({scheme} = 'https' AND {port} = '443'))")
    canon = (f"{scheme} || '://' || {host} || "
             f"(CASE WHEN {keep_port} THEN ':' || {port} ELSE '' END) || "
             f"{path} || "
             f"(CASE WHEN {q} <> '' THEN '?' || {q} ELSE '' END)")
    return (f"CASE WHEN {scheme} = '' THEN lower(trim({col})) "
            f"ELSE {canon} END")


def sql_registrable_domain(col: str) -> str:
    suf_list = ", ".join(f"'{s}'" for s in TWO_LEVEL_SUFFIXES)
    hostport = f"lower(regexp_extract({col}, '{_HOST_RE}', 1))"
    no_user = f"list_extract(string_split({hostport}, '@'), -1)"
    host = (f"regexp_replace(list_extract(string_split({no_user}, ':'), 1), "
            f"'^www\\.', '')")
    labels = f"string_split({host}, '.')"
    last2 = f"array_to_string(list_slice({labels}, -2, -1), '.')"
    last3 = f"array_to_string(list_slice({labels}, -3, -1), '.')"
    return (f"CASE WHEN len({labels}) <= 2 THEN {host} "
            f"WHEN list_contains([{suf_list}], {last2}) "
            f"AND len({labels}) >= 3 THEN {last3} "
            f"ELSE {last2} END")
