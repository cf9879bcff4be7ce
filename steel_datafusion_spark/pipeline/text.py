"""Text-analysis operators for large-scale training-data pipelines.

Beyond-reference surface (BASELINE.json north star): language-ID heuristic,
quality scoring, token counting, document fingerprinting.  Everything here is
built from JVM-side ``pyspark.sql.functions`` expressions — no Python in the
row path, so each operator is a narrow projection that scales linearly and
pushes through whole-stage codegen at 100 TB.

Every operator has an exactly-equivalent ANSI-SQL form (used by the DuckDB
oracle) — the implementations are deliberately arithmetic-deterministic
(integer and string ops only; doubles appear only in final ratios).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "tokens", "token_count", "char_count", "punct_count", "punct_ratio",
    "stopword_count", "stopword_ratio", "fingerprint", "lang_id",
    "quality_score", "with_text_stats", "STOPWORDS",
    "bpe_ish_token_count", "BPE_ISH_PATTERN", "sql_bpe_ish_token_count",
    "PII_PATTERNS", "redact_pii", "pii_counts", "sql_redact_pii",
    "sql_pii_count",
    "strip_html", "sql_strip_html", "HTML_STRIP_STEPS", "HTML_ENTITIES",
]

# GPT-2-style pre-tokenization shape: letter runs, digit runs, single
# punctuation marks.  Kept to a dialect-neutral subset so the Java regex
# engine (Spark) and RE2 (DuckDB) tokenize identically (verified).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Small fixed English stopword list — deterministic, embedded in both the
# Spark expressions and the oracle SQL (order matters nowhere; set semantics).
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]

_WS = r"\s+"


def _norm(text: Column) -> Column:
    """lower + trim + collapse whitespace — shared normalization."""
    return F.regexp_replace(F.trim(F.lower(text)), _WS, " ")


def tokens(text: Column) -> Column:
    """Whitespace tokenization of the normalized text; empty text ⇒ []."""
    n = _norm(text)
    return F.when(F.length(n) == 0, F.array().cast("array<string>")) \
            .otherwise(F.split(n, " "))


def token_count(text: Column) -> Column:
    """Number of whitespace-delimited tokens."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Token count under a BPE-style pre-tokenizer regex — the unit that
    matters for LLM training-data budgeting (whitespace tokens undercount
    punctuation-heavy text)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0))


def char_count(text: Column) -> Column:
    return F.length(text)


def punct_count(text: Column) -> Column:
    """Count of non-word, non-space characters."""
    return F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars (0 for empty text)."""
    n = char_count(text)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        punct_count(text).cast("double") / n.cast("double")
    )


def stopword_count(text: Column, stopwords: list[str] = STOPWORDS) -> Column:
    """Tokens that are common English stopwords."""
    toks = tokens(text)
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def stopword_ratio(text: Column, stopwords: list[str] = STOPWORDS) -> Column:
    n = token_count(text)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        stopword_count(text, stopwords).cast("double") / n.cast("double")
    )


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the normalized text.  Identical content
    modulo case/whitespace collides intentionally (the exact-dedup key)."""
    return F.md5(_norm(text))


def lang_id(text: Column) -> Column:
    """Deterministic language-ID heuristic:
    - >30% non-ASCII characters → 'other' (CJK/Cyrillic/etc. scripts)
    - stopword ratio ≥ 0.08     → 'en'
    - otherwise                 → 'unk'
    (A real pipeline would swap in fastText/CLD3; the contract here is the
    Spark plumbing + a deterministic, oracle-checkable classifier.)"""
    n = char_count(text)
    non_ascii = n - F.length(F.regexp_replace(text, r"[^\x00-\x7F]", ""))
    non_ascii_frac = F.when(n == 0, F.lit(0.0)).otherwise(
        non_ascii.cast("double") / n.cast("double"))
    return (
        F.when(non_ascii_frac > 0.3, F.lit("other"))
        .when(stopword_ratio(text) >= 0.08, F.lit("en"))
        .otherwise(F.lit("unk"))
    )


def quality_score(text: Column) -> Column:
    """Composite quality score in [0,1]: rewards moderate length, penalizes
    punctuation soup, rewards natural stopword density.  Pure arithmetic on
    integer counts → bit-identical across engines."""
    n_tok = token_count(text).cast("double")
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(text) * 5)
    sw = stopword_ratio(text)
    sw_score = F.least(sw / F.lit(0.1), F.lit(1.0))
    return (len_score * 0.4 + punct_pen * 0.3 + sw_score * 0.3)


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the full stat set as columns — one projection, zero shuffles."""
    t = F.col(text_col)
    return df.select(
        "*",
        token_count(t).alias("n_tokens"),
        char_count(t).alias("n_chars_computed"),
        punct_ratio(t).alias("punct_ratio"),
        stopword_ratio(t).alias("stopword_ratio"),
        fingerprint(t).alias("fingerprint"),
        lang_id(t).alias("lang_pred"),
        quality_score(t).alias("quality"),
    )


# --- ANSI-SQL equivalents (DuckDB oracle) ----------------------------------

def sql_norm(col: str) -> str:
    return f"regexp_replace(trim(lower({col})), '\\s+', ' ', 'g')"


def sql_tokens(col: str) -> str:
    n = sql_norm(col)
    return f"CASE WHEN length({n}) = 0 THEN []::VARCHAR[] ELSE string_split({n}, ' ') END"


def sql_token_count(col: str) -> str:
    return f"len({sql_tokens(col)})"


def sql_punct_count(col: str) -> str:
    return f"(length({col}) - length(regexp_replace({col}, '[^\\w\\s]', '', 'g')))"


def sql_punct_ratio(col: str) -> str:
    return (f"CASE WHEN length({col}) = 0 THEN 0.0 "
            f"ELSE CAST({sql_punct_count(col)} AS DOUBLE) / length({col}) END")


def sql_stopword_count(col: str) -> str:
    sw = ", ".join(f"'{s}'" for s in STOPWORDS)
    return (f"len(list_filter({sql_tokens(col)}, t -> list_contains([{sw}], t)))")


def sql_stopword_ratio(col: str) -> str:
    return (f"CASE WHEN {sql_token_count(col)} = 0 THEN 0.0 "
            f"ELSE CAST({sql_stopword_count(col)} AS DOUBLE) / {sql_token_count(col)} END")


def sql_fingerprint(col: str) -> str:
    return f"md5({sql_norm(col)})"


def sql_lang_id(col: str) -> str:
    non_ascii_frac = (
        f"CASE WHEN length({col}) = 0 THEN 0.0 ELSE "
        f"CAST(length({col}) - length(regexp_replace({col}, '[^\\x00-\\x7F]', '', 'g')) AS DOUBLE)"
        f" / length({col}) END")
    return (f"CASE WHEN {non_ascii_frac} > 0.3 THEN 'other' "
            f"WHEN {sql_stopword_ratio(col)} >= 0.08 THEN 'en' "
            f"ELSE 'unk' END")


def sql_quality_score(col: str) -> str:
    n_tok = f"CAST({sql_token_count(col)} AS DOUBLE)"
    len_score = f"least({n_tok} / 100.0, 1.0)"
    punct_pen = f"greatest(0.0, 1.0 - {sql_punct_ratio(col)} * 5)"
    sw_score = f"least({sql_stopword_ratio(col)} / 0.1, 1.0)"
    return f"({len_score} * 0.4 + {punct_pen} * 0.3 + {sw_score} * 0.3)"


def sql_bpe_ish_token_count(col: str) -> str:
    return f"len(regexp_extract_all({col}, '{BPE_ISH_PATTERN}'))"


# ---------------------------------------------------------------------------
# PII redaction (dialect-neutral regexes: Java regex == RE2 semantics here)
# ---------------------------------------------------------------------------

# Conservative, format-anchored patterns only — regex PII detection is a
# first-pass scrubber, not a guarantee; the patterns are kept to syntax both
# engines interpret identically (no lookaround, no backrefs).
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]


def redact_pii(text: Column) -> Column:
    """Replace every PII match with its placeholder token.  Order matters
    (email before ipv4: 'user@1.2.3.4' hits the email rule first) and is
    fixed by PII_PATTERNS.  Pure JVM regexp_replace chain — map-side."""
    out = text
    for _name, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(text: Column) -> list[Column]:
    """One count column per PII class (aliased n_<class>), counted on the
    progressively-redacted text exactly as redact_pii applies it — so an
    email's IP-like domain is never double-counted as an ipv4 hit."""
    cols = []
    cur = text
    for name, pat, repl in PII_PATTERNS:
        cols.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    return cols


def sql_redact_pii(col: str) -> str:
    out = col
    for _name, pat, repl in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


def sql_pii_count(col: str, upto: int) -> str:
    """Count of PII_PATTERNS[upto] matches after redacting patterns < upto
    (mirrors pii_counts' progressive counting)."""
    cur = col
    for _name, pat, repl in PII_PATTERNS[:upto]:
        cur = f"regexp_replace({cur}, '{pat}', '{repl}', 'g')"
    return f"len(regexp_extract_all({cur}, '{PII_PATTERNS[upto][1]}'))"


# ---------------------------------------------------------------------------
# HTML stripping (web-corpus extraction front door)
# ---------------------------------------------------------------------------

# (pattern, replacement) pairs applied IN ORDER; kept to a dialect-neutral
# regex subset so Java regex (Spark) and RE2 (DuckDB) agree: (?is) flags,
# non-greedy block bodies, plain character classes.  Entity decode order is
# the standard one — &amp; LAST so '&amp;lt;' decodes to '&lt;' (one level),
# never to '<'.
HTML_STRIP_STEPS = [
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?is)<!--.*?-->", " "),
    (r"<[^>]*>", " "),
]
HTML_ENTITIES = [("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
                 ("&quot;", "\""), ("&#39;", "'"), ("&amp;", "&")]


def strip_html(text: Column) -> Column:
    """Plain text from an HTML payload: script/style/comment blocks drop
    whole, remaining tags become spaces, the six core entities decode
    (&amp; last — single-level, the HTML spec's unescape order), and
    whitespace collapses.  Pure JVM regexp chain — map-side, no Python,
    no parser state; the 'lossy but linear' trade every web-scale
    pipeline (C4, CCNet) makes for the extraction front door, where a
    real DOM parse would put a Python library in the hottest path."""
    out = text
    for pat, repl in HTML_STRIP_STEPS:
        out = F.regexp_replace(out, pat, repl)
    for ent, repl in HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(repl))
    return F.trim(F.regexp_replace(out, _WS, " "))


def sql_strip_html(col: str) -> str:
    """DuckDB mirror of ``strip_html`` (same steps, same order)."""
    out = col
    for pat, repl in HTML_STRIP_STEPS:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    for ent, repl in HTML_ENTITIES:
        r = repl.replace("'", "''")
        out = f"replace({out}, '{ent}', '{r}')"
    return f"trim(regexp_replace({out}, '{_WS}', ' ', 'g'))"
