"""Bit-for-bit parity of the pure-Python XXH64 (sources/xxhash64.py)
against Spark's ``xxhash64`` expression — the invariant that lets the
folded stats+bloom footer pass build filter bytes Python-side while
probes keep hashing literals through the JVM.  A single diverging bit
would turn into silent wrong pruning, so every byte-length class the
algorithm branches on (0, <4, <8, <32, stripes, and each tail) is
pinned here against a live session."""

import random

import pytest
from pyspark.sql import functions as F

from steel_datafusion_spark.sources.xxhash64 import (
    bloom_probe_rows, spark_xxhash64_str, xxh64,
)


def _corpus():
    random.seed(7)
    out = [""]
    out += ["a" * i for i in range(1, 40)]           # every tail branch
    out += ["héllo wörld ∆Ω" * i for i in range(1, 6)]  # multi-byte UTF-8
    out += ["".join(chr(random.randint(32, 0x2FF))
                    for _ in range(random.randint(0, 120)))
            for _ in range(40)]
    out += [str(x) for x in (0, 1, -1, 2 ** 62, -2 ** 62,
                             12345678901234567)]      # int casts
    return out


def test_salted_hash_matches_spark(spark):
    corpus = _corpus()
    df = spark.createDataFrame([(s,) for s in corpus], "s string")
    for salt in (0, 1, 4, 42):
        got = [r[0] for r in
               df.select(F.xxhash64(F.col("s"), F.lit(salt))).collect()]
        want = [spark_xxhash64_str(s, salt) for s in corpus]
        assert got == want, f"salt {salt} diverged"


def test_unsalted_hash_matches_spark(spark):
    corpus = _corpus()
    df = spark.createDataFrame([(s,) for s in corpus], "s string")
    got = [r[0] for r in df.select(F.xxhash64(F.col("s"))).collect()]
    want = []
    for s in corpus:
        h = xxh64(s.encode("utf-8"), 42)
        want.append(h - (1 << 64) if h >= (1 << 63) else h)
    assert got == want


def test_probe_rows_match_jvm_pmod(spark):
    """The full bit-position pipeline (hash → pmod bits) equals the
    build expression ``pmod(xxhash64(s, lit(i)), bits)`` — including
    negative hashes, where pmod and Python ``%`` must agree."""
    corpus = [s for s in _corpus() if s][:50]
    bits, k = 256, 5
    df = spark.createDataFrame([(s,) for s in corpus], "s string")
    jvm = df.select(*[
        F.pmod(F.xxhash64(F.col("s"), F.lit(i)), F.lit(bits))
        .cast("int").alias(f"b{i}") for i in range(k)]).collect()
    got = [[r[f"b{i}"] for i in range(k)] for r in jvm]
    assert bloom_probe_rows(corpus, bits, k) == got


def test_reference_vectors():
    """Spot-check the raw XXH64 against the public reference test
    vectors (xxHash README: XXH64 of '' and known prime-sequence
    checks), so parity doesn't silently rest on two matching bugs."""
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999
    assert xxh64(b"", 2654435761) == 0xAC75FDA2929B17EF
    # 'Nobody inspects the spammish repetition' is the classic docs
    # vector for the Python xxhash package
    assert xxh64(b"Nobody inspects the spammish repetition", 0) \
        == 0xFBCEA83C8A378BF1


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
