"""Skew before/after measurement (VERDICT r1 item 7).

Emulates the 100 TB shape where the dimension side is too large to
broadcast (autoBroadcastJoinThreshold=-1) and one key owns half the fact
rows: a plain shuffled join serializes the hot key's join output onto one
task, the salted join spreads it over `salt` sub-keys.

AQE note: adaptive skew-join splitting stays ENABLED here — it does not
rescue the plain path at this scale because its granularity is
skewedPartitionThresholdInBytes (256 MB default) while the hot partition
is ~1 MB; at cluster scale it triggers, but only for probe-side skew of
inner/semi joins — the preserved side of outer joins and aggregation hot
keys still need salting.

Usage: python tools/bench_skew.py [sf_dir]   (default /root/testdata/sf0.1)
Writes one JSON line; paste results into PLANS.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from steel_datafusion_spark import session_context  # noqa: E402
from steel_datafusion_spark.operators.skew import salted_join  # noqa: E402
from steel_datafusion_spark.sources.readers import load_tables  # noqa: E402

REP = 100     # compact-side multiplicity (hot-key output = |hot| * REP rows)
SALT = 32


def build_sides(spark, sf_dir):
    ev = load_tables(spark, sf_dir)["events"]
    skewed = ev.select(
        F.when(F.col("event_id") % 2 == 0, F.lit(0))
         .otherwise(F.col("user_id")).alias("k"),
        "event_id", "value")
    reps = spark.range(REP).select(F.col("id").alias("rep"))
    compact = ev.select(F.col("user_id").alias("ck")).distinct().crossJoin(reps)
    return skewed, compact


def agg(j):
    return (j.groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                  .alias("sum_value")))


def timed(df, n_runs=3):
    best = float("inf")
    for _ in range(n_runs):
        t0 = time.time()
        df.collect()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = session_context(app_name="sdf-skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # emulate a non-broadcastable dimension (the 100 TB case)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    skewed, compact = build_sides(spark, sf_dir)
    skewed = skewed.persist()
    compact = compact.persist()
    skewed.count(), compact.count()  # warm inputs: measure the join, not the scan

    plain = agg(skewed.join(compact, skewed["k"] == compact["ck"], "inner"))
    salted = agg(salted_join(skewed, compact, "k", "ck",
                             salt_col="event_id", salt=SALT))

    # sanity: identical results
    p = {(r.k, r.n, round(r.sum_value, 2)) for r in plain.collect()}
    s = {(r.k, r.n, round(r.sum_value, 2)) for r in salted.collect()}
    assert p == s, "salted result diverges from plain"

    t_plain = timed(plain)
    t_salted = timed(salted)
    print(json.dumps({
        "sf_dir": sf_dir, "rep": REP, "salt": SALT,
        "plain_sec": t_plain, "salted_sec": t_salted,
        "speedup": round(t_plain / t_salted, 2) if t_salted else None,
    }))


if __name__ == "__main__":
    main()
