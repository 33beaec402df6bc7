"""Measure the straggler effect of the r9 skew-mitigation operators on
the planted 90%-hot key at sf1+ (SCALING.md evidence).

Interleaved A/B within ONE session (the repo's only accepted perf
methodology — one-shot numbers drift up to 10x): each round runs every
variant once, so host noise hits all variants alike.

Experiments (lineitem, hot_key 0 = 90% of rows):
  1. per-key exact distinct:  naive collect_set  vs  built-in
     count_distinct  vs  salted_distinct_count.  The naive formulation
     is the one users write; its hot key's reduce task holds EVERY
     distinct value at once.
  2. hot-fk shuffle join (broadcast disabled): plain sort-merge (the
     hot key's 5.4M probe rows sort in ONE task)  vs  AQE skew-join
     (runtime split)  vs  salted_join (plan-level split).
  3. decomposable sum/count: plain groupBy  vs  salted_agg — expected
     ~parity, and that is the honest point: map-side partial
     aggregation already collapses hot-key rows per map task, so
     salting decomposable aggs is insurance for combine-hostile
     layouts, not a win here.  Recorded so SCALING.md can say it
     with a number instead of a claim.

Usage: python tools/measure_skew.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_session():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/phenoxtract_sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = build_session()
    from pyspark.sql import functions as F

    from phenoxtract_spark.operators import skew

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    sup = spark.read.parquet(os.path.join(sf_dir, "supplier.parquet"))
    hot = (
        F.when(F.col("l_orderkey") % 10 < 9, F.lit(0))
        .otherwise(F.lit(1) + F.col("l_partkey") % 4).cast("bigint")
    )
    base = li.select(
        hot.alias("hot_key"), "l_orderkey", "l_linenumber",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    fact = li.select(
        F.when(F.col("l_orderkey") % 10 < 9, F.lit(0))
        .otherwise(F.col("l_suppkey")).cast("bigint").alias("s_suppkey"),
        "l_orderkey", "l_linenumber",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    dim = sup.select("s_suppkey", "s_name")

    def distinct_naive():
        return base.groupBy("hot_key").agg(
            F.size(F.collect_set("l_orderkey")).alias("n")
        )

    def distinct_builtin():
        return base.groupBy("hot_key").agg(
            F.count_distinct("l_orderkey").alias("n")
        )

    def distinct_salted():
        return skew.salted_distinct_count(
            base, ["hot_key"], "l_orderkey", buckets=32, out_col="n"
        )

    def _join_agg(j):
        return j.groupBy("s_suppkey").agg(
            F.sum("cents").alias("s"), F.count(F.lit(1)).alias("c")
        )

    def join_plain_smj():
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        return _join_agg(fact.join(dim.hint("merge"), "s_suppkey"))

    def join_aqe_skew():
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        # default factor 5 / size 256M never fires at sf1 partition
        # sizes; lower the thresholds so the runtime split actually
        # engages on the planted key (documented in SCALING.md)
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        return _join_agg(fact.join(dim.hint("merge"), "s_suppkey"))

    def join_salted():
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        return _join_agg(
            skew.salted_join(fact, dim, "s_suppkey", buckets=16,
                             fact_salt_on=["l_orderkey", "l_linenumber"])
        )

    def agg_plain():
        return base.groupBy("hot_key").agg(
            F.sum("cents").alias("s"), F.count(F.lit(1)).alias("c")
        )

    def agg_salted():
        return skew.salted_agg(
            base, ["hot_key"], salt_on=["l_orderkey", "l_linenumber"],
            buckets=32, sums=["cents"],
        )

    variants = [
        ("distinct_naive_collect_set", distinct_naive),
        ("distinct_builtin", distinct_builtin),
        ("distinct_salted", distinct_salted),
        ("join_plain_smj", join_plain_smj),
        ("join_aqe_skew", join_aqe_skew),
        ("join_salted", join_salted),
        ("agg_plain", agg_plain),
        ("agg_salted", agg_salted),
    ]
    times: dict[str, list[float]] = {n: [] for n, _ in variants}
    for r in range(reps):
        for name, fn in variants:
            t0 = time.time()
            rows = fn().collect()
            dt = time.time() - t0
            times[name].append(round(dt, 2))
            print(f"rep{r} {name:30s} {dt:6.2f}s rows={len(rows)}",
                  file=sys.stderr)
            # reset join confs so later variants see clean defaults
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
            spark.conf.unset(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
            spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    out = {
        "sf_dir": sf_dir,
        "reps": reps,
        "times": times,
        "best": {n: min(v) for n, v in times.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
