"""Unit tests for the round-9 skew-mitigation operators: exactness of
the salted two-phase shapes against their plain single-phase twins on a
deliberately skewed fixture (one key owning ~90% of rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from phenoxtract_spark.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    # 900 rows on key 'hot', 100 spread over 4 cold keys; values cycle
    # so distinct counts differ per key
    rows = [("hot", i % 37, i) for i in range(900)]
    rows += [(f"cold{i % 4}", i % 11, 1000 + i) for i in range(100)]
    return spark.createDataFrame(
        rows, "k string, v bigint, rid bigint"
    ).cache()


def test_salted_agg_equals_plain(spark, skewed):
    plain = {
        r["k"]: (r["s"], r["c"], r["mn"], r["mx"])
        for r in skewed.groupBy("k").agg(
            F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"),
            F.min("v").alias("mn"), F.max("v").alias("mx"),
        ).collect()
    }
    salted = {
        r["k"]: (r["sum_v"], r["cnt"], r["min_v"], r["max_v"])
        for r in skew.salted_agg(
            skewed, ["k"], salt_on=["rid"], buckets=8,
            sums=["v"], mins=["v"], maxs=["v"],
        ).collect()
    }
    assert salted == plain


def test_salted_distinct_count_equals_plain(spark, skewed):
    plain = {
        r["k"]: r["d"]
        for r in skewed.groupBy("k")
        .agg(F.count_distinct("v").alias("d")).collect()
    }
    salted = {
        r["k"]: r["n_distinct"]
        for r in skew.salted_distinct_count(
            skewed, ["k"], "v", buckets=8
        ).collect()
    }
    assert salted == plain


def test_salted_distinct_value_partition_no_double_count(spark):
    """The same value appearing in MANY rows of one key must count once:
    value-hash salting routes every occurrence to one cell."""
    df = spark.createDataFrame(
        [("k", 7, i) for i in range(50)] + [("k", 8, 100)],
        "k string, v bigint, rid bigint",
    )
    out = skew.salted_distinct_count(df, ["k"], "v", buckets=4).collect()
    assert out[0]["n_distinct"] == 2


def test_salted_join_equals_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H"), ("cold0", "C0"), ("cold1", "C1"),
         ("cold2", "C2"), ("cold3", "C3"), ("absent", "A")],
        "k string, label string",
    )
    plain = sorted(
        (r["rid"], r["label"])
        for r in skewed.join(dim, "k").select("rid", "label").collect()
    )
    salted = sorted(
        (r["rid"], r["label"])
        for r in skew.salted_join(
            skewed, dim, "k", buckets=4, fact_salt_on=["rid"]
        ).select("rid", "label").collect()
    )
    assert salted == plain
    assert len(salted) == 1000  # every fact row exactly once, no dup


def test_salted_join_requires_salt_cols(spark, skewed):
    dim = spark.createDataFrame([("hot", "H")], "k string, label string")
    with pytest.raises(ValueError, match="fact_salt_on"):
        skew.salted_join(skewed, dim, "k", fact_salt_on=[])


def test_row_salt_deterministic_and_bounded(spark):
    """Salt must be retry-stable (hash, never rand()) and in [0, B)."""
    df = spark.range(200).select(F.col("id"))
    a = [r[0] for r in df.select(skew.row_salt(["id"], 7)).collect()]
    b = [r[0] for r in df.select(skew.row_salt(["id"], 7)).collect()]
    assert a == b
    assert set(a) <= set(range(7))
    assert len(set(a)) > 1  # actually spreads
