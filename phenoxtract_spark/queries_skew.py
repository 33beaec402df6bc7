"""Skew-mitigation queries (round 9): salted two-phase aggregation and
salted shuffle join on a PLANTED power-law key.

The fixture key is deliberate, not organic: ``hot_key = 0`` owns 90% of
lineitem (``l_orderkey % 10 < 9``) and four cold keys split the rest —
the distribution where a naive shuffle-by-key plan turns one reducer
into the stage straggler at 100 TB.  Each query's oracle is the PLAIN
unsalted aggregate/join, so a green row *is* the exactness proof: the
salt must be invisible in the values.  SCALING.md records the measured
straggler effect at sf1 (naive collect-state vs salted distinct; plain
vs salted shuffle join on the 90%-hot fk).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators import skew
from .queries_core import q, read_table

# 90% of rows on key 0, remainder split over keys 1..4 by partkey —
# integer modulo on BIGINTs, bit-identical on both engines
_HOT_KEY_SQL = """CASE WHEN l_orderkey % 10 < 9 THEN 0
                       ELSE 1 + l_partkey % 4 END"""


def _hot_key_col():
    return (
        F.when(F.col("l_orderkey") % 10 < 9, F.lit(0))
        .otherwise(F.lit(1) + F.col("l_partkey") % 4)
        .cast("bigint")
    )


@q(
    "skew_salted_agg_revenue",
    f"""
    WITH b AS (
      SELECT {_HOT_KEY_SQL} AS hot_key,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    )
    SELECT CAST(hot_key AS BIGINT) AS hot_key,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(min(cents) AS BIGINT) AS min_cents,
           CAST(max(cents) AS BIGINT) AS max_cents
    FROM b GROUP BY hot_key
    """,
)
def skew_salted_agg_revenue(spark, sf_dir):
    """Salted two-phase sum/count/min/max over the planted 90%-hot key
    (operators/skew.py::salted_agg): phase 1 groups by (hot_key, salt)
    so the hot key's rows spread over 32 reducer cells; phase 2 merges
    the ≤32 partial rows per key.  The oracle is the PLAIN group-by —
    algebraic decomposability means the salt cannot change a value.
    All integer cents, so the two-phase sum is exact, not
    float-reassociated.  Plan: two exchanges by construction (the
    plan-shape test pins salt-then-key partitioning)."""
    li = read_table(spark, sf_dir, "lineitem")
    base = li.select(
        _hot_key_col().alias("hot_key"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        "l_orderkey", "l_linenumber",
    )
    out = skew.salted_agg(
        base, ["hot_key"], salt_on=["l_orderkey", "l_linenumber"],
        buckets=32, sums=["cents"], mins=["cents"], maxs=["cents"],
    )
    return out.select(
        "hot_key",
        F.col("sum_cents").cast("bigint").alias("sum_cents"),
        "cnt",
        F.col("min_cents").cast("bigint").alias("min_cents"),
        F.col("max_cents").cast("bigint").alias("max_cents"),
    )


@q(
    "skew_salted_distinct_orders",
    f"""
    SELECT CAST({_HOT_KEY_SQL} AS BIGINT) AS hot_key,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
    FROM lineitem GROUP BY 1
    """,
)
def skew_salted_distinct_orders(spark, sf_dir):
    """Exact per-key COUNT(DISTINCT) without concentrating the hot
    key's distinct-set in one task
    (operators/skew.py::salted_distinct_count): salt by the VALUE hash
    (every occurrence of an order key lands in exactly one (key, salt)
    cell — cells partition the value space), count distinct per cell,
    sum the 32 cell counts.  Oracle: plain count(DISTINCT) — exactness
    is the value-partition argument, and the green row proves it."""
    li = read_table(spark, sf_dir, "lineitem")
    base = li.select(_hot_key_col().alias("hot_key"), "l_orderkey")
    return skew.salted_distinct_count(
        base, ["hot_key"], "l_orderkey", buckets=32, out_col="n_orders"
    )


@q(
    "skew_salted_join_supplier",
    """
    WITH f AS (
      SELECT CASE WHEN l_orderkey % 10 < 9 THEN 0 ELSE l_suppkey END
               AS s_suppkey,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    )
    SELECT CAST(f.s_suppkey AS BIGINT) AS s_suppkey, s.s_name,
           CAST(sum(f.cents) AS BIGINT) AS sum_cents,
           CAST(count(*) AS BIGINT) AS cnt
    FROM f JOIN supplier s USING (s_suppkey)
    GROUP BY 1, 2
    """,
)
def skew_salted_join_supplier(spark, sf_dir):
    """Salted shuffle join on a planted 90%-hot foreign key
    (operators/skew.py::salted_join): supplier rows replicate once per
    salt value (16×), each fact row carries one deterministic salt, and
    the (key, salt) join spreads supplier 0's probe rows over 16
    partitions instead of one.  The oracle is the PLAIN join + group-by
    — replication × single-salt means every fact row meets its dim row
    exactly once.  shuffle_hash hint models the dim-too-big-to-
    broadcast regime this operator exists for (broadcast would of
    course win at THIS scale — that's the contrast, not the target);
    the final revenue roll-up re-groups by supplier, which is safe
    because sum/count partial-aggregate map-side."""
    li = read_table(spark, sf_dir, "lineitem")
    sup = read_table(spark, sf_dir, "supplier")
    fact = li.select(
        F.when(F.col("l_orderkey") % 10 < 9, F.lit(0))
        .otherwise(F.col("l_suppkey")).cast("bigint").alias("s_suppkey"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        "l_orderkey", "l_linenumber",
    )
    joined = skew.salted_join(
        fact, sup.select("s_suppkey", "s_name"), "s_suppkey",
        buckets=16, fact_salt_on=["l_orderkey", "l_linenumber"],
    )
    return joined.groupBy("s_suppkey", "s_name").agg(
        F.sum("cents").cast("bigint").alias("sum_cents"),
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
    )
