"""Additional analytics-surface queries: semi/anti joins, correlated-exists
shapes, group-by-having, and the stateful-streaming batch equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries_core import q, read_table


@q(
    "semi_join_customers_with_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def semi_join(spark, sf_dir):
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@q(
    "anti_join_parts_never_bulk_ordered",
    """
    SELECT p_partkey, p_brand FROM part
    WHERE NOT EXISTS (SELECT 1 FROM lineitem
                      WHERE l_partkey = p_partkey AND l_quantity >= 45)
    """,
)
def anti_join(spark, sf_dir):
    p = read_table(spark, sf_dir, "part")
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return p.join(li, p.p_partkey == li.l_partkey, "left_anti").select("p_partkey", "p_brand")


@q(
    "having_big_customers",
    """
    SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS spend
    FROM orders GROUP BY o_custkey
    HAVING count(*) >= 12
    """,
)
def having_q(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("spend"),
        )
        .filter(F.col("n_orders") >= 12)
    )


@q(
    "distinct_agg_by_group",
    """
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_customers,
           count(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def distinct_agg(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@q(
    "scalar_subquery_above_avg",
    """
    SELECT p_partkey, p_type, p_retailprice
    FROM part
    WHERE p_retailprice > (SELECT avg(p2.p_retailprice) FROM part p2
                           WHERE p2.p_type = part.p_type)
    """,
)
def scalar_subquery(spark, sf_dir):
    """Correlated scalar subquery expressed as a window aggregate — one
    shuffle on the correlation key instead of a per-row subquery."""
    from pyspark.sql.window import Window

    p = read_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_type")
    return (
        p.withColumn("_avg", F.avg("p_retailprice").over(w))
        .filter(F.col("p_retailprice") > F.col("_avg"))
        .select("p_partkey", "p_type", "p_retailprice")
    )


@q(
    "stateful_running_totals",
    """
    SELECT user_id, count(*) AS n_events,
           round(sum(coalesce(value, 0)), 2) AS total_value
    FROM events GROUP BY user_id
    """,
)
def stateful_totals(spark, sf_dir):
    """Batch semantics of the applyInPandasWithState running-totals operator
    (streaming/stateful.py); the streaming path is exercised in
    tests/test_stateful_streaming.py with an availableNow trigger."""
    from .streaming import stateful

    e = read_table(spark, sf_dir, "events")
    return stateful.running_totals_batch(e)
