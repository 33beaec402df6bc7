"""Analytics-breadth queries: joins, windows, grouping sets, set ops, top-k,
range joins — the Spark SQL surface the reference lacks (SURVEY §2.5 note).
All doubles are rounded in-query on both sides so values are bit-comparable.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries_core import q, read_table


@q(
    "tpch_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
        ).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@q(
    "tpch_q3_shipping_priority",
    """
    SELECT l_orderkey, revenue, o_orderdate, o_orderpriority
    FROM (
      SELECT l_orderkey,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
      GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
    )
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping(spark, sf_dir):
    c = read_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@q(
    "join_star_revenue",
    """
    SELECT r_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
                  JOIN orders ON o_custkey = c_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY r_name, n_name
    """,
)
def star_revenue(spark, sf_dir):
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@q(
    "join_broadcast_dims",
    """
    SELECT c_custkey, n_name, r_name
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    """,
)
def broadcast_dims(spark, sf_dir):
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )


@q(
    "window_running_total",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey), 2) AS running_spend
    FROM orders
    """,
)
def running_total(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey", "o_orderkey", F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend")
    )


@q(
    "window_rank",
    """
    SELECT c_custkey, c_mktsegment,
           row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn,
           rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rnk,
           lag(c_custkey) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS prev_custkey
    FROM customer
    """,
)
def window_rank(spark, sf_dir):
    c = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.lag("c_custkey").over(w).alias("prev_custkey"),
    )


@q(
    "topk_orders",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def topk(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
        .select("o_orderkey", "o_totalprice")
    )


@q(
    "rollup_counts",
    """
    SELECT r_name, n_name, count(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def rollup_counts(spark, sf_dir):
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@q(
    "cube_counts",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_counts(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@q(
    "set_ops",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def set_ops(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    done = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    part = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return open_.intersect(done).exceptAll(part.distinct())


@q(
    "range_join_ship_window",
    """
    SELECT o_orderkey, count(l_orderkey) AS n_shipped_30d
    FROM orders LEFT JOIN lineitem
      ON l_orderkey = o_orderkey
     AND CAST(l_shipdate AS DATE) BETWEEN CAST(o_orderdate AS DATE)
                                      AND CAST(o_orderdate AS DATE) + 30
    GROUP BY o_orderkey
    """,
)
def range_join(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    od = F.col("o_orderdate").cast("date")
    sd = F.col("l_shipdate").cast("date")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (sd >= od)
        & (sd <= F.date_add(od, 30))
    )
    return (
        o.join(li, cond, "left")
        .groupBy("o_orderkey")
        .agg(F.count("l_orderkey").alias("n_shipped_30d"))
    )


@q(
    "percentile_exact",
    """
    SELECT c_mktsegment,
           round(quantile_cont(c_acctbal, 0.5), 4) AS median_bal,
           round(quantile_cont(c_acctbal, 0.9), 4) AS p90_bal,
           round(min(c_acctbal), 2) AS min_bal,
           round(max(c_acctbal), 2) AS max_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def percentile_exact(spark, sf_dir):
    c = read_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.round(F.percentile("c_acctbal", F.lit(0.5)), 4).alias("median_bal"),
        F.round(F.percentile("c_acctbal", F.lit(0.9)), 4).alias("p90_bal"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
    )


@q(
    "analytics_mad_outliers",
    """
    WITH spend AS (
      SELECT c.c_mktsegment, o.o_custkey, round(sum(o.o_totalprice), 2) AS s
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    med AS (
      SELECT c_mktsegment, quantile_cont(s, 0.5) AS med FROM spend GROUP BY 1
    ),
    dev AS (
      SELECT sp.c_mktsegment, sp.o_custkey, sp.s, m.med,
             abs(sp.s - m.med) AS adev
      FROM spend sp JOIN med m USING (c_mktsegment)
    ),
    mad AS (
      SELECT c_mktsegment, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1
    )
    SELECT d.o_custkey, d.c_mktsegment, d.s AS total_spend,
           round((d.s - d.med) / (1.4826 * m.mad), 4) AS robust_z
    FROM dev d JOIN mad m USING (c_mktsegment)
    WHERE abs(round((d.s - d.med) / (1.4826 * m.mad), 4)) > 3.0
    """,
)
def analytics_mad_outliers(spark, sf_dir):
    """Robust outlier detection on per-customer spend within each market
    segment: median + MAD (two exact percentile passes over the
    aggregated spend relation, 5-row group dims broadcast back), flag
    |robust z| > 3 with the 1.4826 normal-consistency factor — the
    outlier screen that survives the heavy tails plain z-scores drown
    in (9 real outliers at sf0.01, so the threshold demonstrably
    bites).  Rounded before the threshold for a stable cross-engine
    boundary."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    spend = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment", "o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("s"))
    )
    med = spend.groupBy("c_mktsegment").agg(
        F.percentile("s", F.lit(0.5)).alias("med")
    )
    dev = spend.join(F.broadcast(med), "c_mktsegment").withColumn(
        "adev", F.abs(F.col("s") - F.col("med"))
    )
    mad = dev.groupBy("c_mktsegment").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    z = F.round((F.col("s") - F.col("med")) / (1.4826 * F.col("mad")), 4)
    return (
        dev.join(F.broadcast(mad), "c_mktsegment")
        .select(
            "o_custkey",
            "c_mktsegment",
            F.col("s").alias("total_spend"),
            z.alias("robust_z"),
        )
        .filter(F.abs(F.col("robust_z")) > 3.0)
    )


@q(
    "approx_aggregates",
    """
    SELECT count(DISTINCT l_partkey) AS exact_parts,
           abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
             <= 0.05 * count(DISTINCT l_partkey) AS acd_within_5pct,
           abs(approx_quantile(l_extendedprice, 0.5)
               - quantile_cont(l_extendedprice, 0.5))
             <= 0.02 * quantile_cont(l_extendedprice, 0.5) AS median_within_2pct
    FROM lineitem
    """,
)
def approx_aggs(spark, sf_dir):
    """Approximate aggregates with a TOLERANCED oracle: each engine runs its
    own sketch (HLL / t-digest-ish) next to the exact aggregate and asserts
    the approximation lands within the documented error bound — the
    booleans (and the exact count) must agree across engines even though
    the raw sketch values differ."""
    li = read_table(spark, sf_dir, "lineitem")
    exact_parts = F.countDistinct("l_partkey")
    exact_median = F.percentile("l_extendedprice", F.lit(0.5))
    return li.agg(
        exact_parts.alias("exact_parts"),
        (
            F.abs(F.approx_count_distinct("l_partkey") - exact_parts)
            <= 0.05 * exact_parts
        ).alias("acd_within_5pct"),
        (
            F.abs(F.percentile_approx("l_extendedprice", 0.5, 1000) - exact_median)
            <= 0.02 * exact_median
        ).alias("median_within_2pct"),
    )


@q(
    "window_ntile_distribution",
    """
    SELECT o_orderkey, o_orderpriority,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           lead(o_orderkey) OVER w AS next_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_ntile(spark, sf_dir):
    """Distribution-window surface: ntile quartiles, percent_rank,
    cume_dist, lead — one shuffle on the partition key, single sort per
    partition serves all four functions."""
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )
