"""Remaining TPC-H query shapes over the driver tables (q4, q8, q13, q15,
q17, q19, q21, q22).

The driver parquet has no ``partsupp`` and trims several columns
(``l_commitdate``/``l_receiptdate``, ``o_comment``, ``c_phone``,
``p_container``), so q2/q9/q11/q16/q20 are out of scope and the remaining
queries keep their SHAPE (exists/not-exists, correlated scalar subqueries,
left-join distributions, view-max selection, disjunctive pushdown) with
predicates adapted to the columns that exist:

- "late shipment" := ``l_shipdate > o_orderdate + 75 days`` (stands in for
  the reference's receipt-after-commit lateness),
- q13 excludes urgent orders instead of the comment LIKE,
- q22's country code is the customer's nation key.

Cross-engine value discipline (same as queries_analytics2): money sums
accumulate in DECIMAL(18,4) (exact + associative, so double
summation-order ulps can't flip a round() boundary), doubles are rounded
in-query on BOTH sides, and int32-producing Spark functions are cast to
bigint.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries_core import q, read_table

_DEC = "decimal(18,4)"


def _money(col):
    """Exact decimal accumulator for an order-independent money sum."""
    return F.sum(col.cast(_DEC))


# ---------------------------------------------------------------------------
# q4 — order priority checking: EXISTS over lineitem becomes a left-semi
# join whose condition spans both tables (lateness references o_orderdate).
# ---------------------------------------------------------------------------


@q(
    "tpch_q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 75 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def tpch_q4(spark, sf_dir):
    """Priority distribution of orders with at least one late line.  The
    EXISTS is a left-semi join; the lateness predicate lives in the join
    condition (it references both sides), the date window pushes to the
    orders scan."""
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1996-04-01").cast("date"))
    )
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate").cast("date")
        > F.date_add(F.col("o_orderdate").cast("date"), 75)
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# ---------------------------------------------------------------------------
# q8 — national market share: share of one supplier nation in a region's
# revenue for one part type, by order year.
# ---------------------------------------------------------------------------


@q(
    "tpch_q8_market_share",
    """
    SELECT o_year,
           round(CAST(sum(CASE WHEN nation = 'NATION_9' THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 4) AS mkt_share
    FROM (
      SELECT year(CAST(o_orderdate AS DATE)) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS volume,
             sn.n_name AS nation
      FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE r_name = 'ASIA'
        AND p_type = 'ECONOMY'
        AND CAST(o_orderdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
    )
    GROUP BY o_year
    """,
)
def tpch_q8(spark, sf_dir):
    """Market share of NATION_9 suppliers in ASIA's ECONOMY-part revenue.
    Both numerator and denominator accumulate in decimal (exact), then one
    double division per group — deterministic given identical operands.
    nation joins twice under different roles (customer's and supplier's);
    both are broadcast."""
    p = read_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date").between("1996-01-01", "1997-12-31")
    )
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        F.broadcast(p)
        .join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .select(
            F.year(F.col("o_orderdate").cast("date")).cast("bigint").alias("o_year"),
            vol.cast(_DEC).alias("volume"),
            "nation",
        )
    )
    zero = F.lit(0).cast(_DEC)
    return joined.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("nation") == "NATION_9", F.col("volume")).otherwise(zero))
            .cast("double")
            / F.sum("volume").cast("double"),
            4,
        ).alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# q13 — customer order-count distribution: left join with an extra join-side
# predicate, then a histogram of the per-customer counts.
# ---------------------------------------------------------------------------


@q(
    "tpch_q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def tpch_q13(spark, sf_dir):
    """How many customers placed 0, 1, 2, ... non-urgent orders.  The
    priority predicate belongs in the JOIN condition, not a WHERE (a WHERE
    would drop the zero-order customers the query exists to count).  Two
    shuffles: the outer-join/groupBy on custkey, then the tiny histogram."""
    c = read_table(spark, sf_dir, "customer").select("c_custkey")
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# q15 — top supplier: a revenue "view" over one quarter, then the row(s)
# achieving its max.
# ---------------------------------------------------------------------------


@q(
    "tpch_q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2)
                  AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def tpch_q15(spark, sf_dir):
    """Supplier(s) with the quarter's max revenue.  The scalar max-subquery
    is a broadcast join against a ONE-ROW aggregate — no global sort, no
    single-partition window.  Revenue rounds from an exact decimal sum so
    the max-equality is bit-stable across engines."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1996-04-01").cast("date"))
    )
    s = read_table(spark, sf_dir, "supplier")
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(_money(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .cast("double")
            .alias("total_revenue")
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("_mx"))
    return (
        s.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("_mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# q17 — small-quantity-order revenue: correlated scalar subquery
# (per-part average) becomes a pre-aggregated broadcast join.
# ---------------------------------------------------------------------------


@q(
    "tpch_q17_small_quantity",
    """
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))) / 7.0, 2) AS DOUBLE)
           AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#9' AND p_size <= 5
      AND l_quantity < (
        SELECT round(0.2 * avg(l_quantity), 6)
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
    """,
)
def tpch_q17(spark, sf_dir):
    """Yearly-averaged revenue lost to small-quantity orders of one brand's
    small parts.  The correlated avg-per-part subquery de-correlates into
    one groupBy over lineitem joined back by partkey; the threshold is
    rounded to 6 dp on both sides so the quantity comparison can't flip on
    an average's last ulp."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#9") & (F.col("p_size") <= 5)
    )
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.round(0.2 * F.avg("l_quantity"), 6).alias("_thresh")
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(thresholds, F.col("t_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("_thresh"))
        .agg(
            (F.round(_money(F.col("l_extendedprice")), 4).cast("double") / F.lit(7.0))
            .alias("_raw")
        )
        .select(F.round(F.col("_raw"), 2).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# q19 — disjunctive predicate revenue: three brand/size/quantity branches
# OR-ed together; Catalyst extracts the common p_partkey = l_partkey
# equi-condition so the join stays a hash join, not a nested loop.
# ---------------------------------------------------------------------------


@q(
    "tpch_q19_discounted_revenue",
    """
    SELECT CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#9' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 5 AND 25
           AND l_quantity BETWEEN 10 AND 35)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 50)
    """,
)
def tpch_q19(spark, sf_dir):
    """Disjunctive-predicate revenue.  The disjunction mixes columns from
    both sides, so it evaluates post-join; the equi-key join itself stays a
    broadcast hash join (part is the small side)."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    branch = (
        (
            (F.col("p_brand") == "Brand#9")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(5, 25)
            & F.col("l_quantity").between(10, 35)
        )
        | (
            (F.col("p_brand") == "Brand#20")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(branch)
        .agg(
            F.round(_money(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .cast("double")
            .alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# q21 — suppliers who kept orders waiting: EXISTS(other supplier in order)
# AND NOT EXISTS(other LATE supplier in order) de-correlates into one
# per-order aggregate of (distinct suppliers, distinct late suppliers).
# ---------------------------------------------------------------------------


@q(
    "tpch_q21_suppliers_kept_waiting",
    """
    WITH late_lines AS (
      SELECT l_orderkey, l_suppkey,
             (CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 75 DAY)
               AS is_late, o_orderstatus
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT s_name, count(*) AS numwait
    FROM late_lines l1
      JOIN supplier ON l1.l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_9' AND l1.is_late AND l1.o_orderstatus = 'F'
      AND EXISTS (
        SELECT 1 FROM late_lines l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM late_lines l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.is_late
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def tpch_q21(spark, sf_dir):
    """Suppliers who were the SOLE late supplier on a multi-supplier final
    order.  Instead of two correlated re-scans (EXISTS + NOT EXISTS), one
    per-order aggregate computes (# distinct suppliers, # distinct late
    suppliers); the conditions become n_supp > 1 AND n_late_supp = 1 —
    a single extra shuffle on l_orderkey, reused by both tests."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderstatus"
    )
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_9")
    lines = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        "o_orderstatus",
        (
            F.col("l_shipdate").cast("date")
            > F.date_add(F.col("o_orderdate").cast("date"), 75)
        ).alias("is_late"),
    )
    per_order = lines.groupBy(F.col("l_orderkey").alias("po_key")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    return (
        lines.filter(F.col("is_late") & (F.col("o_orderstatus") == "F"))
        .join(per_order, F.col("l_orderkey") == F.col("po_key"))
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q22 — global sales opportunity: above-average-balance customers with no
# orders; scalar avg-subquery + anti join, grouped by nation (the driver
# schema has no phone column to take a country code from).
# ---------------------------------------------------------------------------


@q(
    "tpch_q22_sales_opportunity",
    """
    SELECT c_nationkey AS cntrycode, count(*) AS numcust,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS totacctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT round(avg(c_acctbal), 6) FROM customer WHERE c_acctbal > 0.0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
      )
    GROUP BY c_nationkey
    """,
)
def tpch_q22(spark, sf_dir):
    """Rich customers per nation who never placed an URGENT order (every
    customer in the driver data has SOME order, so the original
    never-ordered predicate would be vacuously empty — the urgent variant
    keeps the anti-join shape and selects ~1% of customers).  The scalar
    avg is a broadcast one-row join (rounded to 6 dp on both sides so the
    balance comparison is ulp-stable); the NOT EXISTS is a left-anti join
    on custkey against the pre-filtered, pre-projected orders side."""
    c = read_table(spark, sf_dir, "customer")
    o = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.round(F.avg("c_acctbal"), 6).alias("_avg")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(_money(F.col("c_acctbal")), 2).cast("double").alias("totacctbal"),
        )
    )
