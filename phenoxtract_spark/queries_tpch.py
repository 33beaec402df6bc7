"""Remaining TPC-H query shapes over the driver tables — completes 22/22.

The driver parquet has no ``partsupp`` and trims several columns
(``l_commitdate``/``l_receiptdate``, ``o_comment``, ``c_phone``,
``p_container``), so the partsupp-dependent five (q2/q9/q11/q16/q20) are
SHAPE adaptations: the part↔supplier relation derives from lineitem
(distinct pairs / per-pair aggregates), supply cost becomes observed unit
price (q2) or a fixed retail-price fraction (q9), and availability becomes
shipped quantity (q20).  Every distinctive plan shape survives: per-group
argmin joined back (q2), profit expression over a 6-table join (q9),
HAVING against a global scalar subquery (q11), NOT-IN exclusion + distinct
counting (q16), nested semi-joins with a fractional threshold (q20).
The column-trimmed rest keeps its shape (exists/not-exists, correlated
scalar subqueries, left-join distributions, view-max selection,
disjunctive pushdown) with predicates adapted to the columns that exist:

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

# ---------------------------------------------------------------------------
# q2 — minimum-cost supplier: the correlated min-subquery becomes a
# per-part min aggregate joined back (argmin-per-group).  Supply cost is
# the observed minimum unit price each supplier ever charged for the part.
# ---------------------------------------------------------------------------


@q(
    "tpch_q2_min_cost_supplier",
    """
    WITH catalog AS (
      SELECT l_partkey, l_suppkey, min(round(l_extendedprice / l_quantity, 6)) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), euro AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ), offer AS (
      SELECT p_partkey, s_name, s_acctbal, n_name, unit_cost
      FROM part JOIN catalog ON p_partkey = l_partkey
                JOIN euro ON l_suppkey = s_suppkey
      WHERE p_size = 15 AND p_type = 'STANDARD'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, unit_cost
    FROM offer o
    WHERE unit_cost = (SELECT min(unit_cost) FROM offer o2
                       WHERE o2.p_partkey = o.p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def tpch_q2(spark, sf_dir):
    """Cheapest European supplier(s) per STANDARD size-15 part.  The
    part↔supplier catalog is a (partkey, suppkey) aggregate over lineitem;
    unit price rounds to 6 dp per row BEFORE the min so the argmin equality
    is ulp-stable across engines.  The correlated min de-correlates into
    one per-part aggregate of the (already part-filtered, region-filtered)
    offer relation joined back — part and the European supplier dim both
    broadcast, so the only data-sized shuffle is the catalog groupBy."""
    li = read_table(spark, sf_dir, "lineitem")
    catalog = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.round(F.col("l_extendedprice") / F.col("l_quantity"), 6)).alias(
            "unit_cost"
        )
    )
    p = read_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    euro = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offer = (
        catalog.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(euro), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "s_name", "s_acctbal", "n_name", "unit_cost")
    )
    best = offer.groupBy(F.col("p_partkey").alias("b_partkey")).agg(
        F.min("unit_cost").alias("_best")
    )
    return (
        offer.join(
            F.broadcast(best),
            (F.col("p_partkey") == F.col("b_partkey"))
            & (F.col("unit_cost") == F.col("_best")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "unit_cost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q9 — product-type profit: supply cost proxied as a fixed fraction of the
# part's retail price (the driver schema has no ps_supplycost).
# ---------------------------------------------------------------------------


@q(
    "tpch_q9_product_type_profit",
    """
    SELECT nation, o_year,
           CAST(round(sum(CAST(amount AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation, year(CAST(o_orderdate AS DATE)) AS o_year,
             l_extendedprice * (1 - l_discount)
               - 0.6 * p_retailprice * l_quantity AS amount
      FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%'
    )
    GROUP BY nation, o_year
    """,
)
def tpch_q9(spark, sf_dir):
    """Profit on widget parts by supplier nation and order year.  The
    profit expression evaluates in one fixed double tree per row, then
    accumulates in decimal so summation order can't move a rounded cent.
    part (name-filtered), supplier, and nation broadcast; orders joins on
    the lineitem shuffle key — one data-sized exchange."""
    p = read_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = read_table(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    joined = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year(F.col("o_orderdate").cast("date")).cast("bigint").alias("o_year"),
            amount.cast(_DEC).alias("amount"),
        )
    )
    return joined.groupBy("nation", "o_year").agg(
        F.round(F.sum("amount"), 2).cast("double").alias("sum_profit")
    )


# ---------------------------------------------------------------------------
# q11 — important parts: per-part value in one nation, kept only when it
# exceeds a fraction of the nation's total (HAVING vs a global scalar).
# ---------------------------------------------------------------------------


@q(
    "tpch_q11_important_parts",
    """
    WITH natline AS (
      SELECT l_partkey, CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS val
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
    )
    SELECT l_partkey AS ps_partkey, CAST(round(sum(val), 2) AS DOUBLE) AS value
    FROM natline
    GROUP BY l_partkey
    HAVING CAST(sum(val) AS DOUBLE)
           > (SELECT CAST(sum(val) AS DOUBLE) * 0.001 FROM natline)
    """,
)
def tpch_q11(spark, sf_dir):
    """Parts whose NATION_7 revenue exceeds 0.1% of the nation's total.
    The scalar total is a one-row aggregate broadcast back; both sides of
    the threshold comparison convert the exact decimal sum to double, so
    the cut is bit-stable.  One shuffle (partkey groupBy) over the
    nation-filtered lines — the supplier semi-join broadcasts."""
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    nat_supp = s.join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi"
    ).select("s_suppkey")
    natline = li.join(
        F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
    ).select(
        "l_partkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC).alias("val"),
    )
    per_part = natline.groupBy("l_partkey").agg(F.sum("val").alias("_sum"))
    total = natline.agg((F.sum("val").cast("double") * 0.001).alias("_cut"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("_sum").cast("double") > F.col("_cut"))
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.round(F.col("_sum"), 2).cast("double").alias("value"),
        )
    )


# ---------------------------------------------------------------------------
# q16 — part/supplier relationship: distinct-supplier counts per part
# attribute triple, excluding one brand, two types, and flagged suppliers
# (NOT IN → broadcast anti-join).
# ---------------------------------------------------------------------------


@q(
    "tpch_q16_parts_supplier_relationship",
    """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#9'
      AND p_type NOT IN ('PROMO', 'ECONOMY')
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16(spark, sf_dir):
    """How many suppliers can deliver each (brand, type, size) — the
    part↔supplier relation is the distinct (partkey, suppkey) projection of
    lineitem.  The complaint-supplier NOT IN becomes a broadcast left-anti
    join (none of the excluded keys are null, so anti-join semantics
    match); part filters push into the broadcast dim.  Two shuffles: the
    distinct-pair aggregate and the final distinct count."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9")
        & (~F.col("p_type").isin("PROMO", "ECONOMY"))
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    )
    bad = (
        read_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# q20 — dominant suppliers: nested semi-joins with a fractional-share
# threshold (shipped share stands in for availqty > 0.5 * sold).
# ---------------------------------------------------------------------------


@q(
    "tpch_q20_dominant_suppliers",
    """
    WITH shipped AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      GROUP BY l_partkey, l_suppkey
    ), tot AS (
      SELECT l_partkey AS t_partkey, sum(qty) AS total_qty
      FROM shipped GROUP BY l_partkey
    ), dominant AS (
      SELECT l_partkey, l_suppkey FROM shipped JOIN tot ON l_partkey = t_partkey
      WHERE qty > 0.3 * total_qty
    )
    SELECT s_name, s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_5'
      AND s_suppkey IN (SELECT l_suppkey FROM dominant
                        JOIN part ON p_partkey = l_partkey
                        WHERE p_name LIKE 'small%')
    ORDER BY s_name
    """,
)
def tpch_q20(spark, sf_dir):
    """NATION_5 suppliers who shipped >30% of some small part's 1996
    volume.  The per-pair and per-part quantities are both exact (integral
    doubles), so the share threshold can't flip on summation order.  The
    totals join reuses the shipped aggregate's partitioning (same key
    prefix); part and the dominant-supplier key set broadcast into the
    supplier semi-join."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01").cast("date"))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("qty"))
    tot = shipped.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("qty").alias("total_qty")
    )
    p = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    dominant_keys = (
        shipped.join(tot, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("qty") > 0.3 * F.col("total_qty"))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .select("l_suppkey")
        .distinct()
    )
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .join(
            F.broadcast(dominant_keys),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
