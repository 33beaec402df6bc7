"""Oracle-checked queries for the remaining §2.3 scalar operators:
C4 strict cast, C6 int-via-float, C11 time-element union, C16 punctuation
strip, C9 ISO-duration predicate."""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions import casting, durations
from .functions.text import strip_punct
from .queries_core import q, read_table


@q(
    "c4_specific_cast",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) AS qty_double,
           CAST(l_quantity AS BIGINT) AS qty_bigint
    FROM lineitem
    """,
)
def c4_specific(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    qty_str = F.col("l_quantity").cast("string")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        casting.specific_cast_expr(qty_str, "double").alias("qty_double"),
        casting.specific_cast_expr(qty_str, "bigint").alias("qty_bigint"),
    )


@q(
    "c6_int_via_float",
    """
    SELECT o_orderkey,
           CASE WHEN CAST(CAST(o_totalprice AS VARCHAR) AS DOUBLE)
                     = floor(CAST(CAST(o_totalprice AS VARCHAR) AS DOUBLE))
                THEN CAST(CAST(CAST(o_totalprice AS VARCHAR) AS DOUBLE) AS BIGINT)
           END AS price_int,
           CAST(o_orderkey AS BIGINT) AS key_int
    FROM orders
    """,
)
def c6_int(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        casting.parse_int_via_float(F.col("o_totalprice").cast("string")).alias("price_int"),
        casting.parse_int_via_float(
            F.concat(F.col("o_orderkey").cast("string"), F.lit(".0"))
        ).alias("key_int"),
    )


@q(
    "c9_c11_time_element",
    """
    SELECT c_custkey,
           (c_custkey % 3 = 0) AS is_duration,
           CASE WHEN c_custkey % 3 = 0 THEN 'P' || (c_custkey % 90) || 'Y' END AS age_iso,
           CASE WHEN c_custkey % 3 != 0
                THEN CAST(epoch_us(TIMESTAMP '2020-06-01 00:00:00') // 1000000 AS BIGINT)
           END AS ts_epoch
    FROM customer
    """,
)
def c11_time_element(spark, sf_dir):
    """C11 tagged union flattened for the oracle: ISO durations route to the
    age branch, parseable datetimes to the timestamp branch."""
    c = read_table(spark, sf_dir, "customer")
    raw = F.when(
        F.col("c_custkey") % 3 == 0,
        F.concat(F.lit("P"), (F.col("c_custkey") % 90).cast("string"), F.lit("Y")),
    ).otherwise(F.lit("2020-06-01 00:00:00"))
    te = durations.time_element_expr(raw)
    return c.select(
        "c_custkey",
        durations.is_iso8601_duration(raw).alias("is_duration"),
        te["age"]["iso8601duration"].alias("age_iso"),
        F.unix_timestamp(te["timestamp"]).alias("ts_epoch"),
    )


@q(
    "c16_strip_punct",
    """
    SELECT doc_id,
           regexp_replace('a.b,c;' || substr(text, 1, 20), '[!-/:-@\\[-`{-~]', '', 'g')
             AS cleaned
    FROM documents
    """,
)
def c16_punct(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents")
    noisy = F.concat(F.lit("a.b,c;"), F.substring("text", 1, 20))
    return d.select("doc_id", strip_punct(noisy).alias("cleaned"))
