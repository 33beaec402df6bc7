"""Oracle-checked queries for the reference-derived operators (SURVEY §2).

Each entry: name → (spark_fn, duckdb_sql).  The Spark side exercises the
engine's operator implementations; the SQL is the independent DuckDB oracle.
Column names and value semantics are aligned exactly (both sides round
doubles in-query; dates/timestamps cast identically).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import casting, cleaning, durations, text as textf
from .operators import grouping, mapping, pivoting


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # defensive: the driver's session may not carry our confs — nanos-long
    # parquet decode, and UTC so epoch extraction / tz-less datetime parsing
    # is machine-timezone-independent (the oracle computes epochs in UTC)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        from .session import normalize_events

        df = normalize_events(df)
    return df


def table_num_rows(sf_dir: str, name: str) -> int:
    """Exact row count of a base table from the parquet footer metadata —
    a statistics lookup, zero data scanned (r12, guide §1.2 step 1: the
    IVF-stride queries each ran an eager full-scan ``count()`` job before
    their real plan; at 100 TB this number comes from catalog statistics,
    never a re-scan).  Only valid for the RAW table — any filter or
    projection invalidates the footer count."""
    import pyarrow.parquet as _pq

    return _pq.ParquetFile(
        os.path.join(sf_dir, f"{name}.parquet")
    ).metadata.num_rows


QUERIES: dict[str, tuple] = {}

# ---------------------------------------------------------------------------
# Single-task ledger (r10 verdict #3): the registry deliberately keeps a few
# queries whose plans contain a data-sized single-task shape — each is either
# a documented small-data BASELINE whose scale-safe twin is also registered
# (SCALE_TWINS), or a shape that is bounded/deliberate for a stated reason
# (SINGLE_TASK_PINS).  tests/test_scale_twins.py re-derives the flagged set
# from every registered query's physical plan and asserts it equals
# SCALE_TWINS ∪ SINGLE_TASK_PINS exactly — a future query with an unpaired
# global window/sort or an exact-percentile buffer cannot ship unlisted, and
# a stale ledger entry cannot linger after the query is fixed.
# ---------------------------------------------------------------------------

SCALE_TWINS: dict[str, str] = {
    # baseline (single-task, oracle-shaped)  ->  scale-safe twin
    "analytics_rfm_segments": "analytics_rfm_scalable",
    "percentile_exact": "profiling_quantiles_distributed",
    "analytics_mad_outliers": "profiling_mad_outliers",
    # grouped percentile buffers (5 per-priority single-task buffers) ->
    # the partition_cols rank-selection spine
    "analytics_fulfillment_lag": "profiling_quantiles_grouped",
}

SINGLE_TASK_PINS: dict[str, str] = {
    # --- sweep spine: the across-bucket offsets window is <= 2^bits rows by
    # construction; its dim-boundedness is plan-pinned in test_plan_shapes
    "analytics_rank_sum_test": "sweep offsets dim window (<=2^bits rows)",
    "analytics_kruskal_wallis": "sweep offsets dim window (<=2^bits rows)",
    "profiling_quantiles_distributed": "sweep offsets dim window (<=2^bits rows)",
    # r13: the scale audit now follows localCheckpoint parents (r12
    # verdict item 5), so the sweep offsets windows that execute INSIDE
    # eager checkpoints are back on the ledger — same <=2^bits
    # dim-boundedness as the rest of the spine
    "profiling_gini_concentration": "sweep offsets dim window (<=2^bits "
                                    "rows), inside the prefix-sum "
                                    "checkpoint (r13 pre-ckpt audit)",
    "analytics_rfm_scalable": "sweep offsets dim windows (<=2^bits rows "
                              "per pass), inside the offsets "
                              "checkpoints (r13 pre-ckpt audit)",
    "curation_pps_sample": "sweep offsets dim window (<=2^bits rows), "
                           "inside the offsets checkpoint (r13 "
                           "pre-ckpt audit)",
    "profiling_mad_outliers": "sweep offsets dim window (<=2^bits rows)",
    "profiling_histogram_equidepth": "sweep offsets dim window (<=2^bits rows)",
    # --- other bounded unpartitioned windows (audited r10, re-audited r11)
    "sketch_histogram_quantiles": "CDF window over <=2^bits histogram bins",
    "curation_dsir_select": "window over the bounded importance-grid dim "
                            "(operators/curation.py)",
    "curation_pareto_frontier": "bucket recurrence over the <=2^bits "
                                "distinct-quality grid",
    "text_bm25_topk": "rank window over the post-limit(k) top-k relation "
                      "(operators/textanalysis.py)",
    "events_survival_hazard": "window over the study-day dim (<= #days rows)",
    "events_slo_burn": "window over the day/hour dim (<= #hours rows)",
    # --- deliberate exact-percentile users
    "approx_aggregates": "exact-vs-approx percentile comparison IS the "
                         "query's subject; the approx side is the scale path",
    "analytics_winsorized_stats": "per-flag exact p05/p95 thresholds; "
                                  "docstring documents the "
                                  "sketch_histogram_quantiles swap at scale",
    "events_purchase_intervals": "global gap percentiles; the quantile spine "
                                 "is the registered scale path for exact "
                                 "ranks",
    "events_bot_detection": "percentile grouped by user_id — per-group "
                            "buffers bounded by one user's events "
                            "(distributed; detector over-approximates)",
    # --- result-sized global sorts
    "quality_constraints": "final orderBy over the <=#checks-row report",
    "tpch_q20_dominant_suppliers": "TPC-H-specified ORDER BY s_name over "
                                   "the qualifying-supplier result",
}


def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = (fn, sql)
        return fn

    return deco


# ---------------------------------------------------------------------------
# §2.3 casting / scalar functions
# ---------------------------------------------------------------------------


@q(
    "c1_trim_empty_to_null",
    """
    SELECT c_custkey,
           nullif(trim('  ' || c_name || '  '), '') AS cleaned,
           nullif(trim('   '), '') AS empty_is_null
    FROM customer
    """,
)
def c1_trim(spark, sf_dir):
    cust = read_table(spark, sf_dir, "customer")
    padded = F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))
    return cust.select(
        "c_custkey",
        cleaning.trim_empty_to_null(padded).alias("cleaned"),
        cleaning.trim_empty_to_null(F.lit("   ")).alias("empty_is_null"),
    )


@q(
    "c2_integral_promotion",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN (SELECT bool_and(l_quantity = floor(l_quantity)) FROM lineitem)
                THEN CAST(l_quantity AS BIGINT) END AS qty_promoted
    FROM lineitem
    """,
)
def c2_integral(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    stats = casting.castability_stats(li, ["l_quantity"])
    st = stats["l_quantity"]
    promote = st.get("n", 0) > 0 and st.get("int") == st.get("n")
    expr = (
        F.col("l_quantity").cast("bigint")
        if promote
        else F.lit(None).cast("bigint")
    )
    return li.select("l_orderkey", "l_linenumber", expr.alias("qty_promoted"))


@q(
    "c3_ambivalent_cast",
    """
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS VARCHAR) AS DOUBLE) AS price_cast,
           CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE) AS date_cast,
           CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS int_cast,
           (o_orderstatus = 'O') AS bool_cast
    FROM orders
    """,
)
def c3_ambivalent(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders")
    raw = o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("string").alias("price_cast"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("date_cast"),
        F.col("o_orderkey").cast("string").alias("int_cast"),
        F.when(F.col("o_orderstatus") == "O", "true").otherwise("false").alias("bool_cast"),
    )
    return casting.ambivalent_cast(
        raw,
        ["price_cast", "date_cast", "int_cast", "bool_cast"],
        sample_fraction=0.1,
    )


@q(
    "c5_bool_parse",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_returnflag = 'R' THEN true
                WHEN l_returnflag = 'A' THEN false END AS parsed
    FROM lineitem
    """,
)
def c5_bool(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    raw = F.when(F.col("l_returnflag") == "R", "TRUE").when(
        F.col("l_returnflag") == "A", "false"
    )
    return li.select("l_orderkey", "l_linenumber", casting.parse_bool(raw).alias("parsed"))


@q(
    "c7_multiformat_date",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 4 = 3
                THEN make_date(CAST(date_part('year', o_orderdate) AS INT), 1, 1)
                ELSE CAST(o_orderdate AS DATE) END AS parsed
    FROM orders
    """,
)
def c7_dates(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    formatted = (
        F.when(F.col("o_orderkey") % 4 == 0, F.date_format(d, "yyyy-MM-dd"))
        .when(F.col("o_orderkey") % 4 == 1, F.date_format(d, "dd.MM.yyyy"))
        .when(F.col("o_orderkey") % 4 == 2, F.date_format(d, "MM/dd/yyyy"))
        .otherwise(F.date_format(d, "yyyy"))
    )
    return o.select("o_orderkey", casting.parse_date_multi(formatted).alias("parsed"))


@q(
    "c13_age_to_iso",
    """
    SELECT c_custkey,
           'P' || (c_custkey % 120) || 'Y' AS iso1,
           CASE WHEN c_custkey % 200 <= 150 THEN 'P' || (c_custkey % 200) || 'Y' END AS iso2,
           'P3M' AS passthrough
    FROM customer
    """,
)
def c13_age(spark, sf_dir):
    c = read_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        durations.age_years_to_iso((F.col("c_custkey") % 120).cast("string")).alias("iso1"),
        durations.age_years_to_iso((F.col("c_custkey") % 200).cast("string")).alias("iso2"),
        durations.age_years_to_iso(F.lit("P3M")).alias("passthrough"),
    )


@q(
    "c14_date_diff_iso",
    """
    WITH j AS (
      SELECT l.l_orderkey, l.l_linenumber,
             CAST(o.o_orderdate AS DATE) AS s, CAST(l.l_shipdate AS DATE) AS e
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), m AS (
      SELECT *, (date_part('year', e) - date_part('year', s)) * 12
                + (date_part('month', e) - date_part('month', s)) AS raw
      FROM j
    ), b AS (
      SELECT *, CASE WHEN CAST(s + to_months(CAST(raw AS INT)) AS DATE) > e
                     THEN raw - 1 ELSE raw END AS bm
      FROM m
    ), p AS (
      SELECT l_orderkey, l_linenumber, s, e,
             CAST(bm // 12 AS INT) AS y, CAST(bm % 12 AS INT) AS mo,
             e - CAST(s + to_months(CAST(bm AS INT)) AS DATE) AS d
      FROM b
    )
    SELECT l_orderkey, l_linenumber,
           CASE WHEN s IS NULL OR e IS NULL OR e < s THEN NULL
                WHEN e = s THEN 'P0Y'
                WHEN y = 0 AND mo = 0 AND d = 0 THEN 'P0Y'
                ELSE 'P' || CASE WHEN y > 0 THEN y || 'Y' ELSE '' END
                        || CASE WHEN mo > 0 THEN mo || 'M' ELSE '' END
                        || CASE WHEN d > 0 THEN d || 'D' ELSE '' END
           END AS age_iso
    FROM p
    """,
)
def c14_datediff(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_linenumber", "o_orderdate", "l_shipdate"
    )
    return durations.with_date_diff_iso(
        j, F.col("o_orderdate"), F.col("l_shipdate"), out="age_iso"
    ).select("l_orderkey", "l_linenumber", "age_iso")


@q(
    "c17_prefixed_id",
    """
    SELECT c_custkey, 'COHORT-' || c_custkey AS packet_id FROM customer
    """,
)
def c17_prefix(spark, sf_dir):
    c = read_table(spark, sf_dir, "customer")
    # half the values arrive already prefixed — both paths must converge
    value = F.when(
        F.col("c_custkey") % 2 == 0, F.concat(F.lit("COHORT-"), F.col("c_custkey"))
    ).otherwise(F.col("c_custkey").cast("string"))
    return c.select(
        "c_custkey", textf.prefixed_id(F.lit("COHORT"), value).alias("packet_id")
    )


# ---------------------------------------------------------------------------
# §2.4 mapping strategies
# ---------------------------------------------------------------------------


@q(
    "m1_alias_map",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_returnflag = 'A' THEN NULL
                WHEN l_returnflag = 'N' THEN 'NO_RETURN'
                ELSE l_returnflag END AS returnflag_aliased
    FROM lineitem
    """,
)
def m1_alias(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", F.col("l_returnflag").alias("returnflag_aliased")
    )
    out = mapping.apply_alias_map(
        li, "returnflag_aliased", {"N": "NO_RETURN", "A": None}
    )
    return out


@q(
    "m2_synonym_mapping",
    """
    SELECT c_custkey,
           CASE lower(trim(c_mktsegment))
                WHEN 'building' THEN 'BLD' WHEN 'automobile' THEN 'AUTO'
                WHEN 'machinery' THEN 'MCH' WHEN 'household' THEN 'HH'
                WHEN 'furniture' THEN 'FURN' END AS segment_code
    FROM customer
    """,
)
def m2_synonym(spark, sf_dir):
    c = read_table(spark, sf_dir, "customer")
    dim = mapping.mapping_dim(
        spark,
        {
            "building": "BLD",
            "automobile": "AUTO",
            "machinery": "MCH",
            "household": "HH",
            "furniture": "FURN",
        },
    )
    out = mapping.apply_synonym_mapping(
        c, "c_mktsegment", dim, strict=True, out_col="segment_code"
    )
    return out.select("c_custkey", "segment_code")


@q(
    "m3_ontology_normalize",
    """
    SELECT c_custkey, 'NAT:' || c_nationkey AS nation_id FROM customer
    """,
)
def m3_ontology(spark, sf_dir):
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    dim = n.select(
        F.lower(F.col("n_name")).alias("key"),
        F.concat(F.lit("NAT:"), F.col("n_nationkey")).alias("id"),
    )
    # facts arrive as labels (mixed case) or already-CURIE ids
    fact = c.join(n, c.c_nationkey == n.n_nationkey).select(
        "c_custkey",
        F.when(
            F.col("c_custkey") % 10 == 0,
            F.concat(F.lit("NAT:"), F.col("c_nationkey")),
        )
        .otherwise(F.initcap(F.col("n_name")))
        .alias("nation_id"),
    )
    out = mapping.normalize_to_ontology(fact, "nation_id", dim, strict=True)
    return out.select("c_custkey", "nation_id")


@q(
    "m5_membership_split",
    """
    SELECT p_partkey,
           CASE WHEN lower(p_type) IN ('economy','small','medium') THEN p_type END AS type_budget,
           CASE WHEN lower(p_type) NOT IN ('economy','small','medium')
                 AND lower(p_type) IN ('standard','large','promo') THEN p_type END AS type_premium
    FROM part
    """,
)
def m5_split(spark, sf_dir):
    p = read_table(spark, sf_dir, "part")
    budget = mapping.mapping_dim(spark, {k: k for k in ("economy", "small", "medium")})
    premium = mapping.mapping_dim(spark, {k: k for k in ("standard", "large", "promo")})
    out = mapping.split_by_membership(
        p, "p_type", budget, premium, "type_budget", "type_premium"
    )
    return out.select("p_partkey", "type_budget", "type_premium")


@q(
    "m6_multi_id_extraction",
    """
    SELECT DISTINCT doc_id AS subject_id,
           unnest(regexp_extract_all(
             'HP:' || lpad(CAST(doc_id % 50 AS VARCHAR), 7, '0')
               || ' and HP:' || lpad(CAST(doc_id % 97 AS VARCHAR), 7, '0'),
             'HP:[0-9]{7}')) AS hpo_id
    FROM documents
    """,
)
def m6_extract(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents")
    synth = d.select(
        "doc_id",
        F.concat(
            F.lit("HP:"),
            F.lpad((F.col("doc_id") % 50).cast("string"), 7, "0"),
            F.lit(" and HP:"),
            F.lpad((F.col("doc_id") % 97).cast("string"), 7, "0"),
        ).alias("cell"),
    )
    return pivoting.explode_multi_ids(synth, "doc_id", "cell")


# ---------------------------------------------------------------------------
# §2.1/2.2 reshape + projection
# ---------------------------------------------------------------------------


@q(
    "s3_transpose",
    """
    SELECT 'r_regionkey' AS r_name,
           (SELECT CAST(r_regionkey AS VARCHAR) FROM region WHERE r_name='AFRICA') AS "AFRICA",
           (SELECT CAST(r_regionkey AS VARCHAR) FROM region WHERE r_name='AMERICA') AS "AMERICA",
           (SELECT CAST(r_regionkey AS VARCHAR) FROM region WHERE r_name='ASIA') AS "ASIA",
           (SELECT CAST(r_regionkey AS VARCHAR) FROM region WHERE r_name='EUROPE') AS "EUROPE",
           (SELECT CAST(r_regionkey AS VARCHAR) FROM region WHERE r_name='MIDDLE EAST') AS "MIDDLE EAST"
    """,
)
def s3_transpose(spark, sf_dir):
    r = read_table(spark, sf_dir, "region").select("r_name", "r_regionkey")
    return pivoting.transpose(r, header_col="r_name")


@q(
    "s4_unpivot",
    """
    SELECT p_partkey, 'p_brand' AS key, p_brand AS value FROM part
    UNION ALL
    SELECT p_partkey, 'p_type', p_type FROM part
    """,
)
def s4_unpivot(spark, sf_dir):
    p = read_table(spark, sf_dir, "part")
    return pivoting.unpivot_columns(p, ["p_partkey"], ["p_brand", "p_type"])


# ---------------------------------------------------------------------------
# §2.5 grouping / collection
# ---------------------------------------------------------------------------


@q(
    "g2_group_collect",
    """
    SELECT o_custkey AS subject_id,
           string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS order_keys
    FROM orders GROUP BY o_custkey
    """,
)
def g2_collect(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_custkey").alias("subject_id"))
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("o_orderkey")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("order_keys")
        )
    )


@q(
    "g3_single_valued",
    """
    SELECT CAST(o_custkey AS VARCHAR) AS subject_id,
           CASE WHEN count(DISTINCT o_orderpriority) = 1
                THEN min(o_orderpriority) END AS priority
    FROM orders WHERE o_orderpriority IS NOT NULL
    GROUP BY o_custkey
    """,
)
def g3_single(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders")
    return grouping.single_valued(
        [(o, "o_custkey", "o_orderpriority")], alias="priority", strict=False
    )


@q(
    "g5_row_zip",
    """
    SELECT CAST(l_orderkey AS VARCHAR) AS subject_id,
           l_quantity AS value, l_extendedprice AS price, l_discount AS discount
    FROM lineitem WHERE l_quantity IS NOT NULL
    """,
)
def g5_zip(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    z = grouping.row_zip_struct(
        li, "l_orderkey", "l_quantity", {"price": "l_extendedprice", "discount": "l_discount"}
    )
    return z.select("subject_id", "item.value", "item.price", "item.discount")


@q(
    "g6_upsert_last",
    """
    SELECT o_custkey, o_orderkey AS last_orderkey, o_totalprice AS last_price
    FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders) WHERE rn = 1
    """,
)
def g6_upsert(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders")
    last = grouping.upsert_last(
        o, ["o_custkey"], F.struct("o_orderdate", "o_orderkey"),
        value_cols=["o_orderkey", "o_totalprice"],
    )
    return last.select(
        "o_custkey",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_totalprice").alias("last_price"),
    )


@q(
    "g7_header_collapse",
    """
    SELECT CAST(c_custkey AS VARCHAR) AS subject_id, 'HP:0000001' AS hpo_id,
           (c_custkey % 2 = 0) AS observed, NOT (c_custkey % 2 = 0) AS excluded,
           CAST(NULL AS VARCHAR) AS onset
    FROM customer
    UNION ALL
    SELECT CAST(c_custkey AS VARCHAR), 'HP:0000002',
           (c_custkey % 3 = 0), NOT (c_custkey % 3 = 0), NULL
    FROM customer
    """,
)
def g7_collapse(spark, sf_dir):
    c = read_table(spark, sf_dir, "customer")
    obs = c.select(
        "c_custkey",
        (F.col("c_custkey") % 2 == 0).alias("HP:0000001"),
        (F.col("c_custkey") % 3 == 0).alias("HP:0000002"),
    )
    return grouping.header_hpo_collapse(obs, "c_custkey", ["HP:0000001", "HP:0000002"])


@q(
    "g10_packet_flat",
    """
    SELECT CAST(c_custkey AS VARCHAR) AS subject_id, c_name AS name,
           c_mktsegment AS segment, count(o_orderkey) AS n_orders,
           CAST(min(o_orderdate) AS DATE) AS first_order_date,
           CAST(max(o_orderdate) AS DATE) AS last_order_date,
           round(coalesce(sum(o_totalprice), 0), 2) AS total_spend
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name, c_mktsegment
    """,
)
def g10_flat(spark, sf_dir):
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(
            F.col("c_custkey").cast("string").alias("subject_id"),
            F.col("c_name").alias("name"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.min(F.col("o_orderdate").cast("date")).alias("first_order_date"),
            F.max(F.col("o_orderdate").cast("date")).alias("last_order_date"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


@q(
    "g10_packet_json",
    """
    WITH items AS (
      SELECT CAST(o_custkey AS VARCHAR) AS subject_id,
             list(struct_pack(
                    id := o_orderkey,
                    status := o_orderstatus,
                    total := o_totalprice,
                    "date" := CAST(CAST(o_orderdate AS DATE) AS VARCHAR))
                  ORDER BY o_orderkey) AS orders
      FROM orders GROUP BY 1
    ), subj AS (
      SELECT CAST(c_custkey AS VARCHAR) AS subject_id, c_name AS name,
             c_mktsegment AS segment
      FROM customer
    )
    SELECT s.subject_id,
           CAST(to_json(struct_pack(
             id := s.subject_id,
             subject := struct_pack(subject_id := s.subject_id,
                                    name := s.name, segment := s.segment),
             orders := coalesce(i.orders, []),
             meta_data := struct_pack(
               created_by := 'phenoxtract-spark',
               phenopacket_schema_version := '2.0',
               resources := CAST([] AS VARCHAR[])))) AS VARCHAR) AS packet_json
    FROM subj s LEFT JOIN items i USING (subject_id)
    """,
)
def g10_json(spark, sf_dir):
    """Nested packet → canonical JSON text, value-checked: the oracle
    rebuilds the identical JSON with DuckDB struct_pack/to_json (both
    engines render minified JSON with struct-field key order, explicit
    nulls, and shortest-round-trip doubles)."""
    from .operators import packet

    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    items = o.select(
        F.col("o_custkey").cast("string").alias("subject_id"),
        F.struct(
            F.col("o_orderkey").alias("id"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("total"),
            F.col("o_orderdate").cast("date").cast("string").alias("date"),
        ).alias("item"),
    )
    sec = items.groupBy("subject_id").agg(
        F.sort_array(F.collect_list("item")).alias("orders")
    )
    subjects = c.select(
        F.col("c_custkey").cast("string").alias("subject_id"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
    )
    pk = packet.assemble_packets(subjects, {"orders": sec})
    return packet.packets_to_json(pk, ignore_null_fields=False)
