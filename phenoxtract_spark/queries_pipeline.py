"""Oracle-checked queries for the pipeline/collection layer: G8
interpretation assembly, G1/G3 individual collection, X2 bidict priority
lookup, G11 resource dedup, C10 timestamp parse, and the full EP3 pipeline
(rows-only — JSON text layout is engine-specific)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators import interpret, ontology
from .queries_core import q, read_table


@q(
    "g8_variant_classification",
    """
    SELECT o_orderkey,
           CASE
             WHEN o_orderkey % 4 = 0 AND o_orderkey % 2 != 0 THEN 'NONE'
             WHEN o_orderkey % 4 = 0 THEN 'CAUSATIVE_GENE'
             WHEN o_orderkey % 4 = 1 THEN 'SINGLE'
             WHEN o_orderkey % 4 = 2 THEN 'HOMOZYGOUS'
             ELSE 'COMPOUND_HET'
           END AS status
    FROM orders
    """,
)
def g8_classify(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders")
    genes = F.when(F.col("o_orderkey") % 2 == 0, F.array(F.lit("BRCA1"))).otherwise(
        F.array().cast("array<string>")
    )
    variants = (
        F.when(F.col("o_orderkey") % 4 == 0, F.array().cast("array<string>"))
        .when(F.col("o_orderkey") % 4 == 1, F.array(F.lit("v1")))
        .when(F.col("o_orderkey") % 4 == 2, F.array(F.lit("v1"), F.lit("v1")))
        .otherwise(F.array(F.lit("v1"), F.lit("v2")))
    )
    return o.select(
        "o_orderkey", interpret.classify_gene_variant(genes, variants).alias("status")
    )


@q(
    "g8_interpretation_assembly",
    """
    SELECT CAST(o_custkey AS VARCHAR) AS subject_id,
           'MONDO:000000' || (o_custkey % 3) AS disease_id,
           CAST(o_custkey AS VARCHAR) || '-MONDO:000000' || (o_custkey % 3)
             AS interpretation_id,
           count(*) AS n_genomic
    FROM orders
    GROUP BY o_custkey, o_custkey % 3
    """,
)
def g8_assembly(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders")
    rows = o.select(
        "o_custkey",
        F.concat(F.lit("MONDO:000000"), (F.col("o_custkey") % 3)).alias("disease"),
        F.array(F.lit("BRCA1")).alias("genes"),
        F.array(F.lit("v1")).alias("variants"),
    )
    out = interpret.assemble_interpretations(rows, "o_custkey", "disease", "genes", "variants")
    return out.select(
        "subject_id",
        "disease_id",
        "interpretation_id",
        F.size("genomic_interpretations").cast("bigint").alias("n_genomic"),
    )


@q(
    "g1_collect_individual",
    """
    SELECT CAST(c_custkey AS VARCHAR) AS subject_id,
           CASE WHEN c_custkey % 2 = 0 THEN 'm' ELSE 'woman' END AS sex,
           CASE WHEN EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
                THEN 'yes' END AS vital_status
    FROM customer
    """,
)
def g1_individual(spark, sf_dir):
    from .descriptors import Context, ContextKind, ContextualizedDataFrame, Identifier, SeriesContext, TableContext
    from .plans import collectors

    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("string").alias("sid"),
        F.when(F.col("c_custkey") % 2 == 0, "m").otherwise("woman").alias("sex"),
    )
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("string").alias("sid"), F.lit("yes").alias("vital")
    )

    def ctx(name, cols):
        return TableContext(
            name=name,
            series_contexts=[
                SeriesContext(identifier=Identifier.of(col), data_context=Context(kind))
                for col, kind in cols
            ],
        )

    cdfs = [
        ContextualizedDataFrame(
            df=c, context=ctx("demo", [("sid", ContextKind.SUBJECT_ID), ("sex", ContextKind.SUBJECT_SEX)])
        ),
        ContextualizedDataFrame(
            df=o, context=ctx("visits", [("sid", ContextKind.SUBJECT_ID), ("vital", ContextKind.VITAL_STATUS)])
        ),
    ]
    out = collectors.collect_individual(cdfs)
    return out.select("subject_id", "sex", "vital_status")


@q(
    "x2_bidict_priority_lookup",
    """
    SELECT c_custkey,
           CASE WHEN c_nationkey < 13 THEN 'NAT:' || c_nationkey
                ELSE 'ALT:' || c_nationkey END AS term_id
    FROM customer
    """,
)
def x2_priority(spark, sf_dir):
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    dim1 = n.filter(F.col("n_nationkey") < 13).select(
        F.lower("n_name").alias("key"),
        F.concat(F.lit("NAT:"), F.col("n_nationkey")).alias("id"),
        F.col("n_name").alias("label"),
        F.lit("label").alias("kind"),
        F.lit("nat").alias("resource"),
    )
    dim2 = n.select(
        F.lower("n_name").alias("key"),
        F.concat(F.lit("ALT:"), F.col("n_nationkey")).alias("id"),
        F.col("n_name").alias("label"),
        F.lit("label").alias("kind"),
        F.lit("alt").alias("resource"),
    )
    lib = ontology.bidict_library([dim1, dim2])
    fact = c.join(n, c.c_nationkey == n.n_nationkey).select(
        "c_custkey", F.col("n_name").alias("term")
    )
    out = ontology.lookup_first_hit(fact, "term", lib)
    return out.select("c_custkey", F.col("term_id"))


@q(
    "g11_resource_prefixes",
    """
    SELECT DISTINCT CASE WHEN doc_id % 2 = 0 THEN 'hp' ELSE 'mondo' END AS prefix
    FROM documents
    """,
)
def g11_prefixes(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents")
    fact = d.select(
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit("HP:"), F.lpad((F.col("doc_id") % 50).cast("string"), 7, "0")),
        )
        .otherwise(
            F.concat(F.lit("MONDO:"), F.lpad((F.col("doc_id") % 97).cast("string"), 7, "0"))
        )
        .alias("curie")
    )
    return ontology.distinct_resources_used(fact, "curie")


@q(
    "g13_medical_actions",
    """
    SELECT * FROM (
      SELECT CAST(o_custkey AS VARCHAR) AS subject_id,
             'procedure' AS kind,
             'NCIT:C' || CAST(o_orderkey % 20 AS VARCHAR) AS code,
             CASE WHEN o_orderkey % 2 = 0
                  THEN 'UBERON:' || CAST(o_orderkey % 8 AS VARCHAR) END AS detail,
             CAST(NULL AS DOUBLE) AS dose_value,
             CAST(NULL AS VARCHAR) AS dose_unit,
             CASE WHEN o_orderkey % 4 = 0 THEN 'MONDO:0000001' END AS target
      FROM orders WHERE o_orderkey % 5 != 0
      UNION ALL
      SELECT CAST(o_custkey AS VARCHAR),
             'treatment',
             'CHEBI:' || CAST(o_orderkey % 50 AS VARCHAR),
             CASE WHEN o_orderkey % 3 = 0
                  THEN 'NCIT:C' || CAST(o_orderkey % 5 AS VARCHAR) END,
             ROUND(CAST(o_orderkey % 90 AS DOUBLE) / 3.0, 6),
             'UO:0000022',
             CASE WHEN o_orderkey % 4 = 0 THEN 'MONDO:0000001' END
      FROM orders WHERE o_orderkey % 7 != 0
    )
    """,
)
def g13_medical_actions(spark, sf_dir):
    """G13 medical-action collectors (~ medical_procedure_collector.rs:96-135,
    medical_treatment_collector.rs:106-152): synthesize a procedure table and
    a treatment table from ``orders``, run both collectors (row-zip of linked
    building-block columns, null-anchor rows skipped), and emit the unified
    long form."""
    from .descriptors import (
        Context,
        ContextKind,
        ContextualizedDataFrame,
        Identifier,
        SeriesContext,
        TableContext,
    )
    from .plans import collectors

    o = read_table(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    proc = o.select(
        F.col("o_custkey").cast("string").alias("sid"),
        F.when(key % 5 != 0, F.concat(F.lit("NCIT:C"), (key % 20))).alias("proc"),
        F.when(key % 2 == 0, F.concat(F.lit("UBERON:"), (key % 8))).alias("site"),
        F.when(key % 4 == 0, F.lit("MONDO:0000001")).alias("ptarget"),
    )
    treat = o.select(
        F.col("o_custkey").cast("string").alias("sid"),
        F.when(key % 7 != 0, F.concat(F.lit("CHEBI:"), (key % 50))).alias("agent"),
        F.when((key % 7 != 0) & (key % 3 == 0), F.concat(F.lit("NCIT:C"), (key % 5))).alias("route"),
        F.when(key % 7 != 0, F.round((key % 90).cast("double") / 3.0, 6)).alias("dval"),
        F.when(key % 7 != 0, F.lit("UO:0000022")).alias("dunit"),
        F.when((key % 7 != 0) & (key % 4 == 0), F.lit("MONDO:0000001")).alias("target"),
    )

    def sc(col, kind, block=None):
        return SeriesContext(
            identifier=Identifier.of(col), data_context=Context(kind), building_block_id=block
        )

    proc_cdf = ContextualizedDataFrame(
        df=proc,
        context=TableContext(
            name="procedures",
            series_contexts=[
                sc("sid", ContextKind.SUBJECT_ID),
                sc("proc", ContextKind.PROCEDURE, "b1"),
                sc("site", ContextKind.PROCEDURE_BODY_SITE, "b1"),
                sc("ptarget", ContextKind.TREATMENT_TARGET, "b1"),
            ],
        ),
    )
    treat_cdf = ContextualizedDataFrame(
        df=treat,
        context=TableContext(
            name="treatments",
            series_contexts=[
                sc("sid", ContextKind.SUBJECT_ID),
                sc("agent", ContextKind.TREATMENT_AGENT, "b1"),
                sc("route", ContextKind.ROUTE_OF_ADMINISTRATION, "b1"),
                sc("dval", ContextKind.QUANTITY_VALUE, "b1"),
                sc("dunit", ContextKind.QUANTITY_UNIT, "b1"),
                sc("target", ContextKind.TREATMENT_TARGET, "b1"),
            ],
        ),
    )
    p_long = collectors.collect_medical_procedures([proc_cdf])
    t_long = collectors.collect_medical_treatments([treat_cdf])
    return p_long.select(
        "subject_id",
        F.lit("procedure").alias("kind"),
        F.col("procedure_code").alias("code"),
        F.col("body_site").alias("detail"),
        F.lit(None).cast("double").alias("dose_value"),
        F.lit(None).cast("string").alias("dose_unit"),
        F.col("treatment_target").alias("target"),
    ).unionByName(
        t_long.select(
            "subject_id",
            F.lit("treatment").alias("kind"),
            F.col("agent").alias("code"),
            F.col("route_of_administration").alias("detail"),
            "dose_value",
            "dose_unit",
            F.col("treatment_target").alias("target"),
        )
    )


@q(
    "c10_timestamp_parse",
    """
    SELECT event_id,
           CAST(epoch_us(date_trunc('second', CAST(ts AS TIMESTAMP))) // 1000000
                AS BIGINT) AS epoch_sec
    FROM events
    """,
)
def c10_timestamp(spark, sf_dir):
    from .functions.durations import timestamp_seconds_expr

    e = read_table(spark, sf_dir, "events")
    formatted = F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
    return e.select("event_id", timestamp_seconds_expr(formatted).alias("epoch_sec"))


@q(
    "pipeline_e2e_packets",
    """
    SELECT CAST(c_custkey AS VARCHAR) AS subject_id,
           CAST(to_json(struct_pack(
             id := 'TPCH-' || CAST(c_custkey AS VARCHAR),
             subject := struct_pack(
               subject_id := CAST(c_custkey AS VARCHAR),
               sex := CASE WHEN c_custkey % 2 = 0 THEN 'MALE' ELSE 'FEMALE' END,
               date_of_birth := CAST(NULL AS VARCHAR),
               vital_status := CAST(NULL AS VARCHAR),
               time_at_last_encounter := 'P' || CAST(c_custkey % 100 AS VARCHAR) || 'Y',
               time_of_death := CAST(NULL AS VARCHAR),
               cause_of_death := CAST(NULL AS VARCHAR),
               survival_time_days := CAST(NULL AS VARCHAR)),
             meta_data := struct_pack(
               created_by := 'phenoxtract-spark',
               phenopacket_schema_version := '2.0',
               resources := CAST([] AS VARCHAR[])))) AS VARCHAR) AS packet_json
    FROM customer
    """,
)
def pipeline_e2e(spark, sf_dir):
    from .descriptors import (
        Context,
        ContextKind,
        ContextualizedDataFrame,
        Identifier,
        SeriesContext,
        TableContext,
        TimeElementType,
    )
    from .operators import mapping
    from .plans.pipeline import Pipeline
    from .plans.strategies import AgeToIso8601Strategy, MappingStrategy

    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("string").alias("sid"),
        F.when(F.col("c_custkey") % 2 == 0, "m").otherwise("female").alias("sex"),
        (F.col("c_custkey") % 100).cast("string").alias("age"),
    )
    ctx = TableContext(
        name="cohort",
        series_contexts=[
            SeriesContext(identifier=Identifier.of("sid"), data_context=Context(ContextKind.SUBJECT_ID)),
            SeriesContext(identifier=Identifier.of("sex"), data_context=Context(ContextKind.SUBJECT_SEX)),
            SeriesContext(
                identifier=Identifier.of("age"),
                data_context=Context(ContextKind.TIME_AT_LAST_ENCOUNTER, time_type=TimeElementType.AGE),
            ),
        ],
    )
    pipe = Pipeline(cohort="TPCH")
    pipe.add_strategy(MappingStrategy(spark, ContextKind.SUBJECT_SEX, mapping.SEX_MAP))
    pipe.add_strategy(AgeToIso8601Strategy())
    # canonical (null-explicit) serialization: byte-comparable with the
    # DuckDB struct_pack/to_json oracle
    from .operators import packet as packet_ops

    cdfs = pipe.transform(pipe.preprocess([ContextualizedDataFrame(df=c, context=ctx)]))
    return packet_ops.packets_to_json(pipe.collect(cdfs), ignore_null_fields=False)
