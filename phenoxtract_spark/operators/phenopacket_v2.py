"""GA4GH Phenopacket v2 rendering (SURVEY §2.5 G10 faithful mode).

The flat packet of :mod:`packet` is the engine's scale-native output; this
module renders the spec-shaped Phenopacket v2 JSON the reference emits
(~ phenopacket_builder.rs:36-61,609-702 + load/file_system_loader.rs),
byte-comparable (after volatile-field normalization) with the reference's
expected fixtures.

Everything is DataFrame-native: label lookups are broadcast dimension
joins, sections aggregate in ARRIVAL order (the builder's insertion-ordered
vectors), and the final packet is one nested ``F.struct`` → ``to_json``
with null/empty fields omitted — one shuffle per section + one per-subject
assembly join, no driver-side packet building.

Dimensions (all broadcast, offline by design — X3-X5 pre-resolve pattern):
- ``labels_dim``  (id, label): ontology class labels (HP/MONDO/UO/PATO/LOINC)
- ``hgnc_dim``    (symbol, hgnc_id)
- ``hgvs_dim``    (hgvs, expressions array<struct<syntax,value>>,
                   vcf struct<genome_assembly,chrom,pos,ref,alt>)
- ``resources``   ordered list of metaData resource records
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.casting import parse_datetime_multi
from ..functions.durations import is_iso8601_duration
from ..plans import collectors

SCHEMA_VERSION = "2.0"
_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"


def _ts_str(col: Column) -> Column:
    return F.date_format(parse_datetime_multi(col), _TS_FMT)


def time_element_v2(col: Column | str) -> Column:
    """C11 rendered for v2 JSON: ISO durations → {age:{iso8601duration}},
    parseable datetimes → {timestamp: "...Z"}, else null (omitted)."""
    c = (F.col(col) if isinstance(col, str) else col).cast("string")
    ts = _ts_str(c)
    return (
        F.when(
            is_iso8601_duration(c),
            F.struct(
                F.struct(c.alias("iso8601duration")).alias("age"),
                F.lit(None).cast("string").alias("timestamp"),
            ),
        )
        .when(
            ts.isNotNull(),
            F.struct(
                F.lit(None).cast("struct<iso8601duration:string>").alias("age"),
                ts.alias("timestamp"),
            ),
        )
        .otherwise(
            F.lit(None).cast(
                "struct<age:struct<iso8601duration:string>,timestamp:string>"
            )
        )
    )


def _olabel(df: DataFrame, labels_dim: DataFrame, id_col: str, out: str) -> DataFrame:
    """Broadcast label join: id → label (null when unknown)."""
    dim = F.broadcast(
        labels_dim.select(F.col("id").alias(f"_{out}_id"), F.col("label").alias(out))
    )
    return df.join(dim, df[id_col] == dim[f"_{out}_id"], "left").drop(f"_{out}_id")


def _oclass(id_col: str, label_col: str) -> Column:
    return F.struct(F.col(id_col).alias("id"), F.col(label_col).alias("label"))


def _nonempty(col: str) -> Column:
    return F.when(F.size(F.col(col)) > 0, F.col(col))


def _prefix_of(col: Column) -> Column:
    return F.lower(F.split(col, ":")[0])


def _camel(snake: str) -> str:
    head, *rest = snake.split("_")
    return head + "".join(w.capitalize() for w in rest)


def render_packets_v2(
    cdfs: Sequence,
    labels_dim: DataFrame,
    hgnc_dim: Optional[DataFrame] = None,
    hgvs_dim: Optional[DataFrame] = None,
    resources: Optional[list[dict]] = None,
    cohort: Optional[str] = None,
    created_by: str = "phenoxtract-spark",
    submitted_by: Optional[str] = None,
    created: str = "1970-01-01T00:00:00Z",
) -> DataFrame:
    """Render one Phenopacket v2 JSON document per subject.
    Returns (subject_id, packet_json)."""
    spark = labels_dim.sparkSession
    individual = collectors.collect_individual(cdfs)
    prefix_frames: list[DataFrame] = []

    # ---- phenotypicFeatures (cells first, then header-sourced) ------------
    cells = collectors.collect_hpo_in_cells(cdfs)
    headers = collectors.collect_hpo_in_headers(cdfs)
    feat_parts = []
    if cells is not None:
        feat_parts.append(
            cells.select(
                "subject_id",
                F.col("hpo_id"),
                F.col("excluded"),
                F.col("onset"),
                F.struct(F.lit(0).alias("c"), F.col("ord").alias("s")).alias("ord"),
            )
        )
    if headers is not None:
        feat_parts.append(
            headers.filter(F.col("observed").isNotNull()).select(
                "subject_id", "hpo_id", "excluded", "onset",
                F.struct(F.lit(1).alias("c"), F.col("ord").alias("s")).alias("ord"),
            )
        )
    features_sec = None
    if feat_parts:
        feats = feat_parts[0]
        for p in feat_parts[1:]:
            feats = feats.unionByName(p)
        feats = _olabel(feats, labels_dim, "hpo_id", "_lbl")
        item = F.struct(
            _oclass("hpo_id", "_lbl").alias("type"),
            # proto3 default: false is omitted
            F.when(F.col("excluded"), F.lit(True)).alias("excluded"),
            time_element_v2("onset").alias("onset"),
        )
        features_sec = collectors.ordered_section(feats, item, "phenotypicFeatures")
        prefix_frames.append(
            feats.select("subject_id", _prefix_of(F.col("hpo_id")).alias("prefix"))
        )

    # ---- diseases ---------------------------------------------------------
    dis = collectors.collect_diseases(cdfs)
    diseases_sec = None
    if dis is not None:
        dis = _olabel(dis, labels_dim, "disease_id", "_lbl")
        item = F.struct(
            _oclass("disease_id", "_lbl").alias("term"),
            time_element_v2("onset").alias("onset"),
        )
        diseases_sec = collectors.ordered_section(dis, item, "diseases")
        prefix_frames.append(
            dis.select("subject_id", _prefix_of(F.col("disease_id")).alias("prefix"))
        )

    # ---- measurements (quantitative + qualitative, column order) ----------
    quant = collectors.collect_quantitative_measurements(cdfs)
    qual = collectors.collect_qualitative_measurements(cdfs)
    meas_parts = []
    if quant is not None:
        q = _olabel(quant, labels_dim, "assay_id", "_albl")
        q = _olabel(q, labels_dim, "unit", "_ulbl")
        unit_cls = _oclass("unit", "_ulbl")
        ref = F.when(
            F.col("ref_low").isNotNull() | F.col("ref_high").isNotNull(),
            F.struct(
                unit_cls.alias("unit"),
                F.col("ref_low").alias("low"),
                F.col("ref_high").alias("high"),
            ),
        )
        meas_parts.append(
            q.select(
                "subject_id",
                "ord",
                F.struct(
                    _oclass("assay_id", "_albl").alias("assay"),
                    time_element_v2("time_observed").alias("timeObserved"),
                    F.struct(
                        F.struct(
                            unit_cls.alias("unit"),
                            F.col("value").alias("value"),
                            ref.alias("referenceRange"),
                        ).alias("quantity"),
                        F.lit(None)
                        .cast("struct<id:string,label:string>")
                        .alias("ontologyClass"),
                    ).alias("value"),
                ).alias("item"),
                F.array(
                    _prefix_of(F.col("assay_id")), _prefix_of(F.col("unit"))
                ).alias("_prefixes"),
            )
        )
    if qual is not None:
        ql = _olabel(qual, labels_dim, "assay_id", "_albl")
        ql = _olabel(ql, labels_dim, "value_id", "_vlbl")
        meas_parts.append(
            ql.select(
                "subject_id",
                "ord",
                F.struct(
                    _oclass("assay_id", "_albl").alias("assay"),
                    time_element_v2("time_observed").alias("timeObserved"),
                    F.struct(
                        F.lit(None)
                        .cast(
                            "struct<unit:struct<id:string,label:string>,value:double,"
                            "referenceRange:struct<unit:struct<id:string,label:string>,"
                            "low:double,high:double>>"
                        )
                        .alias("quantity"),
                        _oclass("value_id", "_vlbl").alias("ontologyClass"),
                    ).alias("value"),
                ).alias("item"),
                F.array(
                    _prefix_of(F.col("assay_id")), _prefix_of(F.col("value_id"))
                ).alias("_prefixes"),
            )
        )
    meas_sec = None
    if meas_parts:
        m = meas_parts[0]
        for p in meas_parts[1:]:
            m = m.unionByName(p)
        meas_sec = collectors.ordered_section(m, F.col("item"), "measurements")
        prefix_frames.append(
            m.select("subject_id", F.explode("_prefixes").alias("prefix"))
        )

    # ---- interpretations --------------------------------------------------
    interp_sec = None
    irows = collectors.interpretation_rows(cdfs)
    if irows is not None:
        irows = irows.filter(F.col("disease").isNotNull())
        # one genomic interpretation per DISTINCT variant (array order), or a
        # bare gene descriptor when the row has genes but no variants
        # (~ phenopacket_builder.rs:283-362)
        exploded = irows.select(
            "subject_id", "disease", "genes", "variants", "ord",
            F.posexplode_outer(F.array_distinct("variants")).alias("_vp", "_variant"),
        )
        # F.get, not element_at: a block configured with variant columns but
        # no gene columns yields genes = [] and ANSI element_at would throw
        gene_sym = F.get("genes", 0)
        exploded = exploded.withColumn("_gene", gene_sym)
        if hgnc_dim is not None:
            dim = F.broadcast(
                hgnc_dim.select(F.col("symbol").alias("_gene"), F.col("hgnc_id"))
            )
            exploded = exploded.join(dim, "_gene", "left")
        else:
            exploded = exploded.withColumn("_hgnc_id", F.lit(None).cast("string"))
            exploded = exploded.withColumnRenamed("_hgnc_id", "hgnc_id")
        if hgvs_dim is not None:
            vdim = F.broadcast(hgvs_dim.withColumnRenamed("hgvs", "_variant"))
            exploded = exploded.join(vdim, "_variant", "left")
        else:
            exploded = (
                exploded.withColumn(
                    "expressions",
                    F.lit(None).cast("array<struct<syntax:string,value:string>>"),
                )
                .withColumn(
                    "vcf",
                    F.lit(None).cast(
                        "struct<genome_assembly:string,chrom:string,pos:bigint,"
                        "ref:string,alt:string>"
                    ),
                )
            )
        gene_ctx = F.when(
            F.col("_gene").isNotNull(),
            F.struct(F.col("hgnc_id").alias("valueId"), F.col("_gene").alias("symbol")),
        )
        n_copies = F.size(
            F.filter("variants", lambda x: x == F.col("_variant"))
        )
        allelic = F.when(
            n_copies >= 2,
            F.struct(F.lit("GENO:0000136").alias("id"), F.lit("homozygous").alias("label")),
        ).otherwise(
            F.struct(F.lit("GENO:0000135").alias("id"), F.lit("heterozygous").alias("label"))
        )
        vd = F.struct(
            F.concat(F.lit("vd:"), F.md5(F.concat_ws("|", "subject_id", "disease", "_variant"))).alias("id"),
            gene_ctx.alias("geneContext"),
            F.coalesce(
                F.col("expressions"),
                F.array(
                    F.struct(F.lit("hgvs").alias("syntax"), F.col("_variant").alias("value"))
                ),
            ).alias("expressions"),
            F.when(
                F.col("vcf").isNotNull(),
                F.struct(
                    F.col("vcf.genome_assembly").alias("genomeAssembly"),
                    F.col("vcf.chrom").alias("chrom"),
                    F.col("vcf.pos").alias("pos"),
                    F.col("vcf.ref").alias("ref"),
                    F.col("vcf.alt").alias("alt"),
                ),
            ).alias("vcfRecord"),
            F.lit("genomic").alias("moleculeContext"),
            allelic.alias("allelicState"),
        )
        variant_interp = F.struct(
            F.lit("PATHOGENIC").alias("acmgPathogenicityClassification"),
            F.lit("UNKNOWN_ACTIONABILITY").alias("therapeuticActionability"),
            vd.alias("variationDescriptor"),
        )
        gi = F.struct(
            F.col("subject_id").alias("subjectOrBiosampleId"),
            F.lit("UNKNOWN_STATUS").alias("interpretationStatus"),
            F.when(F.col("_variant").isNull(), gene_ctx).alias("gene"),
            F.when(F.col("_variant").isNotNull(), variant_interp).alias(
                "variantInterpretation"
            ),
        )
        gi_rows = exploded.filter(
            F.col("_variant").isNotNull() | F.col("_gene").isNotNull()
        ).select(
            "subject_id",
            "disease",
            F.struct(F.col("ord"), F.coalesce("_vp", F.lit(0)).alias("vp")).alias("_gord"),
            gi.alias("gi"),
        )
        per_disease = (
            gi_rows.select(
                "subject_id", "disease",
                F.struct(F.col("_gord").alias("o"), F.col("gi").alias("x")).alias("_oi"),
            )
            .groupBy("subject_id", "disease")
            .agg(
                F.transform(F.sort_array(F.collect_list("_oi")), lambda p: p["x"]).alias("gis"),
                F.min("_oi.o").alias("_iord"),
            )
        )
        per_disease = _olabel(per_disease, labels_dim, "disease", "_dlbl")
        pid = (
            F.concat_ws("-", F.lit(cohort), F.col("subject_id"))
            if cohort
            else F.col("subject_id")
        )
        interp_item = F.struct(
            F.concat_ws("-", pid, F.col("disease")).alias("id"),
            F.lit("UNKNOWN_PROGRESS").alias("progressStatus"),
            F.struct(
                _oclass("disease", "_dlbl").alias("disease"),
                F.col("gis").alias("genomicInterpretations"),
            ).alias("diagnosis"),
        )
        interp_sec = collectors.ordered_section(
            per_disease, interp_item, "interpretations", ord_col=F.col("_iord")
        )
        prefix_frames.append(
            per_disease.select(
                "subject_id", _prefix_of(F.col("disease")).alias("prefix")
            )
        )
        gi_prefixes = exploded.select(
            "subject_id",
            F.explode(
                F.concat(
                    F.when(F.col("_gene").isNotNull(), F.array(F.lit("hgnc"))).otherwise(
                        F.array().cast("array<string>")
                    ),
                    F.when(F.col("_variant").isNotNull(), F.array(F.lit("geno"))).otherwise(
                        F.array().cast("array<string>")
                    ),
                )
            ).alias("prefix"),
        )
        prefix_frames.append(gi_prefixes)

    # ---- medicalActions (procedures first, then treatments — broker order)
    medact_sec = None
    procs = collectors.collect_medical_procedures(cdfs)
    treats = collectors.collect_medical_treatments(cdfs)
    act_fields = [
        "treatment_target", "treatment_intent",
        "response_to_treatment", "treatment_termination_reason",
    ]
    act_parts = []
    if procs is not None:
        p = _olabel(procs, labels_dim, "procedure_code", "_plbl")
        p = _olabel(p, labels_dim, "body_site", "_blbl")
        for f_ in act_fields:
            p = _olabel(p, labels_dim, f_, f"_{f_}_lbl")
        act_parts.append(
            p.select(
                "subject_id",
                F.struct(F.lit(0).alias("c"), F.col("ord").alias("s")).alias("ord"),
                F.struct(
                    F.struct(
                        _oclass("procedure_code", "_plbl").alias("code"),
                        F.when(
                            F.col("body_site").isNotNull(), _oclass("body_site", "_blbl")
                        ).alias("bodySite"),
                        time_element_v2("performed").alias("performed"),
                    ).alias("procedure"),
                    F.lit(None).cast(
                        "struct<agent:struct<id:string,label:string>,"
                        "routeOfAdministration:struct<id:string,label:string>,"
                        "drugType:string,"
                        "cumulativeDose:struct<unit:struct<id:string,label:string>,value:double>>"
                    ).alias("treatment"),
                    *[
                        F.when(
                            F.col(f_).isNotNull(), _oclass(f_, f"_{f_}_lbl")
                        ).alias(_camel(f_))
                        for f_ in act_fields
                    ],
                ).alias("item"),
                F.array(
                    _prefix_of(F.col("procedure_code")),
                    _prefix_of(F.col("body_site")),
                    *[_prefix_of(F.col(f_)) for f_ in act_fields],
                ).alias("_prefixes"),
            )
        )
    if treats is not None:
        t = _olabel(treats, labels_dim, "agent", "_aglbl")
        t = _olabel(t, labels_dim, "route_of_administration", "_rlbl")
        t = _olabel(t, labels_dim, "dose_unit", "_dulbl")
        for f_ in act_fields:
            t = _olabel(t, labels_dim, f_, f"_{f_}_lbl")
        dose = F.when(
            F.col("dose_value").isNotNull() & F.col("dose_unit").isNotNull(),
            F.struct(
                _oclass("dose_unit", "_dulbl").alias("unit"),
                F.col("dose_value").alias("value"),
            ),
        )
        act_parts.append(
            t.select(
                "subject_id",
                F.struct(F.lit(1).alias("c"), F.col("ord").alias("s")).alias("ord"),
                F.struct(
                    F.lit(None).cast(
                        "struct<code:struct<id:string,label:string>,"
                        "bodySite:struct<id:string,label:string>,"
                        "performed:struct<age:struct<iso8601duration:string>,timestamp:string>>"
                    ).alias("procedure"),
                    F.struct(
                        _oclass("agent", "_aglbl").alias("agent"),
                        F.when(
                            F.col("route_of_administration").isNotNull(),
                            _oclass("route_of_administration", "_rlbl"),
                        ).alias("routeOfAdministration"),
                        F.col("drug_type").alias("drugType"),
                        dose.alias("cumulativeDose"),
                    ).alias("treatment"),
                    *[
                        F.when(
                            F.col(f_).isNotNull(), _oclass(f_, f"_{f_}_lbl")
                        ).alias(_camel(f_))
                        for f_ in act_fields
                    ],
                ).alias("item"),
                F.array(
                    _prefix_of(F.col("agent")),
                    _prefix_of(F.col("route_of_administration")),
                    _prefix_of(F.col("dose_unit")),
                    *[_prefix_of(F.col(f_)) for f_ in act_fields],
                ).alias("_prefixes"),
            )
        )
    if act_parts:
        a = act_parts[0]
        for part in act_parts[1:]:
            a = a.unionByName(part)
        medact_sec = collectors.ordered_section(a, F.col("item"), "medicalActions")
        prefix_frames.append(
            a.select("subject_id", F.explode("_prefixes").alias("prefix"))
        )

    # ---- metaData.resources ----------------------------------------------
    resources_sec = None
    if resources and prefix_frames:
        rec_rows = [
            (
                i,
                r["id"],
                r.get("name"),
                r.get("url"),
                r.get("version"),
                r.get("namespacePrefix"),
                r.get("iriPrefix"),
            )
            for i, r in enumerate(resources)
        ]
        rdim = F.broadcast(
            spark.createDataFrame(
                rec_rows,
                "rank int, prefix string, name string, url string, version string,"
                "namespacePrefix string, iriPrefix string",
            )
        )
        pf = prefix_frames[0]
        for p in prefix_frames[1:]:
            pf = pf.unionByName(p)
        pf = pf.filter(F.col("prefix").isNotNull()).distinct()
        joined = pf.join(rdim, "prefix")  # unknown prefixes dropped
        rec = F.struct(
            F.col("prefix").alias("id"),
            F.col("name"),
            F.col("url"),
            F.col("version"),
            F.col("namespacePrefix"),
            F.col("iriPrefix"),
        )
        resources_sec = collectors.ordered_section(
            joined, rec, "resources", ord_col=F.col("rank")
        )

    # ---- subject + assembly ----------------------------------------------
    out = individual
    for sec in (features_sec, diseases_sec, meas_sec, interp_sec, medact_sec, resources_sec):
        if sec is not None:
            out = out.join(sec, "subject_id", "left")
    for arr in ("phenotypicFeatures", "diseases", "measurements", "interpretations",
                "medicalActions", "resources"):
        if arr not in out.columns:
            out = out.withColumn(arr, F.lit(None).cast("array<string>"))

    vital = F.when(
        F.col("vital_status").isNotNull()
        | F.col("time_of_death").isNotNull()
        | F.col("survival_time_days").isNotNull(),
        F.struct(
            F.col("vital_status").alias("status"),
            time_element_v2("time_of_death").alias("timeOfDeath"),
            F.col("survival_time_days")
            .cast("double")
            .cast("long")
            .alias("survivalTimeInDays"),
        ),
    )
    subject = F.struct(
        F.col("subject_id").alias("id"),
        _ts_str(F.col("date_of_birth")).alias("dateOfBirth"),
        time_element_v2("time_at_last_encounter").alias("timeAtLastEncounter"),
        vital.alias("vitalStatus"),
        F.coalesce(F.col("sex"), F.lit("UNKNOWN_SEX")).alias("sex"),
        F.lit("UNKNOWN_KARYOTYPE").alias("karyotypicSex"),
    )
    meta = F.struct(
        F.lit(SCHEMA_VERSION).alias("phenopacketSchemaVersion"),
        F.lit(created).alias("created"),
        F.lit(created_by).alias("createdBy"),
        F.lit(submitted_by).cast("string").alias("submittedBy"),
        _nonempty("resources").alias("resources"),
    )
    pid = (
        F.concat_ws("-", F.lit(cohort), F.col("subject_id"))
        if cohort
        else F.col("subject_id")
    )
    packet = F.struct(
        pid.alias("id"),
        subject.alias("subject"),
        _nonempty("phenotypicFeatures").alias("phenotypicFeatures"),
        _nonempty("measurements").alias("measurements"),
        _nonempty("interpretations").alias("interpretations"),
        _nonempty("diseases").alias("diseases"),
        _nonempty("medicalActions").alias("medicalActions"),
        meta.alias("metaData"),
    )
    return out.select(
        "subject_id",
        F.to_json(packet, {"ignoreNullFields": "true"}).alias("packet_json"),
    )
