"""Collection phase (SURVEY §2.5): fold every patient's rows — across all
tables — into phenopacket sections.

The reference materializes per-patient frames and runs 9 collectors in a
loop (cdf_collector_broker.rs:32-91).  Spark-first: every collector is a
*section builder* producing ``(subject_id, <section array>)`` via narrow
projections unioned across tables, then ONE ``groupBy(subject_id)`` each;
the final assembly left-joins sections onto the subject dimension.  Arrival
order (builder upsert semantics) is made explicit with a ``seq`` column
(table_rank, row order) resolved by window ``last`` (SURVEY §7.3).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..descriptors import ContextKind, ContextualizedDataFrame
from ..functions.durations import time_element_expr
from ..operators import grouping
from ..sources.readers import INGEST_ROWNUM


def _subject(cdf: ContextualizedDataFrame):
    return F.col(cdf.subject_col).cast("string").alias("subject_id")


def _union(frames: list[DataFrame]) -> Optional[DataFrame]:
    if not frames:
        return None
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def _linked_col(cdf: ContextualizedDataFrame, block: Optional[str], kind: ContextKind,
                time_type=None) -> Optional[str]:
    """G4 (~ contextualized_data_frame.rs:166-282): ≤1 column with the given
    context inside a building block; >1 → error (plan-build time)."""
    hits = [
        c
        for c, sc in cdf.resolved().items()
        if sc.building_block_id == block
        and sc.data_context.kind == kind
        and (time_type is None or sc.data_context.time_type == time_type or sc.data_context.time_type is None)
    ]
    if len(hits) > 1:
        raise grouping.MultiplicityError(
            f"table {cdf.context.name!r} block {block!r}: multiple {kind} columns {hits}"
        )
    return hits[0] if hits else None


INDIVIDUAL_FIELDS = {
    "sex": ContextKind.SUBJECT_SEX,
    "date_of_birth": ContextKind.DATE_OF_BIRTH,
    "vital_status": ContextKind.VITAL_STATUS,
    "time_at_last_encounter": ContextKind.TIME_AT_LAST_ENCOUNTER,
    "time_of_death": ContextKind.TIME_OF_DEATH,
    "cause_of_death": ContextKind.CAUSE_OF_DEATH,
    "survival_time_days": ContextKind.SURVIVAL_TIME_DAYS,
}


def collect_individual(cdfs: Sequence[ContextualizedDataFrame],
                       error_limit: int = 5) -> DataFrame:
    """IndividualCollector (~ individual_collector.rs:21-98): sex, DOB,
    vital status, time at last encounter, cause of death, survival days —
    each a G3 single-multiplicity element across all tables.

    ONE shuffle total: every (table, field-column) projects to a tagged
    narrow row (subject, field, value); the union groups by subject with a
    conditional ``collect_set`` per field.  The old shape (one
    ``single_valued`` groupBy+join per field) shuffled once per field."""
    parts = []
    for cdf in cdfs:
        # marker row keeps subjects visible even when every field is null
        parts.append(
            cdf.df.select(
                _subject(cdf), F.lit("_marker").alias("_field"), F.lit(None).cast("string").alias("_v")
            )
        )
        for name, kind in INDIVIDUAL_FIELDS.items():
            for col in cdf.columns_with_kind(kind):
                parts.append(
                    cdf.df.filter(F.col(col).isNotNull()).select(
                        _subject(cdf),
                        F.lit(name).alias("_field"),
                        F.col(col).cast("string").alias("_v"),
                    )
                )
    long = _union(parts)
    agg = long.groupBy("subject_id").agg(
        *[
            F.collect_set(F.when(F.col("_field") == name, F.col("_v"))).alias(f"_s_{name}")
            for name in INDIVIDUAL_FIELDS
        ]
    )
    # G3 strictness: >1 distinct value for any field → bounded error
    conflict = None
    for name in INDIVIDUAL_FIELDS:
        c = F.size(f"_s_{name}") > 1
        conflict = c if conflict is None else (conflict | c)
    bad = agg.filter(conflict).select(
        "subject_id", *[f"_s_{n}" for n in INDIVIDUAL_FIELDS]
    ).limit(error_limit).collect()
    if bad:
        detail = [
            (r["subject_id"], {n: sorted(r[f"_s_{n}"]) for n in INDIVIDUAL_FIELDS if len(r[f"_s_{n}"]) > 1})
            for r in bad
        ]
        raise grouping.MultiplicityError(
            f"multiple distinct values for individual fields: {detail}"
        )
    return agg.select(
        "subject_id",
        *[
            F.try_element_at(f"_s_{name}", F.lit(1)).alias(name)
            for name in INDIVIDUAL_FIELDS
        ],
    )


def _row_ord(cdf: ContextualizedDataFrame):
    """Within-table row order: the explicit ingest row number when captured
    at read time (true file order), else a deterministic hash of the full
    row — stable across runs/partitioning/retries."""
    if INGEST_ROWNUM in cdf.df.columns:
        return F.col(INGEST_ROWNUM)
    return F.xxhash64(*[F.col(c) for c in cdf.df.columns])


def collect_hpo_in_cells(cdfs: Sequence[ContextualizedDataFrame]) -> Optional[DataFrame]:
    """HpoInCellsCollector (~ hpo_in_cells_collector.rs:53-98): per HPO
    column, row-zip with linked onset/resolution/severity/excluded (G5);
    dedupe per (subject, hpo) keeping the LAST arrival (G6).

    Arrival order is COLUMN-major like the reference's per-series loop:
    ``seq`` ranks by (table+column frame index, row order); the kept row's
    values are last-arrival, while ``ord`` (the group's FIRST arrival)
    preserves the reference builder's insertion position for section
    ordering (IndexMap upsert keeps the original slot).
    Long form: (subject_id, hpo_id, onset, resolution, severity, excluded, ord)."""
    frames = []
    fidx = 0
    for cdf in cdfs:
        for col in cdf.columns_with_kind(ContextKind.HPO):
            sc = cdf.resolved()[col]
            block = sc.building_block_id
            onset = _linked_col(cdf, block, ContextKind.ONSET)
            resolution = _linked_col(cdf, block, ContextKind.TIME_OF_RESOLUTION)
            severity = _linked_col(cdf, block, ContextKind.SEVERITY)
            obs = _linked_col(cdf, block, ContextKind.OBSERVATION_STATUS)

            def s(name):
                return F.col(name).cast("string") if name else F.lit(None).cast("string")

            frames.append(
                cdf.df.filter(F.col(col).isNotNull()).select(
                    _subject(cdf),
                    F.col(col).cast("string").alias("hpo_id"),
                    s(onset).alias("onset"),
                    s(resolution).alias("resolution"),
                    s(severity).alias("severity"),
                    (
                        (~F.col(obs).cast("boolean")).alias("excluded")
                        if obs
                        else F.lit(False).alias("excluded")
                    ),
                    F.struct(
                        F.lit(fidx).cast("long").alias("r"),
                        _row_ord(cdf).alias("i"),
                    ).alias("seq"),
                )
            )
            fidx += 1
    long = _union(frames)
    if long is None:
        return None
    from pyspark.sql.window import Window

    long = long.withColumn(
        "ord", F.min("seq").over(Window.partitionBy("subject_id", "hpo_id"))
    )
    return grouping.upsert_last(long, ["subject_id", "hpo_id"], "seq",
                                ["onset", "resolution", "severity", "excluded", "ord"])


def collect_hpo_in_headers(cdfs: Sequence[ContextualizedDataFrame]) -> Optional[DataFrame]:
    """HpoInHeaderCollector (~ hpo_in_header_collector.rs:22-84): boolean
    observation-status columns whose header IS the HPO id ('HP:x' or
    'HP:x#block'), collapsed per (subject, hpo) with conflict detection (G7)."""
    frames = []
    fidx = 0
    for cdf in cdfs:
        by_block: dict = {}
        for col, sc in cdf.resolved().items():
            if (
                sc.data_context.kind == ContextKind.OBSERVATION_STATUS
                and sc.header_context is not None
                and sc.header_context.kind == ContextKind.HPO
            ):
                by_block.setdefault(sc.building_block_id, []).append(col)
        for block, cols in by_block.items():
            onset = _linked_col(cdf, block, ContextKind.ONSET)
            collapsed = grouping.header_hpo_collapse(cdf.df, cdf.subject_col, cols, onset)
            # arrival order for header features = column position in the
            # table (the reference iterates header series in column order)
            pos_pairs = []
            for i, c in enumerate(cols):
                pos_pairs += [F.lit(c), F.lit(i)]
            ord_col = F.struct(
                F.lit(fidx).cast("long").alias("r"),
                F.element_at(F.create_map(*pos_pairs), F.col("hpo_id"))
                .cast("long")
                .alias("i"),
            )
            # header 'HP:x#block' → id 'HP:x' (~ transform/utils.rs:80-85)
            frames.append(
                collapsed.select(
                    "subject_id",
                    F.split(F.col("hpo_id"), "#")[0].alias("hpo_id"),
                    "observed",
                    "excluded",
                    "onset",
                    ord_col.alias("ord"),
                )
            )
            fidx += 1
    return _union(frames)


def collect_diseases(cdfs: Sequence[ContextualizedDataFrame]) -> Optional[DataFrame]:
    """DiseaseCollector (~ disease_collector.rs:44-71): disease + linked
    onset + primary site, row-zipped.  Exact duplicate rows collapse (one
    groupBy) keeping the FIRST arrival position as ``ord``; distinct
    (disease, onset) combinations stay separate entries like the
    reference's per-row builder pushes."""
    frames = []
    fidx = 0
    for cdf in cdfs:
        for col in cdf.columns_with_kind(ContextKind.DISEASE):
            sc = cdf.resolved()[col]
            block = sc.building_block_id
            onset = _linked_col(cdf, block, ContextKind.ONSET)
            site = _linked_col(cdf, block, ContextKind.PRIMARY_SITE)

            def s(name):
                return F.col(name).cast("string") if name else F.lit(None).cast("string")

            frames.append(
                cdf.df.filter(F.col(col).isNotNull()).select(
                    _subject(cdf),
                    F.col(col).cast("string").alias("disease_id"),
                    s(onset).alias("onset"),
                    s(site).alias("primary_site"),
                    F.struct(
                        F.lit(fidx).cast("long").alias("r"),
                        _row_ord(cdf).alias("i"),
                    ).alias("seq"),
                )
            )
            fidx += 1
    long = _union(frames)
    if long is None:
        return None
    return long.groupBy("subject_id", "disease_id", "onset", "primary_site").agg(
        F.min("seq").alias("ord")
    )


def collect_quantitative_measurements(cdfs) -> Optional[DataFrame]:
    """QuantitativeMeasurementCollector (~ quantitative_measurement_collector.rs:53-95):
    value + assay (from context param) + unit + time + reference range.
    ``ord`` = (table index, series position, row order) so quantitative and
    qualitative measurements interleave in column order like the reference."""
    frames = []
    for tidx, cdf in enumerate(cdfs):
        for col, sc in cdf.resolved().items():
            if sc.data_context.kind != ContextKind.QUANTITATIVE_MEASUREMENT:
                continue
            block = sc.building_block_id
            t = _linked_col(cdf, block, ContextKind.TIME_OF_MEASUREMENT)
            lo = _linked_ref(cdf, block, "start")
            hi = _linked_ref(cdf, block, "end")

            def s(name):
                return F.col(name).cast("string") if name else F.lit(None).cast("string")

            def d(name):
                return F.col(name).cast("double") if name else F.lit(None).cast("double")

            frames.append(
                cdf.df.filter(F.col(col).isNotNull()).select(
                    _subject(cdf),
                    F.lit(sc.data_context.assay_id).alias("assay_id"),
                    F.col(col).cast("double").alias("value"),
                    F.lit(sc.data_context.unit_ontology_id).alias("unit"),
                    s(t).alias("time_observed"),
                    d(lo).alias("ref_low"),
                    d(hi).alias("ref_high"),
                    F.struct(
                        F.lit(tidx).cast("long").alias("r"),
                        F.lit(_meas_ord(cdf, col)).cast("long").alias("c"),
                        _row_ord(cdf).alias("i"),
                    ).alias("ord"),
                )
            )
    return _union(frames)


def _meas_ord(cdf: ContextualizedDataFrame, col: str) -> int:
    """Series position of a measurement column within its table — the
    reference pushes measurements in column order, quantitative and
    qualitative interleaved."""
    return cdf.df.columns.index(col)


def collect_qualitative_measurements(cdfs) -> Optional[DataFrame]:
    """QualitativeMeasurementCollector (~ qualitative_measurement_collector.rs):
    ontology-coded measurement values (e.g. PATO terms, post-normalization)
    + assay from the context parameter + linked observation time.
    Long form: (subject_id, assay_id, value_id, time_observed, ord)."""
    frames = []
    for tidx, cdf in enumerate(cdfs):
        for col, sc in cdf.resolved().items():
            if sc.data_context.kind != ContextKind.QUALITATIVE_MEASUREMENT:
                continue
            block = sc.building_block_id
            t = _linked_col(cdf, block, ContextKind.TIME_OF_MEASUREMENT)

            def s(name):
                return F.col(name).cast("string") if name else F.lit(None).cast("string")

            frames.append(
                cdf.df.filter(F.col(col).isNotNull()).select(
                    _subject(cdf),
                    F.lit(sc.data_context.assay_id).alias("assay_id"),
                    F.col(col).cast("string").alias("value_id"),
                    s(t).alias("time_observed"),
                    F.struct(
                        F.lit(tidx).cast("long").alias("r"),
                        F.lit(_meas_ord(cdf, col)).cast("long").alias("c"),
                        _row_ord(cdf).alias("i"),
                    ).alias("ord"),
                )
            )
    return _union(frames)


def _linked_ref(cdf, block, boundary: str) -> Optional[str]:
    from ..descriptors import Boundary

    want = Boundary.START if boundary == "start" else Boundary.END
    hits = [
        c
        for c, sc in cdf.resolved().items()
        if sc.building_block_id == block
        and sc.data_context.kind == ContextKind.REFERENCE_RANGE
        and sc.data_context.boundary == want
    ]
    if len(hits) > 1:
        raise grouping.MultiplicityError(f"multiple reference-range {boundary} cols {hits}")
    return hits[0] if hits else None


# phenopackets DrugType enum (phenopacket_builder.rs:578-585 parses via
# from_str_name — unknown names are a hard error there; we validate the same
# set at plan level when strict)
DRUG_TYPES = {
    "UNKNOWN_DRUG_TYPE",
    "PRESCRIPTION",
    "EHR_MEDICATION_LIST",
    "ADMINISTRATION_RELATED_TO_PROCEDURE",
}

_MEDICAL_ACTION_KINDS = (
    ContextKind.TREATMENT_TARGET,
    ContextKind.TREATMENT_INTENT,
    ContextKind.RESPONSE_TO_TREATMENT,
    ContextKind.TREATMENT_TERMINATION_REASON,
)


def _medical_action_cols(cdf: ContextualizedDataFrame, block: Optional[str]):
    """MedicalActionData (~ medical_action.rs:21-52): the four optional
    action-level columns linked into the same building block."""
    return {
        "treatment_target": _linked_col(cdf, block, ContextKind.TREATMENT_TARGET),
        "treatment_intent": _linked_col(cdf, block, ContextKind.TREATMENT_INTENT),
        "response_to_treatment": _linked_col(cdf, block, ContextKind.RESPONSE_TO_TREATMENT),
        "treatment_termination_reason": _linked_col(
            cdf, block, ContextKind.TREATMENT_TERMINATION_REASON
        ),
    }


def collect_medical_procedures(cdfs: Sequence[ContextualizedDataFrame]) -> Optional[DataFrame]:
    """MedicalProcedureCollector (~ medical_procedure_collector.rs:96-135):
    per Procedure column, row-zip the linked body-site / time-of-procedure /
    action-level columns; null-procedure rows are skipped (no row error —
    medical_procedure_data.rs:56-66 returns None).

    Plan-build strictness (~ medical_procedure_data.rs:38-48): a block with
    body-site or procedure-time columns but NO procedure column is a config
    error.  Long form: (subject_id, procedure_code, body_site, performed,
    treatment_target, treatment_intent, response_to_treatment,
    treatment_termination_reason, ord)."""
    frames = []
    fidx = 0
    for cdf in cdfs:
        blocks = {sc.building_block_id for sc in cdf.resolved().values()}
        proc_blocks = set()
        for col, sc in cdf.resolved().items():
            if sc.data_context.kind == ContextKind.PROCEDURE:
                proc_blocks.add(sc.building_block_id)
        for block in blocks:
            if block in proc_blocks:
                continue
            orphan = _linked_col(cdf, block, ContextKind.PROCEDURE_BODY_SITE) or _linked_col(
                cdf, block, ContextKind.TIME_OF_PROCEDURE
            )
            if orphan:
                raise grouping.MultiplicityError(
                    f"table {cdf.context.name!r} block {block!r}: column {orphan!r} "
                    "(procedure body-site/time) has no Procedure column in its block"
                )
        for col, sc in cdf.resolved().items():
            if sc.data_context.kind != ContextKind.PROCEDURE:
                continue
            block = sc.building_block_id
            body = _linked_col(cdf, block, ContextKind.PROCEDURE_BODY_SITE)
            t = _linked_col(cdf, block, ContextKind.TIME_OF_PROCEDURE)
            act = _medical_action_cols(cdf, block)

            def s(name):
                return F.col(name).cast("string") if name else F.lit(None).cast("string")

            frames.append(
                cdf.df.filter(F.col(col).isNotNull()).select(
                    _subject(cdf),
                    F.col(col).cast("string").alias("procedure_code"),
                    s(body).alias("body_site"),
                    s(t).alias("performed"),
                    *[s(c).alias(k) for k, c in act.items()],
                    F.struct(
                        F.lit(fidx).cast("long").alias("r"),
                        _row_ord(cdf).alias("i"),
                    ).alias("ord"),
                )
            )
            fidx += 1
    return _union(frames)


def collect_medical_treatments(
    cdfs: Sequence[ContextualizedDataFrame],
    ledger=None,
    error_limit: int = 5,
    strict: bool = True,
) -> Optional[DataFrame]:
    """MedicalTreatmentCollector (~ medical_treatment_collector.rs:106-152):
    per TreatmentAgent column, row-zip route-of-administration / drug-type /
    cumulative dose (QuantityValue + QuantityUnit + ReferenceRange) and the
    four action-level columns.

    Strictness, matching the reference:
    - plan-build (~ medical_treatment_data.rs:54-66, quantity_data.rs:34-48):
      route/drug/dose columns with no agent column in the block, a dose value
      column without a unit column (or vice versa), or a reference-range
      boundary without its pair → error before any job runs;
    - row-level (~ medical_treatment_data.rs:104-117): a null agent alongside
      non-null route/drug/dose values → RequiredValueMissing.  Registered on
      the shared :class:`~phenoxtract_spark.errors.ErrorLedger` when given
      (ONE validation job for the whole pipeline), else checked eagerly with
      a bounded collect.

    Long form: (subject_id, agent, route_of_administration, drug_type,
    dose_value, dose_unit, ref_low, ref_high, treatment_target,
    treatment_intent, response_to_treatment, treatment_termination_reason,
    ord)."""
    frames = []
    bad_frames = []
    fidx = 0
    for cdf in cdfs:
        agent_blocks = {
            sc.building_block_id
            for sc in cdf.resolved().values()
            if sc.data_context.kind == ContextKind.TREATMENT_AGENT
        }
        for col, sc in cdf.resolved().items():
            kind = sc.data_context.kind
            if (
                kind
                in (
                    ContextKind.ROUTE_OF_ADMINISTRATION,
                    ContextKind.DRUG_TYPE,
                )
                and sc.building_block_id not in agent_blocks
            ):
                raise grouping.MultiplicityError(
                    f"table {cdf.context.name!r} block {sc.building_block_id!r}: "
                    f"column {col!r} ({kind.value}) has no TreatmentAgent column in its block"
                )
        for col, sc in cdf.resolved().items():
            if sc.data_context.kind != ContextKind.TREATMENT_AGENT:
                continue
            block = sc.building_block_id
            route = _linked_col(cdf, block, ContextKind.ROUTE_OF_ADMINISTRATION)
            drug = _linked_col(cdf, block, ContextKind.DRUG_TYPE)
            qval = _linked_col(cdf, block, ContextKind.QUANTITY_VALUE)
            qunit = _linked_col(cdf, block, ContextKind.QUANTITY_UNIT)
            if (qval is None) != (qunit is None):
                raise grouping.MultiplicityError(
                    f"table {cdf.context.name!r} block {block!r}: cumulative dose needs "
                    f"BOTH QuantityValue and QuantityUnit columns (have value={qval!r}, unit={qunit!r})"
                )
            lo = _linked_ref(cdf, block, "start")
            hi = _linked_ref(cdf, block, "end")
            if (lo is None) != (hi is None):
                raise grouping.MultiplicityError(
                    f"table {cdf.context.name!r} block {block!r}: reference range needs "
                    f"BOTH start and end columns (have start={lo!r}, end={hi!r})"
                )
            act = _medical_action_cols(cdf, block)

            def s(name):
                return F.col(name).cast("string") if name else F.lit(None).cast("string")

            def d(name):
                return F.col(name).cast("double") if name else F.lit(None).cast("double")

            if strict:
                others = [c for c in (route, drug, qval, qunit) if c]
                if others:
                    present = None
                    for c in others:
                        p = F.col(c).isNotNull()
                        present = p if present is None else (present | p)
                    bad_frames.append(
                        cdf.df.filter(F.col(col).isNull() & present).select(
                            _subject(cdf).alias("offender")
                        )
                    )
            frames.append(
                cdf.df.filter(F.col(col).isNotNull()).select(
                    _subject(cdf),
                    F.col(col).cast("string").alias("agent"),
                    s(route).alias("route_of_administration"),
                    s(drug).alias("drug_type"),
                    d(qval).alias("dose_value"),
                    s(qunit).alias("dose_unit"),
                    d(lo).alias("ref_low"),
                    d(hi).alias("ref_high"),
                    *[s(c).alias(k) for k, c in act.items()],
                    F.struct(
                        F.lit(fidx).cast("long").alias("r"),
                        _row_ord(cdf).alias("i"),
                    ).alias("ord"),
                )
            )
            fidx += 1
    if bad_frames:
        bad = _union(bad_frames)
        if ledger is not None:
            ledger.add_check("treatment_agent_missing", bad)
        else:
            rows = bad.limit(error_limit).collect()
            if rows:
                raise grouping.MultiplicityError(
                    "treatment values without an agent for subjects: "
                    f"{sorted({r['offender'] for r in rows})}"
                )
    return _union(frames)


def medical_actions_section(
    procedures: Optional[DataFrame], treatments: Optional[DataFrame]
) -> Optional[DataFrame]:
    """Merge procedure and treatment rows into one ``medical_actions`` array
    per subject.  Broker order (cdf_collector_broker.rs:77-91) runs
    MedicalProcedureCollector before MedicalTreatmentCollector, so all
    procedures precede all treatments; within each, arrival order."""
    parts = []
    if procedures is not None:
        parts.append(
            procedures.select(
                "subject_id",
                F.struct(F.lit(0).alias("c"), F.col("ord").alias("s")).alias("ord"),
                F.struct(
                    F.struct(
                        F.col("procedure_code").alias("code"),
                        F.col("body_site"),
                        time_element_expr("performed").alias("performed"),
                    ).alias("procedure"),
                    F.lit(None).cast(
                        "struct<agent:string,route_of_administration:string,"
                        "drug_type:string,dose_value:double,dose_unit:string,"
                        "ref_low:double,ref_high:double>"
                    ).alias("treatment"),
                    F.col("treatment_target"),
                    F.col("treatment_intent"),
                    F.col("response_to_treatment"),
                    F.col("treatment_termination_reason"),
                ).alias("action"),
            )
        )
    if treatments is not None:
        parts.append(
            treatments.select(
                "subject_id",
                F.struct(F.lit(1).alias("c"), F.col("ord").alias("s")).alias("ord"),
                F.struct(
                    F.lit(None).cast(
                        "struct<code:string,body_site:string,"
                        "performed:struct<age:struct<iso8601duration:string>,timestamp:timestamp>>"
                    ).alias("procedure"),
                    F.struct(
                        F.col("agent"),
                        F.col("route_of_administration"),
                        F.col("drug_type"),
                        F.col("dose_value"),
                        F.col("dose_unit"),
                        F.col("ref_low"),
                        F.col("ref_high"),
                    ).alias("treatment"),
                    F.col("treatment_target"),
                    F.col("treatment_intent"),
                    F.col("response_to_treatment"),
                    F.col("treatment_termination_reason"),
                ).alias("action"),
            )
        )
    long = _union(parts)
    if long is None:
        return None
    return ordered_section(long, F.col("action"), "medical_actions")


def collect_interpretations(cdfs: Sequence[ContextualizedDataFrame]) -> Optional[DataFrame]:
    """G8/G9: classify each genomic row and group into one Interpretation
    per (subject, disease).  See :func:`interpretation_rows` for the long
    form the classification runs over."""
    from ..operators import interpret

    long = interpretation_rows(cdfs)
    if long is None:
        return None
    return interpret.assemble_interpretations(
        long, "subject_id", "disease", "genes", "variants"
    )


def interpretation_rows(cdfs: Sequence[ContextualizedDataFrame]) -> Optional[DataFrame]:
    """G8/G9 long form (~ interpretation_collector.rs:16-196): one row per
    source row carrying (subject, disease, genes[], variants[], ord).  G9:
    when the block's disease lives in ANOTHER table, resolve it cross-table
    via G3 single-multiplicity and broadcast-join it onto the variant rows."""
    # disease values per (subject, block) across ALL tables — the G9 source
    disease_frames: dict = {}
    for cdf in cdfs:
        for col, sc in cdf.resolved().items():
            if sc.data_context.kind == ContextKind.DISEASE and sc.building_block_id:
                disease_frames.setdefault(sc.building_block_id, []).append(
                    (cdf.df, cdf.subject_col, col)
                )
    rows_frames = []
    fidx = 0
    for cdf in cdfs:
        by_block: dict = {}
        for col, sc in cdf.resolved().items():
            if sc.building_block_id and sc.data_context.kind in (
                ContextKind.HGNC, ContextKind.HGVS
            ):
                by_block.setdefault(sc.building_block_id, {"genes": [], "variants": []})
                key = "genes" if sc.data_context.kind == ContextKind.HGNC else "variants"
                by_block[sc.building_block_id][key].append(col)
        for block, cols in by_block.items():
            genes_arr = F.filter(
                F.array(*[F.col(c).cast("string") for c in cols["genes"]])
                if cols["genes"] else F.array().cast("array<string>"),
                lambda x: x.isNotNull(),
            )
            variants_arr = F.filter(
                F.array(*[F.col(c).cast("string") for c in cols["variants"]])
                if cols["variants"] else F.array().cast("array<string>"),
                lambda x: x.isNotNull(),
            )
            local_disease = _linked_col(cdf, block, ContextKind.DISEASE)
            base = cdf.df.select(
                _subject(cdf),
                (F.col(local_disease).cast("string") if local_disease else F.lit(None).cast("string")).alias("disease"),
                genes_arr.alias("genes"),
                variants_arr.alias("variants"),
                F.struct(
                    F.lit(fidx).cast("long").alias("r"),
                    _row_ord(cdf).alias("i"),
                ).alias("ord"),
            )
            fidx += 1
            if local_disease is None and block in disease_frames:
                dval = grouping.single_valued(
                    disease_frames[block], alias="disease_x", strict=True
                )
                base = (
                    base.drop("disease")
                    .join(F.broadcast(dval), "subject_id", "left")
                    .withColumnRenamed("disease_x", "disease")
                )
            rows_frames.append(
                base.filter((F.size("genes") > 0) | (F.size("variants") > 0))
            )
    return _union(rows_frames)


def collect_resources(cdfs: Sequence[ContextualizedDataFrame]) -> Optional[DataFrame]:
    """G11 (~ phenopacket_builder.rs:683-702): per subject, the distinct
    lowercase CURIE prefixes of every ontology-valued cell in the packet —
    the meta_data.resources list."""
    CURIE_KINDS = (ContextKind.HPO, ContextKind.DISEASE)
    frames = []
    for cdf in cdfs:
        for col, sc in cdf.resolved().items():
            take = sc.data_context.kind in CURIE_KINDS or (
                sc.header_context is not None
                and sc.header_context.kind == ContextKind.HPO
            )
            if not take:
                continue
            value = (
                F.lit(col)  # header-HPO: the CURIE is the column NAME
                if sc.header_context is not None
                and sc.header_context.kind == ContextKind.HPO
                else F.col(col).cast("string")
            )
            frames.append(
                cdf.df.select(
                    _subject(cdf),
                    F.lower(F.split(value, ":")[0]).alias("prefix"),
                ).filter(value.rlike(r"^[A-Za-z][A-Za-z0-9.]*:"))
            )
    long = _union(frames)
    if long is None:
        return None
    return long.groupBy("subject_id").agg(
        F.sort_array(F.collect_set("prefix")).alias("resources")
    )


def ordered_section(long: DataFrame, item: "F.Column", alias: str,
                    ord_col: "F.Column | None" = None) -> DataFrame:
    """Aggregate (subject, item) rows into a per-subject array in ARRIVAL
    order: sort_array over (ord, item) structs, then strip the ord — the
    distributed equivalent of the reference builder's insertion-ordered
    section vectors."""
    o = ord_col if ord_col is not None else F.col("ord")
    return (
        long.select("subject_id", F.struct(o.alias("o"), item.alias("x")).alias("_oi"))
        .groupBy("subject_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list("_oi")), lambda p: p["x"]
            ).alias(alias)
        )
    )


def features_section(hpo_cells: Optional[DataFrame], hpo_headers: Optional[DataFrame]) -> Optional[DataFrame]:
    """Merge cell-sourced and header-sourced features into one
    ``phenotypic_features`` array per subject (G10 section), in arrival
    order: all cell-sourced features first (the reference's HpoInCells
    collector runs before HpoInHeader), each in (table+column, row) order."""
    parts = []
    if hpo_cells is not None:
        parts.append(
            hpo_cells.select(
                "subject_id",
                F.struct(F.lit(0).alias("c"), F.col("ord").alias("s")).alias("ord"),
                F.struct(
                    F.col("hpo_id").alias("type_id"),
                    F.col("excluded"),
                    time_element_expr("onset").alias("onset"),
                    time_element_expr("resolution").alias("resolution"),
                    F.col("severity"),
                ).alias("feature"),
            )
        )
    if hpo_headers is not None:
        parts.append(
            hpo_headers.filter(F.col("observed").isNotNull()).select(
                "subject_id",
                F.struct(F.lit(1).alias("c"), F.col("ord").alias("s")).alias("ord"),
                F.struct(
                    F.col("hpo_id").alias("type_id"),
                    F.col("excluded"),
                    time_element_expr("onset").alias("onset"),
                    F.lit(None).cast(
                        "struct<age:struct<iso8601duration:string>,timestamp:timestamp>"
                    ).alias("resolution"),
                    F.lit(None).cast("string").alias("severity"),
                ).alias("feature"),
            )
        )
    long = _union(parts)
    if long is None:
        return None
    return ordered_section(long, F.col("feature"), "phenotypic_features")


def diseases_section(diseases: Optional[DataFrame]) -> Optional[DataFrame]:
    if diseases is None:
        return None
    return ordered_section(
        diseases,
        F.struct(
            F.col("disease_id").alias("term_id"),
            time_element_expr("onset").alias("onset"),
            F.col("primary_site"),
        ),
        "diseases",
    )


def measurements_section(meas: Optional[DataFrame]) -> Optional[DataFrame]:
    if meas is None:
        return None
    return ordered_section(
        meas,
        F.struct(
            F.col("assay_id"),
            F.col("value"),
            F.col("unit"),
            F.col("time_observed"),
            F.col("ref_low"),
            F.col("ref_high"),
        ),
        "measurements",
    )
