"""G8: interpretation assembly (SURVEY §2.5; ~ interpretation_collector.rs:16-196,
pathogenic_gene_variant_info.rs:40-106, phenopacket_builder.rs:283-362).

Row-level classification of a patient's genes+variants into an
interpretation status, then per-(patient, disease) aggregation of genomic
interpretations keyed ``{packet_id}-{disease_id}`` (C17).

Classification (field parity with the reference's enum):
  no genes, no variants          → NONE
  genes, no variants             → CAUSATIVE_GENE
  one variant                    → SINGLE
  two identical variants         → HOMOZYGOUS
  two distinct variants          → COMPOUND_HET

All of it is a ``when``-cascade over array sizes — pure expressions, one
shuffle for the final groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import prefixed_id

STATUS_NONE = "NONE"
STATUS_CAUSATIVE_GENE = "CAUSATIVE_GENE"
STATUS_SINGLE = "SINGLE"
STATUS_HOMOZYGOUS = "HOMOZYGOUS"
STATUS_COMPOUND_HET = "COMPOUND_HET"


def classify_gene_variant(genes: Column, variants: Column) -> Column:
    """~ pathogenic_gene_variant_info.rs:40-106 (when-cascade on sizes)."""
    g = F.coalesce(genes, F.array().cast("array<string>"))
    v = F.coalesce(variants, F.array().cast("array<string>"))
    nv = F.size(v)
    ndv = F.size(F.array_distinct(v))
    # >1 gene or >2 variants are data errors in the reference (it returns
    # Err); here they classify to null so callers can collect/filter them
    return (
        F.when(F.size(g) > 1, F.lit(None).cast("string"))
        .when((F.size(g) == 0) & (nv == 0), STATUS_NONE)
        .when(nv == 0, STATUS_CAUSATIVE_GENE)
        .when(nv == 1, STATUS_SINGLE)
        .when((nv == 2) & (ndv == 1), STATUS_HOMOZYGOUS)
        .when((nv == 2) & (ndv == 2), STATUS_COMPOUND_HET)
        .otherwise(F.lit(None).cast("string"))
    )


def assemble_interpretations(
    df: DataFrame,
    subject: str,
    disease: str,
    genes: str,
    variants: str,
    packet_id: Column | None = None,
) -> DataFrame:
    """Group each patient's genomic rows into one Interpretation per
    (patient, disease): id = '{packet_id}-{disease_id}'
    (~ phenopacket_builder.rs:653-681)."""
    pid = packet_id if packet_id is not None else F.col(subject).cast("string")
    gi = F.struct(
        classify_gene_variant(F.col(genes), F.col(variants)).alias("status"),
        F.col(genes).alias("genes"),
        F.col(variants).alias("variants"),
    )
    rows = df.select(
        F.col(subject).cast("string").alias("subject_id"),
        F.col(disease).cast("string").alias("disease_id"),
        pid.alias("_pid"),
        gi.alias("gi"),
    ).filter(F.col("disease_id").isNotNull())
    return rows.groupBy("subject_id", "disease_id").agg(
        prefixed_id(F.first("_pid"), F.first("disease_id")).alias("interpretation_id"),
        F.sort_array(F.collect_list("gi")).alias("genomic_interpretations"),
    )
